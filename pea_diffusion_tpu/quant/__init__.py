from .int8 import (  # noqa: F401
    QConvInt8,
    calibrate_conv_ranges,
    calibrate_sdxl,
    merge_ranges,
    quantize_for_serving,
    quantize_unet_params,
    quantize_weight,
)
