from .int8 import (  # noqa: F401
    QConvInt8,
    calibrate_conv_ranges,
    calibrate_sdxl,
    load_ranges,
    merge_ranges,
    parse_scopes,
    per_conv_sqnr,
    quantize_for_serving,
    quantize_unet_params,
    save_ranges,
    quantize_weight,
)
