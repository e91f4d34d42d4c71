from .text2image import (
    PEAModels,
    StableDiffusionPEAPipeline,
    StableDiffusionXLPEAPipeline,
    generate_sd,
    generate_sdxl,
)
from .controlnet import generate_sdxl_controlnet
from .inpaint import generate_sdxl_inpaint
from .factory import build_models, init_params

__all__ = [
    "PEAModels",
    "StableDiffusionPEAPipeline", "StableDiffusionXLPEAPipeline",
    "generate_sd", "generate_sdxl", "generate_sdxl_controlnet",
    "generate_sdxl_inpaint", "build_models", "init_params",
]
