from .adapter import PEAAdapter
from .bert_text import BertTextEncoder
from .clip_text import CLIPTextEncoder
from .clip_vision import CLIPVisionEncoder
from .controlnet import ControlNet
from .mt5 import T5Encoder
from .unet import UNet2DCondition
from .vae import AutoencoderKL

__all__ = [
    "PEAAdapter", "BertTextEncoder", "CLIPTextEncoder", "CLIPVisionEncoder",
    "ControlNet", "T5Encoder", "UNet2DCondition", "AutoencoderKL",
]
