from .adapter import AdapterConfig, ADAPTER_PRESETS
from .unet import UNetConfig, VAEConfig, ControlNetConfig
from .text_encoder import CLIPTextConfig, BertTextConfig, T5Config
from .train import TrainConfig, DataConfig

__all__ = [
    "AdapterConfig", "ADAPTER_PRESETS",
    "UNetConfig", "VAEConfig", "ControlNetConfig",
    "CLIPTextConfig", "BertTextConfig", "T5Config",
    "TrainConfig", "DataConfig",
]
