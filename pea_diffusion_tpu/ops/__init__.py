from .attention import dot_product_attention, xla_attention
from .flash_attention import flash_attention

__all__ = ["dot_product_attention", "xla_attention", "flash_attention"]
