"""PEA adapter configurations.

The reference implements the adapter four different ways (train_sdxl_zh.py:43-67,
train_sd_zh.py:41-56, tests/test_sdxl_zh_controlnet.py:63-113, tests/test_sd_zh.py:25-44).
All four are instances of one shape:

    h   = projector(LayerNorm(x))          # stack of Linear(+GELU between)
    seq = fc(GELU(h))                      # optional head -> cross-attn states
    pooled = mean(h (+x if residual), axis=seq)   # optional pooled embed

so we model them with a single config: ``projector_dims`` (the Linear output dims,
GELU between but not after the last), ``projector_bias``, an optional ``head_dim``
(SDXL needs a (pooled, seq) pair; SD1.5 only a seq), and ``use_residual``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """Configuration for :class:`pea_diffusion_tpu.models.adapter.PEAAdapter`."""

    in_dim: int
    # Output dims of the projector Linears; GELU between layers, none after last.
    projector_dims: Tuple[int, ...]
    projector_bias: bool = False
    # If set, a biased Linear head maps GELU(projector_out) -> head_dim and the
    # module returns (pooled[B, projector_dims[-1]], seq[B, T, head_dim]).
    # If None, the module returns seq = projector_out only (SD1.5 style).
    head_dim: Optional[int] = None
    use_residual: bool = False
    layernorm_eps: float = 1e-5

    @property
    def pooled_dim(self) -> Optional[int]:
        return self.projector_dims[-1] if self.head_dim is not None else None

    @property
    def seq_dim(self) -> int:
        return self.head_dim if self.head_dim is not None else self.projector_dims[-1]

    def param_count(self) -> int:
        n = 2 * self.in_dim  # LayerNorm scale + bias
        prev = self.in_dim
        for d in self.projector_dims:
            n += prev * d + (d if self.projector_bias else 0)
            prev = d
        if self.head_dim is not None:
            n += prev * self.head_dim + self.head_dim
        return n


# Dim matrix from the reference (SURVEY.md §2a; constructor calls at
# train_sdxl_zh.py:101,107,113,124,134, train_sd_zh.py:97,
# tests/test_sdxl_zh_controlnet.py:63-113, tests/test_sd_zh.py:25-44).
ADAPTER_PRESETS = {
    # SDXL "MLP_plus" variants: (pooled 1280, seq 2048)
    "sdxl_mul_clip": AdapterConfig(1024, (2048, 2048, 1280), head_dim=2048),
    "sdxl_chinese_clip": AdapterConfig(1024, (1024, 1024, 1280), head_dim=2048),
    "sdxl_mt5": AdapterConfig(2048, (2048, 2048, 1280), head_dim=2048),
    "sdxl_alt_clip": AdapterConfig(768, (2048, 2048, 1280), head_dim=2048),
    "sdxl_concat": AdapterConfig(2048, (2048, 2048, 1280), head_dim=2048),
    "sdxl_wukong": AdapterConfig(768, (1024, 1024, 1280), head_dim=2048),
    # 11.54 M-param variant used by released SDXL checkpoints
    # (MLP_plus(1024,1280,2048,2048), tests/test_sdxl_zh.py:59-84)
    "sdxl_plus": AdapterConfig(1024, (2048, 2048, 1280), head_dim=2048),
    # ~5 M 2-layer variant (tests/test_sdxl_zh_controlnet.py:63-86): biased
    # fc1/fc2 + head fc3
    "sdxl_small": AdapterConfig(
        1024, (1024, 1280), projector_bias=True, head_dim=2048
    ),
    # SD1.5: seq-only 768-d output (train_sd_zh.py:41-56)
    "sd15_chinese_clip": AdapterConfig(1024, (2048, 2048, 768)),
    # 5-layer 33.8 M test variant (tests/test_sd_zh.py:25-44 w/ hidden 3072)
    "sd15_deep": AdapterConfig(1024, (3072, 3072, 3072, 3072, 768)),
}
