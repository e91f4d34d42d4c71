"""PEA adapter: the only trainable module of the framework.

A small MLP that projects token states of a non-English text encoder into the
conditioning space of a frozen SD/SDXL UNet. Covers all four reference
variants through :class:`AdapterConfig` (see configs/adapter.py for the
mapping to train_sdxl_zh.py:43-67 / train_sd_zh.py:41-56 / the test-script
variants).

TPU notes: the adapter is a handful of [B*T, D] x [D, H] matmuls — pure MXU
work. We keep params in fp32 (they carry the only gradients in KD training)
and compute in a configurable dtype (bf16 by default inside pipelines).
GELU is the exact (erf) variant to match torch ``nn.GELU()`` semantics.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ..configs.adapter import AdapterConfig


class PEAAdapter(nn.Module):
    config: AdapterConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """x: [B, T, in_dim] token states.

        Returns ``(pooled [B, proj_out], seq [B, T, head_dim])`` when the config
        has a head (SDXL), else ``seq [B, T, proj_out]`` (SD1.5).
        """
        cfg = self.config
        residual = x
        h = nn.LayerNorm(
            epsilon=cfg.layernorm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="layernorm",
        )(x)
        for i, dim in enumerate(cfg.projector_dims):
            if i > 0:
                h = nn.gelu(h, approximate=False)
            h = nn.Dense(
                dim,
                use_bias=cfg.projector_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"projector_{i}",
            )(h)

        if cfg.head_dim is None:
            if cfg.use_residual:
                h = h + residual
            return h

        seq = nn.Dense(
            cfg.head_dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc",
        )(nn.gelu(h, approximate=False))
        if cfg.use_residual:
            h = h + residual
        pooled = jnp.mean(h, axis=1)
        return pooled, seq
