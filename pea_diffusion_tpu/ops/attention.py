"""Attention dispatch: Pallas flash kernel on TPU for long sequences, plain
XLA einsum-softmax otherwise (cross-attention over 77 text tokens gains
nothing from flash). Replaces the reference's torch-SDP/xformers dependency
(tests/test_sdxl_zh.py:16-21)."""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# Minimum query length for the flash path; below this the score matrix fits
# comfortably in VMEM and XLA's fusion is already optimal.
FLASH_MIN_SEQ = 1024


def _use_flash(sq: int, backend: str) -> bool:
    if backend == "flash":
        return True
    if backend == "xla":
        return False
    if os.environ.get("PEA_DISABLE_FLASH"):
        return False
    return jax.default_backend() == "tpu" and sq >= FLASH_MIN_SEQ


def xla_attention(q, k, v, scale, mask: Optional[jnp.ndarray] = None):
    """q: [BH, Sq, D]; softmax in fp32 for bf16 stability."""
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def xla_attention_bshd(q, k, v, scale):
    """[B, S, H, D] attention without head-major transposes: einsum keeps the
    head axis in place, so no layout copies hit HBM (the profiler showed
    6.7% of the SDXL step in `copy` — mostly attention transposes)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def use_flash(sq: int, backend: str = "auto") -> bool:
    return _use_flash(sq, backend)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",  # auto | flash | xla
) -> jnp.ndarray:
    """Multi-head attention over flattened [B*H, S, D] tensors."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if mask is None and _use_flash(q.shape[1], backend):
        # v5e-swept block sizes (docs/DESIGN.md §4): large kv blocks win —
        # S=4096: bq256/bk1024 3.40ms vs 5.84ms XLA; S=1024: bq512/bk1024.
        block_q = 256 if q.shape[1] >= 2048 else 512
        # PEA_FLASH_NO_DPAD: keep D=64 operands unpadded — halves every
        # q/k/v/dO/out HBM buffer at ~35% kernel slowdown (the training
        # memory mode for large micro-batches; see flash_attention docs)
        pad_d = not os.environ.get("PEA_FLASH_NO_DPAD")
        return flash_attention(q, k, v, scale=scale, block_q=block_q,
                               block_k=1024, pad_d=pad_d)
    return xla_attention(q, k, v, scale, mask)
