"""Shared building blocks for UNet / VAE / ControlNet.

TPU-first choices:
- NHWC layout everywhere (TPU conv native layout; torch converters transpose).
- Norms (GroupNorm/LayerNorm) computed in fp32, matmuls/convs in the module
  compute dtype (bf16 in pipelines), fp32 params.
- Attention runs through ops.attention (Pallas flash for long self-attn).
- No python control flow on traced values; dropout is structurally absent
  (the UNet is frozen in this framework — only the adapter trains).

Numerics match diffusers' SD-era blocks (resnet eps 1e-5, transformer GN eps
1e-6, GEGLU feed-forward, exact-erf GELU) so converted torch weights produce
the same outputs; cited per class.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embeddings, diffusers get_timestep_embedding parity."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    if flip_sin_to_cos:
        return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


def group_norm_grouped(x, scale, bias, num_groups: int, eps: float):
    """The pre-round-3 grouped-reshape formulation ([..., G, C/G] reduce),
    kept as an opt-in (PEA_GN_GROUPED=1) latency knob: at inference batch 1
    it measured FASTER end-to-end than the per-channel-sums form below
    (0.2587 vs 0.2515 img/s, BASELINE.md round 3) because at [1..2, H, W, C]
    the grouped reduce already tiles well and skips the two-step channel
    combine; at batch 8 and in KD training it LOSES (superlinear
    convert+reduce scaling + 125MB fp32 temps, DESIGN.md §9c). Identical
    math up to reduction-order rounding."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    shape = x.shape
    c = shape[-1]
    g = num_groups
    xg = x.reshape(shape[:-1] + (g, c // g))
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=red, keepdims=True)
    mean2 = (xg * xg).mean(axis=red, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(shape)
    x = x * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return x.astype(orig_dtype)


def group_norm(x, scale, bias, num_groups: int, eps: float):
    """fp32 GroupNorm over NHWC / N...C input with per-channel affine.

    Structured as per-CHANNEL spatial sums -> group math on tiny [N,C]/[N,G]
    vectors -> one fused per-channel affine. Two reasons, both measured:
    (1) the grouped-reshape reduce ([N,H,W,G,C/G]) forced fp32 layout
    copies of the full activation (125MB temps at KD mb8, the round-3 OOM
    dump) and tiled superlinearly at batch 8 in inference (DESIGN.md §9c:
    convert+reduce fusions grew 11.8x for 8x batch); the [N,...,C]->[N,C]
    reduce is XLA's best-tiled pattern and the big tensor is only ever
    touched by elementwise chains that fuse without materializing fp32.
    (2) stats still use one pass (E[x^2]-E[x]^2, fp32 accumulation) — same
    math as before up to reduction-order rounding.

    The formulation is auto-selected by the STATIC batch size (programs
    compile per batch anyway): b<=2 takes the grouped-reshape form — at
    [1..2, H, W, C] it measured faster end-to-end (b1 0.2587 vs 0.2515
    img/s, BASELINE.md rounds 3-4) and its fp32 temps are tiny — b>=3 the
    per-channel-sums form below. PEA_GN_GROUPED=1/0 forces grouped/sums
    (the measurement override)."""
    import os
    knob = os.environ.get("PEA_GN_GROUPED")
    if knob == "1" or (knob != "0" and x.shape[0] <= 2):
        return group_norm_grouped(x, scale, bias, num_groups, eps)
    orig_dtype = x.dtype
    shape = x.shape
    c = shape[-1]
    g = num_groups
    n = shape[0]
    xf = x.astype(jnp.float32)
    spatial = tuple(range(1, x.ndim - 1))
    s1 = xf.sum(axis=spatial)         # [N, C] (fuses with s2: one read)
    s2 = (xf * xf).sum(axis=spatial)  # [N, C]
    count = math.prod(shape[1:-1]) * (c // g)
    gs1 = s1.reshape(n, g, c // g).sum(-1)  # [N, G]
    gs2 = s2.reshape(n, g, c // g).sum(-1)
    mean = gs1 / count
    var = jnp.maximum(gs2 / count - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # broadcast group stats to channels, fold everything into y = x*a + b
    mean_c = jnp.broadcast_to(mean[:, :, None], (n, g, c // g)).reshape(n, c)
    rstd_c = jnp.broadcast_to(rstd[:, :, None], (n, g, c // g)).reshape(n, c)
    a = rstd_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    y = xf * a.reshape(bshape) + b.reshape(bshape)
    return y.astype(orig_dtype)


class GroupNorm(nn.Module):
    """GroupNorm with an optionally fused trailing activation and preceding
    per-(sample,channel) bias add (`extra_bias`, the resnet time-emb
    pattern). On TPU, eligible (act="silu", VMEM-sized) maps run the one-pass
    Pallas kernel (ops/groupnorm.py); everything else is the XLA path with
    identical math."""

    num_groups: int = 32
    eps: float = 1e-5
    act: str = "none"

    @nn.compact
    def __call__(self, x, extra_bias=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from ..ops.groupnorm import fused_gn_applicable, fused_group_norm
        if fused_gn_applicable(x, self.num_groups, self.act):
            return fused_group_norm(x, scale, bias, self.num_groups, self.eps,
                                    self.act, extra_bias)
        if extra_bias is not None:
            x = x + extra_bias[:, None, None, :].astype(x.dtype)
        y = group_norm(x, scale, bias, self.num_groups, self.eps)
        if self.act == "silu":
            y = nn.silu(y)
        return y


class ResnetBlock2D(nn.Module):
    """GN-silu-conv x2 with timestep bias and 1x1 shortcut (diffusers
    ResnetBlock2D, output_scale_factor=1).

    conv_quant "int8"/"int8:<scopes>" swaps in-scope convs for QConvInt8
    (int8 MXU serving path, quant/int8.py): the two 3x3s under the
    "resnet" scope, the 1x1 channel-matching conv under "shortcut";
    norms/time proj always stay float."""

    out_channels: int
    norm_num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"

    def _scopes(self):
        from ..quant.int8 import parse_scopes
        return parse_scopes(self.conv_quant)

    def _conv3x3(self, name: str):
        if "resnet" in self._scopes():
            from ..quant.int8 import QConvInt8
            return QConvInt8(self.out_channels, (3, 3), name=name)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=name)

    def _conv_shortcut(self):
        if "shortcut" in self._scopes():
            from ..quant.int8 import QConvInt8
            return QConvInt8(self.out_channels, (1, 1),
                             name="conv_shortcut")
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="conv_shortcut")

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_channels = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, self.eps, act="silu",
                      name="norm1")(x)
        h = self._conv3x3("conv1")(h)
        t = None
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
        # time-emb add + GN + silu fuse into one HBM pass on TPU
        h = GroupNorm(self.norm_num_groups, self.eps, act="silu",
                      name="norm2")(h, extra_bias=t)
        h = self._conv3x3("conv2")(h)
        if in_channels != self.out_channels:
            x = self._conv_shortcut()(x)
        return x + h


def _sampler_conv(out_channels, dtype, conv_quant, strides=(1, 1)):
    """The Downsample/Upsample 3x3 conv, int8 under the "sampler" scope."""
    from ..quant.int8 import parse_scopes
    if "sampler" in parse_scopes(conv_quant):
        from ..quant.int8 import QConvInt8
        return QConvInt8(out_channels, (3, 3), strides=strides, name="conv")
    return nn.Conv(out_channels, (3, 3), strides=strides, padding=1,
                   dtype=dtype, name="conv")


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"

    @nn.compact
    def __call__(self, x):
        return _sampler_conv(self.out_channels, self.dtype,
                             self.conv_quant, strides=(2, 2))(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _sampler_conv(self.out_channels, self.dtype,
                             self.conv_quant)(x)


class MultiHeadAttention(nn.Module):
    """QKV linear attention head wrapper over ops.attention (to_q/k/v bias-free,
    to_out biased — diffusers Attention)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"
    qkv_bias: bool = False  # UNet attn: False; VAE attn: True (diffusers parity)

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        from ..ops import onepass_attention
        from ..ops.attention import use_flash, xla_attention_bshd

        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(context)

        b, sq, _ = q.shape
        skv = k.shape[1]
        scale = 1.0 / math.sqrt(self.head_dim)

        if (use_flash(sq, self.backend)
                and onepass_attention.supports(sq, skv, self.num_heads,
                                               self.head_dim)):
            # one-pass BSHD kernel: no head-major transposes, no online-
            # softmax state (bench_attention.py: beats the flash path 15-30%
            # at every SDXL shape); grads route through the flash backward
            out = onepass_attention.bshd_attention(
                q, k, v, self.num_heads, self.head_dim, scale)
        elif use_flash(sq, self.backend):
            # head-major layout for the Pallas kernel
            def split(t, s):
                t = t.reshape(b, s, self.num_heads, self.head_dim)
                return t.transpose(0, 2, 1, 3).reshape(
                    b * self.num_heads, s, self.head_dim)

            out = dot_product_attention(
                split(q, sq), split(k, skv), split(v, skv),
                scale=scale, backend=self.backend)
            out = out.reshape(b, self.num_heads, sq, self.head_dim)
            out = out.transpose(0, 2, 1, 3).reshape(b, sq, inner)
        else:
            # XLA path: keep [B,S,H,D] — no transpose copies
            out = xla_attention_bshd(
                q.reshape(b, sq, self.num_heads, self.head_dim),
                k.reshape(b, skv, self.num_heads, self.head_dim),
                v.reshape(b, skv, self.num_heads, self.head_dim),
                scale).reshape(b, sq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2*4*dim, gate with exact gelu."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers stores one fused [C, 2I] proj whose output is chunked
        # into [h | gate]; here the halves are two matmuls (the converter
        # splits the fused weight, checkpoints/torch_convert.py). Same
        # FLOPs/fusions single-chip, but the halves column-shard locally
        # under tensor parallelism — a contiguous shard of the fused
        # [h | gate] output would split at the halves' boundary and force
        # a reshard at the gate (parallel/tp.py, DESIGN.md §3b).
        inner = self.dim * self.mult
        h = nn.Dense(inner, dtype=self.dtype, name="geglu_h")(x)
        gate = nn.Dense(inner, dtype=self.dtype, name="geglu_gate")(x)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class LayerNormFP32(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        mean2 = (x * x).mean(-1, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return x.astype(dt)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, pre-norm residuals."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x, context):
        x = x + MultiHeadAttention(
            self.num_heads, self.head_dim, self.dtype, self.backend,
            name="attn1",
        )(LayerNormFP32(name="norm1")(x))
        x = x + MultiHeadAttention(
            self.num_heads, self.head_dim, self.dtype, self.backend,
            name="attn2",
        )(LayerNormFP32(name="norm2")(x), context)
        dim = self.num_heads * self.head_dim
        x = x + FeedForward(dim, dtype=self.dtype, name="ff")(
            LayerNormFP32(name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """GN -> proj_in -> N transformer blocks over HW tokens -> proj_out + res.

    `use_linear_projection` only changes the stored weight shape (1x1 conv vs
    linear) — on TPU both run as a single matmul over [B*H*W, C].
    """

    num_heads: int
    head_dim: int
    depth: int
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.dtype, self.backend,
                name=f"blocks_{i}",
            )(x, context)
            # remat cut point: under the KD step's "blocks" policy (train/
            # kd.py save_only_these_names) each transformer block becomes its
            # own recompute segment, so backward liveness is one block's
            # internals — not the whole 10-layer stack's. Identity otherwise.
            x = checkpoint_name(x, "unet_seg")
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual
