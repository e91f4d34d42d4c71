"""Fused GroupNorm(+SiLU, +channel-bias add) Pallas kernel.

Motivation (docs/DESIGN.md §9): norm stat reductions are ~17% of an SDXL UNet
step — NOT bandwidth-bound (228 small fp32 convert+reduce ops) but
launch/occupancy-bound. With the whole per-sample feature map resident in
VMEM this kernel does ONE HBM read + ONE write: the optional preceding
time-embedding bias add (resnet norm2 pattern `GN(h + temb)`), stats,
normalize, affine and the following SiLU all happen on-chip.

Applicability: the per-sample map plus two fp32 temporaries must fit the
VMEM stack (<= ~1.4M elements — the 32x32x1280-class maps where most of the
SDXL UNet's norms live); larger maps fall back to the XLA path.

Round-1 lesson (standalone-GN variant, act="none"): the kernel wins in
isolation (0.62 vs 0.73 ms at (2,32,32,1280)) but LOSES end-to-end — the
opaque custom call breaks XLA's fusion of the normalize with the ADJACENT
silu/residual elementwise chain. Round 2 therefore fuses the whole
GN(+add)->silu chain INSIDE the kernel (nothing elementwise is left outside
to orphan), used by ResnetBlock2D via GroupNorm(act="silu"). act="none"
standalone use stays opt-in (PEA_FUSED_GROUPNORM=1); act="silu" defaults ON
(PEA_FUSED_GROUPNORM=0 disables). Differentiable via custom VJP.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the kernel holds the map in bf16 + two fp32 temporaries on the VMEM stack,
# so applicability is bounded by ~1.2M elements per sample (32x32x1280-class
# maps — where most of the SDXL UNet's norms live)
MAX_ELEMENTS = 1_400_000  # includes 32x32x1280 (13MB peak VMEM, measured OK)


def _gn_stats_normalize(x, scale_ref, bias_ref, o_ref, *, groups, eps, act,
                        h, w, c):
    cg = c // groups
    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)  # [1, C]
    # group reduction via an indicator matmul — Mosaic cannot lower a
    # [C] -> (G, cg) shape cast, but [1,C]x[C,G] rides the MXU fine
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    group_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (chan_group == group_id).astype(jnp.float32)  # [C, G]
    n = h * w * cg
    g1 = jax.lax.dot_general(s1, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n  # [1,G]
    g2 = jax.lax.dot_general(s2, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n
    var_g = jnp.maximum(g2 - g1 * g1, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back per channel: [1,G] x [G,C]
    mean_c = jax.lax.dot_general(g1, m.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, m.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    y = (x - mean_c) * inv_c * scale + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(h, w, c).astype(o_ref.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, act):
    h, w, c = x_ref.shape[1:]
    x = x_ref[0].reshape(h * w, c).astype(jnp.float32)
    _gn_stats_normalize(x, scale_ref, bias_ref, o_ref, groups=groups,
                        eps=eps, act=act, h=h, w=w, c=c)


def _gn_bias_kernel(x_ref, t_ref, scale_ref, bias_ref, o_ref, *,
                    groups, eps, act):
    """GN(x + t) with a per-(sample,channel) bias t — the resnet norm2
    pattern where the time-embedding projection is added right before the
    norm (diffusers ResnetBlock2D default time_embedding_norm)."""
    h, w, c = x_ref.shape[1:]
    x = x_ref[0].reshape(h * w, c).astype(jnp.float32)
    x = x + t_ref[0].astype(jnp.float32)  # t block [1,1,C] -> [1,C] rows
    _gn_stats_normalize(x, scale_ref, bias_ref, o_ref, groups=groups,
                        eps=eps, act=act, h=h, w=w, c=c)


def fused_group_norm(x, scale, bias, groups: int, eps: float = 1e-5,
                     act: str = "none", extra_bias=None,
                     interpret: bool = False):
    """x: [B,H,W,C] NHWC -> GroupNorm(x [+ extra_bias[B,C]])(+optional silu),
    one pass over HBM. Differentiable: backward falls back to the XLA
    group_norm VJP (KD training backprops through the frozen UNet's norms)."""
    if extra_bias is None:
        return _fused_gn_vjp(x, scale, bias, groups, eps, act, interpret)
    return _fused_gnb_vjp(x, extra_bias, scale, bias, groups, eps, act,
                          interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn_vjp(x, scale, bias, groups, eps, act, interpret):
    return _fused_gn_fwd_only(x, scale, bias, groups, eps, act, interpret)


def _reference_gn(x, scale, bias, groups, eps, act, extra_bias=None):
    from ..models.layers import group_norm

    if extra_bias is not None:
        x = x + extra_bias[:, None, None, :].astype(x.dtype)
    y = group_norm(x, scale, bias, groups, eps)
    if act == "silu":
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
    return y


def _fused_gn_fwd_rule(x, scale, bias, groups, eps, act, interpret):
    out = _fused_gn_fwd_only(x, scale, bias, groups, eps, act, interpret)
    return out, (x, scale, bias)


def _fused_gn_bwd_rule(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _reference_gn(x, s, b, groups, eps, act),
        x, scale, bias)
    return vjp(g)


_fused_gn_vjp.defvjp(_fused_gn_fwd_rule, _fused_gn_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_gnb_vjp(x, t, scale, bias, groups, eps, act, interpret):
    return _fused_gnb_fwd_only(x, t, scale, bias, groups, eps, act, interpret)


def _fused_gnb_fwd_rule(x, t, scale, bias, groups, eps, act, interpret):
    out = _fused_gnb_fwd_only(x, t, scale, bias, groups, eps, act, interpret)
    return out, (x, t, scale, bias)


def _fused_gnb_bwd_rule(groups, eps, act, interpret, res, g):
    x, t, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, t, s, b: _reference_gn(x, s, b, groups, eps, act,
                                         extra_bias=t),
        x, t, scale, bias)
    return vjp(g)


_fused_gnb_vjp.defvjp(_fused_gnb_fwd_rule, _fused_gnb_bwd_rule)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act",
                                             "interpret"))
def _fused_gnb_fwd_only(x, t, scale, bias, groups: int, eps: float = 1e-5,
                        act: str = "none", interpret: bool = False):
    b, h, w, c = x.shape
    out = pl.pallas_call(
        functools.partial(_gn_bias_kernel, groups=groups, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            # [B,1,C] with a unit row dim: Mosaic requires the last-two
            # block dims to divide (8,128) or equal the array dims
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, t[:, None, :], scale[None], bias[None])
    return out


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act", "interpret"))
def _fused_gn_fwd_only(x, scale, bias, groups: int, eps: float = 1e-5,
                       act: str = "none", interpret: bool = False):
    b, h, w, c = x.shape
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, scale[None], bias[None])
    return out


def fused_gn_applicable(x, groups: int, act: str = "none") -> bool:
    """act="silu" (the whole resnet GN->silu chain lives in the kernel —
    nothing left outside for XLA to orphan) defaults ON; act="none"
    (standalone GN, loses end-to-end by breaking XLA fusion chains — round-1
    negative result) stays opt-in. PEA_FUSED_GROUPNORM=1 forces all on,
    =0 forces all off."""
    env = os.environ.get("PEA_FUSED_GROUPNORM")
    if env == "0":
        return False
    if env != "1" and act == "none":
        return False
    if x.ndim != 4 or x.shape[-1] % groups or x.shape[-1] % 128:
        return False
    per_sample = x.shape[1] * x.shape[2] * x.shape[3]
    return per_sample <= MAX_ELEMENTS and jax.default_backend() == "tpu"
