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

TWO measured negative results — OFF by default (opt in with
PEA_FUSED_GROUPNORM=1):
- round 1, standalone GN (act="none"): wins in isolation (0.62 vs 0.73 ms at
  (2,32,32,1280)) but loses 6% end-to-end — the opaque custom call breaks
  XLA's fusion of the normalize with the ADJACENT silu/residual chain.
- round 2, whole-chain variant (temb add + GN + silu inside the kernel,
  nothing elementwise left outside to orphan; used by ResnetBlock2D via
  GroupNorm(act="silu")): wins 2.27x geomean in the on-chip microbench
  (bench_groupnorm.py) yet STILL loses 5.4% end-to-end (0.2432 vs 0.257
  img/s SDXL-1024) and costs +18 min program compile — the custom-call
  BOUNDARY itself is the problem: XLA can no longer fuse the preceding
  conv's epilogue into the norm input nor start the following conv's
  prologue from registers. Conclusion for this platform: XLA's own
  norm lowering inside a fused program beats any opaque norm kernel;
  speed-of-light here means leaving the chain to the compiler.
Differentiable via custom VJP; kept as an opt-in building block and as the
measurement harness for future XLA-fusion regressions.
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


# fp32 temporaries inside the kernel are CHUNKED over rows so the scoped
# VMEM stack holds only (chunk_h * w * c) fp32 at a time — a whole-block
# fp32 copy of (1,32,32,1280) plus the affine result blew the 16MB budget
# (measured: 19.94M scoped allocation)
_CHUNK_ELEMENTS = 360_000


def _chunk_rows(h: int, w: int, c: int) -> int:
    """Largest divisor of h whose chunk stays under _CHUNK_ELEMENTS."""
    best = 1
    for ch in range(1, h + 1):
        if h % ch == 0 and ch * w * c <= _CHUNK_ELEMENTS:
            best = ch
    return best


def _gn_body(x_ref, t, scale_ref, bias_ref, o_ref, *, groups, eps, act):
    """GN(x + t) WITHOUT materializing x + t (or even a full fp32 x): the
    per-channel bias t shifts the moments analytically —
        E_hw[(x+t)_c] = m_c + t_c,   E_hw[(x+t)_c^2] = q_c + 2 t_c m_c + t_c^2
    — and the normalize collapses to one per-channel affine y = x*A + B with
        A_c = inv_c * scale_c,  B_c = (t_c - mean_c) * A_c + bias_c.
    Stats and affine both stream the block in row chunks."""
    h, w, c = x_ref.shape[1:]
    cg = c // groups
    hw = h * w
    ch = _chunk_rows(h, w, c)
    n_chunks = h // ch

    def load(i):
        xb = x_ref[0, pl.ds(i * ch, ch)]
        return xb.reshape(ch * w, c).astype(jnp.float32)

    def stat_body(i, carry):
        s1, s2 = carry
        xf = load(i)
        return (s1 + jnp.sum(xf, axis=0, keepdims=True),
                s2 + jnp.sum(xf * xf, axis=0, keepdims=True))

    zeros = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, stat_body, (zeros, zeros))
    m_c = s1 / hw                                     # [1, C] mean
    q_c = s2 / hw                                     # [1, C] E[x^2]
    if t is not None:
        q_c = q_c + 2.0 * t * m_c + t * t
        m_c = m_c + t
    # group reduction via an indicator matmul — Mosaic cannot lower a
    # [C] -> (G, cg) shape cast, but [1,C]x[C,G] rides the MXU fine
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    group_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (chan_group == group_id).astype(jnp.float32)  # [C, G]
    g1 = jax.lax.dot_general(m_c, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / cg  # [1,G]
    g2 = jax.lax.dot_general(q_c, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / cg
    var_g = jnp.maximum(g2 - g1 * g1, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back per channel: [1,G] x [G,C]
    mean_c = jax.lax.dot_general(g1, m.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, m.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    a = inv_c * scale
    shift = -mean_c if t is None else t - mean_c
    b = shift * a + bias

    def norm_body(i, _):
        y = load(i) * a + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * ch, ch)] = y.reshape(ch, w, c).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, act):
    _gn_body(x_ref, None, scale_ref, bias_ref, o_ref, groups=groups,
             eps=eps, act=act)


def _gn_bias_kernel(x_ref, t_ref, scale_ref, bias_ref, o_ref, *,
                    groups, eps, act):
    """GN(x + t) with a per-(sample,channel) bias t — the resnet norm2
    pattern where the time-embedding projection is added right before the
    norm (diffusers ResnetBlock2D default time_embedding_norm)."""
    t = t_ref[0].astype(jnp.float32)  # [1, C]
    _gn_body(x_ref, t, scale_ref, bias_ref, o_ref, groups=groups,
             eps=eps, act=act)


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
    """Opt-in only (PEA_FUSED_GROUPNORM=1): both kernel designs beat XLA in
    isolation but LOSE end-to-end by severing XLA's fusion chains at the
    custom-call boundary — see module docstring for the measurements."""
    env = os.environ.get("PEA_FUSED_GROUPNORM")
    if env != "1":
        return False
    if x.ndim != 4 or x.shape[-1] % groups or x.shape[-1] % 128:
        return False
    per_sample = x.shape[1] * x.shape[2] * x.shape[3]
    return per_sample <= MAX_ELEMENTS and jax.default_backend() == "tpu"
