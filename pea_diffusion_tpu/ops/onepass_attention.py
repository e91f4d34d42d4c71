"""One-pass Pallas TPU attention reading [B, S, H*D] directly.

Inference-path successor to the head-major flash kernel for the diffusion
UNet's self-attention (reference dependency: torch SDP/xformers,
/root/reference/tests/test_sdxl_zh.py:16-21). At SDXL shapes (S = 1024 and
4096, D = 64) the whole KV sequence fits in one VMEM block, so the
online-softmax running state of a classic flash kernel is pure overhead, and
the [B,S,H,D] -> [B*H,S,D] head-major transposes around it are the largest
remaining `copy` cost in the profiled step (docs/DESIGN.md S9).

This kernel removes both:

- **Layout**: operates on the natural `[B, S, H*D]` output of the QKV
  projections. Each grid step owns a 128-lane slice of the feature axis,
  i.e. a *group* of `128 // head_dim` heads (2 heads at D=64, 1 at D=128),
  so block offsets stay 128-lane aligned and no transpose ever touches HBM.
- **Softmax**: the full score row lives in VMEM ([block_q, S_kv] fp32), so
  softmax is the plain max/exp/sum - no running max, no correction term,
  no scratch accumulators, no @pl.when epilogue.

Grid: (B, H // group, Sq / block_q); K/V block index is constant in the
query dimension, so Mosaic keeps K/V resident in VMEM across query blocks
(fetched once per head group).

Backward: gradients route through the proven head-major flash backward via
custom_vjp (the transposes only exist when differentiated, i.e. in KD
training, which already paid them in round 1).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LOG2E = math.log2(math.e)

# Max fp32 score-matrix elements held in VMEM per grid step (4 MB).
_MAX_SCORE_ELEMS = 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, group, kv_len,
            skv_p):
    """q_ref [1, bq, 128]; k/v_ref [1, skv_p, 128]; o_ref [1, bq, 128]."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    need_mask = kv_len != skv_p
    outs = []
    for g in range(group):
        lo = g * head_dim
        qg = q[:, lo:lo + head_dim]
        kg = k[:, lo:lo + head_dim]
        s = jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, skv]
        if need_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v[:, lo:lo + head_dim],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        outs.append(acc / l)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _kernel_bb(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, group, bb):
    """Batch-blocked long-KV kernel: q_ref [bb, bq, 128], k/v_ref
    [bb, skv, 128] — bb batch rows share one grid step, amortizing the
    per-step fixed cost (round-5 sweep, tools/sweep_onepass.py phase 2:
    bq256+bb2+exp2 = 68.2-68.5 TF/s vs 65.6-65.8 shipped at S=4096, b16).
    exp2 with the folded log2(e) scale is REQUIRED here: the otherwise
    identical exp() variant crashes the Mosaic compiler (4x retried,
    docs/sweep_onepass_r5_p2_retry.json). No KV mask: callers guarantee
    skv == skv_p (the eligibility gate in _forward_impl)."""
    eff_scale = scale * _LOG2E
    for r in range(bb):
        q = q_ref[r]
        k = k_ref[r]
        v = v_ref[r]
        outs = []
        for g in range(group):
            lo = g * head_dim
            s = jax.lax.dot_general(
                q[:, lo:lo + head_dim], k[:, lo:lo + head_dim],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * eff_scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v.dtype), v[:, lo:lo + head_dim],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            outs.append(acc / l)
        o_ref[r] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def supports(sq: int, skv: int, heads: int, head_dim: int) -> bool:
    """Shapes where the one-pass kernel WINS on v5e (bench_attention.py):
    128-lane head groups, a score matrix that fits VMEM alongside K/V, and a
    long-enough KV. Short-KV cross-attention (77 text tokens) stays on XLA —
    measured 8us vs 56us per call: the kernel's K/V fetch granularity loses
    to XLA's fully-fused small-matmul path."""
    if head_dim == 64 and heads % 2 == 0:
        pass
    elif head_dim == 128:
        pass
    else:
        return False
    skv_p = _round_up(skv, 128)
    if 128 * skv_p > _MAX_SCORE_ELEMS:  # even bq=128 rows would not fit
        return False
    return sq >= 128 and skv >= 512


def _auto_block_q(sq_p: int, skv_p: int) -> int:
    # Short-KV shapes (SDXL level 2: S=1024) take whole-S query blocks:
    # measured 38.2 vs 36.2 TF/s for bq1024 vs the old 512 cap (round-5
    # sweep phase 2) — the per-grid-step fixed cost dominates there, so
    # fewer/fatter steps win. Long-KV shapes keep the VMEM-budget cap.
    cap = 1024 if skv_p <= 1024 else 512
    bq = _MAX_SCORE_ELEMS // skv_p
    bq = max(128, min(cap, bq // 128 * 128))
    return min(bq, sq_p)


def _auto_batch_block(b, sq, skv, sq_p, skv_p, bq):
    """Batch-block eligibility for the measured long-KV fast path
    (bq256+bb2+exp2, +4% at S=4096 b16): even batch, no KV mask, no query
    padding, and whole 256-row query blocks. Everything else keeps the
    general bb=1 kernel."""
    if (skv_p >= 2048 and b % 2 == 0 and skv == skv_p and sq == sq_p
            and bq == 256 and sq_p % bq == 0):
        return 2
    return 1


@functools.partial(jax.jit, static_argnames=("heads", "head_dim", "scale",
                                             "block_q", "interpret"))
def _forward_impl(q, k, v, heads, head_dim, scale=None, block_q=None,
                  interpret=False):
    """Single-device kernel launch: q [B,Sq,H*D] x k,v [B,Skv,H*D]."""
    b, sq, feat = q.shape
    skv = k.shape[1]
    assert feat == heads * head_dim, (feat, heads, head_dim)
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    group = max(1, 128 // head_dim)
    assert heads % group == 0
    lanes = group * head_dim  # 128

    sq_p = _round_up(sq, 128)
    skv_p = _round_up(skv, 128)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))

    bq = block_q or _auto_block_q(sq_p, skv_p)
    bq = min(bq, sq_p)
    if sq_p % bq != 0:
        pad_to = _round_up(sq_p, bq)
        q = jnp.pad(q, ((0, 0), (0, pad_to - sq_p), (0, 0)))
        sq_p = pad_to

    bb = 1 if block_q else _auto_batch_block(b, sq, skv, sq_p, skv_p, bq)
    cost = pl.CostEstimate(
        flops=4 * b * heads * sq_p * skv_p * head_dim,
        bytes_accessed=2 * b * feat * (2 * sq_p + 2 * skv_p),
        transcendentals=b * heads * sq_p * skv_p,
    )
    if bb > 1:
        grid = (b // bb, heads // group, sq_p // bq)
        out = pl.pallas_call(
            functools.partial(_kernel_bb, scale=scale, head_dim=head_dim,
                              group=group, bb=bb),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, bq, lanes),
                             lambda bi, hi, qi: (bi, qi, hi)),
                pl.BlockSpec((bb, skv_p, lanes),
                             lambda bi, hi, qi: (bi, 0, hi)),
                pl.BlockSpec((bb, skv_p, lanes),
                             lambda bi, hi, qi: (bi, 0, hi)),
            ],
            out_specs=pl.BlockSpec((bb, bq, lanes),
                                   lambda bi, hi, qi: (bi, qi, hi)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, feat), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
        return out  # bb path has sq == sq_p by construction

    grid = (b, heads // group, sq_p // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, head_dim=head_dim,
                          group=group, kv_len=skv, skv_p=skv_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, lanes), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, skv_p, lanes), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, skv_p, lanes), lambda bi, hi, qi: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec((1, bq, lanes),
                               lambda bi, hi, qi: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, feat), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)
    return out[:, :sq, :] if sq_p != sq else out


# --- SPMD partitioning (tensor-parallel inference) -------------------------
#
# pallas_call lowers to a custom call, which the SPMD partitioner treats as
# opaque: under a sharded jit it would all-gather q/k/v onto every device
# and run the full kernel replicated. The head axis is embarrassingly
# parallel, so we register the partitioning ourselves
# (jax.experimental.custom_partitioning): batch and the [H*D] feature axis
# shard freely (feature in whole 128-lane head groups — the kernel's own
# grid unit), Skv is marked need-replication (softmax reduces over it).
# Under the tensor-parallel layout (parallel/tp.py) the to_q/k/v outputs
# arrive head-sharded, each device runs the kernel on its local heads, and
# no attention collective is inserted at all — the one psum stays where
# Megatron puts it, after to_out.


def _axis_count(mesh, entry) -> int:
    if entry is None:
        return 1
    names = (entry,) if isinstance(entry, str) else tuple(entry)
    n = 1
    for nm in names:
        n *= mesh.shape[nm]
    return n


@functools.lru_cache(maxsize=None)
def _partitioned_forward(heads, head_dim, scale, block_q, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    group = max(1, 128 // head_dim)

    def _fwd(q, k, v):
        return _forward_impl(q, k, v, heads, head_dim, scale, block_q,
                             interpret)

    fwd = custom_partitioning(_fwd)

    def _norm_spec(sharding, rank=3):
        spec = tuple(sharding.spec) if sharding.spec is not None else ()
        return tuple(spec) + (None,) * (rank - len(spec))

    def _plan(mesh, q_sharding):
        b_ax, sq_ax, f_ax = _norm_spec(q_sharding)
        nf = _axis_count(mesh, f_ax)
        if heads % nf != 0 or (heads // nf) % group != 0:
            f_ax = None  # shard would split a 128-lane head group
        qs = NamedSharding(mesh, P(b_ax, sq_ax, f_ax))
        kvs = NamedSharding(mesh, P(b_ax, None, f_ax))
        return qs, kvs

    def partition(mesh, arg_shapes, result_shape):
        qs, kvs = _plan(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k, v):
            local_heads = q.shape[-1] // head_dim
            return _forward_impl(q, k, v, local_heads, head_dim, scale,
                                 block_q, interpret)

        return mesh, lower_fn, qs, (qs, kvs, kvs)

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        qs, _ = _plan(mesh, arg_shapes[0].sharding)
        return qs

    def propagate_user_sharding(mesh, user_shape):
        return user_shape.sharding

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        propagate_user_sharding=propagate_user_sharding,
        sharding_rule="b sq f, b skv f, b skv f -> b sq f",
        need_replication_factors=("skv",),
    )
    return fwd


def onepass_forward(q, k, v, heads, head_dim, scale=None, block_q=None,
                    interpret=False):
    """q [B, Sq, H*D] x k,v [B, Skv, H*D] -> [B, Sq, H*D].

    Under an ambient mesh (jax.set_mesh) the call goes through the
    custom-partitioned wrapper so tensor-parallel programs keep the Pallas
    kernel per-shard instead of falling back to XLA attention."""
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if not jax.sharding.get_abstract_mesh().empty:
        return _partitioned_forward(heads, head_dim, scale, block_q,
                                    interpret)(q, k, v)
    return _forward_impl(q, k, v, heads, head_dim, scale, block_q, interpret)


# --- differentiable wrapper ------------------------------------------------


def _to_head_major(t, heads, head_dim):
    b, s, _ = t.shape
    return (t.reshape(b, s, heads, head_dim)
             .transpose(0, 2, 1, 3)
             .reshape(b * heads, s, head_dim))


def _from_head_major(t, b, heads, head_dim):
    s = t.shape[1]
    return (t.reshape(b, heads, s, head_dim)
             .transpose(0, 2, 1, 3)
             .reshape(b, s, heads * head_dim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bshd_attention(q, k, v, heads, head_dim, scale=None, interpret=False):
    """Differentiable [B,S,H*D] attention: one-pass Pallas forward when
    evaluated, head-major flash fwd+bwd when differentiated (KD training)."""
    return onepass_forward(q, k, v, heads, head_dim, scale,
                           interpret=interpret)


def _bshd_fwd_rule(q, k, v, heads, head_dim, scale, interpret):
    from .flash_attention import _flash_forward
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    b = q.shape[0]
    qm = _to_head_major(q, heads, head_dim)
    km = _to_head_major(k, heads, head_dim)
    vm = _to_head_major(v, heads, head_dim)
    out, lse = _flash_forward(qm, km, vm, scale, interpret=interpret,
                              with_lse=True)
    return (_from_head_major(out, b, heads, head_dim),
            (qm, km, vm, out, lse))


def _bshd_bwd_rule(heads, head_dim, scale, interpret, res, g):
    from .flash_attention import _flash_backward
    qm, km, vm, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    b = g.shape[0]
    gm = _to_head_major(g, heads, head_dim)
    dq, dk, dv = _flash_backward(qm, km, vm, out, lse, gm, scale,
                                 interpret=interpret)
    return (_from_head_major(dq, b, heads, head_dim),
            _from_head_major(dk, b, heads, head_dim),
            _from_head_major(dv, b, heads, head_dim))


bshd_attention.defvjp(_bshd_fwd_rule, _bshd_bwd_rule)
