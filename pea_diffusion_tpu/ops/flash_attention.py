"""Pallas TPU flash attention — forward and backward kernels.

The one real custom kernel family this framework needs (SURVEY.md §2c): the
UNet's self-attention at 64x64 latents is a 4096x4096 score matrix per head —
the XLA default materializes it in HBM; these kernels keep the online-softmax
running state in VMEM and stream K/V blocks, so HBM traffic is O(S*D) instead
of O(S^2) in BOTH directions (KD training backprops through the frozen UNet's
attention into the adapter, train/kd.py).

Layout: [BH, S, D] (batch*heads flattened). D is padded to a multiple of 128
lanes by the wrappers; padded K positions are masked via `kv_len`; padded Q
rows are harmless in backward because their dO rows are zero. fp32
accumulation regardless of input dtype (bf16 in the pipelines).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --- forward ------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                scale, kv_len, block_k, with_lse):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    if kv_len % block_k != 0:  # mask padded kv tail
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, 0:1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, 0:1] = m_new
    l_ref[:, 0:1] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)
        if with_lse:
            # lse is stored [BH, 8, Sq] with Sq in LANES: the (8, Sq) tail
            # tiles T(8,128) exactly, so the buffer is 6.5MB at mb10 train
            # shapes where the old [BH, Sq, 8] layout (8 lanes padded to
            # 128) was 100MB. One [bq,1]->[1,bq] transpose per q-block.
            lse = m_ref[:, 0:1] + jnp.log(l_ref[:, 0:1])
            lse_ref[0] = jnp.broadcast_to(
                jnp.transpose(lse, (1, 0)), lse_ref.shape[1:])


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_qkv(q, k, v, block_q, block_k, pad_d=True):
    """pad_d=True zero-pads D to 128 lanes (faster: Mosaic prefers full
    lanes — docs/DESIGN.md §9 negative result measured +36%); pad_d=False
    keeps D=64 operands unpadded, halving every q/k/v/dO/out HBM buffer in
    the region — the memory mode for large training micro-batches."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)
    d_p = _round_up(d, 128) if pad_d else d
    q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, d_p - d)))
    k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, d_p - d)))
    v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, d_p - d)))
    return q, k, v, block_q, block_k


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "with_lse",
                                             "pad_d"))
def _flash_forward_impl(q, k, v, scale=None, block_q=256, block_k=1024,
                        interpret=False, with_lse=False, pad_d=True):
    """[BH,Sq,D] x [BH,Skv,D] -> out [BH,Sq,D] (+ lse [BH,Sq] if with_lse)."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    q, k, v, block_q, block_k = _pad_qkv(q, k, v, block_q, block_k, pad_d)
    _, sq_p, d_p = q.shape
    skv_p = k.shape[1]

    grid = (bh, sq_p // block_q, skv_p // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=skv,
                          block_k=block_k, with_lse=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, qi, ki: (b, 0, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # m
            pltpu.VMEM((block_q, 128), jnp.float32),  # l
            pltpu.VMEM((block_q, d_p), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * skv_p * d_p,
            bytes_accessed=2 * bh * (sq_p + 2 * skv_p) * d_p,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=interpret,
    )(q, k, v)
    out = out[:, :sq, :d]
    if with_lse:
        return out, lse[:, 0, :sq]
    return out


# --- backward -----------------------------------------------------------------


def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dk_acc, dv_acc, *, scale, kv_len, block_k):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]              # [bq, d]
    k = k_ref[0]              # [bk, d]
    do = do_ref[0]            # [bq, d]
    # lse/delta ride [BH, 8, Sq] row-layout (see _fwd_kernel): take one
    # sublane row, transpose to the [bq, 1] column the q-row math needs
    lse = jnp.transpose(lse_ref[0, 0:1, :], (1, 0))
    delta = jnp.transpose(delta_ref[0, 0:1, :], (1, 0))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # [bq, bk]

    # dv += P^T dO
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP = dO V^T ; dS = P * (dP - delta)
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    # dk += dS^T q * scale
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_acc, *, scale, kv_len, block_k):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    lse = jnp.transpose(lse_ref[0, 0:1, :], (1, 0))
    delta = jnp.transpose(delta_ref[0, 0:1, :], (1, 0))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "pad_d"))
def _flash_backward_impl(q, k, v, out, lse, g, scale, block_q=256,
                         block_k=1024, interpret=False, pad_d=True):
    bh, sq, d = q.shape
    skv = k.shape[1]
    # delta_i = sum_d dO_i * O_i  (cheap rowwise; XLA fuses)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    q, k, v, block_q, block_k = _pad_qkv(q, k, v, block_q, block_k, pad_d)
    _, sq_p, d_p = q.shape
    skv_p = k.shape[1]
    g = jnp.pad(g, ((0, 0), (0, sq_p - sq), (0, d_p - d)))
    # lse/delta ride [BH, 8, Sq_p]: Sq in lanes tiles exactly (the old
    # [BH, Sq, 8] operands materialized 16x-padded T(8,128) buffers)
    lse = jnp.pad(lse, ((0, 0), (0, sq_p - sq)))
    delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    lse = jnp.broadcast_to(lse[:, None, :], (bh, 8, sq_p))
    delta = jnp.broadcast_to(delta[:, None, :], (bh, 8, sq_p))

    nq, nk = sq_p // block_q, skv_p // block_k

    qspec = pl.BlockSpec((1, block_q, d_p), lambda b, ki, qi: (b, qi, 0))
    kspec = pl.BlockSpec((1, block_k, d_p), lambda b, ki, qi: (b, ki, 0))
    rowspec = pl.BlockSpec((1, 8, block_q), lambda b, ki, qi: (b, 0, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, kv_len=skv,
                          block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=(
            pl.BlockSpec((1, block_k, d_p), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, ki, qi: (b, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d_p), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    q2 = pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0))
    k2 = pl.BlockSpec((1, block_k, d_p), lambda b, qi, ki: (b, ki, 0))
    row2 = pl.BlockSpec((1, 8, block_q), lambda b, qi, ki: (b, 0, qi))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=skv,
                          block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=[q2, k2, k2, q2, row2, row2],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d_p), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    return dq[:, :sq, :d], dk[:, :skv, :d], dv[:, :skv, :d]


# --- SPMD partitioning (multi-chip dp training) ----------------------------
#
# pallas_call is a custom call the SPMD partitioner treats as opaque: under
# a sharded jit (the dp/fsdp KD train step, parallel/mesh.py) it would
# all-gather q/k/v onto every device and run the full kernel replicated.
# The leading [B*H] axis is embarrassingly parallel — and it is the axis
# dp training actually shards (B over `data`) — so we register
# custom_partitioning over it; Sq/Skv/D are marked need-replication.
# Mirrors ops/onepass_attention.py (the inference kernel, which also
# shards head groups); dispatch keys on the ambient mesh so single-device
# use is untouched.


def _batch_plan(mesh, sharding, bh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = tuple(sharding.spec) if sharding.spec is not None else ()
    b_ax = (spec + (None,) * 3)[0]
    if b_ax is not None:
        names = (b_ax,) if isinstance(b_ax, str) else tuple(b_ax)
        n = 1
        for nm in names:
            n *= mesh.shape[nm]
        if bh % n != 0:
            b_ax = None
    return (NamedSharding(mesh, P(b_ax, None, None)),
            NamedSharding(mesh, P(b_ax, None)))


@functools.lru_cache(maxsize=None)
def _partitioned_forward(scale, block_q, block_k, interpret, with_lse,
                         pad_d):
    from jax.experimental.custom_partitioning import custom_partitioning

    def _run(q, k, v):
        return _flash_forward_impl(q, k, v, scale, block_q, block_k,
                                   interpret, with_lse, pad_d)

    fwd = custom_partitioning(_run)

    def partition(mesh, arg_shapes, result_shape):
        xsh, lsh = _batch_plan(mesh, arg_shapes[0].sharding,
                               arg_shapes[0].shape[0])
        outs = (xsh, lsh) if with_lse else xsh
        return mesh, _run, outs, (xsh, xsh, xsh)

    def infer(mesh, arg_shapes, shape):
        xsh, lsh = _batch_plan(mesh, arg_shapes[0].sharding,
                               arg_shapes[0].shape[0])
        return (xsh, lsh) if with_lse else xsh

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b q d, b k d, b k d -> b q d, b q" if with_lse
                       else "b q d, b k d, b k d -> b q d"),
        need_replication_factors=("q", "d", "k"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _partitioned_backward(scale, block_q, block_k, interpret, pad_d):
    from jax.experimental.custom_partitioning import custom_partitioning

    def _run(q, k, v, out, lse, g):
        return _flash_backward_impl(q, k, v, out, lse, g, scale, block_q,
                                    block_k, interpret, pad_d)

    bwd = custom_partitioning(_run)

    def partition(mesh, arg_shapes, result_shape):
        xsh, lsh = _batch_plan(mesh, arg_shapes[0].sharding,
                               arg_shapes[0].shape[0])
        return (mesh, _run, (xsh, xsh, xsh),
                (xsh, xsh, xsh, xsh, lsh, xsh))

    def infer(mesh, arg_shapes, shape):
        xsh, _ = _batch_plan(mesh, arg_shapes[0].sharding,
                             arg_shapes[0].shape[0])
        return (xsh, xsh, xsh)

    bwd.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b q d, b k d, b k d, b q d, b q, b q d "
                       "-> b q d, b k d, b k d"),
        need_replication_factors=("q", "d", "k"),
    )
    return bwd


def _flash_forward(q, k, v, scale=None, block_q=256, block_k=1024,
                   interpret=False, with_lse=False, pad_d=True):
    if not jax.sharding.get_abstract_mesh().empty:
        return _partitioned_forward(scale, block_q, block_k, interpret,
                                    with_lse, pad_d)(q, k, v)
    return _flash_forward_impl(q, k, v, scale, block_q, block_k, interpret,
                               with_lse, pad_d)


def _flash_backward(q, k, v, out, lse, g, scale, block_q=256, block_k=1024,
                    interpret=False, pad_d=True):
    if not jax.sharding.get_abstract_mesh().empty:
        return _partitioned_backward(scale, block_q, block_k, interpret,
                                     pad_d)(q, k, v, out, lse, g)
    return _flash_backward_impl(q, k, v, out, lse, g, scale, block_q,
                                block_k, interpret, pad_d)


# --- public API with custom VJP -------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
    pad_d: bool = True,
) -> jnp.ndarray:
    """Differentiable flash attention (Pallas fwd + Pallas bwd). pad_d=False
    trades kernel speed (Mosaic prefers 128-lane operands) for HALVED
    q/k/v/dO/out HBM buffers at D=64 — the training memory mode
    (PEA_FLASH_NO_DPAD)."""
    return _flash_attention_vjp(q, k, v, scale, block_q, block_k, interpret,
                                pad_d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_vjp(q, k, v, scale, block_q, block_k, interpret, pad_d):
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                          pad_d=pad_d)


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, interpret, pad_d):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                              with_lse=True, pad_d=pad_d)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(scale, block_q, block_k, interpret, pad_d, res, g):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k,
                           interpret, pad_d=pad_d)


_flash_attention_vjp.defvjp(_flash_fwd_rule, _flash_bwd_rule)
