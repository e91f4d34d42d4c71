"""Pallas TPU flash attention.

The one real custom kernel this framework needs (SURVEY.md §2c): the UNet's
self-attention at 64x64 latents is a 4096x4096 score matrix per head — the
XLA default materializes it in HBM; this kernel keeps the online-softmax
running state (m, l, acc) in VMEM and streams K/V blocks, so HBM traffic is
O(S*D) instead of O(S^2).

Layout: [BH, S, D] (batch*heads flattened). D is padded to a multiple of 128
lanes by the wrapper; padded K positions are masked via `kv_len`. fp32
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, kv_len, block_k):
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

    # mask padded kv tail (kv_len need not be a multiple of block_k)
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, 0:1]  # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # [bq, bk] f32
    corr = jnp.exp(m_prev - m_new)  # [bq, 1]
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable flash attention: Pallas forward kernel; backward
    recomputes the score matrix in XLA (adapter-grad KD training backprops
    through the frozen UNet's attention — train/kd.py). A Pallas backward
    kernel is a planned optimization; the XLA bwd is correct and remat-
    friendly at the KD operating points (kv<=4096)."""
    return _flash_attention_vjp(q, k, v, scale, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_vjp(q, k, v, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_bwd_rule(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bqd,bkd->bqk", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    # softmax vjp: dS = P * (dP - sum(P*dP, axis=-1, keepdims))
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_vjp.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: [BH, Sq, D], k/v: [BH, Skv, D] -> [BH, Sq, D].

    Handles ragged Sq/Skv/D by padding to tile multiples and masking K's tail;
    output is sliced back to the caller's shapes.
    """
    bh, sq, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)
    d_p = _round_up(d, 128)

    q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, d_p - d)))
    k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, d_p - d)))
    v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, d_p - d)))

    grid = (bh, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=skv, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d_p), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d_p), q.dtype),
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
    return out[:, :sq, :d]
