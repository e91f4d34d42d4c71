"""One-pass attention kernel sweep (VERDICT r4 #6): block sizes x variants.

The round-3/4 profile puts the one-pass kernel at 25.7% of the b8 SDXL
step (docs/DESIGN.md §9c) running at ~68 TFLOP/s at S=4096 — 34% of the
v5e bf16 peak. Roofline for D=64 says that is near the SERIAL bound, not
the HBM bound:

- MXU: both matmuls contract over D=64, half the 128-deep systolic array,
  so MXU utilization caps at 50% -> the matmul floor alone is
  2*4*D flops / (197e12 * 0.5) ~ 2.6 ps per score element.
- VPU: softmax costs ~6-10 elementwise ops per score element
  (max-reduce, subtract, exp, sum-reduce, bf16 cast) at ~6e12 op/s
  -> ~1.0-1.6 ps per element.
- Serial (no MXU/VPU overlap): 3.6-4.2 ps/elem -> 61-71 effective TF/s.
  Measured: 68. The kernel sits AT the serial bound.

The one lever left is overlapping the units: at D=64 each grid step owns
a GROUP of 2 heads whose chains are independent, so issuing group 1's
QK^T (MXU) before group 0's softmax (VPU) lets Mosaic's scheduler run
them concurrently. Perfect overlap bound: max(2.6, ~1.3) ps/elem ~ 98
TF/s, i.e. up to +45% kernel / ~+8% e2e at b8.

Variants swept here (self-contained copies; the winner is folded back
into ops/onepass_attention.py and re-verified by tests + parity):
  base    - ops/onepass_attention.py as shipped (per-group sequential)
  inter   - both groups' QK^T issued first, then softmax/PV interleaved
  exp2    - fold log2(e) into the QK scale, use exp2 (saves VPU ops/elem)
  inter2  - inter + exp2

Usage: python tools/sweep_onepass.py [--iters 20] [--out sweep.json]
"""
import argparse
import functools
import json
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)


def _kernel_variant(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, group,
                    kv_len, skv_p, interleave, use_exp2):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    need_mask = kv_len != skv_p
    neg = -1e30
    eff_scale = scale * LOG2E if use_exp2 else scale
    exp = jnp.exp2 if use_exp2 else jnp.exp

    def qk(g):
        lo = g * head_dim
        s = jax.lax.dot_general(
            q[:, lo:lo + head_dim], k[:, lo:lo + head_dim],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * eff_scale
        if need_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, neg)
        return s

    def softmax_pv(g, s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        lo = g * head_dim
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v[:, lo:lo + head_dim],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc / l

    if interleave and group > 1:
        scores = [qk(g) for g in range(group)]  # all MXU first
        outs = [softmax_pv(g, scores[g]) for g in range(group)]
    else:
        outs = [softmax_pv(g, qk(g)) for g in range(group)]
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel_bb(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, group,
               use_exp2, bb, bq):
    """Batch-blocked: q_ref [bb, bq, 128], k/v_ref [bb, skv, 128].

    K/V differ per batch row, so scores run per (row, group) but the rows
    share one grid step — bb x the MXU work per step, amortizing the
    per-step fixed cost that dominates at S=1024."""
    eff_scale = scale * LOG2E if use_exp2 else scale
    exp = jnp.exp2 if use_exp2 else jnp.exp
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
            p = exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v.dtype), v[:, lo:lo + head_dim],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(acc / l)
        o_ref[r] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "heads", "head_dim", "block_q", "interleave", "use_exp2", "batch_block"))
def forward_variant(q, k, v, heads, head_dim, block_q, interleave, use_exp2,
                    batch_block=1):
    b, sq, feat = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(head_dim)
    group = max(1, 128 // head_dim)
    lanes = group * head_dim
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, 128)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    bb = batch_block
    if bb > 1:
        assert b % bb == 0 and skv_p == skv and sq_p == sq
        grid = (b // bb, heads // group, sq_p // block_q)
        kern = functools.partial(_kernel_bb, scale=scale, head_dim=head_dim,
                                 group=group, use_exp2=use_exp2, bb=bb,
                                 bq=block_q)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, block_q, lanes),
                             lambda bi, hi, qi: (bi, qi, hi)),
                pl.BlockSpec((bb, skv_p, lanes),
                             lambda bi, hi, qi: (bi, 0, hi)),
                pl.BlockSpec((bb, skv_p, lanes),
                             lambda bi, hi, qi: (bi, 0, hi)),
            ],
            out_specs=pl.BlockSpec((bb, block_q, lanes),
                                   lambda bi, hi, qi: (bi, qi, hi)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, feat), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)
        return out
    grid = (b, heads // group, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_variant, scale=scale, head_dim=head_dim,
                          group=group, kv_len=skv, skv_p=skv_p,
                          interleave=interleave, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, lanes), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, skv_p, lanes), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, skv_p, lanes), lambda bi, hi, qi: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, lanes),
                               lambda bi, hi, qi: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, feat), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out[:, :sq, :] if sq_p != sq else out


def _sync(x):
    return float(jax.device_get(jnp.asarray(x).mean()))


def time_loop(step_fn, init, iters):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: step_fn(a), x)

    _sync(run(init))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sync(run(init))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument("--shapes", default="b16")
    ap.add_argument("--phase", type=int, default=1,
                    help="1: bq/inter/exp2 grid; 2: work-per-step variants "
                         "(whole-S blocks, batch-blocking)")
    args = ap.parse_args()

    from pea_diffusion_tpu.ops.onepass_attention import onepass_forward

    # serving-point shapes: batch 8 -> 16 CFG rows; b2 = batch-1 latency
    all_shapes = {
        "b16": [("lvl1-self b8", 16, 10, 4096, 64),
                ("lvl2-self b8", 16, 20, 1024, 64)],
        "b2": [("lvl1-self b1", 2, 10, 4096, 64),
               ("lvl2-self b1", 2, 20, 1024, 64)],
    }
    shapes = sum((all_shapes[k] for k in args.shapes.split(",")), [])

    rng = np.random.default_rng(0)
    results = []
    for label, b, h, s, d in shapes:
        q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        tflop = 4 * b * h * s * s * d / 1e12

        # reference output for parity (current shipped kernel)
        ref = onepass_forward(q, k, v, h, d)

        def report(name, fn):
            try:
                o = fn(q)
                err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                dt = time_loop(fn, q, args.iters)
            except Exception as e:
                print(json.dumps({"shape": label, "variant": name,
                                  "error": f"{type(e).__name__}: "
                                           f"{str(e)[:160]}"}))
                return
            row = {"shape": label, "variant": name,
                   "us": round(dt * 1e6, 1),
                   "tflops": round(tflop / dt, 1),
                   "max_abs_err_vs_base": err}
            results.append(row)
            print(json.dumps(row))

        report("base(shipped)", lambda x: onepass_forward(x, k, v, h, d))
        if args.phase == 1:
            for bq in (128, 256, 512):
                if bq > s:
                    continue
                for inter in (False, True):
                    for e2 in (False, True):
                        name = (f"bq{bq}" + ("+inter" if inter else "")
                                + ("+exp2" if e2 else ""))
                        report(name, functools.partial(
                            forward_variant, k=k, v=v, heads=h, head_dim=d,
                            block_q=bq, interleave=inter, use_exp2=e2))
        else:
            # phase 2: amortize the per-grid-step fixed cost (dominant at
            # S=1024: 7.9us/step vs ~3us of ideal compute) with more work
            # per step — whole-S query blocks and batch-blocking
            cands = []
            if s == 1024:
                cands += [(1024, 1), (512, 2), (1024, 2), (512, 4),
                          (1024, 4)]
            else:
                cands += [(512, 1), (256, 2), (512, 2)]
            for bq, bb in cands:
                if b % bb:
                    continue
                name = f"bq{bq}" + (f"+bb{bb}" if bb > 1 else "") + "+exp2"
                report(name, functools.partial(
                    forward_variant, k=k, v=v, heads=h, head_dim=d,
                    block_q=bq, interleave=False, use_exp2=True,
                    batch_block=bb))
                report(name[:-5], functools.partial(
                    forward_variant, k=k, v=v, heads=h, head_dim=d,
                    block_q=bq, interleave=False, use_exp2=False,
                    batch_block=bb))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
