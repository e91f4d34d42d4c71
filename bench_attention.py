"""On-chip microbenchmarks for the UNet hot ops: attention variants + norms.

Measures, at the exact SDXL inference shapes (docs/DESIGN.md S9 profile),
each attention implementation and the XLA norm cost, to drive kernel
choices with hardware numbers instead of interpret-mode guesses
(VERDICT round-1 items 1 and 4).

Usage: python bench_attention.py [--section attn|norm|parity|all] [--iters 30]
Prints one JSON line per measurement.
"""
import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jax.device_get(jnp.asarray(x).mean()))


def time_loop(step_fn, init, iters):
    """step_fn: x -> x (same shape). Returns seconds per iteration."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: step_fn(a), x)

    _sync(run(init))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sync(run(init))
        best = min(best, time.time() - t0)
    return best / iters


def bench_attn(iters):
    from pea_diffusion_tpu.ops.attention import xla_attention_bshd
    from pea_diffusion_tpu.ops.flash_attention import flash_attention
    from pea_diffusion_tpu.ops.onepass_attention import (onepass_forward,
                                                         supports)

    # (label, B, H, Sq, Skv, D) — SDXL CFG-pair step shapes, plus batch-4
    shapes = [
        ("sdxl-lvl1 self", 2, 10, 4096, 4096, 64),
        ("sdxl-lvl2 self", 2, 20, 1024, 1024, 64),
        ("sdxl-lvl1 self b4", 8, 10, 4096, 4096, 64),
        ("sdxl-lvl2 self b4", 8, 20, 1024, 1024, 64),
        ("sdxl-lvl2 cross", 2, 20, 1024, 77, 64),
    ]
    rng = np.random.default_rng(0)
    results = []
    for label, b, h, sq, skv, d in shapes:
        q = jnp.array(rng.standard_normal((b, sq, h * d)), jnp.bfloat16)
        k = jnp.array(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)
        v = jnp.array(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)
        self_attn = sq == skv

        variants = {}
        variants["xla_bshd"] = lambda x: xla_attention_bshd(
            x.reshape(b, sq, h, d), k.reshape(b, skv, h, d),
            v.reshape(b, skv, h, d), scale).reshape(b, sq, h * d)

        def hm(t, s):
            return (t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                    .reshape(b * h, s, d))

        if self_attn:
            km, vm = hm(k, skv), hm(v, skv)
            bq = 256 if sq >= 2048 else 512

            def flash_step(x, bq=bq):
                o = flash_attention(hm(x, sq), km, vm, scale=scale,
                                    block_q=bq, block_k=1024)
                return (o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
                        .reshape(b, sq, h * d))
            variants["flash_hm"] = flash_step

        if supports(sq, skv, h, d):
            for bq in (256, 512, 1024):
                if bq <= sq and bq * min(skv, 4096) * 4 <= 8 * 2**20:
                    variants[f"onepass_bq{bq}"] = functools.partial(
                        lambda x, bq: onepass_forward(
                            x, k, v, h, d, scale, block_q=bq), bq=bq)

        # ideal: 4*B*H*Sq*Skv*D flops at D=64 -> MXU-inherent 50% of peak
        flops = 4 * b * h * sq * skv * d
        for name, fn in variants.items():
            try:
                dt = time_loop(fn, q, iters)
            except Exception as e:  # noqa: BLE001 — report and continue sweep
                print(json.dumps({"bench": "attn", "shape": label,
                                  "variant": name, "error": str(e)[:200]}))
                continue
            rec = {"bench": "attn", "shape": label, "variant": name,
                   "ms": round(dt * 1e3, 4),
                   "tflops": round(flops / dt / 1e12, 1)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return results


def bench_parity():
    """On-HARDWARE numeric parity (VERDICT r1 item 4): the Pallas one-pass
    forward and the flash fwd+bwd (custom VJP) vs the XLA reference, at the
    UNet shapes, asserted — interpret-mode tests can't catch Mosaic lowering
    differences. bf16 inputs, fp32 comparison."""
    from pea_diffusion_tpu.ops.attention import xla_attention_bshd
    from pea_diffusion_tpu.ops.flash_attention import flash_attention
    from pea_diffusion_tpu.ops.onepass_attention import onepass_forward

    rng = np.random.default_rng(1)
    out = []
    for b, h, s, d in [(2, 10, 4096, 64), (2, 20, 1024, 64)]:
        q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)

        def xla_bshd(q, k, v):
            return xla_attention_bshd(
                q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                v.reshape(b, s, h, d), scale).reshape(b, s, h * d)

        ref = np.asarray(jax.device_get(jax.jit(xla_bshd)(q, k, v)),
                         np.float32)
        one = np.asarray(jax.device_get(jax.jit(
            lambda q, k, v: onepass_forward(q, k, v, h, d, scale))(q, k, v)),
            np.float32)
        err_fwd = float(np.abs(one - ref).max())

        def hm(t):
            return (t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                    .reshape(b * h, s, d))

        w = jnp.array(rng.standard_normal(ref.shape), jnp.bfloat16)

        def loss_flash(q, k, v):
            o = flash_attention(hm(q), hm(k), hm(v), scale=scale)
            o = (o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
                 .reshape(b, s, h * d))
            return jnp.sum(o.astype(jnp.float32) * w.astype(jnp.float32))

        def loss_xla(q, k, v):
            return jnp.sum(xla_bshd(q, k, v).astype(jnp.float32)
                           * w.astype(jnp.float32))

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
        errs_g = [float(np.abs(np.asarray(jax.device_get(a), np.float32)
                               - np.asarray(jax.device_get(r), np.float32)).max())
                  for a, r in zip(gf, gx)]
        # bf16 inputs, O(1) values, row-sums over S: rounding-dominated
        gscale = float(np.sqrt(s))  # grad magnitudes grow with the w-sum
        rec = {"bench": "parity", "shape": [b, h, s, d],
               "onepass_fwd_max_abs_err": err_fwd,
               "flash_grad_max_abs_err": errs_g,
               "device": str(jax.devices()[0])}
        print(json.dumps(rec), flush=True)
        assert err_fwd < 2e-2, rec
        assert all(e < 0.25 * gscale / 32 for e in errs_g), rec
        out.append(rec)
    return out


def bench_calibration(iters):
    """Floor of the timing harness (fori_loop + relay dispatch overhead):
    an elementwise add on a small tensor. Subtract this from sub-ms ops."""
    x = jnp.ones((8, 128), jnp.bfloat16)
    dt = time_loop(lambda a: a + 1, x, iters)
    print(json.dumps({"bench": "calibration", "op": "add1",
                      "us_per_iter": round(dt * 1e6, 2)}), flush=True)


def bench_norm(iters):
    """XLA LayerNorm (fp32 stats) and GroupNorm cost at UNet shapes."""
    def ln(x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        mean2 = (xf * xf).mean(-1, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    def gn(x, groups=32):
        b, hh, ww, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, hh * ww, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        mean2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        return xf.reshape(b, hh, ww, c).astype(x.dtype)

    def gn_silu(x):
        y = gn(x)
        return y * jax.nn.sigmoid(y)

    def gn_matmul(x, groups=32):
        """Group stats via an indicator matmul on the MXU — avoids the
        (B,HW,G,C/G) reshape-reduce whose 20-lane minor axis relayouts."""
        b, hh, ww, c = x.shape
        cg = c // groups
        ind = jnp.repeat(jnp.eye(groups, dtype=jnp.float32), cg, axis=0)  # [C,G]
        xf = x.astype(jnp.float32).reshape(b, hh * ww, c)
        s1 = jnp.einsum("bnc,cg->bg", xf, ind)
        s2 = jnp.einsum("bnc,cg->bg", xf * xf, ind)
        n = hh * ww * cg
        mean_g = s1 / n
        rstd_g = jax.lax.rsqrt(jnp.maximum(s2 / n - mean_g**2, 0.0) + 1e-6)
        mean_c = jnp.einsum("bg,cg->bc", mean_g, ind)
        rstd_c = jnp.einsum("bg,cg->bc", rstd_g, ind)
        y = (xf - mean_c[:, None]) * rstd_c[:, None]
        return y.reshape(b, hh, ww, c).astype(x.dtype)

    rng = np.random.default_rng(0)
    shapes_ln = [(2, 1024, 1280), (2, 4096, 640), (8, 1024, 1280),
                 (8, 4096, 640)]
    shapes_gn = [(2, 128, 128, 320), (2, 64, 64, 640), (2, 32, 32, 1280)]
    for shape in shapes_ln:
        x = jnp.array(rng.standard_normal(shape), jnp.bfloat16)
        dt = time_loop(ln, x, iters)
        gb = 2 * x.size * 2 / 1e9
        print(json.dumps({"bench": "norm", "op": "layernorm", "shape": shape,
                          "us": round(dt * 1e6, 1),
                          "GBps": round(gb / dt, 0)}), flush=True)
    for shape in shapes_gn:
        x = jnp.array(rng.standard_normal(shape), jnp.bfloat16)
        for name, fn in (("groupnorm", gn), ("groupnorm_silu", gn_silu),
                         ("groupnorm_matmul", gn_matmul)):
            dt = time_loop(fn, x, iters)
            gb = 2 * x.size * 2 / 1e9
            print(json.dumps({"bench": "norm", "op": name, "shape": shape,
                              "us": round(dt * 1e6, 1),
                              "GBps": round(gb / dt, 0)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["attn", "norm", "calib", "parity", "all"])
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()

    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "backend": jax.default_backend(),
                      "iters": args.iters}), flush=True)
    if args.section in ("calib", "all"):
        bench_calibration(args.iters)
    if args.section in ("attn", "all"):
        bench_attn(args.iters)
    if args.section in ("norm", "all"):
        bench_norm(args.iters)
    if args.section in ("parity", "all"):
        bench_parity()


if __name__ == "__main__":
    main()
