"""Microbench: fused GN(+temb add)+SiLU Pallas kernel vs the XLA chain at
the SDXL resnet shapes eligible for the kernel (<= MAX_ELEMENTS per sample).

Usage: python bench_groupnorm.py  (on the real TPU chip)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.models.layers import group_norm
from pea_diffusion_tpu.ops.groupnorm import fused_group_norm

SHAPES = [  # (B,H,W,C) CFG-pair batch at SDXL levels
    (2, 32, 32, 1280),   # level-2 / mid resnets
    (2, 16, 16, 1280),
    (2, 64, 64, 320),    # level-0-sized channel slice (eligible)
    (4, 32, 32, 1280),
]


def timed(fn, *args, iters=50):
    fn(*args)  # compile
    # axon relay: block_until_ready is a no-op; sync via scalar pull
    float(jax.device_get(fn(*args).mean()))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out.mean()))
    return (time.time() - t0) / iters * 1e3


def main():
    results = []
    for shape in SHAPES:
        b, h, w, c = shape
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        t = jnp.asarray(rng.randn(b, c), jnp.bfloat16)
        scale = jnp.asarray(rng.randn(c).astype(np.float32))
        bias = jnp.asarray(rng.randn(c).astype(np.float32))

        @jax.jit
        def xla_chain(x, t, scale=scale, bias=bias):
            y = group_norm(x + t[:, None, None, :].astype(x.dtype),
                           scale, bias, 32, 1e-5)
            return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)

        @jax.jit
        def fused(x, t, scale=scale, bias=bias):
            return fused_group_norm(x, scale, bias, 32, 1e-5, act="silu",
                                    extra_bias=t)

        # parity first
        a = np.asarray(jax.device_get(xla_chain(x, t)), np.float32)
        f = np.asarray(jax.device_get(fused(x, t)), np.float32)
        err = float(np.abs(a - f).max())
        ms_xla = timed(xla_chain, x, t)
        ms_fused = timed(fused, x, t)
        results.append({"shape": list(shape), "xla_ms": round(ms_xla, 4),
                        "fused_ms": round(ms_fused, 4),
                        "speedup": round(ms_xla / ms_fused, 3),
                        "max_abs_err": err})
        print(json.dumps(results[-1]))
    print(json.dumps({"metric": "fused GN+SiLU speedup (geomean)",
                      "value": round(float(np.exp(np.mean(
                          [np.log(r["speedup"]) for r in results]))), 3)}))


if __name__ == "__main__":
    main()
