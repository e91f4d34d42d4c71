"""Does int8 unlock the 2x MXU path on this chip? Decides whether a
quantized serving path is worth building (weight-only int8 only saves
~5% HBM traffic at SDXL shapes; int8 *compute* could approach 2x on the
conv-bound step, docs/DESIGN.md §9c).

Prints one line per case: GEMM and NHWC conv at SDXL-ish shapes, bf16 vs
int8xint8->int32.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, x, w, iters=50):
    """One device program chaining `iters` dependent calls (output feeds the
    next input, cast back to x.dtype) — immune to the per-dispatch relay
    latency on this platform and to loop-invariant hoisting."""
    @jax.jit
    def looped(x0, w0):
        def body(_, acc):
            return fn(acc, w0).astype(x0.dtype)
        out = jax.lax.fori_loop(0, iters, body, x0)
        return out.astype(jnp.float32).mean()

    float(jax.device_get(looped(x, w)))  # compile + warm
    t0 = time.perf_counter()
    float(jax.device_get(looped(x, w)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    # GEMM: [4096, 1280] x [1280, 1280] (SDXL attention block projection)
    m, k, n = 4096, 1280, 1280
    a16 = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b16 = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)

    f16 = lambda x, y: x @ y
    f8 = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    t16 = _time(f16, a16, b16, iters=300)
    t8 = _time(f8, a8, b8, iters=300)
    fl = 2 * m * k * n
    # weight-only: bf16 activations x on-the-fly-dequantized int8 weights
    scale = jnp.float32(0.01)
    two = _time(lambda x, w: x @ (w * scale).astype(jnp.bfloat16),
                a16, b8, iters=300)
    print(f"gemm {m}x{k}x{n}: bf16 {t16*1e6:.0f}us ({fl/t16/1e12:.1f} TF) "
          f"int8 {t8*1e6:.0f}us ({fl/t8/1e12:.1f} TOP) ratio {t16/t8:.2f}x "
          f"w-only {two*1e6:.0f}us")

    # conv: [8, 64, 64, 640] x 3x3x640x640 (SDXL mid-res resnet)
    x16 = jnp.asarray(rng.randn(8, 64, 64, 640), jnp.bfloat16)
    w16 = jnp.asarray(rng.randn(3, 3, 640, 640), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 127, x16.shape), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, w16.shape), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x16.shape, w16.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=pt)

    c16 = functools.partial(conv, pt=jnp.float32)
    c8 = functools.partial(conv, pt=jnp.int32)
    t16 = _time(c16, x16, w16, iters=100)
    fl = 2 * 8 * 64 * 64 * 640 * 640 * 9
    try:
        t8 = _time(c8, x8, w8, iters=100)
        print(f"conv 8x64x64x640 3x3: bf16 {t16*1e6:.0f}us "
              f"({fl/t16/1e12:.1f} TF) int8 {t8*1e6:.0f}us "
              f"({fl/t8/1e12:.1f} TOP) ratio {t16/t8:.2f}x")
    except Exception as e:  # int8 conv may not lower on this backend
        print(f"conv bf16 {t16*1e6:.0f}us ({fl/t16/1e12:.1f} TF); "
              f"int8 conv failed: {type(e).__name__}: {e}")
        return

    # full replacement cost: bf16 act -> static-scale quantize -> int8 conv
    # -> per-channel dequant + bias -> bf16 (what a QConv actually runs)
    w_scale = jnp.asarray(rng.rand(640) * 0.02 + 0.01, jnp.float32)
    bias = jnp.asarray(rng.randn(640), jnp.float32)
    x_scale = jnp.float32(0.05)

    def qconv(x, w):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        y = conv(xq, w, pt=jnp.int32)
        return (y.astype(jnp.float32) * (x_scale * w_scale)
                + bias).astype(jnp.bfloat16)

    tq = _time(qconv, x16, w8, iters=100)
    print(f"qconv (quant+int8conv+dequant): {tq*1e6:.0f}us "
          f"({fl/tq/1e12:.1f} TF-equiv) vs bf16 {t16*1e6:.0f}us "
          f"-> {t16/tq:.2f}x")

    # same at the 1280-channel 32x32 shape (deep UNet levels)
    x16b = jnp.asarray(rng.randn(8, 32, 32, 1280), jnp.bfloat16)
    w16b = jnp.asarray(rng.randn(3, 3, 1280, 1280), jnp.bfloat16)
    w8b = jnp.asarray(rng.randint(-127, 127, w16b.shape), jnp.int8)
    dnb = jax.lax.conv_dimension_numbers(x16b.shape, w16b.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    w_scale_b = jnp.asarray(rng.rand(1280) * 0.02 + 0.01, jnp.float32)
    bias_b = jnp.asarray(rng.randn(1280), jnp.float32)

    def convb(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dnb,
            preferred_element_type=pt)

    def qconvb(x, w):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        y = convb(xq, w, jnp.int32)
        return (y.astype(jnp.float32) * (x_scale * w_scale_b)
                + bias_b).astype(jnp.bfloat16)

    flb = 2 * 8 * 32 * 32 * 1280 * 1280 * 9
    t16b = _time(functools.partial(convb, pt=jnp.float32), x16b, w16b,
                 iters=100)
    tqb = _time(qconvb, x16b, w8b, iters=100)
    print(f"conv 8x32x32x1280 3x3: bf16 {t16b*1e6:.0f}us "
          f"({flb/t16b/1e12:.1f} TF) qconv {tqb*1e6:.0f}us -> "
          f"{t16b/tqb:.2f}x")


if __name__ == "__main__":
    main()
