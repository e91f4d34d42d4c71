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


def _qconv_case(rng, label, xshape, kshape, strides=(1, 1), iters=100):
    """One bf16-conv vs full-replacement-qconv row (quantize -> int8 conv
    -> dequant+bias, exactly what QConvInt8 runs)."""
    kh, kw, cin, cout = kshape
    x16 = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
    w16 = jnp.asarray(rng.randn(*kshape), jnp.bfloat16)
    w8 = jnp.asarray(rng.randint(-127, 127, kshape), jnp.int8)
    w_scale = jnp.asarray(rng.rand(cout) * 0.02 + 0.01, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    x_scale = jnp.float32(0.05)
    dn = jax.lax.conv_dimension_numbers(xshape, kshape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]

    def conv(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, strides, pad, dimension_numbers=dn,
            preferred_element_type=pt)

    def qconv(x, w):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        y = conv(xq, w, jnp.int32)
        return (y.astype(jnp.float32) * (x_scale * w_scale)
                + bias).astype(jnp.bfloat16)

    # output spatial dims shrink under stride: chain via resize-to-input
    if strides != (1, 1):
        def qconv_strided(x, w):
            y = qconv(x, w)
            return jax.image.resize(y.astype(jnp.float32), xshape,
                                    "nearest")
        def conv_strided(x, w):
            y = conv(x, w, jnp.float32)
            return jax.image.resize(y, xshape, "nearest")
        tf = _time(conv_strided, x16, w16, iters=iters)
        tq = _time(qconv_strided, x16, w8, iters=iters)
    else:
        # cout != cin also breaks chaining; project back with a cheap slice
        if cout != cin:
            def back(y):
                reps = -(-cin // cout)
                return jnp.tile(y, (1, 1, 1, reps))[..., :cin]
            tf = _time(lambda x, w: back(conv(x, w, jnp.float32)),
                       x16, w16, iters=iters)
            tq = _time(lambda x, w: back(qconv(x, w)), x16, w8,
                       iters=iters)
        else:
            tf = _time(functools.partial(conv, pt=jnp.float32), x16, w16,
                       iters=iters)
            tq = _time(qconv, x16, w8, iters=iters)
    hout = xshape[1] // strides[0]
    wout = xshape[2] // strides[1]
    fl = 2 * xshape[0] * hout * wout * cin * cout * kh * kw
    print(f"{label}: bf16 {tf*1e6:.0f}us ({fl/tf/1e12:.2f} TF) "
          f"qconv {tq*1e6:.0f}us -> {tf/tq:.2f}x")
    return tf / tq


def ext():
    """Scope-extension gate benches (VERDICT r3 item 1b): per-shape
    bf16-vs-qconv at the REAL SDXL/VAE shapes each scope would quantize,
    plus the int8 batched-GEMM attention attempt at b8 self-attn shapes.
    A scope ships only if its shapes win here AND e2e (BASELINE.md)."""
    rng = np.random.RandomState(0)
    print("-- shortcut 1x1s (resnet channel-matching, up-path concat) --")
    _qconv_case(rng, "1x1 8x64x64 960->640 ", (8, 64, 64, 960),
                (1, 1, 960, 640))
    _qconv_case(rng, "1x1 8x32x32 2560->1280", (8, 32, 32, 2560),
                (1, 1, 2560, 1280))
    _qconv_case(rng, "1x1 8x128x128 640->320", (8, 128, 128, 640),
                (1, 1, 640, 320))
    print("-- samplers (stride-2 down / post-resize up / conv_in) --")
    _qconv_case(rng, "down 8x128x128x320 s2 ", (8, 128, 128, 320),
                (3, 3, 320, 320), strides=(2, 2))
    _qconv_case(rng, "down 8x64x64x640 s2   ", (8, 64, 64, 640),
                (3, 3, 640, 640), strides=(2, 2))
    _qconv_case(rng, "up 8x64x64x1280       ", (8, 64, 64, 1280),
                (3, 3, 1280, 1280))
    _qconv_case(rng, "conv_in 8x128x128x4   ", (8, 128, 128, 4),
                (3, 3, 4, 320))
    print("-- VAE decoder convs (b1 1024^2 head / b8 mid) --")
    _qconv_case(rng, "vae 1x1024x1024x128   ", (1, 1024, 1024, 128),
                (3, 3, 128, 128), iters=30)
    _qconv_case(rng, "vae 1x512x512x512     ", (1, 512, 512, 512),
                (3, 3, 512, 512), iters=30)
    _qconv_case(rng, "vae 8x256x256x512     ", (8, 256, 256, 512),
                (3, 3, 512, 512), iters=30)

    print("-- int8 attention GEMMs (b8 SDXL self-attn shapes) --")
    # [B*H, S, D] x [B*H, D, S] (QK^T) and [B*H, S, S] x [B*H, S, D] (PV)
    for (bh, s, d) in ((80, 4096, 64), (160, 1024, 64)):
        a16 = jnp.asarray(rng.randn(bh, s, d), jnp.bfloat16)
        b16 = jnp.asarray(rng.randn(bh, d, s), jnp.bfloat16)
        a8 = jnp.asarray(rng.randint(-127, 127, (bh, s, d)), jnp.int8)
        b8_ = jnp.asarray(rng.randint(-127, 127, (bh, d, s)), jnp.int8)
        dnums = (((2,), (1,)), ((0,), (0,)))
        f16 = functools.partial(jax.lax.dot_general,
                                dimension_numbers=dnums)
        f8 = functools.partial(jax.lax.dot_general,
                               dimension_numbers=dnums,
                               preferred_element_type=jnp.int32)
        # chain by slicing the [bh, s, s] score back to [bh, s, d]
        t16 = _time(lambda x, w: f16(x, w)[..., :d], a16, b16, iters=30)
        t8 = _time(lambda x, w: f8(x, w)[..., :d], a8, b8_, iters=30)
        fl = 2 * bh * s * s * d
        print(f"qk^t bh={bh} s={s} d={d}: bf16 {t16*1e6:.0f}us "
              f"({fl/t16/1e12:.1f} TF) int8 {t8*1e6:.0f}us "
              f"({fl/t8/1e12:.1f} TOP) ratio {t16/t8:.2f}x")


if __name__ == "__main__":
    import sys
    if "--ext" in sys.argv:
        ext()
    else:
        main()
        ext()
