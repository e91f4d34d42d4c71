"""Int8 post-training quantization for the UNet's 3x3 resnet convs.

Why: the measured v5e step profile (docs/DESIGN.md §9c) puts the single
chip at 28-29% MFU with the program bandwidth/fusion-bound at XLA's own
floor — the practical bf16 ceiling. The v5e MXU runs int8 at 2x the bf16
rate, and a full quantize->int8 conv->dequant replacement of one SDXL
resnet conv measures faster than the bf16 conv it replaces
(tools/bench_int8.py), so int8 is the one lever that breaks through the
bf16 roofline rather than chasing the last few percent under it. The
reference has no quantization story at all; this is a TPU-native serving
extension (opt-in, `conv_quant="int8"`).

Scheme (standard PTQ, Q-Diffusion-style granularity):

- weights: symmetric per-output-channel int8 (`w_scale[cout]`), computed
  offline from the float checkpoint — exact zero-point-free dequant.
- activations: symmetric per-tensor int8 with a STATIC per-layer scale
  from a calibration pass (`calibrate_conv_ranges` traces the float model
  and returns per-conv max|x|). Static scales keep the quantize step a
  pure elementwise op that XLA fuses into the preceding GroupNorm/SiLU
  epilogue — no extra reduction pass over the activation (which would eat
  the int8 win on this bandwidth-bound step).
- scope: the resnet `conv1`/`conv2` 3x3 convs (the bulk of conv FLOPs).
  Shortcut 1x1s, conv_in/out, samplers, attention and the VAE stay bf16;
  GEMMs stay bf16 because int8 GEMM measured SLOWER than bf16 at SDXL
  shapes on this chip (tools/bench_int8.py — MXU int8 conv path wins,
  the int8 matmul path does not).

The quantized model is the SAME flax module tree with `conv_quant="int8"`
(models/unet.py) — only the conv param leaves change:
{kernel, bias} -> {kernel_q int8, w_scale f32, x_scale f32[], bias f32}.
`quantize_unet_params` maps a loaded float tree (+ calibration ranges)
into that layout, so every existing checkpoint/converter path feeds it.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

_EPS = 1e-8


def quantize_weight(kernel: jnp.ndarray,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[kh, kw, cin, cout] float -> (int8 kernel, fp32 w_scale[cout])."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    w_scale = jnp.maximum(amax, _EPS) / 127.0
    kq = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
    return kq, w_scale


class QConvInt8(nn.Module):
    """Drop-in for the resnet 3x3 nn.Conv: static-scale activation
    quantize -> int8 MXU conv -> per-channel dequant + bias.

    The quantize is elementwise with a static scale, so XLA fuses it into
    the producing GroupNorm/SiLU epilogue; the dequant+bias fuses into the
    conv epilogue. Params are filled by `quantize_unet_params` — init
    gives zeros (shape/dtype carriers only)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros_init(),
            (kh, kw, cin, self.features), jnp.int8)
        w_scale = self.param("w_scale", nn.initializers.ones_init(),
                             (self.features,), jnp.float32)
        x_scale = self.param("x_scale", nn.initializers.ones_init(),
                             (), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)

        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, kernel_q, (1, 1),
            [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (x_scale * w_scale) + bias
        return out.astype(x.dtype)


# --- calibration -----------------------------------------------------------


def _is_target_conv(path: Tuple[str, ...]) -> bool:
    return (len(path) >= 2 and path[-1] in ("conv1", "conv2")
            and "resnet" in path[-2])


def calibrate_conv_ranges(unet, params, batches: Sequence[tuple]
                          ) -> Dict[str, jnp.ndarray]:
    """Run the FLOAT UNet over representative (sample, t, context, added)
    batches and return {"down_0_resnet_0/conv1": max|input|, ...}.

    Uses nn.intercept_methods to tap nn.Conv inputs; the taps are tracers
    collected during trace and returned from a jitted function, so
    calibration runs as one compiled program per batch (no eager
    dispatch)."""

    def one_batch(p, args):
        records: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fn, fargs, fkwargs, context):
            m = context.module
            if isinstance(m, nn.Conv) and _is_target_conv(m.path):
                records["/".join(m.path[-2:])] = jnp.max(
                    jnp.abs(fargs[0].astype(jnp.float32)))
            return next_fn(*fargs, **fkwargs)

        with nn.intercept_methods(interceptor):
            unet.apply(p, *args)
        return records

    jitted = jax.jit(one_batch)
    out: Dict[str, jnp.ndarray] = {}
    for args in batches:
        rec = jax.device_get(jitted(params, args))
        out = merge_ranges(out, rec)
    if not out:
        raise ValueError("calibration saw no resnet convs — wrong model?")
    return {k: float(v) for k, v in out.items()}


def merge_ranges(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
    out = dict(a)
    for k, v in b.items():
        out[k] = max(float(out[k]), float(v)) if k in out else float(v)
    return out


def calibrate_sdxl(models, params, ids, uncond_ids, size: int,
                   timesteps: Sequence[int] = (999, 749, 499, 249, 49),
                   seed: int = 0) -> Dict[str, float]:
    """Calibrate the SDXL UNet with the real prompt conditioning at a
    spread of denoising timesteps. Latents are unit-gaussian draws — the
    DDPM forward process is variance-preserving, so trajectory latents are
    ~unit scale at every t; the conditioning (the part that varies with
    the checkpoint and prompt) is the real encode output. `models` must be
    the FLOAT build (conv_quant="none")."""
    from ..pipelines.text2image import encode_prompt_sdxl, make_add_time_ids

    # CFG-pair layout ([uncond; cond]) exactly as generate_sdxl serves it
    context, text_embeds = encode_prompt_sdxl(models, params, ids,
                                              uncond_ids)
    time_ids = make_add_time_ids((size, size), (0, 0), (size, size),
                                 context.shape[0])
    added = {"text_embeds": text_embeds, "time_ids": time_ids}
    rng = jax.random.PRNGKey(seed)
    b2 = context.shape[0]
    cin = models.unet.config.in_channels
    batches = []
    for t in timesteps:
        rng, k = jax.random.split(rng)
        lat = jax.random.normal(
            k, (b2, size // 8, size // 8, cin), context.dtype)
        batches.append((lat, jnp.full((b2,), int(t), jnp.int32),
                        context, added))
    return calibrate_conv_ranges(models.unet, params["unet"], batches)


def save_ranges(path: str, ranges: Dict[str, float]) -> None:
    """Persist calibration ranges (tiny JSON) so serving restarts skip the
    calibration forward passes."""
    import json
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(ranges, f, indent=0, sort_keys=True)


def load_ranges(path: str) -> Dict[str, float]:
    import json
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def quantize_for_serving(models, params, ids, uncond_ids, size: int,
                         ranges_path: Optional[str] = None):
    """Calibrate + quantize one PEAModels bundle for int8 serving.

    Returns (models', params') — the same bundle with the UNet rebuilt
    `conv_quant="int8"` and its param tree transformed in one jitted
    on-device pass (a host-side walk of the 2.6GB tree costs minutes on a
    1-core host). `ranges_path`: if the file exists, calibration is
    skipped and the saved ranges are used; otherwise the fresh ranges are
    saved there."""
    import dataclasses
    import os

    if ranges_path and os.path.exists(ranges_path):
        ranges = load_ranges(ranges_path)
    else:
        ranges = calibrate_sdxl(models, params, ids, uncond_ids, size)
        if ranges_path:
            save_ranges(ranges_path, ranges)
    params = dict(params)
    params["unet"] = jax.jit(
        lambda p: quantize_unet_params(p, ranges))(params["unet"])
    models = dataclasses.replace(
        models, unet=dataclasses.replace(models.unet, conv_quant="int8"))
    return models, params


# --- param-tree transform --------------------------------------------------


def quantize_unet_params(float_params, ranges: Optional[Dict[str, float]],
                         default_amax: float = 1.0):
    """Float UNet variables -> the param layout QConvInt8 expects.

    `ranges` comes from `calibrate_conv_ranges`; a conv missing from it
    falls back to `default_amax` (serviceable for smoke tests; calibrate
    for real serving)."""
    ranges = ranges or {}

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            p = path + (name,)
            if (isinstance(sub, dict) and _is_target_conv(p)
                    and "kernel" in sub):
                kq, w_scale = quantize_weight(sub["kernel"])
                amax = float(ranges.get("/".join(p[-2:]), default_amax))
                out[name] = {
                    "kernel_q": kq,
                    "w_scale": w_scale,
                    "x_scale": jnp.float32(max(amax, _EPS) / 127.0),
                    "bias": jnp.asarray(sub["bias"], jnp.float32),
                }
            else:
                out[name] = walk(sub, p)
        return out

    return walk(float_params, ())
