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
- scope: `conv_quant` is "none", "int8" (= "int8:resnet"), or
  "int8:<scopes>" with scopes from {resnet, shortcut, sampler, stem, vae}:
    resnet   — the resnet conv1/conv2 3x3s (bulk of conv FLOPs; default)
    shortcut — the resnet 1x1 channel-matching convs (neutral alone in
               the microbench — 1.02x/0.87x/1.19x — kept for the halved
               HBM reads)
    sampler  — Downsample/Upsample 3x3s (upsample measured 1.87x)
    stem     — conv_in. Measured 0.08x (cin=4: the conv is MXU-starved
               and the activation-quantize pass dominates) — available
               for completeness, documented NEGATIVE, never default.
    vae      — the VAE DECODER convs (resnets + upsamplers; its conv_in/
               conv_out/attention stay float). Measured 1.13x-1.71x at
               the b1-1024/b8-256 decode shapes. Model-level scope:
               handled by quantize_vae_decoder_params + the Decoder's
               own conv_quant, not by per-path rules on the UNet tree.
  Each extension is gated by its own microbench (tools/bench_int8.py
  --ext) and e2e row in BASELINE.md round 4. conv_out always stays float
  (the output head sets image quality); attention and all GEMMs stay
  bf16 — int8 GEMM measured SLOWER than bf16 at SDXL shapes on this chip
  (0.69x projection GEMM; 0.11x/0.59x QK^T at b8 self-attn shapes —
  the MXU int8 conv path wins, the int8 matmul path does not).

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

SCOPES = ("resnet", "shortcut", "sampler", "stem", "vae")

# sub-scopes applied to the VAE decoder tree under the "vae" scope (its
# conv_in [cin=4] and conv_out stay float — same reasoning as the UNet's)
VAE_DECODER_SCOPES = frozenset({"resnet", "shortcut", "sampler"})
VAE_DECODER_CONV_QUANT = "int8:resnet,sampler,shortcut"


def parse_scopes(conv_quant: str) -> frozenset:
    """'none' -> {}; 'int8' -> {resnet}; 'int8:a,b' -> {a, b}."""
    if not conv_quant or conv_quant == "none":
        return frozenset()
    if conv_quant == "int8":
        return frozenset({"resnet"})
    assert conv_quant.startswith("int8:"), conv_quant
    scopes = frozenset(s for s in conv_quant[5:].split(",") if s)
    unknown = scopes - set(SCOPES)
    assert not unknown, f"unknown int8 scopes {sorted(unknown)}"
    return scopes


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
    strides: Tuple[int, int] = (1, 1)

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
            xq, kernel_q, self.strides,
            [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (x_scale * w_scale) + bias
        return out.astype(x.dtype)


# --- calibration -----------------------------------------------------------


_RESNET_SCOPE = frozenset({"resnet"})


def _is_target_conv(path: Tuple[str, ...],
                    scopes: frozenset = _RESNET_SCOPE) -> bool:
    """Scope membership for one conv module path (names from the module
    tree, e.g. ('down_0_resnet_0', 'conv1'); the 'params' tree prefix is
    stripped by callers via _range_key/_walk paths being module-relative).
    conv_out (the 4-channel output head) is never a target."""
    if not path:
        return False
    parent = path[-2] if len(path) >= 2 else ""
    leaf = path[-1]
    if "resnet" in parent:
        if leaf in ("conv1", "conv2"):
            return "resnet" in scopes
        if leaf == "conv_shortcut":
            return "shortcut" in scopes
    if "sampler" in scopes:
        if leaf == "conv" and ("downsample" in parent or
                               "upsample" in parent):
            return True
    if "stem" in scopes and leaf == "conv_in":
        return True
    return False


def _range_key(path: Tuple[str, ...]) -> str:
    """Calibration-dict key for a conv path; ignores the flax 'params'
    collection prefix so module paths and param-tree paths agree."""
    p = tuple(x for x in path if x != "params")
    return "/".join(p[-2:])


def calibrate_conv_ranges(unet, params, batches: Sequence[tuple],
                          scopes: frozenset = _RESNET_SCOPE
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
            if isinstance(m, nn.Conv) and _is_target_conv(m.path, scopes):
                records[_range_key(m.path)] = jnp.max(
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
        raise ValueError("calibration saw no in-scope convs — wrong model "
                         f"or scopes? scopes={sorted(scopes)}")
    return {k: float(v) for k, v in out.items()}


def merge_ranges(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
    out = dict(a)
    for k, v in b.items():
        out[k] = max(float(out[k]), float(v)) if k in out else float(v)
    return out


def calibrate_sdxl(models, params, ids, uncond_ids, size: int,
                   timesteps: Sequence[int] = (999, 749, 499, 249, 49),
                   seed: int = 0,
                   scopes: frozenset = _RESNET_SCOPE) -> Dict[str, float]:
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
    return calibrate_conv_ranges(models.unet, params["unet"], batches,
                                 scopes)


def calibrate_vae_decoder(vae, vae_params, z_batches: Sequence[jnp.ndarray]
                          ) -> Dict[str, float]:
    """Calibrate the VAE DECODER's in-scope convs (the "vae" serving
    scope): run the float decoder over representative post-scaling
    latents `z` (i.e. already divided by vae_scaling, exactly what
    pipelines.text2image.decode_latents feeds `vae.decode`) and return
    {"up_0_resnet_1/conv1": max|input|, ...} keyed module-relative like
    calibrate_conv_ranges. Encoder convs never appear (decode doesn't run
    them)."""
    scopes = VAE_DECODER_SCOPES

    def one_batch(p, z):
        records: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fn, fargs, fkwargs, context):
            m = context.module
            if isinstance(m, nn.Conv) and _is_target_conv(m.path, scopes):
                records[_range_key(m.path)] = jnp.max(
                    jnp.abs(fargs[0].astype(jnp.float32)))
            return next_fn(*fargs, **fkwargs)

        with nn.intercept_methods(interceptor):
            vae.apply(p, z, method=vae.decode)
        return records

    jitted = jax.jit(one_batch)
    out: Dict[str, jnp.ndarray] = {}
    for z in z_batches:
        out = merge_ranges(out, jax.device_get(jitted(vae_params, z)))
    if not out:
        raise ValueError("VAE decoder calibration saw no in-scope convs")
    return {k: float(v) for k, v in out.items()}


def quantize_vae_decoder_params(float_params,
                                ranges: Optional[Dict[str, float]],
                                default_amax: float = 1.0):
    """AutoencoderKL float variables -> decoder convs in QConvInt8 layout
    (VAE_DECODER_SCOPES); encoder/quant_conv/post_quant_conv untouched."""
    tree = dict(float_params)
    col = dict(tree["params"])
    col["decoder"] = quantize_unet_params(
        {"params": col["decoder"]}, ranges, default_amax,
        scopes=VAE_DECODER_SCOPES)["params"]
    tree["params"] = col
    return tree


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
                         ranges_path: Optional[str] = None,
                         conv_quant: str = "int8"):
    """Calibrate + quantize one PEAModels bundle for int8 serving.

    Returns (models', params') — the same bundle with the UNet rebuilt
    with `conv_quant` ("int8" or "int8:<scopes>", see module doc) and its
    param tree transformed in one jitted on-device pass (a host-side walk
    of the 2.6GB tree costs minutes on a 1-core host). `ranges_path`: if
    the file exists, calibration is skipped and the saved ranges are used
    (it must cover the requested scopes — keys are per-conv, so a
    resnet-only cache does NOT serve a wider scope; missing convs fall
    back loudly); otherwise the fresh ranges are saved there."""
    import dataclasses
    import os

    scopes = parse_scopes(conv_quant)
    assert scopes, conv_quant
    unet_scopes = scopes - {"vae"}
    quant_vae = "vae" in scopes
    if ranges_path and os.path.exists(ranges_path):
        saved = load_ranges(ranges_path)
        ranges = {k: v for k, v in saved.items()
                  if not k.startswith("vae::")}
        vae_ranges = {k[len("vae::"):]: v for k, v in saved.items()
                      if k.startswith("vae::")}
        # a cache written for a disjoint scope would fall back to
        # default_amax on EVERY conv — refuse instead of clipping
        # activations silently (delete the file to recalibrate)
        if unet_scopes and not ranges:
            raise ValueError(
                f"{ranges_path} contains no UNet conv ranges but scope "
                f"{sorted(unet_scopes)} was requested — stale cache? "
                f"Delete it to recalibrate.")
        if quant_vae and not vae_ranges:
            raise ValueError(
                f"{ranges_path} contains no vae:: ranges but the 'vae' "
                f"scope was requested — stale cache? Delete it to "
                f"recalibrate.")
    else:
        ranges = (calibrate_sdxl(models, params, ids, uncond_ids, size,
                                 scopes=unet_scopes)
                  if unet_scopes else {})
        vae_ranges = {}
        if quant_vae:
            # post-scaling decoder inputs: the pipeline feeds decode
            # z = latents / vae_scaling with end-of-trajectory latents at
            # ~unit scale (variance-preserving schedule), so calibrate on
            # unit gaussians over the scaling factor. For tighter ranges
            # supply a ranges_path produced offline from real decodes.
            cin = models.vae.config.latent_channels
            zs = [jax.random.normal(
                jax.random.PRNGKey(s),
                (1, size // 8, size // 8, cin), jnp.float32)
                / models.vae_scaling for s in range(2)]
            vae_ranges = calibrate_vae_decoder(models.vae, params["vae"],
                                               zs)
        if ranges_path:
            save_ranges(ranges_path, {
                **ranges,
                **{f"vae::{k}": v for k, v in vae_ranges.items()}})
    params = dict(params)
    new_unet, new_vae = models.unet, models.vae
    if unet_scopes:
        params["unet"] = jax.jit(
            lambda p: quantize_unet_params(p, ranges, scopes=unet_scopes)
        )(params["unet"])
        new_unet = dataclasses.replace(
            models.unet,
            conv_quant="int8:" + ",".join(sorted(unet_scopes)))
    if quant_vae:
        params["vae"] = jax.jit(
            lambda p: quantize_vae_decoder_params(p, vae_ranges)
        )(params["vae"])
        new_vae = dataclasses.replace(
            models.vae, conv_quant=VAE_DECODER_CONV_QUANT)
    models = dataclasses.replace(models, unet=new_unet, vae=new_vae)
    return models, params


# --- quality analysis --------------------------------------------------------


def per_conv_sqnr(unet, params, batches: Sequence[tuple],
                  ranges: Dict[str, float],
                  scopes: frozenset = _RESNET_SCOPE) -> Dict[str, float]:
    """Per-conv ISOLATED error budget: for each in-scope conv, feed the
    FLOAT activation through both the float conv and the simulated int8
    conv (same static x_scale the serving path uses) and report
    SQNR = 10*log10(||y||^2 / ||y - y_q||^2) in dB, worst case over
    `batches`. Isolated = the float trajectory is never perturbed, so each
    number is that conv's own quantization noise, not accumulated drift
    (the accumulated number is the e2e rel-error the tests bound).

    Implementation: one jitted program per batch; an nn.intercept_methods
    tap computes the int8 simulation alongside the float op and records
    the SQNR tracer (same mechanism as calibrate_conv_ranges)."""

    def one_batch(p, args):
        records: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fn, fargs, fkwargs, context):
            m = context.module
            y = next_fn(*fargs, **fkwargs)
            if isinstance(m, nn.Conv) and _is_target_conv(m.path, scopes):
                key = _range_key(m.path)
                x = fargs[0].astype(jnp.float32)
                kernel = m.variables["params"]["kernel"].astype(jnp.float32)
                bias = m.variables["params"]["bias"].astype(jnp.float32)
                kq, w_scale = quantize_weight(kernel)
                x_scale = jnp.float32(
                    max(float(ranges.get(key, 1.0)), _EPS) / 127.0)
                xq = jnp.clip(jnp.round(x / x_scale), -127, 127
                              ).astype(jnp.int8)
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
                kh, kw = kernel.shape[0], kernel.shape[1]
                strides = getattr(m, "strides", None) or (1, 1)
                if isinstance(strides, int):
                    strides = (strides, strides)
                yq = jax.lax.conv_general_dilated(
                    xq, kq, strides,
                    [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                yq = yq.astype(jnp.float32) * (x_scale * w_scale) + bias
                yf = y.astype(jnp.float32)
                num = jnp.sum(yf * yf)
                den = jnp.sum((yf - yq) ** 2) + _EPS
                records[key] = 10.0 * jnp.log10(num / den)
            return y

        with nn.intercept_methods(interceptor):
            unet.apply(p, *args)
        return records

    jitted = jax.jit(one_batch)
    worst: Dict[str, float] = {}
    for args in batches:
        rec = jax.device_get(jitted(params, args))
        for k, v in rec.items():
            worst[k] = min(worst.get(k, float("inf")), float(v))
    if not worst:
        raise ValueError(f"no in-scope convs found, scopes={sorted(scopes)}")
    return worst


# --- param-tree transform --------------------------------------------------


def quantize_unet_params(float_params, ranges: Optional[Dict[str, float]],
                         default_amax: float = 1.0,
                         scopes: frozenset = _RESNET_SCOPE):
    """Float UNet variables -> the param layout QConvInt8 expects.

    `ranges` comes from `calibrate_conv_ranges`; an in-scope conv missing
    from it falls back to `default_amax` with a warning. `ranges=None`
    means "intentionally uncalibrated" (bench/smoke paths) and stays
    silent; a PROVIDED dict — however empty — warns for every miss, so a
    stale --calib-ranges cache written for a different scope cannot
    silently clip activations at default_amax (calibrate with matching
    scopes for real serving)."""
    calibrated = ranges is not None
    ranges = ranges or {}
    missing = []

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            p = path + (name,)
            if (isinstance(sub, dict) and _is_target_conv(p, scopes)
                    and "kernel" in sub):
                kq, w_scale = quantize_weight(sub["kernel"])
                key = _range_key(p)
                if key not in ranges:
                    missing.append(key)
                amax = float(ranges.get(key, default_amax))
                out[name] = {
                    "kernel_q": kq,
                    "w_scale": w_scale,
                    "x_scale": jnp.float32(max(amax, _EPS) / 127.0),
                    "bias": jnp.asarray(sub["bias"], jnp.float32),
                }
            else:
                out[name] = walk(sub, p)
        return out

    quantized = walk(float_params, ())
    if missing and calibrated:
        print(f"[int8] WARNING: {len(missing)} in-scope convs missing "
              f"from calibration ranges (using default_amax="
              f"{default_amax}): {missing[:5]}{'...' if len(missing) > 5 else ''}")
    return quantized
