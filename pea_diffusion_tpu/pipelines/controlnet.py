"""SDXL ControlNet pipeline with PEA prompt encoding
(reference: tests/test_sdxl_zh_controlnet.py:350-584).

Covers: control-image preprocessing (CFG duplication), per-step
`controlnet_keep` schedule (control_guidance_start/end windows, :456-463,
:502-508), guess mode (conditional-half-only control with zeroed uncond
residuals, :488-496,:521-526), and residual injection into the UNet.

The per-step keep-schedule is a precomputed [S] table so the whole loop stays
one XLA program.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.controlnet import ControlNet
from .sampling import make_sampler
from .text2image import (
    PEAModels,
    Params,
    cfg_combine,
    decode_latents,
    denoise_loop,
    encode_prompt_sdxl,
    make_add_time_ids,
)


def prepare_control_image(image: np.ndarray, height: int, width: int,
                          batch: int) -> jnp.ndarray:
    """HWC uint8/float canny map -> [B,H,W,3] float in [0,1]
    (prepare_image, tests/test_sdxl_zh_controlnet.py:320-348)."""
    arr = np.asarray(image, np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    from PIL import Image as PILImage
    pil = PILImage.fromarray((arr * 255).astype(np.uint8))
    arr = np.asarray(pil.resize((width, height), resample=2), np.float32) / 255.0
    return jnp.tile(jnp.asarray(arr)[None], (batch, 1, 1, 1))


def keep_schedule(num_steps: int, start: float, end: float) -> jnp.ndarray:
    """[S] control weights: 1.0 inside the (start, end) fraction window
    (controlnet_keep, tests/test_sdxl_zh_controlnet.py:456-463)."""
    idx = np.arange(num_steps, dtype=np.float32)
    frac = idx / max(num_steps - 1, 1)
    return jnp.asarray(((frac >= start) & (frac <= end)).astype(np.float32))


def generate_sdxl_controlnet(
    models: PEAModels, controlnet: ControlNet, params: Params,
    controlnet_params, ids, uncond_ids, control_image, rng, *,
    sampler_name="dpm++", height=1024, width=1024, num_steps=30,
    guidance_scale=7.5, guidance_rescale=0.0,
    controlnet_conditioning_scale=1.0, guess_mode=False,
    control_guidance_start=0.0, control_guidance_end=1.0,
):
    """Host wrapper: guidance/conditioning scales are traced operands so new
    values reuse the compiled program; only guess_mode and the keep-window
    fractions (which shape the precomputed [S] table) stay static."""
    return _generate_sdxl_controlnet_jit(
        models, controlnet, params, controlnet_params, ids, uncond_ids,
        control_image, rng, jnp.float32(guidance_scale),
        jnp.float32(guidance_rescale),
        jnp.float32(controlnet_conditioning_scale),
        sampler_name=sampler_name, height=height, width=width,
        num_steps=num_steps, guess_mode=bool(guess_mode),
        control_guidance_start=float(control_guidance_start),
        control_guidance_end=float(control_guidance_end))


@functools.partial(
    jax.jit,
    static_argnames=("models", "controlnet", "sampler_name", "height", "width",
                     "num_steps", "guess_mode", "control_guidance_start",
                     "control_guidance_end"),
)
def _generate_sdxl_controlnet_jit(
    models: PEAModels, controlnet: ControlNet, params: Params,
    controlnet_params, ids, uncond_ids, control_image, rng,
    guidance_scale, guidance_rescale, controlnet_conditioning_scale, *,
    sampler_name, height, width, num_steps, guess_mode,
    control_guidance_start, control_guidance_end,
):
    context, pooled = encode_prompt_sdxl(models, params, ids, uncond_ids)
    b = ids.shape[0]
    sampler = make_sampler(sampler_name, models.schedule, num_steps)
    noise = jax.random.normal(rng, (b, height // 8, width // 8, 4), jnp.float32)
    time_ids = make_add_time_ids((height, width), (0, 0), (height, width), 2 * b)
    added = {"text_embeds": pooled, "time_ids": time_ids}
    keep = keep_schedule(num_steps, control_guidance_start, control_guidance_end)
    ctx_c, pooled_c = context[b:], pooled[b:]
    added_c = {"text_embeds": pooled_c, "time_ids": time_ids[b:]}

    def eps_fn(x, i):
        t = sampler.timesteps[i]
        scale = keep[i] * controlnet_conditioning_scale
        if guess_mode:
            # control from the conditional half only; uncond gets zeros
            down_c, mid_c = controlnet.apply(
                controlnet_params, x, jnp.broadcast_to(t, (b,)), ctx_c,
                control_image, scale, added_c)
            down = tuple(jnp.concatenate([jnp.zeros_like(d), d]) for d in down_c)
            mid = jnp.concatenate([jnp.zeros_like(mid_c), mid_c])
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            cimg2 = jnp.concatenate([control_image, control_image], axis=0)
            down, mid = controlnet.apply(
                controlnet_params, x2, jnp.broadcast_to(t, (2 * b,)), context,
                cimg2, scale, added)
        x2 = jnp.concatenate([x, x], axis=0)
        out = models.unet.apply(
            params["unet"], x2, jnp.broadcast_to(t, (2 * b,)), context, added,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid)
        return cfg_combine(out.astype(jnp.float32), guidance_scale,
                           guidance_rescale)

    latents = denoise_loop(eps_fn, sampler, noise)
    return decode_latents(models, params["vae"], latents)


def canny_edges(image: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """Canny preprocessing (tests/test_sdxl_zh_controlnet.py:609-614).

    Uses cv2 when present; otherwise a dependency-free numpy implementation
    (gaussian blur -> sobel -> non-max suppression -> hysteresis) so the
    ControlNet CLI mode works in cv2-less environments."""
    try:
        import cv2
        edges = cv2.Canny(np.asarray(image, np.uint8), low, high)
    except ImportError:
        edges = _canny_numpy(np.asarray(image, np.uint8), low, high)
    return edges[:, :, None].repeat(3, axis=2)


def _canny_numpy(image: np.ndarray, low: float, high: float) -> np.ndarray:
    """Minimal host-side Canny: [H,W] or [H,W,3] uint8 -> [H,W] uint8 edges."""
    g = image.astype(np.float32)
    if g.ndim == 3:
        g = g @ np.array([0.299, 0.587, 0.114], np.float32)
    # separable 5-tap gaussian
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16.0
    pad = np.pad(g, 2, mode="edge")
    g = sum(k[i] * pad[i:i + g.shape[0], 2:-2] for i in range(5))
    pad = np.pad(g, 2, mode="edge")
    g = sum(k[i] * pad[2:-2, i:i + g.shape[1]] for i in range(5))

    p = np.pad(g, 1, mode="edge")
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 2 + (p[:-2, 2:] - p[:-2, :-2]) \
        + (p[2:, 2:] - p[2:, :-2])
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 2 + (p[2:, :-2] - p[:-2, :-2]) \
        + (p[2:, 2:] - p[:-2, 2:])
    mag = np.hypot(gx, gy)
    ang = np.mod(np.arctan2(gy, gx), np.pi)  # [0, pi)

    # non-max suppression along the quantized gradient direction
    mp = np.pad(mag, 1)
    shifts = {  # direction bin -> the two neighbors along the gradient
        0: (mp[1:-1, 2:], mp[1:-1, :-2]),       # E/W
        1: (mp[2:, 2:], mp[:-2, :-2]),          # NE/SW
        2: (mp[2:, 1:-1], mp[:-2, 1:-1]),       # N/S
        3: (mp[2:, :-2], mp[:-2, 2:]),          # NW/SE
    }
    dbin = np.floor((ang + np.pi / 8) / (np.pi / 4)).astype(np.int32) % 4
    keep = np.zeros_like(mag, bool)
    for b, (n1, n2) in shifts.items():
        m = dbin == b
        keep |= m & (mag >= n1) & (mag >= n2)
    nms = np.where(keep, mag, 0.0)

    strong = nms >= high
    weak = nms >= low
    # hysteresis: keep weak pixels 8-connected to a strong one. scipy's
    # connected-component labeling is exact and O(H*W); the pure-numpy
    # fallback grows one ring per pass. Each pass extends reach by one
    # chebyshev step, so max(H, W) passes reach any pixel of the image —
    # the fallback converges to the same fixpoint as scipy on every
    # input (it just costs O(max(H,W) * H*W) worst-case instead).
    try:
        from scipy import ndimage
        labels, _ = ndimage.label(weak, structure=np.ones((3, 3), np.int8))
        keep_ids = np.unique(labels[strong])
        strong = weak & np.isin(labels, keep_ids[keep_ids > 0])
    except ImportError:
        converged = False
        for _ in range(max(mag.shape)):
            sp = np.pad(strong, 1)
            grown = weak & (
                sp[:-2, :-2] | sp[:-2, 1:-1] | sp[:-2, 2:] | sp[1:-1, :-2]
                | sp[1:-1, 2:] | sp[2:, :-2] | sp[2:, 1:-1] | sp[2:, 2:])
            new = strong | grown
            if (new == strong).all():
                converged = True
                break
            strong = new
        if not converged:  # unreachable by the bound argument above
            import warnings
            warnings.warn("canny hysteresis fallback did not reach its "
                          "fixpoint; edges may be incomplete")
    return (strong * 255).astype(np.uint8)
