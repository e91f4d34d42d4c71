"""SDXL inpainting pipeline with PEA prompt encoding
(reference: tests/test_sdxl_zh_inpaint.py:480-770).

Covers: mask binarization + latent-resolution downsampling, fp32 VAE encode
of the masked image (:360-381), strength->timestep window (get_timesteps,
:383-417), the 9-channel UNet input cat([latents, mask, masked_image_latents])
(:736-737), and the 4-channel-UNet fallback that blends noised init latents
by mask each step (diffusers semantics for non-inpaint bases).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers import ddpm
from .sampling import make_sampler
from .text2image import (
    PEAModels,
    Params,
    cfg_combine,
    decode_latents,
    encode_prompt_sdxl,
    encode_vae_image,
    make_add_time_ids,
)


def preprocess_mask(mask: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8/float mask -> binarized [1,H,W,1] float (1 = repaint region)."""
    from PIL import Image
    arr = np.asarray(mask, np.float32)
    if arr.ndim == 3:
        arr = arr.mean(-1)
    if arr.max() > 1.5:
        arr = arr / 255.0
    pil = Image.fromarray((arr * 255).astype(np.uint8))
    arr = np.asarray(pil.resize((width, height), resample=2), np.float32) / 255.0
    return (arr > 0.5).astype(np.float32)[None, :, :, None]


def preprocess_image(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8 RGB -> [1,H,W,3] in [-1,1]."""
    from PIL import Image
    pil = Image.fromarray(np.asarray(image, np.uint8)).convert("RGB")
    arr = np.asarray(pil.resize((width, height), resample=2), np.float32) / 255.0
    return (arr * 2 - 1)[None]


@functools.partial(
    jax.jit,
    static_argnames=("models", "sampler_name", "height", "width", "num_steps",
                     "guidance_scale", "guidance_rescale", "strength",
                     "aesthetic_score"),
)
def generate_sdxl_inpaint(
    models: PEAModels, params: Params, ids, uncond_ids, image, mask, rng, *,
    sampler_name="ddim", height=1024, width=1024, num_steps=30,
    guidance_scale=7.5, guidance_rescale=0.0, strength=0.85,
    aesthetic_score=None,
):
    """image: [1|B,H,W,3] in [-1,1]; mask: [1|B,H,W,1] binarized."""
    context, pooled = encode_prompt_sdxl(models, params, ids, uncond_ids)
    b = ids.shape[0]
    k_noise, k_vae1, k_vae2 = jax.random.split(rng, 3)

    sampler = make_sampler(sampler_name, models.schedule, num_steps)
    # strength -> start index (get_timesteps, :383-417)
    t_start = min(int(num_steps * (1 - strength)), num_steps - 1)

    image = jnp.broadcast_to(image, (b,) + image.shape[1:])
    mask = jnp.broadcast_to(mask, (b,) + mask.shape[1:])
    image_latents = encode_vae_image(models, params["vae"], image, k_vae1)
    masked = image * (mask < 0.5)
    masked_latents = encode_vae_image(models, params["vae"], masked, k_vae2)
    # latent resolution from the VAE's actual stride (8 for SD VAEs)
    lh, lw = image_latents.shape[1], image_latents.shape[2]
    mask_lat = jax.image.resize(mask, (b, lh, lw, 1), "nearest")

    noise = jax.random.normal(k_noise, image_latents.shape, jnp.float32)
    sched = ddpm.make_schedule(models.schedule)
    t0 = sampler.timesteps[t_start]
    init = ddpm.add_noise(sched, image_latents, noise,
                          jnp.broadcast_to(t0, (b,)))
    # full-strength start = pure noise (prepare_latents :419-477)
    latents = jnp.where(strength >= 1.0, noise * sampler.init_noise_sigma, init)

    time_ids = make_add_time_ids((height, width), (0, 0), (height, width),
                                 2 * b, aesthetic_score=aesthetic_score)
    added = {"text_embeds": pooled, "time_ids": time_ids}
    nine_ch = models.unet.config.in_channels == 9
    mask2 = jnp.concatenate([mask_lat, mask_lat], axis=0)
    masked2 = jnp.concatenate([masked_latents, masked_latents], axis=0)

    state = sampler.init(latents.shape)

    def body(i, carry):
        x, st = carry
        x_in = sampler.scale(i, x)
        x2 = jnp.concatenate([x_in, x_in], axis=0)
        if nine_ch:  # cat([latents, mask, masked_latents], ch) :736-737
            x2 = jnp.concatenate([x2, mask2, masked2.astype(x2.dtype)], axis=-1)
        t = jnp.broadcast_to(sampler.timesteps[i], (2 * b,))
        out = models.unet.apply(params["unet"], x2, t, context, added)
        eps = cfg_combine(out.astype(jnp.float32), guidance_scale,
                          guidance_rescale)
        x, st = sampler.step(i, x, eps, st, None)
        if not nine_ch:
            # blend: keep unmasked region on the init-image trajectory
            is_last = i == sampler.num_steps - 1
            t_next = sampler.timesteps[jnp.minimum(i + 1, sampler.num_steps - 1)]
            init_prop = jnp.where(
                is_last, image_latents,
                ddpm.add_noise(sched, image_latents, noise,
                               jnp.broadcast_to(t_next, (b,))))
            x = (1 - mask_lat) * init_prop + mask_lat * x
        return (x, st)

    latents, _ = jax.lax.fori_loop(t_start, sampler.num_steps, body,
                                   (latents, state))
    return decode_latents(models, params["vae"], latents)
