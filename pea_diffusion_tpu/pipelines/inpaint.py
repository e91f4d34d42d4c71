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


def generate_sdxl_inpaint(
    models: PEAModels, params: Params, ids, uncond_ids, image, mask, rng, *,
    sampler_name="ddim", height=1024, width=1024, num_steps=30,
    guidance_scale=7.5, guidance_rescale=0.0, strength=0.85,
    aesthetic_score=None, negative_aesthetic_score=2.5, denoising_start=None,
):
    """Host wrapper: guidance, strength, aesthetic_score and denoising_start
    are traced operands (a new strength reuses the compiled program — the
    denoise loop runs with a dynamic lower bound). Only the 9-channel switch
    and the aesthetic-variant time-id shape stay static.

    `denoising_start` (fraction in (0,1), refiner ensemble-of-experts entry,
    reference tests/test_sdxl_zh_inpaint.py:383-417): when given it overrides
    the strength-derived start index AND skips the initial noising — the
    incoming `image` is taken as an already-noised latent trajectory."""
    return _generate_sdxl_inpaint_jit(
        models, params, ids, uncond_ids, image, mask, rng,
        jnp.float32(guidance_scale), jnp.float32(guidance_rescale),
        jnp.float32(strength),
        None if aesthetic_score is None else jnp.float32(aesthetic_score),
        None if aesthetic_score is None
        else jnp.float32(negative_aesthetic_score),
        None if denoising_start is None else jnp.float32(denoising_start),
        sampler_name=sampler_name, height=height, width=width,
        num_steps=num_steps)


@functools.partial(
    jax.jit,
    static_argnames=("models", "sampler_name", "height", "width", "num_steps"),
)
def _generate_sdxl_inpaint_jit(
    models: PEAModels, params: Params, ids, uncond_ids, image, mask, rng,
    guidance_scale, guidance_rescale, strength, aesthetic_score,
    negative_aesthetic_score, denoising_start, *, sampler_name, height, width,
    num_steps,
):
    """image: [1|B,H,W,3] in [-1,1]; mask: [1|B,H,W,1] binarized."""
    context, pooled = encode_prompt_sdxl(models, params, ids, uncond_ids)
    b = ids.shape[0]
    k_noise, k_vae1, k_vae2 = jax.random.split(rng, 3)

    sampler = make_sampler(sampler_name, models.schedule, num_steps)
    # strength -> start index (get_timesteps, :383-417); traced, so the loop
    # below runs with a dynamic lower bound (lax.while lowering)
    t_start = jnp.minimum(
        (num_steps * (1.0 - strength)).astype(jnp.int32), num_steps - 1)
    if denoising_start is not None:
        # discrete timestep cutoff: first index whose timestep < cutoff
        # (diffusers denoising_start semantics, :398-417)
        cutoff = (models.schedule.num_train_timesteps
                  * (1.0 - denoising_start))
        t_start = jnp.argmax((sampler.timesteps < cutoff).astype(jnp.int32))

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
    if denoising_start is not None:
        # refiner hand-off: continue the trajectory without re-noising
        # (diffusers adds noise only when denoising_start is None)
        latents = image_latents

    if aesthetic_score is not None:
        # refiner-style [B,5] ids: uncond gets the negative aesthetic score
        # (reference _get_add_time_ids, tests/test_sdxl_zh_inpaint.py:261-305)
        tid_u = make_add_time_ids((height, width), (0, 0), (height, width), b,
                                  aesthetic_score=negative_aesthetic_score)
        tid_c = make_add_time_ids((height, width), (0, 0), (height, width), b,
                                  aesthetic_score=aesthetic_score)
        time_ids = jnp.concatenate([tid_u, tid_c], axis=0)
    else:
        time_ids = make_add_time_ids((height, width), (0, 0), (height, width),
                                     2 * b)
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
