"""PEA text-to-image pipelines (SD1.5 + SDXL), TPU-native.

Reference parity targets: tests/test_sd_zh.py:124-225 (SD1.5 CFG loop) and
tests/test_sdxl_zh.py:299-437 (SDXL loop incl. add_time_ids and
rescale_noise_cfg) — re-designed as ONE jitted XLA program per
(batch, size, steps) signature: prompt encoding, adapter projection, the whole
`lax.fori_loop` denoise loop and the fp32 VAE decode all compile together;
there is no per-step Python and no host sync until the final image tensor.

The CFG pair rides the batch dimension ([uncond; cond], reference order
tests/test_sd_zh.py:119) so the UNet always sees one large batch — MXU-
friendly. All weights are jit *arguments* (donated where possible), never
baked-in constants.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.adapter import PEAAdapter
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..schedulers import NoiseScheduleConfig
from .sampling import Sampler, make_sampler, rescale_noise_cfg

# params pytree keys: "text", "adapter", "unet", "vae"
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PEAModels:
    """Modules of one PEA deployment (hashable/static; params travel
    separately as jit arguments)."""

    # (text_params, ids [B,T]) -> token hidden states [B,T,D]; family-
    # dispatched (Chinese-CLIP BERT / XLM-R / mT5 / concat).
    text_encoder_fn: Callable[[Any, jnp.ndarray], jnp.ndarray]
    adapter: PEAAdapter
    unet: UNet2DCondition
    vae: AutoencoderKL
    schedule: NoiseScheduleConfig
    vae_scaling: float = 0.18215

    def __hash__(self):  # id-hash: one jit cache per bundle instance
        return id(self)

    def __eq__(self, other):
        return self is other


def denoise_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sampler: Sampler,
    noise: jnp.ndarray,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full sampling loop inside one XLA while-loop.
    eps_fn(x, i) -> CFG-combined model output for latent x at step i."""
    x0 = noise * sampler.init_noise_sigma
    state = sampler.init(noise.shape)

    def body(i, carry):
        x, st = carry
        x_in = sampler.scale(i, x)
        out = eps_fn(x_in, i)
        step_rng = None if rng is None else jax.random.fold_in(rng, i)
        x, st = sampler.step(i, x, out, st, step_rng)
        return (x, st)

    x, _ = jax.lax.fori_loop(0, sampler.num_steps, body, (x0, state))
    return x


def cfg_combine(eps_pair, guidance_scale, guidance_rescale=0.0):
    """eps_pair: [2B,...] with [uncond; cond] halves."""
    eps_u, eps_t = jnp.split(eps_pair, 2, axis=0)
    eps = eps_u + guidance_scale * (eps_t - eps_u)
    if guidance_rescale > 0:
        eps = rescale_noise_cfg(eps, eps_t, guidance_rescale)
    return eps


def decode_latents(models: PEAModels, vae_params, latents: jnp.ndarray) -> jnp.ndarray:
    """fp32 VAE decode -> images in [0,1], NHWC (the reference's fp16-vae
    upcast dance, tests/test_sdxl_zh.py:412-427, is structural here)."""
    z = latents.astype(jnp.float32) / models.vae_scaling
    img = models.vae.apply(vae_params, z, method=models.vae.decode)
    return jnp.clip(img / 2 + 0.5, 0.0, 1.0)


def encode_vae_image(models: PEAModels, vae_params, image, rng):
    """[-1,1] NHWC image -> scaled latent sample (fp32 encode,
    train_sdxl_zh.py:306-309)."""
    z = models.vae.apply(vae_params, image.astype(jnp.float32), rng,
                         method=models.vae.encode_sample)
    return z * models.vae_scaling


def to_pil(images: jnp.ndarray):
    """[B,H,W,3] floats in [0,1] -> list of PIL images (host-side)."""
    arr = np.asarray(jax.device_get(images))
    arr = (arr * 255).round().astype(np.uint8)
    try:
        from PIL import Image
        return [Image.fromarray(a) for a in arr]
    except ImportError:  # headless environments: raw arrays
        return list(arr)


def make_add_time_ids(original_size, crops_coords_top_left, target_size, batch,
                      aesthetic_score=None):
    """SDXL micro-conditioning [B,6] (aesthetic-score refiner variant:
    tests/test_sdxl_zh_inpaint.py:261-305)."""
    if aesthetic_score is not None:
        ids = list(original_size) + list(crops_coords_top_left) + [aesthetic_score]
    else:
        ids = list(original_size) + list(crops_coords_top_left) + list(target_size)
    return jnp.tile(jnp.asarray(ids, jnp.float32)[None], (batch, 1))


def encode_prompt_sd(models: PEAModels, params: Params, ids, uncond_ids):
    """Adapter-projected cross-attn states, CFG-stacked [2B,T,768]. The
    negative prompt ALSO runs through the adapter (the PEA plug-in replaces
    the whole prompt-encoding stage, tests/test_sd_zh.py:73-121)."""
    hs = models.text_encoder_fn(params["text"], ids)
    hs_u = models.text_encoder_fn(params["text"], uncond_ids)
    seq = models.adapter.apply(params["adapter"], hs)
    seq_u = models.adapter.apply(params["adapter"], hs_u)
    return jnp.concatenate([seq_u, seq], axis=0)


def encode_prompt_sdxl(models: PEAModels, params: Params, ids, uncond_ids):
    hs = models.text_encoder_fn(params["text"], ids)
    hs_u = models.text_encoder_fn(params["text"], uncond_ids)
    pooled, seq = models.adapter.apply(params["adapter"], hs)
    pooled_u, seq_u = models.adapter.apply(params["adapter"], hs_u)
    return (jnp.concatenate([seq_u, seq], axis=0),
            jnp.concatenate([pooled_u, pooled], axis=0))


@functools.partial(
    jax.jit,
    static_argnames=("models", "sampler_name", "height", "width", "num_steps",
                     "guidance_scale"),
)
def generate_sd(models: PEAModels, params: Params, ids, uncond_ids, rng, *,
                sampler_name="dpm++", height=512, width=512, num_steps=30,
                guidance_scale=7.5):
    context = encode_prompt_sd(models, params, ids, uncond_ids)
    sampler = make_sampler(sampler_name, models.schedule, num_steps)
    b = ids.shape[0]
    lat_shape = (b, height // 8, width // 8, models.unet.config.in_channels)
    noise = jax.random.normal(rng, lat_shape, jnp.float32)

    def eps_fn(x, i):
        x2 = jnp.concatenate([x, x], axis=0)
        t = jnp.broadcast_to(sampler.timesteps[i], (2 * b,))
        out = models.unet.apply(params["unet"], x2, t, context)
        return cfg_combine(out.astype(jnp.float32), guidance_scale)

    latents = denoise_loop(eps_fn, sampler, noise)
    return decode_latents(models, params["vae"], latents)


@functools.partial(
    jax.jit,
    static_argnames=("models", "sampler_name", "height", "width", "num_steps",
                     "guidance_scale", "guidance_rescale", "original_size",
                     "crops_coords_top_left", "target_size"),
)
def generate_sdxl(models: PEAModels, params: Params, ids, uncond_ids, rng, *,
                  sampler_name="dpm++", height=1024, width=1024, num_steps=30,
                  guidance_scale=7.5, guidance_rescale=0.0,
                  original_size=None, crops_coords_top_left=(0, 0),
                  target_size=None):
    do_cfg = guidance_scale > 1.0
    context, pooled = encode_prompt_sdxl(models, params, ids, uncond_ids)
    b = ids.shape[0]
    if not do_cfg:  # LCM / turbo few-step path: conditional half only
        context, pooled = context[b:], pooled[b:]
    sampler = make_sampler(sampler_name, models.schedule, num_steps)
    noise = jax.random.normal(rng, (b, height // 8, width // 8, 4), jnp.float32)
    mult = 2 if do_cfg else 1
    time_ids = make_add_time_ids(
        original_size or (height, width), crops_coords_top_left,
        target_size or (height, width), mult * b)
    added = {"text_embeds": pooled, "time_ids": time_ids}

    def eps_fn(x, i):
        x_in = jnp.concatenate([x] * mult, axis=0)
        t = jnp.broadcast_to(sampler.timesteps[i], (mult * b,))
        out = models.unet.apply(params["unet"], x_in, t, context, added)
        out = out.astype(jnp.float32)
        if do_cfg:
            return cfg_combine(out, guidance_scale, guidance_rescale)
        return out

    latents = denoise_loop(eps_fn, sampler, noise,
                           rng=jax.random.fold_in(rng, 1))
    return decode_latents(models, params["vae"], latents)


class StableDiffusionPEAPipeline:
    """SD1.5 + PEA adapter (seq-only projection, tests/test_sd_zh.py parity)."""

    def __init__(self, models: PEAModels, params: Params,
                 sampler_name: str = "dpm++"):
        self.models, self.params, self.sampler_name = models, params, sampler_name

    def __call__(self, ids, uncond_ids, *, height=512, width=512, num_steps=30,
                 guidance_scale=7.5, seed=0):
        imgs = generate_sd(
            self.models, self.params, jnp.asarray(ids), jnp.asarray(uncond_ids),
            jax.random.PRNGKey(seed), sampler_name=self.sampler_name,
            height=height, width=width, num_steps=num_steps,
            guidance_scale=float(guidance_scale))
        return to_pil(imgs)


class StableDiffusionXLPEAPipeline:
    """SDXL + PEA adapter (pooled 1280 + seq 2048, tests/test_sdxl_zh.py).
    Also serves SSD-1B / fine-tuned bases (swap unet config+params) and
    LCM-LoRA / Turbo few-step (sampler_name='lcm', guidance_scale<=1)."""

    def __init__(self, models: PEAModels, params: Params,
                 sampler_name: str = "dpm++"):
        self.models, self.params, self.sampler_name = models, params, sampler_name

    def __call__(self, ids, uncond_ids, *, height=1024, width=1024,
                 num_steps=30, guidance_scale=7.5, guidance_rescale=0.0, seed=0):
        imgs = generate_sdxl(
            self.models, self.params, jnp.asarray(ids), jnp.asarray(uncond_ids),
            jax.random.PRNGKey(seed), sampler_name=self.sampler_name,
            height=height, width=width, num_steps=num_steps,
            guidance_scale=float(guidance_scale),
            guidance_rescale=float(guidance_rescale))
        return to_pil(imgs)
