"""LCM scheduler for few-step sampling with LCM-LoRA / SDXL-Turbo adapters
(reference: tests/test_sdxl_zh_lcm.py:178,334-336 — 5 steps, guidance 0).

Consistency-model boundary conditions (Luo et al. 2023, arXiv:2311.05556):
denoised = c_out(t) * x0(t) + c_skip(t) * x_t; between steps the denoised
estimate is re-noised to the next (coarser->finer) timestep.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import NoiseScheduleConfig, make_alphas_cumprod, predict_x0


class LCMSchedule(NamedTuple):
    timesteps: jnp.ndarray    # [S]
    alpha_t: jnp.ndarray      # [S]
    sigma_t: jnp.ndarray      # [S]
    alpha_next: jnp.ndarray   # [S]; last entry unused
    sigma_next: jnp.ndarray
    c_skip: jnp.ndarray       # [S]
    c_out: jnp.ndarray        # [S]
    init_noise_sigma: float
    num_steps: int
    prediction_type: str = "epsilon"


def make_schedule(
    cfg: NoiseScheduleConfig,
    num_steps: int,
    original_inference_steps: int = 50,
    timestep_scaling: float = 10.0,
    sigma_data: float = 0.5,
) -> LCMSchedule:
    acp = make_alphas_cumprod(cfg)
    k = cfg.num_train_timesteps // original_inference_steps
    origin = np.arange(1, original_inference_steps + 1) * k - 1  # ascending
    # diffusers LCMScheduler.set_timesteps selects by endpoint-free linspace
    # indices (NOT a fixed stride) — differs whenever original_inference_steps
    # is not a multiple of num_steps
    idx = np.floor(np.linspace(0, len(origin), num_steps,
                               endpoint=False)).astype(int)
    ts = origin[::-1][idx]
    a = np.sqrt(acp[ts])
    s = np.sqrt(1 - acp[ts])
    a_next = np.concatenate([a[1:], [1.0]])
    s_next = np.concatenate([s[1:], [0.0]])
    scaled = timestep_scaling * ts
    c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
    c_out = scaled / np.sqrt(scaled**2 + sigma_data**2)
    return LCMSchedule(
        timesteps=jnp.asarray(ts),
        alpha_t=jnp.asarray(a, jnp.float32),
        sigma_t=jnp.asarray(s, jnp.float32),
        alpha_next=jnp.asarray(a_next, jnp.float32),
        sigma_next=jnp.asarray(s_next, jnp.float32),
        c_skip=jnp.asarray(c_skip, jnp.float32),
        c_out=jnp.asarray(c_out, jnp.float32),
        init_noise_sigma=1.0,
        num_steps=len(ts),
        prediction_type=cfg.prediction_type,
    )


def scale_model_input(sched: LCMSchedule, i, sample):
    return sample


def step(
    sched: LCMSchedule,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    rng: Optional[jax.Array] = None,
):
    a_t, s_t = sched.alpha_t[i], sched.sigma_t[i]
    x0 = predict_x0(sched.prediction_type, sample, model_output, a_t, s_t)
    denoised = sched.c_out[i] * x0 + sched.c_skip[i] * sample
    is_last = i == sched.num_steps - 1
    if rng is None:
        noise = jnp.zeros_like(sample)
    else:
        noise = jax.random.normal(rng, sample.shape, sample.dtype)
    renoised = sched.alpha_next[i] * denoised + sched.sigma_next[i] * noise
    return jnp.where(is_last, denoised, renoised)
