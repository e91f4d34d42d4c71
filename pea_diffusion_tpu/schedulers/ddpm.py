"""DDPM: forward process for KD training + ancestral sampling step.

Training-side parity target: diffusers DDPMScheduler(beta_start=0.00085,
beta_end=0.012, beta_schedule="scaled_linear") used at train_sdxl_zh.py:140,322.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import common
from .common import NoiseScheduleConfig, make_alphas_cumprod, predict_x0


class DDPMSchedule(NamedTuple):
    alphas_cumprod: jnp.ndarray  # [T]
    betas: jnp.ndarray           # [T]
    num_train_timesteps: int
    prediction_type: str = "epsilon"


def make_schedule(cfg: NoiseScheduleConfig) -> DDPMSchedule:
    acp = make_alphas_cumprod(cfg)
    alphas = np.empty_like(acp)
    alphas[0] = acp[0]
    alphas[1:] = acp[1:] / acp[:-1]
    return DDPMSchedule(
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        betas=jnp.asarray(1 - alphas, jnp.float32),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
    )


def add_noise(sched: DDPMSchedule, sample, noise, timesteps):
    return common.add_noise(sched.alphas_cumprod, sample, noise, timesteps)


def get_velocity(sched: DDPMSchedule, sample, noise, timesteps):
    return common.get_velocity(sched.alphas_cumprod, sample, noise, timesteps)


def step(
    sched: DDPMSchedule,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    rng: Optional[jax.Array] = None,
):
    """Ancestral p(x_{t-1} | x_t) step at train-timestep t (traced)."""
    acp_t = sched.alphas_cumprod[t]
    acp_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = sched.betas[t]
    a_t, s_t = jnp.sqrt(acp_t), jnp.sqrt(1 - acp_t)
    x0 = predict_x0(sched.prediction_type, sample, model_output, a_t, s_t)
    # posterior mean coefficients (Ho et al. eq. 7)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1 - acp_t)
    coef_xt = jnp.sqrt(acp_t / acp_prev) * (1 - acp_prev) / (1 - acp_t)
    mean = coef_x0 * x0 + coef_xt * sample
    var = jnp.clip((1 - acp_prev) / (1 - acp_t) * beta_t, 1e-20)
    if rng is not None:
        noise = jax.random.normal(rng, sample.shape, sample.dtype)
        mean = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
    return mean
