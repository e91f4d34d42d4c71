"""DDIM sampler (deterministic, eta=0) as a scan-friendly pure function."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .common import NoiseScheduleConfig, inference_timesteps, make_alphas_cumprod, predict_x0


class DDIMSchedule(NamedTuple):
    timesteps: jnp.ndarray      # [S] descending train-timestep indices
    alpha_t: jnp.ndarray        # [S] sqrt(acp) at each step
    sigma_t: jnp.ndarray        # [S] sqrt(1-acp)
    alpha_prev: jnp.ndarray     # [S] sqrt(acp) at the *next* (previous-time) step
    sigma_prev: jnp.ndarray
    init_noise_sigma: float
    num_steps: int
    prediction_type: str = "epsilon"


def make_schedule(cfg: NoiseScheduleConfig, num_steps: int) -> DDIMSchedule:
    acp = make_alphas_cumprod(cfg)
    ts = inference_timesteps(cfg, num_steps)
    a = acp[ts]
    prev_ts = ts - cfg.num_train_timesteps // num_steps
    final = 1.0 if cfg.set_alpha_to_one else acp[0]
    a_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], final)
    return DDIMSchedule(
        timesteps=jnp.asarray(ts),
        alpha_t=jnp.asarray(np.sqrt(a), jnp.float32),
        sigma_t=jnp.asarray(np.sqrt(1 - a), jnp.float32),
        alpha_prev=jnp.asarray(np.sqrt(a_prev), jnp.float32),
        sigma_prev=jnp.asarray(np.sqrt(1 - a_prev), jnp.float32),
        init_noise_sigma=1.0,
        num_steps=num_steps,
        prediction_type=cfg.prediction_type,
    )


def scale_model_input(sched: DDIMSchedule, i, sample):
    return sample


def step(sched: DDIMSchedule, i: jnp.ndarray, sample: jnp.ndarray, model_output: jnp.ndarray):
    """One DDIM update x_{t} -> x_{t_prev}; `i` may be traced."""
    a_t, s_t = sched.alpha_t[i], sched.sigma_t[i]
    a_p, s_p = sched.alpha_prev[i], sched.sigma_prev[i]
    x0 = predict_x0(sched.prediction_type, sample, model_output, a_t, s_t)
    eps = (sample - a_t * x0) / s_t
    return a_p * x0 + s_p * eps
