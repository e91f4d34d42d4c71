"""Euler discrete sampler (SDXL's shipped default scheduler family).

Also the ancestral variant (`step_ancestral`) — EulerAncestralDiscrete is
SDXL-Turbo's shipped scheduler (reference README.md:60 lists SDXL-Turbo as
a supported downstream; turbo checkpoints pair trailing-spacing timesteps,
guidance 0 and this sampler)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import NoiseScheduleConfig, inference_timesteps, make_alphas_cumprod


class EulerSchedule(NamedTuple):
    timesteps: jnp.ndarray  # [S]
    sigmas: jnp.ndarray     # [S+1], last entry 0
    init_noise_sigma: float
    num_steps: int
    prediction_type: str = "epsilon"


def make_schedule(cfg: NoiseScheduleConfig, num_steps: int) -> EulerSchedule:
    acp = make_alphas_cumprod(cfg)
    ts = inference_timesteps(cfg, num_steps)
    sig = np.sqrt((1 - acp[ts]) / acp[ts])
    sigmas = np.concatenate([sig, [0.0]])
    if cfg.timestep_spacing in ("linspace", "trailing"):
        init_sigma = float(sigmas.max())
    else:
        init_sigma = float(np.sqrt(sigmas.max() ** 2 + 1))
    return EulerSchedule(
        timesteps=jnp.asarray(ts),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        init_noise_sigma=init_sigma,
        num_steps=num_steps,
        prediction_type=cfg.prediction_type,
    )


def scale_model_input(sched: EulerSchedule, i, sample):
    sigma = sched.sigmas[i]
    return sample / jnp.sqrt(sigma**2 + 1).astype(sample.dtype)


def step(sched: EulerSchedule, i, sample, model_output):
    sigma = sched.sigmas[i]
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    if sched.prediction_type == "epsilon":
        x0 = x - sigma * eps
    elif sched.prediction_type == "v_prediction":
        x0 = x / (sigma**2 + 1) - eps * sigma / jnp.sqrt(sigma**2 + 1)
    else:
        raise ValueError(sched.prediction_type)
    d = (x - x0) / sigma
    out = x + d * (sched.sigmas[i + 1] - sigma)
    return out.astype(sample.dtype)


def ancestral_sigmas(sched: EulerSchedule, i):
    """diffusers EulerAncestralDiscreteScheduler.step's (sigma_down,
    sigma_up) split of the sigma_from -> sigma_to move: the deterministic
    Euler step goes to sigma_down, fresh noise restores the marginal to
    sigma_to. sigma_to = 0 at the final step makes both terms 0."""
    s_from = sched.sigmas[i]
    s_to = sched.sigmas[i + 1]
    up2 = s_to**2 * (s_from**2 - s_to**2) / jnp.maximum(s_from**2, 1e-20)
    sigma_up = jnp.sqrt(jnp.maximum(up2, 0.0))
    sigma_down = jnp.sqrt(jnp.maximum(s_to**2 - up2, 0.0))
    return sigma_down, sigma_up


def step_ancestral(sched: EulerSchedule, i, sample, model_output,
                   rng: Optional[jax.Array] = None):
    """Euler-ancestral step. `rng=None` returns the deterministic part
    only (scheduler goldens inject the noise term explicitly, same
    convention as lcm.step)."""
    sigma = sched.sigmas[i]
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    if sched.prediction_type == "epsilon":
        x0 = x - sigma * eps
    elif sched.prediction_type == "v_prediction":
        x0 = x / (sigma**2 + 1) - eps * sigma / jnp.sqrt(sigma**2 + 1)
    else:
        raise ValueError(sched.prediction_type)
    sigma_down, sigma_up = ancestral_sigmas(sched, i)
    d = (x - x0) / sigma
    out = x + d * (sigma_down - sigma)
    if rng is not None:
        out = out + sigma_up * jax.random.normal(rng, out.shape, jnp.float32)
    return out.astype(sample.dtype)
