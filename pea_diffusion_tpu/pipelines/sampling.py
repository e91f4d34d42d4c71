"""Unified sampler interface over the scheduler zoo.

Each scheduler family exposes slightly different step signatures (DPM++ has
multistep state, Euler rescales model input, LCM re-noises with fresh
randomness). `make_sampler` normalizes them to:

    state0 = sampler.init(shape, dtype)
    x_in   = sampler.scale(i, x)
    x, st  = sampler.step(i, x, model_output, st, rng_i)

so one `lax.fori_loop` denoise body serves every pipeline mode.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..schedulers import NoiseScheduleConfig, ddim, dpm_solver, euler, lcm


class Sampler(NamedTuple):
    name: str
    num_steps: int
    timesteps: jnp.ndarray
    init_noise_sigma: float
    init: Callable[..., Any]
    scale: Callable[..., jnp.ndarray]
    step: Callable[..., tuple]


def make_sampler(name: str, cfg: NoiseScheduleConfig, num_steps: int, **kw) -> Sampler:
    if name == "ddim":
        sched = ddim.make_schedule(cfg, num_steps)
        return Sampler(
            name, num_steps, sched.timesteps, sched.init_noise_sigma,
            init=lambda shape, dtype=jnp.float32: (),
            scale=lambda i, x: x,
            step=lambda i, x, out, st, rng=None: (ddim.step(sched, i, x, out), st),
        )
    if name in ("dpm++", "dpmsolver++", "dpm"):
        sched = dpm_solver.make_schedule(cfg, num_steps, **kw)
        return Sampler(
            name, num_steps, sched.timesteps, sched.init_noise_sigma,
            init=lambda shape, dtype=jnp.float32: dpm_solver.init_state(shape, jnp.float32),
            scale=lambda i, x: x,
            step=lambda i, x, out, st, rng=None: dpm_solver.step(sched, i, x, out, st),
        )
    if name == "euler":
        sched = euler.make_schedule(cfg, num_steps)
        return Sampler(
            name, num_steps, sched.timesteps, sched.init_noise_sigma,
            init=lambda shape, dtype=jnp.float32: (),
            scale=lambda i, x: euler.scale_model_input(sched, i, x),
            step=lambda i, x, out, st, rng=None: (euler.step(sched, i, x, out), st),
        )
    if name in ("euler_a", "euler_ancestral"):
        # SDXL-Turbo's scheduler (trailing spacing + guidance 0 at the
        # pipeline level; reference README.md:60)
        sched = euler.make_schedule(cfg, num_steps)
        return Sampler(
            name, num_steps, sched.timesteps, sched.init_noise_sigma,
            init=lambda shape, dtype=jnp.float32: (),
            scale=lambda i, x: euler.scale_model_input(sched, i, x),
            step=lambda i, x, out, st, rng=None: (
                euler.step_ancestral(sched, i, x, out, rng), st),
        )
    if name == "lcm":
        sched = lcm.make_schedule(cfg, num_steps, **kw)
        return Sampler(
            name, sched.num_steps, sched.timesteps, sched.init_noise_sigma,
            init=lambda shape, dtype=jnp.float32: (),
            scale=lambda i, x: x,
            step=lambda i, x, out, st, rng=None: (lcm.step(sched, i, x, out, rng), st),
        )
    raise ValueError(f"unknown sampler {name}")


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """CFG overexposure fix (Lin et al. 2023; reference
    tests/test_sdxl_zh.py:45-56)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg
