"""DPM-Solver++ (2M, multistep) — the reference's default test-time sampler
(DPMSolverMultistepScheduler, train_sdxl_zh.py:139, tests/test_sdxl_zh.py:145).

Implemented from the DPM-Solver++ paper (Lu et al. 2022, arXiv:2211.01095),
data-prediction parametrization, midpoint 2nd-order multistep, with
lower-order fallback at the first and (for short runs) final step.

Scan-friendly: all per-step coefficients are precomputed tables; the running
state is a single previous-x0 buffer, so the whole sampling loop compiles to
one `lax.fori_loop` body with no host sync.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .common import NoiseScheduleConfig, inference_timesteps, make_alphas_cumprod, predict_x0


class DPMSchedule(NamedTuple):
    timesteps: jnp.ndarray   # [S]
    alpha_s: jnp.ndarray     # [S] sqrt(acp) at current step s0
    sigma_s: jnp.ndarray     # [S]
    alpha_next: jnp.ndarray  # [S] target (t) values for the update out of step i
    sigma_next: jnp.ndarray
    h: jnp.ndarray           # [S] lambda_t - lambda_s0
    r0: jnp.ndarray          # [S] h_prev / h (2nd-order ratio; garbage at i=0)
    use_second: jnp.ndarray  # [S] bool mask: apply 2nd-order update at step i
    init_noise_sigma: float
    num_steps: int
    prediction_type: str = "epsilon"


def make_schedule(
    cfg: NoiseScheduleConfig, num_steps: int, lower_order_final: bool = True
) -> DPMSchedule:
    acp = make_alphas_cumprod(cfg)
    ts = inference_timesteps(cfg, num_steps)
    a = np.sqrt(acp[ts])
    s = np.sqrt(1 - acp[ts])
    lam = np.log(a / s)
    # target of step i is timestep i+1; the last step targets the clean sample.
    # Use the smallest-noise table entry (acp[ts_last]) shifted to ~x0: follow
    # the convention sigma_t->0, alpha_t->1 at the end.
    a_next = np.concatenate([a[1:], [1.0]])
    s_next = np.concatenate([s[1:], [np.finfo(np.float64).tiny]])
    lam_next = np.log(a_next / s_next)
    h = lam_next - lam
    h_prev = np.concatenate([[1.0], h[:-1]])
    r0 = h_prev / h
    use_second = np.ones(num_steps, bool)
    use_second[0] = False
    # The final entry of the sigma table is 0 (diffusers
    # final_sigmas_type="zero"), so h -> inf there and the 2nd-order D1 term
    # diverges: diffusers always drops the last step to first order in this
    # mode (its `lower_order_final and < 15` branch only applies to
    # final_sigmas_type="sigma_min"). Verified by trajectory goldens in
    # tests/test_scheduler_goldens.py.
    use_second[-1] = False
    # Final step: exp(-h) -> 0 since lam_next -> +inf; keep h finite for safety.
    h = np.clip(h, -700, 700)
    return DPMSchedule(
        timesteps=jnp.asarray(ts),
        alpha_s=jnp.asarray(a, jnp.float32),
        sigma_s=jnp.asarray(s, jnp.float32),
        alpha_next=jnp.asarray(a_next, jnp.float32),
        sigma_next=jnp.asarray(s_next, jnp.float32),
        h=jnp.asarray(h, jnp.float32),
        r0=jnp.asarray(r0, jnp.float32),
        use_second=jnp.asarray(use_second),
        init_noise_sigma=1.0,
        num_steps=num_steps,
        prediction_type=cfg.prediction_type,
    )


class DPMState(NamedTuple):
    prev_x0: jnp.ndarray  # x0 estimate from the previous step


def init_state(sample_shape, dtype=jnp.float32) -> DPMState:
    return DPMState(prev_x0=jnp.zeros(sample_shape, dtype))


def scale_model_input(sched: DPMSchedule, i, sample):
    return sample


def step(
    sched: DPMSchedule,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    state: DPMState,
):
    """One DPM-Solver++(2M) update; returns (prev_sample, new_state)."""
    a_s, s_s = sched.alpha_s[i], sched.sigma_s[i]
    a_t, s_t = sched.alpha_next[i], sched.sigma_next[i]
    h, r0 = sched.h[i], sched.r0[i]

    x0 = predict_x0(sched.prediction_type, sample, model_output, a_s, s_s).astype(
        jnp.float32
    )
    sample32 = sample.astype(jnp.float32)
    emh1 = jnp.expm1(-h)  # exp(-h) - 1
    ratio = s_t / s_s
    first = ratio * sample32 - a_t * emh1 * x0
    d1 = (x0 - state.prev_x0) / r0
    second = first - 0.5 * a_t * emh1 * d1
    out = jnp.where(sched.use_second[i], second, first)
    return out.astype(sample.dtype), DPMState(prev_x0=x0)
