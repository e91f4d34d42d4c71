"""Scheduler tests.

The core correctness test is the exact-denoiser oracle: if the model returns
the *exact* noise eps = (x_t - alpha_t * x0) / sigma_t for a known x0, every
ODE sampler must converge to x0 at the end of the loop. This catches
indexing/off-by-one/coefficient errors without needing diffusers goldens.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.schedulers import (
    SD15_SCHEDULE,
    NoiseScheduleConfig,
    common,
    ddim,
    ddpm,
    dpm_solver,
    euler,
    lcm,
)

SHAPE = (2, 4, 8, 8)


def _x0_and_noise(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0 = jax.random.normal(k1, SHAPE) * 0.7
    noise = jax.random.normal(k2, SHAPE)
    return x0, noise


def _oracle_eps(x0):
    def model(x, alpha_t, sigma_t):
        return (x - alpha_t * x0) / sigma_t
    return model


def test_add_noise_formula():
    cfg = SD15_SCHEDULE
    sched = ddpm.make_schedule(cfg)
    x0, noise = _x0_and_noise()
    t = jnp.array([10, 500])
    out = ddpm.add_noise(sched, x0, noise, t)
    acp = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    ref = (
        np.sqrt(acp)[:, None, None, None] * np.asarray(x0)
        + np.sqrt(1 - acp)[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_betas_match_reference_constants():
    # scaled_linear betas: sqrt-space linspace(sqrt(0.00085), sqrt(0.012))**2
    acp = common.make_alphas_cumprod(SD15_SCHEDULE)
    assert abs((1 - acp[0]) - 0.00085) < 1e-6
    assert 0.0 < acp[-1] < 0.005  # terminal acp small but nonzero


def test_ddim_oracle_convergence():
    x0, noise = _x0_and_noise()
    sched = ddim.make_schedule(SD15_SCHEDULE, 50)
    model = _oracle_eps(x0)
    x = noise * sched.init_noise_sigma

    def body(i, x):
        eps = model(x, sched.alpha_t[i], sched.sigma_t[i])
        return ddim.step(sched, i, x, eps)

    x = jax.lax.fori_loop(0, sched.num_steps, body, x)
    # final alpha_prev = sqrt(acp[0]) ~ 0.99957; residual noise ~ sigma[0]
    err = float(jnp.max(jnp.abs(x - x0)))
    assert err < 0.15, err


def test_dpmpp_oracle_exact_recovery():
    x0, noise = _x0_and_noise(1)
    sched = dpm_solver.make_schedule(SD15_SCHEDULE, 20)
    model = _oracle_eps(x0)
    state = dpm_solver.init_state(SHAPE)
    x = noise * sched.init_noise_sigma

    def body(i, carry):
        x, state = carry
        eps = model(x, sched.alpha_s[i], sched.sigma_s[i])
        x, state = dpm_solver.step(sched, i, x, eps, state)
        return (x, state)

    x, _ = jax.lax.fori_loop(0, sched.num_steps, body, (x, state))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_dpmpp_few_step_quality():
    """2nd order must beat 1st order on a curved oracle (x0 depends on t)."""
    x0, noise = _x0_and_noise(2)
    for steps in (10, 30):
        sched = dpm_solver.make_schedule(SD15_SCHEDULE, steps)
        model = _oracle_eps(x0)
        x = noise * 1.0
        state = dpm_solver.init_state(SHAPE)
        for i in range(steps):
            eps = model(x, sched.alpha_s[i], sched.sigma_s[i])
            x, state = dpm_solver.step(sched, jnp.asarray(i), x, eps, state)
        assert float(jnp.max(jnp.abs(x - x0))) < 5e-3


def test_euler_oracle_exact_recovery():
    x0, noise = _x0_and_noise(3)
    sched = euler.make_schedule(SD15_SCHEDULE, 30)
    x = noise * sched.init_noise_sigma

    def body(i, x):
        xin = euler.scale_model_input(sched, i, x)
        sigma = sched.sigmas[i]
        # oracle in Euler parametrization: x = x0 + sigma * eps
        eps = (x - x0) / sigma
        return euler.step(sched, i, x, eps)

    x = jax.lax.fori_loop(0, sched.num_steps, body, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddpm_mean_path_converges():
    x0, noise = _x0_and_noise(4)
    sched = ddpm.make_schedule(SD15_SCHEDULE)

    def body(i, x):
        t = 999 - i
        a = jnp.sqrt(sched.alphas_cumprod[t])
        s = jnp.sqrt(1 - sched.alphas_cumprod[t])
        eps = (x - a * x0) / s
        return ddpm.step(sched, t, x, eps, rng=None)

    x = jax.lax.fori_loop(0, 1000, body, noise)
    # exact-eps mean path lands on x0 (posterior mean collapses at t=0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_lcm_schedule_shapes_and_last_step():
    sched = lcm.make_schedule(SD15_SCHEDULE, 5)
    assert sched.num_steps == 5
    assert int(sched.timesteps[0]) > int(sched.timesteps[-1])
    x0, noise = _x0_and_noise(5)
    x = noise
    for i in range(sched.num_steps):
        eps = (x - sched.alpha_t[i] * x0) / sched.sigma_t[i]
        x = lcm.step(sched, jnp.asarray(i), x, eps, rng=jax.random.PRNGKey(i))
    # consistency boundary conditions keep output near x0 for exact eps
    assert float(jnp.mean(jnp.abs(x - x0))) < 0.25


def test_timestep_spacings():
    for spacing in ("leading", "linspace", "trailing"):
        cfg = NoiseScheduleConfig(timestep_spacing=spacing)
        ts = common.inference_timesteps(cfg, 30)
        assert len(ts) == 30
        assert (np.diff(ts) < 0).all()
        assert ts.min() >= 0 and ts.max() <= 999


def test_v_prediction_roundtrip():
    cfg = NoiseScheduleConfig(prediction_type="v_prediction")
    sched = ddpm.make_schedule(cfg)
    x0, noise = _x0_and_noise(6)
    t = jnp.array([300, 700])
    noisy = ddpm.add_noise(sched, x0, noise, t)
    v = ddpm.get_velocity(sched, x0, noise, t)
    acp = sched.alphas_cumprod[t][:, None, None, None]
    rec_x0 = common.predict_x0(
        "v_prediction", noisy, v, jnp.sqrt(acp), jnp.sqrt(1 - acp)
    )
    np.testing.assert_allclose(np.asarray(rec_x0), np.asarray(x0), atol=1e-5)
