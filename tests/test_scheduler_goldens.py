"""Diffusers-trajectory goldens for the scheduler zoo (VERDICT r1 item 8).

The reference samples exclusively through diffusers schedulers
(/root/reference/tests/test_sdxl_zh.py:145,351-352 DPMSolverMultistep;
LCMScheduler tests/test_sdxl_zh_lcm.py:178). diffusers itself is not
installed in this environment, so each scheduler's *exact* published
semantics (timestep spacing incl. steps_offset, sigma reparametrization,
lower-order-final rules, boundary-condition scalings) is re-derived here as
an independent float64 numpy simulator, written from the diffusers
algorithm definitions — NOT from this repo's code — and the repo's
jnp tables/steps are asserted against full step-by-step trajectories.

Oracle-convergence tests (test_schedulers.py) catch coefficient errors;
these catch convention drift (spacing, offsets, final-step order)."""
import numpy as np
import pytest

from pea_diffusion_tpu.schedulers import (NoiseScheduleConfig, ddim,
                                          dpm_solver, euler, lcm)
from pea_diffusion_tpu.schedulers.common import (inference_timesteps,
                                                 make_alphas_cumprod)

CFG = NoiseScheduleConfig()  # SD/SDXL: scaled_linear 0.00085..0.012, T=1000


def _acp():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


# --- timestep tables --------------------------------------------------------


def test_leading_spacing_table_30_steps():
    """leading spacing + steps_offset=1, the SD/SDXL default: diffusers
    computes (arange(S) * (T//S)).round()[::-1] + steps_offset."""
    ts = inference_timesteps(CFG, 30)
    expected = (np.arange(30) * 33)[::-1] + 1
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 958 and ts[-1] == 1


def test_trailing_spacing_table_turbo():
    """trailing spacing (SDXL-Turbo 4-step): arange(T, 0, -T/S).round()-1."""
    cfg = NoiseScheduleConfig(timestep_spacing="trailing")
    np.testing.assert_array_equal(inference_timesteps(cfg, 4),
                                  [999, 749, 499, 249])
    np.testing.assert_array_equal(inference_timesteps(cfg, 1), [999])


def test_linspace_spacing_table():
    ts = inference_timesteps(NoiseScheduleConfig(timestep_spacing="linspace"), 10)
    expected = np.linspace(0, 999, 10).round()[::-1]
    np.testing.assert_array_equal(ts, expected)


def test_lcm_timestep_table():
    """diffusers LCMScheduler: origin grid k*[1..50]-1, then endpoint-free
    linspace index selection from the reversed grid."""
    sched = lcm.make_schedule(CFG, 5, original_inference_steps=50)
    # k=20 -> origin ascending [19, 39, ..., 999]; reversed -> 999, 979, ...
    np.testing.assert_array_equal(sched.timesteps, [999, 799, 599, 399, 199])
    # non-divisible: 8 steps from 50 origin entries uses linspace floors
    sched8 = lcm.make_schedule(CFG, 8, original_inference_steps=50)
    origin = np.arange(1, 51) * 20 - 1
    idx = np.floor(np.linspace(0, 50, 8, endpoint=False)).astype(int)
    np.testing.assert_array_equal(sched8.timesteps, origin[::-1][idx])


# --- DDIM trajectory --------------------------------------------------------


def _ddim_diffusers_trajectory(x, eps_seq, num_steps, set_alpha_to_one=False):
    """diffusers DDIMScheduler.step (eta=0, epsilon prediction, no clipping):
    prev_t = t - T//S; x0 = (x - sqrt(1-acp_t) e)/sqrt(acp_t);
    x' = sqrt(acp_prev) x0 + sqrt(1-acp_prev) e."""
    acp = _acp()
    ts = (np.arange(num_steps) * (1000 // num_steps))[::-1] + 1
    final_acp = 1.0 if set_alpha_to_one else acp[0]
    traj = []
    for i, t in enumerate(ts):
        e = eps_seq[i]
        prev_t = t - 1000 // num_steps
        a_t = acp[t]
        a_prev = acp[prev_t] if prev_t >= 0 else final_acp
        x0 = (x - np.sqrt(1 - a_t) * e) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * e
        traj.append(x.copy())
    return traj


def test_ddim_trajectory_matches_diffusers_semantics():
    rng = np.random.default_rng(0)
    shape = (1, 4, 8, 8)
    x = rng.standard_normal(shape)
    eps_seq = [rng.standard_normal(shape) for _ in range(30)]
    golden = _ddim_diffusers_trajectory(x, eps_seq, 30)

    sched = ddim.make_schedule(CFG, 30)
    xr = np.asarray(x, np.float32)
    for i in range(30):
        xr = np.asarray(ddim.step(sched, i, xr,
                                  np.asarray(eps_seq[i], np.float32)))
        np.testing.assert_allclose(xr, golden[i], rtol=2e-4, atol=2e-4)


# --- DPM-Solver++ 2M trajectory ---------------------------------------------


def _dpm2m_diffusers_trajectory(x, eps_seq, num_steps,
                                lower_order_final=True):
    """diffusers DPMSolverMultistepScheduler (algorithm_type='dpmsolver++',
    solver_order=2, midpoint), sigma reparametrization with a trailing 0:
    alpha_t = 1/sqrt(1+sig^2), sigma_t = sig*alpha_t, lambda = log(a/s)."""
    acp = _acp()
    ts = (np.arange(num_steps) * (1000 // num_steps))[::-1] + 1
    sig = np.sqrt((1 - acp[ts]) / acp[ts])
    sig = np.concatenate([sig, [0.0]])
    alpha = 1.0 / np.sqrt(1 + sig**2)
    sigma = sig * alpha
    with np.errstate(divide="ignore"):
        lam = np.log(alpha) - np.log(sigma)  # +inf at the trailing 0

    m = [None, None]  # m[0]=latest converted x0, m[1]=previous
    lower_order_nums = 0
    traj = []
    for i in range(num_steps):
        e = eps_seq[i]
        x0 = (x - sigma[i] * e) / alpha[i]
        m[1], m[0] = m[0], x0
        final = i == num_steps - 1
        # final sigma is 0 (final_sigmas_type="zero") -> diffusers always
        # uses first order at the last step regardless of run length
        use_first = (lower_order_nums < 1) or final
        h = lam[i + 1] - lam[i]
        emh1 = np.expm1(-h) if np.isfinite(h) else -1.0
        ratio = (sigma[i + 1] / sigma[i]) if sigma[i + 1] > 0 else 0.0
        first = ratio * x - alpha[i + 1] * emh1 * x0
        if use_first:
            x = first
        else:
            h_0 = lam[i] - lam[i - 1]
            r0 = h_0 / h if np.isfinite(h) else 0.0
            d1 = (m[0] - m[1]) / r0 if r0 != 0 else (m[0] - m[1]) * 0
            # final step: r0 -> 0 because h -> inf; diffusers evaluates the
            # same formula with torch inf arithmetic -> D1 term = 0.5*(m0-m1)*h_0/h
            if not np.isfinite(h):
                d1 = (m[0] - m[1]) * 0.0
            x = first - 0.5 * alpha[i + 1] * emh1 * d1
        lower_order_nums = min(lower_order_nums + 1, 2)
        traj.append(x.copy())
    return traj


@pytest.mark.parametrize("num_steps", [30, 10])
def test_dpm2m_trajectory_matches_diffusers_semantics(num_steps):
    rng = np.random.default_rng(1)
    shape = (1, 4, 8, 8)
    x = rng.standard_normal(shape)
    eps_seq = [rng.standard_normal(shape) for _ in range(num_steps)]
    golden = _dpm2m_diffusers_trajectory(x, eps_seq, num_steps)

    sched = dpm_solver.make_schedule(CFG, num_steps)
    st = dpm_solver.init_state(shape)
    xr = np.asarray(x, np.float32)
    for i in range(num_steps):
        xr, st = dpm_solver.step(sched, i, xr,
                                 np.asarray(eps_seq[i], np.float32), st)
        xr = np.asarray(xr)
        np.testing.assert_allclose(
            xr, golden[i], rtol=3e-4, atol=3e-4,
            err_msg=f"step {i} (S={num_steps})")


def test_dpm2m_lower_order_final_rule():
    """with the trailing zero sigma (final_sigmas_type='zero') the last step
    is ALWAYS first order — h is infinite there and the D1 term would
    diverge; first steps warm up at order 1 too."""
    s10 = dpm_solver.make_schedule(CFG, 10)
    s30 = dpm_solver.make_schedule(CFG, 30)
    assert not bool(s10.use_second[-1])
    assert not bool(s30.use_second[-1])
    assert not bool(s10.use_second[0]) and not bool(s30.use_second[0])
    assert bool(s30.use_second[1]) and bool(s30.use_second[-2])


# --- Euler trajectory -------------------------------------------------------


def _euler_diffusers_trajectory(x, eps_seq, num_steps):
    """diffusers EulerDiscreteScheduler (non-ancestral, no karras): the model
    sees x/sqrt(sig^2+1); x0 = x - sig*e; x' = x + (x-x0)/sig * (sig_next-sig).
    Returns (scaled model inputs, trajectory) to check both halves."""
    acp = _acp()
    ts = (np.arange(num_steps) * (1000 // num_steps))[::-1] + 1
    sig = np.concatenate([np.sqrt((1 - acp[ts]) / acp[ts]), [0.0]])
    traj, scaled_inputs = [], []
    for i in range(num_steps):
        scaled_inputs.append(x / np.sqrt(sig[i] ** 2 + 1))
        e = eps_seq[i]
        x0 = x - sig[i] * e
        d = (x - x0) / sig[i]
        x = x + d * (sig[i + 1] - sig[i])
        traj.append(x.copy())
    return scaled_inputs, traj


def test_euler_trajectory_matches_diffusers_semantics():
    rng = np.random.default_rng(2)
    shape = (1, 4, 8, 8)
    x = rng.standard_normal(shape)
    eps_seq = [rng.standard_normal(shape) for _ in range(30)]
    scaled_golden, golden = _euler_diffusers_trajectory(x, eps_seq, 30)

    sched = euler.make_schedule(CFG, 30)
    # leading spacing init sigma is sqrt(max^2+1) in diffusers
    assert abs(sched.init_noise_sigma
               - float(np.sqrt(np.asarray(sched.sigmas).max() ** 2 + 1))) < 1e-5
    xr = np.asarray(x, np.float32)
    for i in range(30):
        si = np.asarray(euler.scale_model_input(sched, i, xr))
        np.testing.assert_allclose(si, scaled_golden[i], rtol=2e-4, atol=2e-4)
        xr = np.asarray(euler.step(sched, i, xr,
                                   np.asarray(eps_seq[i], np.float32)))
        np.testing.assert_allclose(xr, golden[i], rtol=2e-4, atol=2e-4,
                                   err_msg=f"step {i}")


# --- LCM trajectory ---------------------------------------------------------


def _lcm_diffusers_trajectory(x, eps_seq, noise_seq, num_steps):
    """diffusers LCMScheduler.step: boundary-condition scalings with
    timestep_scaling=10, sigma_data=0.5; re-noise to the next timestep
    except at the last step."""
    acp = _acp()
    origin = np.arange(1, 51) * 20 - 1
    idx = np.floor(np.linspace(0, 50, num_steps, endpoint=False)).astype(int)
    ts = origin[::-1][idx]
    traj = []
    for i, t in enumerate(ts):
        e = eps_seq[i]
        a, s = np.sqrt(acp[t]), np.sqrt(1 - acp[t])
        x0 = (x - s * e) / a
        st = 10.0 * t
        c_skip = 0.25 / (st**2 + 0.25)
        c_out = st / np.sqrt(st**2 + 0.25)
        denoised = c_out * x0 + c_skip * x
        if i < num_steps - 1:
            tn = ts[i + 1]
            x = (np.sqrt(acp[tn]) * denoised
                 + np.sqrt(1 - acp[tn]) * noise_seq[i])
        else:
            x = denoised
        traj.append(x.copy())
    return traj


def test_lcm_trajectory_matches_diffusers_semantics():
    rng = np.random.default_rng(3)
    shape = (1, 4, 8, 8)
    x = rng.standard_normal(shape)
    eps_seq = [rng.standard_normal(shape) for _ in range(5)]
    noise_seq = [rng.standard_normal(shape) for _ in range(5)]
    golden = _lcm_diffusers_trajectory(x, eps_seq, noise_seq, 5)

    sched = lcm.make_schedule(CFG, 5)
    xr = np.asarray(x, np.float32)
    for i in range(5):
        # inject the golden noise deterministically (rng=None -> zeros, so
        # add the renoise term manually through the same formula)
        a_t, s_t = np.asarray(sched.alpha_t[i]), np.asarray(sched.sigma_t[i])
        xr = np.asarray(lcm.step(sched, i, xr,
                                 np.asarray(eps_seq[i], np.float32), rng=None))
        if i < 4:
            xr = xr + np.asarray(sched.sigma_next[i]) * np.asarray(
                noise_seq[i], np.float32)
        np.testing.assert_allclose(xr, golden[i], rtol=3e-4, atol=3e-4,
                                   err_msg=f"step {i}")


# --- Euler-ancestral trajectory (SDXL-Turbo's scheduler) --------------------


def _euler_a_diffusers_trajectory(x, eps_seq, noise_seq, num_steps,
                                  spacing="trailing"):
    """Independent float64 simulator of diffusers
    EulerAncestralDiscreteScheduler.step (epsilon prediction): ancestral
    split sigma_to^2 = sigma_down^2 + sigma_up^2 with
    sigma_up^2 = sigma_to^2 (sigma_from^2 - sigma_to^2) / sigma_from^2."""
    acp = _acp()
    if spacing == "trailing":  # SDXL-Turbo: arange(T,0,-T/S).round()-1
        ts = np.arange(1000, 0, -1000 / num_steps).round().astype(int) - 1
    else:  # leading + steps_offset=1 (SD default)
        ts = (np.arange(num_steps) * (1000 // num_steps))[::-1] + 1
    sig = np.concatenate([np.sqrt((1 - acp[ts]) / acp[ts]), [0.0]])
    traj, scaled_inputs = [], []
    for i in range(num_steps):
        scaled_inputs.append(x / np.sqrt(sig[i] ** 2 + 1))
        x0 = x - sig[i] * eps_seq[i]
        up2 = sig[i + 1] ** 2 * (sig[i] ** 2 - sig[i + 1] ** 2) / sig[i] ** 2
        sigma_up = np.sqrt(up2)
        sigma_down = np.sqrt(sig[i + 1] ** 2 - up2)
        d = (x - x0) / sig[i]
        x = x + d * (sigma_down - sig[i]) + noise_seq[i] * sigma_up
        traj.append(x.copy())
    return scaled_inputs, traj


@pytest.mark.parametrize("spacing,num_steps", [("trailing", 4),
                                               ("leading", 30)])
def test_euler_ancestral_trajectory_matches_diffusers_semantics(
        spacing, num_steps):
    rng = np.random.default_rng(4)
    shape = (1, 4, 8, 8)
    x = rng.standard_normal(shape)
    eps_seq = [rng.standard_normal(shape) for _ in range(num_steps)]
    noise_seq = [rng.standard_normal(shape) for _ in range(num_steps)]
    scaled_golden, golden = _euler_a_diffusers_trajectory(
        x, eps_seq, noise_seq, num_steps, spacing)

    cfg = NoiseScheduleConfig(timestep_spacing=spacing)
    sched = euler.make_schedule(cfg, num_steps)
    # diffusers init_noise_sigma: max sigma for trailing, sqrt(max^2+1)
    # for leading
    smax = float(np.asarray(sched.sigmas).max())
    expect_init = smax if spacing == "trailing" else float(
        np.sqrt(smax**2 + 1))
    assert abs(sched.init_noise_sigma - expect_init) < 1e-5
    xr = np.asarray(x, np.float32)
    for i in range(num_steps):
        si = np.asarray(euler.scale_model_input(sched, i, xr))
        np.testing.assert_allclose(si, scaled_golden[i], rtol=2e-4,
                                   atol=2e-4)
        # rng=None -> deterministic part; inject the golden noise through
        # the same ancestral_sigmas split the step uses
        xr = np.asarray(euler.step_ancestral(
            sched, i, xr, np.asarray(eps_seq[i], np.float32), rng=None))
        _, sigma_up = euler.ancestral_sigmas(sched, i)
        xr = xr + float(sigma_up) * np.asarray(noise_seq[i], np.float32)
        np.testing.assert_allclose(xr, golden[i], rtol=3e-4, atol=3e-4,
                                   err_msg=f"step {i}")
    assert abs(float(np.asarray(sched.sigmas)[-1])) == 0.0


def test_euler_ancestral_rng_path_noise_scale():
    """The jitted rng path adds noise with std sigma_up (and none at the
    final step where sigma_to=0)."""
    import jax

    sched = euler.make_schedule(CFG, 4)
    x = np.zeros((1, 4, 16, 16), np.float32)
    eps = np.zeros_like(x)
    # x=eps=0 -> x0=0, d=0: output is purely the injected noise term
    out = np.asarray(euler.step_ancestral(sched, 1, x, eps,
                                          rng=jax.random.PRNGKey(0)))
    _, sigma_up = euler.ancestral_sigmas(sched, 1)
    assert abs(float(out.std()) / float(sigma_up) - 1.0) < 0.05
    last = np.asarray(euler.step_ancestral(sched, 3, x, eps,
                                           rng=jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(last, 0.0)
