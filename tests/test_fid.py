"""FID math: exact closed forms for commuting covariances, self-FID = 0,
sampling consistency."""
import numpy as np

from pea_diffusion_tpu.utils.fid import (fid_from_features, frechet_distance,
                                         gaussian_stats)


def test_frechet_diagonal_closed_form():
    # diagonal covariances commute: d^2 = |dmu|^2 + sum (sqrt(a)-sqrt(b))^2
    mu1, mu2 = np.zeros(4), np.array([1.0, 0, 0, 0])
    a = np.array([1.0, 2.0, 3.0, 4.0])
    b = np.array([2.0, 2.0, 1.0, 9.0])
    expect = 1.0 + ((np.sqrt(a) - np.sqrt(b)) ** 2).sum()
    got = frechet_distance(mu1, np.diag(a), mu2, np.diag(b), eps=0.0)
    np.testing.assert_allclose(got, expect, rtol=1e-10)
    # default eps*I regularization (pytorch-fid stabilizer) perturbs the
    # exact value by at most O(eps * d)
    got_eps = frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    assert abs(got_eps - expect) < 1e-5


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(256, 16)
    assert fid_from_features(f, f) < 1e-8


def test_fid_sampling_consistency():
    """Estimator on large samples approaches the population value."""
    rng = np.random.RandomState(1)
    d = 8
    A = rng.randn(d, d) * 0.3
    cov1 = A @ A.T + np.eye(d)
    B = rng.randn(d, d) * 0.3
    cov2 = B @ B.T + 0.5 * np.eye(d)
    mu1, mu2 = rng.randn(d), rng.randn(d)
    pop = frechet_distance(mu1, cov1, mu2, cov2)
    f1 = rng.multivariate_normal(mu1, cov1, size=20000)
    f2 = rng.multivariate_normal(mu2, cov2, size=20000)
    est = fid_from_features(f1, f2)
    assert abs(est - pop) / pop < 0.05, (est, pop)


def test_gaussian_stats_shapes():
    f = np.random.RandomState(2).randn(32, 5)
    mu, cov = gaussian_stats(f)
    assert mu.shape == (5,) and cov.shape == (5, 5)
    np.testing.assert_allclose(cov, cov.T)
