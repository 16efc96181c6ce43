import numpy as np
import pytest

from dfq_tpu.quant.moments import (
    relu6_gaussian_mean,
    relu6_gaussian_var,
    relu_gaussian_mean,
    relu_gaussian_var,
)


@pytest.mark.parametrize("mu,sigma", [(0.0, 1.0), (2.0, 0.5), (-1.5, 2.0), (5.0, 3.0)])
def test_relu_moments_vs_monte_carlo(mu, sigma):
    rng = np.random.default_rng(0)
    x = np.maximum(rng.normal(mu, sigma, 2_000_000), 0.0)
    m = relu_gaussian_mean(np.float64(sigma), np.float64(mu))
    v = relu_gaussian_var(np.float64(sigma), np.float64(mu), m)
    assert m == pytest.approx(x.mean(), abs=3e-2)
    assert v == pytest.approx(x.var(), rel=5e-2, abs=3e-2)


@pytest.mark.parametrize("mu,sigma", [(0.0, 1.0), (3.0, 2.0), (7.0, 1.0), (-2.0, 4.0)])
def test_relu6_moments_vs_monte_carlo(mu, sigma):
    rng = np.random.default_rng(1)
    x = np.clip(rng.normal(mu, sigma, 2_000_000), 0.0, 6.0)
    m = relu6_gaussian_mean(np.float64(sigma), np.float64(mu))
    v = relu6_gaussian_var(np.float64(sigma), np.float64(mu), m)
    assert m == pytest.approx(x.mean(), abs=3e-2)
    assert v == pytest.approx(x.var(), rel=5e-2, abs=3e-2)


def test_vectorized_elementwise():
    sigma = np.array([0.5, 1.0, 2.0])
    mu = np.array([-1.0, 0.0, 1.0])
    m = relu_gaussian_mean(sigma, mu)
    assert m.shape == (3,)
    for i in range(3):
        assert m[i] == pytest.approx(relu_gaussian_mean(sigma[i], mu[i]))


def test_parity_with_reference_lambdas():
    """The reference's scipy-based lambdas (utils/layer_transform.py:409-422)
    as an oracle, reconstructed from scipy.stats.norm directly."""
    from scipy.stats import norm

    sigma = np.abs(np.random.default_rng(2).normal(1.0, 0.5, 32)) + 0.1
    mu = np.random.default_rng(3).normal(0.0, 2.0, 32)

    pdf = norm(0, 1).pdf
    cdf = norm.cdf
    ref_mean = sigma * pdf(-mu / sigma) + mu * (1 - cdf(-mu / sigma))
    m = relu_gaussian_mean(sigma, mu)
    np.testing.assert_allclose(m, ref_mean, rtol=1e-10)

    ref_var = (
        (1 - cdf(-mu / sigma)) * (mu * mu + sigma * sigma + m * m - 2 * m * mu)
        + sigma * (mu - 2 * m) * pdf(-mu / sigma)
        + m * m * cdf(-mu / sigma)
    )
    np.testing.assert_allclose(relu_gaussian_var(sigma, mu, m), ref_var, rtol=1e-10)

    ref_mean6 = (
        sigma * (pdf(-mu / sigma) - pdf((6 - mu) / sigma))
        + mu * (cdf((6 - mu) / sigma) - cdf(-mu / sigma))
        + 6 * (1 - cdf((6 - mu) / sigma))
    )
    m6 = relu6_gaussian_mean(sigma, mu)
    np.testing.assert_allclose(m6, ref_mean6, rtol=1e-10)

    ref_var6 = (
        (cdf((6 - mu) / sigma) - cdf(-mu / sigma))
        * (mu * mu + sigma * sigma + m6 * m6 - 2 * m6 * mu)
        + sigma * (-6) * pdf((6 - mu) / sigma)
        + sigma * (mu - 2 * m6) * (pdf(-mu / sigma) - pdf((6 - mu) / sigma))
        + m6 * m6 * cdf(-mu / sigma)
        + (6 - m6) ** 2 * (1 - cdf((6 - mu) / sigma))
    )
    np.testing.assert_allclose(relu6_gaussian_var(sigma, mu, m6), ref_var6, rtol=1e-9)
