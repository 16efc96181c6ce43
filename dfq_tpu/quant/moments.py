"""Closed-form moments of rectified / clipped Gaussians.

These are the statistical engine of data-free range setting and bias
correction: given a pre-activation ``X ~ N(mu, sigma^2)`` (mu/sigma taken
from folded BatchNorm statistics), compute mean and variance of
``ReLU(X)`` and ``clip(X, 0, 6)`` (ReLU6).

Behavioral contract is the reference's lambdas at
``/root/reference/utils/layer_transform.py:409-422`` (note the reference
passes ``sigma`` as "weight" and ``mu`` as "bias"); validated against
Monte-Carlo in ``tests/test_moments.py``.

All functions are elementwise, work on numpy or jax arrays, and are
jittable on the jax path.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import jax.scipy.special as jsp_special
import numpy as np
import scipy.special as sp_special

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _backend(x):
    if isinstance(x, jnp.ndarray):
        return jnp, jsp_special.erf
    return np, sp_special.erf


def _phi(x, xp):
    """Standard normal pdf."""
    return _INV_SQRT_2PI * xp.exp(-0.5 * x * x)


def _Phi(x, erf):
    """Standard normal cdf."""
    return 0.5 * (1.0 + erf(x / _SQRT2))


def relu_gaussian_mean(sigma, mu):
    """E[ReLU(X)], X ~ N(mu, sigma^2)."""
    xp, erf = _backend(sigma)
    a = -mu / sigma
    return sigma * _phi(a, xp) + mu * (1.0 - _Phi(a, erf))


def relu_gaussian_var(sigma, mu, mean):
    """E[(ReLU(X) - mean)^2] given precomputed ``mean = E[ReLU(X)]``."""
    xp, erf = _backend(sigma)
    a = -mu / sigma
    cdf_a = _Phi(a, erf)
    return (
        (1.0 - cdf_a) * (mu * mu + sigma * sigma + mean * mean - 2.0 * mean * mu)
        + sigma * (mu - 2.0 * mean) * _phi(a, xp)
        + mean * mean * cdf_a
    )


def relu6_gaussian_mean(sigma, mu, cap: float = 6.0):
    """E[clip(X, 0, cap)], X ~ N(mu, sigma^2)."""
    xp, erf = _backend(sigma)
    a = -mu / sigma
    b = (cap - mu) / sigma
    return (
        sigma * (_phi(a, xp) - _phi(b, xp))
        + mu * (_Phi(b, erf) - _Phi(a, erf))
        + cap * (1.0 - _Phi(b, erf))
    )


def relu6_gaussian_var(sigma, mu, mean, cap: float = 6.0):
    """E[(clip(X,0,cap) - mean)^2] given ``mean = E[clip(X,0,cap)]``."""
    xp, erf = _backend(sigma)
    a = -mu / sigma
    b = (cap - mu) / sigma
    cdf_a = _Phi(a, erf)
    cdf_b = _Phi(b, erf)
    return (
        (cdf_b - cdf_a) * (mu * mu + sigma * sigma + mean * mean - 2.0 * mean * mu)
        + sigma * (-cap) * _phi(b, xp)
        + sigma * (mu - 2.0 * mean) * (_phi(a, xp) - _phi(b, xp))
        + mean * mean * cdf_a
        + (cap - mean) ** 2 * (1.0 - cdf_b)
    )
