"""Seeded random distributions with liquid's pdf/cdf forms.

Behavioral spec: /root/reference/src/random/{uniform,normal,exp,gamma,nakm,
ricek,weib}.rs. Samplers are jax.random-based (explicit key, shape) —
statistically equivalent to the reference's unseeded thread_rng draws but
reproducible (SURVEY.md §4). pdf/cdf helpers are host-side float64 matching
the reference formulas.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ConfigError
from ..math.special import besseli0f, gammaf, lowergammaf, marcumq1f, qf

__all__ = [
    "randf", "randf_pdf", "randf_cdf",
    "randuf", "randuf_pdf", "randuf_cdf",
    "randnf", "crandnf", "awgn", "cawgn", "randnf_pdf", "randnf_cdf",
    "randexpf", "randexpf_pdf", "randexpf_cdf",
    "randgammaf", "randgammaf_pdf", "randgammaf_cdf",
    "randnakmf", "randnakmf_pdf", "randnakmf_cdf",
    "randricekf", "randricekf_pdf", "randricekf_cdf",
    "randweibf", "randweibf_pdf", "randweibf_cdf",
]


# ------------------------------------------------------------------ uniform
def randf(key, shape=()):
    """U[0,1) (uniform.rs:5)."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def randf_pdf(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where((x >= 0) & (x < 1), 1.0, 0.0)


def randf_cdf(x):
    return np.clip(np.asarray(x, dtype=np.float64), 0.0, 1.0)


def randuf(key, a: float, b: float, shape=()):
    """U[a,b) (uniform.rs:31)."""
    if a >= b:
        raise ConfigError("a must be less than b")
    return jax.random.uniform(key, shape, dtype=jnp.float32, minval=a, maxval=b)


def randuf_pdf(x, a: float, b: float):
    if a >= b:
        raise ConfigError("a must be less than b")
    x = np.asarray(x, dtype=np.float64)
    return np.where((x >= a) & (x < b), 1.0 / (b - a), 0.0)


def randuf_cdf(x, a: float, b: float):
    if a >= b:
        raise ConfigError("a must be less than b")
    x = np.asarray(x, dtype=np.float64)
    return np.clip((x - a) / (b - a), 0.0, 1.0)


# ------------------------------------------------------------------- normal
def randnf(key, shape=()):
    """Standard normal (normal.rs:9, Box-Muller there; Threefry here)."""
    return jax.random.normal(key, shape, dtype=jnp.float32)


def crandnf(key, shape=()):
    """Circular complex normal: re,im ~ N(0,1) (normal.rs:29)."""
    kr, ki = jax.random.split(key)
    return (
        jax.random.normal(kr, shape, dtype=jnp.float32)
        + 1j * jax.random.normal(ki, shape, dtype=jnp.float32)
    ).astype(jnp.complex64)


def awgn(key, x, nstd: float):
    """Add real white Gaussian noise (normal.rs:24)."""
    x = jnp.asarray(x)
    return x + nstd * jax.random.normal(key, x.shape, dtype=jnp.float32)


def cawgn(key, x, nstd: float):
    """Add complex white Gaussian noise with total σ = nstd (normal.rs:46)."""
    x = jnp.asarray(x)
    return x + (nstd * jnp.sqrt(0.5)) * crandnf(key, x.shape)


def randnf_pdf(x, eta: float, sig: float):
    """N(η,σ²) pdf (normal.rs:51)."""
    if sig <= 0:
        raise ConfigError("standard deviation must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    t = x - eta
    return np.exp(-(t * t) / (2 * sig * sig)) / (sig * np.sqrt(2 * np.pi))


def randnf_cdf(x, eta: float, sig: float):
    """N(η,σ²) cdf (normal.rs:62)."""
    if sig <= 0:
        raise ConfigError("standard deviation must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    return np.vectorize(lambda v: 1.0 - qf((v - eta) / sig))(x)


# -------------------------------------------------------------- exponential
def randexpf(key, lam: float, shape=()):
    """Exp(λ) via inverse transform (exp.rs:5)."""
    if lam <= 0:
        raise ConfigError("lambda must be greater than zero")
    u = jax.random.uniform(key, shape, dtype=jnp.float32, minval=1e-12, maxval=1.0)
    return -jnp.log(u) / lam


def randexpf_pdf(x, lam: float):
    if lam <= 0:
        raise ConfigError("lambda must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, lam * np.exp(-lam * x), 0.0)


def randexpf_cdf(x, lam: float):
    if lam <= 0:
        raise ConfigError("lambda must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, 1.0 - np.exp(-lam * x), 0.0)


# -------------------------------------------------------------------- gamma
def randgammaf(key, alpha: float, beta: float, shape=()):
    """Gamma(α, β) (gamma.rs:5; jax.random.gamma is the shape-α sampler)."""
    if alpha <= 0:
        raise ConfigError("alpha must be greater than zero")
    if beta <= 0:
        raise ConfigError("beta must be greater than zero")
    return beta * jax.random.gamma(key, alpha, shape, dtype=jnp.float32)


def randgammaf_pdf(x, alpha: float, beta: float):
    if alpha <= 0 or beta <= 0:
        raise ConfigError("alpha and beta must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = (
        x[pos] ** (alpha - 1.0)
        * np.exp(-x[pos] / beta)
        / (gammaf(alpha) * beta**alpha)
    )
    return out


def randgammaf_cdf(x, alpha: float, beta: float):
    if alpha <= 0 or beta <= 0:
        raise ConfigError("alpha and beta must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = [lowergammaf(alpha, v / beta) / gammaf(alpha) for v in x[pos]]
    return out


# ---------------------------------------------------------------- Nakagami-m
def randnakmf(key, m: float, omega: float, shape=()):
    """Nakagami(m, Ω) = sqrt(Gamma(m, Ω/m)) (nakm.rs:5)."""
    if m < 0.5:
        raise ConfigError("m cannot be less than 0.5")
    if omega <= 0:
        raise ConfigError("omega must be greater than zero")
    return jnp.sqrt(randgammaf(key, m, omega / m, shape))


def randnakmf_pdf(x, m: float, omega: float):
    """(nakm.rs:30)."""
    if m < 0.5 or omega <= 0:
        raise ConfigError("invalid m/omega")
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    t = (
        -math.lgamma(m)
        + m * np.log(m / omega)
        + (2 * m - 1) * np.log(x[pos])
        - (m / omega) * x[pos] ** 2
    )
    out[pos] = 2.0 * np.exp(t)
    return out


def randnakmf_cdf(x, m: float, omega: float):
    """γ(m, x²m/Ω)/Γ(m) (nakm.rs:56)."""
    if m < 0.5 or omega <= 0:
        raise ConfigError("invalid m/omega")
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = [lowergammaf(m, v * v * m / omega) / gammaf(m) for v in x[pos]]
    return out


# ------------------------------------------------------------------- Rice-K
def _rice_params(k: float, omega: float):
    s = math.sqrt(omega * k / (k + 1.0))
    sig = math.sqrt(0.5 * omega / (k + 1.0))
    return s, sig


def randricekf(key, k: float, omega: float, shape=()):
    """Rice(K, Ω) = |N(s,σ²) + jN(0,σ²)| (ricek.rs:7)."""
    if k < 0:
        raise ConfigError("k must be non-negative")
    if omega <= 0:
        raise ConfigError("omega must be greater than zero")
    s, sig = _rice_params(k, omega)
    z = crandnf(key, shape)
    return jnp.abs(z.real * sig + s + 1j * (z.imag * sig))


def randricekf_pdf(x, k: float, omega: float):
    """(ricek.rs:34)."""
    if k < 0 or omega <= 0:
        raise ConfigError("invalid k/omega")
    x = np.asarray(x, dtype=np.float64)
    s, sig = _rice_params(k, omega)
    sig2 = sig * sig
    out = np.zeros_like(x)
    pos = x >= 0
    xv = x[pos]
    vals = np.zeros_like(xv)
    for i, v in enumerate(xv):
        arg = v * s / sig2
        if arg > 80.0:
            vals[i] = 0.0
        else:
            vals[i] = (v / sig2) * np.exp(-(v * v + s * s) / (2 * sig2)) * besseli0f(arg)
    out[pos] = vals
    return out


def randricekf_cdf(x, k: float, omega: float):
    """1 − Q₁(s/σ, x/σ) (ricek.rs:66)."""
    if k < 0 or omega <= 0:
        raise ConfigError("invalid k/omega")
    x = np.asarray(x, dtype=np.float64)
    s, sig = _rice_params(k, omega)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = [max(0.0, min(1.0, 1.0 - marcumq1f(s / sig, v / sig))) for v in x[pos]]
    return out


# ------------------------------------------------------------------ Weibull
def randweibf(key, alpha: float, beta: float, gamma: float = 0.0, shape=()):
    """Weibull(α, β) + γ via inverse transform (weib.rs:5)."""
    if alpha <= 0 or beta <= 0:
        raise ConfigError("alpha and beta must be greater than zero")
    u = jax.random.uniform(key, shape, dtype=jnp.float32, minval=1e-12, maxval=1.0)
    return gamma + beta * (-jnp.log(u)) ** (1.0 / alpha)


def randweibf_pdf(x, alpha: float, beta: float, gamma: float = 0.0):
    """(weib.rs:24)."""
    if alpha <= 0 or beta <= 0:
        raise ConfigError("alpha and beta must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    t = x - gamma
    out = np.zeros_like(x)
    pos = t > 0
    out[pos] = (
        (alpha / beta)
        * (t[pos] / beta) ** (alpha - 1.0)
        * np.exp(-((t[pos] / beta) ** alpha))
    )
    return out


def randweibf_cdf(x, alpha: float, beta: float, gamma: float = 0.0):
    """(weib.rs:40)."""
    if alpha <= 0 or beta <= 0:
        raise ConfigError("alpha and beta must be greater than zero")
    x = np.asarray(x, dtype=np.float64)
    t = x - gamma
    out = np.zeros_like(x)
    pos = t > 0
    out[pos] = 1.0 - np.exp(-((t[pos] / beta) ** alpha))
    return out
