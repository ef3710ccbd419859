"""Quantization / companding.

The reference stubs this module (src/quantization/mod.rs is empty); behavior
follows liquid-dsp's compand/quantizer API (LIQUID_COMPAT.md:1945-1955):
μ-law compression/expansion and fixed-point ADC/DAC quantization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..errors import ConfigError

__all__ = [
    "compress_mulaw",
    "expand_mulaw",
    "quantize_adc",
    "quantize_dac",
    "Quantizer",
]


def compress_mulaw(x, mu: float = 255.0):
    """μ-law compression: sign(x)·ln(1+μ|x|)/ln(1+μ) (liquid compand).

    Complex inputs compand I and Q independently (liquid
    ``compress_cf_mulaw``, compand_cfloat autotest semantics).
    """
    if mu <= 0:
        raise ConfigError("mu must be greater than zero")
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return (compress_mulaw(jnp.real(x), mu)
                + 1j * compress_mulaw(jnp.imag(x), mu)).astype(x.dtype)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)


def expand_mulaw(y, mu: float = 255.0):
    """μ-law expansion (inverse of compression)."""
    if mu <= 0:
        raise ConfigError("mu must be greater than zero")
    y = jnp.asarray(y)
    if jnp.iscomplexobj(y):
        return (expand_mulaw(jnp.real(y), mu)
                + 1j * expand_mulaw(jnp.imag(y), mu)).astype(y.dtype)
    return jnp.sign(y) * (jnp.exp(jnp.abs(y) * np.log1p(mu)) - 1.0) / mu

def quantize_adc(x, num_bits: int):
    """Uniform quantize x ∈ [-1,1) to signed integer codes (liquid qtype ADC)."""
    if num_bits < 1 or num_bits > 24:
        raise ConfigError("number of bits must be in [1,24]")
    scale = 1 << (num_bits - 1)
    x = jnp.asarray(x)
    q = jnp.floor(jnp.clip(x, -1.0, 1.0 - 1.0 / scale) * scale)
    return q.astype(jnp.int32)


def quantize_dac(q, num_bits: int):
    """Integer codes → float midpoint values (liquid qtype DAC)."""
    if num_bits < 1 or num_bits > 24:
        raise ConfigError("number of bits must be in [1,24]")
    scale = 1 << (num_bits - 1)
    return (jnp.asarray(q).astype(jnp.float32) + 0.5) / scale


class Quantizer:
    """Compander + fixed-point quantizer (liquid quantizer object)."""

    def __init__(self, num_bits: int, compander: str = "none", mu: float = 255.0):
        if compander not in ("none", "mulaw"):
            raise ConfigError(f"unknown compander {compander!r}")
        self.num_bits = num_bits
        self.compander = compander
        self.mu = mu
        quantize_adc(jnp.zeros(1), num_bits)  # validates num_bits

    def execute_adc(self, x):
        if self.compander == "mulaw":
            x = compress_mulaw(x, self.mu)
        return quantize_adc(x, self.num_bits)

    def execute_dac(self, q):
        y = quantize_dac(q, self.num_bits)
        if self.compander == "mulaw":
            y = expand_mulaw(y, self.mu)
        return y
