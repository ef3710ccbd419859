"""Analog FM modulator / demodulator.

Behavioral spec: /root/reference/src/modem/{freqmod.rs,freqdem.rs}.
Freqmod: 16-bit wrapping phase accumulator, Δφ = round(kf·2¹⁶·m), 1024-entry
cexp LUT with 10-bit rounded index (freqmod.rs:45-58). Block modulation uses
a cumulative sum of the *rounded integer* increments — bit-identical to the
per-sample accumulator. Freqdem: m = arg(r'*·r)/(2π·kf) (freqdem.rs:35-43),
a one-lag phase difference that vectorizes with a prepended carried sample.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError

__all__ = ["Freqmod", "Freqdem"]

_TAB_LEN = 1024


def _cexp_table() -> np.ndarray:
    i = np.arange(_TAB_LEN)
    return np.exp(2j * np.pi * i / _TAB_LEN).astype(np.complex64)


@struct.pytree
class Freqmod:
    """FM modulator state (freqmod.rs:6-12)."""

    kf: float = struct.static_field()
    table: jnp.ndarray = struct.field()  # [1024] cexp LUT
    phase: jnp.ndarray = struct.field()  # uint32 holding the 16-bit accumulator

    @classmethod
    def create(cls, kf: float, batch_shape: tuple = ()) -> "Freqmod":
        if kf <= 0.0:
            raise ConfigError(f"modulation factor {kf:.4e} must be greater than 0")
        return cls(
            kf=float(kf),
            table=jnp.asarray(_cexp_table()),
            phase=jnp.zeros(batch_shape, dtype=jnp.uint32),
        )

    def reset(self) -> "Freqmod":
        return self.replace(phase=jnp.zeros_like(self.phase))

    def modulate(self, m) -> tuple[jnp.ndarray, "Freqmod"]:
        """Modulate a block of message samples m [..., N] (freqmod.rs:45).

        Per-sample: phase += round(kf·2¹⁶·m) (mod 2¹⁶); the block uses a
        cumulative integer sum — identical wrap behavior in uint arithmetic.
        """
        m = jnp.asarray(m, dtype=jnp.float32)
        ref = jnp.float32(self.kf * (1 << 16))
        # signed increments rounded exactly as the reference (round-half-away)
        inc = jnp.round(ref * m).astype(jnp.int32)
        csum = jnp.cumsum(inc.astype(jnp.uint32), axis=-1)
        phase16 = (self.phase[..., None] + csum) & jnp.uint32(0xFFFF)
        index = ((phase16 + 0x0020) >> 6) & 0x03FF
        y = jnp.take(self.table, index, axis=0)
        return y, self.replace(phase=phase16[..., -1])

    modulate_block = modulate
    __call__ = modulate


@struct.pytree
class Freqdem:
    """FM demodulator state (freqdem.rs:6-9)."""

    kf: float = struct.static_field()
    r_prime: jnp.ndarray = struct.field()  # previous received sample

    @classmethod
    def create(cls, kf: float, batch_shape: tuple = ()) -> "Freqdem":
        if kf <= 0.0:
            raise ConfigError(f"modulation factor {kf:.4e} must be greater than 0")
        return cls(
            kf=float(kf),
            r_prime=jnp.zeros(batch_shape, dtype=jnp.complex64),
        )

    def reset(self) -> "Freqdem":
        return self.replace(r_prime=jnp.zeros_like(self.r_prime))

    def demodulate(self, r) -> tuple[jnp.ndarray, "Freqdem"]:
        """m[n] = arg(conj(r[n-1])·r[n]) / (2π·kf) (freqdem.rs:35)."""
        r = jnp.asarray(r)
        prev = jnp.concatenate([self.r_prime[..., None], r[..., :-1]], axis=-1)
        m = jnp.angle(jnp.conj(prev) * r) * jnp.float32(1.0 / (2.0 * np.pi * self.kf))
        return m, self.replace(r_prime=r[..., -1])

    demodulate_block = demodulate
    __call__ = demodulate
