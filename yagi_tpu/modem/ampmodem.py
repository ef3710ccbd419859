"""Analog amplitude modulator / demodulator (AM: DSB, USB, LSB).

Fills liquid-dsp's ``ampmodem`` object — un-ported (❓) in
/root/reference/LIQUID_COMPAT.md; the reference's modem module stops at
FM/FSK (/root/reference/src/modem/). Conventions follow liquid's model:

- modulation index ``mu`` > 0, sideband type ∈ {DSB, USB, LSB}, and a
  suppressed-carrier flag.
- **modulate** (real message m[n] ∈ [-1,1] → complex baseband y[n]):
  the message (DSB) or its analytic extension (SSB, via a streaming FIR
  Hilbert transformer) is scaled by ``mu``; with carrier, a unit DC term is
  added and the result normalized by 1/(1+mu) so |y| ≤ 1.
- **demodulate**: with carrier, a one-pole carrier tracker extracts the DC
  pilot, derotates, and envelope-detects (DSB) or takes the real part
  (SSB); suppressed-carrier modes demodulate coherently as Re(y)/mu.

The SSB Hilbert path is a length-(4m+1) windowed type-III FIR Hilbert
transformer run through the streaming :class:`~yagi_tpu.filter.FirFilter`
machinery, so block splits are invariant; the in-phase arm is delayed by
the matching 2m samples. Demodulated output therefore lags the message by
``delay`` samples (0 for DSB), mirroring liquid's filter-delay semantics.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from ..filter.firfilt import FirFilter
from ..math.windows import kaiser as _kaiser_window

__all__ = ["AmpModemType", "AmpModem"]


class AmpModemType(enum.Enum):
    DSB = "dsb"
    USB = "usb"
    LSB = "lsb"


def _hilbert_taps(m: int, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed odd-length type-III Hilbert transformer, n = 4m+1.

    Ideal response h[k] = 2/(πk) for odd k, 0 for even k (antisymmetric).
    """
    n = 4 * m + 1
    k = np.arange(n) - (n - 1) // 2
    h = np.zeros(n, dtype=np.float64)
    odd = (k % 2) != 0
    h[odd] = 2.0 / (np.pi * k[odd])
    w = np.asarray(_kaiser_window(n, beta))
    return (h * w).astype(np.float32)


@struct.pytree
class AmpModem:
    """AM modulator/demodulator state (liquid ampmodem)."""

    mu: float = struct.static_field()
    type: AmpModemType = struct.static_field()
    suppressed: bool = struct.static_field()
    m: int = struct.static_field()  # Hilbert semi-length (SSB only)
    alpha: float = struct.static_field()  # carrier-tracker pole
    hilb: FirFilter | None = struct.field()  # quadrature arm (SSB)
    delay_line: jnp.ndarray | None = struct.field()  # in-phase delay (SSB)
    carrier: jnp.ndarray = struct.field()  # one-pole carrier estimate (demod)

    @classmethod
    def create(
        cls,
        mu: float = 0.1,
        type: AmpModemType | str = AmpModemType.DSB,
        suppressed: bool = False,
        m: int = 25,
        carrier_bw: float = 0.01,
        batch_shape: tuple = (),
    ) -> "AmpModem":
        if mu <= 0.0:
            raise ConfigError(f"modulation index {mu:.4e} must be greater than 0")
        if isinstance(type, str):
            type = AmpModemType(type.lower())
        if m < 1:
            raise ConfigError(f"Hilbert semi-length {m} must be at least 1")
        if not 0.0 < carrier_bw < 0.5:
            raise ConfigError(f"carrier bandwidth {carrier_bw:.4e} must be in (0, 0.5)")
        ssb = type is not AmpModemType.DSB
        hilb = (
            FirFilter.create(_hilbert_taps(m), batch_shape=batch_shape, dtype=jnp.float32)
            if ssb
            else None
        )
        delay = (
            jnp.zeros(batch_shape + (2 * m,), dtype=jnp.float32) if ssb else None
        )
        return cls(
            mu=float(mu),
            type=type,
            suppressed=bool(suppressed),
            m=int(m),
            alpha=float(carrier_bw),
            hilb=hilb,
            delay_line=delay,
            carrier=jnp.ones(batch_shape, dtype=jnp.complex64),
        )

    @property
    def delay(self) -> int:
        """Message→demod group delay in samples (0 for DSB)."""
        return 0 if self.type is AmpModemType.DSB else 2 * self.m

    def reset(self) -> "AmpModem":
        return self.replace(
            hilb=self.hilb.reset() if self.hilb is not None else None,
            delay_line=(
                jnp.zeros_like(self.delay_line) if self.delay_line is not None else None
            ),
            carrier=jnp.ones_like(self.carrier),
        )

    def _analytic(self, x: jnp.ndarray) -> tuple[jnp.ndarray, "AmpModem"]:
        """Streaming analytic extension: xi (delayed) + j·H{x}."""
        xq, hilb = self.hilb.execute_block(x)
        full = jnp.concatenate([self.delay_line, x], axis=-1)
        xi = full[..., : x.shape[-1]]
        tail = full[..., x.shape[-1] :]
        s = xi + 1j * xq
        return s.astype(jnp.complex64), self.replace(hilb=hilb, delay_line=tail)

    def modulate(self, x) -> tuple[jnp.ndarray, "AmpModem"]:
        """Modulate a real message block x [..., N] → complex baseband."""
        x = jnp.asarray(x, dtype=jnp.float32)
        new = self
        if self.type is AmpModemType.DSB:
            s = x.astype(jnp.complex64)
        else:
            s, new = self._analytic(x)
            if self.type is AmpModemType.LSB:
                s = jnp.conj(s)
        s = jnp.float32(self.mu) * s
        if not self.suppressed:
            s = (1.0 + s) * jnp.float32(1.0 / (1.0 + self.mu))
        return s.astype(jnp.complex64), new

    modulate_block = modulate

    def demodulate(self, y) -> tuple[jnp.ndarray, "AmpModem"]:
        """Demodulate complex baseband y [..., N] → real message."""
        y = jnp.asarray(y, dtype=jnp.complex64)
        new = self
        if self.suppressed:
            m = y.real * jnp.float32(1.0 / self.mu)
        else:
            # track the DC carrier with a one-pole smoother
            # c[k] = (1-α)·c[k-1] + α·y[k], parallelized as an associative
            # scan over (gain, offset) pairs — log-depth, overflow-safe
            import jax

            a = jnp.complex64(1.0 - self.alpha)
            gains = jnp.broadcast_to(a, y.shape)
            offs = jnp.complex64(self.alpha) * y

            def combine(l, r):
                return (r[0] * l[0], r[0] * l[1] + r[1])

            g, o = jax.lax.associative_scan(combine, (gains, offs), axis=-1)
            c = g * self.carrier[..., None] + o
            new = self.replace(carrier=c[..., -1])
            phase = jnp.exp(-1j * jnp.angle(c)).astype(jnp.complex64)
            yd = y * phase * jnp.float32(1.0 + self.mu)
            if self.type is AmpModemType.DSB:
                m = (jnp.abs(yd) - 1.0) * jnp.float32(1.0 / self.mu)
            else:
                m = (yd.real - 1.0) * jnp.float32(1.0 / self.mu)
        return m.astype(jnp.float32), new

    demodulate_block = demodulate
