"""M-ary FSK modulator / demodulator.

Behavioral spec: /root/reference/src/modem/{fskmod.rs,fskdem.rs}.
Fskmod: per symbol s, tone frequency dφ = (s - (M-1)/2)·2π·bw/((M-1)/2) on a
u32-phase oscillator (fskmod.rs:48-79). Block modulation of many symbols
vectorizes the phase ramp: within a symbol the phase advances by dφ per
sample; across symbols the phase accumulates k·dφ — one cumsum in u32.
Fskdem: per-symbol K-point FFT, peak-pick over demod_map bins
(fskdem.rs:101-126); all symbols in a block demodulate with one batched FFT.

Note: the reference's ``get_frequency_error`` indexes buf_freq by the raw
symbol (fskdem.rs:128-136), an apparent porting slip — we index by the
symbol's mapped FFT bin (liquid's behavior).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError, ValueRangeError

__all__ = ["Fskmod", "Fskdem"]


@struct.pytree
class Fskmod:
    """FSK modulator state (fskmod.rs:7-13)."""

    m: int = struct.static_field()  # bits/symbol
    k: int = struct.static_field()  # samples/symbol
    bandwidth: float = struct.static_field()
    theta: jnp.ndarray = struct.field()  # uint32 oscillator phase

    @classmethod
    def create(cls, m: int, k: int, bandwidth: float, batch_shape: tuple = ()) -> "Fskmod":
        if m == 0:
            raise ConfigError("bits/symbol must be greater than 0")
        if k < 2 or k > 2048:
            raise ConfigError("samples/symbol must be in [2, 2048]")
        if not (0.0 < bandwidth < 0.5):
            raise ConfigError("bandwidth must be in (0,0.5)")
        return cls(
            m=m,
            k=k,
            bandwidth=float(bandwidth),
            theta=jnp.zeros(batch_shape, dtype=jnp.uint32),
        )

    @property
    def m_size(self) -> int:
        return 1 << self.m

    def reset(self) -> "Fskmod":
        return self.replace(theta=jnp.zeros_like(self.theta))

    def modulate(self, symbols) -> tuple[jnp.ndarray, "Fskmod"]:
        """Modulate symbols [..., S] → samples [..., S·k] (fskmod.rs:48).

        u32 phase arithmetic identical to stepping the reference oscillator.
        """
        symbols = jnp.asarray(symbols)
        m2 = 0.5 * (self.m_size - 1)
        dphi = (symbols.astype(jnp.float32) - m2) * (
            2.0 * np.pi * self.bandwidth / m2
        )
        # u32 frequency word per symbol (osc.rs constrain semantics)
        from ..nco.osc import constrain_phase

        dtheta = constrain_phase(dphi)  # [..., S] uint32
        # phase at sample j of symbol i: theta0 + sum_{i'<i} k·dθ_i' + j·dθ_i
        k = self.k
        base = jnp.cumsum(dtheta * jnp.uint32(k), axis=-1) - dtheta * jnp.uint32(k)
        j = jnp.arange(k, dtype=jnp.uint32)
        thetas = (
            self.theta[..., None, None]
            + base[..., :, None]
            + j[None, :] * dtheta[..., :, None]
        )  # [..., S, k]
        t = thetas.astype(jnp.float32) * jnp.float32(2.0 * np.pi / 4294967296.0)
        y = jnp.exp(1j * t).astype(jnp.complex64)
        y = y.reshape(y.shape[:-2] + (y.shape[-2] * y.shape[-1],))
        new_theta = self.theta + jnp.sum(dtheta * jnp.uint32(k), axis=-1)
        return y, self.replace(theta=new_theta)

    __call__ = modulate


@struct.pytree
class Fskdem:
    """FSK demodulator state (fskdem.rs:6-15)."""

    m: int = struct.static_field()
    k: int = struct.static_field()
    k_size: int = struct.static_field()  # FFT size
    demod_map: tuple = struct.static_field()  # symbol → FFT bin
    last_spectrum: jnp.ndarray = struct.field()  # [..., k_size] |F| of last symbol
    s_demod: jnp.ndarray = struct.field()  # last demodulated symbol

    @classmethod
    def create(cls, m: int, k: int, bandwidth: float, batch_shape: tuple = ()) -> "Fskdem":
        if m == 0:
            raise ConfigError("bits/symbol must be greater than 0")
        if k < 2 or k > 2048:
            raise ConfigError("samples/symbol must be in [2, 2048]")
        if not (0.0 < bandwidth < 0.5):
            raise ConfigError("bandwidth must be in (0,0.5)")
        m_size = 1 << m
        m2 = 0.5 * (m_size - 1)

        # FFT-size search for bin alignment (fskdem.rs:33-53)
        df = bandwidth / m2
        k_min = k
        k_max = min(k * 4, 16)
        k_size = k_min
        err_min = 1e9
        for k_hat in range(k_min, k_max + 1):
            v = 0.5 * df * k_hat
            err = abs(round(v) - v)
            if k_hat == k_min or err < err_min:
                k_size = k_hat
                err_min = err
            if err < 1e-6:
                break

        # tone → bin map (fskdem.rs:56-66)
        demod_map = []
        for i in range(m_size):
            freq = (i - m2) * bandwidth / m2
            idx = freq * k_size
            index = int(round(idx + k_size)) if idx < 0.0 else int(round(idx))
            demod_map.append(index % k_size)
        for i in range(1, m_size):
            if demod_map[i] == demod_map[i - 1]:
                raise ConfigError(
                    "demod map is not unique; consider increasing bandwidth"
                )

        return cls(
            m=m,
            k=k,
            k_size=k_size,
            demod_map=tuple(demod_map),
            last_spectrum=jnp.zeros(batch_shape + (k_size,), dtype=jnp.float32),
            s_demod=jnp.zeros(batch_shape, dtype=jnp.int32),
        )

    @property
    def m_size(self) -> int:
        return 1 << self.m

    def reset(self) -> "Fskdem":
        return self.replace(
            last_spectrum=jnp.zeros_like(self.last_spectrum),
            s_demod=jnp.zeros_like(self.s_demod),
        )

    def demodulate(self, y) -> tuple[jnp.ndarray, "Fskdem"]:
        """Demodulate samples [..., S·k] → symbols [..., S] (fskdem.rs:101).

        One batched K-point FFT over all symbol frames.
        """
        y = jnp.asarray(y)
        S = y.shape[-1] // self.k
        frames = y[..., : S * self.k].reshape(y.shape[:-1] + (S, self.k))
        if self.k_size > self.k:
            pad = jnp.zeros(frames.shape[:-1] + (self.k_size - self.k,), frames.dtype)
            frames = jnp.concatenate([frames, pad], axis=-1)
        F = jnp.fft.fft(frames, axis=-1)
        mag = jnp.abs(F)  # [..., S, k_size]
        bins = jnp.asarray(self.demod_map, dtype=jnp.int32)
        v = jnp.take(mag, bins, axis=-1)  # [..., S, M]
        syms = jnp.argmax(v, axis=-1).astype(jnp.int32)
        return syms, self.replace(
            last_spectrum=mag[..., -1, :], s_demod=syms[..., -1]
        )

    __call__ = demodulate

    def get_frequency_error(self):
        """Adjacent-bin derivative at the last peak (fskdem.rs:128, fixed to
        index by the mapped bin — see module docstring)."""
        bins = jnp.asarray(self.demod_map, dtype=jnp.int32)
        b = bins[self.s_demod]
        K = self.k_size
        vm = jnp.take(self.last_spectrum, (b + K - 1) % K, axis=-1)
        v0 = jnp.take(self.last_spectrum, b, axis=-1)
        vp = jnp.take(self.last_spectrum, (b + 1) % K, axis=-1)
        return (vp - vm) / v0

    def get_symbol_energy(self, s: int, rng: int):
        """Energy around tone s within ±range bins (fskdem.rs:140ff)."""
        if s >= self.m_size:
            raise ValueRangeError(f"symbol ({s}) exceeds maximum")
        b = self.demod_map[s]
        K = self.k_size
        idx = [(b + o) % K for o in range(-rng, rng + 1)]
        return jnp.sum(self.last_spectrum[..., jnp.asarray(idx)] ** 2, axis=-1)
