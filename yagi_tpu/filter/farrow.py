"""Farrow fractional-delay filter + streaming autocorrelator + DDS.

These fill reference stubs (src/filter/firfarrow.rs, autocorr.rs, dds.rs are
all 0-byte files); behavior follows liquid-dsp:

* FirFarrow — fractional delay via per-tap polynomials in μ: taps are fit
  offline over a grid of Kaiser windowed-sinc designs h(μ), so
  h_i(μ) = Σ_k c[i,k]·μ^k evaluates any delay in [-0.5, 0.5] without
  redesign (liquid firfarrow_crcf).
* AutoCorr — windowed autocorrelation rxx[n] = Σ_w x[n-w]·conj(x[n-w-d]):
  a one-lag product stream through a moving-sum window (liquid autocorr).
* Dds — direct digital synthesizer up/down converter: mix by ±fc then a
  2^k halfband cascade (liquid dds_cccf).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .. import design
from ..math.poly import poly_fit
from ._conv import causal_conv_valid
from .msresamp2 import MsResamp2
from ..nco.osc import Osc

__all__ = ["FirFarrow", "AutoCorr", "Dds"]


@struct.pytree
class FirFarrow:
    """Farrow-structure fractional delay (fills firfarrow.rs stub)."""

    h_len: int = struct.static_field()
    order: int = struct.static_field()
    coeffs: jnp.ndarray = struct.field()  # [h_len, order+1] per-tap μ-polynomials
    mu: jnp.ndarray = struct.field()
    window: jnp.ndarray = struct.field()  # [..., h_len] conv history

    @classmethod
    def create(
        cls,
        h_len: int = 17,
        order: int = 3,
        fc: float = 0.45,
        as_: float = 60.0,
        batch_shape: tuple = (),
        dtype=jnp.complex64,
    ) -> "FirFarrow":
        if h_len == 0:
            raise ConfigError("filter length must be greater than zero")
        if order == 0:
            raise ConfigError("polynomial order must be greater than zero")
        # fit per-tap polynomials over a μ grid of exact kaiser designs
        mus = np.linspace(-0.499, 0.499, 4 * (order + 1))
        # scale by 2·fc for unit passband gain (kaiser prototype has 1/(2fc))
        H = np.stack(
            [
                design.fir_design_kaiser(h_len, fc, as_, float(mu)) * (2.0 * fc)
                for mu in mus
            ]
        )  # [n_mu, h_len]
        coeffs = np.stack(
            [poly_fit(mus, H[:, i], order + 1) for i in range(h_len)]
        )  # [h_len, order+1]
        return cls(
            h_len=h_len,
            order=order,
            coeffs=jnp.asarray(coeffs.astype(np.float32)),
            mu=jnp.asarray(0.0, dtype=jnp.float32),
            window=jnp.zeros(batch_shape + (h_len,), dtype=jnp.dtype(dtype)),
        )

    def set_delay(self, mu) -> "FirFarrow":
        """Fractional DELAY μ ∈ [-0.5, 0.5] around the center (n-1)/2.

        The kaiser design's offset parameter advances the impulse, so the
        stored polynomial variable is -μ.
        """
        if isinstance(mu, (int, float)) and not -0.5 <= mu <= 0.5:
            raise ConfigError("delay must be in [-0.5, 0.5]")
        return self.replace(mu=-jnp.asarray(mu, dtype=jnp.float32))

    def get_delay(self):
        return -self.mu

    def taps(self) -> jnp.ndarray:
        """Current taps h(μ) via Horner evaluation."""
        h = self.coeffs[:, -1]
        for k in range(self.order - 1, -1, -1):
            h = h * self.mu + self.coeffs[:, k]
        return h

    def reset(self) -> "FirFarrow":
        return self.replace(window=jnp.zeros_like(self.window))

    def execute_block(self, x) -> tuple[jnp.ndarray, "FirFarrow"]:
        x = jnp.asarray(x)
        h = self.taps()
        xa = jnp.concatenate([self.window[..., 1:].astype(x.dtype), x], axis=-1)
        y = causal_conv_valid(xa, h)
        return y, self.replace(window=xa[..., xa.shape[-1] - self.h_len :])

    __call__ = execute_block

    def groupdelay(self, fc: float) -> float:
        return design.fir_group_delay(np.asarray(self.taps()), fc)


@struct.pytree
class AutoCorr:
    """Streaming windowed autocorrelator (fills autocorr.rs stub).

    rxx[n] = Σ_{w=0..W-1} x[n-w] · conj(x[n-w-delay])
    """

    window_size: int = struct.static_field()
    delay: int = struct.static_field()
    hist: jnp.ndarray = struct.field()  # [..., W+delay-1] raw history

    @classmethod
    def create(cls, window_size: int, delay: int, batch_shape: tuple = (), dtype=jnp.complex64):
        if window_size == 0:
            raise ConfigError("window size must be greater than zero")
        return cls(
            window_size=window_size,
            delay=delay,
            hist=jnp.zeros(
                batch_shape + (window_size + delay - 1,), dtype=jnp.dtype(dtype)
            ),
        )

    def reset(self) -> "AutoCorr":
        return self.replace(hist=jnp.zeros_like(self.hist))

    def execute_block(self, x) -> tuple[jnp.ndarray, "AutoCorr"]:
        x = jnp.asarray(x)
        W, d = self.window_size, self.delay
        xa = jnp.concatenate([self.hist.astype(x.dtype), x], axis=-1)
        lagged = xa[..., : xa.shape[-1] - d] if d > 0 else xa
        cur = xa[..., d:]
        prod = cur * jnp.conj(lagged)  # p[n] aligned so last entry is newest
        ones = jnp.ones(W, dtype=jnp.float32)
        rxx_full = causal_conv_valid(prod, ones)
        n = x.shape[-1]
        rxx = rxx_full[..., rxx_full.shape[-1] - n :]
        return rxx, self.replace(hist=xa[..., xa.shape[-1] - (W + d - 1) :])

    __call__ = execute_block


@struct.pytree
class Dds:
    """Direct digital synthesizer up/down converter (fills dds.rs stub).

    decim: mix down by fc → 2^k halfband decimation cascade.
    interp: 2^k halfband interpolation cascade → mix up by fc.
    """

    num_stages: int = struct.static_field()
    fc: float = struct.static_field()
    osc_down: Osc = struct.field()
    osc_up: Osc = struct.field()
    decim_cascade: MsResamp2 = struct.field()
    interp_cascade: MsResamp2 = struct.field()

    @classmethod
    def create(
        cls,
        num_stages: int,
        fc: float,
        bw: float = 0.4,
        as_: float = 60.0,
        batch_shape: tuple = (),
    ) -> "Dds":
        if num_stages > 16:
            raise ConfigError("number of stages should not exceed 16")
        if not -0.5 <= fc <= 0.5:
            raise ConfigError("center frequency must be in [-0.5, 0.5]")
        osc_down = Osc.create("exact", batch_shape=batch_shape).set_frequency(
            2.0 * np.pi * fc
        )
        osc_up = Osc.create("exact", batch_shape=batch_shape).set_frequency(
            2.0 * np.pi * fc
        )
        return cls(
            num_stages=num_stages,
            fc=float(fc),
            osc_down=osc_down,
            osc_up=osc_up,
            decim_cascade=MsResamp2.create(
                False, num_stages, bw, 0.0, as_, batch_shape=batch_shape
            ),
            interp_cascade=MsResamp2.create(
                True, num_stages, bw, 0.0, as_, batch_shape=batch_shape
            ),
        )

    def reset(self) -> "Dds":
        return self.replace(
            osc_down=self.osc_down.reset().set_frequency(2.0 * np.pi * self.fc),
            osc_up=self.osc_up.reset().set_frequency(2.0 * np.pi * self.fc),
            decim_cascade=self.decim_cascade.reset(),
            interp_cascade=self.interp_cascade.reset(),
        )

    def decim_execute(self, x) -> tuple[jnp.ndarray, "Dds"]:
        """High-rate x [..., N·2^k] → baseband [..., N]."""
        x = jnp.asarray(x)
        mixed, osc = self.osc_down.mix_block_down(x)
        y, cas = self.decim_cascade.execute_block(mixed)
        return y, self.replace(osc_down=osc, decim_cascade=cas)

    def interp_execute(self, x) -> tuple[jnp.ndarray, "Dds"]:
        """Baseband x [..., N] → high-rate [..., N·2^k] at +fc."""
        x = jnp.asarray(x)
        y, cas = self.interp_cascade.execute_block(x)
        mixed, osc = self.osc_up.mix_block_up(y)
        return mixed, self.replace(osc_up=osc, interp_cascade=cas)
