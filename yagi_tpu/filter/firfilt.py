"""Streaming finite impulse response filter.

Behavioral spec: /root/reference/src/filter/fir/firfilt.rs. The reference
processes one sample at a time (push → VecDeque rotate → dotprod,
firfilt.rs:220-245); here a whole block is filtered with one batched XLA
convolution over ``concat(history, x)``, with the L-1 sample history carried
in the state pytree — outputs are bit-for-block identical to per-sample
streaming with zero-initialized state.

Type convention: ``h`` may be real (rrrf/crcf) or complex (cccf); the signal
dtype is set at creation and the output dtype follows liquid's promotion.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .. import design
from ._conv import causal_conv_valid, np_taps, result_dtype

__all__ = ["FirFilter"]


@struct.pytree
class FirFilter:
    """FIR filter state (reference struct firfilt.rs:10-15)."""

    h: jnp.ndarray = struct.field()  # [L] taps; h[0] multiplies newest sample
    scale: jnp.ndarray = struct.field()  # output scaling (firfilt.rs:285)
    window: jnp.ndarray = struct.field()  # [..., L] last L inputs, oldest..newest

    # ------------------------------------------------------------------ ctors
    @classmethod
    def create(cls, h, scale=1.0, batch_shape: tuple = (), dtype=None) -> "FirFilter":
        """From explicit coefficients (firfilt.rs:63)."""
        h = np_taps(h)
        if h.size == 0:
            raise ConfigError("filter length must be greater than zero")
        if dtype is None:
            dtype = jnp.complex64 if np.iscomplexobj(h) else jnp.float32
        x_dtype = jnp.dtype(dtype)
        return cls(
            h=jnp.asarray(h),
            scale=jnp.asarray(scale, dtype=h.dtype),
            window=jnp.zeros(batch_shape + (len(h),), dtype=x_dtype),
        )

    @classmethod
    def create_kaiser(
        cls, n: int, fc: float, as_: float, mu: float = 0.0, **kw
    ) -> "FirFilter":
        """Kaiser windowed-sinc lowpass (firfilt.rs:93)."""
        return cls.create(design.fir_design_kaiser(n, fc, as_, mu), **kw)

    @classmethod
    def create_rnyquist(
        cls, ftype, k: int, m: int, beta: float, mu: float = 0.0, **kw
    ) -> "FirFilter":
        """(root-)Nyquist prototype (firfilt.rs:112)."""
        return cls.create(design.fir_design_prototype(ftype, k, m, beta, mu), **kw)

    @classmethod
    def create_firdespm(cls, h_len: int, fc: float, as_: float, **kw) -> "FirFilter":
        """Parks-McClellan lowpass, scaled by bandwidth (firfilt.rs:129-134)."""
        h = design.fir_design_pm_lowpass(h_len, fc, as_, 0.0)
        return cls.create(h * (0.5 / fc), **kw)

    @classmethod
    def create_rect(cls, n: int, **kw) -> "FirFilter":
        """Rectangular prototype (firfilt.rs:148)."""
        if n == 0 or n > 1024:
            raise ConfigError("filter length must be in [1,1024]")
        return cls.create(np.ones(n, dtype=np.float32), **kw)

    @classmethod
    def create_dc_blocker(cls, m: int, as_: float, **kw) -> "FirFilter":
        """DC-blocking filter (firfilt.rs:166)."""
        return cls.create(design.fir_design_notch(m, 0.0, as_), **kw)

    @classmethod
    def create_notch(cls, m: int, as_: float, f0: float, dtype=None, **kw) -> "FirFilter":
        """Notch filter; complex dtype mixes a DC blocker to f0 (firfilt.rs:25-43)."""
        if dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
            h = design.fir_design_notch(m, 0.0, as_)
            i = np.arange(len(h))
            phi = 2.0 * np.pi * f0 * (i - float(m))
            h = h * np.exp(1j * phi)
            return cls.create(h, dtype=dtype, **kw)
        h = design.fir_design_notch(m, f0, as_)
        return cls.create(h, dtype=dtype, **kw)

    # ------------------------------------------------------------- properties
    @property
    def h_len(self) -> int:
        return self.h.shape[0]

    def __len__(self) -> int:
        return self.h_len

    # ------------------------------------------------------------- streaming
    def reset(self) -> "FirFilter":
        """Clear sample history (firfilt.rs:209)."""
        return self.replace(window=jnp.zeros_like(self.window))

    def push(self, x) -> "FirFilter":
        """Push one sample into the history (firfilt.rs:220)."""
        x = jnp.asarray(x, dtype=self.window.dtype)
        window = jnp.concatenate(
            [self.window[..., 1:], x[..., None]], axis=-1
        )
        return self.replace(window=window)

    def write(self, x) -> "FirFilter":
        """Push a block without producing output (firfilt.rs:230)."""
        x = jnp.asarray(x, dtype=self.window.dtype)
        xa = jnp.concatenate([self.window, x], axis=-1)
        return self.replace(window=xa[..., xa.shape[-1] - self.h_len :])

    def execute(self) -> jnp.ndarray:
        """Output for the current window (firfilt.rs:241): Σ h[k]·w[newest-k]."""
        y = jnp.sum(self.h[::-1] * self.window.astype(result_dtype(self.window.dtype, self.h.dtype)), axis=-1)
        return y * self.scale

    def execute_one(self, x):
        """push + execute (firfilt.rs:256)."""
        q = self.push(x)
        return q.execute(), q

    def execute_block(self, x) -> tuple[jnp.ndarray, "FirFilter"]:
        """Filter a block; returns (y, updated filter) (firfilt.rs:267).

        y[..., n] = scale · Σ_k h[k] · x[..., n-k], history crossing block
        boundaries via the carried window.
        """
        x = jnp.asarray(x)
        xa = jnp.concatenate(
            [self.window[..., 1:].astype(x.dtype), x], axis=-1
        )
        y = causal_conv_valid(xa, self.h) * self.scale
        new_window = xa[..., xa.shape[-1] - self.h_len :]
        return y, self.replace(window=new_window)

    __call__ = execute_block

    # ------------------------------------------------------------- analysis
    def set_scale(self, scale) -> "FirFilter":
        return self.replace(scale=jnp.asarray(scale, dtype=self.h.dtype))

    def get_scale(self):
        return self.scale

    def freqresponse(self, fc: float) -> complex:
        """Frequency response at fc, including scale (firfilt.rs:325)."""
        return design.freqresponse(np.asarray(self.h), fc) * complex(
            np.asarray(self.scale)
        )

    def groupdelay(self, fc: float) -> float:
        """Group delay at fc (firfilt.rs:339)."""
        return design.fir_group_delay(np.asarray(self.h).real, fc)
