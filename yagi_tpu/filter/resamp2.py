"""Halfband 2× interpolator/decimator + analysis/synthesis QMF pair.

Behavioral spec: /root/reference/src/filter/resampler/resamp2.rs. The PM
halfband prototype (4m+1 taps, even outer taps zero) is split into a pure
delay branch (center tap) and an odd-tap filter branch h1
(resamp2.rs:44-84); each mode routes even/odd samples through the two
branches (decim resamp2.rs:153, interp :165, analyzer :126, synthesizer
:139, filter :104). Block forms below vectorize every mode with stride-2
splits + one convolution; state = the two 2m-sample branch windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .. import design
from ._conv import causal_conv_valid

__all__ = ["Resamp2"]


@struct.pytree
class Resamp2:
    """Halfband resampler state (resamp2.rs:25-36)."""

    m: int = struct.static_field()
    h1: jnp.ndarray = struct.field()  # [2m] branch taps, conv order
    scale: jnp.ndarray = struct.field()
    w0: jnp.ndarray = struct.field()  # [..., 2m] delay-branch window
    w1: jnp.ndarray = struct.field()  # [..., 2m] filter-branch window
    toggle: jnp.ndarray = struct.field()  # bool (filter_execute phase)

    @classmethod
    def create(cls, m: int, f0: float = 0.0, as_: float = 60.0, batch_shape: tuple = (), dtype=jnp.complex64):
        """PM halfband design, optionally mixed to f0 (resamp2.rs:44-84)."""
        if m < 2:
            raise ConfigError("filter semi-length must be at least 2")
        if f0 < -0.5 or f0 > 0.5:
            raise ConfigError(f"f0 ({f0}) must be in [-0.5,0.5]")
        if as_ < 0.0:
            raise ConfigError(f"as ({as_}) must be greater than zero")
        h_len = 4 * m + 1
        hf = design.fir_design_pm_halfband_stopband_attenuation(m, as_)
        t = np.arange(h_len) - (h_len - 1) / 2.0
        if f0 == 0.0:
            h = 2.0 * hf * np.cos(2.0 * np.pi * t * f0)
            coeff_dtype = np.float32
        else:
            h = 2.0 * hf * np.exp(2j * np.pi * t * f0)
            coeff_dtype = np.complex64
        # h1[i] = h[h_len-2i-2] (resamp2.rs:64-68), dotprod oldest-first;
        # conv order: h1_conv[j] = h1[2m-1-j] = h[2j+1]
        h1_conv = np.asarray([h[2 * j + 1] for j in range(2 * m)], dtype=coeff_dtype)
        return cls(
            m=m,
            h1=jnp.asarray(h1_conv),
            scale=jnp.asarray(1.0, dtype=coeff_dtype),
            w0=jnp.zeros(batch_shape + (2 * m,), dtype=jnp.dtype(dtype)),
            w1=jnp.zeros(batch_shape + (2 * m,), dtype=jnp.dtype(dtype)),
            toggle=jnp.asarray(False),
        )

    def reset(self) -> "Resamp2":
        return self.replace(
            w0=jnp.zeros_like(self.w0),
            w1=jnp.zeros_like(self.w1),
            toggle=jnp.asarray(False),
        )

    def set_scale(self, scale) -> "Resamp2":
        return self.replace(scale=jnp.asarray(scale, dtype=self.scale.dtype))

    def get_scale(self):
        return self.scale

    def get_delay(self) -> int:
        """2m-1 samples at the high rate (resamp2.rs:100)."""
        return 2 * self.m - 1

    # ------------------------------------------------------------- internals
    def _filter_branch(self, w1, xs):
        """conv of the h1 branch over stream xs with window history w1.

        The window holds 2m samples but the conv needs only the last 2m-1
        as left context (output t uses the window *after* pushing xs[t]).
        """
        xa = jnp.concatenate([w1.astype(xs.dtype) if w1.dtype != xs.dtype else w1, xs], axis=-1)
        y = causal_conv_valid(xa[..., 1:], self.h1)
        return y, xa[..., xa.shape[-1] - 2 * self.m :]

    def _delay_branch(self, w0, xs):
        """delay-by-m branch: y[n] = stream[n-m]; window keeps last 2m."""
        xa = jnp.concatenate([w0.astype(xs.dtype) if w0.dtype != xs.dtype else w0, xs], axis=-1)
        n = xs.shape[-1]
        # after pushing xs[n], index(m-1) = sample m newest-back:
        # y[n] = xa[2m + n - 1 - m] = xa[m + n - 1 + ... ]; with xa len 2m+N:
        y = xa[..., self.m : self.m + n]
        return y, xa[..., xa.shape[-1] - 2 * self.m :]

    # ----------------------------------------------------------------- modes
    def decim_execute_block(self, x) -> tuple[jnp.ndarray, "Resamp2"]:
        """2N inputs → N outputs (resamp2.rs:153): even→h1, odd→delay."""
        x = jnp.asarray(x)
        if x.shape[-1] % 2:
            raise ConfigError("decimator input length must be even")
        xe = x[..., 0::2]
        xo = x[..., 1::2]
        y1, w1 = self._filter_branch(self.w1, xe)
        y0, w0 = self._delay_branch(self.w0, xo)
        y = (y0 + y1) * self.scale
        return y, self.replace(w0=w0, w1=w1)

    def interp_execute_block(self, x) -> tuple[jnp.ndarray, "Resamp2"]:
        """N inputs → 2N outputs (resamp2.rs:165): y[2n]=delay, y[2n+1]=h1."""
        x = jnp.asarray(x)
        y0, w0 = self._delay_branch(self.w0, x)
        y1, w1 = self._filter_branch(self.w1, x)
        y = jnp.stack([y0, y1], axis=-1).reshape(x.shape[:-1] + (2 * x.shape[-1],))
        y = y * self.scale
        return y, self.replace(w0=w0, w1=w1)

    # -------------------------------------------------- valid-prefix variants
    # Fixed-capacity buffers whose first n_valid samples are real, the jit-
    # friendly convention for variable-rate pipelines (SURVEY.md §7 "hard
    # parts" #2): outputs are computed over the whole buffer (invalid tail is
    # zeros, and the ops are causal, so valid outputs are exact), masked
    # beyond the valid count, and the branch windows are extracted at the
    # traced valid end with dynamic slices.

    def _windows_at(self, xs0, xs1, n0, n1):
        xa0 = jnp.concatenate([self.w0.astype(xs0.dtype), xs0], axis=-1)
        xa1 = jnp.concatenate([self.w1.astype(xs1.dtype), xs1], axis=-1)
        w0 = jax.lax.dynamic_slice_in_dim(xa0, n0, 2 * self.m, axis=-1)
        w1 = jax.lax.dynamic_slice_in_dim(xa1, n1, 2 * self.m, axis=-1)
        return w0, w1

    def interp_execute_block_n(
        self, x, n_valid
    ) -> tuple[jnp.ndarray, jnp.ndarray, "Resamp2"]:
        """Valid-prefix interp: x [..., cap] with n_valid real samples →
        (y [..., 2·cap] zero beyond 2·n_valid, 2·n_valid, state)."""
        x = jnp.asarray(x)
        n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
        cap = x.shape[-1]
        mask = jnp.arange(cap) < n_valid
        x = jnp.where(mask, x, 0)
        y0, _ = self._delay_branch(self.w0, x)
        y1, _ = self._filter_branch(self.w1, x)
        y = jnp.stack([y0, y1], axis=-1).reshape(x.shape[:-1] + (2 * cap,))
        y = y * self.scale
        y = jnp.where(jnp.arange(2 * cap) < 2 * n_valid, y, 0)
        w0, w1 = self._windows_at(x, x, n_valid, n_valid)
        return y, 2 * n_valid, self.replace(w0=w0, w1=w1)

    def decim_execute_block_n(
        self, x, n_valid
    ) -> tuple[jnp.ndarray, jnp.ndarray, "Resamp2"]:
        """Valid-prefix decim: x [..., cap] with n_valid real samples
        (n_valid even) → (y [..., cap/2] zero beyond n_valid/2, n_valid/2,
        state)."""
        x = jnp.asarray(x)
        n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
        cap = x.shape[-1]
        if cap % 2:
            raise ConfigError("decimator buffer capacity must be even")
        x = jnp.where(jnp.arange(cap) < n_valid, x, 0)
        xe = x[..., 0::2]
        xo = x[..., 1::2]
        nh = n_valid // 2
        y1, _ = self._filter_branch(self.w1, xe)
        y0, _ = self._delay_branch(self.w0, xo)
        y = (y0 + y1) * self.scale
        y = jnp.where(jnp.arange(cap // 2) < nh, y, 0)
        w0, w1 = self._windows_at(xo, xe, nh, nh)
        return y, nh, self.replace(w0=w0, w1=w1)

    def analyzer_execute_block(self, x) -> tuple[jnp.ndarray, jnp.ndarray, "Resamp2"]:
        """2N inputs → (low[N], high[N]) (resamp2.rs:126-137)."""
        x = jnp.asarray(x)
        if x.shape[-1] % 2:
            raise ConfigError("analyzer input length must be even")
        xe = 0.5 * x[..., 0::2]
        xo = 0.5 * x[..., 1::2]
        y1, w1 = self._filter_branch(self.w1, xe)
        y0, w0 = self._delay_branch(self.w0, xo)
        lo = (y1 + y0) * self.scale
        hi = (y1 - y0) * self.scale
        return lo, hi, self.replace(w0=w0, w1=w1)

    def synthesizer_execute_block(self, x0, x1) -> tuple[jnp.ndarray, "Resamp2"]:
        """(low[N], high[N]) → 2N outputs (resamp2.rs:139-151)."""
        x0 = jnp.asarray(x0)
        x1 = jnp.asarray(x1)
        s = x0 + x1
        d = x0 - x1
        y0, w0 = self._delay_branch(self.w0, s)
        y1, w1 = self._filter_branch(self.w1, d)
        y = jnp.stack([y0 * self.scale, y1 * self.scale], axis=-1).reshape(
            x0.shape[:-1] + (2 * x0.shape[-1],)
        )
        return y, self.replace(w0=w0, w1=w1)

    def filter_execute_block(self, x) -> tuple[jnp.ndarray, jnp.ndarray, "Resamp2"]:
        """Per-sample lowpass/highpass pair (resamp2.rs:104-124).

        Sample n goes to window (n+toggle)%2; output yi = that window's
        delayed sample, yq = h1 over the OTHER window. Requires an even block
        length so the carried toggle stays static.
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        if n % 2:
            raise ConfigError("filter_execute block length must be even (toggle phase)")
        xe = x[..., 0::2]  # toggle=false samples → w0
        xo = x[..., 1::2]  # toggle=true samples → w1

        # w0 receives xe; w1 receives xo.
        # even step (push xe[i]): yi = w0-delayed, yq = h1 over w1 (not yet
        # containing xo[i]) → filter stream = xo delayed by one push.
        # odd step (push xo[i]): yi = w1-delayed, yq = h1 over w0 (already
        # containing xe[i]).
        y0_even, w0 = self._delay_branch(self.w0, xe)
        y0_odd, w1 = self._delay_branch(self.w1, xo)

        # h1 over w1 *before* xo[i] is pushed: prepend state, drop last
        xo_shift = jnp.concatenate([self.w1[..., -1:], xo[..., :-1]], axis=-1)
        xa1 = jnp.concatenate([self.w1[..., :-1], xo_shift], axis=-1)
        yq_even = causal_conv_valid(xa1, self.h1)
        # h1 over w0 *after* xe[i] is pushed
        xa0 = jnp.concatenate([self.w0, xe], axis=-1)
        yq_odd = causal_conv_valid(xa0[..., 1:], self.h1)

        yi = jnp.stack([y0_even, y0_odd], axis=-1).reshape(x.shape)
        yq = jnp.stack([yq_even, yq_odd], axis=-1).reshape(x.shape)
        half = jnp.asarray(0.5, dtype=self.scale.dtype)
        y_lo = half * (yi + yq) * self.scale
        y_hi = half * (yi - yq) * self.scale
        return y_lo, y_hi, self.replace(w0=w0, w1=w1)
