"""Fractional delay, order-statistic filter, LPC.

Behavioral specs:
* Fdelay — /root/reference/src/filter/fdelay.rs: integer part via a length
  nmax+1 window tap select, fractional part via a PFB branch select.
* OrdFilt — /root/reference/src/filter/ordfilt.rs: k-th order statistic of a
  sliding window (median as special case); block form sorts all windows at
  once with one batched top-k-free jnp.sort over gathered frames.
* design_lpc / levinson — /root/reference/src/filter/lpc.rs: autocorrelation
  method + Levinson-Durbin recursion (host-side float64).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .firpfb import FirPfbFilter
from ._conv import causal_conv_valid

__all__ = ["Fdelay", "OrdFilt", "design_lpc", "levinson"]


@struct.pytree
class Fdelay:
    """Adjustable fractional delay (fdelay.rs:8-18)."""

    nmax: int = struct.static_field()
    m: int = struct.static_field()
    npfb: int = struct.static_field()
    delay: jnp.ndarray = struct.field()  # float32
    w: jnp.ndarray = struct.field()  # [..., nmax+1] window oldest..newest
    pfb: FirPfbFilter = struct.field()
    w_index: jnp.ndarray = struct.field()  # int32 integer-delay tap
    f_index: jnp.ndarray = struct.field()  # int32 PFB branch

    @classmethod
    def create(cls, nmax: int, m: int = 8, npfb: int = 64, batch_shape: tuple = (), dtype=jnp.complex64) -> "Fdelay":
        if nmax == 0:
            raise ConfigError("maximum delay must be greater than zero")
        if m == 0:
            raise ConfigError("filter semi-length must be greater than zero")
        if npfb == 0:
            raise ConfigError("number of filters must be greater than zero")
        pfb = FirPfbFilter.create_default(npfb, m, batch_shape=batch_shape, dtype=dtype)
        return cls(
            nmax=nmax,
            m=m,
            npfb=npfb,
            delay=jnp.asarray(0.0, dtype=jnp.float32),
            w=jnp.zeros(batch_shape + (nmax + 1,), dtype=jnp.dtype(dtype)),
            pfb=pfb,
            w_index=jnp.asarray(nmax - 1, dtype=jnp.int32),
            f_index=jnp.asarray(0, dtype=jnp.int32),
        )

    def reset(self) -> "Fdelay":
        return self.replace(
            delay=jnp.zeros_like(self.delay),
            w=jnp.zeros_like(self.w),
            pfb=self.pfb.reset(),
            w_index=jnp.asarray(self.nmax - 1, dtype=jnp.int32),
            f_index=jnp.asarray(0, dtype=jnp.int32),
        )

    def get_delay(self):
        return self.delay

    def set_delay(self, delay: float) -> "Fdelay":
        """Split into integer window tap + fractional PFB branch (fdelay.rs:72-98)."""
        d_val = None
        if isinstance(delay, (int, float)):
            d_val = float(delay)
        else:
            try:  # concrete (eager) arrays validate too; traced values skip
                d_val = float(delay)
            except Exception:
                pass
        if d_val is not None:
            if d_val < 0.0:
                raise ConfigError("delay cannot be negative")
            if d_val > self.nmax:
                raise ConfigError(
                    f"delay ({d_val}) cannot exceed maximum ({self.nmax})"
                )
        d = jnp.asarray(delay, dtype=jnp.float32)
        offset = self.nmax - d
        intpart = jnp.floor(offset).astype(jnp.int32)
        fracpart = offset - intpart.astype(jnp.float32)
        f_index = jnp.round(self.npfb * fracpart).astype(jnp.int32)
        carry = f_index // self.npfb
        return self.replace(
            delay=d,
            w_index=intpart + carry,
            f_index=f_index - carry * self.npfb,
        )

    def adjust_delay(self, delta) -> "Fdelay":
        return self.set_delay(self.delay + delta)

    def execute_block(self, x) -> tuple[jnp.ndarray, "Fdelay"]:
        """Delay a block (fdelay.rs:117-135): per sample, the window's
        w_index-th tap feeds the PFB's f_index branch."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        xa = jnp.concatenate([self.w.astype(x.dtype), x], axis=-1)
        # tapped stream: after pushing x[i], window.index(w_index) =
        # xa[i + 1 + w_index] (window len nmax+1)
        tap_idx = jnp.arange(n) + 1 + self.w_index
        tapped = xa[..., tap_idx]
        # feed through PFB branch f_index
        hb = jnp.take(self.pfb.branches, self.f_index, axis=0)
        pa = jnp.concatenate(
            [self.pfb.window[..., 1:].astype(x.dtype), tapped], axis=-1
        )
        y = causal_conv_valid(pa, hb) * self.pfb.scale
        new_w = xa[..., xa.shape[-1] - (self.nmax + 1) :]
        new_pfb = self.pfb.replace(
            window=pa[..., pa.shape[-1] - self.pfb.sub_len :]
        )
        return y, self.replace(w=new_w, pfb=new_pfb)

    __call__ = execute_block


@struct.pytree
class OrdFilt:
    """Order-statistic filter (ordfilt.rs:5-10)."""

    n: int = struct.static_field()
    k: int = struct.static_field()
    buf: jnp.ndarray = struct.field()  # [..., n-1] history

    @classmethod
    def create(cls, n: int, k: int, batch_shape: tuple = (), dtype=jnp.float32) -> "OrdFilt":
        if n == 0:
            raise ConfigError("filter length must be greater than zero")
        if k >= n:
            raise ConfigError("filter index must be in [0,n-1]")
        return cls(
            n=n, k=k, buf=jnp.zeros(batch_shape + (n - 1,), dtype=jnp.dtype(dtype))
        )

    @classmethod
    def create_medfilt(cls, m: int, **kw) -> "OrdFilt":
        """Median filter of length 2m+1 (ordfilt.rs:32)."""
        return cls.create(2 * m + 1, m, **kw)

    def reset(self) -> "OrdFilt":
        return self.replace(buf=jnp.zeros_like(self.buf))

    def execute_block(self, x) -> tuple[jnp.ndarray, "OrdFilt"]:
        """y[t] = k-th smallest of the window ending at x[t] (ordfilt.rs:48)."""
        x = jnp.asarray(x)
        nt = x.shape[-1]
        xa = jnp.concatenate([self.buf.astype(x.dtype), x], axis=-1)
        idx = jnp.arange(nt)[:, None] + jnp.arange(self.n)[None, :]
        frames = xa[..., idx]  # [..., nt, n]
        y = jnp.sort(frames, axis=-1)[..., self.k]
        return y, self.replace(buf=xa[..., xa.shape[-1] - (self.n - 1) :])

    __call__ = execute_block


def design_lpc(x, p: int):
    """Linear prediction coefficients via autocorrelation method (lpc.rs:14).

    Returns (a [p+1], g [p+1]) with a[0] = 1.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if p > n:
        raise ConfigError("prediction filter length cannot exceed input signal length")
    r = np.array([np.sum(x[lag:] * x[: n - lag]) for lag in range(p + 1)])
    return levinson(r, p)


def levinson(r, p: int):
    """Levinson-Durbin recursion (lpc.rs:48-89)."""
    if p > 256:
        raise ConfigError(f"filter order ({p}) exceeds maximum (256)")
    r = np.asarray(r, dtype=np.float64)
    a0 = np.zeros(p + 1)
    a1 = np.zeros(p + 1)
    e = np.zeros(p + 1)
    k = np.zeros(p + 1)
    k[0] = 1.0
    e[0] = r[0]
    a0[0] = a1[0] = 1.0
    for n in range(1, p + 1):
        q = np.sum(a0[:n] * r[n:0:-1])
        k[n] = -q / e[n - 1]
        e[n] = e[n - 1] * (1.0 - k[n] * k[n])
        for i in range(n):
            a1[i] = a0[i] + k[n] * a0[n - i]
        a1[n] = k[n]
        a0[: p + 1] = a1
    return a1.astype(np.float32), e.astype(np.float32)
