"""Production fused channelizer (Pallas kernel path, planar I/O).

Same DSP as :class:`Firpfbch` analysis (liquid firpfbch algorithm) for the
M=64 config[4] workload, executed as ONE Pallas kernel streaming the input
through VMEM once (kernels/channelizer.py). State is the raw trailing input
samples; output is step-major [T, M] planar (transpose for the channel-major
view the XLA analyzer returns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from ..filter.firpfb import pfb_decompose
from ..kernels.channelizer import channelizer_tables, fused_channelizer_apply
from .firpfbch import _design_prototype

__all__ = ["FusedChannelizer"]


@struct.pytree
class FusedChannelizer:
    """Fused M=64 polyphase analysis bank state."""

    p: int = struct.static_field()  # taps per branch
    r2: int = struct.static_field()  # kernel rows per tile
    precision: str = struct.static_field()
    interpret: bool = struct.static_field()
    taps: jnp.ndarray = struct.field()  # [p, 128]
    hr: jnp.ndarray = struct.field()  # [128, 128] blockdiag IDFT (re)
    hi: jnp.ndarray = struct.field()  # [128, 128] blockdiag IDFT (im)
    hist_r: jnp.ndarray = struct.field()  # [halo·128] raw input history
    hist_i: jnp.ndarray = struct.field()

    num_channels = 64

    @classmethod
    def create_kaiser(
        cls, num_channels: int = 64, m: int = 4, as_: float = 60.0,
        scale: float = 1.0, r2: int = 128, precision: str = "highest",
    ) -> "FusedChannelizer":
        if num_channels != 64:
            raise ConfigError("FusedChannelizer is specialized to 64 channels")
        if m < 1:
            raise ConfigError("filter semi-length must be at least 1")
        h = _design_prototype(num_channels, m, as_)
        branches = pfb_decompose(np.asarray(h), num_channels)
        p = branches.shape[1]
        taps, hr, hi = channelizer_tables(branches, scale)
        halo = max((p + 1) // 2, (p - 1) // 2 + 1)
        return cls(
            p=p,
            r2=r2,
            precision=precision,
            interpret=False,
            taps=jnp.asarray(taps),
            hr=jnp.asarray(hr),
            hi=jnp.asarray(hi),
            hist_r=jnp.zeros(halo * 128, jnp.float32),
            hist_i=jnp.zeros(halo * 128, jnp.float32),
        )

    def _precision(self):
        return {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[self.precision]

    def analyzer_execute_planar(self, xr, xi):
        """Planar stream planes [N] → (yr, yi [T, 64] step-major, state)."""
        yr, yi = fused_channelizer_apply(
            xr,
            xi,
            self.taps,
            self.hr,
            self.hi,
            self.hist_r,
            self.hist_i,
            p=self.p,
            r2=self.r2,
            precision=self._precision(),
            interpret=self.interpret,
        )
        nh = self.hist_r.shape[-1]
        new = self.replace(hist_r=xr[-nh:], hist_i=xi[-nh:])
        return yr, yi, new

    def analyzer_execute(self, x):
        """Complex convenience (CPU/tests): [N] → ([M, T] channel-major,
        state) matching :class:`Firpfbch`.analyzer_execute's layout."""
        x = jnp.asarray(x)
        yr, yi, new = self.analyzer_execute_planar(
            jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
        )
        return jax.lax.complex(yr, yi).T, new
