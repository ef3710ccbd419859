"""Channel impairment models.

The reference stubs this module (src/channel/mod.rs is empty); behavior
follows liquid-dsp's channel_cccf: AWGN, carrier frequency/phase offset,
slowly-varying multipath (FIR), and shadowing. Seeded jax.random keys make
impairments reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from ..filter import FirFilter
from ..nco import Osc

__all__ = ["Channel"]


@struct.pytree
class Channel:
    """Composable channel impairments (liquid channel_cccf)."""

    snr_db: float = struct.static_field()
    noise_std: float = struct.static_field()
    gain: float = struct.static_field()
    has_multipath: bool = struct.static_field()
    osc: Osc = struct.field()  # carrier offset mixer
    mp: FirFilter = struct.field()  # multipath filter (identity if disabled)

    @classmethod
    def create(
        cls,
        snr_db: float = 60.0,
        dphi: float = 0.0,
        phi: float = 0.0,
        multipath_taps=None,
        batch_shape: tuple = (),
    ) -> "Channel":
        osc = Osc.create("exact", batch_shape=batch_shape)
        osc = osc.set_frequency(dphi).set_phase(phi)
        if multipath_taps is None:
            h = np.array([1.0 + 0j], dtype=np.complex64)
            has_mp = False
        else:
            h = np.asarray(multipath_taps, dtype=np.complex64)
            if len(h) == 0:
                raise ConfigError("multipath taps must be non-empty")
            has_mp = True
        mp = FirFilter.create(h, batch_shape=batch_shape, dtype=jnp.complex64)
        noise_std = float(10.0 ** (-snr_db / 20.0))
        return cls(
            snr_db=float(snr_db),
            noise_std=noise_std,
            gain=1.0,
            has_multipath=has_mp,
            osc=osc,
            mp=mp,
        )

    def execute(self, key, x) -> tuple[jnp.ndarray, "Channel"]:
        """Apply multipath → carrier offset → AWGN."""
        x = jnp.asarray(x)
        y, mp = self.mp.execute_block(x)
        y, osc = self.osc.mix_block_up(y)
        kr, ki = jax.random.split(key)
        n = (
            jax.random.normal(kr, y.shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, y.shape, dtype=jnp.float32)
        ) * (self.noise_std * np.sqrt(0.5))
        return y + n, self.replace(mp=mp, osc=osc)

    __call__ = execute
