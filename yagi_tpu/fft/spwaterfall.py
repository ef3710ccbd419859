"""Spectral waterfall: time-accumulated periodogram rows.

Fills a reference gap (liquid has spwaterfall; yagi did not port it,
LIQUID_COMPAT.md:489-498). Built on Spgram: each completed accumulation
period contributes one PSD row; when the row buffer fills, rows are decimated
2:1 by averaging (liquid's consolidation), so total memory stays fixed while
time coverage grows.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from ..math.windows import WindowType
from .spgram import Spgram

__all__ = ["Spwaterfall"]


@struct.pytree
class Spwaterfall:
    """Waterfall accumulator state."""

    time_rows: int = struct.static_field()
    transforms_per_row: int = struct.static_field()
    spgram: Spgram = struct.field()
    psd_rows: jnp.ndarray = struct.field()  # [time_rows, nfft]
    num_rows: jnp.ndarray = struct.field()  # int32 rows filled
    row_scale: jnp.ndarray = struct.field()  # int32 time decimation factor

    @classmethod
    def create(
        cls,
        nfft: int,
        time_rows: int = 64,
        wtype: WindowType = WindowType.KAISER,
        window_len: int | None = None,
        delay: int | None = None,
        transforms_per_row: int = 4,
        dtype=jnp.complex64,
    ) -> "Spwaterfall":
        if time_rows < 2:
            raise ConfigError("time size must be at least 2")
        sp = Spgram.create(nfft, wtype, window_len, delay, dtype=dtype)
        return cls(
            time_rows=time_rows,
            transforms_per_row=transforms_per_row,
            spgram=sp,
            psd_rows=jnp.zeros((time_rows, nfft), dtype=jnp.float32),
            num_rows=jnp.asarray(0, dtype=jnp.int32),
            row_scale=jnp.asarray(1, dtype=jnp.int32),
        )

    @property
    def nfft(self) -> int:
        return self.spgram.nfft

    def reset(self) -> "Spwaterfall":
        return self.replace(
            spgram=self.spgram.reset(),
            psd_rows=jnp.zeros_like(self.psd_rows),
            num_rows=jnp.zeros_like(self.num_rows),
            row_scale=jnp.ones_like(self.row_scale),
        )

    def write(self, x) -> "Spwaterfall":
        """Push samples; emit a PSD row per accumulation period.

        Host-orchestrated row management (concrete state), device-side math.
        """
        x = jnp.asarray(x)
        sp = self.spgram
        rows = self.psd_rows
        num_rows = int(np.asarray(self.num_rows))
        row_scale = int(np.asarray(self.row_scale))
        per_row = self.transforms_per_row * row_scale

        # process in chunks that complete accumulation periods
        delay = sp.delay
        pos = 0
        n = x.shape[-1]
        while pos < n:
            needed_tr = per_row - int(np.asarray(sp.num_transforms))
            needed_samples = needed_tr * delay - (
                delay - int(np.asarray(sp.sample_timer))
            )
            take = min(n - pos, max(needed_samples, 1))
            sp = sp.write(x[..., pos : pos + take])
            pos += take
            if int(np.asarray(sp.num_transforms)) >= per_row:
                row = sp.get_psd_mag()
                if num_rows == self.time_rows:
                    # decimate rows 2:1 by averaging (liquid consolidation)
                    half = self.time_rows // 2
                    folded = 0.5 * (
                        rows[0 : 2 * half : 2] + rows[1 : 2 * half : 2]
                    )
                    rows = jnp.zeros_like(rows).at[:half].set(folded)
                    num_rows = half
                    row_scale *= 2
                    per_row = self.transforms_per_row * row_scale
                    # keep accumulating into the current spgram period
                    continue
                rows = rows.at[num_rows].set(row)
                num_rows += 1
                sp = sp.clear()
        return self.replace(
            spgram=sp,
            psd_rows=rows,
            num_rows=jnp.asarray(num_rows, dtype=jnp.int32),
            row_scale=jnp.asarray(row_scale, dtype=jnp.int32),
        )

    def get_psd(self) -> jnp.ndarray:
        """Waterfall in dB, [rows_filled, nfft] (rows oldest-first)."""
        k = int(np.asarray(self.num_rows))
        return 10.0 * jnp.log10(jnp.maximum(self.psd_rows[:k], 1e-12))

    def export_gnuplot(self, base: str) -> None:
        """Write gnuplot script ``base.gnu`` + binary matrix ``base.bin``
        (liquid ``spwaterfall_export``; spwaterfall_gnuplot autotest)."""
        psd = np.asarray(self.get_psd(), dtype=np.float32)
        rows, nfft = psd.shape
        with open(base + ".bin", "wb") as fh:
            # gnuplot binary matrix format: first row is nfft then freqs
            header = np.concatenate(
                [[np.float32(nfft)],
                 (np.arange(nfft, dtype=np.float32) / nfft - 0.5)])
            fh.write(header.astype(np.float32).tobytes())
            for r in range(rows):
                fh.write(np.concatenate(
                    [[np.float32(r)], psd[r]]).astype(np.float32).tobytes())
        with open(base + ".gnu", "w") as fh:
            fh.write("# %s.gnu: auto-generated by yagi_tpu Spwaterfall\n"
                     % base)
            fh.write("reset\n")
            fh.write("set terminal png size 800,600\n")
            fh.write("set xrange [-0.5:0.5]\n")
            fh.write("set yrange [0:%d]\n" % max(rows - 1, 1))
            fh.write("set xlabel 'Normalized Frequency [f/Fs]'\n")
            fh.write("set ylabel 'Time [rows]'\n")
            fh.write("plot '%s.bin' binary matrix with image notitle\n"
                     % base)
