"""asgram: ASCII spectral periodogram (terminal waterfall line).

The reference never ported liquid's ``asgram`` (SURVEY.md §2.2 "NOT
ported": LIQUID_COMPAT.md:361-364 ❓); behavioral spec is liquid-dsp's
asgram_crcf: push samples into a periodogram, then render the current PSD
as one line of ASCII characters — each character bins the spectrum into a
display level against a configurable reference level and scale — plus the
peak frequency and level.

Built on the batched Spgram (fft/spgram.py); rendering is a pure
quantization of the PSD vector.
"""

from __future__ import annotations

import numpy as np

from ..errors import ConfigError
from .spgram import Spgram

__all__ = ["Asgram"]

_DEFAULT_LEVELS = " .,-+*&NM#"


class Asgram:
    """ASCII spectrogram over an ``nfft``-point periodogram."""

    def __init__(self, nfft: int, levels: str = _DEFAULT_LEVELS):
        if nfft < 2:
            raise ConfigError(f"fft size ({nfft}) must be >= 2")
        if len(levels) < 2:
            raise ConfigError("display levels must have >= 2 characters")
        self.nfft = nfft
        self.levels = levels
        self.ref = -40.0   # reference level [dB]
        self.div = 10.0    # dB per display division
        self._sp = Spgram.create(nfft)

    def set_display(self, ref: float, div: float) -> None:
        """Set reference level [dB] and dB-per-division (liquid
        ``asgram_set_scale``)."""
        if div <= 0.0:
            raise ConfigError(f"scale ({div}) must be > 0")
        self.ref = float(ref)
        self.div = float(div)

    def reset(self) -> None:
        self._sp = self._sp.reset()

    def push(self, x) -> None:
        """Push samples into the periodogram."""
        self._sp = self._sp.write(np.asarray(x, dtype=np.complex64))

    def execute(self):
        """Render: returns (ascii line, peak frequency in [-0.5,0.5),
        peak PSD dB)."""
        psd = np.asarray(self._sp.get_psd())  # fft-shifted dB
        nchars = len(self.levels)
        q = np.floor((psd - self.ref) / self.div).astype(int)
        q = np.clip(q, 0, nchars - 1)
        line = "".join(self.levels[v] for v in q)
        ipk = int(np.argmax(psd))
        fpk = ipk / self.nfft - 0.5
        return line, float(fpk), float(psd[ipk])
