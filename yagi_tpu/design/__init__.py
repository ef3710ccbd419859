"""Filter design (reference layer L3) — host-side float64 coefficient math.

FIR: windowed-sinc (Kaiser & generic), Parks-McClellan/Remez, raised-cosine
families, root-Nyquist families, GMSK, notch/DC-blocker, doppler.
IIR: analog prototypes (Butterworth/Chebyshev/elliptic/Bessel) + bilinear
transform + SOS realization (see .iir).
"""

from .fir import *  # noqa: F401,F403
from .pm import (  # noqa: F401
    FirPmBandType,
    FirPmWeightType,
    FirDesignPm,
    fir_design_pm,
    fir_design_pm_lowpass,
)
