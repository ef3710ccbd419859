"""Complex scalar math (host-side parity wrappers).

Behavioral spec: /root/reference/src/math/complex.rs, which ports liquid's
cexpf/clogf/csqrtf/casinf/cacosf/catanf. NumPy provides these natively with
better accuracy; kept as named wrappers for API parity.
"""

from __future__ import annotations

import numpy as np

__all__ = ["cexpf", "clogf", "csqrtf", "casinf", "cacosf", "catanf"]


def cexpf(z):
    return np.exp(np.asarray(z, dtype=np.complex128))


def clogf(z):
    return np.log(np.asarray(z, dtype=np.complex128))


def csqrtf(z):
    return np.sqrt(np.asarray(z, dtype=np.complex128))


def casinf(z):
    return np.arcsin(np.asarray(z, dtype=np.complex128))


def cacosf(z):
    return np.arccos(np.asarray(z, dtype=np.complex128))


def catanf(z):
    return np.arctan(np.asarray(z, dtype=np.complex128))
