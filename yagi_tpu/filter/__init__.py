"""Streaming filter kernels (reference layer L4: src/filter/)."""

from .firfilt import FirFilter  # noqa: F401
from .firpfb import FirPfbFilter, pfb_decompose  # noqa: F401
from .firinterp import FirInterpolationFilter  # noqa: F401
from .firdecim import FirDecimationFilter  # noqa: F401
from .resamp import Resamp  # noqa: F401
from .iirfilt import IirFilter  # noqa: F401
from .iirfiltsos import IirFilterSos  # noqa: F401
