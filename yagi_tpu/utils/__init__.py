"""Test/validation utilities (reference layer X: utility/test_helpers.rs)."""

from .psd_validate import (  # noqa: F401
    PsdRegion,
    validate_psd_spectrum,
    validate_psd_signal,
    validate_psd_signalf,
    validate_psd_spgram,
)
from . import bits  # noqa: F401
from . import byteops  # noqa: F401
from .planar import (  # noqa: F401
    Planar,
    planarize,
    unplanarize,
    planar,
    planar_jit,
)
from .checkpoint import (  # noqa: F401
    load_state,
    save_state,
    state_leaves,
)
from .compact import compact_valid  # noqa: F401
