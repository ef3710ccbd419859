"""Audio codecs (reference module src/audio/ — declared but empty).

Only CVSD lives here, matching liquid upstream's audio module scope.
"""

from .cvsd import Cvsd  # noqa: F401

__all__ = ["Cvsd"]
