"""Error types mirroring the reference's error taxonomy.

The reference defines ``Error::{Internal, Config, Value, Range, Mode,
NoConvergence}`` (/root/reference/src/error.rs:4-14); constructors validate
parameters eagerly and fail with ``Config``. We keep the same taxonomy as
Python exceptions raised at (host-side) construction / trace time.
"""

from __future__ import annotations


class YagiError(Exception):
    """Base class for all yagi_tpu errors."""


class ConfigError(YagiError, ValueError):
    """Invalid configuration parameter (reference: ``Error::Config``)."""


class ValueRangeError(YagiError, ValueError):
    """Value out of range (reference: ``Error::Value`` / ``Error::Range``)."""


class ModeError(YagiError, RuntimeError):
    """Invalid mode of operation (reference: ``Error::Mode``)."""


class NoConvergenceError(YagiError, RuntimeError):
    """Iterative routine failed to converge (reference: ``Error::NoConvergence``)."""


class InternalError(YagiError, RuntimeError):
    """Internal invariant violation (reference: ``Error::Internal``)."""
