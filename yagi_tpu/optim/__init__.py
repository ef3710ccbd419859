"""1-D optimization utilities (reference: src/optim/)."""

from .qs1dsearch import OptimDirection, Qs1dSearch  # noqa: F401
