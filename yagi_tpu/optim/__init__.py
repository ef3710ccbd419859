"""Optimization utilities (reference: src/optim/ + liquid's optim module)."""

from .qs1dsearch import OptimDirection, Qs1dSearch  # noqa: F401
from .gradsearch import GradSearch, QnSearch  # noqa: F401
from .gasearch import Chromosome, GaSearch  # noqa: F401
