"""Oscillators, PLL, mixers (reference layer L5: src/nco/)."""

from .osc import Osc, constrain_phase  # noqa: F401
