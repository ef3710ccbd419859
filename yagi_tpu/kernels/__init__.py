"""Pallas TPU kernels for hot paths.

Round-1 status: the XLA formulations (grouped convs, batched FFTs) already
sit in the HBM-bound regime on v5e (see kernels/ROOFLINE.md); the win from
Pallas is FUSION — one HBM pass over the stream instead of one per stage.
This package establishes the pattern with a fused mixer kernel; the fused
FIR+resample+mix chain kernel is the round-2 target.
"""

from .mix import pallas_mix_down  # noqa: F401
from .chain import chain_matrices, fused_chain_apply  # noqa: F401
