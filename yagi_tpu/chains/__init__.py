"""Composed signal chains — the framework's "model" layer.

The reference has no chain objects (users compose calls, e.g. the FM receive
chain in SURVEY.md §3.6); here common receive chains are packaged as state
pytrees with a single jittable ``step`` so they can be jit'd, sharded, and
benchmarked as units.
"""

from .rx import RxChain  # noqa: F401
from .fused import FusedRxChain  # noqa: F401
from .fm import FmStereoRx  # noqa: F401
from .qam import QamRx  # noqa: F401
