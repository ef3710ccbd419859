"""Host-side scalar/vector math substrate (reference layer L0).

See /root/reference/src/math/ for the behavioral spec. Everything here runs
on the host at design/construction time in float64; device math is jnp.
"""

from .special import *  # noqa: F401,F403
from .windows import *  # noqa: F401,F403
from .poly import *  # noqa: F401,F403
from .modarith import *  # noqa: F401,F403
from .complexm import *  # noqa: F401,F403
from .dot import dotprod  # noqa: F401
