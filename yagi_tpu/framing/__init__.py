"""Signal generators / framing (reference layer L7: src/framing/).

Beyond the reference's SymStream/SymStreamR, this package fills the
framing components yagi declared but never ported (SURVEY.md §2.6):
qpacketmodem, qdetector, qdsync, qpilotgen/qpilotsync, frame64 gen/sync,
flexframe gen/sync, gmskframe gen/sync, msource.
"""

from .symstream import SymStream, SymStreamR  # noqa: F401
from .qpacketmodem import QPacketModem  # noqa: F401
from .qdetector import QDetector  # noqa: F401
from .qdsync import QDSync  # noqa: F401
from .qpilot import QPilotGen, QPilotSync  # noqa: F401
from .frame64 import FrameGen64, FrameSync64, frame64_len  # noqa: F401


def __getattr__(name):  # FRAME64_LEN stays importable, evaluated lazily
    if name == "FRAME64_LEN":
        return frame64_len()
    raise AttributeError(name)
from .flexframe import FlexFrameGen, FlexFrameSync  # noqa: F401
from .gmskframe import GmskFrameGen, GmskFrameSync  # noqa: F401
from .dsssframe import DsssFrameGen64, DsssFrameSync64  # noqa: F401
from .fskframe import FskFrameGen, FskFrameSync  # noqa: F401
from .msource import MSource  # noqa: F401
from .bsync import BSync  # noqa: F401
from .detector import Detector  # noqa: F401
from .bpacket import BPacketGen, BPacketSync  # noqa: F401
