"""Signal generators / framing (reference layer L7: src/framing/)."""

from .symstream import SymStream, SymStreamR  # noqa: F401
