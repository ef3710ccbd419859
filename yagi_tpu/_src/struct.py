"""Pytree dataclass machinery for stateful DSP objects.

Every streaming DSP object in yagi_tpu (filters, resamplers, oscillators,
modems, ...) is an immutable frozen dataclass registered as a JAX pytree.
Array-valued fields (coefficients *and* carried streaming state) are pytree
leaves; structural configuration (lengths, counts, flags) are static metadata
so they participate in jit specialization.

This replaces the reference's mutable per-sample objects (e.g. yagi's
``FirFilter { h, w: VecDeque, scale }``, /root/reference/src/filter/fir/firfilt.rs:10)
with a functional state-threading style: ``y, obj = obj.execute_block(x)``.
Because objects are pytrees they are jit/vmap/scan-compatible and trivially
checkpointable (the reference instead relied on ``Clone`` for state capture,
cf. SURVEY.md §5 Checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs) -> Any:
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs) -> Any:
    """A regular (leaf / traced) dataclass field."""
    return dataclasses.field(**kwargs)


def pytree(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node.

    Fields declared with :func:`static_field` become static metadata; all other
    fields are pytree data leaves.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def _replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace  # type: ignore[attr-defined]
    return cls
