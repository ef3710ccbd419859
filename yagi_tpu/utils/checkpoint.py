"""Checkpoint / restore for streaming state pytrees.

Every stateful object in yagi_tpu is an immutable ``struct.pytree`` whose
dynamic leaves are plain arrays, so a checkpoint is exactly the flattened
leaf list. ``save_state`` writes the leaves of one (or a pytree of) state
object(s) to an ``.npz``; ``load_state`` restores them into a structurally
identical template (same create() config), validating leaf count, shapes
and dtypes.

This is the reference's mid-stream Clone-test discipline
(/root/reference/src/filter/resampler/resamp.rs:345-381,
src/filter/symsync.rs:290-336) elevated to actual serialization: a restored
object must continue the stream bit-identically (tests/test_checkpoint.py).

Static (non-leaf) configuration — filter lengths, rates, precomputed tap
tables marked ``static_field`` — is intentionally NOT serialized: it is
re-derived from the template's ``create()`` call, keeping checkpoints small
and portable across library versions that only change tap synthesis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state", "state_leaves"]

_MAGIC = "yagi_tpu_ckpt_v1"


def state_leaves(obj):
    """The dynamic (serialized) leaves of a state pytree, host-side."""
    return [np.asarray(l) for l in jax.tree_util.tree_leaves(obj)]


def save_state(path, obj) -> None:
    """Serialize the dynamic leaves of ``obj`` (any pytree of states)."""
    leaves = state_leaves(obj)
    np.savez(
        path,
        __magic__=np.asarray(_MAGIC),
        __n_leaves__=np.asarray(len(leaves)),
        **{f"leaf_{i}": l for i, l in enumerate(leaves)},
    )


def load_state(path, template):
    """Restore a state saved by :func:`save_state` into ``template``.

    ``template`` must be a structurally identical pytree (typically a
    freshly ``create()``-ed object with the same configuration). Returns a
    new object with the template's statics and the checkpoint's leaves.
    """
    data = np.load(path, allow_pickle=False)
    if str(data["__magic__"]) != _MAGIC:
        raise ValueError(f"not a yagi_tpu checkpoint: {path}")
    tleaves, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["__n_leaves__"])
    if n != len(tleaves):
        raise ValueError(
            f"checkpoint/template structure mismatch: {n} saved leaves vs "
            f"{len(tleaves)} in template"
        )
    new = []
    for i, tl in enumerate(tleaves):
        arr = data[f"leaf_{i}"]
        tarr = np.asarray(tl)
        if arr.shape != tarr.shape or arr.dtype != tarr.dtype:
            raise ValueError(
                f"leaf {i}: checkpoint {arr.dtype}{arr.shape} vs template "
                f"{tarr.dtype}{tarr.shape}"
            )
        new.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new)
