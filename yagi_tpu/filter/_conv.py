"""Batched causal convolution primitives shared by the streaming filters.

These map the per-sample dotprod hot loop of the reference
(/root/reference/src/dotprod/mod.rs:19-121, firfilt.rs:241-245) onto XLA's
conv_general_dilated, which the TPU backend tiles onto the MXU. All streaming
filters operate on the LAST axis with arbitrary leading batch/channel dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


def result_dtype(x_dtype, h_dtype):
    """Promotion rule matching liquid's rrrf/crcf/cccf type algebra."""
    return jnp.promote_types(x_dtype, h_dtype)


def causal_conv_valid(xa: jnp.ndarray, h: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """y[..., n] = Σ_k h[k] · xa[..., n·stride + L - 1 - k].

    ``xa`` already includes the L-1 history samples on the left, so this is a
    VALID correlation with the flipped kernel — exactly the reference's
    window·h dotprod per output sample (firfilt.rs:241).
    """
    h = jnp.asarray(h)
    L = h.shape[0]
    out_dtype = result_dtype(xa.dtype, h.dtype)
    xa = xa.astype(out_dtype)
    hk = h.astype(out_dtype)[::-1]

    batch_shape = xa.shape[:-1]
    m = xa.shape[-1]
    lhs = xa.reshape((-1, 1, m))
    rhs = hk.reshape((1, 1, L))
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        precision=_PREC,
    )
    n_out = y.shape[-1]
    return y.reshape(batch_shape + (n_out,))


def multi_branch_conv(xa: jnp.ndarray, branches: jnp.ndarray) -> jnp.ndarray:
    """All-branch polyphase convolution.

    ``branches`` is [M, Lsub] with branch i's taps in convolution order
    (branches[i, 0] multiplies the newest sample). Returns [..., M, N] where
    out[..., i, n] = Σ_j branches[i, j] · xa[..., n + Lsub - 1 - j] — i.e.
    the reference's FirPfbFilter::execute(i) for every branch at once
    (firpfb.rs:277-286).
    """
    branches = jnp.asarray(branches)
    M, L = branches.shape
    out_dtype = result_dtype(xa.dtype, branches.dtype)
    xa = xa.astype(out_dtype)
    rhs = branches.astype(out_dtype)[:, ::-1].reshape((M, 1, L))

    batch_shape = xa.shape[:-1]
    m = xa.shape[-1]
    lhs = xa.reshape((-1, 1, m))
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        precision=_PREC,
    )  # [B, M, N]
    n_out = y.shape[-1]
    return y.reshape(batch_shape + (M, n_out))


def frame_gather(xa: jnp.ndarray, starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gather frames xa[..., s : s+length] for each start s.

    Returns [..., len(starts), length]. Used where output positions are
    data-dependent (arbitrary resampler branch select, resamp.rs:141-154).
    """
    idx = starts[:, None] + jnp.arange(length)[None, :]
    return xa[..., idx]


def np_taps(h) -> np.ndarray:
    """Coerce host-side design output to a float32/complex64 numpy array."""
    h = np.asarray(h)
    if np.iscomplexobj(h):
        return h.astype(np.complex64)
    return h.astype(np.float32)
