"""Fused Pallas polyphase channelizer kernel (BASELINE config[4] hot path).

One VMEM pass replaces the XLA analyzer chain (multichannel/firpfbch.py):
branch-stream assembly (the commutator x[iM−b]) as in-register lane
shuffles, the p-tap branch FIRs as shifted fused multiply-adds on the VPU,
and the M-point inverse DFT as an MXU matmul against the twiddle matrix —
the round-2 plan from kernels/ROOFLINE.md (reference engine being replaced:
the rustfft planner, /root/reference/src/fft/mod.rs:34-58; algorithm:
liquid firpfbch, see multichannel/firpfbch.py).

Layout: the input stream is viewed as [T2, 128] f32 planes with two
M=64-sample blocks per 128-lane row (S=2 analyzer steps per row). For step
i (M-block X[i]):

  s_b[i]   = x[iM − b] = [X[i,0] | reverse(X[i−1])[0:63]]   (commutator)
  u[b, i]  = Σ_j br[b, j] · s_b[i−j]                        (branch FIR)
  y[k, i]  = Σ_b u[b, i] · e^{+2πi·bk/M} · scale            (IDFT, MXU)

Output is step-major [..., T, M] planar (y[t, k] = channel k at step t) —
the natural memory order of the fused pass; transpose outside if the
channel-major [M, T] view is needed.

Complex I/O is planar re/im (Mosaic has no complex dtype; the production
runtime rejects boundary complex anyway — utils/planar.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_channelizer_apply", "channelizer_tables"]

_LANE = 128
_M = 64  # channels (kernel is specialized to M=64, the config[4] workload)
_S = _LANE // _M  # analyzer steps per 128-lane row (= 2)


def channelizer_tables(branches: np.ndarray, scale: float):
    """Host tables: per-tap lane vectors + block-diagonal IDFT twiddles.

    branches: [M, p] conv order (branch b tap j multiplies s_b[i−j], cf.
    multichannel/firpfbch.py).

    Lane convention: in-kernel lane c carries branch b(c) = (M−c) mod M, so
    the commutator s_{b(c)}[m] = X[m−1, c] (c ≥ 1) needs NO lane reversal —
    Mosaic has no `rev` lowering — only a one-step lane/row shift plus a
    lane-0 patch (c = 0 carries b = 0, s_0[m] = X[m, 0]). The branch
    permutation is folded into these tables instead: taps[j, c] =
    branches[b(c), j] and H = blockdiag(W', W') with
    W'[c, k] = e^{+2πi·b(c)·k/M}·scale.
    """
    M, p = branches.shape
    if M != _M:
        raise ValueError(f"kernel is specialized to M={_M}")
    perm = (-np.arange(M)) % M  # b(c)
    taps = np.tile(branches[perm].astype(np.float32).T, (1, _S))  # [p, 128]
    b = np.arange(M)
    w = np.exp(2j * np.pi * np.outer(perm, b) / M) * scale
    h = np.zeros((_LANE, _LANE), np.complex128)
    for s in range(_S):
        h[s * M : (s + 1) * M, s * M : (s + 1) * M] = w
    return taps, h.real.astype(np.float32), h.imag.astype(np.float32)


def _chan_kernel(p: int, r2: int, halo: int, precision,
                 xr_ref, xi_ref, taps_ref, hr_ref, hi_ref,
                 gr_ref, gi_ref, yr_ref, yi_ref):
    """One tile: R2 rows (2·R2 analyzer steps) → R2 output rows."""
    # ext rows: [halo | tile] along the row (step-pair) axis
    exr = jnp.concatenate([gr_ref[0], xr_ref[:]], axis=0)  # [R2+halo, 128]
    exi = jnp.concatenate([gi_ref[0], xi_ref[:]], axis=0)

    def build_streams(ext):
        # lane c carries branch b(c) = (M−c)%M (tables pre-permuted), so the
        # stream row for steps (2r, 2r+1) is just the one-step-earlier pair
        # of M-blocks with lanes 0 and 64 patched from the current blocks:
        #   s'[c, m] = X[m−1, c] (c ≥ 1),  s'[0, m] = X[m, 0].
        rows = ext.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
        patch = (lane & (_M - 1)) == 0  # lanes 0 and 64
        ext_prev = jnp.concatenate([jnp.zeros_like(ext[:1]), ext[:-1]], axis=0)
        # steps shifted by 1: row r = [X[2r−1] | X[2r]]
        shift1 = jnp.concatenate([ext_prev[:, _M:], ext[:, :_M]], axis=1)
        # steps shifted by 2: row r = [X[2r−2] | X[2r−1]] = ext_prev
        s2 = jnp.where(patch, ext, shift1)  # steps (2r, 2r+1)
        s2d = jnp.where(patch, shift1, ext_prev)  # steps (2r−1, 2r)
        return s2, s2d

    s2r, s2dr = build_streams(exr)
    s2i, s2di = build_streams(exi)

    taps = taps_ref[:]  # [p, 128]

    def branch_fir(s2, s2d):
        acc = None
        for j in range(p):
            # tap j delays by j steps: even j stays on the (2r, 2r+1) grid
            # shifted j/2 rows; odd j uses the one-step-delayed view
            src = s2 if j % 2 == 0 else s2d
            shift = j // 2
            seg = src[halo - shift : halo - shift + r2]
            term = taps[j][None, :] * seg
            acc = term if acc is None else acc + term
        return acc

    ur = branch_fir(s2r, s2dr)  # [R2, 128]
    ui = branch_fir(s2i, s2di)

    # complex IDFT as TWO stacked K=256 dots instead of four K=128 dots +
    # two VPU adds (same merged-MXU-pass trick as kernels/chain.py):
    #   yr = [ur|ui] @ [H_re; −H_im],  yi = [ur|ui] @ [H_im; H_re]
    u = jnp.concatenate([ur, ui], axis=1)  # [R2, 256]
    dn = (((1,), (0,)), ((), ()))
    dg = lambda a, w: jax.lax.dot_general(
        a, w, dn, preferred_element_type=jnp.float32, precision=precision
    )
    yr_ref[:] = dg(u, hr_ref[:])
    yi_ref[:] = dg(u, hi_ref[:])


@functools.partial(jax.jit, static_argnames=("p", "r2", "precision", "interpret"))
def fused_channelizer_apply(
    xr,
    xi,
    taps,
    hr,
    hi,
    hist_r,
    hist_i,
    *,
    p: int,
    r2: int = 128,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """Channelize planar stream planes xr/xi [N] (N = T·M, T steps).

    taps [p, 128], hr/hi [128, 128] from :func:`channelizer_tables`;
    hist_r/i [HALO·128] = trailing input samples of the previous block
    (zeros at stream start), where HALO = ceil((p+1)/2) rows.

    Returns (yr, yi) shaped [T, M] (step-major). State advance (caller):
    hist' = x[-HALO·128:].
    """
    n = xr.shape[-1]
    t2 = n // _LANE
    # rows of history: deepest access is X[i−p] plus one row for the
    # delayed-view construction → max(⌈p/2⌉, (p−1)//2 + 1) = (p+1)//2 rounded
    halo = max((p + 1) // 2, (p - 1) // 2 + 1)
    if n % _LANE:
        raise ValueError("stream length must be a multiple of 128")
    if t2 % r2:
        raise ValueError(f"need length divisible by {r2 * _LANE}")
    grid = t2 // r2

    x2r = xr.reshape(t2, _LANE)
    x2i = xi.reshape(t2, _LANE)
    h2r = hist_r.reshape(halo, _LANE)
    h2i = hist_i.reshape(halo, _LANE)
    # stacked IDFT matrices for the kernel's two K=256 dots
    hs1 = jnp.concatenate([hr, -hi], axis=0)  # [256, 128]
    hs2 = jnp.concatenate([hi, hr], axis=0)
    # per-tile halo rows [grid, halo, 128]: previous tile's trailing rows
    def halo_rows(x2, h2):
        tails = x2.reshape(grid, r2, _LANE)[:-1, r2 - halo :]
        return jnp.concatenate([h2[None], tails], axis=0)

    gr = halo_rows(x2r, h2r)
    gi = halo_rows(x2i, h2i)

    kernel = functools.partial(_chan_kernel, p, r2, halo, precision)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((r2, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((taps.shape[0], _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _LANE, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _LANE, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, halo, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, halo, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r2, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((t2, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((t2, _LANE), jnp.float32),
        ),
        interpret=interpret,
    )(x2r, x2i, taps, hs1, hs2, gr, gi)
    t = t2 * _S
    return yr.reshape(t, _M), yi.reshape(t, _M)
