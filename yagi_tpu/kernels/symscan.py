"""Fused Pallas symbol-synchronizer scan (symsync.rs:230-266 semantics).

The XLA lax.scan formulation of the symsync feedback loop executes each
while-body op as an individually dispatched vector instruction on this
toolchain (~100 ns/op measured — kernels/ROOFLINE.md round-4 notes), which
caps the loop at ~75 Msps aggregate regardless of channel count. This
kernel fuses the ENTIRE per-sample control loop — one-hot branch select,
first-order loop filter, timing update, bounded emission unroll — into one
Mosaic program: the all-branch MF/dMF precompute streams through VMEM in
time tiles (auto-pipelined BlockSpec grid), and the loop state rides a VMEM
scratch across the sequential grid steps (select-against-init on step 0; a
`pl.when`-guarded init crashes this toolchain's lowering, plain select does
not — measured round 4, /tmp/tpuq jobs 59/60).

Mosaic-survival layout rules applied here (kernels/ROOFLINE.md):
* P-MAJOR input: x[t] is one (128, C) tile whose SUBLANE groups are
  [re·mf | re·dmf | im·mf | im·dmf] × P=32 and whose lanes are channels.
  The round-4 (C, 128) lane-grouped layout made every one-hot select a
  [C, 32]-shaped op occupying 32 of 128 lanes with per-op relayouts
  (0.55× the XLA scan); P-in-sublanes keeps every op dense and the
  selected scalars land directly in the native [C] vector layout;
* no in-kernel stack/concat — state rows load/store individually;
* integer iota only (f32 iota is rejected), branch index kept in f32
  (exact for its small-int range; no in-kernel uint ops).

Math is identical to `filter/symsync._emit_sample` (same op order, f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["symsync_scan", "symsync_scan_fused", "pallas_ok", "fused_ok"]

_NSTATE = 16  # state rows (9 used, padded to a sublane multiple)


def pallas_ok(batch_shape: tuple, n: int, npfb: int, E: int = 2) -> bool:
    """Shapes the kernel path supports: 1-D channel batch, lane-aligned,
    and an 8-row time tile within the scoped-VMEM budget (the vf/ys blocks
    put the tile in SUBLANES, so tiles must be multiples of 8; C=2048 with
    E=3 exceeds the budget at tile 8 — fall back to the XLA scan)."""
    if not (
        len(batch_shape) == 1
        and batch_shape[0] % 128 == 0
        and npfb == 32
        and n % 8 == 0
    ):
        return False
    C = batch_shape[0]
    return 8 * (4 * npfb + 1 + 3 * E) * C * 4 * 2 <= int(13e6)


def fused_ok(batch_shape: tuple, n: int, npfb: int, L: int, E: int,
             tile: int = 8) -> bool:
    """Shapes the in-kernel-MF variant supports (VMEM budget included)."""
    if not pallas_ok(batch_shape, n, npfb) or n % tile != 0:
        return False
    C = batch_shape[0]
    lpad = -(-L // 8) * 8
    # double-buffered x/vf/ys blocks + win/mf scratches, bytes
    vmem = (2 * (tile + lpad) * 2 + tile * 2 + tile * 6 * E
            + 2 * lpad * tile + 2 * 2 * npfb * tile) * C * 4
    return vmem <= int(12e6)


def _kernel(x_ref, vf_ref, init_ref, const_ref, y_ref, st_ref,
            state_scratch, *, P: int, E: int, k_out: int):
    i = pl.program_id(0)
    first = i == 0

    locked = const_ref[0]
    radj = const_ref[1]
    pa1 = const_ref[2]
    pb0 = const_ref[3]
    kf_inv = const_ref[4]

    C = x_ref.shape[2]
    # per-sublane branch index modulo P: ONE [4P, C] one-hot masks all four
    # plane groups at once, and ONE segmented reduce produces the four
    # selected vectors — 4x fewer select instructions than per-group
    # [P, C] reduces (the loop is instruction-issue-bound, ~100 ns/op)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (4 * P, C), 0) & (P - 1)
    ).astype(jnp.float32)
    Tt = x_ref.shape[0]

    def body(t, carry):
        (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1) = carry
        vs = vf_ref[t] > 0.5
        row = x_ref[t]  # [128, C]: sublane groups [re·mf | re·dmf | im·mf | im·dmf]

        for e in range(E):
            active = (b < P) & vs
            bb = jnp.clip(b, 0.0, P - 1.0)
            oh4 = (bb[None, :] == iota).astype(jnp.float32)  # [4P, C]
            g = jnp.sum((row * oh4).reshape(4, P, C), axis=1)  # [4, C]
            mr, dr, mi, di = g[0], g[1], g[2], g[3]

            if k_out == 1:
                do_t = (dec == 1.0) & active & (locked < 0.5)
            else:
                do_t = (dec == float(k_out)) & active & (locked < 0.5)
                dec = jnp.where((dec == float(k_out)) & active, 0.0, dec)

            q = jnp.clip(mr * dr + mi * di, -1.0, 1.0)
            v0 = q - pa1 * pv0
            q_hat = pb0 * v0
            rate_new = rate + radj * q_hat
            delta_new = rate_new + q_hat

            pv1 = jnp.where(do_t, pv0, pv1)
            pv0 = jnp.where(do_t, v0, pv0)
            rate = jnp.where(do_t, rate_new, rate)
            delta = jnp.where(do_t, delta_new, delta)
            tau_d = jnp.where(do_t, tau, tau_d)

            if k_out == 1:
                dec = jnp.where(active, 1.0, dec)
            else:
                dec = jnp.where(active, dec + 1.0, dec)
            tau = jnp.where(active, tau + delta, tau)
            bf = jnp.where(active, tau * P, bf)
            b = jnp.where(active, jnp.round(bf), b)
            af = active.astype(jnp.float32)
            # grouped rows [yr slots | yi slots | valid slots] (XLA layout)
            y_ref[t, e] = af * mr * kf_inv
            y_ref[t, E + e] = af * mi * kf_inv
            y_ref[t, 2 * E + e] = af

        vsf = vs.astype(jnp.float32)
        tau = tau - vsf
        bf = bf - vsf * P
        b = b - vsf * P
        return (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1)

    carry0 = tuple(
        jnp.where(first, init_ref[r], state_scratch[r]) for r in range(9)
    )
    carry = jax.lax.fori_loop(0, Tt, body, carry0)
    for r in range(9):
        state_scratch[r] = carry[r]
        st_ref[r] = carry[r]


def symsync_scan(xs4t, vf, state16, consts, *, P: int, E: int, k_out: int,
                 tile: int = 0, interpret: bool = False):
    """Run the fused scan.

    ``xs4t``: [n, 4P, C] f32 time-major all-branch outputs, SUBLANE groups
    [re·mf | re·dmf | im·mf | im·dmf] with channels in lanes (P-major —
    see module docstring); ``vf``: [n, C] f32 valid-prefix
    flags (1.0 = consume); ``state16``: [16, C] f32 rows (b, bf, tau,
    tau_d, rate, delta, dec, pv0, pv1, pad…); ``consts``: [8, C] f32 rows
    (locked, radj, pa1, pb0, 1/k, pad…). Returns ``(ys [n, 3E, C],
    state' [16, C])``.
    """
    n, _, C = xs4t.shape
    if tile <= 0:
        # largest multiple-of-8 divisor of n whose DOUBLE-BUFFERED in+out
        # blocks fit the ~13 MB scoped-VMEM budget (per time step: x
        # [4P, C] + vf [C] + ys [3E, C], two buffers each; the vf/ys block
        # sublane dim requires tile % 8 == 0 — pallas_ok pre-screens the
        # C/E combinations where even tile=8 overflows)
        unit = (4 * P + 1 + 3 * E) * C * 4 * 2
        target = max(8, int(13e6 // unit))
        tile = 8
        for cand in range(8, min(n, target) + 1, 8):
            if n % cand == 0:
                tile = cand
    grid = n // tile
    kern = functools.partial(_kernel, P=P, E=E, k_out=k_out)
    ys, st = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, 4 * P, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, C), lambda i: (i, 0)),
            pl.BlockSpec((_NSTATE, C), lambda i: (0, 0)),
            pl.BlockSpec((8, C), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 3 * E, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((_NSTATE, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3 * E, C), jnp.float32),
            jax.ShapeDtypeStruct((_NSTATE, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_NSTATE, C), jnp.float32)],
        interpret=interpret,
    )(xs4t, vf, state16, consts)
    return ys, st


def _kernel_fused(xov_r, xov_i, vf_ref, init_ref, const_ref, g2_ref,
                  y_ref, st_ref, state_scratch, win_scratch, mf_scratch,
                  *, P: int, E: int, k_out: int, tile: int):
    """In-kernel-MF variant: per time tile, the matched/derivative filter
    outputs are computed HERE by two [2P, Lpad] x [Lpad, tile*C] MXU dots
    over the raw overlapped sample stream — the 2 GB/block materialized
    all-branch precompute (and its padded-intermediate HBM traffic, the
    185-Msps binding term at C=1024) never exists. Loop math is identical
    to :func:`_kernel`; MF values differ from the XLA banded matmul only
    by fp32 summation order (~1 ULP), so cross-formulation parity is
    tolerance-level while the kernel's own block-split invariance stays
    bit-exact. Measured 6.1 ms per 4096-sample block at C=1024 (686 Msps,
    ROOFLINE round-5 late findings)."""
    i = pl.program_id(0)
    first = i == 0
    C = xov_r.shape[2]
    lpad = g2_ref.shape[1]

    locked = const_ref[0]
    radj = const_ref[1]
    pa1 = const_ref[2]
    pb0 = const_ref[3]
    kf_inv = const_ref[4]
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (4 * P, C), 0) & (P - 1)
    ).astype(jnp.float32)

    # ---- per-tile MF dots ------------------------------------------------
    g2 = g2_ref[...]  # [2P, Lpad]
    for t in range(tile):
        win_scratch[0, :, t * C : (t + 1) * C] = xov_r[0, t : t + lpad, :]
        win_scratch[1, :, t * C : (t + 1) * C] = xov_i[0, t : t + lpad, :]
    mf_scratch[0] = jax.lax.dot_general(
        g2, win_scratch[0], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    mf_scratch[1] = jax.lax.dot_general(
        g2, win_scratch[1], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)

    def body(t, carry):
        (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1) = carry
        vs = vf_ref[0, t] > 0.5
        rowr = mf_scratch[0, :, pl.dslice(t * C, C)]  # [2P, C] = [mf|dmf]
        rowi = mf_scratch[1, :, pl.dslice(t * C, C)]
        row = jnp.concatenate([rowr, rowi], axis=0)  # [4P, C]

        for e in range(E):
            active = (b < P) & vs
            bb = jnp.clip(b, 0.0, P - 1.0)
            oh4 = (bb[None, :] == iota).astype(jnp.float32)  # [4P, C]
            g = jnp.sum((row * oh4).reshape(4, P, C), axis=1)  # [4, C]
            mr, dr, mi, di = g[0], g[1], g[2], g[3]

            if k_out == 1:
                do_t = (dec == 1.0) & active & (locked < 0.5)
            else:
                do_t = (dec == float(k_out)) & active & (locked < 0.5)
                dec = jnp.where((dec == float(k_out)) & active, 0.0, dec)

            q = jnp.clip(mr * dr + mi * di, -1.0, 1.0)
            v0 = q - pa1 * pv0
            q_hat = pb0 * v0
            rate_new = rate + radj * q_hat
            delta_new = rate_new + q_hat

            pv1 = jnp.where(do_t, pv0, pv1)
            pv0 = jnp.where(do_t, v0, pv0)
            rate = jnp.where(do_t, rate_new, rate)
            delta = jnp.where(do_t, delta_new, delta)
            tau_d = jnp.where(do_t, tau, tau_d)

            if k_out == 1:
                dec = jnp.where(active, 1.0, dec)
            else:
                dec = jnp.where(active, dec + 1.0, dec)
            tau = jnp.where(active, tau + delta, tau)
            bf = jnp.where(active, tau * P, bf)
            b = jnp.where(active, jnp.round(bf), b)
            af = active.astype(jnp.float32)
            y_ref[0, t, e] = af * mr * kf_inv
            y_ref[0, t, E + e] = af * mi * kf_inv
            y_ref[0, t, 2 * E + e] = af

        vsf = vs.astype(jnp.float32)
        return (b - vsf * P, bf - vsf * P, tau - vsf, tau_d, rate, delta,
                dec, pv0, pv1)

    carry0 = tuple(
        jnp.where(first, init_ref[r], state_scratch[r]) for r in range(9)
    )
    carry = jax.lax.fori_loop(0, tile, body, carry0)
    for r in range(9):
        state_scratch[r] = carry[r]
        st_ref[r] = carry[r]


def symsync_scan_fused(xt_r, xt_i, vf, state16, consts, g2, *, P: int,
                       E: int, k_out: int, tile: int = 8,
                       interpret: bool = False):
    """Run the in-kernel-MF fused scan.

    ``xt_r``/``xt_i``: [n + Lpad, C] TIME-MAJOR raw sample planes (the
    L−1-sample history at the front, zero right-padding to n + Lpad);
    ``vf``: [n, C] valid flags; ``state16``/``consts`` as
    :func:`symsync_scan`; ``g2``: [2P, Lpad] tap matrix with
    ``g2[i, j] = bank[i, L-1-j]`` (bank = [mf; dmf]), zero-padded columns.
    Returns ``(ys [n, 3E, C], state' [16, C])``.
    """
    n, C = vf.shape
    lpad = g2.shape[1]
    grid = n // tile
    # overlapped time blocks [grid, tile + Lpad, C] (≈(1 + Lpad/tile)x the
    # 16 MB raw stream — vs the 2 GB materialized all-branch precompute)
    idx = (jnp.arange(grid)[:, None] * tile
           + jnp.arange(tile + lpad)[None, :])
    xov_r = jnp.take(xt_r, idx, axis=0)
    xov_i = jnp.take(xt_i, idx, axis=0)
    vf3 = vf.reshape(grid, tile, C)
    kern = functools.partial(_kernel_fused, P=P, E=E, k_out=k_out, tile=tile)
    ys, st = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, tile + lpad, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tile + lpad, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tile, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((_NSTATE, C), lambda i: (0, 0)),
            pl.BlockSpec((8, C), lambda i: (0, 0)),
            pl.BlockSpec(g2.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, 3 * E, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((_NSTATE, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, tile, 3 * E, C), jnp.float32),
            jax.ShapeDtypeStruct((_NSTATE, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NSTATE, C), jnp.float32),
            pltpu.VMEM((2, lpad, tile * C), jnp.float32),
            pltpu.VMEM((2, 2 * P, tile * C), jnp.float32),
        ],
        interpret=interpret,
    )(xov_r, xov_i, vf3, state16, consts, g2)
    return ys.reshape(n, 3 * E, C), st
