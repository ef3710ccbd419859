"""Symbol timing recovery (polyphase matched-filter synchronizer).

Behavioral spec: /root/reference/src/filter/symsync.rs. Matched + derivative
matched-filter PFBs (dMF scaled 0.06/max|h·dh|, symsync.rs:58-76); timing
error q = clamp(Re(mf*·dmf)) filtered by a biquad loop filter
(symsync.rs:196-213, 268-276); per input sample the loop emits 0..k outputs
stepping through the npfb filterbank branches with rate feedback
(symsync.rs:230-266).

The feedback makes this inherently sequential per stream → lax.scan over
samples with a bounded number of emissions per step (masked), batched over
channels (SURVEY.md §7 hard part #3). Outputs come back as a fixed-capacity
buffer + exact count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .. import design
from .firpfb import pfb_decompose

__all__ = ["Symsync"]

_MAX_EMIT = 4  # emissions per input sample never exceed ceil(1/del)+1 ≤ 4 for k ≥ 2

# all-branch precompute planes: 4 = (re·mf, im·mf, re·dmf, im·dmf) with the
# timing error computed in-body; 3 = (re·mf, im·mf, q) with q folded outside
# the scan. Interleaved same-session A/B on the real chip (round 5, C=1024):
# 4-plane 101.9/78.1 Msps (symsync/QamRx) vs 3-plane 86.3/69.8 — the
# 3-plane jnp.stack costs a full extra materialization pass of the
# precompute that outweighs dropping two in-body multiplies. Keep 4.
_PLANES = 4

# batch-leading array fields (utils/smallbatch lane padding)
_BATCH_FIELDS = (
    "window", "b", "bf", "tau", "tau_decim", "rate", "delta", "q_err",
    "q_hat", "decim_counter", "pll_v", "rate_adjustment", "locked",
)


def _auto_emit(k: int, k_out: int) -> int:
    """Designed per-sample emission capacity: ceil(1/δ_min)+1 slots for the
    factor-2 rate-tracking range δ ≥ k/(2·k_out) (real SDR rate offsets are
    ppm; ×2 is generous). An emission that would exceed the cap is DEFERRED
    to the next input sample by the bounded unroll (`_emit_sample` keeps
    ``b < npfb`` across the wrap, so the sample emits next step with the
    clipped branch) — nothing is dropped; `pending` flags the event. Smaller
    caps matter: per-emission op count is the measured scan bottleneck
    (kernels/ROOFLINE.md round-4 notes).
    """
    import math

    return max(1, min(_MAX_EMIT, math.ceil(2 * k_out / k) + 1))


def _sym_loop_params(ss: "Symsync"):
    """Loop-invariant constants for :func:`_emit_sample`.

    Broadcast + barrier'd batch-shaped vectors (utils.loop_constants): rank-0
    in-body slices like ``pll_a[1]`` get sunk into every while-loop iteration
    on this toolchain (kernels/ROOFLINE.md "Loop-invariant sinking").
    """
    from ..utils.planar import loop_constants

    # the loop filter is FIRST-ORDER by construction (set_lf_bw —
    # symsync.rs:196-213: b = [β/a0, 0, 0], a = [1, −b·α/a0, 0]), so only
    # a[1] and b[0] enter the recurrence; the dead biquad terms are elided
    # from the scan body (per-op cost dominates the feedback loops,
    # kernels/ROOFLINE.md round-4 notes)
    pa1, pb0 = loop_constants(ss.pll_a[1], ss.pll_b[0], like=ss.tau)
    return dict(
        npfb=ss.npfb,
        k_out=ss.k_out,
        # branch iota in P-MAJOR layout: [P, 1...] broadcasting against the
        # [*batch]-shaped filterbank index (see _emit_sample layout note)
        pidx=jnp.arange(ss.npfb, dtype=jnp.int32).reshape(
            (ss.npfb,) + (1,) * ss.tau.ndim
        ),
        # hoisted complement: ~locked costs one in-loop op per emission slot
        # otherwise (the loop is per-op-bound, ROOFLINE round 5)
        notlocked=~ss.locked,
        radj=ss.rate_adjustment,
        pa1=pa1, pb0=pb0,
    )


def _sym_carry(ss: "Symsync"):
    # pll_v is carried as TWO [*batch] vectors, not one [*batch, 2] array:
    # a stacked minor-2 axis pads to 128 lanes on TPU (64x vreg waste on
    # every in-loop update; kernels/ROOFLINE.md round-5 notes)
    return (ss.b, ss.bf, ss.tau, ss.tau_decim, ss.rate, ss.delta,
            ss.decim_counter, ss.pll_v[..., 0], ss.pll_v[..., 1])


def _emit_sample(params, carry, x4, E: int, kf, vs=None):
    """Process ONE input sample of the symsync control loop (symsync.rs:230-266).

    ``x4``: [_PLANES, P, *batch] all-branch filter outputs for this sample,
    planes ordered (re·mf, im·mf, re·dmf, im·dmf) (or (re·mf, im·mf, q) in
    the 3-plane variant — see ``_PLANES``). ONE masked one-hot sum selects
    all planes at once. The P axis
    sits in SUBLANES and the batch in lanes
    (P-major): with the former [..., P]-minor layout every select op padded
    P=32 to 128 lanes (4x vreg waste), and the padded all-branch stream was
    4x the HBM traffic; P-major is dense and the sum over P lands directly
    in the natural [*batch] layout (kernels/ROOFLINE.md round-5 notes).
    Returns ``(carry', slots, pending)`` with ``slots`` a
    list of ``E`` tuples ``(yr, yi, active_f32)`` (matched-filter output / k
    and emission validity) and ``pending`` a bool flagging an E+1-th emission
    that would still be due this sample (deferred to the next input sample by
    the bounded unroll); the end-of-sample wrap is applied to the carry.
    """
    npfb = params["npfb"]
    pidx = params["pidx"]
    notlocked = params["notlocked"]
    (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1) = carry
    slots = []
    for _ in range(E):
        active = b < npfb
        if vs is not None:
            # valid-prefix streaming: an invalid sample neither emits nor
            # advances the loop — the state is exactly as if it was never
            # pushed (window carry handled by the caller's dynamic slice)
            active = active & vs
        bb = jnp.clip(b, 0, npfb - 1)
        oh = bb[None] == pidx  # one-hot branch select, [P, *batch]
        sel = jnp.sum(jnp.where(oh[None], x4, 0), axis=1)  # [planes, *batch]
        if x4.shape[0] == 4:  # legacy 4-plane stream (re·mf, im·mf, re·dmf, im·dmf)
            mr, mi, dr, di = sel[0], sel[1], sel[2], sel[3]
            q = jnp.clip(mr * dr + mi * di, -1.0, 1.0)
        else:
            mr, mi, q = sel[0], sel[1], sel[2]

        if params["k_out"] == 1:
            # statically elided counter: any active emission leaves dec = 1
            # (reset-to-0 then +1), and timing fires whenever dec was 1 —
            # i.e. on every active emission after the very first
            do_timing = (dec == 1) & active & notlocked
        else:
            do_timing = (dec == params["k_out"]) & active & notlocked
            dec = jnp.where((dec == params["k_out"]) & active, 0, dec)

        # q = clamp(Re(conj(mf)·dmf)) was folded into the precompute
        # DF2 loop filter, first-order by construction (see _sym_loop_params)
        v0 = q - params["pa1"] * pv0
        q_hat = params["pb0"] * v0
        rate_new = rate + params["radj"] * q_hat
        delta_new = rate_new + q_hat

        pv1 = jnp.where(do_timing, pv0, pv1)
        pv0 = jnp.where(do_timing, v0, pv0)
        rate = jnp.where(do_timing, rate_new, rate)
        delta = jnp.where(do_timing, delta_new, delta)
        tau_d = jnp.where(do_timing, tau, tau_d)

        if params["k_out"] == 1:
            dec = jnp.where(active, 1, dec)
        else:
            dec = jnp.where(active, dec + 1, dec)
        tau = jnp.where(active, tau + delta, tau)
        bf = jnp.where(active, tau * npfb, bf)
        b = jnp.where(active, jnp.round(bf).astype(jnp.int32), b)
        slots.append((
            jnp.where(active, mr / kf, 0.0),
            jnp.where(active, mi / kf, 0.0),
            active.astype(jnp.float32),
        ))

    pending = b < npfb  # an emission is still due (pre-wrap)
    # end-of-sample wrap (symsync.rs:261-263)
    if vs is None:
        tau = tau - 1.0
        bf = bf - npfb
        b = b - npfb
    else:
        pending = pending & vs
        tau = jnp.where(vs, tau - 1.0, tau)
        bf = jnp.where(vs, bf - npfb, bf)
        b = jnp.where(vs, b - npfb, b)
    return (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1), slots, pending


@struct.pytree
class Symsync:
    """Symbol synchronizer state (symsync.rs:8-30)."""

    k: int = struct.static_field()  # samples/symbol (input)
    k_out: int = struct.static_field()  # samples/symbol (output)
    npfb: int = struct.static_field()
    mf: jnp.ndarray = struct.field()  # [npfb, Lsub] matched filter (conv order)
    dmf: jnp.ndarray = struct.field()  # [npfb, Lsub] derivative bank
    # prebuilt [K, 128·2npfb] band matrix of concat(mf, dmf) for the
    # time-major all-branch precompute (built host-side at create;
    # in-graph construction is a ~2M-element gather per call)
    bank_g: jnp.ndarray = struct.field()
    window: jnp.ndarray = struct.field()  # [..., Lsub] shared input window
    # control state
    b: jnp.ndarray = struct.field()  # int32 filterbank index
    bf: jnp.ndarray = struct.field()
    tau: jnp.ndarray = struct.field()
    tau_decim: jnp.ndarray = struct.field()
    rate: jnp.ndarray = struct.field()
    delta: jnp.ndarray = struct.field()
    q_err: jnp.ndarray = struct.field()
    q_hat: jnp.ndarray = struct.field()
    decim_counter: jnp.ndarray = struct.field()
    # biquad loop filter (DF2 state + coefficients)
    pll_b: jnp.ndarray = struct.field()  # [3]
    pll_a: jnp.ndarray = struct.field()  # [3]
    pll_v: jnp.ndarray = struct.field()  # [..., 2]
    rate_adjustment: jnp.ndarray = struct.field()
    locked: jnp.ndarray = struct.field()

    # ------------------------------------------------------------------ ctors
    @classmethod
    def create(cls, k: int, m: int, h, batch_shape: tuple = (), dtype=jnp.complex64) -> "Symsync":
        """From prototype h with npfb=m branches (symsync.rs:37-110)."""
        if k < 2:
            raise ConfigError("samples/symbol must be at least 2")
        if m == 0:
            raise ConfigError("number of filters must be greater than 0")
        h = np.asarray(h, dtype=np.float64)
        h_len = len(h)
        if h_len == 0:
            raise ConfigError("filter length must be greater than 0")
        if (h_len - 1) % m != 0:
            raise ConfigError("filter length must be of the form: h_len = m*k + 1")
        npfb = m

        # derivative filter, circular centered difference (symsync.rs:58-76)
        dh = np.empty_like(h)
        dh[0] = h[1] - h[h_len - 1]
        dh[-1] = h[0] - h[h_len - 2]
        dh[1:-1] = h[2:] - h[:-2]
        hdh_max = np.max(np.abs(h * dh))
        dh *= 0.06 / hdh_max

        mf = pfb_decompose(h.astype(np.float32), npfb)
        dmf = pfb_decompose(dh.astype(np.float32), npfb)
        from ._conv import banded_branch_matrix

        bank_g = banded_branch_matrix(np.concatenate([mf, dmf], axis=0))

        obj = cls(
            k=k,
            k_out=1,
            npfb=npfb,
            mf=jnp.asarray(mf),
            dmf=jnp.asarray(dmf),
            bank_g=jnp.asarray(bank_g),
            window=jnp.zeros(batch_shape + (mf.shape[1],), dtype=jnp.dtype(dtype)),
            b=jnp.zeros(batch_shape, jnp.int32),
            bf=jnp.zeros(batch_shape, jnp.float32),
            tau=jnp.zeros(batch_shape, jnp.float32),
            tau_decim=jnp.zeros(batch_shape, jnp.float32),
            rate=jnp.full(batch_shape, float(k), jnp.float32),
            delta=jnp.full(batch_shape, float(k), jnp.float32),
            q_err=jnp.zeros(batch_shape, jnp.float32),
            q_hat=jnp.zeros(batch_shape, jnp.float32),
            decim_counter=jnp.zeros(batch_shape, jnp.int32),
            pll_b=jnp.zeros(3, jnp.float32),
            pll_a=jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
            pll_v=jnp.zeros(batch_shape + (2,), jnp.float32),
            rate_adjustment=jnp.zeros(batch_shape, jnp.float32),
            locked=jnp.full(batch_shape, False),
        )
        return obj.set_lf_bw(0.01)

    @classmethod
    def create_rnyquist(cls, ftype, k: int, m: int, beta: float, num_filters: int = 32, **kw):
        """Root-Nyquist matched filter bank (symsync.rs:112-131)."""
        if isinstance(ftype, str):
            ftype = design.FirFilterShape.from_str(ftype)
        if k < 2:
            raise ConfigError("samples/symbol must be at least 2")
        if m == 0:
            raise ConfigError("filter delay must be greater than 0")
        if beta < 0.0 or beta > 1.0:
            raise ConfigError("excess bandwidth factor must be in [0,1]")
        if num_filters == 0:
            raise ConfigError("number of filters must be greater than 0")
        h = design.fir_design_prototype(ftype, k * num_filters, m, beta, 0.0)
        return cls.create(k, num_filters, h, **kw)

    @classmethod
    def create_kaiser(cls, k: int, m: int, beta: float, num_filters: int = 32, **kw):
        """Kaiser lowpass bank (symsync.rs:133-158)."""
        if k < 2:
            raise ConfigError("samples/symbol must be at least 2")
        if m == 0:
            raise ConfigError("filter delay must be greater than 0")
        if beta <= 0.0 or beta > 1.0:
            raise ConfigError("excess bandwidth factor must be in [0,1]")
        h_len = 2 * num_filters * k * m + 1
        fc = 0.75
        h = design.fir_design_kaiser(h_len, fc / (k * num_filters), 40.0, 0.0)
        h = h * (2.0 * fc)
        return cls.create(k, num_filters, h, **kw)

    # ---------------------------------------------------------------- control
    def reset(self) -> "Symsync":
        return self.replace(
            window=jnp.zeros_like(self.window),
            b=jnp.zeros_like(self.b),
            bf=jnp.zeros_like(self.bf),
            tau=jnp.zeros_like(self.tau),
            tau_decim=jnp.zeros_like(self.tau_decim),
            rate=jnp.full_like(self.rate, self.k / self.k_out),
            delta=jnp.full_like(self.delta, self.k / self.k_out),
            q_err=jnp.zeros_like(self.q_err),
            q_hat=jnp.zeros_like(self.q_hat),
            decim_counter=jnp.zeros_like(self.decim_counter),
            pll_v=jnp.zeros_like(self.pll_v),
        )

    def lock(self) -> "Symsync":
        return self.replace(locked=jnp.ones_like(self.locked))

    def unlock(self) -> "Symsync":
        return self.replace(locked=jnp.zeros_like(self.locked))

    def set_output_rate(self, k_out: int) -> "Symsync":
        """Samples/symbol at the output (symsync.rs:186-194)."""
        if k_out == 0:
            raise ConfigError("output rate must be greater than 0")
        rate = self.k / k_out
        return self.replace(
            k_out=k_out,
            rate=jnp.full_like(self.rate, rate),
            delta=jnp.full_like(self.delta, rate),
        )

    def set_lf_bw(self, bandwidth: float) -> "Symsync":
        """Loop filter design (symsync.rs:196-213)."""
        if isinstance(bandwidth, (int, float)) and not 0.0 <= bandwidth <= 1.0:
            raise ConfigError("bandwidth must be in [0,1]")
        alpha = 1.0 - bandwidth
        beta = 0.22 * bandwidth
        a, bb = 0.5, 0.495
        a0 = 1.0 - a * alpha
        pll_b = jnp.asarray([beta / a0, 0.0, 0.0], jnp.float32)
        pll_a = jnp.asarray([1.0, -bb * alpha / a0, 0.0], jnp.float32)
        return self.replace(
            pll_b=pll_b,
            pll_a=pll_a,
            rate_adjustment=jnp.full_like(self.rate_adjustment, 0.5 * bandwidth),
        )

    def get_tau(self):
        return self.tau_decim

    # ------------------------------------------------------------- streaming
    def branch_outputs_4xP(self, x):
        """All-branch MF/dMF outputs, P-MAJOR [n, _PLANES, P, *batch].

        The PFB window contents don't depend on the timing feedback — only
        the branch *selection* does — so all-branch matched / derivative
        filter outputs are ONE dense banded MXU matmul over the block
        (multi_branch_conv_tm_pre against the prebuilt ``bank_g``). The banks
        are REAL taps, so re/im planes filter independently; planes come out
        ordered (re·mf, im·mf, re·dmf, im·dmf) so the scan body selects all
        four with a single one-hot masked sum (q = clamp(Re(mf*·dmf))
        computed in-body; the 3-plane precomputed-q variant measured slower,
        see ``_PLANES``). The branch axis P sits in
        SUBLANES with the batch in lanes: a [..., P]-minor layout pads P=32
        to 128 lanes, 4x-ing both the vreg count of every in-loop select op
        and the HBM stream of the materialized precompute (ROOFLINE round-5
        notes). Returns ``(xs, xa)``.
        """
        x = jnp.asarray(x, dtype=self.window.dtype)
        xa = jnp.concatenate([self.window, x], axis=-1)
        from ._conv import multi_branch_conv_tm_pre

        P = self.npfb
        planes = jnp.stack([jnp.real(xa[..., 1:]), jnp.imag(xa[..., 1:])])
        # [2, *batch, n, 2P] → [n, 2, 2P, *batch] → [n, 3, P, *batch]
        ytm = multi_branch_conv_tm_pre(
            planes, self.bank_g, 2 * P, self.mf.shape[1]
        )
        nb = ytm.ndim - 3  # batch rank
        perm = (nb + 1, 0, nb + 2) + tuple(range(1, nb + 1))
        t = jnp.transpose(ytm, perm)
        if _PLANES == 4:  # A/B switch: stream dMF planes, q in-body
            return jnp.concatenate([t[:, :, :P], t[:, :, P:]], axis=1), xa
        mr, dr = t[:, 0, :P], t[:, 0, P:]
        mi, di = t[:, 1, :P], t[:, 1, P:]
        q = jnp.clip(mr * dr + mi * di, -1.0, 1.0)
        xs3 = jnp.stack([mr, mi, q], axis=1)
        return xs3, xa

    def _execute_slots_pallas(self, x, E: int, n_valid, interpret: bool,
                              fused: bool = True):
        """Fused-kernel route (kernels/symscan.py): the whole control loop
        runs as ONE Mosaic program instead of per-op-dispatched scan body
        instructions (~10× on-chip; kernels/ROOFLINE.md round 4). When the
        shape allows (fused_ok), the MF/dMF dots run IN-KERNEL from the
        raw overlapped sample stream — no materialized all-branch
        precompute (685 vs 186 Msps at C=1024; ROOFLINE round-5 late
        findings). Values then differ from the XLA banded matmul by fp32
        summation order (~1 ULP); the precompute-streaming variant below
        stays bit-exact vs the XLA scan."""
        from ..kernels.symscan import fused_ok, symsync_scan

        x = jnp.asarray(x, dtype=self.window.dtype)
        n = x.shape[-1]
        C = self.b.shape[0]
        P = self.npfb
        L = self.mf.shape[1]
        if n_valid is not None:
            n_valid = jnp.asarray(n_valid, jnp.int32)
            x = jnp.where(jnp.arange(n) < n_valid, x, 0)
            vf = jnp.broadcast_to(
                (jnp.arange(n) < n_valid).astype(jnp.float32)[:, None], (n, C)
            )
        else:
            vf = jnp.ones((n, C), jnp.float32)

        xa = jnp.concatenate([self.window, x], axis=-1)
        if fused and fused_ok((C,), n, P, L, E):
            return self._slots_pallas_fused(xa, vf, n, C, E, n_valid,
                                            interpret)
        from ._conv import multi_branch_conv_tm_pre

        planes = jnp.stack([jnp.real(xa[..., 1:]), jnp.imag(xa[..., 1:])])
        ytm = multi_branch_conv_tm_pre(
            planes, self.bank_g, 2 * P, self.mf.shape[1]
        )  # [2, C, n, 2P] (lanes = [mf | dmf] per plane)
        # P-MAJOR [n, 4P, C]: sublane groups [re·mf | re·dmf | im·mf | im·dmf]
        # with channels in lanes (kernels/symscan.py layout note)
        xs4t = jnp.transpose(ytm, (2, 0, 3, 1)).reshape((n, 4 * P, C))

        state16, consts = self._kernel_state(C)
        ys, st9 = symsync_scan(
            xs4t, vf, state16, consts, P=P, E=E, k_out=self.k_out,
            interpret=interpret,
        )
        return self._kernel_finish(ys, st9, xa, n, E, n_valid)

    def _kernel_state(self, C: int):
        """Pack the control state / loop constants into [16, C] / [8, C]
        f32 rows for the Mosaic kernels (kernels/symscan.py layout)."""
        f32 = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
        state16 = jnp.concatenate([
            jnp.stack([
                f32(self.b), self.bf, self.tau, self.tau_decim, self.rate,
                self.delta, f32(self.decim_counter),
                self.pll_v[..., 0], self.pll_v[..., 1],
            ]),
            jnp.zeros((7, C), jnp.float32),
        ])
        bc = lambda v: jnp.broadcast_to(f32(v), (C,))  # noqa: E731
        consts = jnp.stack([
            bc(self.locked), bc(self.rate_adjustment), bc(self.pll_a[1]),
            bc(self.pll_b[0]), bc(1.0 / self.k),
            jnp.zeros(C), jnp.zeros(C), jnp.zeros(C),
        ])
        return state16, consts

    def _kernel_finish(self, ys, st9, xa, n: int, E: int, n_valid):
        """Unpack kernel outputs/state back into the public slot API."""
        packed = jnp.transpose(ys, (2, 0, 1))  # [C, n, 3E]
        if n_valid is None:
            new_window = xa[..., n:]
        else:
            new_window = jax.lax.dynamic_slice_in_dim(
                xa, jnp.clip(n_valid, 0, n), self.window.shape[-1], axis=-1
            )
        new = self.replace(
            window=new_window,
            b=st9[0].astype(jnp.int32), bf=st9[1], tau=st9[2],
            tau_decim=st9[3], rate=st9[4], delta=st9[5],
            decim_counter=st9[6].astype(jnp.int32),
            pll_v=jnp.stack([st9[7], st9[8]], axis=-1),
        )
        y_slots = jax.lax.complex(packed[..., :E], packed[..., E : 2 * E])
        if not jnp.issubdtype(jnp.dtype(self.window.dtype), jnp.complexfloating):
            y_slots = packed[..., :E]
        v_slots = packed[..., 2 * E :] > 0.5
        return y_slots, v_slots, new

    def _slots_pallas_fused(self, xa, vf, n: int, C: int, E: int, n_valid,
                            interpret: bool):
        """In-kernel-MF route: the matched/derivative filter dots run
        inside the Mosaic program from the raw overlapped sample stream
        (kernels/symscan.symsync_scan_fused) — the 2 GB/block all-branch
        precompute never materializes. MF values differ from the XLA
        banded matmul only by fp32 summation order (~1 ULP)."""
        from ..kernels.symscan import symsync_scan_fused

        P = self.npfb
        L = self.mf.shape[1]
        lpad = -(-L // 8) * 8
        # time-major raw planes incl. history, zero right-pad to n + lpad
        pad = (n + lpad) - (xa.shape[-1] - 1)
        xt_r = jnp.pad(jnp.real(xa[..., 1:]).T, [(0, pad), (0, 0)])
        xt_i = jnp.pad(jnp.imag(xa[..., 1:]).T, [(0, pad), (0, 0)])
        # g2[i, j] = bank[i, L-1-j]: y[t, i] = Σ_j g2[i, j]·x[t + j]
        g2 = jnp.concatenate([self.mf, self.dmf], axis=0)[:, ::-1]
        g2 = jnp.pad(g2, [(0, 0), (0, lpad - L)])
        state16, consts = self._kernel_state(C)
        ys, st9 = symsync_scan_fused(
            xt_r, xt_i, vf, state16, consts, g2, P=P, E=E,
            k_out=self.k_out, interpret=interpret,
        )
        return self._kernel_finish(ys, st9, xa, n, E, n_valid)

    def execute_slots(
        self, x, samples_per_step: int | None = None,
        max_emit: int | None = None, n_valid=None, backend: str = "auto",
    ) -> tuple[jnp.ndarray, jnp.ndarray, "Symsync"]:
        """Synchronize a block; raw emission-slot output (symsync.rs:219-266).

        Returns ``(y_slots, valid, state)`` with ``y_slots``/``valid`` shaped
        ``[..., N, max_emit]`` (default: the k-aware :func:`_auto_emit`
        capacity — 2 slots for k=2/k_out=1). Per input step the
        valid slots form a dense prefix (emissions stop once the filterbank
        index leaves the bank), so ``valid[..., t, e] ⇒ valid[..., t, e-1]``.

        TPU formulation: all-branch filter outputs precomputed as one banded
        MXU matmul (:meth:`branch_outputs_4xP`); the sequential lax.scan is a
        tiny gather-free control loop (one-hot branch select + biquad loop
        filter). ``samples_per_step`` input samples are packed into each scan
        step (default 1; S must divide the block length) — the while-loop
        fixed cost per step (~1.5 µs on this toolchain) dominates the body
        work, so packing amortizes it across S samples. The per-sample slot
        output is identical for any S.

        Scan-boundary dtype rules for the production TPU toolchain (measured,
        kernels/ROOFLINE.md "feedback-scan boundary rules"): complex or bool
        or int leaves in the scan's xs/ys, complex in the carry, or ys being
        a TUPLE of arrays each executes >1000× slow. Hence: planar f32 xs,
        real/int carry, and ONE packed f32 ys array per step.
        """
        x = jnp.asarray(x, dtype=self.window.dtype)
        n = x.shape[-1]
        kf = jnp.float32(self.k)
        E = _auto_emit(self.k, self.k_out) if max_emit is None else max_emit
        S = 1 if samples_per_step is None else samples_per_step
        if n % S != 0:
            raise ConfigError("samples_per_step must divide the block length")
        bs = self.b.shape
        if len(bs) == 1 and 0 < bs[0] < 8:
            # C < 8 lanes compiles the scan body to near-scalar ops (C=1
            # measured 6x the C=4 latency — utils/smallbatch.py); run at 8
            # edge-replicated channels and slice back
            from ..utils.smallbatch import pad_fields, take_fields

            C = bs[0]
            padded = pad_fields(self, _BATCH_FIELDS, 8 - C)
            xp = jnp.pad(x, [(0, 8 - C), (0, 0)], mode="edge")
            y, v, new = padded.execute_slots(
                xp, samples_per_step=samples_per_step, max_emit=max_emit,
                n_valid=n_valid, backend=backend,
            )
            return y[:C], v[:C], take_fields(new, _BATCH_FIELDS, C)
        if backend in ("auto", "pallas", "fused") and S == 1:
            # Mosaic scan kernels (kernels/symscan.py): "auto" on real TPU
            # picks the in-kernel-MF fused variant when the shape allows
            # (686 Msps at C=1024 vs 186 for the precompute-streaming
            # variant and 111 for the XLA scan — ROOFLINE round 5; MF
            # values reassociate vs the XLA banded matmul, ~1 ULP), else
            # the precompute-streaming variant (bit-exact vs the XLA
            # scan). backend="pallas" forces the bit-exact streaming
            # variant, "fused" the in-kernel-MF one (interpret mode
            # off-TPU, for tests); other backends use the XLA scan.
            from ..kernels.symscan import pallas_ok

            plat = jax.devices()[0].platform
            on_tpu = plat in ("tpu", "axon")
            if backend in ("pallas", "fused") or on_tpu:
                if pallas_ok(tuple(self.b.shape), n, self.npfb, E):
                    return self._execute_slots_pallas(
                        x, E, n_valid, interpret=not on_tpu,
                        fused=backend != "pallas",
                    )
                C = self.b.shape[0] if self.b.ndim == 1 else 0
                if C >= 8 and C % 128 != 0:
                    # the kernel needs lane-aligned C (C % 128 == 0), but
                    # channels are independent: edge-pad the batch to the
                    # next lane boundary, run the kernel, slice back. Even
                    # at ~2x padded waste the kernel is 4-5x the XLA scan
                    # (C=64: 35.9 Msps scan vs the kernel's ~0.9 us/step;
                    # per-channel results are lane-parallel, so the real
                    # channels are unaffected by the pad channels)
                    Cp = -(-C // 128) * 128
                    if pallas_ok((Cp,), n, self.npfb, E):
                        from ..utils.smallbatch import pad_fields, take_fields

                        padded = pad_fields(self, _BATCH_FIELDS, Cp - C)
                        xp = jnp.pad(x, [(0, Cp - C), (0, 0)], mode="edge")
                        y, v, new = padded.execute_slots(
                            xp, max_emit=E, n_valid=n_valid, backend=backend)
                        return y[:C], v[:C], take_fields(
                            new, _BATCH_FIELDS, C)
                if C >= 256 and C % 256 == 0 and pallas_ok(
                    (C // 2,), n, self.npfb, E
                ):
                    # channels are independent: a batch past the kernel's
                    # VMEM budget splits into two half-batch kernel calls
                    # with BITWISE-identical results (C=2048 measured 124
                    # Msps on the XLA fallback vs ~500 split)
                    from ..utils.smallbatch import take_fields

                    h = C // 2
                    lo = take_fields(self, _BATCH_FIELDS, h)
                    hi = self.replace(**{
                        nm: getattr(self, nm)[h:] for nm in _BATCH_FIELDS
                    })
                    y1, v1, s1 = lo.execute_slots(
                        x[:h], max_emit=E, n_valid=n_valid, backend=backend)
                    y2, v2, s2 = hi.execute_slots(
                        x[h:], max_emit=E, n_valid=n_valid, backend=backend)
                    merged = self.replace(**{
                        nm: jnp.concatenate(
                            [getattr(s1, nm), getattr(s2, nm)], axis=0)
                        for nm in _BATCH_FIELDS
                    })
                    return (jnp.concatenate([y1, y2], axis=0),
                            jnp.concatenate([v1, v2], axis=0), merged)
        if n_valid is not None:
            # valid-prefix streaming (variable-rate upstream, e.g. an
            # arbitrary-rate msresamp): only the first n_valid samples of
            # the fixed-capacity buffer are consumed. n_valid is a SCALAR
            # shared across the batch (per-channel counts would need a
            # per-channel window gather).
            n_valid = jnp.asarray(n_valid, jnp.int32)
            x = jnp.where(jnp.arange(n) < n_valid, x, 0)

        xs4, xa = self.branch_outputs_4xP(x)
        # [n, 4, ..., P] → [n/S, S, 4, ..., P]. The barrier forces the
        # precompute to MATERIALIZE before the scan — otherwise XLA fuses it
        # into the loop and every iteration strides across the whole time
        # axis (measured ~70 ms/block vs ~15 ms materialized).
        xs4 = jax.lax.optimization_barrier(
            xs4.reshape((n // S, S) + xs4.shape[1:])
        )
        params = _sym_loop_params(self)
        if n_valid is None:
            xs = xs4
        else:
            vf = (jnp.arange(n) < n_valid).astype(jnp.float32)
            xs = (xs4, jax.lax.optimization_barrier(
                vf.reshape((n // S, S))))

        def step(carry, inp):
            x4s, vfs = (inp, None) if n_valid is None else inp
            packs = []
            for s in range(S):
                vs = None if vfs is None else vfs[s] > 0.5
                carry, slots, _ = _emit_sample(
                    params, carry, x4s[s], E, kf, vs=vs
                )
                ys_r, ys_i, valids = zip(*slots)
                # ONE f32 ys, SLOT-MAJOR [3E, *batch] (slots in sublanes,
                # batch in lanes): a [*batch, 3E] ys pads 3E=6 lanes to 128
                # and the scan's per-step output write becomes ~21x padded
                # (~2 GB/block at C=1024 — round-5 fix)
                packs.append(jnp.stack(list(ys_r + ys_i + valids), axis=0))
            return carry, (jnp.stack(packs, axis=0) if S > 1 else packs[0])

        # unroll 4: measured optimum for the P-major body (round-5 sweep:
        # 101/97/82/55 Msps at unroll 4/8/16/32, C=1024)
        carry, packed = jax.lax.scan(
            step, _sym_carry(self), xs, unroll=max(1, 4 // S)
        )
        (b, bf, tau, tau_d, rate, delta, dec, pv0, pv1) = carry
        pv = jnp.stack([pv0, pv1], axis=-1)

        if n_valid is None:
            new_window = xa[..., n:]
        else:
            # window = the Lsub samples ending at the last VALID sample
            new_window = jax.lax.dynamic_slice_in_dim(
                xa, jnp.clip(n_valid, 0, n), self.window.shape[-1], axis=-1
            )
        new = self.replace(
            window=new_window, b=b, bf=bf, tau=tau, tau_decim=tau_d,
            rate=rate, delta=delta, decim_counter=dec, pll_v=pv,
        )
        if S > 1:  # [n/S, S, 3E, *batch] → [n, 3E, *batch]
            packed = packed.reshape((n,) + packed.shape[2:])
        # [n, 3E, *batch] → [*batch, n, 3E] (one materialized transpose,
        # vs a 21x-padded write on every scan step in the [., 3E]-minor form)
        packed = jnp.transpose(
            packed, tuple(range(2, packed.ndim)) + (0, 1)
        )
        y_slots = jax.lax.complex(packed[..., :E], packed[..., E : 2 * E])
        if not jnp.issubdtype(jnp.dtype(self.window.dtype), jnp.complexfloating):
            y_slots = packed[..., :E]
        v_slots = packed[..., 2 * E :] > 0.5
        return y_slots, v_slots, new

    def execute(self, x) -> tuple[jnp.ndarray, jnp.ndarray, "Symsync"]:
        """Synchronize a block (symsync.rs:219-266).

        Returns (y, num_output, state): y has capacity N·E (E the per-sample
        emission capacity, :func:`_auto_emit`) with the valid outputs
        compacted to the front.
        """
        from ..utils.compact import compact_valid

        x = jnp.asarray(x)
        n = x.shape[-1]
        yt, vt, new = self.execute_slots(x)
        E = yt.shape[-1]
        # [..., N, E] → flatten and compact valid entries to the front
        y = yt.reshape(x.shape[:-1] + (n * E,))
        v = vt.reshape(x.shape[:-1] + (n * E,))
        y, num_output = compact_valid(y, v)
        return y, num_output, new

    __call__ = execute
