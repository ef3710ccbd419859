"""QAM receiver / symbol tracker chain.

Fills the reference's 0-byte framing stub (src/framing/symtrack.rs) and
packages BASELINE config[3] ("16-QAM rx with EVM"). Follows liquid's
symtrack_cccf composition: AGC → polyphase symbol synchronizer (2
samples/symbol out) → decision-directed LMS equalizer → carrier-phase PLL →
hard-decision demod, with running EVM.

The whole pipeline is one pytree with a jittable ``step``: the symsync emits
a fixed-capacity, front-compacted buffer with a valid count, and the
eq/carrier stage scans that capacity gating every state update on validity —
so the chain is block-split invariant and shape-static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..agc import Agc
from ..design import FirFilterShape
from ..equalization import Eqlms
from ..errors import ConfigError
from ..filter import Symsync
from ..modem import Modem

__all__ = ["QamRx"]


def _tree_where(pred, a, b):
    """Per-leaf select with trailing-dim broadcast of a batch-shaped pred."""

    def sel(x, y):
        nd = getattr(x, "ndim", 0)
        shape = getattr(x, "shape", ())
        if nd < pred.ndim or shape[: pred.ndim] != pred.shape:
            # leaf carries no batch dims (shared constant, e.g. the
            # equalizer's h0 reference taps): identical in both branches,
            # so per-batch selection is a no-op
            return x
        p = pred.reshape(pred.shape + (1,) * (nd - pred.ndim))
        return jnp.where(p, x, y)

    return jax.tree_util.tree_map(sel, a, b)


@struct.pytree
class QamRx:
    """agc → symsync → eqlms → carrier PLL → demod (symtrack semantics)."""

    k: int = struct.static_field()  # input samples/symbol
    k_eq: int = struct.static_field()  # samples/symbol into the equalizer (2)
    agc: Agc = struct.field()
    symsync: Symsync = struct.field()
    eq: Eqlms = struct.field()
    table: jnp.ndarray = struct.field()  # constellation points
    alpha: jnp.ndarray = struct.field()  # PLL proportional gain
    beta: jnp.ndarray = struct.field()  # PLL integral gain
    theta: jnp.ndarray = struct.field()  # carrier phase
    dtheta: jnp.ndarray = struct.field()  # carrier frequency
    sym_phase: jnp.ndarray = struct.field()  # int32 mod k_eq
    evm_accum: jnp.ndarray = struct.field()
    evm_count: jnp.ndarray = struct.field()
    # symsync outputs beyond the equalizer-scan capacity ever dropped
    # (should stay 0; nonzero flags a sustained timing-rate transient
    # exceeding the 25% headroom — see step())
    overflow_count: jnp.ndarray = struct.field()
    # emission slots per input step in the fused scan (each slot carries a
    # full eq/carrier update). 2 covers acquisition transients exactly;
    # slots=1 halves the scan body but measurably defers during
    # acquisition (overflow_count ≫ 0) — keep 2 unless the stream is known
    # pre-locked
    slots: int = struct.static_field(default=2)

    @classmethod
    def create(
        cls,
        ftype: str = "rrcos",
        k: int = 2,
        m: int = 7,
        beta: float = 0.3,
        scheme: str = "qam16",
        eq_len: int = 7,
        eq_bw: float = 0.02,
        pll_bw: float = 0.02,
        batch_shape: tuple = (),
        slots: int = 2,
    ) -> "QamRx":
        if k < 2:
            raise ConfigError("samples/symbol must be at least 2")
        if not 0.0 < beta <= 1.0:
            raise ConfigError("filter excess bandwidth must be in (0, 1]")
        if eq_len % 2 == 0:
            raise ConfigError("equalizer length must be odd")
        modem = Modem.create(scheme)
        if isinstance(ftype, str):
            ftype = FirFilterShape.from_str(ftype)
        ss = Symsync.create_rnyquist(
            ftype, k, m, beta, batch_shape=batch_shape
        ).set_output_rate(2)
        # identity init: the symsync already matched-filters, so the eq
        # starts as a pure (eq_len-1)/2-sample delay and learns residual ISI
        eq = Eqlms.create(h_len=eq_len, batch_shape=batch_shape).set_bw(eq_bw)
        z = jnp.zeros(batch_shape, dtype=jnp.float32)
        return cls(
            k=k,
            k_eq=2,
            # narrow AGC: wide loops track the QAM envelope itself and
            # distort the constellation (~12 dB EVM penalty at bw=0.02)
            agc=Agc.create(batch_shape=batch_shape).set_bandwidth(1e-3),
            symsync=ss,
            eq=eq,
            table=modem.table,
            alpha=jnp.asarray(pll_bw, dtype=jnp.float32),
            beta=jnp.asarray(0.5 * pll_bw * pll_bw, dtype=jnp.float32),
            theta=z,
            dtheta=z,
            # the eq's initial lowpass delays by (eq_len-1)/2 samples; start
            # the symbol-phase counter so instants line up at the eq OUTPUT
            sym_phase=jnp.full(batch_shape, (-((eq_len - 1) // 2)) % 2, jnp.int32),
            evm_accum=z,
            evm_count=z,
            overflow_count=jnp.zeros(batch_shape, dtype=jnp.int32),
            slots=slots,
        )

    def reset(self) -> "QamRx":
        z = jnp.zeros_like(self.theta)
        return self.replace(
            agc=self.agc.reset(),
            symsync=self.symsync.reset(),
            eq=self.eq.reset(),
            theta=z,
            dtheta=z,
            sym_phase=jnp.full_like(
                self.sym_phase, (-((self.eq.h_len - 1) // 2)) % 2
            ),
            evm_accum=z,
            evm_count=z,
            overflow_count=jnp.zeros_like(self.overflow_count),
        )

    def set_bandwidth(self, pll_bw: float) -> "QamRx":
        """Carrier-loop bandwidth (symtrack set_bandwidth semantics)."""
        if isinstance(pll_bw, (int, float)) and pll_bw < 0.0:
            raise ConfigError("bandwidth must be non-negative")
        bw = jnp.asarray(pll_bw, dtype=jnp.float32)
        return self.replace(alpha=bw, beta=0.5 * bw * bw)

    def get_evm(self):
        """Running EVM in dB over all demodulated symbols."""
        ms = self.evm_accum / jnp.maximum(self.evm_count, 1.0)
        return 10.0 * jnp.log10(jnp.maximum(ms, 1e-12))

    def step_masked(self, x, samples_per_step: int | None = None):
        """Process one block; masked (uncompacted) outputs.

        Returns ``(syms, soft, mask, chain)`` with ``syms``/``soft``/``mask``
        shaped ``[..., 2·N]`` (two symsync emission slots per input step, in
        stream order); entries where ``mask`` is False are padding. This is
        the compaction-free fast path — :meth:`step` wraps it with
        front-compaction for the symtrack-style API.

        TPU formulation (round 4): ONE fused lax.scan runs the symsync
        timing loop AND the eq/carrier loop together — the symsync emission
        slots feed the equalizer inside the same step, eliminating the
        second scan's per-step fixed cost (~1.5 µs on this toolchain) and
        the [..., 2N] intermediate round-trip through HBM. The AGC stays a
        separate (packed) scan: its gain feedback precedes the matched
        filter, which is what makes the all-branch MXU precompute legal.

        The symsync at ``k_out = 2`` emits ≤ 1 symbol-rate sample per input
        in steady state; two slots absorb timing transients. When a third
        emission would be pending within one input step (rate < ½ nominal —
        pathological), it is deferred to the next step by the bounded
        emission unroll and counted in ``chain.overflow_count``.
        """
        from ..filter.symsync import _emit_sample, _sym_carry, _sym_loop_params
        from ..utils.planar import loop_constants, planarize, unplanarize

        x = jnp.asarray(x)
        n = x.shape[-1]
        E = self.slots
        S = 1 if samples_per_step is None else samples_per_step
        y0, agc = self.agc.execute_block(x)
        ss = self.symsync
        kf = jnp.float32(ss.k)
        xs4, xa = ss.branch_outputs_4xP(y0)
        # [n, 4, ..., P] → [n/S, S, 4, ..., P]; barrier: in-graph xs
        # otherwise get re-derived inside every loop iteration
        xs4 = jax.lax.optimization_barrier(
            xs4.reshape((n // S, S) + xs4.shape[1:])
        )
        sparams = _sym_loop_params(ss)

        # loop-invariant PLL gains and constellation planes materialized
        # outside the scan (in-body input-derived scalars get sunk into
        # every iteration; utils.loop_constants)
        alpha_v, beta_v = loop_constants(self.alpha, self.beta, like=self.theta)
        table_r, table_i = jax.lax.optimization_barrier(
            (jnp.real(self.table), jnp.imag(self.table))
        )

        def eq_slot(carry, xi_r, xi_i, vi):
            """One emission slot through eq + carrier PLL (masked on vi)."""
            eq, theta, dtheta, sph, eacc, ecnt = carry
            xi = jax.lax.complex(xi_r, xi_i)
            eq_p = eq.push(xi)
            y = eq_p.execute()
            is_sym = vi & (sph == 0)
            # gate adaptation on healthy buffer energy: the normalized-LMS
            # step divides by x2_sum, which explodes on the symsync warm-up
            # transient (liquid symtrack gates via acquire states instead)
            can_adapt = is_sym & (eq_p.x2_sum > 0.5 * self.eq.h_len)

            vs = y * jnp.exp(-1j * theta).astype(y.dtype)
            vs_r, vs_i = jnp.real(vs), jnp.imag(vs)
            d2 = (vs_r[..., None] - table_r) ** 2 + (vs_i[..., None] - table_i) ** 2
            s = jnp.argmin(d2, axis=-1).astype(jnp.uint32)
            # one-hot constellation select: per-channel dynamic gathers are
            # scalar-unit-bound on TPU (kernels/ROOFLINE.md)
            oh = s[..., None] == jnp.arange(table_r.shape[0], dtype=jnp.uint32)
            sr = jnp.sum(jnp.where(oh, table_r, 0), axis=-1)
            si = jnp.sum(jnp.where(oh, table_i, 0), axis=-1)
            shat = jax.lax.complex(sr, si)

            pe = (vs_i * sr - vs_r * si) / jnp.maximum(sr * sr + si * si, 1e-12)
            theta_n = theta + dtheta + alpha_v * pe
            dtheta_n = dtheta + beta_v * pe
            d_train = shat * jnp.exp(1j * theta).astype(y.dtype)
            eq_u = eq_p.step(d_train, y)

            # explicit per-field selects (cheaper than a generic tree_where
            # over every leaf twice — scan-body op count is the measured
            # bottleneck, kernels/ROOFLINE.md round 4): push() touches only
            # buffer/x2/x2_sum/count (gated on vi), step() only w (gated on
            # can_adapt)
            vi_c = vi[..., None]
            eq = eq.replace(
                w=jnp.where(can_adapt[..., None], eq_u.w, eq.w),
                buffer=jnp.where(vi_c, eq_p.buffer, eq.buffer),
                x2=jnp.where(vi_c, eq_p.x2, eq.x2),
                x2_sum=jnp.where(vi, eq_p.x2_sum, eq.x2_sum),
                count=jnp.where(vi, eq_p.count, eq.count),
            )
            theta = jnp.where(can_adapt, theta_n, theta)
            dtheta = jnp.where(can_adapt, dtheta_n, dtheta)
            sph = jnp.where(vi, (sph + 1) % self.k_eq, sph)
            eacc = jnp.where(can_adapt, eacc + jnp.abs(vs - shat) ** 2, eacc)
            ecnt = jnp.where(can_adapt, ecnt + 1.0, ecnt)
            # per-slot f32 lanes: [sym, re(vs), im(vs), is_sym]
            lanes = [s.astype(jnp.float32), jnp.real(vs), jnp.imag(vs),
                     is_sym.astype(jnp.float32)]
            return (eq, theta, dtheta, sph, eacc, ecnt), lanes

        def body(carry, inp):
            sym_c, eq_cp, ovf = carry
            eq_c = unplanarize(eq_cp)
            packs = []
            for s in range(S):
                sym_c, slots, pending = _emit_sample(sparams, sym_c, inp[s], E, kf)
                lanes = []
                for (yr, yi, vf) in slots:
                    eq_c, slot_lanes = eq_slot(eq_c, yr, yi, vf > 0.5)
                    lanes += slot_lanes
                # deferred third emission this input step (see docstring)
                ovf = ovf + pending.astype(jnp.int32)
                packs.append(jnp.stack(lanes, axis=-1))  # [..., 4E]
            packed = jnp.stack(packs, axis=-2) if S > 1 else packs[0]
            return (sym_c, planarize(eq_c), ovf), packed

        eq_carry0 = (
            self.eq, self.theta, self.dtheta, self.sym_phase,
            self.evm_accum, self.evm_count,
        )
        carry0 = (_sym_carry(ss), planarize(eq_carry0),
                  jnp.zeros_like(self.overflow_count))
        carry, packed = jax.lax.scan(body, carry0, xs4, unroll=max(1, 4 // S))
        sym_c, eq_cp, overflow = carry
        (b, bf, tau, tau_d, rate, delta, dec, pv) = sym_c
        eq, theta, dtheta, sph, eacc, ecnt = unplanarize(eq_cp)

        if S > 1:  # [n/S, ..., S, 4E] → [..., 2N, 4]
            packed = jnp.moveaxis(packed, 0, -3)
            packed = packed.reshape(packed.shape[:-3] + (n * E, 4))
        else:
            packed = jnp.moveaxis(packed, 0, -2)
            packed = packed.reshape(packed.shape[:-2] + (n * E, 4))
        syms = packed[..., 0].astype(jnp.uint32)
        soft = jax.lax.complex(packed[..., 1], packed[..., 2])
        mask = packed[..., 3] > 0.5

        ss_new = ss.replace(
            window=xa[..., n:], b=b, bf=bf, tau=tau, tau_decim=tau_d,
            rate=rate, delta=delta, decim_counter=dec, pll_v=pv,
        )
        new = self.replace(
            agc=agc, symsync=ss_new, eq=eq, theta=theta, dtheta=dtheta,
            sym_phase=sph, evm_accum=eacc, evm_count=ecnt,
            overflow_count=self.overflow_count + overflow,
        )
        return syms, soft, mask, new

    def step(self, x):
        """Process one block (symtrack-style compacted API).

        Returns ``(syms, soft, num_syms, chain)``: ``syms`` (uint32) and
        ``soft`` (complex, carrier-corrected equalizer output) have capacity
        ``2·N`` entries compacted to the front; ``num_syms`` counts the
        valid ones. Emissions beyond 2 per input step are deferred and
        counted in ``chain.overflow_count`` (see :meth:`step_masked`).
        """
        from ..utils.compact import compact_valid

        syms, soft, mask, new = self.step_masked(x)
        soft, num_syms = compact_valid(soft, mask)
        syms, _ = compact_valid(syms, mask)
        return syms, soft, num_syms, new

    __call__ = step
