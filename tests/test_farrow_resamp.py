"""Arbitrary-rate Farrow fast path (filter/_farrow_resamp.py).

The TPU production mode for truly-arbitrary rates: prototype-FIR on a 2x
half-integer grid + LS-designed polynomial interpolator evaluated at the
exact u32 emission times. The emission SCHEDULE (counts, carried phase,
window state) is bit-identical to the reference u32 gather path; VALUES
agree within the reference's own 1/256 branch-quantization floor
(resamp.rs:141-154 truncates the fractional phase to 256 branch offsets,
~ -45 dB; the farrow design error is <= -55 dB over every legal fc).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.filter import MsResamp, Resamp
from yagi_tpu.filter._farrow_resamp import farrow_design_error_db

from autotest import autotest

RATES = [0.7153, 0.37]
RATES_SLOW = [1.31719, 2.0013, 0.9871, 3.14159]


def _bandlimited(n, seed=0, fmax=0.23):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    fs = np.linspace(0.01, fmax, 6)
    return (sum(np.exp(2j * np.pi * (f * t + rng.random())) for f in fs)
            / len(fs)).astype(np.complex64)


def _snr_db(ref, got):
    err = ref - got
    return 10 * np.log10(
        np.mean(np.abs(ref) ** 2) / max(np.mean(np.abs(err) ** 2), 1e-30)
    )


class TestFarrowResamp:
    def test_design_error_below_branch_floor(self):
        # the interpolator must sit below the reference's own -45 dB
        # 1/256-branch rounding floor over the half-grid band
        assert farrow_design_error_db() < -50.0

    @pytest.mark.parametrize(
        "rate", RATES + [pytest.param(r, marks=pytest.mark.slow)
                         for r in RATES_SLOW])
    @autotest("resamp_crcf_00")
    def test_schedule_bit_identical_values_close(self, rate):
        """Counts, phase, and window state match the u32 path exactly;
        values within the quantization floor."""
        x = _bandlimited(4096, seed=int(rate * 100))
        ra = Resamp.create(rate)
        rb = Resamp.create(rate, interp="farrow")
        ya, na, ra2 = ra.execute_block(jnp.asarray(x))
        yb, nb, rb2 = rb.execute_block(jnp.asarray(x))
        assert int(na) == int(nb)
        assert int(np.asarray(ra2.phase)) == int(np.asarray(rb2.phase))
        np.testing.assert_array_equal(
            np.asarray(ra2.window), np.asarray(rb2.window)
        )
        na = int(na)
        sl = slice(64, na - 64)
        snr = _snr_db(np.asarray(ya)[:na][sl], np.asarray(yb)[:nb][sl])
        assert snr > 45.0, snr

    def test_block_split_tolerance(self):
        """Split-invariant within the interpolation tolerance: boundary
        emissions use the exact reference dotprod (no future inputs), so
        the two runs differ only at the quantization-noise level."""
        x = _bandlimited(8192, seed=3)
        rb = MsResamp.create(0.7153, arbitrary_interp="farrow").arbitrary
        y1, n1, rb = rb.execute_block(jnp.asarray(x[:4096]))
        y2, n2, rb = rb.execute_block(jnp.asarray(x[4096:]))
        split = np.concatenate(
            [np.asarray(y1)[: int(n1)], np.asarray(y2)[: int(n2)]]
        )
        rc = Resamp.create(0.7153, fc=rb.fc, interp="farrow")
        yc, nc, _ = rc.execute_block(jnp.asarray(x))
        whole = np.asarray(yc)[: int(nc)]
        assert len(split) == len(whole)
        assert _snr_db(whole, split) > 40.0

    def test_high_cutoff(self):
        """MsResamp's arbitrary stage runs fc up to 0.49 — the 2x grid
        keeps the farrow band ≤ 0.25 so accuracy holds."""
        x = _bandlimited(4096, seed=5, fmax=0.42)
        ra = Resamp.create(0.93, fc=0.47)
        rb = Resamp.create(0.93, fc=0.47, interp="farrow")
        ya, na, _ = ra.execute_block(jnp.asarray(x))
        yb, nb, _ = rb.execute_block(jnp.asarray(x))
        na = int(na)
        snr = _snr_db(np.asarray(ya)[64: na - 64], np.asarray(yb)[64: na - 64])
        assert snr > 42.0, snr

    @pytest.mark.parametrize("rate", [0.37, 2.5, 0.9871])
    @autotest("msresamp_crcf_01")
    def test_msresamp_farrow(self, rate):
        """Full composite resampler with the farrow arbitrary stage."""
        x = _bandlimited(4096, seed=int(rate * 7), fmax=0.2)
        ma = MsResamp.create(rate)
        mb = MsResamp.create(rate, arbitrary_interp="farrow")
        ya, na, _ = ma.execute_block(jnp.asarray(x))
        yb, nb, _ = mb.execute_block(jnp.asarray(x))
        assert int(na) == int(nb)
        na = int(na)
        if na > 200:
            sl = slice(80, na - 80)
            snr = _snr_db(np.asarray(ya)[:na][sl], np.asarray(yb)[:na][sl])
            assert snr > 40.0, snr

    def test_invalid_interp(self):
        with pytest.raises(ConfigError):
            Resamp.create(0.7, interp="nope")

    def test_farrow_under_jit_streaming(self):
        """The fast path must stay active under jit with threaded state
        (the step certificate is a static pytree field)."""
        x = _bandlimited(2048, seed=9)
        r = Resamp.create(1.234, interp="farrow")
        step = jax.jit(lambda s, v: s.execute_block(v, out_capacity=2600))
        tot = 0
        for k in range(3):
            y, n, r = step(r, jnp.asarray(x))
            tot += int(n)
        assert tot == Resamp.create(1.234).get_num_output(3 * 2048)
