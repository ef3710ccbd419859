"""Conformance tests: fftfilt (golden), halfband/rational/multi-stage
resamplers, Hilbert transforms, fractional delay, ordfilt, LPC.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.autotest import autotest
from yagi_tpu.errors import ConfigError
from yagi_tpu.filter import (
    Fdelay,
    FftFilt,
    FirFilter,
    FirHilbertFilter,
    IirDecimationFilter,
    IirHilbertFilter,
    IirInterpolationFilter,
    MsResamp,
    MsResamp2,
    OrdFilt,
    Resamp2,
    Rresamp,
    design_lpc,
    levinson,
)
from yagi_tpu.utils import PsdRegion, validate_psd_signal

from golden_util import load


class TestFftFilt:
    @autotest(param_map={
        f"[{c}-{v}]": f"fftfilt_{v.lower()}_data_{c.lower()}"
        for v in ("RRRF", "CRCF", "CCCF")
        for c in ("H4X256", "H7X256", "H13X256", "H23X256")})
    @pytest.mark.parametrize("variant", ["RRRF", "CRCF", "CCCF"])
    @pytest.mark.parametrize("case", ["H4X256", "H7X256", "H13X256", "H23X256"])
    def test_golden(self, variant, case):
        """Reference golden vectors (filter/test_data.rs) at n=64 block size
        (the reference test uses fftfilt with its own n; outputs must equal
        the direct FIR convolution regardless of block size)."""
        g = load("fftfilt")
        h = g[f"FFTFILT_{variant}_DATA_{case}_H"]
        x = g[f"FFTFILT_{variant}_DATA_{case}_X"]
        y_want = g[f"FFTFILT_{variant}_DATA_{case}_Y"]
        n = 64
        f = FftFilt.create(h, n, dtype=x.dtype)
        ys = []
        for i in range(len(x) // n):
            y, f = f.execute(x[i * n : (i + 1) * n])
            ys.append(np.asarray(y))
        got = np.concatenate(ys)
        np.testing.assert_allclose(got, y_want, atol=2e-3)

    @autotest("fftfilt_copy")
    def test_matches_firfilt(self):
        rng = np.random.default_rng(0)
        h = rng.normal(size=12).astype(np.float32)
        x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
        ff, _ = FirFilter.create(h, dtype=jnp.complex64).execute_block(x)
        fft_f = FftFilt.create(h, 32, dtype=jnp.complex64)
        ys = []
        for i in range(8):
            y, fft_f = fft_f.execute(x[i * 32 : (i + 1) * 32])
            ys.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(ys), np.asarray(ff), rtol=1e-4, atol=1e-4
        )

    def test_execute_blocks_batched(self):
        """execute_blocks == sequential execute calls."""
        rng = np.random.default_rng(1)
        h = rng.normal(size=9).astype(np.float32)
        x = (rng.normal(size=320) + 1j * rng.normal(size=320)).astype(np.complex64)
        f1 = FftFilt.create(h, 64, dtype=jnp.complex64)
        ys = []
        for i in range(5):
            y, f1 = f1.execute(x[i * 64 : (i + 1) * 64])
            ys.append(np.asarray(y))
        f2 = FftFilt.create(h, 64, dtype=jnp.complex64)
        y2, f2 = f2.execute_blocks(x)
        np.testing.assert_allclose(
            np.concatenate(ys), np.asarray(y2), rtol=1e-5, atol=1e-5
        )

    @autotest("fftfilt_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            FftFilt.create(np.zeros(0), 64)
        with pytest.raises(ConfigError):
            FftFilt.create(np.arange(9, dtype=np.float32), 7)


class TestResamp2:
    @autotest("resamp2_analysis", "resamp2_synthesis")
    def test_analyzer_splits_bands(self):
        """Low tone → low channel, high tone → high channel (resamp2.rs:188)."""
        m, as_ = 5, 60.0
        n = 512
        i = np.arange(2 * n)
        f0, f1 = 0.0739, -0.1387
        x = (
            np.exp(1j * f0 * i) + np.exp(1j * (np.pi + f1) * i)
        ).astype(np.complex64)
        q = Resamp2.create(m, 0.0, as_)
        lo, hi, q = q.analyzer_execute_block(x)
        lo, hi = np.asarray(lo), np.asarray(hi)
        # after transient, each channel should contain one clean tone
        d = 4 * m
        lo_t, hi_t = lo[d:], hi[d:]
        # low channel: tone at 2*f0 (decimated) with |amp| ~ 1
        assert np.abs(np.abs(lo_t) - 1.0).mean() < 0.05
        assert np.abs(np.abs(hi_t) - 1.0).mean() < 0.05
        spec_lo = np.fft.fftshift(np.fft.fft(lo_t))
        fgrid = np.arange(len(lo_t)) / len(lo_t) - 0.5
        peak = fgrid[np.argmax(np.abs(spec_lo))]
        assert abs(peak - 2 * f0 / (2 * np.pi)) < 0.01

    @autotest("resamp2_crcf_filter_0", "resamp2_crcf_filter_1")
    def test_interp_decim_roundtrip(self):
        """interp 2x then decim 2x ≈ delayed identity for a band-limited
        input (the halfband keeps |f| < 0.25); decimator has gain 2
        (resamp2.rs:153-163 delay+filter sum — msresamp2's zeta compensates)."""
        m = 7
        f_tone = 0.05
        t = np.arange(600)
        x = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
        up = Resamp2.create(m, 0.0, 80.0)
        dn = Resamp2.create(m, 0.0, 80.0)
        y, up = up.interp_execute_block(x)
        z, dn = dn.decim_execute_block(np.asarray(y))
        z = np.asarray(z) / 2.0
        # composite delay is 13.5 samples (interp (2m-1)/2 + decim (2m-1)/2):
        # compensate the fractional part with the tone's phase
        d = 2 * m - 1  # 13
        want = np.exp(2j * np.pi * f_tone * (t - (d + 0.5)))
        err = np.abs(z[40:550] - want[40:550]).mean()
        assert err < 0.02

    @autotest("resamp2_crcf_filter_2", "resamp2_crcf_filter_3")
    def test_filter_execute_block(self):
        """Lowpass/highpass outputs: tone in passband appears in y0."""
        m = 6
        n = 512
        t = np.arange(n)
        x = np.exp(2j * np.pi * 0.05 * t).astype(np.complex64)
        q = Resamp2.create(m, 0.0, 60.0)
        y0, y1, q = q.filter_execute_block(x)
        y0, y1 = np.asarray(y0), np.asarray(y1)
        assert np.abs(y0[100:]).mean() > 0.9
        assert np.abs(y1[100:]).mean() < 0.05

    @autotest("resamp2_config", "resamp2_copy", "resamp2_crcf_filter_4", "resamp2_crcf_filter_5")
    def test_block_split_invariance(self):
        m = 4
        rng = np.random.default_rng(3)
        x = (rng.normal(size=200) + 1j * rng.normal(size=200)).astype(np.complex64)
        q1 = Resamp2.create(m)
        y1, q1 = q1.decim_execute_block(x)
        q2 = Resamp2.create(m)
        parts = []
        for c in np.split(x, [40, 120]):
            y, q2 = q2.decim_execute_block(c)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y1), np.concatenate(parts), rtol=1e-5, atol=1e-6
        )


class TestMsResamp2:
    @pytest.mark.parametrize("stages", [1, 2, 3])
    def test_interp_tone(self, stages):
        """Interpolated tone lands at f/2^k with unit amplitude."""
        r = 1 << stages
        n = 256
        f_in = 0.1
        t = np.arange(n)
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        q = MsResamp2.create(True, stages, 0.4, 0.0, 60.0)
        y, q = q.execute_block(x)
        y = np.asarray(y)
        assert len(y) == n * r
        d = int(2 * q.get_delay())
        spec = np.abs(np.fft.fftshift(np.fft.fft(y[d:] * np.hanning(len(y) - d))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - f_in / r) < 0.01

    def test_decim_preserves_band(self):
        stages = 2
        r = 1 << stages
        n = 2048
        f_in = 0.02
        t = np.arange(n)
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        q = MsResamp2.create(False, stages, 0.4, 0.0, 60.0)
        y, q = q.execute_block(x)
        y = np.asarray(y)
        assert len(y) == n // r
        d = int(q.get_delay() / r) + 8
        spec = np.abs(np.fft.fftshift(np.fft.fft(y[d:] * np.hanning(len(y) - d))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - f_in * r) < 0.01
        # amplitude preserved (zeta normalization)
        assert abs(np.abs(y[d:]).mean() - 1.0) < 0.1


class TestRresamp:
    @pytest.mark.parametrize("P,Q", [(2, 3), (3, 2), (5, 4), (4, 5), (3, 1)])
    def test_matches_per_sample_loop(self, P, Q):
        """Vectorized schedule == reference per-sample primitive."""
        rng = np.random.default_rng(4)
        q = Rresamp.create_kaiser(P, Q, m=6)
        branches = np.asarray(q.branches)
        scale = float(np.asarray(q.scale))
        x = (rng.normal(size=Q * 30) + 1j * rng.normal(size=Q * 30)).astype(
            np.complex64
        )
        y, q2 = q.execute_block(x)
        y = np.asarray(y)

        # reference loop (rresamp.rs:162-185)
        L = branches.shape[1]
        window = np.zeros(L, dtype=np.complex64)
        y_ref = []
        index = 0
        for blk in range(30):
            for i in range(q.q):
                window = np.roll(window, -1)
                window[-1] = x[blk * q.q + i]
                while index < q.p:
                    y_ref.append(np.sum(branches[index][::-1] * window) * scale)
                    index += q.q
                index -= q.p
        np.testing.assert_allclose(y, np.asarray(y_ref), rtol=1e-4, atol=1e-5)

    def test_rate_and_lengths(self):
        q = Rresamp.create_default(6, 4)
        assert q.get_interp() == 3 and q.get_decim() == 2  # gcd-reduced
        assert q.get_block_len() == 2
        assert q.get_p() == 6 and q.get_q() == 4
        x = np.zeros(4 * 5, dtype=np.complex64)
        y, _ = q.execute_block(x)
        assert y.shape[-1] == 6 * 5

    @autotest(param_map={f"[P{p}-": f"rresamp_crcf_part_P{p}_Q5"
                         for p in (1, 2, 3, 6, 8, 9)})
    @pytest.mark.parametrize("P", [1, 2, 3, 6, 8, 9],
                             ids=lambda p: f"P{p}-Q5")
    def test_partition(self, P):
        """Block-partition invariance (liquid rresamp_crcf_part_P*_Q5,
        rresamp autotest family): resampling a stream in arbitrary
        block-length chunks with threaded state must produce exactly the
        one-shot output."""
        Q = 5
        rng = np.random.default_rng(40 + P)
        q = Rresamp.create_kaiser(P, Q, m=8)
        nblk = 24
        x = (rng.normal(size=q.q * nblk)
             + 1j * rng.normal(size=q.q * nblk)).astype(np.complex64)
        y_full, _ = q.execute_block(x)
        y_full = np.asarray(y_full)
        # split into uneven chunks (in units of the reduced input block q.q)
        parts, chunks, i = [], [1, 3, 2, 5, 1, 4], 0
        qs = q
        ci = 0
        while i < nblk:
            n = min(chunks[ci % len(chunks)], nblk - i)
            yb, qs = qs.execute_block(x[i * q.q:(i + n) * q.q])
            parts.append(np.asarray(yb))
            i += n
            ci += 1
        np.testing.assert_array_equal(np.concatenate(parts), y_full)

    def test_tone_psd(self):
        """Resampled tone lands at f·Q/P."""
        P, Q = 3, 2
        q = Rresamp.create_kaiser(P, Q, m=12)
        n = Q * 600
        t = np.arange(n)
        f_in = 0.08
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        y, _ = q.execute_block(x)
        y = np.asarray(y)[200:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(y * np.hanning(len(y)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - f_in * Q / P) < 0.005


class TestMsResamp:
    @pytest.mark.parametrize("rate", [0.7, 1.5] + [
        pytest.param(r, marks=pytest.mark.slow) for r in (0.35, 3.0, 0.1, 6.5)])
    def test_tone_rate(self, rate):
        """Output length ≈ rate·N and tone lands at f/rate."""
        n = 4000
        f_in = 0.03
        t = np.arange(n)
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        q = MsResamp.create(rate, 60.0)
        y, q = q.execute(x)
        y = np.asarray(y).ravel()
        assert abs(len(y) - rate * n) <= max(4, 2 * (1 << q.num_halfband_stages))
        d = int(q.get_delay() * max(rate, 1.0)) + 16
        yy = y[d:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(yy * np.hanning(len(yy)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - f_in / rate) < 0.01, rate

    def test_streaming_blocks(self):
        """Output count over multiple blocks matches get_num_output."""
        q = MsResamp.create(0.4, 60.0)
        rng = np.random.default_rng(5)
        total = 0
        for i in range(5):
            x = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64)
            expect = q.get_num_output(300)
            y, q = q.execute(x)
            assert y.shape[-1] == expect
            total += y.shape[-1]
        assert abs(total - 0.4 * 1500) < 10


class TestHilbert:
    @autotest("firhilbf_decim", "firhilbf_psd")
    def test_fir_r2c_tone(self):
        """Real cosine → analytic signal at ±f kept in one sideband
        (firhilb decim test style)."""
        m = 7
        n = 1024
        f_c = 0.1  # baseband tone, sampled at 2x in real domain
        t = np.arange(2 * n)
        x = np.cos(2 * np.pi * (0.25 + f_c / 2) * t).astype(np.float32)
        q = FirHilbertFilter.create(m, 60.0)
        y, q = q.decim_execute_block(x)
        y = np.asarray(y)[8 * m :]
        spec = np.abs(np.fft.fftshift(np.fft.fft(y * np.hanning(len(y)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        peak = fg[spec.argmax()]
        assert abs(abs(peak) - f_c) < 0.01
        # image suppressed
        image_band = (np.abs(fg + peak) < 0.02)
        assert spec[image_band].max() < 0.05 * spec.max()

    @autotest("firhilbf_interp")
    def test_fir_interp_r2c_roundtrip(self):
        """c2r interp → r2c decim ≈ identity at the composite fractional
        delay 2m-0.5 (each branch delays (2m-1)/2 complex samples)."""
        m = 5
        n = 400
        f_tone = 0.06
        t = np.arange(n)
        x = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
        up = FirHilbertFilter.create(m, 60.0)
        y, up = up.interp_execute_block(x)
        dn = FirHilbertFilter.create(m, 60.0)
        z, dn = dn.decim_execute_block(np.asarray(y))
        z = np.asarray(z)
        want = np.exp(2j * np.pi * f_tone * (t - (2 * m - 0.5)))
        err = np.abs(z[30:n] - want[30:n]).mean()
        assert err < 0.02

    @autotest("firhilbf_invalid_config", "iirhilbf_invalid_config")
    def test_hilbert_invalid_config(self):
        """Constructor validation (liquid firhilbf/iirhilbf_invalid_config)."""
        with pytest.raises(ConfigError):
            FirHilbertFilter.create(1)
        with pytest.raises(ConfigError):
            IirHilbertFilter.create_default(0)
        q = FirHilbertFilter.create(4)
        with pytest.raises(ConfigError):
            q.decim_execute_block(np.zeros(7, np.float32))  # odd length
        qi = IirHilbertFilter.create_default(5)
        with pytest.raises(ConfigError):
            qi.decim_execute_block(np.zeros(9, np.float32))

    @autotest("firhilbf_copy_interp", "firhilbf_copy_decim",
              "iirhilbf_copy_interp", "iirhilbf_copy_decim")
    def test_hilbert_copy_midstream(self):
        """Copied transformer continues identically in both directions
        (liquid firhilbf/iirhilbf copy_interp/copy_decim)."""
        rng = np.random.default_rng(31)
        xr = rng.normal(size=64).astype(np.float32)
        xc = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
        for mk in (lambda: FirHilbertFilter.create(5),
                   lambda: IirHilbertFilter.create_default(5)):
            q0 = mk()
            _, q0 = q0.decim_execute_block(xr[:32])
            q1 = jax.tree_util.tree_map(lambda v: v, q0)
            y0, _ = q0.decim_execute_block(xr[32:])
            y1, _ = q1.decim_execute_block(xr[32:])
            np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
            u0 = mk()
            _, u0 = u0.interp_execute_block(xc[:16])
            u1 = jax.tree_util.tree_map(lambda v: v, u0)
            z0, _ = u0.interp_execute_block(xc[16:])
            z1, _ = u1.interp_execute_block(xc[16:])
            np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))

    @autotest("iirhilbf_filter")
    def test_iir_hilbert_decim_tone(self):
        n = 1024
        f_c = 0.08
        t = np.arange(2 * n)
        x = np.cos(2 * np.pi * (0.25 + f_c / 2) * t).astype(np.float32)
        q = IirHilbertFilter.create_default(7)
        y, q = q.decim_execute_block(x)
        y = np.asarray(y)[100:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(y * np.hanning(len(y)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(abs(fg[spec.argmax()]) - f_c) < 0.01

    @autotest("iirhilbf_interp_decim")
    def test_iir_decim_interp(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=400).astype(np.float32)
        d = IirDecimationFilter.create_default(4, 5, dtype=jnp.float32)
        y, d = d.execute_block(x)
        assert y.shape[-1] == 100
        u = IirInterpolationFilter.create_default(4, 5, dtype=jnp.float32)
        z, u = u.execute_block(np.asarray(y))
        assert z.shape[-1] == 400


class TestFdelayOrdLpc:
    def test_fdelay_integer(self):
        """Integer delay reproduces the input shifted by delay + pfb latency."""
        q = Fdelay.create(20, m=6, npfb=64, dtype=jnp.float32)
        q = q.set_delay(5.0)
        n = 100
        x = np.sin(2 * np.pi * 0.03 * np.arange(n)).astype(np.float32)
        y, q = q.execute_block(x)
        y = np.asarray(y)
        # total latency = nmax - w_index-ish + pfb delay m: check correlation peak
        full = np.correlate(y, x, "full")
        lag = np.argmax(full) - (n - 1)
        assert lag == 5 + q.m + (20 - q.nmax)  # = delay + pfb group delay

    def test_fdelay_fractional(self):
        q = Fdelay.create(10, m=6, npfb=64, dtype=jnp.float32)
        q = q.set_delay(3.5)
        t = np.arange(200, dtype=np.float32)
        x = np.sin(2 * np.pi * 0.02 * t).astype(np.float32)
        y, q = q.execute_block(x)
        y = np.asarray(y)
        # compare against analytically delayed sinusoid (delay + m)
        d = 3.5 + q.m
        want = np.sin(2 * np.pi * 0.02 * (t - d))
        assert np.abs(y[50:] - want[50:]).max() < 1e-2

    @autotest("ordfilt_copy")
    def test_ordfilt_median(self):
        q = OrdFilt.create_medfilt(2, dtype=jnp.float32)  # window 5, k=2
        x = np.array([0, 0, 0, 10, 0, 0, 0, 5, 5, 5, 5, 5], dtype=np.float32)
        y, q = q.execute_block(x)
        y = np.asarray(y)
        # impulse removed by median
        assert y.max() <= 5.0
        with pytest.raises(ConfigError):
            OrdFilt.create(5, 7)

    def test_lpc_recovers_ar2(self):
        """LPC on an AR(2) process recovers the AR coefficients (lpc.rs tests)."""
        rng = np.random.default_rng(8)
        a_true = [1.0, -0.6, 0.2]
        n = 20000
        e = rng.normal(size=n).astype(np.float64)
        x = np.zeros(n)
        for i in range(n):
            x[i] = e[i]
            if i >= 1:
                x[i] -= a_true[1] * x[i - 1]
            if i >= 2:
                x[i] -= a_true[2] * x[i - 2]
        a, g = design_lpc(x.astype(np.float32), 2)
        np.testing.assert_allclose(a, a_true, atol=0.03)

    def test_levinson_direct(self):
        # solve a small Toeplitz system and verify against numpy
        r = np.array([2.0, 1.0, 0.5])
        a, e = levinson(r, 2)
        # a solves R·a = [e, 0, 0] with a[0]=1
        R = np.array([[2.0, 1.0, 0.5], [1.0, 2.0, 1.0], [0.5, 1.0, 2.0]])
        v = R @ a
        np.testing.assert_allclose(v[1:], 0.0, atol=1e-6)


@pytest.mark.slow
class TestRresampReferenceScenarios:
    """The reference's 18 rresamp_crcf autotests (rresamp.rs:262-395):
    QPSK stream resampled by P/Q, output PSD against in-band/stopband
    masks; shortened runs (~100k output samples vs 800k) with the same
    masks and a slightly widened tolerance."""

    _CASES = {
        "baseline_P1_Q5": ("baseline", 1, 5, 15, -1.0, 60.0),
        "baseline_P2_Q5": ("baseline", 2, 5, 15, -1.0, 60.0),
        "baseline_P3_Q5": ("baseline", 3, 5, 15, -1.0, 60.0),
        "baseline_P6_Q5": ("baseline", 6, 5, 15, -1.0, 60.0),
        "baseline_P8_Q5": ("baseline", 8, 5, 15, -1.0, 60.0),
        "baseline_P9_Q5": ("baseline", 9, 5, 15, -1.0, 60.0),
        "default_P1_Q5": ("default", 1, 5, 12, -1.0, 60.0),
        "default_P2_Q5": ("default", 2, 5, 12, -1.0, 60.0),
        "default_P3_Q5": ("default", 3, 5, 12, -1.0, 60.0),
        "default_P6_Q5": ("default", 6, 5, 12, -1.0, 60.0),
        "default_P8_Q5": ("default", 8, 5, 12, -1.0, 60.0),
        "default_P9_Q5": ("default", 9, 5, 12, -1.0, 60.0),
        "arkaiser_P3_Q5": ("arkaiser", 3, 5, 40, 0.2, 50.0),
        "arkaiser_P5_Q3": ("arkaiser", 5, 3, 40, 0.2, 50.0),
        "rrcos_P3_Q5": ("rrcos", 3, 5, 40, 0.2, 50.0),
        "rrcos_P5_Q3": ("rrcos", 5, 3, 40, 0.2, 50.0),
    }

    @autotest(param_map={f"[{k}]": f"rresamp_crcf_{k}" for k in _CASES})
    @pytest.mark.parametrize("case", sorted(_CASES))
    def test_psd(self, case):
        from yagi_tpu import fft as yfft
        from yagi_tpu.design import FirFilterShape
        from yagi_tpu.framing import SymStreamR
        from yagi_tpu.math.windows import WindowType
        from yagi_tpu.utils import validate_psd_spectrum

        method, P, Q, m, bwp, as_ = self._CASES[case]
        if method == "baseline":
            rs = Rresamp.create_kaiser(P, Q, m, bwp, as_)
        elif method == "default":
            rs = Rresamp.create_default(P, Q)
        else:
            rs = Rresamp.create_prototype(
                FirFilterShape.from_str(method), P, Q, m, bwp)
        r = rs.get_rate()
        bw, nfft, tol = 0.2, 800, 0.7
        sp = yfft.Spgram.create(nfft, WindowType.HANN, nfft // 2, nfft // 4)
        gen = SymStreamR(FirFilterShape.KAISER, r * bw, 25, 0.2, "qpsk")
        gen.set_gain(np.sqrt(bw * r))
        n_out_target = 100_000
        blk_q = 400 * Q
        while int(sp.num_samples_total) < n_out_target:
            xin = gen.write_samples(blk_q).astype(np.complex64)
            y, rs = rs.execute_block(jnp.asarray(xin))
            sp = sp.write(y)
        psd = np.asarray(sp.get_psd())
        regions = [
            PsdRegion(-0.5, -0.6 * bw, 0.0, -as_ + tol, False, True),
            PsdRegion(-0.4 * bw, 0.4 * bw, -tol, tol, True, True),
            PsdRegion(0.6 * bw, 0.5, 0.0, -as_ + tol, False, True),
        ]
        assert validate_psd_spectrum(psd, nfft, regions), case

    @autotest("rresamp_copy")
    def test_copy(self):
        rng = np.random.default_rng(3)
        q0 = Rresamp.create_kaiser(3, 5, m=9)
        x = (rng.normal(size=(40,)) + 1j * rng.normal(size=40)).astype(np.complex64)
        _, q0 = q0.execute_block(jnp.asarray(x))
        q1 = jax.tree_util.tree_map(lambda v: v, q0)
        x2 = (rng.normal(size=40) + 1j * rng.normal(size=40)).astype(np.complex64)
        y0, q0 = q0.execute_block(jnp.asarray(x2))
        y1, q1 = q1.execute_block(jnp.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    @autotest("rresamp_config")
    def test_config(self):
        with pytest.raises(ConfigError):
            Rresamp.create_kaiser(0, 5)
        with pytest.raises(ConfigError):
            Rresamp.create_kaiser(5, 0)
        with pytest.raises(ConfigError):
            Rresamp.create(3, 5, 0, np.ones(6, np.float32))
        q = Rresamp.create_kaiser(6, 4, m=9)
        assert q.get_interp() == 3 and q.get_decim() == 2  # gcd-reduced
        assert q.get_block_len() == 2
        assert q.get_p() == 6 and q.get_q() == 4
        assert q.get_rate() == pytest.approx(1.5)


class TestFdelayReferenceScenarios:
    """fdelay_rrrf autotests (fdelay.rs:146-251): impulse through a split
    set_delay(0.7d)+adjust_delay(0.3d), delay estimated from the phase of a
    single low-frequency probe, tol 0.01."""

    _D = {"0": 0.0, "1": 0.0001, "2": 0.1, "3": 0.9, "4": 0.9999,
          "5": 16.99, "6": 17.00, "7": 17.01, "8": 199.9, "9": 200.0}

    @autotest(param_map={f"[d{k}]": f"fdelay_rrrf_{k}" for k in _D})
    @pytest.mark.parametrize("case", sorted(_D), ids=[f"d{k}" for k in sorted(_D)])
    def test_delay(self, case):
        from yagi_tpu.filter import Fdelay

        delay = self._D[case]
        nmax, m, npfb = 200, 12, 64
        n = nmax + 2 * m
        q = Fdelay.create(nmax, m, npfb, dtype=jnp.float32)
        q = q.set_delay(delay * 0.7).adjust_delay(delay * 0.3)
        assert q.nmax == nmax and q.m == m and q.npfb == npfb
        assert float(q.get_delay()) == pytest.approx(delay, abs=1e-4)
        x = np.zeros(n, np.float32)
        x[0] = 1.0
        y, q = q.execute_block(jnp.asarray(x))
        y = np.asarray(y)
        fc = 0.1 / n
        i = np.arange(n)
        v = np.sum(y * np.exp(2j * np.pi * fc * i))
        delay_est = np.angle(v) / (2 * np.pi * fc) - m
        assert delay_est == pytest.approx(delay, abs=0.01), case

    @autotest("fdelay_rrrf_config")
    def test_config(self):
        from yagi_tpu.filter import Fdelay

        with pytest.raises(ConfigError):
            Fdelay.create(0, 12, 64)
        with pytest.raises(ConfigError):
            Fdelay.create(200, 0, 64)
        with pytest.raises(ConfigError):
            Fdelay.create(200, 12, 0)
        q = Fdelay.create(200)
        with pytest.raises(ConfigError):
            q.set_delay(-1.0)
        with pytest.raises(ConfigError):
            q.set_delay(201.0)
        with pytest.raises(ConfigError):
            q.adjust_delay(-1.0)

    @autotest("fdelay_rrrf_push_write")
    def test_split_processing(self):
        """Sample-at-a-time == block processing (fdelay push/write parity)."""
        from yagi_tpu.filter import Fdelay

        rng = np.random.default_rng(3)
        x = rng.normal(size=64).astype(np.float32)
        q0 = Fdelay.create(200, dtype=jnp.float32).set_delay(7.35)
        y0, _ = q0.execute_block(jnp.asarray(x))
        q1 = Fdelay.create(200, dtype=jnp.float32).set_delay(7.35)
        parts = []
        for xi in np.split(x, [5, 6, 40]):
            if len(xi):
                y, q1 = q1.execute_block(jnp.asarray(xi))
                parts.append(np.asarray(y))
        np.testing.assert_allclose(np.asarray(y0), np.concatenate(parts),
                                   rtol=1e-5, atol=1e-6)


class TestLpcReferenceScenarios:
    """lpc_p* autotests (lpc.rs:96-180): LPC of lowpass-filtered noise;
    one-step linear prediction RMSE < −40 dB."""

    _P = {"p4": (200, 4, 0.020), "p6": (400, 6, 0.028), "p8": (600, 8, 0.035),
          "p10": (800, 10, 0.050), "p16": (1600, 16, 0.055),
          "p32": (3200, 24, 0.065)}

    @autotest(param_map={f"[{k}]": f"lpc_{k}" for k in _P})
    @pytest.mark.parametrize("case", sorted(_P))
    def test_prediction(self, case):
        from yagi_tpu.filter import FirFilter, IirFilter

        n, p, fc = self._P[case]
        rng = np.random.default_rng(p)
        n_total = n + 5000
        v = (rng.random(n_total) - 0.5).astype(np.float32)
        lowpass = FirFilter.create_kaiser(57, fc, 60.0, dtype=jnp.float32)
        lowpass = lowpass.set_scale(2 * fc)
        s, _ = lowpass.execute_block(jnp.asarray(v))
        s = np.asarray(s)
        a_hat, g = design_lpc(s[:n], p)
        # prediction filter: b = -a_hat (b[0]=0), a = [1, 0...]
        b = -np.asarray(a_hat, np.float32)
        b[0] = 0.0
        a = np.zeros(p + 1, np.float32)
        a[0] = 1.0
        pred = IirFilter.create(b, a, dtype=jnp.float32)
        s1, _ = pred.execute_block(jnp.asarray(s[n:]))
        err = np.asarray(s1) - s[n:]
        rmse = 10 * np.log10(np.mean(err * err) + 1e-30)
        assert rmse < -40.0, (case, rmse)


class TestMsResamp2ReferenceScenarios:
    """msresamp2_crcf_interp_* autotests (msresamp2.rs:210-291): impulse
    through an interp-by-2^k cascade, PSD of the (scaled) impulse response
    against passband/stopband masks."""

    _CASES = {"01": (1, 0.25, 60.0), "02": (2, 0.25, 60.0),
              "03": (3, 0.25, 60.0), "04": (4, 0.25, 60.0),
              "05": (1, 0.45, 60.0), "06": (2, 0.45, 60.0),
              "07": (3, 0.45, 60.0), "08": (4, 0.45, 60.0),
              "09": (3, 0.45, 80.0), "10": (3, 0.45, 90.0),
              "11": (3, 0.45, 100.0)}

    @autotest(param_map={f"[i{k}]": f"msresamp2_crcf_interp_{k}"
                         for k in _CASES})
    @pytest.mark.parametrize("case", sorted(_CASES),
                             ids=[f"i{k}" for k in sorted(_CASES)])
    def test_interp_psd(self, case):
        from yagi_tpu.utils import PsdRegion, validate_psd_signal

        num_stages, fc, as_ = self._CASES[case]
        m = 1 << num_stages
        q = MsResamp2.create(True, num_stages, fc, 0.0, as_)
        delay = float(q.get_delay())
        num_blocks = 0
        buf_len = 0
        while buf_len < 2.0 * m * delay:
            buf_len += m
            num_blocks += 1
        x = np.zeros(num_blocks, np.complex64)
        x[0] = 1.0
        y, q = q.execute_block(jnp.asarray(x))
        y = np.asarray(y) / m
        f0 = fc / m
        f1 = 1.0 / m - f0
        regions = [
            PsdRegion(-0.5, -f1, 0.0, -as_, False, True),
            PsdRegion(-f0, f0, -0.1, 0.1, True, True),
            PsdRegion(f1, 0.5, 0.0, -as_, False, True),
        ]
        assert validate_psd_signal(y, regions), case

    @autotest("msresamp2_copy")
    def test_copy(self):
        import jax as _jax
        rng = np.random.default_rng(2)
        q0 = MsResamp2.create(True, 2, 0.4, 0.0, 60.0)
        x = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
        _, q0 = q0.execute_block(jnp.asarray(x))
        q1 = _jax.tree_util.tree_map(lambda v: v, q0)
        x2 = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
        y0, _ = q0.execute_block(jnp.asarray(x2))
        y1, _ = q1.execute_block(jnp.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


@pytest.mark.slow
class TestMsResampReferenceScenarios:
    """msresamp_crcf autotests (msresamp.rs:180-232): QPSK stream through
    the multi-stage arbitrary resampler, output PSD against masks; plus
    exact num-output bookkeeping and copy semantics."""

    _PSD = {"01": (0.127115323, 60.0), "02": (0.373737373, 60.0),
            "03": (0.676543210, 60.0)}

    @autotest(param_map={f"[m{k}]": f"msresamp_crcf_{k}" for k in _PSD})
    @pytest.mark.parametrize("case", sorted(_PSD),
                             ids=[f"m{k}" for k in sorted(_PSD)])
    def test_psd(self, case):
        from yagi_tpu import fft as yfft
        from yagi_tpu.design import FirFilterShape
        from yagi_tpu.framing import SymStreamR
        from yagi_tpu.math.windows import WindowType
        from yagi_tpu.utils import PsdRegion, validate_psd_spectrum

        r, as_ = self._PSD[case]
        bw, nfft, tol = 0.2, 800, 0.7
        sp = yfft.Spgram.create(nfft, WindowType.HANN, nfft // 2, nfft // 4)
        gen = SymStreamR(FirFilterShape.KAISER, r * bw, 25, 0.2, "qpsk")
        gen.set_gain(np.sqrt(bw))
        rs = MsResamp.create(r, as_)
        while int(sp.num_samples_total) < 100_000:
            xin = gen.write_samples(2048).astype(np.complex64)
            y, rs = rs.execute(jnp.asarray(xin))
            sp = sp.write(jnp.asarray(np.asarray(y)))
        psd = np.asarray(sp.get_psd())
        regions = [
            PsdRegion(-0.5, -0.6 * bw, 0.0, -as_ + tol, False, True),
            PsdRegion(-0.4 * bw, 0.4 * bw, -tol, tol, True, True),
            PsdRegion(0.6 * bw, 0.5, 0.0, -as_ + tol, False, True),
        ]
        assert validate_psd_spectrum(psd, nfft, regions), case

    @autotest("msresamp_crcf_copy")
    def test_copy(self):
        import jax as _jax
        rng = np.random.default_rng(5)
        q0 = MsResamp.create(0.7, 60.0)
        x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
        y_, q0 = q0.execute(jnp.asarray(x))
        q1 = _jax.tree_util.tree_map(lambda v: v, q0)
        x2 = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
        y0, q0 = q0.execute(jnp.asarray(x2))
        y1, q1 = q1.execute(jnp.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


@pytest.mark.slow
class TestMsResampNumOutput:
    """msresamp_crcf_num_output_* autotests: get_num_output equals actual
    emissions over irregular block sizes for composite-stage rates."""

    _RATES = {"0": 1.00, "1": 2.00, "2": 0.50, "3": float(np.sqrt(2.0)),
              "4": float(np.sqrt(17.0)), "5": float(1.0 / np.pi),
              "6": float(np.exp(5.0)), "7": float(np.exp(-5.0))}

    @autotest(param_map={f"[no-{k}]": f"msresamp_crcf_num_output_{k}"
                         for k in _RATES})
    @pytest.mark.parametrize("case", sorted(_RATES),
                             ids=[f"no-{k}" for k in sorted(_RATES)])
    def test_num_output(self, case):
        rate = self._RATES[case]
        rs = MsResamp.create(rate, 60.0)
        sizes = [1, 2, 3, 20, 7, 64, 4, 4, 4, 27]
        for _ in range(4):
            for n in sizes:
                expect = rs.get_num_output(n)
                y, rs = rs.execute(jnp.zeros(n, dtype=jnp.complex64))
                assert len(np.asarray(y)) == expect, (case, n)


class TestRresampPartition:
    """rresamp_crcf_part_* autotests: block-partitioned execution equals
    one-shot execution for each P/Q (state carry across arbitrary Q-aligned
    partitions)."""

    @autotest(param_map={f"[P{p}]": f"rresamp_crcf_part_P{p}_Q5"
                         for p in (1, 2, 3, 6, 8, 9)})
    @pytest.mark.parametrize("P", [1, 2, 3, 6, 8, 9])
    def test_partition(self, P):
        Q = 5
        rng = np.random.default_rng(P)
        x = (rng.normal(size=40 * Q) + 1j * rng.normal(size=40 * Q)
             ).astype(np.complex64)
        q1 = Rresamp.create_kaiser(P, Q, m=9)
        y1, _ = q1.execute_block(jnp.asarray(x))
        q2 = Rresamp.create_kaiser(P, Q, m=9)
        parts = []
        for blk in np.split(x, [5 * Q, 7 * Q, 23 * Q]):
            y, q2 = q2.execute_block(jnp.asarray(blk))
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.asarray(y1), np.concatenate(parts),
                                   rtol=1e-5, atol=1e-6)
