"""FIR filter / PFB / interp / decim conformance tests.

Oracles: golden vectors from the reference (firfilt_test_data.rs,
firdecim_test_data.rs) at the reference tolerance, plus block-split
invariance (the reference proves state capture via clone-tests,
e.g. firfilt.rs copy tests — here the same property across block splits).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.autotest import autotest
from yagi_tpu.design import FirFilterShape
from yagi_tpu.errors import ConfigError
from yagi_tpu.filter import (
    FirDecimationFilter,
    FirFilter,
    FirInterpolationFilter,
    FirPfbFilter,
)

from golden_util import load

TOL = 2e-3  # reference uses ~1e-3..4e-3 depending on case


class TestFirFiltGolden:
    @autotest(param_map={f"[{c}-{v}]": f"firfilt_{v.lower()}_data_{c.lower()}"
                         for v in ("RRRF", "CRCF", "CCCF")
                         for c in ("H4X8", "H7X16", "H13X32", "H23X64")})
    @pytest.mark.parametrize("variant", ["RRRF", "CRCF", "CCCF"])
    @pytest.mark.parametrize("case", ["H4X8", "H7X16", "H13X32", "H23X64"])
    def test_golden(self, variant, case):
        g = load("firfilt")
        h = g[f"FIRFILT_{variant}_DATA_{case}_H"]
        x = g[f"FIRFILT_{variant}_DATA_{case}_X"]
        y_want = g[f"FIRFILT_{variant}_DATA_{case}_Y"]
        f = FirFilter.create(h, dtype=x.dtype)
        y, f = f.execute_block(x)
        np.testing.assert_allclose(np.asarray(y), y_want, atol=TOL)

    @pytest.mark.parametrize("variant", ["RRRF", "CCCF"])
    def test_block_split_invariance(self, variant):
        g = load("firfilt")
        h = g[f"FIRFILT_{variant}_DATA_H13X32_H"]
        x = g[f"FIRFILT_{variant}_DATA_H13X32_X"]
        f1 = FirFilter.create(h, dtype=x.dtype)
        y1, _ = f1.execute_block(x)
        f2 = FirFilter.create(h, dtype=x.dtype)
        parts = []
        for chunk in np.split(x, [1, 2, 7, 20, 31]):
            if len(chunk):
                y, f2 = f2.execute_block(chunk)
                parts.append(np.asarray(y))
        # float32-tight: different block splits change XLA's reduction order
        # by a few ulps; identical splits are bit-exact (see sharding tests)
        np.testing.assert_allclose(
            np.asarray(y1), np.concatenate(parts), rtol=1e-5, atol=1e-6
        )


class TestFirFiltApi:
    @autotest("firfilt_push_write")
    def test_push_execute_matches_block(self):
        rng = np.random.default_rng(0)
        h = rng.normal(size=9).astype(np.float32)
        x = rng.normal(size=20).astype(np.float32)
        fb = FirFilter.create(h)
        y_block, _ = fb.execute_block(x)
        fs = FirFilter.create(h)
        ys = []
        for xi in x:
            y, fs = fs.execute_one(xi)
            ys.append(float(y))
        np.testing.assert_allclose(np.asarray(y_block), ys, rtol=1e-6, atol=1e-6)

    def test_scale(self):
        h = np.ones(4, dtype=np.float32)
        f = FirFilter.create(h).set_scale(0.25)
        y, _ = f.execute_block(np.ones(8, dtype=np.float32))
        np.testing.assert_allclose(np.asarray(y)[3:], 1.0, rtol=1e-6)

    def test_batched_channels(self):
        """Multi-channel filtering along the last axis."""
        rng = np.random.default_rng(1)
        h = rng.normal(size=7).astype(np.float32)
        x = rng.normal(size=(4, 50)).astype(np.float32)
        f = FirFilter.create(h, batch_shape=(4,))
        y, _ = f.execute_block(x)
        assert y.shape == (4, 50)
        for c in range(4):
            fc = FirFilter.create(h)
            yc, _ = fc.execute_block(x[c])
            np.testing.assert_allclose(np.asarray(y[c]), np.asarray(yc), rtol=1e-6, atol=1e-6)

    @autotest("firfilt_crcf_kaiser")
    def test_kaiser_ctor_psd(self):
        from yagi_tpu.utils import PsdRegion, validate_psd_spectrum

        # n=81 > estimate_req_filter_len(0.05, 60) ≈ 73, so the 60 dB
        # stop-band must be met beyond fc + df. liquid's kaiser prototype has
        # DC gain 1/(2·fc); normalize the response to 0 dB passband.
        f = FirFilter.create_kaiser(81, 0.2, 60.0, 0.0)
        nfft = 1024
        gain_db = 20 * np.log10(0.5 / 0.2)
        psd = np.array(
            [
                20 * np.log10(abs(f.freqresponse(fi / nfft - 0.5)) + 1e-30) - gain_db
                for fi in range(nfft)
            ]
        )
        regions = [
            PsdRegion(-0.15, 0.15, pmin=-1.0, pmax=1.0, test_lo=True, test_hi=True),
            PsdRegion(-0.5, -0.25, pmax=-59.0, test_hi=True),
            PsdRegion(0.25, 0.5, pmax=-59.0, test_hi=True),
        ]
        assert validate_psd_spectrum(psd, nfft, regions)

    @autotest("firfilt_config")
    def test_invalid_configs(self):
        with pytest.raises(ConfigError):
            FirFilter.create(np.zeros(0))
        with pytest.raises(ConfigError):
            FirFilter.create_rect(0)
        with pytest.raises(ConfigError):
            FirFilter.create_rect(2000)

    @autotest("firfilt_crcf_notch", "firfilt_cccf_notch",
              "firfilt_cccf_notch_0", "firfilt_cccf_notch_1",
              "firfilt_cccf_notch_2", "firfilt_cccf_notch_3",
              "firfilt_cccf_notch_4", "firfilt_cccf_notch_5",
              "liquid_freqrespcf")
    def test_notch_complex(self):
        """Notch suppression across the reference's numbered parameter
        sweep (liquid firfilt_cccf_notch_0..5: m/As/f0 combinations,
        including negative f0), evaluated via complex freqresponse."""
        cases = [(10, 60.0, 0.1), (10, 60.0, -0.1), (8, 40.0, 0.2),
                 (12, 80.0, 0.3), (10, 60.0, 0.0), (15, 70.0, -0.35)]
        for m, as_, f0 in cases:
            f = FirFilter.create_notch(m, as_, f0, dtype=jnp.complex64)
            # response at the notch frequency must be deeply suppressed
            assert abs(f.freqresponse(f0)) < 1e-3, (m, as_, f0)
            fprobe = 0.4 if abs(f0) < 0.3 else 0.05
            assert abs(abs(f.freqresponse(fprobe)) - 1.0) < 0.1, (m, as_, f0)

    @autotest("firfilt_crcf_rect")
    def test_rect(self):
        """Rectangular filter = moving sum (liquid firfilt_crcf_rect)."""
        f = FirFilter.create_rect(4, dtype=jnp.complex64)
        x = (np.arange(12) + 1j * np.arange(12)[::-1]).astype(np.complex64)
        y, _ = f.execute_block(jnp.asarray(x))
        y_ref = np.convolve(x, np.ones(4))[:12]
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-6)

    @autotest("firfilt_crcf_firdespm")
    def test_firdespm_ctor(self):
        """PM-designed filter meets its stopband from the streaming object
        (liquid firfilt_crcf_firdespm)."""
        fc = 0.2
        f = FirFilter.create_firdespm(51, fc, 60.0)
        # taps scaled by 0.5/fc (firfilt.rs:129-134): passband gain 0.5/fc
        gain = 0.5 / fc
        assert abs(abs(f.freqresponse(0.05)) - gain) < 0.05 * gain
        assert abs(f.freqresponse(0.35)) < gain * 10 ** (-50 / 20)

    @autotest("firfilt_cccf_coefficients_test")
    def test_coefficients_roundtrip(self):
        """Stored coefficients drive the streaming output exactly
        (liquid firfilt_cccf_coefficients_test)."""
        rng = np.random.default_rng(11)
        h = (rng.normal(size=7) + 1j * rng.normal(size=7)).astype(np.complex64)
        f = FirFilter.create(h)
        np.testing.assert_array_equal(np.asarray(f.h), h)
        x = (rng.normal(size=20) + 1j * rng.normal(size=20)).astype(np.complex64)
        y, _ = f.execute_block(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), np.convolve(x, h)[:20], rtol=1e-5, atol=1e-5)

    @autotest("firfilt_crcf_copy")
    def test_copy_midstream(self):
        """Copied filter continues bit-identically (liquid firfilt_crcf_copy)."""
        rng = np.random.default_rng(12)
        f0 = FirFilter.create_kaiser(21, 0.2, 60.0, 0.0, dtype=jnp.complex64)
        x = (rng.normal(size=(2, 30)) + 1j * rng.normal(size=(2, 30))).astype(np.complex64)
        _, f0 = f0.execute_block(jnp.asarray(x[:, :15][0]))
        f1 = jax.tree_util.tree_map(lambda v: v, f0)
        y0, _ = f0.execute_block(jnp.asarray(x[0, 15:]))
        y1, _ = f1.execute_block(jnp.asarray(x[0, 15:]))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_groupdelay(self):
        f = FirFilter.create_kaiser(21, 0.2, 60.0, 0.0)
        assert f.groupdelay(0.0) == pytest.approx(10.0, abs=1e-4)

    @autotest("firfilt_recreate")
    def test_jit_roundtrip(self):
        """execute_block must be jittable with the filter as a pytree arg."""
        h = np.random.default_rng(2).normal(size=8).astype(np.float32)
        f = FirFilter.create(h)
        x = np.random.default_rng(3).normal(size=32).astype(np.float32)

        @jax.jit
        def run(filt, x):
            return filt.execute_block(x)

        y1, f1 = run(f, x)
        y2, _ = f.execute_block(x)
        # eager and jitted XLA may pick different dot kernels → last-ulp diffs
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)


class TestFirPfb:
    @autotest("firpfb_impulse_response")
    def test_branch_equivalence(self):
        """PFB branch i == FIR with decomposed sub-filter."""
        rng = np.random.default_rng(4)
        M, sub = 4, 6
        h = rng.normal(size=M * sub).astype(np.float32)
        x = rng.normal(size=30).astype(np.float32)
        for i in range(M):
            pfb = FirPfbFilter.create(M, h)
            y_pfb, _ = pfb.execute_block(i, x)
            h_sub = h[i::M]
            f = FirFilter.create(h_sub)
            y_fir, _ = f.execute_block(x)
            np.testing.assert_allclose(
                np.asarray(y_pfb), np.asarray(y_fir), rtol=1e-5, atol=1e-6
            )

    def test_execute_all_consistent(self):
        rng = np.random.default_rng(5)
        M = 8
        pfb = FirPfbFilter.create_kaiser(M, 3, 0.5, 60.0)
        x = rng.normal(size=25).astype(np.float32)
        yb, _ = pfb.execute_all(x)
        assert yb.shape == (M, 25)
        for i in range(M):
            pfb_i = FirPfbFilter.create_kaiser(M, 3, 0.5, 60.0)
            y_i, _ = pfb_i.execute_block(i, x)
            np.testing.assert_allclose(
                np.asarray(yb[i]), np.asarray(y_i), rtol=1e-5, atol=1e-6
            )

    @autotest("firpfb_crcf_copy")
    def test_push_execute_traced_index(self):
        pfb = FirPfbFilter.create_default(4, 2)
        pfb = pfb.push(1.0)
        y = pfb.execute(jnp.asarray(2))
        assert np.isfinite(float(y))


class TestFirInterp:
    @pytest.mark.parametrize("M", [2, 4])
    @autotest("firinterp_rrrf_common", "firinterp_crcf_common")
    def test_impulse_recovers_filter(self, M):
        """Interpolating a unit impulse must reproduce the (padded) taps."""
        rng = np.random.default_rng(6)
        h = rng.normal(size=M * 5).astype(np.float32)
        interp = FirInterpolationFilter.create(M, h)
        x = np.zeros(8, dtype=np.float32)
        x[0] = 1.0
        y, _ = interp.execute_block(x)
        assert y.shape == (8 * M,)
        np.testing.assert_allclose(np.asarray(y)[: len(h)], h, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y)[len(h) :], 0.0, atol=1e-6)

    @autotest("firinterp_rrrf_generic", "firinterp_crcf_generic",
              "firinterp_crcf_rnyquist_0", "firinterp_crcf_rnyquist_1")
    def test_matches_per_sample(self):
        M = 3
        interp = FirInterpolationFilter.create_kaiser(M, 4, 60.0)
        rng = np.random.default_rng(7)
        x = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)
        y, _ = FirInterpolationFilter.create_kaiser(M, 4, 60.0, dtype=jnp.complex64).execute_block(x)
        # reference semantics: y[nM + i] = branch_i after pushing x[n]
        # emulate with the pfb directly
        pfb = interp.pfb
        pfb = pfb.replace(window=jnp.zeros(pfb.sub_len, dtype=jnp.complex64))
        y_ref = []
        for xn in x:
            pfb = pfb.push(xn)
            for i in range(M):
                y_ref.append(complex(pfb.execute(i)))
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)

    @autotest(param_map={"[M2]": "firinterp_crcf_rnyquist_2",
                         "[M3]": "firinterp_crcf_rnyquist_3"})
    @pytest.mark.parametrize("M", [2, 3], ids=lambda m: f"M{m}")
    def test_rnyquist_prototype_zero_isi(self, M):
        """Root-Nyquist interp + matched decimating filter recovers symbols
        with no ISI (liquid firinterp_crcf_rnyquist_*)."""
        m_sym, beta = 7, 0.3
        rng = np.random.default_rng(50 + M)
        syms = (rng.choice([-1.0, 1.0], size=64)
                + 1j * rng.choice([-1.0, 1.0], size=64)).astype(np.complex64)
        q = FirInterpolationFilter.create_prototype(
            FirFilterShape.RRCOS, M, m_sym, beta, dtype=jnp.complex64)
        y, q = q.execute_block(jnp.asarray(syms))
        y2, _ = q.execute_block(jnp.zeros(2 * m_sym, jnp.complex64))
        y = np.concatenate([np.asarray(y), np.asarray(y2)])
        # matched filter: same rrcos prototype
        from yagi_tpu import design as _d
        h = _d.fir_design_prototype(FirFilterShape.RRCOS, M, m_sym, beta, 0.0)
        z = np.convolve(y, h) / M
        # symbol instants after the composite 2*m_sym-symbol delay
        got = z[2 * m_sym * M::M][:64]
        np.testing.assert_allclose(got, syms, atol=0.02)

    @autotest("firinterp_copy", "firinterp_flush")
    def test_copy_flush(self):
        """Copied interpolator continues identically; zero-flush drains the
        window (liquid firinterp_copy/flush semantics)."""
        import jax as _jax
        rng = np.random.default_rng(4)
        q0 = FirInterpolationFilter.create_prototype(
            FirFilterShape.ARKAISER, 2, 5, 0.3, dtype=jnp.complex64)
        x = (rng.normal(size=20) + 1j * rng.normal(size=20)).astype(np.complex64)
        _, q0 = q0.execute_block(jnp.asarray(x))
        q1 = _jax.tree_util.tree_map(lambda v: v, q0)
        x2 = (rng.normal(size=20) + 1j * rng.normal(size=20)).astype(np.complex64)
        y0, q0 = q0.execute_block(jnp.asarray(x2))
        y1, q1 = q1.execute_block(jnp.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        # flush with zeros drains the matched-filter tail
        z, _ = q0.execute_block(jnp.zeros(10, jnp.complex64))
        # tail decays to the design's stop level once the window drains
        assert np.abs(np.asarray(z))[-4:].max() < 0.05

    def test_linear(self):
        interp = FirInterpolationFilter.create_linear(4)
        x = np.ones(6, dtype=np.float32)
        y, _ = interp.execute_block(x)
        # after ramp-up the linear interpolator output is constant 1
        np.testing.assert_allclose(np.asarray(y)[8:], 1.0, rtol=1e-6)


class TestFirDecimGolden:
    @autotest(param_map={
        f"[{c}-{m}-{v}]": f"firdecim_{v.lower()}_data_M{c[1:].lower()}"
        for v in ("RRRF", "CRCF", "CCCF")
        for c, m in (("M2H4X20", 2), ("M3H7X30", 3), ("M4H13X40", 4),
                     ("M5H23X50", 5))})
    @pytest.mark.parametrize("variant", ["RRRF", "CRCF", "CCCF"])
    @pytest.mark.parametrize(
        "case,mfac", [("M2H4X20", 2), ("M3H7X30", 3), ("M4H13X40", 4), ("M5H23X50", 5)]
    )
    def test_golden(self, variant, case, mfac):
        g = load("firdecim")
        h = g[f"FIRDECIM_{variant}_DATA_{case}_H"]
        x = g[f"FIRDECIM_{variant}_DATA_{case}_X"]
        y_want = g[f"FIRDECIM_{variant}_DATA_{case}_Y"]
        d = FirDecimationFilter.create(mfac, h, dtype=x.dtype)
        y, _ = d.execute_block(x)
        np.testing.assert_allclose(np.asarray(y), y_want, atol=TOL)

    @autotest("firdecim_block", "firdecim_rrrf_common", "firdecim_crcf_common")
    def test_split_invariance(self):
        g = load("firdecim")
        h = g["FIRDECIM_CCCF_DATA_M4H13X40_H"]
        x = g["FIRDECIM_CCCF_DATA_M4H13X40_X"]
        d = FirDecimationFilter.create(4, h, dtype=x.dtype)
        y_full, _ = d.execute_block(x)
        d2 = FirDecimationFilter.create(4, h, dtype=x.dtype)
        ys = []
        for chunk in np.split(x, [8, 24]):  # multiples of 4
            y, d2 = d2.execute_block(chunk)
            ys.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y_full), np.concatenate(ys), rtol=1e-5, atol=1e-6
        )

    @autotest("firdecim_config")
    def test_bad_length(self):
        d = FirDecimationFilter.create_kaiser(3, 2, 60.0)
        with pytest.raises(ConfigError):
            d.execute_block(np.zeros(10, dtype=np.float32))
