"""IIR filter + design conformance tests.

Oracles: golden vectors (iir/test_data.rs: b/a/x/y quads at rrrf/crcf/cccf),
liquid's SOS/zpk pipeline properties, PSD masks for designed prototypes.
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax
import jax.numpy as jnp

from yagi_tpu.design import iir as iirdes
from yagi_tpu.errors import ConfigError
from yagi_tpu.filter import IirFilter, IirFilterSos

from golden_util import load

TOL = 1e-2  # reference iirfilt tests use 0.01 (accumulating f32 recurrences)


class TestIirFiltGolden:
    @autotest(param_map={f"[{c}-{v}]": f"iirfilt_{v.lower()}_{c.lower()}"
                         for v in ("RRRF", "CRCF", "CCCF")
                         for c in ("H3X64", "H5X64", "H7X64")})
    @pytest.mark.parametrize("variant", ["RRRF", "CRCF", "CCCF"])
    @pytest.mark.parametrize("case", ["H3X64", "H5X64", "H7X64"])
    def test_golden_tf(self, variant, case):
        g = load("iirfilt")
        b = g[f"IIRFILT_{variant}_DATA_{case}_B"]
        a = g[f"IIRFILT_{variant}_DATA_{case}_A"]
        x = g[f"IIRFILT_{variant}_DATA_{case}_X"]
        y_want = g[f"IIRFILT_{variant}_DATA_{case}_Y"]
        f = IirFilter.create(b, a, dtype=x.dtype)
        y, _ = f.execute_block(x)
        np.testing.assert_allclose(np.asarray(y), y_want, atol=TOL)

    def test_split_invariance(self):
        g = load("iirfilt")
        b = g["IIRFILT_CCCF_DATA_H5X64_B"]
        a = g["IIRFILT_CCCF_DATA_H5X64_A"]
        x = g["IIRFILT_CCCF_DATA_H5X64_X"]
        f1 = IirFilter.create(b, a, dtype=x.dtype)
        y1, _ = f1.execute_block(x)
        f2 = IirFilter.create(b, a, dtype=x.dtype)
        parts = []
        for c in np.split(x, [10, 11, 40]):
            if len(c):
                y, f2 = f2.execute_block(c)
                parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y1), np.concatenate(parts), rtol=1e-5, atol=1e-6
        )


class TestSos:
    @autotest("iirfiltsos_impulse_n2", "iirfiltsos_step_n2")
    def test_biquad_matches_tf(self):
        """Single biquad == TF-form IIR with same coefficients."""
        rng = np.random.default_rng(0)
        b = np.array([0.2, 0.3, 0.1])
        a = np.array([1.0, -0.5, 0.25])
        x = rng.normal(size=64).astype(np.float32)
        sos = IirFilterSos.create(b, a)
        y_sos, _ = sos.execute_block(x)
        tf = IirFilter.create(b, a)
        y_tf, _ = tf.execute_block(x)
        np.testing.assert_allclose(np.asarray(y_sos), np.asarray(y_tf), rtol=1e-5, atol=1e-6)

    @autotest("iirfiltsos_config")
    def test_sos_invalid(self):
        """Biquad coefficient validation (liquid iirfiltsos_config)."""
        with pytest.raises(ConfigError):
            IirFilterSos.create([0.2, 0.3], [1.0, -0.5, 0.25])  # b not len 3
        with pytest.raises(ConfigError):
            IirFilterSos.create([0.2, 0.3, 0.1], [1.0, -0.5])  # a not len 3

    @autotest("iirdes_dzpk2sosf")
    def test_sos_cascade_matches_tf(self):
        """SOS realization of a designed filter matches TF realization."""
        btf, atf = iirdes.iir_design(
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.TRANSFER_FUNCTION,
            5, 0.2, 0.0, 0.1, 60.0,
        )
        Bs, As = iirdes.iir_design(
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            5, 0.2, 0.0, 0.1, 60.0,
        )
        rng = np.random.default_rng(1)
        x = rng.normal(size=256).astype(np.float32)
        y_tf, _ = IirFilter.create(btf, atf).execute_block(x)
        y_sos, _ = IirFilter.create_sos(Bs, As).execute_block(x)
        np.testing.assert_allclose(
            np.asarray(y_tf), np.asarray(y_sos), rtol=1e-3, atol=1e-4
        )


class TestIirDesign:
    @pytest.mark.parametrize(
        "shape",
        [
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirFilterShape.CHEBY1,
            iirdes.IirFilterShape.CHEBY2,
            iirdes.IirFilterShape.ELLIP,
            iirdes.IirFilterShape.BESSEL,
        ],
    )
    @autotest(param_map={
        "[2-IirFilterShape.BUTTER]": "iirdes_butter_2",
        "[3-IirFilterShape.BUTTER]": "iirdes_butter_lowpass_0",
        "[5-IirFilterShape.BUTTER]": "iirdes_butter_lowpass_1",
        "[8-IirFilterShape.BUTTER]": "iirdes_butter_lowpass_2",
        "[3-IirFilterShape.CHEBY1]": "iirdes_cheby1_lowpass_0",
        "[5-IirFilterShape.CHEBY1]": "iirdes_cheby1_lowpass_1",
        "[8-IirFilterShape.CHEBY1]": "iirdes_cheby1_lowpass_2",
        "[3-IirFilterShape.CHEBY2]": "iirdes_cheby2_lowpass_0",
        "[5-IirFilterShape.CHEBY2]": "iirdes_cheby2_lowpass_1",
        "[8-IirFilterShape.CHEBY2]": "iirdes_cheby2_lowpass_2",
        "[3-IirFilterShape.ELLIP]": "iirdes_ellip_lowpass_0",
        "[5-IirFilterShape.ELLIP]": "iirdes_ellip_lowpass_1",
        "[8-IirFilterShape.ELLIP]": "iirdes_ellip_lowpass_2",
        "[5-IirFilterShape.BESSEL]": "iirdes_bessel"})
    @pytest.mark.parametrize("order", [2, 3, 5, 8])
    def test_lowpass_psd(self, shape, order):
        """Designed lowpass is stable, unity passband, attenuating stopband."""
        f = IirFilter.create_prototype(
            shape,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            order,
            0.2,
            0.0,
            1.0,
            40.0,
        )
        H0 = abs(f.freqresponse(0.0))
        assert H0 == pytest.approx(1.0, abs=0.15)
        # stopband at least somewhat down for low orders, strongly for high
        H_stop = abs(f.freqresponse(0.45))
        assert H_stop < 0.15 if order <= 3 else H_stop < 0.02
        # impulse response decays (stability)
        x = np.zeros(500, dtype=np.float32)
        x[0] = 1.0
        y, _ = f.execute_block(x)
        y = np.asarray(y)
        assert np.all(np.isfinite(y))
        # high-order elliptic poles sit near |z|=1 → slow (but bounded) decay
        assert np.abs(y[-50:]).max() < 1e-2

    def test_butter_analog_poles(self):
        za, pa, ka = iirdes.iir_design_butter_analog(5)
        assert len(za) == 0 and len(pa) == 5
        np.testing.assert_allclose(np.abs(pa), 1.0, atol=1e-12)
        assert np.all(pa.real < 1e-12)
        assert pa[-1] == pytest.approx(-1.0)

    def test_cheby2_zeros_imaginary(self):
        za, pa, ka = iirdes.iir_design_cheby2_analog(4, 0.01)
        assert len(za) == 4
        np.testing.assert_allclose(za.real, 0.0, atol=1e-12)

    def test_ellip_equiripple(self):
        """Elliptic design: sharper transition than Butterworth at same order."""
        fe = IirFilter.create_prototype(
            iirdes.IirFilterShape.ELLIP,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            5, 0.2, 0.0, 1.0, 60.0,
        )
        fb = IirFilter.create_prototype(
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            5, 0.2, 0.0, 1.0, 60.0,
        )
        # just past the cutoff, elliptic should attenuate more
        assert abs(fe.freqresponse(0.26)) < abs(fb.freqresponse(0.26))

    @autotest("iirdes_ellip_highpass")
    def test_highpass(self):
        f = IirFilter.create_prototype(
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirBandType.HIGHPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            5, 0.3, 0.0, 1.0, 60.0,
        )
        assert abs(f.freqresponse(0.0)) < 1e-3
        assert abs(f.freqresponse(0.45)) == pytest.approx(1.0, abs=0.1)

    @autotest("iirdes_ellip_bandpass")
    def test_bandpass(self):
        for shape in (iirdes.IirFilterShape.BUTTER, iirdes.IirFilterShape.ELLIP):
            f = IirFilter.create_prototype(
                shape,
                iirdes.IirBandType.BANDPASS,
                iirdes.IirFormat.SECOND_ORDER_SECTIONS,
                4, 0.1, 0.25, 1.0, 60.0,
            )
            # ellip Ap=1dB ripple: passband floor 10^(-1/20) = 0.891
            assert 0.85 <= abs(f.freqresponse(0.25)) <= 1.05
            assert abs(f.freqresponse(0.02)) < 0.05
            assert abs(f.freqresponse(0.48)) < 0.05

    @autotest("iirdes_ellip_bandstop")
    def test_bandstop(self):
        for shape in (iirdes.IirFilterShape.BUTTER, iirdes.IirFilterShape.ELLIP):
            f = IirFilter.create_prototype(
                shape,
                iirdes.IirBandType.BANDSTOP,
                iirdes.IirFormat.SECOND_ORDER_SECTIONS,
                4, 0.1, 0.25, 1.0, 60.0,
            )
            assert abs(f.freqresponse(0.25)) < 0.05
            assert abs(f.freqresponse(0.0)) == pytest.approx(1.0, abs=0.15)

    @autotest("iirdes_isstable_n2_yes", "iirdes_isstable_n2_no")
    def test_is_stable(self):
        b, a = iirdes.iir_design(
            iirdes.IirFilterShape.BUTTER,
            iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.TRANSFER_FUNCTION,
            6, 0.2, 0.0, 1.0, 60.0,
        )
        assert iirdes.iir_design_is_stable(b, a)
        assert not iirdes.iir_design_is_stable([1.0], [1.0, -2.5])

    @autotest("iirdes_cplxpair_n6", "iirdes_cplxpair_n20")
    def test_cplxpair(self):
        z = np.array([10 + 3j, 5 + 0j, -3 + 4j, 10 - 3j, 3 + 0j, -3 - 4j])
        p = iirdes.find_conjugate_pairs(z)
        want = np.array([-3 - 4j, -3 + 4j, 10 - 3j, 10 + 3j, 3 + 0j, 5 + 0j])
        np.testing.assert_allclose(p, want, atol=1e-8)

    @autotest("iirfilt_dcblock")
    def test_dc_blocker(self):
        f = IirFilter.create_dc_blocker(0.1)
        assert abs(f.freqresponse(0.0)) < 1e-6
        assert abs(f.freqresponse(0.25)) == pytest.approx(1.0, abs=0.1)

    @autotest("iirfilt_integrator", "iirfilt_differentiator")
    def test_integrator_differentiator(self):
        """Pintelon-Schoukens pair: differentiate then integrate ≈ identity
        up to delay; integrator of constant ramps linearly."""
        fi = IirFilter.create_integrator()
        x = np.ones(200, dtype=np.float32)
        y, _ = fi.execute_block(x)
        y = np.asarray(y)
        d = np.diff(y[100:])
        np.testing.assert_allclose(d, 1.0, atol=0.01)

        fd = IirFilter.create_differentiator()
        t = np.arange(200, dtype=np.float32)
        y, _ = fd.execute_block(t)
        y = np.asarray(y)
        np.testing.assert_allclose(y[100:], 1.0, atol=0.01)

    def test_pll_filter(self):
        f = IirFilter.create_pll(0.1, 1 / np.sqrt(2), 1000.0)
        assert f.nsos == 1
        y, _ = f.execute_block(np.ones(10, dtype=np.float32))
        assert np.all(np.isfinite(np.asarray(y)))

    @autotest("iir_groupdelay_n3", "iir_groupdelay_n8", "iir_groupdelay_sos_n8")
    def test_groupdelay(self):
        f = IirFilter.create_lowpass(4, 0.1)
        gd = f.groupdelay(0.0)
        assert 0.0 < gd < 20.0
        # SOS-form filter reports the same group delay as its TF equivalent
        fsos = IirFilter.create_prototype(
            iirdes.IirFilterShape.BUTTER, iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS, 8, 0.1, 0.0, 1.0, 60.0)
        ftf = IirFilter.create_prototype(
            iirdes.IirFilterShape.BUTTER, iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.TRANSFER_FUNCTION, 8, 0.1, 0.0, 1.0, 60.0)
        assert fsos.groupdelay(0.02) == pytest.approx(ftf.groupdelay(0.02),
                                                      rel=1e-2)

    @autotest("iirfilt_copy_tf", "iirfilt_copy_sos", "iirfiltsos_copy")
    def test_copy_midstream(self):
        """Copied IIR filter continues identically from carried state
        (liquid iirfilt_copy_tf / iirfilt_copy_sos / iirfiltsos_copy)."""
        rng = np.random.default_rng(60)
        x = rng.normal(size=64).astype(np.float32)
        for fmt in (iirdes.IirFormat.TRANSFER_FUNCTION,
                    iirdes.IirFormat.SECOND_ORDER_SECTIONS):
            f0 = IirFilter.create_prototype(
                iirdes.IirFilterShape.BUTTER, iirdes.IirBandType.LOWPASS,
                fmt, 5, 0.15, 0.0, 1.0, 60.0)
            _, f0 = f0.execute_block(x[:32])
            f1 = jax.tree_util.tree_map(lambda v: v, f0)
            y0, _ = f0.execute_block(x[32:])
            y1, _ = f1.execute_block(x[32:])
            np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    @autotest(param_map={"[M2]": "iirinterp_crcf_M2_O9",
                         "[M3]": "iirinterp_crcf_M3_O9",
                         "[M4]": "iirinterp_crcf_M4_O9"})
    @pytest.mark.parametrize("M", [2, 3, 4], ids=lambda m: f"M{m}")
    def test_iirinterp_tone(self, M):
        """IIR interpolator: tone lands at f/M with image suppressed
        (liquid iirinterp_crcf_M*_O9, order-9 butterworth)."""
        from yagi_tpu.filter import IirInterpolationFilter
        n = 500
        f_in = 0.07
        t = np.arange(n)
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        q = IirInterpolationFilter.create_default(M, 9, dtype=jnp.complex64)
        y, _ = q.execute_block(jnp.asarray(x))
        y = np.asarray(y)[40 * M:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(y * np.hanning(len(y)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - f_in / M) < 0.005
        # images at (f_in + k)/M suppressed
        for k in range(1, M):
            img = (f_in + k) / M
            img = img - 1.0 if img > 0.5 else img
            band = np.abs(fg - img) < 0.01
            assert spec[band].max() < 0.05 * spec.max()

    @autotest("iirinterp_copy", "iirdecim_copy")
    def test_iirinterp_decim_copy(self):
        """Copied IIR interp/decim continue identically
        (liquid iirinterp_copy / iirdecim_copy)."""
        from yagi_tpu.filter import IirDecimationFilter, IirInterpolationFilter
        rng = np.random.default_rng(61)
        x = rng.normal(size=80).astype(np.float32)
        u0 = IirInterpolationFilter.create_default(3, 5, dtype=jnp.float32)
        _, u0 = u0.execute_block(x[:40])
        u1 = jax.tree_util.tree_map(lambda v: v, u0)
        a0, _ = u0.execute_block(x[40:])
        a1, _ = u1.execute_block(x[40:])
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        d0 = IirDecimationFilter.create_default(4, 5, dtype=jnp.float32)
        _, d0 = d0.execute_block(x[:40])
        d1 = jax.tree_util.tree_map(lambda v: v, d0)
        b0, _ = d0.execute_block(x[40:])
        b1, _ = d1.execute_block(x[40:])
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))

    @autotest("iirfilt_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            IirFilter.create([], [1.0])
        with pytest.raises(ConfigError):
            IirFilter.create([1.0], [])
        with pytest.raises(ConfigError):
            iirdes.iir_design(
                iirdes.IirFilterShape.BUTTER,
                iirdes.IirBandType.LOWPASS,
                iirdes.IirFormat.TRANSFER_FUNCTION,
                0, 0.2, 0.0, 1.0, 60.0,
            )
        with pytest.raises(ConfigError):
            iirdes.iir_design(
                iirdes.IirFilterShape.BUTTER,
                iirdes.IirBandType.LOWPASS,
                iirdes.IirFormat.TRANSFER_FUNCTION,
                5, 0.7, 0.0, 1.0, 60.0,
            )

    def test_pll_design_invalid(self):
        with pytest.raises(ConfigError):
            iirdes.iir_design_pll_active_lag(-0.1, 0.7, 1000.0)
        with pytest.raises(ConfigError):
            iirdes.iir_design_pll_active_pi(0.1, -0.7, 1000.0)


class TestIirdesLowpassScenarios:
    """iirdes_{butter,cheby1,cheby2,ellip}_lowpass_0..4 autotests
    (design/mod.rs:1040-1268): SOS lowpass designs against exact dB masks
    of |H(f)| sampled on an nfft grid."""

    _CASES = {
        "butter_0": ("butter", 5, 0.20, 0.40, 1.0, 60.0, -3.0),
        "butter_1": ("butter", 5, 0.05, 0.19, 1.0, 60.0, -3.0),
        "butter_2": ("butter", 5, 0.20, 0.40, 1.0, 60.0, -3.0),
        "butter_3": ("butter", 5, 0.20, 0.40, 1.0, 60.0, -3.0),
        "butter_4": ("butter", 15, 0.35, 0.41, 1.0, 60.0, -3.0),
        "cheby1_0": ("cheby1", 5, 0.20, 0.36, 1.0, 60.0, None),
        "cheby1_1": ("cheby1", 5, 0.05, 0.14, 1.0, 60.0, None),
        "cheby1_2": ("cheby1", 5, 0.20, 0.36, 1.0, 60.0, None),
        "cheby1_3": ("cheby1", 5, 0.20, 0.40, 0.1, 60.0, None),
        "cheby1_4": ("cheby1", 15, 0.35, 0.38, 0.1, 60.0, None),
        "cheby2_0": ("cheby2", 5, 0.08, 0.20, 0.1, 60.0, -3.0),
        "cheby2_1": ("cheby2", 5, 0.02, 0.05, 0.1, 60.0, -3.0),
        "cheby2_2": ("cheby2", 5, 0.07, 0.20, 0.1, 70.0, -3.0),
        "cheby2_3": ("cheby2", 5, 0.09, 0.20, 0.1, 60.0, -3.0),
        "cheby2_4": ("cheby2", 15, 0.30, 0.35, 0.1, 70.0, -3.0),
        "ellip_0": ("ellip", 5, 0.20, 0.30, 1.0, 60.0, None),
        "ellip_1": ("ellip", 5, 0.05, 0.09, 1.0, 60.0, None),
        "ellip_2": ("ellip", 5, 0.20, 0.43, 1.0, 100.0, None),
        "ellip_3": ("ellip", 5, 0.20, 0.40, 0.1, 60.0, None),
        "ellip_4": ("ellip", 15, 0.35, 0.37, 0.1, 120.0, None),
    }
    _SHAPES = {"butter": iirdes.IirFilterShape.BUTTER,
               "cheby1": iirdes.IirFilterShape.CHEBY1,
               "cheby2": iirdes.IirFilterShape.CHEBY2,
               "ellip": iirdes.IirFilterShape.ELLIP}

    @autotest(param_map={f"[{k}]": f"iirdes_{k.rsplit('_', 1)[0]}_lowpass_{k.rsplit('_', 1)[1]}"
                         for k in _CASES})
    @pytest.mark.parametrize("case", sorted(_CASES))
    def test_lowpass_mask(self, case):
        fam, n, f_lo, f_hi, ap, as_, h1_fixed = self._CASES[case]
        tol, nfft = 1e-3, 800
        # cheby2: (fp, fc) — design at fc, passband checked to fp
        if fam == "cheby2":
            fc_design, f_pass, f_stop = f_hi, f_lo, f_hi
        else:
            fc_design, f_pass, f_stop = f_lo, f_lo, f_hi
        f = IirFilter.create_prototype(
            self._SHAPES[fam], iirdes.IirBandType.LOWPASS,
            iirdes.IirFormat.SECOND_ORDER_SECTIONS,
            n, fc_design, 0.0, ap, as_,
        )
        h1 = h1_fixed if h1_fixed is not None else -ap
        h2 = -as_ if fam in ("ellip", "cheby2") else -60.0
        freqs = np.arange(nfft // 2) / nfft
        H = np.asarray([abs(f.freqresponse(float(fr))) for fr in freqs])
        Hdb = 20 * np.log10(np.maximum(H, 1e-12))
        pb = (freqs >= 0.0) & (freqs <= (0.98 * f_pass if fam == "butter" else f_pass))
        sb = (freqs >= f_stop) & (freqs <= 0.5)
        assert Hdb[pb].max() <= 0.0 + tol, (case, Hdb[pb].max())
        assert Hdb[pb].min() >= h1 - tol, (case, Hdb[pb].min())
        assert Hdb[sb].max() <= h2 + tol, (case, Hdb[sb].max())
