"""Filter design conformance tests.

Truth values from the reference's inline autotests (rcos.rs:56-97,
rrcos.rs:69-103, rkaiser.rs config tests) and spectral/ISI properties the
reference asserts via PSD masks (design/mod.rs tests).
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu import design as d
from yagi_tpu.errors import ConfigError


class TestKaiser:
    def test_beta_from_attenuation(self):
        # [Vaidyanathan:1993] formula values
        assert d.kaiser_beta_stopband_attenuation(60.0) == pytest.approx(
            0.1102 * (60.0 - 8.7)
        )
        assert d.kaiser_beta_stopband_attenuation(30.0) == pytest.approx(
            0.5842 * 9.0**0.4 + 0.07886 * 9.0
        )
        assert d.kaiser_beta_stopband_attenuation(20.0) == 0.0

    @autotest("firdes_prototype_kaiser", "firdes_rkaiser", "firdes_arkaiser")
    def test_fir_design_kaiser_spectrum(self):
        n, fc, As = 81, 0.2, 60.0
        h = d.fir_design_kaiser(n, fc, As, 0.0)
        assert len(h) == n
        H = np.fft.fft(h, 4096)
        f = np.fft.fftfreq(4096)
        Hdb = 20 * np.log10(np.abs(H) / np.abs(H[0]) + 1e-30)
        assert Hdb[np.abs(f) > 0.25].max() < -As + 2
        assert abs(Hdb[np.abs(f) < 0.15]).max() < 0.1

    @autotest("liquid_freqrespf", "fir_groupdelay_n3")
    def test_fractional_offset_shifts_peak(self):
        h0 = d.fir_design_kaiser(51, 0.2, 60.0, 0.0)
        hm = d.fir_design_kaiser(51, 0.2, 60.0, 0.4)
        gd0 = d.fir_group_delay(h0, 0.0)
        gdm = d.fir_group_delay(hm, 0.0)
        assert gd0 - gdm == pytest.approx(0.4, abs=0.02)

    @autotest("liquid_firdes_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            d.fir_design_kaiser(0, 0.2, 60.0)
        with pytest.raises(ConfigError):
            d.fir_design_kaiser(51, 0.6, 60.0)
        with pytest.raises(ConfigError):
            d.fir_design_kaiser(51, 0.2, -3.0)
        with pytest.raises(ConfigError):
            d.fir_design_kaiser(51, 0.2, 60.0, 0.7)

    @autotest("liquid_rkaiser_config")
    def test_rkaiser_invalid(self):
        """rkaiser parameter validation (liquid_rkaiser_config)."""
        for bad in [(0, 4, 0.3, 0.0), (2, 0, 0.3, 0.0),
                    (2, 4, -0.1, 0.0), (2, 4, 1.5, 0.0),
                    (2, 4, 0.3, 2.0)]:
            with pytest.raises(ConfigError):
                d.fir_design_rkaiser(*bad)
            with pytest.raises(ConfigError):
                d.fir_design_arkaiser(*bad)


class TestNyquistShapes:
    @autotest("liquid_firdes_rcos", "firdes_prototype_rcos")
    def test_rcos_golden(self):
        """Reference autotest vector (rcos.rs:62-97)."""
        h0 = [
            1.65502646542134e-17, 7.20253052925685e-02, -1.26653717080575e-16,
            -1.74718023726940e-01, 2.95450626814946e-16, 6.23332275392119e-01,
            1.00000000000000e00, 6.23332275392119e-01, -2.23850244261176e-16,
            -1.74718023726940e-01, -2.73763990895627e-17, 7.20253052925685e-02,
            0.0,
        ]
        h = d.fir_design_rcos(2, 3, 0.3, 0.0)
        np.testing.assert_allclose(h, h0, atol=1e-5)

    @autotest("liquid_firdes_rrcos", "firdes_rrcos", "firdes_prototype_rrcos")
    def test_rrcos_golden(self):
        """Reference autotest vector (rrcos.rs:76-103)."""
        h0 = [
            -3.311577e-02, 4.501582e-02, 5.659688e-02, -1.536039e-01,
            -7.500154e-02, 6.153450e-01, 1.081972e00, 6.153450e-01,
            -7.500154e-02, -1.536039e-01, 5.659688e-02, 4.501582e-02,
            -3.311577e-02,
        ]
        h = d.fir_design_rrcos(2, 3, 0.3, 0.0)
        np.testing.assert_allclose(h, h0, atol=1e-5)

    @pytest.mark.parametrize(
        "shape",
        [
            d.FirFilterShape.KAISER,
            d.FirFilterShape.PM,
            d.FirFilterShape.RCOS,
            d.FirFilterShape.FEXP,
            d.FirFilterShape.FSECH,
            d.FirFilterShape.FARCSECH,
        ],
    )
    @autotest(param_map={
        "[FirFilterShape.KAISER]": "firdes_prototype_kaiser",
        "[FirFilterShape.PM]": "firdes_prototype_pm",
        "[FirFilterShape.RCOS]": "firdes_prototype_rcos",
        "[FirFilterShape.FEXP]": "firdes_prototype_fexp",
        "[FirFilterShape.FSECH]": "firdes_prototype_fsech",
        "[FirFilterShape.FARCSECH]": "firdes_prototype_farcsech"})
    def test_nyquist_zero_crossings(self, shape):
        """Nyquist property: h[k·m + i·k] ≈ 0 for i ≠ 0 (scaled by h[km])."""
        k, m = 4, 6
        h = d.fir_design_prototype(shape, k, m, 0.3)
        assert len(h) == 2 * k * m + 1
        center = h[k * m]
        crossings = [h[k * m + i * k] / center for i in range(1, m) if i != 0]
        assert np.abs(crossings).max() < 0.05

    @pytest.mark.parametrize(
        "shape",
        [
            d.FirFilterShape.ARKAISER,
            d.FirFilterShape.RKAISER,
            d.FirFilterShape.RRCOS,
            d.FirFilterShape.HM3,
            d.FirFilterShape.RFEXP,
            d.FirFilterShape.RFSECH,
            d.FirFilterShape.RFARCSECH,
        ],
    )
    @autotest(param_map={
        "[FirFilterShape.ARKAISER]": "firdes_prototype_arkaiser",
        "[FirFilterShape.RKAISER]": "firdes_prototype_rkaiser",
        "[FirFilterShape.RRCOS]": "firdes_prototype_rrcos",
        "[FirFilterShape.HM3]": "firdes_prototype_hm3",
        "[FirFilterShape.RFEXP]": "firdes_prototype_rfexp",
        "[FirFilterShape.RFSECH]": "firdes_prototype_rfsech",
        "[FirFilterShape.RFARCSECH]": "firdes_prototype_rfarcsech"})
    def test_root_nyquist_isi(self, shape):
        """Matched-filter ISI must be small (design/mod.rs test harness)."""
        k, m, beta = 2, 10, 0.35
        h = d.fir_design_prototype(shape, k, m, beta)
        isi_rms, _ = d.filter_isi(h, k, m)
        assert 20 * np.log10(isi_rms) < -30.0, shape

    def test_gmsktx_pulse(self):
        h = d.fir_design_gmsktx(4, 3, 0.3)
        assert len(h) == 25
        # Gaussian pulse: positive, symmetric, integral = (π/2)·k
        assert np.all(h > -1e-9)
        np.testing.assert_allclose(h, h[::-1], atol=1e-6)
        assert np.sum(h) == pytest.approx(np.pi / 2 * 4, rel=1e-5)

    @autotest("liquid_getopt_str2firfilt")
    def test_from_str(self):
        assert d.FirFilterShape.from_str("rrcos") is d.FirFilterShape.RRCOS
        assert d.FirFilterShape.from_str("arkaiser") is d.FirFilterShape.ARKAISER
        with pytest.raises(ConfigError):
            d.FirFilterShape.from_str("nope")


class TestPm:
    @autotest("firdespm_lowpass", "firdes_prototype_pm")
    def test_lowpass_meets_spec(self):
        n, fc, As = 81, 0.2, 60.0
        h = d.fir_design_pm_lowpass(n, fc, As)
        assert len(h) == n
        H = np.fft.fft(h, 4096)
        f = np.fft.fftfreq(4096)
        Hdb = 20 * np.log10(np.abs(H) + 1e-30)
        ft = d.estimate_req_filter_transition_bandwidth(As, n)
        assert Hdb[np.abs(f) >= fc + 0.5 * ft + 0.005].max() < -As + 3
        assert np.abs(Hdb[np.abs(f) <= fc - 0.5 * ft - 0.005]).max() < 0.2

    @autotest("firdespm_bandpass_n24", "firdespm_bandpass_n32")
    def test_equiripple_alternation(self):
        """Error extrema must alternate with near-equal magnitude."""
        h = d.fir_design_pm(
            31, [0.0, 0.15, 0.25, 0.5], [1.0, 0.0], [1.0, 1.0], None
        )
        H = np.abs(np.fft.fft(h, 8192))
        f = np.fft.fftfreq(8192)
        stop = H[(f >= 0.25) & (f <= 0.5)]
        # equiripple stopband: peaks within 1.5 dB of each other
        peaks = stop[1:-1][(stop[1:-1] > stop[:-2]) & (stop[1:-1] > stop[2:])]
        peak_db = 20 * np.log10(peaks)
        assert peak_db.max() - peak_db.min() < 1.5

    def test_even_length(self):
        h = d.fir_design_pm(
            30, [0.0, 0.15, 0.25, 0.5], [1.0, 0.0], [1.0, 1.0], None
        )
        assert len(h) == 30
        # even-length type-II symmetric
        np.testing.assert_allclose(h, h[::-1], atol=1e-6)

    def test_halfband(self):
        m = 6
        h = d.fir_design_pm_halfband_stopband_attenuation(m, 60.0)
        n = 4 * m + 1
        assert len(h) == n
        assert h[n // 2] == pytest.approx(0.5, abs=1e-3)
        even_outer = np.concatenate([h[0 : n // 2 : 2], h[n // 2 + 2 :: 2]])
        np.testing.assert_allclose(even_outer, 0.0, atol=1e-12)

    @autotest("firdespm_differentiator")
    def test_differentiator(self):
        """Type-IV differentiator: |H(f)| grows linearly with f in-band
        (liquid firdespm_differentiator)."""
        # slope des with 1/f weighting (relative error), the classic PM
        # differentiator formulation
        pm = d.FirDesignPm(
            32, [0.05, 0.45], None,
            btype=d.FirPmBandType.DIFFERENTIATOR,
            callback=lambda fi: (fi, 1.0 / fi),
        )
        h = pm.execute()
        np.testing.assert_allclose(h, -h[::-1], atol=1e-6)  # antisymmetric
        H = np.abs(np.fft.fft(h, 8192))
        f = np.fft.fftfreq(8192)
        probe = np.array([0.1, 0.2, 0.3, 0.4])
        mags = np.array([H[np.argmin(np.abs(f - p))] for p in probe])
        ratios = mags / probe
        assert ratios.max() / ratios.min() < 1.05  # linear-in-f to 5%

    @autotest("firdespm_hilbert")
    def test_hilbert(self):
        """Hilbert transformer: unit magnitude across the design band
        (liquid firdespm_hilbert)."""
        h = d.fir_design_pm(
            57, [0.05, 0.45], [1.0], [1.0], None,
            btype=d.FirPmBandType.HILBERT,
        )
        # antisymmetric taps
        np.testing.assert_allclose(h, -h[::-1], atol=1e-6)
        H = np.abs(np.fft.fft(h, 8192))
        f = np.fft.fftfreq(8192)
        band = (f >= 0.08) & (f <= 0.42)
        assert np.abs(H[band] - 1.0).max() < 0.05

    @autotest("firdespm_callback")
    def test_callback(self):
        """Grid callback reproduces the direct des/weights design
        (liquid firdespm_callback)."""
        n, bands = 41, [0.0, 0.15, 0.25, 0.5]
        h_direct = d.fir_design_pm(n, bands, [1.0, 0.0], [1.0, 2.0], None)

        def cb(fi):
            return (1.0, 1.0) if fi <= 0.2 else (0.0, 2.0)

        pm = d.FirDesignPm(n, bands, None, callback=cb)
        h_cb = pm.execute()
        np.testing.assert_allclose(h_cb, h_direct, atol=1e-8)

    @autotest("firdespm_copy")
    def test_copy(self):
        """Copied designer produces the identical filter
        (liquid firdespm_copy)."""
        import copy as _copy
        pm0 = d.FirDesignPm(35, [0.0, 0.2, 0.3, 0.5], [1.0, 0.0], [1.0, 1.0])
        pm1 = _copy.deepcopy(pm0)
        np.testing.assert_array_equal(pm0.execute(), pm1.execute())

    @autotest("firdespm_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            d.fir_design_pm(0, [0.0, 0.5], [1.0], None, None)
        with pytest.raises(ConfigError):
            d.fir_design_pm(21, [0.0, 0.6], [1.0], None, None)
        with pytest.raises(ConfigError):
            d.fir_design_pm(21, [0.3, 0.1], [1.0], None, None)
        with pytest.raises(ConfigError):
            d.fir_design_pm(21, [0.0, 0.2, 0.3, 0.5], [1.0, 0.0], [1.0, -1.0], None)


class TestEstimators:
    @autotest("liquid_firdes_estimate")
    def test_kaiser_len(self):
        assert d.estimate_req_filter_len_kaiser(0.05, 60.0) == pytest.approx(
            (60.0 - 7.95) / (14.26 * 0.05)
        )

    def test_herrmann_len(self):
        # must be in the same ballpark as kaiser's rule
        lk = d.estimate_req_filter_len_kaiser(0.05, 60.0)
        lh = d.estimate_req_filter_len_herrmann(0.05, 60.0)
        assert abs(lk - lh) / lk < 0.25
        # above 105 dB it falls back to kaiser
        assert d.estimate_req_filter_len_herrmann(0.05, 110.0) == pytest.approx(
            d.estimate_req_filter_len_kaiser(0.05, 110.0)
        )

    def test_bisection_roundtrips(self):
        as_ = d.estimate_req_filter_stopband_attenuation(0.05, 53)
        assert d.estimate_req_filter_len_kaiser(0.05, as_) == pytest.approx(53, abs=0.1)
        df = d.estimate_req_filter_transition_bandwidth(60.0, 73)
        assert d.estimate_req_filter_len_kaiser(df, 60.0) == pytest.approx(73, abs=0.1)


class TestFilterStats:
    def test_autocorr(self):
        h = np.array([1.0, 2.0, 3.0])
        assert d.filter_autocorr(h, 0) == pytest.approx(14.0)
        assert d.filter_autocorr(h, 1) == pytest.approx(8.0)
        assert d.filter_autocorr(h, -1) == pytest.approx(8.0)
        assert d.filter_autocorr(h, 3) == 0.0

    @autotest("filter_crosscorr_rrrf")
    def test_crosscorr(self):
        h = np.array([1.0, 2.0, 3.0, 4.0])
        g = np.array([1.0, 1.0])
        # lag 0: h[0..2]·g = 3 ; lag 2: h[2..4]·g = 7
        assert d.filter_crosscorr(h, g, 0) == pytest.approx(3.0)
        assert d.filter_crosscorr(h, g, 2) == pytest.approx(7.0)
        assert d.filter_crosscorr(h, g, -1) == pytest.approx(1.0)
        assert d.filter_crosscorr(g, h, 1) == d.filter_crosscorr(h, g, -1)

    def test_energy(self):
        h = d.fir_design_kaiser(81, 0.2, 60.0, 0.0)
        e = d.filter_energy(h, 0.3, 1024)
        assert e < 1e-5  # almost all energy below fc=0.3

    @autotest("firdes_doppler")
    def test_doppler(self):
        h = d.fir_design_doppler(51, 0.1, 2.0, 0.0)
        assert len(h) == 51
        assert np.all(np.isfinite(h))
        np.testing.assert_allclose(h, h[::-1], atol=1e-6)

    @autotest("liquid_firdes_dcblock", "liquid_firdes_notch")
    def test_notch_dc_blocker(self):
        h = d.fir_design_dc_blocker(15, 60.0)
        assert abs(np.sum(h)) < 1e-3  # DC response ~0
        assert abs(d.freqresponse(h, 0.25)) == pytest.approx(1.0, abs=0.05)


class TestFirfiltRnyquistScenarios:
    """firfilt_rnyquist autotests (firfilt.rs:687-807): composite
    matched-filter autocorrelation has unit-normalized peak k, ISI RMS and
    stop-band energy below −50 dB."""

    _BASE = {"arkaiser": d.FirFilterShape.ARKAISER,
             "rkaiser": d.FirFilterShape.RKAISER,
             "rrc": d.FirFilterShape.RRCOS,
             "hm3": d.FirFilterShape.HM3,
             "gmsktxrx": d.FirFilterShape.GMSKTX,
             "rfexp": d.FirFilterShape.RFEXP,
             "rfsech": d.FirFilterShape.RFSECH,
             "rfarcsech": d.FirFilterShape.RFARCSECH}

    _NUM = {"0": (d.FirFilterShape.ARKAISER, 2, 4, 0.33, 0.0),
            "1": (d.FirFilterShape.ARKAISER, 2, 12, 0.20, 0.0),
            "2": (d.FirFilterShape.ARKAISER, 2, 40, 0.20, 0.0),
            "3": (d.FirFilterShape.ARKAISER, 3, 12, 0.20, 0.0),
            "4": (d.FirFilterShape.ARKAISER, 4, 12, 0.20, 0.0),
            "5": (d.FirFilterShape.ARKAISER, 5, 12, 0.20, 0.0),
            "6": (d.FirFilterShape.ARKAISER, 20, 12, 0.20, 0.0),
            "7": (d.FirFilterShape.ARKAISER, 2, 12, 0.80, 0.0),
            "8": (d.FirFilterShape.RKAISER, 2, 12, 0.20, 0.5),
            "9": (d.FirFilterShape.RKAISER, 20, 40, 0.20, 0.5)}

    def _bench(self, ftype, k, m, beta, dt):
        ht = d.fir_design_prototype(ftype, k, m, beta, dt)
        if ftype == d.FirFilterShape.GMSKTX:
            hr = d.fir_design_prototype(d.FirFilterShape.GMSKRX, k, m, beta, dt)
        else:
            hr = ht
        lags = np.arange(4 * k * m + 1) - 2 * k * m
        hc = np.asarray([d.filter_crosscorr(ht, hr, int(l)) for l in lags])
        rxx0 = hc[2 * k * m]
        e = hc[2 * k * m + np.arange(1, 2 * m) * k] / rxx0
        isi_rms = 10 * np.log10(np.mean(e * e))
        as_db = 20 * np.log10(d.filter_energy(ht, 0.5 * (1 + beta) / k, 2048))
        assert rxx0 == pytest.approx(k, rel=0.01)
        assert isi_rms < -50.0
        assert as_db < -50.0

    @autotest(param_map={f"[{n}]": f"firfilt_rnyquist_baseline_{n}"
                         for n in ("arkaiser", "rkaiser", "rrc", "hm3",
                                   "gmsktxrx", "rfexp", "rfsech", "rfarcsech")})
    @pytest.mark.parametrize("name", sorted(_BASE))
    def test_baseline(self, name):
        self._bench(self._BASE[name], 2, 9, 0.3, 0.0)

    @autotest(param_map={f"[n{k}]": f"firfilt_rnyquist_{k}" for k in _NUM})
    @pytest.mark.parametrize("case", sorted(_NUM),
                             ids=[f"n{k}" for k in sorted(_NUM)])
    def test_numbered(self, case):
        self._bench(*self._NUM[case])


class TestFirdespmHalfbandScenarios:
    """firdespm_halfband_* autotests (pm_halfband.rs:146-199): PM halfband
    designs at (m, ft) verified against passband/stopband PSD masks with
    the estimated attainable attenuation."""

    _CASES = {"m2_ft400": (3, 0.400), "m4_ft400": (4, 0.400),
              "m4_ft200": (4, 0.200), "m10_ft200": (10, 0.200),
              "m12_ft100": (12, 0.100), "m20_ft050": (20, 0.050),
              "m40_ft050": (40, 0.050), "m80_ft010": (80, 0.010)}

    @autotest(param_map={f"[{k}]": f"firdespm_halfband_{k}" for k in _CASES})
    @pytest.mark.parametrize("case", [
        c if c not in ("m40_ft050", "m80_ft010") else
        pytest.param(c, marks=pytest.mark.slow) for c in sorted(_CASES)])
    def test_halfband_ft(self, case):
        from yagi_tpu.utils import PsdRegion, validate_psd_signalf

        m, ft = self._CASES[case]
        h_len = 4 * m + 1
        h = d.fir_design_pm_halfband_ft(m, ft)
        as_ = d.estimate_req_filter_stopband_attenuation(ft, h_len)
        f0 = 0.25 - 0.5 * ft
        f1 = 0.25 + 0.5 * ft
        from yagi_tpu.utils import PsdRegion
        regions = [
            PsdRegion(-0.5, -f1, 0.0, -as_, False, True),
            PsdRegion(-f0, f0, -0.1, 0.1, True, True),
            PsdRegion(f1, 0.5, 0.0, -as_, False, True),
        ]
        assert validate_psd_signalf(np.asarray(h), regions), case
