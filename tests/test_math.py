"""Math substrate conformance tests.

Truth values are liquid-dsp autotest vectors (mirrored by the reference's
inline tests, e.g. /root/reference/src/math/bessel.rs:126ff,
gamma.rs:105ff, windows.rs:251ff).
"""

import numpy as np
import pytest

from tests.autotest import autotest
from yagi_tpu import math as ym
from yagi_tpu.errors import ConfigError, ValueRangeError


class TestBessel:
    @autotest("lnbesselif")
    def test_lnbesselif(self):
        cases = [
            (0.0, 0.0, 0.0),
            (0.0, 0.1, 0.00249843923387607),
            (0.1, 7.1, 5.21933724549090),
            (0.3, 2.1, 0.853008130814754),
            (0.9, 9.3, 7.23414120004177),
            (1.0, 0.1, -2.99448253386220),
            (1.7, 0.01, -9.44195081753909),
            (1.8, 1e-3, -14.1983271298778),
            (1.9, 8.7, 6.49469148684252),
            (4.9, 0.01, -30.5795429642925),
            (7.4, 9.3, 4.33486237261960),
            (20.0, 3.0, -34.1194307343208),
            (30.0, 3.0, -62.4217845317278),
        ]
        for nu, z, want in cases:
            got = ym.lnbesselif(nu, z)
            assert got == pytest.approx(want, abs=1e-5, rel=1e-5)

    @autotest("besselif")
    def test_besselif(self):
        cases = [
            (0.0, 0.0, 1.0),
            (0.0, 1.0, 1.26606587775201),
            (0.0, 3.0, 4.88079258586503),
            (0.5, 0.1, 0.252733984600132),
            (0.5, 2.0, 2.046236863089057),
            (1.3, 0.5, 0.145248507279042),
            (1.3, 3.0, 3.450680420553085),
        ]
        for nu, z, want in cases:
            assert ym.besselif(nu, z) == pytest.approx(want, rel=1e-3, abs=1e-3)

    @autotest("besseli0f")
    def test_besseli0f(self):
        for z, want in [
            (0.0, 1.0),
            (0.1, 1.00250156293410),
            (0.5, 1.06348337074132),
            (1.0, 1.26606587775201),
            (2.0, 2.27958530233607),
            (3.0, 4.88079258586503),
        ]:
            assert ym.besseli0f(z) == pytest.approx(want, rel=1e-6)

    @autotest("besseljf")
    def test_besseljf(self):
        # J_0 at a few standard points (scipy-grade truth values)
        assert ym.besseljf(0.0, 0.0) == pytest.approx(1.0)
        assert ym.besseljf(0.0, 1.0) == pytest.approx(0.7651976865579666, rel=1e-6)
        assert ym.besseljf(1.0, 1.0) == pytest.approx(0.44005058574493355, rel=1e-6)
        assert ym.besseljf(2.0, 3.0) == pytest.approx(0.48609126058589107, rel=1e-6)

    @autotest("besselj0f")
    def test_besselj0f(self):
        assert ym.besselj0f(0.0) == pytest.approx(1.0)
        assert ym.besselj0f(2.4048255576957728) == pytest.approx(0.0, abs=1e-6)


class TestGamma:
    @autotest("gamma")
    def test_gammaf(self):
        cases = [
            (0.0001, 9999.42288323161),
            (0.1, 9.51350769866873),
            (0.5, 1.77245385090552),
            (1.5, 0.886226925452758),
            (2.5, 1.329340388179140),
            (3.2, 2.42396547993537),
            (5.3, 38.0779764499523),
            (12.0, 39916800.0),
        ]
        for z, want in cases:
            assert ym.gammaf(z) == pytest.approx(want, rel=1e-5)

    def test_gammaf_negative(self):
        # reflection identity: gamma(-0.5) = -2*sqrt(pi)
        assert ym.gammaf(-0.5) == pytest.approx(-2.0 * np.sqrt(np.pi), rel=1e-6)

    @autotest("lngamma")
    def test_lngammaf(self):
        for z, want in [
            (1e-5, 1.15129196928958e01),
            (1.20226443461741e-01, 2.06022544058646e00),
            (1.25892541179417e00, -1.00254418080515e-01),
            (4.07380277804113e00, 1.88523210546678e00),
        ]:
            assert ym.lngammaf(z) == pytest.approx(want, rel=1e-4)
        with pytest.raises(ValueRangeError):
            ym.lngammaf(-1.0)

    @autotest("factorial")
    def test_factorial(self):
        for n, want in [(0, 1.0), (1, 1.0), (5, 120.0), (10, 3628800.0)]:
            assert ym.factorialf(n) == pytest.approx(want, rel=1e-5)

    @autotest("uppergamma")
    def test_lowergamma(self):
        # γ(z, α) compared against scipy-grade truth: γ(2.0, 1.0) = 0.26424...
        assert ym.lowergammaf(2.0, 1.0) == pytest.approx(0.2642411176571153, rel=1e-4)
        assert ym.uppergammaf(2.0, 1.0) == pytest.approx(0.7357588823428847, rel=1e-4)


class TestMisc:
    @autotest("Q")
    def test_qf(self):
        assert ym.qf(0.0) == pytest.approx(0.5)
        assert ym.qf(1.0) == pytest.approx(0.15865525393145707, rel=1e-6)

    @autotest("sincf")
    def test_sincf(self):
        assert ym.sincf(0.0) == pytest.approx(1.0)
        assert ym.sincf(1.0) == pytest.approx(0.0, abs=1e-7)
        assert ym.sincf(0.5) == pytest.approx(2.0 / np.pi, rel=1e-6)
        x = np.array([0.0, 0.25, 1.5])
        np.testing.assert_allclose(
            ym.sincf(x),
            [1.0, np.sin(np.pi * 0.25) / (np.pi * 0.25), np.sin(1.5 * np.pi) / (1.5 * np.pi)],
            rtol=1e-6,
        )

    @autotest("nextpow2")
    def test_nextpow2(self):
        assert ym.nextpow2(1) == 0
        assert ym.nextpow2(2) == 1
        assert ym.nextpow2(3) == 2
        assert ym.nextpow2(256) == 8
        assert ym.nextpow2(257) == 9
        with pytest.raises(ValueRangeError):
            ym.nextpow2(0)

    @autotest("nchoosek")
    def test_nchoosek(self):
        assert ym.nchoosek(5, 2) == pytest.approx(10.0)
        assert ym.nchoosek(10, 0) == pytest.approx(1.0)
        assert ym.nchoosek(24, 12) == pytest.approx(2704156.0, rel=1e-5)
        with pytest.raises(ValueRangeError):
            ym.nchoosek(3, 5)


class TestModArith:
    @autotest("prime_small")
    def test_is_prime(self):
        primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 8191]
        composites = [0, 1, 4, 6, 8, 9, 100, 8192]
        assert all(ym.is_prime(p) for p in primes)
        assert not any(ym.is_prime(c) for c in composites)

    @autotest("factors")
    def test_factor(self):
        assert ym.factor(12) == [2, 2, 3]
        assert ym.factor(97) == [97]
        assert ym.unique_factor(12) == [2, 3]

    @autotest("gcd_one", "gcd_edge_cases", "gcd_base")
    def test_gcd(self):
        assert ym.gcd(12, 18) == 6
        assert ym.gcd(13, 17) == 1
        with pytest.raises(ConfigError):
            ym.gcd(0, 5)

    def test_modpow(self):
        assert ym.modpow(3, 5, 7) == pow(3, 5, 7)

    def test_primitive_root_prime(self):
        # 3 is the smallest primitive root of 7
        assert ym.primitive_root_prime(7) == 3

    @autotest("totient")
    def test_totient(self):
        assert ym.totient(9) == 6
        assert ym.totient(10) == 4
        assert ym.totient(13) == 12


class TestPoly:
    def test_poly_val(self):
        # P(x) = 1 + 2x + 3x^2 at x=2 → 17
        assert ym.poly_val([1.0, 2.0, 3.0], 2.0) == pytest.approx(17.0)

    @autotest("polyf_fit_q3n3")
    def test_poly_fit(self):
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = 2.0 + 3.0 * x
        p = ym.poly_fit(x, y, 2)
        np.testing.assert_allclose(p, [2.0, 3.0], atol=1e-10)

    @autotest("poly_expandbinomial_n6")
    def test_poly_expandbinomial(self):
        np.testing.assert_allclose(ym.poly_expandbinomial(3), [1, 3, 3, 1])

    @autotest("poly_binomial_expand_pm_m6_k1", "poly_expandbinomial_pm_m5_k2")
    def test_poly_expandbinomial_pm(self):
        # (1+x)^2 (1-x)^1 = 1 + x - x^2 - x^3
        np.testing.assert_allclose(ym.poly_expandbinomial_pm(2, 1), [1, 1, -1, -1])

    @autotest("polyf_expandroots_4", "polyf_expandroots_11", "polycf_expandroots_4")
    def test_poly_expandroots(self):
        # (x-1)(x-2) = 2 - 3x + x^2
        np.testing.assert_allclose(ym.poly_expandroots([1.0, 2.0]), [2, -3, 1])

    @autotest("polyf_expandroots2_3")
    def test_poly_expandroots2(self):
        # (2x-1)(3x-2) = 2 - 7x + 6x^2
        np.testing.assert_allclose(ym.poly_expandroots2([1.0, 2.0], [2.0, 3.0]), [2, -7, 6])

    @autotest("polyf_mul_2_3")
    def test_poly_mul(self):
        np.testing.assert_allclose(ym.poly_mul([1, 1], [1, 1]), [1, 2, 1])

    @autotest("polyf_lagrange")
    def test_poly_interp_lagrange(self):
        x = np.array([0.0, 1.0, 2.0])
        y = x**2
        assert ym.poly_interp_lagrange(x, y, 1.5) == pytest.approx(2.25)

    def test_poly_fit_lagrange(self):
        x = np.array([0.0, 1.0, 2.0])
        y = 1.0 + 2.0 * x + 0.5 * x**2
        p = ym.poly_fit_lagrange(x, y)
        np.testing.assert_allclose(p, [1.0, 2.0, 0.5], atol=1e-12)

    @autotest("polyf_lagrange_issue165")
    def test_barycentric(self):
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.sin(x)
        w = ym.poly_fit_lagrange_barycentric(x)
        got = ym.poly_val_lagrange_barycentric(x, y, w, 1.5)
        want = ym.poly_interp_lagrange(x, y, 1.5)
        assert got == pytest.approx(want, rel=1e-10)
        # exact node hit
        assert ym.poly_val_lagrange_barycentric(x, y, w, 2.0) == pytest.approx(y[2])

    @autotest("polyf_findroots_real")
    def test_poly_findroots(self):
        # x^2 - 3x + 2 = roots {1, 2}; ascending coeffs [2, -3, 1]
        r = ym.poly_findroots([2.0, -3.0, 1.0])
        np.testing.assert_allclose(sorted(r.real), [1.0, 2.0], atol=1e-10)
        np.testing.assert_allclose(r.imag, 0.0, atol=1e-10)

    @autotest("polyf_findroots_complex")
    def test_poly_findroots_complex_sorted(self):
        # x^2 + 1 → ±j; liquid sorts equal-real roots by descending imag
        r = ym.poly_findroots([1.0, 0.0, 1.0])
        np.testing.assert_allclose(r.imag, [1.0, -1.0], atol=1e-10)

    @autotest("polyf_findroots_mix", "polyf_findroots_mix2")
    def test_durandkerner_matches(self):
        p = np.array([6.0, -5.0, -2.0, 1.0])  # (x-3)(x-2)... check via np
        r1 = ym.poly_findroots(p)
        r2 = ym.poly_findroots_durandkerner(p)
        np.testing.assert_allclose(r1, r2, atol=1e-6)


class TestWindows:
    def test_kaiser_endpoints_and_symmetry(self):
        w = ym.kaiser(51, 10.0)
        assert w.shape == (51,)
        np.testing.assert_allclose(w, w[::-1], atol=1e-12)
        assert w[25] == pytest.approx(1.0)
        assert np.all(w > 0) and np.all(w <= 1.0)

    @autotest("window_hamming", "window_hann")
    def test_hamming_hann(self):
        wh = ym.hamming(71)
        assert wh[0] == pytest.approx(0.53836 - 0.46164)
        wn = ym.hann(71)
        assert wn[0] == pytest.approx(0.0, abs=1e-12)
        assert wn[35] == pytest.approx(1.0)

    @autotest("window_blackmanharris7", "window_flattop", "window_triangular", "window_rcostaper")
    def test_window_dispatch(self):
        for wt, arg in [
            (ym.WindowType.HAMMING, 0.0),
            (ym.WindowType.HANN, 0.0),
            (ym.WindowType.BLACKMAN_HARRIS, 0.0),
            (ym.WindowType.BLACKMAN_HARRIS7, 0.0),
            (ym.WindowType.KAISER, 10.0),
            (ym.WindowType.FLAT_TOP, 0.0),
            (ym.WindowType.TRIANGULAR, 71.0),
            (ym.WindowType.RCOS_TAPER, 25.0),
        ]:
            w = ym.window(wt, 71, arg)
            assert w.shape == (71,)
            assert np.all(np.isfinite(w))

    @autotest("window_blackmanharris", "window_kaiser")
    def test_window_sidelobes(self):
        """PSD check per reference windows.rs:260-300: normalized window FFT
        must be below -40 dB for |f| > 0.20 and have a narrow main lobe."""
        nfft = 1200
        for wt, arg, n in [
            (ym.WindowType.HAMMING, 0.0, 71),
            (ym.WindowType.HANN, 0.0, 71),
            (ym.WindowType.BLACKMAN_HARRIS, 0.0, 71),
            (ym.WindowType.KAISER, 10.0, 71),
            (ym.WindowType.KBD, 0.0, 72),
        ]:
            w = ym.window(wt, n, arg)
            buf = np.zeros(nfft, dtype=np.complex128)
            buf[:n] = w / w.sum()
            spec = np.fft.fftshift(np.fft.fft(buf))
            f = np.arange(nfft) / nfft - 0.5
            psd_db = 20 * np.log10(np.abs(spec) + 1e-30)
            assert np.all(psd_db[np.abs(f) > 0.20] < -40.0), wt

    @autotest("window_kbd", "kbd_n16", "kbd_n32", "kbd_n48")
    def test_kbd_properties(self):
        """KBD window Princen-Bradley conditions (windows.rs:356-374)."""
        for n, beta in [(16, 10.0), (32, 20.0), (48, 12.0)]:
            w = ym.kbd_window(n, beta)
            w2 = w * w
            m = n // 2
            np.testing.assert_allclose(w2[:m] + w2[m:], 1.0, atol=1e-3)
            assert w2.sum() == pytest.approx(0.5 * n, abs=1e-3 * n)

    def test_get_window_type(self):
        assert ym.get_window_type("hamming") is ym.WindowType.HAMMING
        assert ym.get_window_type("kbd") is ym.WindowType.KBD
        with pytest.raises(ConfigError):
            ym.get_window_type("invalid window")

    @autotest("window_config", "math_config")
    def test_invalid_params(self):
        # liquid math_config: invalid math-utility arguments raise typed errors
        with pytest.raises(ConfigError):
            ym.gcd(0, 0)
        with pytest.raises(ConfigError):
            ym.poly_fit([1.0, 2.0], [1.0], 1)
        with pytest.raises(ValueRangeError):
            ym.kaiser(10, -1.0)
        with pytest.raises(ValueRangeError):
            ym.kbd_window(7, 10.0)
        with pytest.raises(ValueRangeError):
            ym.kbd_window(0, 10.0)
        with pytest.raises(ValueRangeError):
            ym.triangular(10, 15)
        with pytest.raises(ValueRangeError):
            ym.rcos_taper(10, 8)


class TestComplexMath:
    """math_complex autotests (complex.rs ports of liquid's c* functions):
    each checked against numpy's complex transcendentals on a grid covering
    all quadrants."""

    _PTS = [0.5 + 0.25j, -1.2 + 0.8j, 0.3 - 1.7j, -0.9 - 0.4j, 2.0 + 0j,
            0.0 + 1.5j]

    @autotest("cexpf")
    def test_cexpf(self):
        for z in self._PTS:
            assert complex(ym.cexpf(z)) == pytest.approx(np.exp(z), rel=1e-5)

    @autotest("clogf")
    def test_clogf(self):
        for z in self._PTS:
            assert complex(ym.clogf(z)) == pytest.approx(np.log(z), rel=1e-5)

    @autotest("csqrtf")
    def test_csqrtf(self):
        for z in self._PTS:
            assert complex(ym.csqrtf(z)) == pytest.approx(np.sqrt(z), rel=1e-5)

    @autotest("casinf")
    def test_casinf(self):
        import cmath
        for z in self._PTS:
            assert complex(ym.casinf(z)) == pytest.approx(cmath.asin(z), rel=1e-4)

    @autotest("cacosf")
    def test_cacosf(self):
        import cmath
        for z in self._PTS:
            assert complex(ym.cacosf(z)) == pytest.approx(cmath.acos(z), rel=1e-4)

    @autotest("catanf")
    def test_catanf(self):
        import cmath
        for z in self._PTS:
            assert complex(ym.catanf(z)) == pytest.approx(cmath.atan(z), rel=1e-4)
