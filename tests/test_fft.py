"""FFT conformance tests against the reference's golden vectors.

Oracle: /root/reference/src/fft/test_data.rs (66 arrays, sizes 2..509 covering
radix-2, composite, prime) with the reference tolerance 2e-4
(/root/reference/src/fft/mod.rs:125-151).
"""

import numpy as np
import pytest

import jax.numpy as jnp

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
