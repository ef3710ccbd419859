"""firpfbchr, DCT/DST (r2r), and asgram tests.

firpfbchr is validated the way the existing channelizer tests are
(test_channelizer.py): channel k of the bank must equal the direct
mix-down -> prototype filter -> decimate-by-P path, sample-exactly.
DCT/DST follow FFTW's REDFT/RODFT conventions: checked via independent
FFT identities and forward/inverse logical-size scaling.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.autotest import autotest
from yagi_tpu.errors import ConfigError
from yagi_tpu.fft import Asgram, dct, dst, r2r_inverse_scale
from yagi_tpu.multichannel import Firpfbchr


def _direct_channel(x, h, M, P, k, t_steps):
    """y_k[t] = sum_j h[j] x[e_t - j] e^{-j2pi k (e_t-j)/M}, e_t=(t+1)P-1."""
    n = np.arange(x.size)
    xm = x * np.exp(-2j * np.pi * k * n / M)
    filt = np.convolve(xm, h)
    e = (np.arange(t_steps) + 1) * P - 1
    return filt[e]


class TestFirpfbchr:
    @pytest.mark.parametrize("M,P", [(8, 8), (8, 4), (8, 6), (16, 5),
                                     (12, 12), (20, 7)])
    @autotest("firpfbchr_crcf")
    def test_matches_direct(self, M, P):
        """Bank output == mix/filter/decimate for every channel."""
        ch = Firpfbchr.create_kaiser(M, P, m=3, as_=60.0)
        h = np.zeros(ch.p * M)
        # reconstruct prototype taps from the branch decomposition
        br = np.asarray(ch.branches)
        for j in range(h.size):
            h[j] = br[j % M, j // M]
        rng = np.random.default_rng(M * 100 + P)
        T = 24
        x = (rng.standard_normal(T * P)
             + 1j * rng.standard_normal(T * P)).astype(np.complex64)
        y, ch = ch.analyzer_execute(x)
        y = np.asarray(y)
        assert y.shape == (M, T)
        for k in [0, 1, M // 2, M - 1]:
            ref = _direct_channel(x, h, M, P, k, T)
            # float32 twiddle/einsum rounding: ~1e-4 absolute on O(1) data
            np.testing.assert_allclose(y[k], ref, atol=1e-3)

    @pytest.mark.slow
    def test_block_split_invariance(self):
        M, P = 8, 5
        ch = Firpfbchr.create_kaiser(M, P, m=4)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(40 * P)
             + 1j * rng.standard_normal(40 * P)).astype(np.complex64)
        y_all, _ = ch.analyzer_execute(x)
        ch2 = Firpfbchr.create_kaiser(M, P, m=4)
        parts = []
        for blk in np.split(x, [5 * P, 17 * P, 31 * P]):
            yb, ch2 = ch2.analyzer_execute(blk)
            parts.append(np.asarray(yb))
        np.testing.assert_allclose(np.asarray(y_all),
                                   np.concatenate(parts, axis=-1),
                                   atol=1e-4)

    def test_tone_lands_in_channel(self):
        """A tone at channel-c center appears (almost) only in channel c."""
        M, P = 16, 8
        ch = Firpfbchr.create_kaiser(M, P, m=4, as_=80.0)
        c = 3
        n = np.arange(128 * P)
        x = np.exp(2j * np.pi * (c / M) * n).astype(np.complex64)
        y, _ = ch.analyzer_execute(x)
        y = np.asarray(y)[:, 32:]  # skip transient
        pwr = np.mean(np.abs(y) ** 2, axis=-1)
        assert np.argmax(pwr) == c
        others = np.delete(pwr, c)
        assert 10 * np.log10(others.max() / pwr[c]) < -50.0

    @autotest("firpfbchr_crcf_config")
    def test_config_errors(self):
        with pytest.raises(ConfigError):
            Firpfbchr.create_kaiser(1, 1)
        with pytest.raises(ConfigError):
            Firpfbchr.create_kaiser(8, 0)
        with pytest.raises(ConfigError):
            Firpfbchr.create_kaiser(8, 9)
        ch = Firpfbchr.create_kaiser(8, 4)
        with pytest.raises(ConfigError):
            ch.analyzer_execute(np.zeros(7, np.complex64))


class TestR2r:
    @pytest.mark.parametrize("n", [4, 7, 16, 31])
    def test_dct2_fft_identity(self, n):
        """DCT-II via the even-extension FFT identity (independent check):
        y_k = Re(e^{-i pi k/(2N)} FFT([x, reversed x])_k)."""
        rng = np.random.default_rng(n)
        x = rng.standard_normal(n)
        y = np.asarray(dct(x, kind=2))
        ext = np.concatenate([x, x[::-1]])
        F = np.fft.fft(ext)
        k = np.arange(n)
        ref = (np.exp(-1j * np.pi * k / (2 * n)) * F[:n]).real
        np.testing.assert_allclose(y, ref, rtol=0, atol=1e-3)

    @pytest.mark.parametrize("n", [4, 9, 16])
    def test_dst1_fft_identity(self, n):
        """DST-I equals the imaginary part of the odd-extension FFT."""
        rng = np.random.default_rng(n + 1)
        x = rng.standard_normal(n)
        y = np.asarray(dst(x, kind=1))
        ext = np.concatenate([[0.0], x, [0.0], -x[::-1]])
        F = np.fft.fft(ext)
        ref = -F[1: n + 1].imag
        np.testing.assert_allclose(y, ref, rtol=0, atol=1e-3)

    @pytest.mark.parametrize("kind,pair", [
        (1, 1), (2, 3), (3, 2), (4, 4),
    ])
    def test_dct_inverse_pairs(self, kind, pair):
        """FFTW inverse pairs: DCT-II<->III, DCT-I and IV self-inverse,
        with the logical-size scale."""
        n = 12
        rng = np.random.default_rng(kind)
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(dct(np.asarray(dct(x, kind=kind)), kind=pair))
        scale = r2r_inverse_scale(f"dct{kind}", n)
        np.testing.assert_allclose(y, scale * x, rtol=2e-4, atol=2e-3)

    @pytest.mark.parametrize("kind,pair", [
        (1, 1), (2, 3), (3, 2), (4, 4),
    ])
    def test_dst_inverse_pairs(self, kind, pair):
        n = 10
        rng = np.random.default_rng(kind + 10)
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(dst(np.asarray(dst(x, kind=kind)), kind=pair))
        scale = r2r_inverse_scale(f"dst{kind}", n)
        np.testing.assert_allclose(y, scale * x, rtol=2e-4, atol=2e-3)

    def test_batched(self):
        x = np.random.default_rng(0).standard_normal((3, 5, 8))
        y = np.asarray(dct(x, kind=2))
        assert y.shape == (3, 5, 8)
        np.testing.assert_allclose(y[1, 2], np.asarray(dct(x[1, 2], kind=2)),
                                   atol=1e-5)

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            dct(np.zeros(8), kind=5)
        with pytest.raises(ConfigError):
            dst(np.zeros(8), kind=0)
        with pytest.raises(ConfigError):
            dct(np.zeros(1), kind=1)


class TestAsgram:
    def test_tone_peak(self):
        a = Asgram(64)
        n = np.arange(4096)
        x = np.exp(2j * np.pi * 0.1875 * n).astype(np.complex64)
        a.push(x)
        line, fpk, ppk = a.execute()
        assert len(line) == 64
        assert abs(fpk - 0.1875) < 1.5 / 64
        # the peak bin renders as the highest-level character present
        assert line[np.argmax([a.levels.index(c) for c in line])] != " "

    @autotest("asgramcf_copy")
    def test_copy(self):
        """Copied ASCII spectrogram renders identically
        (liquid asgramcf_copy)."""
        import copy as _copy
        a0 = Asgram(64)
        n = np.arange(2048)
        a0.push(np.exp(2j * np.pi * 0.125 * n).astype(np.complex64))
        a1 = _copy.deepcopy(a0)
        l0, f0, p0 = a0.execute()
        l1, f1, p1 = a1.execute()
        assert l0 == l1 and f0 == f1 and p0 == p1

    def test_display_scale(self):
        a = Asgram(32)
        a.set_display(-100.0, 1.0)
        rng = np.random.default_rng(0)
        a.push((0.001 * (rng.standard_normal(1024)
                         + 1j * rng.standard_normal(1024))
                ).astype(np.complex64))
        line, _, _ = a.execute()
        assert len(line) == 32
        with pytest.raises(ConfigError):
            a.set_display(0.0, 0.0)

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            Asgram(1)
        with pytest.raises(ConfigError):
            Asgram(64, levels="x")


def _fftw_r2r_direct(kind: str, x: np.ndarray) -> np.ndarray:
    """O(n²) FFTW real-to-real definitions (the reference's fft_r2r golden
    vectors encode exactly these sums, fft/test_data.rs)."""
    n = len(x)
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    if kind == "REDFT00":
        inner = 2.0 * np.cos(np.pi * j[:, 1:n - 1] * k / (n - 1)) @ x[1:n - 1]
        return x[0] + ((-1.0) ** k[:, 0]) * x[n - 1] + inner
    if kind == "REDFT10":
        return 2.0 * (np.cos(np.pi * (j + 0.5) * k / n) @ x)
    if kind == "REDFT01":
        return x[0] + 2.0 * (np.cos(np.pi * j[:, 1:] * (k + 0.5) / n) @ x[1:])
    if kind == "REDFT11":
        return 2.0 * (np.cos(np.pi * (j + 0.5) * (k + 0.5) / n) @ x)
    if kind == "RODFT00":
        return 2.0 * (np.sin(np.pi * (j + 1) * (k + 1) / (n + 1)) @ x)
    if kind == "RODFT10":
        return 2.0 * (np.sin(np.pi * (j + 0.5) * (k + 1) / n) @ x)
    if kind == "RODFT01":
        inner = 2.0 * (np.sin(np.pi * (j[:, :n - 1] + 1) * (k + 0.5) / n)
                       @ x[: n - 1])
        return ((-1.0) ** k[:, 0]) * x[n - 1] + inner
    if kind == "RODFT11":
        return 2.0 * (np.sin(np.pi * (j + 0.5) * (k + 0.5) / n) @ x)
    raise ValueError(kind)


_R2R_KINDS = {
    "REDFT00": ("dct", 1), "REDFT10": ("dct", 2),
    "REDFT01": ("dct", 3), "REDFT11": ("dct", 4),
    "RODFT00": ("dst", 1), "RODFT10": ("dst", 2),
    "RODFT01": ("dst", 3), "RODFT11": ("dst", 4),
}


class TestR2rReferenceScenarios:
    """The reference's 24 fft_r2r autotests (fft/test_data.rs golden vectors
    for each FFTW kind × n ∈ {8, 32, 27}), checked against the direct O(n²)
    FFTW definitions the vectors encode."""

    @autotest(param_map={f"[{n}-{kind}]": f"fft_r2r_{kind}_n{n}"
                         for kind in _R2R_KINDS for n in (8, 32, 27)})
    @pytest.mark.parametrize("kind", sorted(_R2R_KINDS))
    @pytest.mark.parametrize("n", [8, 32, 27])
    def test_r2r_direct(self, kind, n):
        fam, k = _R2R_KINDS[kind]
        rng = np.random.default_rng(n * 8 + k)
        x = rng.standard_normal(n)
        got = np.asarray((dct if fam == "dct" else dst)(x, kind=k))
        want = _fftw_r2r_direct(kind, x)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
