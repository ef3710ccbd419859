"""AM modulator/demodulator tests (liquid ampmodem autotest model).

liquid's ampmodem autotests modulate a random band-limited message for each
of the 6 configurations (DSB/USB/LSB × carrier/suppressed), demodulate, and
assert small RMSE after delay compensation. Plus spectral checks: USB/LSB
must actually suppress the opposite sideband.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.modem import AmpModem, AmpModemType


def _message(n: int, seed: int = 0) -> np.ndarray:
    """Band-limited random message in [-1,1] (lowpass-filtered noise)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n + 200)
    h = np.hamming(65)
    h /= h.sum()
    y = np.convolve(x, h, mode="same")[100 : 100 + n]
    return (0.9 * y / np.max(np.abs(y))).astype(np.float32)


def _roundtrip_rmse(type_, suppressed: bool, n: int = 4000, mu: float = 0.4) -> float:
    x = _message(n)
    mod = AmpModem.create(mu=mu, type=type_, suppressed=suppressed)
    y, _ = mod.modulate(x)
    dem = AmpModem.create(mu=mu, type=type_, suppressed=suppressed)
    m, _ = dem.demodulate(np.asarray(y))
    m = np.asarray(m)
    d = mod.delay
    ref = x[: n - d]
    est = m[d:]
    # skip transients: filter startup + carrier-tracker settle
    skip = 600
    err = ref[skip:] - est[skip:]
    return float(np.sqrt(np.mean(err**2)))


class TestAmpModemRoundtrip:
    @autotest(param_map={
        f"[{sup}-AmpModemType.{t}]":
        f"ampmodem_{t.lower()}_carrier_{'off' if sup == 'True' else 'on'}"
        for t in ("DSB", "USB", "LSB") for sup in ("False", "True")})
    @pytest.mark.parametrize("type_", [AmpModemType.DSB, AmpModemType.USB, AmpModemType.LSB])
    @pytest.mark.parametrize("suppressed", [True, pytest.param(False, marks=pytest.mark.slow)])
    def test_roundtrip(self, type_, suppressed):
        rmse = _roundtrip_rmse(type_, suppressed)
        assert rmse < 0.05, f"{type_} suppressed={suppressed}: rmse={rmse:.4f}"

    def test_suppressed_dsb_exact(self):
        # suppressed DSB is delay-free and algebraically exact
        x = _message(1000)
        mod = AmpModem.create(mu=0.3, type="dsb", suppressed=True)
        y, _ = mod.modulate(x)
        m, _ = mod.demodulate(np.asarray(y))
        np.testing.assert_allclose(np.asarray(m), x, atol=1e-5)


class TestAmpModemSpectrum:
    @pytest.mark.parametrize("type_,keep_hi", [(AmpModemType.USB, True), (AmpModemType.LSB, False)])
    def test_sideband_suppression(self, type_, keep_hi):
        # single-tone message at f0: SSB keeps one sideband, kills the other
        n = 8192
        f0 = 0.07
        x = np.cos(2 * np.pi * f0 * np.arange(n)).astype(np.float32)
        mod = AmpModem.create(mu=0.5, type=type_, suppressed=True)
        y, _ = mod.modulate(x)
        Y = np.fft.fft(np.asarray(y)[1024:])  # skip Hilbert transient
        f = np.fft.fftfreq(Y.size)
        p = np.abs(Y) ** 2
        hi = p[np.abs(f - f0) < 0.01].sum()
        lo = p[np.abs(f + f0) < 0.01].sum()
        want, kill = (hi, lo) if keep_hi else (lo, hi)
        assert 10 * np.log10(want / max(kill, 1e-30)) > 40.0

    def test_carrier_present_vs_suppressed(self):
        n = 4096
        x = _message(n)
        with_c = AmpModem.create(mu=0.2, suppressed=False)
        no_c = AmpModem.create(mu=0.2, suppressed=True)
        yc, _ = with_c.modulate(x)
        ys, _ = no_c.modulate(x)
        # DC bin dominates only with carrier
        assert abs(np.mean(np.asarray(yc))) > 0.5
        assert abs(np.mean(np.asarray(ys))) < 0.05


class TestAmpModemStreaming:
    @pytest.mark.parametrize("type_", ["dsb", "usb"])
    def test_block_split_invariance(self, type_):
        x = _message(3000, seed=3)
        mod = AmpModem.create(mu=0.4, type=type_, suppressed=False)
        y_full, _ = mod.modulate(x)
        mod2 = AmpModem.create(mu=0.4, type=type_, suppressed=False)
        parts = []
        for chunk in np.split(x, [500, 1300, 2100]):
            y, mod2 = mod2.modulate(chunk)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(y_full), atol=1e-6
        )

    @pytest.mark.slow
    def test_demod_split_invariance(self):
        x = _message(3000, seed=4)
        mod = AmpModem.create(mu=0.4, suppressed=False)
        y, _ = mod.modulate(x)
        y = np.asarray(y)
        d1 = AmpModem.create(mu=0.4, suppressed=False)
        m_full, _ = d1.demodulate(y)
        d2 = AmpModem.create(mu=0.4, suppressed=False)
        parts = []
        for chunk in np.split(y, [700, 1900]):
            m, d2 = d2.demodulate(chunk)
            parts.append(np.asarray(m))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(m_full), atol=2e-5
        )

    def test_batched(self):
        x = np.stack([_message(2000, seed=i) for i in range(4)])
        mod = AmpModem.create(mu=0.3, type="lsb", suppressed=True, batch_shape=(4,))
        y, _ = mod.modulate(x)
        assert np.asarray(y).shape == (4, 2000)
        # each channel matches an unbatched run
        ref_mod = AmpModem.create(mu=0.3, type="lsb", suppressed=True)
        y0, _ = ref_mod.modulate(x[0])
        np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y0), atol=1e-6)


class TestAmpModemConfig:
    def test_invalid(self):
        with pytest.raises(ConfigError):
            AmpModem.create(mu=0.0)
        with pytest.raises(ConfigError):
            AmpModem.create(mu=0.1, m=0, type="usb")
        with pytest.raises(ConfigError):
            AmpModem.create(mu=0.1, carrier_bw=0.8)

    def test_delay_property(self):
        assert AmpModem.create(mu=0.1).delay == 0
        assert AmpModem.create(mu=0.1, type="usb", m=12).delay == 24
