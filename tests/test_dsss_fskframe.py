"""dsssframe64 and fskframe tests.

Modeled on liquid's dsssframe64sync and fskframesync autotests: frames
recovered through channels with delay, CFO, phase, gain, and noise —
including, for DSSS, SNR near/below 0 dB where the spreading gain is what
makes decoding possible.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.framing import (
    DsssFrameGen64, DsssFrameSync64, FskFrameGen, FskFrameSync,
)


def _channel(tx, delay, dphi, phi, gamma, snr_db, seed):
    rng = np.random.default_rng(seed)
    buf = np.concatenate([np.zeros(delay, np.complex64), tx,
                          np.zeros(64, np.complex64)])
    n = np.arange(buf.size)
    buf = gamma * buf * np.exp(1j * (dphi * n + phi))
    nstd = 10 ** (-snr_db / 20) / np.sqrt(2)
    buf = buf + nstd * (rng.standard_normal(buf.size)
                        + 1j * rng.standard_normal(buf.size))
    return buf.astype(np.complex64)


class TestDsssFrame64:
    @pytest.mark.parametrize("sf", [8] + [pytest.param(v, marks=pytest.mark.slow) for v in (4, 16)])
    @autotest("dsssframe64sync", "dsssframesync")
    def test_roundtrip(self, sf):
        gen = DsssFrameGen64(sf=sf)
        sync = DsssFrameSync64(sf=sf)
        rng = np.random.default_rng(sf)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        tx = gen.execute(header, payload)
        assert tx.size == gen.frame_len
        rx = _channel(tx, delay=83, dphi=0.001, phi=0.8, gamma=0.9,
                      snr_db=20, seed=sf)
        res = sync.execute(rx)
        assert res is not None
        assert res["header_valid"] and res["payload_valid"]
        np.testing.assert_array_equal(res["header"], header)
        np.testing.assert_array_equal(res["payload"], payload)

    @autotest("dsssframe64gen_copy", "dsssframe64sync_copy")
    def test_copy(self):
        """Copied gen/sync behave identically (liquid dsssframe64gen_copy /
        dsssframe64sync_copy)."""
        import copy as _copy
        rng = np.random.default_rng(33)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        g0 = DsssFrameGen64(sf=4)
        g1 = _copy.deepcopy(g0)
        t0, t1 = g0.execute(header, payload), g1.execute(header, payload)
        np.testing.assert_array_equal(t0, t1)
        rx = _channel(t0, delay=40, dphi=0.0, phi=0.3, gamma=1.0,
                      snr_db=25, seed=34)
        s0 = DsssFrameSync64(sf=4)
        s1 = _copy.deepcopy(s0)
        r0, r1 = s0.execute(rx), s1.execute(rx)
        assert r0 is not None and r1 is not None
        np.testing.assert_array_equal(r0["payload"], r1["payload"])

    def test_low_snr_processing_gain(self):
        """liquid dsssframe64 raison d'etre: decode near 0 dB SNR thanks
        to the sf=16 (~12 dB) spreading gain."""
        gen = DsssFrameGen64(sf=16)
        sync = DsssFrameSync64(sf=16, threshold=0.25)
        rng = np.random.default_rng(4)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        tx = gen.execute(header, payload)
        rx = _channel(tx, delay=50, dphi=0.0005, phi=-0.4, gamma=1.0,
                      snr_db=2, seed=5)
        res = sync.execute(rx)
        assert res is not None
        assert res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)

    def test_no_detection(self):
        rng = np.random.default_rng(0)
        sync = DsssFrameSync64(sf=8)
        noise = 0.01 * (rng.standard_normal(8192)
                        + 1j * rng.standard_normal(8192))
        assert sync.execute(noise.astype(np.complex64)) is None

    @autotest("dsssframe64_config")
    def test_config_errors(self):
        with pytest.raises(ConfigError):
            DsssFrameGen64(sf=1)
        with pytest.raises(ConfigError):
            DsssFrameSync64(sf=512)
        gen = DsssFrameGen64(sf=8)
        with pytest.raises(ConfigError):
            gen.execute(np.zeros(7, np.uint8), np.zeros(64, np.uint8))
        with pytest.raises(ConfigError):
            gen.execute(np.zeros(8, np.uint8), np.zeros(63, np.uint8))


class TestFskFrame:
    @pytest.mark.parametrize("m,k,bw", [
        (2, 8, 0.25), (1, 4, 0.2),
        pytest.param(1, 8, 0.25, marks=pytest.mark.slow),
        pytest.param(3, 16, 0.3, marks=pytest.mark.slow),
    ])
    @autotest("fskframesync")
    def test_roundtrip(self, m, k, bw):
        gen = FskFrameGen(m=m, k=k, bandwidth=bw, header_len=8)
        sync = FskFrameSync(m=m, k=k, bandwidth=bw, header_len=8)
        rng = np.random.default_rng(m * 10 + k)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 32).astype(np.uint8)
        tx = gen.assemble(header, payload, crc="crc32", fec0="hamming74")
        rx = _channel(tx, delay=60, dphi=0.0, phi=1.3, gamma=1.5,
                      snr_db=25, seed=k)
        res = sync.execute(rx)
        assert res is not None
        assert res["header_valid"]
        np.testing.assert_array_equal(res["header"], header)
        assert res["props"]["payload_len"] == 32
        assert res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)

    def test_noncoherent_gain_phase_immunity(self):
        """FSK decodes regardless of carrier phase and channel gain."""
        gen = FskFrameGen(m=1, k=8, bandwidth=0.25)
        sync = FskFrameSync(m=1, k=8, bandwidth=0.25)
        rng = np.random.default_rng(9)
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 20).astype(np.uint8)
        tx = gen.assemble(header, payload)
        for phi, gamma in [(0.0, 0.1), (2.5, 3.0), (-1.0, 0.5)]:
            rx = _channel(tx, delay=31, dphi=0.0, phi=phi, gamma=gamma,
                          snr_db=30, seed=int(phi * 10) & 0xFF)
            res = sync.execute(rx)
            assert res is not None and res["payload_valid"]
            np.testing.assert_array_equal(res["payload"], payload)

    def test_no_detection(self):
        rng = np.random.default_rng(1)
        sync = FskFrameSync(m=1, k=8, bandwidth=0.25)
        noise = 0.01 * (rng.standard_normal(8192)
                        + 1j * rng.standard_normal(8192))
        assert sync.execute(noise.astype(np.complex64)) is None

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            FskFrameGen(m=0)
        with pytest.raises(ConfigError):
            FskFrameGen(bandwidth=0.6)
        gen = FskFrameGen()
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(7, np.uint8), np.zeros(10, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(8, np.uint8), np.zeros(10, np.uint8),
                         fec0="bogus")
