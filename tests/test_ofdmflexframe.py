"""ofdmflexframe tests.

Modeled on liquid's ofdmflexframe_00..09 autotests: frames with varying
subcarrier counts, cyclic prefixes, and payload properties recovered
through channels with delay, CFO, multipath, and noise.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.multichannel import OfdmFlexFrameGen, OfdmFlexFrameSync


def _channel(tx, delay, cfo, phi, snr_db, seed, taps=None):
    rng = np.random.default_rng(seed)
    buf = np.concatenate([np.zeros(delay, np.complex64), tx,
                          np.zeros(64, np.complex64)])
    if taps is not None:
        buf = np.convolve(buf, taps)[: buf.size]
    n = np.arange(buf.size)
    buf = buf * np.exp(1j * (cfo * n + phi))
    nstd = 10 ** (-snr_db / 20) / np.sqrt(2)
    buf = buf + nstd * (rng.standard_normal(buf.size)
                        + 1j * rng.standard_normal(buf.size))
    return buf.astype(np.complex64)


class TestOfdmFlexFrame:
    _GRID = [
        (64, 16, "qpsk", "none", 64),       # ofdmflexframe_00 model
        (64, 16, "qam16", "hamming128", 100),
        (128, 16, "qpsk", "golay2412", 200),
        (64, 8, "psk8", "none", 40),
        (32, 8, "qpsk", "hamming74", 50),
        (64, 16, "bpsk", "conv27p23", 80),
        (64, 16, "qam64", "none", 120),
        (128, 32, "qam16", "conv27p45", 96),
        (32, 16, "qpsk", "secded2216", 72),
        (256, 32, "qpsk", "none", 150),
    ]

    @autotest(param_map={f"[g{i}]": f"ofdmflexframe_0{i}" for i in range(10)})
    @pytest.mark.parametrize("M,cp,mod,fec0,plen", [
        c if i < 2 else pytest.param(*c, marks=pytest.mark.slow)
        for i, c in enumerate(_GRID)],
                             ids=[f"g{i}" for i in range(10)])
    def test_roundtrip(self, M, cp, mod, fec0, plen):
        gen = OfdmFlexFrameGen(M=M, cp_len=cp, header_len=14)
        sync = OfdmFlexFrameSync(M=M, cp_len=cp, header_len=14)
        rng = np.random.default_rng(M + plen)
        header = rng.integers(0, 256, 14).astype(np.uint8)
        payload = rng.integers(0, 256, plen).astype(np.uint8)
        tx = gen.assemble(header, payload, mod_scheme=mod, crc="crc32",
                          fec0=fec0, fec1="none")
        rx = _channel(tx, delay=3 * cp, cfo=0.002, phi=0.9, snr_db=30,
                      seed=plen)
        res = sync.execute(rx)
        assert res is not None
        assert res["header_valid"]
        np.testing.assert_array_equal(res["header"], header)
        assert res["props"]["mod_scheme"] == mod
        assert res["props"]["fec0"] == fec0
        assert res["props"]["payload_len"] == plen
        assert res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)

    def test_multipath(self):
        """3-tap multipath is absorbed by the one-tap S1 equalizer."""
        gen = OfdmFlexFrameGen(M=64, cp_len=16)
        sync = OfdmFlexFrameSync(M=64, cp_len=16)
        rng = np.random.default_rng(1)
        header = rng.integers(0, 256, 14).astype(np.uint8)
        payload = rng.integers(0, 256, 80).astype(np.uint8)
        tx = gen.assemble(header, payload, mod_scheme="qpsk",
                          fec0="hamming128")
        taps = np.array([1.0, 0.25 - 0.15j, -0.1 + 0.08j], np.complex64)
        rx = _channel(tx, delay=40, cfo=-0.0015, phi=0.3, snr_db=28,
                      seed=2, taps=taps)
        res = sync.execute(rx)
        assert res is not None and res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)

    def test_no_detection(self):
        rng = np.random.default_rng(0)
        sync = OfdmFlexFrameSync(M=64, cp_len=16)
        noise = 0.01 * (rng.standard_normal(4096)
                        + 1j * rng.standard_normal(4096))
        assert sync.execute(noise.astype(np.complex64)) is None

    def test_short_buffer(self):
        sync = OfdmFlexFrameSync(M=64, cp_len=16)
        assert sync.execute(np.zeros(100, np.complex64)) is None

    @autotest("ofdmflexframegen_config", "ofdmflexframesync_config")
    def test_config_errors(self):
        gen = OfdmFlexFrameGen(M=64, cp_len=16, header_len=8)
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(7, np.uint8), np.zeros(10, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(8, np.uint8), np.zeros(0, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(8, np.uint8), np.zeros(8, np.uint8),
                         crc="bogus")
        with pytest.raises(ConfigError):
            OfdmFlexFrameGen(M=4)
