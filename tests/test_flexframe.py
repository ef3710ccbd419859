"""flexframe and gmskframe tests.

Modeled on liquid's flexframesync and gmskframesync_* autotests: frames
assembled with varying payload properties are recovered from a channel
with delay, carrier offset, phase rotation, gain, and noise; the
synchronizer learns the payload configuration from the header.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.framing import (
    FlexFrameGen, FlexFrameSync, GmskFrameGen, GmskFrameSync,
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


class TestFlexFrame:
    @pytest.mark.parametrize("mod,crc,fec0,fec1,plen", [
        ("qpsk", "crc32", "none", "none", 64),
        pytest.param("qam16", "crc32", "hamming128", "none", 120,
                     marks=pytest.mark.slow),
        pytest.param("qpsk", "crc16", "golay2412", "none", 40,
                     marks=pytest.mark.slow),
        pytest.param("psk8", "crc32", "hamming74", "conv27p23", 80,
                     marks=pytest.mark.slow),
        ("bpsk", "crc24", "none", "rep3", 30),
    ])
    @autotest("flexframesync")
    def test_roundtrip_props(self, mod, crc, fec0, fec1, plen):
        """liquid autotest flexframesync model: payload properties signaled
        in-band are recovered and the payload decodes CRC-clean."""
        gen = FlexFrameGen(header_len=14)
        sync = FlexFrameSync(header_len=14)
        rng = np.random.default_rng(plen)
        header = rng.integers(0, 256, 14).astype(np.uint8)
        payload = rng.integers(0, 256, plen).astype(np.uint8)
        tx = gen.assemble(header, payload, mod_scheme=mod, crc=crc,
                          fec0=fec0, fec1=fec1)
        rx = _channel(tx, delay=97, dphi=0.003, phi=1.1, gamma=0.8,
                      snr_db=30, seed=plen)
        res = sync.execute(rx)
        assert res is not None
        assert res["header_valid"]
        np.testing.assert_array_equal(res["header"], header)
        assert res["props"]["mod_scheme"] == mod
        assert res["props"]["crc"] == crc
        assert res["props"]["fec0"] == fec0
        assert res["props"]["fec1"] == fec1
        assert res["props"]["payload_len"] == plen
        assert res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)
        assert res["stats"]["evm_db"] < -15.0

    def test_no_detection(self):
        rng = np.random.default_rng(0)
        sync = FlexFrameSync()
        noise = 0.01 * (rng.standard_normal(4096)
                        + 1j * rng.standard_normal(4096))
        assert sync.execute(noise.astype(np.complex64)) is None

    def test_config_errors(self):
        gen = FlexFrameGen(header_len=4)
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(3, np.uint8), np.zeros(10, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(4, np.uint8), np.zeros(0, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(4, np.uint8), np.zeros(8, np.uint8),
                         mod_scheme="nope")
        with pytest.raises(ConfigError):
            FlexFrameGen(header_len=-1)


class TestGmskFrame:
    _REF = [(2, 5, 0.2), (2, 5, 0.3), (2, 5, 0.4), (4, 5, 0.2),
            (4, 5, 0.3), (4, 5, 0.4), (3, 7, 0.2), (8, 20, 0.15),
            (15, 2, 0.4)]

    @autotest(param_map={
        f"[k{k}-m{m}-{bt}]":
        f"gmskframesync_k{k:02d}_m{m:02d}_bt{int(round(bt * 100)):02d}"
        for k, m, bt in _REF})
    @pytest.mark.parametrize("k,m,bt", [
        c if i == 0 else pytest.param(*c, marks=pytest.mark.slow)
        for i, c in enumerate(_REF)],
                             ids=[f"k{k}-m{m}-{bt}" for k, m, bt in _REF])
    def test_roundtrip_kmbt(self, k, m, bt):
        """liquid autotest gmskframesync_k*_m*_bt* model."""
        gen = GmskFrameGen(k=k, m=m, bt=bt, header_len=8)
        sync = GmskFrameSync(k=k, m=m, bt=bt, header_len=8)
        rng = np.random.default_rng(int(k * 100 + m * 10 + bt * 10))
        header = rng.integers(0, 256, 8).astype(np.uint8)
        payload = rng.integers(0, 256, 40).astype(np.uint8)
        tx = gen.assemble(header, payload, crc="crc32",
                          fec0="hamming128", fec1="none")
        rx = _channel(tx, delay=71, dphi=0.002, phi=0.7, gamma=1.3,
                      snr_db=25, seed=m)
        res = sync.execute(rx)
        assert res is not None
        assert res["header_valid"]
        np.testing.assert_array_equal(res["header"], header)
        assert res["props"]["payload_len"] == 40
        assert res["payload_valid"]
        np.testing.assert_array_equal(res["payload"], payload)

    @autotest("gmskframesync_process", "gmskframesync_multiple")
    def test_multiple_frames(self):
        """liquid autotest gmskframesync_multiple model: several frames in
        one stream are each recovered."""
        gen = GmskFrameGen(k=2, m=4, bt=0.3)
        sync = GmskFrameSync(k=2, m=4, bt=0.3)
        rng = np.random.default_rng(5)
        found = 0
        stream = [np.zeros(50, np.complex64)]
        payloads = []
        flen = None
        for i in range(3):
            h = rng.integers(0, 256, 8).astype(np.uint8)
            p = rng.integers(0, 256, 25).astype(np.uint8)
            payloads.append((h, p))
            tx = gen.assemble(h, p)
            flen = tx.size
            stream.append(tx)
            stream.append(np.zeros(80, np.complex64))
        buf = np.concatenate(stream)
        nstd = 10 ** (-30 / 20) / np.sqrt(2)
        buf = (buf + nstd * (rng.standard_normal(buf.size)
                             + 1j * rng.standard_normal(buf.size))
               ).astype(np.complex64)
        # scan in one-frame windows: detect, decode, advance past the frame
        pos = 0
        while pos < buf.size and found < 3:
            win = buf[pos: pos + flen + 130]
            if win.size < flen:
                break
            res = sync.execute(win)
            if res is None:
                pos += flen // 2
                continue
            h, p = payloads[found]
            assert res["payload_valid"]
            np.testing.assert_array_equal(res["header"], h)
            np.testing.assert_array_equal(res["payload"], p)
            found += 1
            pos += int(res["stats"]["tau"]) + flen
        assert found == 3

    def test_no_detection(self):
        rng = np.random.default_rng(1)
        sync = GmskFrameSync(k=2, m=4, bt=0.3)
        noise = 0.01 * (rng.standard_normal(4096)
                        + 1j * rng.standard_normal(4096))
        assert sync.execute(noise.astype(np.complex64)) is None

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            GmskFrameGen(k=1)
        with pytest.raises(ConfigError):
            GmskFrameGen(bt=1.5)
        gen = GmskFrameGen()
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(7, np.uint8), np.zeros(10, np.uint8))
        with pytest.raises(ConfigError):
            gen.assemble(np.zeros(8, np.uint8), np.zeros(4, np.uint8),
                         crc="bogus")
