"""Buffers (Window/WDelay/CBuffer) + bit-level sync layer (BSync, Detector,
BPacketGen/BPacketSync).

Window/WDelay scenarios replicate the reference's autotests
(/root/reference/src/buffer/window.rs:109-210, wdelay.rs:60-120); CBuffer
covers liquid's cbuffer semantics the reference left unported. BSync /
Detector / BPacket fill LIQUID_COMPAT.md's bsync / detector / bpacketsync
rows (never ported by the reference).
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.buffer import CBuffer, WDelay, Window
from yagi_tpu.errors import ConfigError, ValueRangeError
from yagi_tpu.framing import BPacketGen, BPacketSync, BSync, Detector
from yagi_tpu.sequence import MSequence


class TestWindow:
    @autotest("windowf")
    def test_autotest_windowf(self):
        # reference autotest_windowf sequence (window.rs:110-209)
        v = [9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0, 0.0]
        w = Window(10)
        assert np.allclose(w.read(), np.zeros(10))
        for _ in range(4):
            w.push(1.0)
        assert np.allclose(w.read(), [0, 0, 0, 0, 0, 0, 1, 1, 1, 1])
        w.write(v[0:4])
        assert np.allclose(w.read(), [0, 0, 1, 1, 1, 1, 9, 8, 7, 6])
        for _ in range(4):
            w.push(3.0)
        assert np.allclose(w.read(), [1, 1, 9, 8, 7, 6, 3, 3, 3, 3])
        assert w.index(0) == 1.0 and w.index(2) == 9.0 and w.index(9) == 3.0
        with pytest.raises(ValueRangeError):
            w.index(999)
        for _ in range(4):
            w.push(5.0)
        assert np.allclose(w.read(), [7, 6, 3, 3, 3, 3, 5, 5, 5, 5])
        w.resize(6)
        assert np.allclose(w.read(), [3, 3, 5, 5, 5, 5])
        w.push(6.0)
        w.push(7.0)
        assert np.allclose(w.read(), [5, 5, 5, 5, 6, 7])
        w.resize(10)
        assert np.allclose(w.read(), [0, 0, 0, 0, 5, 5, 5, 5, 6, 7])
        w.reset()
        assert np.allclose(w.read(), np.zeros(10))

    @autotest("window_config_errors")
    def test_config_errors(self):
        with pytest.raises(ConfigError):
            Window(0)

    @autotest("window_copy")
    def test_copy(self):
        """Copied window carries the same history (liquid window_copy)."""
        import copy as _copy
        w0 = Window(6)
        w0.write([1.0, 2.0, 3.0])
        w1 = _copy.deepcopy(w0)
        assert np.allclose(w0.read(), w1.read())
        w0.push(4.0)
        w1.push(4.0)
        assert np.allclose(w0.read(), w1.read())
        # independence after the copy
        w1.push(9.0)
        assert not np.allclose(w0.read(), w1.read())


class TestWDelay:
    @autotest("wdelayf")
    def test_delay(self):
        # zeros until primed, then delayed-by-k stream (wdelay.rs autotest)
        d = WDelay(3)
        out = []
        for x in range(1, 9):
            d.push(float(x))
            out.append(d.read())  # push-then-read: y[k] = x[k - delay]
        assert np.allclose(out, [0, 0, 0, 1, 2, 3, 4, 5])

    @autotest("wdelay_copy")
    def test_recreate_preserves_history(self):
        # exact reference semantics (wdelay.rs:27-44): history replayed into
        # the longer line, so two extra zeros precede the preserved samples
        d = WDelay(2)
        for x in [1.0, 2.0, 3.0]:
            d.push(x)
        d.recreate(4)
        seq = []
        for x in [4.0, 5.0, 6.0, 7.0]:
            seq.append(d.read())
            d.push(x)
        assert seq == [0.0, 0.0, 1.0, 2.0]

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            WDelay(0)


class TestCBuffer:
    @autotest("cbufferf", "cbuffercf", "cbufferf_flow")
    def test_push_read_release(self):
        cb = CBuffer(10)
        cb.write([1, 2, 3, 4])
        assert cb.size() == 4
        assert np.allclose(cb.read(4), [1, 2, 3, 4])
        cb.release(2)
        assert cb.size() == 2
        cb.write(np.arange(5, 13))  # 8 more -> full wrap-around
        assert cb.is_full()
        assert np.allclose(cb.read(10), [3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
        with pytest.raises(ValueRangeError):
            cb.push(99)
        assert cb.pop() == 3
        cb.push(13)
        assert np.allclose(cb.read(10), [4, 5, 6, 7, 8, 9, 10, 11, 12, 13])

    @autotest("cbufferf_config")
    def test_errors(self):
        with pytest.raises(ConfigError):
            CBuffer(0)

    @autotest("cbuffer_copy")
    def test_copy(self):
        """Copied circular buffer reads identically (liquid cbuffer_copy)."""
        import copy as _copy
        cb0 = CBuffer(8)
        cb0.write([1, 2, 3, 4, 5])
        cb0.release(2)
        cb1 = _copy.deepcopy(cb0)
        assert cb0.size() == cb1.size()
        assert np.allclose(cb0.read(3), cb1.read(3))
        cb1.push(9)
        assert cb1.size() == cb0.size() + 1
        cb = CBuffer(4)
        with pytest.raises(ValueRangeError):
            cb.release(1)
        with pytest.raises(ValueRangeError):
            cb.pop()
        with pytest.raises(ValueRangeError):
            cb.write([1, 2, 3, 4, 5])


class TestBSync:
    @autotest("bsync_rrrf_15")
    def test_detect_real(self):
        ms = MSequence.create_default(6)
        sync = BSync.from_msequence(ms)
        seq = 2.0 * np.asarray(
            MSequence.create_default(6).generate_bits(63), np.float32) - 1.0
        rng = np.random.default_rng(7)
        x = np.sign(rng.standard_normal(500)).astype(np.float32)
        pos = 217
        x[pos: pos + 63] = seq
        rxy, _ = sync.execute_block(x[None, :])
        rxy = np.asarray(rxy)[0]
        k = int(np.argmax(rxy))
        assert k == pos + 62  # window *ends* at the last template sample
        assert rxy[k] == pytest.approx(1.0)
        # everywhere else the correlation stays low
        mask = np.ones_like(rxy, bool)
        mask[k] = False
        assert np.max(np.abs(rxy[mask])) < 0.6

    @autotest("bsync_crcf_15")
    def test_detect_complex_and_split_invariance(self):
        ms = MSequence.create_default(6)
        sync = BSync.from_msequence(ms)
        seq = 2.0 * np.asarray(
            MSequence.create_default(6).generate_bits(63), np.float32) - 1.0
        rng = np.random.default_rng(3)
        x = (np.sign(rng.standard_normal(400))
             + 1j * np.sign(rng.standard_normal(400))).astype(np.complex64)
        pos = 151
        x[pos: pos + 63] = seq * (1 + 1j)
        full, _ = sync.execute_block(x)
        full = np.asarray(full)
        k = int(np.argmax(np.abs(full)))
        assert k == pos + 62
        assert full[k] == pytest.approx(1.0 + 1.0j, abs=1e-6)
        # split into 3 uneven blocks with state carry -> identical output
        state = None
        parts = []
        for blk in np.split(x, [97, 260]):
            r, state = sync.execute_block(blk, state)
            parts.append(np.asarray(r))
        assert np.allclose(np.concatenate(parts), full)


class TestDetector:
    def _template(self, n=80, seed=11):
        rng = np.random.default_rng(seed)
        return np.exp(2j * np.pi * rng.random(n)).astype(np.complex64)

    def test_two_bursts_across_blocks(self):
        s = self._template()
        rng = np.random.default_rng(5)
        N = 2000
        x = 0.05 * (rng.standard_normal(N)
                    + 1j * rng.standard_normal(N)).astype(np.complex64)
        taus = [300, 1010]  # second burst straddles the 1024 block boundary
        dphi_true = 0.01
        n = np.arange(s.size)
        for t in taus:
            x[t: t + s.size] += 0.9 * s * np.exp(1j * dphi_true * n)
        det = Detector(s, threshold=0.5, dphi_max=0.02, n_dphi=9)
        hits = det.execute(x[:1024]) + det.execute(x[1024:])
        assert len(hits) == 2
        for hit, t in zip(hits, taus):
            assert abs(hit["tau"] - t) < 0.5
            assert abs(hit["dphi"] - dphi_true) < 2e-3
            assert abs(hit["gamma"] - 0.9) < 0.05
        # quiet stream -> no detections
        det.reset()
        assert det.execute(0.05 * (rng.standard_normal(500)
                                   + 1j * rng.standard_normal(500))) == []


class TestBPacket:
    def _roundtrip(self, crc, fec0, fec1, n_err=0, seed=0):
        rng = np.random.default_rng(seed)
        payload = rng.integers(0, 256, 40, dtype=np.uint8)
        gen = BPacketGen(40, crc, fec0, fec1)
        pkt = gen.encode(payload)
        assert pkt.size == gen.get_packet_len()
        bits = np.unpackbits(pkt)
        if n_err:
            idx = rng.choice(bits.size, n_err, replace=False)
            bits[idx] ^= 1
        got = []
        sync = BPacketSync(lambda p, ok, hdr: got.append((p, ok, hdr)))
        # garbage before, packet, garbage after — fed in odd-sized chunks
        stream = np.concatenate([
            rng.integers(0, 2, 101, dtype=np.uint8), bits,
            rng.integers(0, 2, 57, dtype=np.uint8)])
        for chunk in np.array_split(stream, 7):
            sync.execute_bits(chunk)
        assert len(got) == 1
        p, ok, hdr = got[0]
        assert ok
        assert np.array_equal(p, payload)
        assert hdr["payload_len"] == 40
        return hdr

    @autotest("bpacketsync")
    def test_clean_roundtrip(self):
        hdr = self._roundtrip("crc32", "none", "none")
        assert hdr["fec0"] == "none"

    def test_fec_corrects_errors(self):
        # hamming84 inner + conv27 outer survives scattered bit errors
        self._roundtrip("crc32", "hamming84", "conv27", n_err=6, seed=2)

    def test_back_to_back_packets_mixed_config(self):
        rng = np.random.default_rng(9)
        p1 = rng.integers(0, 256, 16, dtype=np.uint8)
        p2 = rng.integers(0, 256, 32, dtype=np.uint8)
        b1 = np.unpackbits(BPacketGen(16, "crc16", "rep3", "none").encode(p1))
        b2 = np.unpackbits(BPacketGen(32, "crc32", "none", "hamming74").encode(p2))
        got = []
        sync = BPacketSync(lambda p, ok, hdr: got.append((p.copy(), ok, hdr)))
        sync.execute_bits(np.concatenate([b1, b2]))
        assert len(got) == 2
        assert np.array_equal(got[0][0], p1) and got[0][1]
        assert np.array_equal(got[1][0], p2) and got[1][1]
        assert got[0][2]["fec0"] == "rep3"
        assert got[1][2]["fec1"] == "hamming74"

    def test_byte_interface(self):
        payload = np.arange(20, dtype=np.uint8)
        gen = BPacketGen(20)
        got = []
        sync = BPacketSync(lambda p, ok, hdr: got.append((p, ok)))
        sync.execute(gen.encode(payload).tobytes())
        assert len(got) == 1 and got[0][1]
        assert np.array_equal(got[0][0], payload)

    def test_config_errors(self):
        with pytest.raises(ConfigError):
            BPacketGen(0)
        with pytest.raises(ConfigError):
            BPacketGen(1 << 16)
