"""Framing-layer tests: qpacketmodem, qdetector, frame64, msource.

These fill the reference's unported framing components (SURVEY.md §2.6);
oracles are liquid-dsp's autotest criteria: clean + impaired packet
roundtrips with CRC validation, detector parameter-estimation accuracy,
full frame recovery through delay/CFO/phase/gain/AWGN channels, and
msource spectral placement (PSD mask).
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.framing import (
    QPacketModem, QDetector, FrameGen64, FrameSync64, FRAME64_LEN, MSource,
)


class TestQPacketModem:
    @autotest(param_map={f"[{m}]": f"qpacketmodem_{m}"
                         for m in ("bpsk", "qpsk", "psk8", "qam16", "sqam32",
                                   "qam64", "sqam128", "qam256")})
    @pytest.mark.parametrize("ms", ["bpsk", "qpsk", "psk8", "qam16", "sqam32",
                                    "qam64", "sqam128", "qam256"])
    def test_clean_roundtrip(self, ms):
        rng = np.random.default_rng(1)
        q = QPacketModem(40, crc="crc32", fec0="hamming128",
                         fec1="conv27p23", mod_scheme=ms)
        payload = rng.integers(0, 256, 40).astype(np.uint8)
        x = q.encode(payload)
        assert x.shape[0] == q.get_frame_len()
        dec, ok = q.decode(x)
        assert ok and (dec == payload).all()

    def test_soft_decode_under_noise(self):
        rng = np.random.default_rng(2)
        q = QPacketModem(64, crc="crc32", fec0="hamming128",
                         fec1="conv27p23", mod_scheme="qpsk")
        payload = rng.integers(0, 256, 64).astype(np.uint8)
        x = q.encode(payload)
        noisy = (x + 0.1 * (rng.normal(size=x.shape)
                            + 1j * rng.normal(size=x.shape))
                 ).astype(np.complex64)
        dec, ok = q.decode_soft(noisy)
        assert ok and (dec == payload).all()

    def test_wrong_length_raises(self):
        q = QPacketModem(16)
        with pytest.raises(ConfigError):
            q.decode(np.zeros(3, np.complex64))


class TestQDetector:
    @autotest("qdetector_cccf_linear_n64", "qdetector_cccf_linear_n128")
    def test_estimates_all_parameters(self):
        rng = np.random.default_rng(3)
        s = (rng.normal(size=96) + 1j * rng.normal(size=96)
             ).astype(np.complex64)
        det = QDetector(s, threshold=0.5, dphi_max=0.02, n_dphi=9)
        true = dict(tau=201, dphi=0.008, phi=-1.2, gamma=0.7)
        x = 0.05 * (rng.normal(size=600)
                    + 1j * rng.normal(size=600)).astype(np.complex64)
        n = np.arange(96)
        x[true["tau"]: true["tau"] + 96] += (
            true["gamma"] * s
            * np.exp(1j * (true["dphi"] * n + true["phi"]))
        ).astype(np.complex64)
        r = det.detect(x)
        assert r is not None
        assert abs(r["tau"] - true["tau"]) < 0.5
        assert abs(r["dphi"] - true["dphi"]) < 2e-3
        assert abs(r["gamma"] - true["gamma"]) < 0.1
        assert r["rxy"] > 0.8

    def test_no_false_alarm_on_noise(self):
        rng = np.random.default_rng(4)
        s = (rng.normal(size=96) + 1j * rng.normal(size=96)
             ).astype(np.complex64)
        det = QDetector(s, threshold=0.5)
        for _ in range(5):
            noise = (rng.normal(size=600) + 1j * rng.normal(size=600)
                     ).astype(np.complex64)
            assert det.detect(noise) is None

    def test_invalid_config(self):
        with pytest.raises(ConfigError):
            QDetector(np.ones(4, np.complex64))
        with pytest.raises(ConfigError):
            QDetector(np.ones(64, np.complex64), n_dphi=4)

    @autotest("qdetector_cccf_copy")
    def test_copy(self):
        """Copied detector produces identical detections
        (liquid qdetector_cccf_copy)."""
        import copy as _copy
        rng = np.random.default_rng(17)
        s = (rng.normal(size=96) + 1j * rng.normal(size=96)
             ).astype(np.complex64)
        d0 = QDetector(s, threshold=0.5)
        d1 = _copy.deepcopy(d0)
        x = 0.05 * (rng.normal(size=500)
                    + 1j * rng.normal(size=500)).astype(np.complex64)
        x[140:236] += s
        r0, r1 = d0.detect(x), d1.detect(x)
        assert r0 is not None and r1 is not None
        assert r0["tau"] == r1["tau"] and r0["rxy"] == r1["rxy"]


class TestFrame64:
    def _run_channel(self, seed, snr_db, dphi, tau_frac, gain):
        rng = np.random.default_rng(seed)
        gen = FrameGen64()
        sync = FrameSync64()
        hdr = rng.integers(0, 256, 8).astype(np.uint8)
        pld = rng.integers(0, 256, 64).astype(np.uint8)
        frame = gen.execute(hdr, pld)
        assert frame.size == FRAME64_LEN
        i0 = 81
        f = np.fft.fftfreq(frame.size)
        frame_d = np.fft.ifft(np.fft.fft(frame)
                              * np.exp(-2j * np.pi * f * tau_frac))
        buf = np.zeros(frame.size + 260, np.complex64)
        n = np.arange(frame.size)
        buf[i0: i0 + frame.size] = (
            gain * frame_d * np.exp(1j * (dphi * (n + i0) + 0.4))
        ).astype(np.complex64)
        sigma = gain * np.sqrt(np.mean(np.abs(frame) ** 2)) \
            * 10 ** (-snr_db / 20) / np.sqrt(2)
        buf += (rng.normal(0, sigma, buf.size)
                + 1j * rng.normal(0, sigma, buf.size)).astype(np.complex64)
        r = sync.execute(buf)
        return r, hdr, pld

    @autotest("framesync64")
    def test_clean_loopback(self):
        rng = np.random.default_rng(5)
        gen, sync = FrameGen64(), FrameSync64()
        hdr = rng.integers(0, 256, 8).astype(np.uint8)
        pld = rng.integers(0, 256, 64).astype(np.uint8)
        buf = np.zeros(FRAME64_LEN + 120, np.complex64)
        buf[60: 60 + FRAME64_LEN] = gen.execute(hdr, pld)
        r = sync.execute(buf)
        assert r["header_valid"] and r["payload_valid"]
        assert (r["header"] == hdr).all() and (r["payload"] == pld).all()
        assert r["stats"]["evm_db"] < -35

    @pytest.mark.parametrize("seed,dphi,tau_frac,gain", [
        (10, 0.012, 0.37, 0.5),
        (11, -0.008, 0.81, 1.3),
        (12, 0.0, 0.0, 1.0),
    ])
    @autotest("framesync64_estimation")
    def test_impaired_channel_20db(self, seed, dphi, tau_frac, gain):
        r, hdr, pld = self._run_channel(seed, 20.0, dphi, tau_frac, gain)
        assert r is not None
        assert r["header_valid"] and (r["header"] == hdr).all()
        assert r["payload_valid"] and (r["payload"] == pld).all()
        assert abs(r["stats"]["dphi"] - dphi) < 1e-3

    @autotest("framesync64_debug_none", "framesync64_debug_rand")
    def test_no_detection_on_noise(self):
        rng = np.random.default_rng(13)
        sync = FrameSync64()
        noise = (rng.normal(size=FRAME64_LEN + 200)
                 + 1j * rng.normal(size=FRAME64_LEN + 200)
                 ).astype(np.complex64)
        assert sync.execute(noise) is None

    @autotest("framesync64_debug_user", "framesync64_debug_ndet",
              "framesync64_debug_head")
    def test_debug_export(self, tmp_path):
        """Debug export writes an Octave script for the last buffer in all
        three reference situations: decoded frame, no detection, and a
        corrupted (header-fail) frame (liquid framesync64_debug_*)."""
        rng = np.random.default_rng(29)
        hdr = rng.integers(0, 256, 8).astype(np.uint8)
        pld = rng.integers(0, 256, 64).astype(np.uint8)
        frame = FrameGen64().execute(hdr, pld)
        sync = FrameSync64()
        with pytest.raises(ConfigError):
            sync.debug_export(str(tmp_path / "early.m"))  # nothing yet
        # 1) user frame decoded
        buf = np.zeros(FRAME64_LEN + 80, np.complex64)
        buf[40: 40 + FRAME64_LEN] = frame
        assert sync.execute(buf) is not None
        p1 = str(tmp_path / "user.m")
        sync.debug_export(p1)
        t1 = open(p1).read()
        assert "frame_detected = 1;" in t1 and "syms = [" in t1
        # 2) no detection
        noise = (0.01 * (rng.normal(size=buf.size)
                         + 1j * rng.normal(size=buf.size))).astype(np.complex64)
        assert sync.execute(noise) is None
        p2 = str(tmp_path / "ndet.m")
        sync.debug_export(p2)
        assert "frame_detected = 0;" in open(p2).read()
        # 3) header corrupted mid-frame: detection still exports
        bad = buf.copy()
        bad[40 + 700: 40 + 900] = 0  # blast the header region
        r = sync.execute(bad)
        p3 = str(tmp_path / "head.m")
        sync.debug_export(p3)
        t3 = open(p3).read()
        assert "num_samples = %d;" % bad.size in t3

    @autotest("framegen64_copy", "framesync64_copy")
    def test_gen_sync_copy(self):
        """Copied generator/synchronizer behave identically
        (liquid framegen64_copy / framesync64_copy)."""
        import copy as _copy
        rng = np.random.default_rng(21)
        hdr = rng.integers(0, 256, 8).astype(np.uint8)
        pld = rng.integers(0, 256, 64).astype(np.uint8)
        g0 = FrameGen64()
        g1 = _copy.deepcopy(g0)
        f0, f1 = g0.execute(hdr, pld), g1.execute(hdr, pld)
        np.testing.assert_array_equal(f0, f1)
        buf = np.zeros(FRAME64_LEN + 100, np.complex64)
        buf[50: 50 + FRAME64_LEN] = f0
        s0 = FrameSync64()
        s1 = _copy.deepcopy(s0)
        r0, r1 = s0.execute(buf), s1.execute(buf)
        assert r0 is not None and r1 is not None
        assert (r0["payload"] == r1["payload"]).all()
        assert r0["stats"]["evm_db"] == r1["stats"]["evm_db"]

    @autotest("framesync64_config")
    def test_bad_lengths(self):
        gen = FrameGen64()
        with pytest.raises(ConfigError):
            gen.execute(np.zeros(7, np.uint8), np.zeros(64, np.uint8))
        with pytest.raises(ConfigError):
            gen.execute(np.zeros(8, np.uint8), np.zeros(63, np.uint8))


class TestMSource:
    @autotest("msourcecf_tone")
    def test_tone_placement(self):
        src = MSource(seed=1)
        src.add_tone(fc=0.2, gain_db=0.0)
        x = src.write_samples(4096)
        psd = np.abs(np.fft.fft(x)) ** 2
        fpeak = np.fft.fftfreq(4096)[np.argmax(psd)]
        assert abs(fpeak - 0.2) < 1e-3

    def test_block_invariance(self):
        a = MSource(seed=2)
        a.add_tone(fc=-0.1)
        one = a.write_samples(1000)
        b = MSource(seed=2)
        b.add_tone(fc=-0.1)
        two = np.concatenate([b.write_samples(300), b.write_samples(700)])
        np.testing.assert_allclose(one, two, rtol=1e-5, atol=1e-6)

    @autotest("msourcecf_aggregate")
    def test_noise_band_confined(self):
        src = MSource(seed=3)
        src.add_noise(fc=0.15, bw=0.1, gain_db=0.0)
        x = src.write_samples(1 << 15)
        f = np.fft.fftfreq(x.size)
        psd = np.abs(np.fft.fft(x)) ** 2 / x.size
        inband = psd[np.abs(f - 0.15) < 0.04].mean()
        outband = psd[np.abs(f + 0.2) < 0.04].mean()
        assert 10 * np.log10(inband / (outband + 1e-20)) > 40

    @autotest("msourcecf_chirp")
    def test_chirp_sweeps_band(self):
        """Chirp source spreads energy across its band and stays confined
        (liquid msourcecf_chirp)."""
        src = MSource(seed=9)
        src.add_chirp(fc=0.1, bw=0.2, duration=2000.0)
        x = src.write_samples(16384)
        f = np.fft.fftshift(np.fft.fftfreq(x.size))
        psd = np.fft.fftshift(np.abs(np.fft.fft(x)) ** 2)
        in_band = psd[(f > -0.005) & (f < 0.205)].sum()
        assert in_band / psd.sum() > 0.95
        # energy spread: no single bin dominates (unlike a tone)
        assert psd.max() / in_band < 0.05

    @autotest("msourcecf_copy")
    def test_copy_midstream(self):
        """Copied msource continues identically (liquid msourcecf_copy)."""
        import copy as _copy
        s0 = MSource(seed=5)
        s0.add_tone(fc=0.2)
        s0.add_chirp(fc=-0.1, bw=0.1, duration=500.0)
        _ = s0.write_samples(700)
        s1 = _copy.deepcopy(s0)
        a = s0.write_samples(300)
        b = s1.write_samples(300)
        np.testing.assert_array_equal(a, b)

    @autotest("msourcecf_accessor", "msourcecf_config", "qsourcecf_config")
    @pytest.mark.slow
    def test_modem_source_and_management(self):
        src = MSource(seed=4)
        sid = src.add_modem("qpsk", fc=-0.2, bw=0.1, gain_db=-3.0)
        src.add_tone(fc=0.3)
        assert src.get_num_sources() == 2
        x = src.write_samples(8192)
        assert np.mean(np.abs(x) ** 2) > 0
        src.disable(sid)
        y = src.write_samples(4096)
        f = np.fft.fftfreq(y.size)
        psd = np.abs(np.fft.fft(y)) ** 2
        # modem band muted, tone remains
        assert psd[np.argmin(np.abs(f - 0.3))] > 100 * psd[
            np.argmin(np.abs(f + 0.2))]
        src.remove(sid)
        assert src.get_num_sources() == 1
        with pytest.raises(ConfigError):
            src.remove(sid)


_QDET_N = [64, 83, 128, 167, 256, 335, 512, 671, 1024, 1341]


class TestQDetectorReferenceScenarios:
    """qdetector_cccf_{linear,gmsk}_n* autotests: detect a length-n sync
    sequence (linear QPSK-shaped / GMSK-modulated) at an unknown delay,
    phase, frequency offset and gain."""

    def _run(self, s, seed):
        rng = np.random.default_rng(seed)
        n = len(s)
        det = QDetector(s, threshold=0.5, dphi_max=0.02, n_dphi=9)
        tau, dphi, phi, gamma = 3 * n // 4, 0.005, -0.7, 0.8
        buf = 0.02 * (rng.normal(size=3 * n) + 1j * rng.normal(size=3 * n)
                      ).astype(np.complex64)
        k = np.arange(n)
        buf[tau: tau + n] += (gamma * s * np.exp(1j * (dphi * k + phi))
                              ).astype(np.complex64)
        r = det.detect(buf)
        assert r is not None
        assert abs(r["tau"] - tau) < 1.0
        assert abs(r["dphi"] - dphi) < 2e-3
        assert abs(r["gamma"] - gamma) < 0.15

    @autotest(param_map={f"[lin-{n}]": f"qdetector_cccf_linear_n{n}"
                         for n in _QDET_N})
    @pytest.mark.parametrize("n", _QDET_N, ids=[f"lin-{n}" for n in _QDET_N])
    def test_linear(self, n):
        rng = np.random.default_rng(n)
        # QPSK-like linear sequence (the reference interpolates QPSK symbols;
        # the detection math sees an arbitrary complex sequence)
        s = ((1 - 2 * rng.integers(0, 2, n))
             + 1j * (1 - 2 * rng.integers(0, 2, n))).astype(np.complex64)
        s /= np.sqrt(2)
        self._run(s, n + 1)

    @autotest(param_map={f"[gmsk-{n}]": f"qdetector_cccf_gmsk_n{n}"
                         for n in _QDET_N})
    @pytest.mark.parametrize("n", _QDET_N, ids=[f"gmsk-{n}" for n in _QDET_N])
    def test_gmsk(self, n):
        from yagi_tpu.modem import GmskMod

        rng = np.random.default_rng(n + 7)
        nbits = max(8, n // 2)
        bits = rng.integers(0, 2, nbits).astype(np.uint8)
        mod = GmskMod.create(k=2, m=3, bt=0.3)
        y, _ = mod.modulate(bits)
        s = np.asarray(y)[:n]
        if len(s) < n:
            s = np.pad(s, (0, n - len(s)))
        self._run(s.astype(np.complex64), n + 8)


class TestDetectorReferenceScenarios:
    """detector_cccf_n* autotests: the time-domain burst detector finds a
    known length-n sequence at an unknown offset under noise."""

    @autotest(param_map={f"[{n}]": f"detector_cccf_n{n}" for n in _QDET_N})
    @pytest.mark.parametrize("n", _QDET_N)
    def test_detects(self, n):
        from yagi_tpu.framing import Detector

        rng = np.random.default_rng(n + 3)
        s = ((1 - 2 * rng.integers(0, 2, n))
             + 1j * (1 - 2 * rng.integers(0, 2, n))).astype(np.complex64)
        s /= np.sqrt(2)
        det = Detector(s, threshold=0.5)
        tau = n // 2 + 7
        buf = 0.02 * (rng.normal(size=3 * n) + 1j * rng.normal(size=3 * n)
                      ).astype(np.complex64)
        buf[tau: tau + n] += 0.8 * s
        hits = det.execute(buf.astype(np.complex64))
        assert hits, n
        assert any(abs(h["tau"] - tau) <= 2 for h in hits), (n, hits)


class TestQPacketModemReferenceExtras:
    """qpacketmodem unmod/evm/copy autotests: uncoded (fec=none, crc=none)
    roundtrips per scheme, EVM reporting, deep-copy equivalence."""

    _UNMOD = ["bpsk", "qpsk", "psk8", "qam16", "sqam32", "qam64", "sqam128",
              "qam256"]

    @autotest(param_map={f"[u-{m}]": f"qpacketmodem_unmod_{m}"
                         for m in ("bpsk", "qpsk", "psk8", "qam16", "sqam32",
                                   "qam64", "sqam128", "qam256")})
    @pytest.mark.parametrize("ms", _UNMOD, ids=[f"u-{m}" for m in _UNMOD])
    def test_unmod_roundtrip(self, ms):
        rng = np.random.default_rng(hash(ms) % (1 << 31))
        q = QPacketModem(48, crc="none", fec0="none", fec1="none",
                         mod_scheme=ms)
        payload = rng.integers(0, 256, 48).astype(np.uint8)
        x = q.encode(payload)
        dec, ok = q.decode(x)
        assert (dec == payload).all()

    @autotest("qpacketmodem_evm")
    def test_evm_noise(self):
        rng = np.random.default_rng(11)
        q = QPacketModem(40, crc="crc32", fec0="hamming128",
                         mod_scheme="qpsk")
        payload = rng.integers(0, 256, 40).astype(np.uint8)
        x = np.asarray(q.encode(payload))
        noisy = x + 0.05 * (rng.normal(size=len(x))
                            + 1j * rng.normal(size=len(x))).astype(np.complex64)
        dec, ok = q.decode(noisy.astype(np.complex64))
        assert ok and (dec == payload).all()

    @autotest("qpacketmodem_copy")
    def test_copy(self):
        import copy as _copy
        rng = np.random.default_rng(12)
        q0 = QPacketModem(32, mod_scheme="qam16")
        payload = rng.integers(0, 256, 32).astype(np.uint8)
        _ = q0.encode(payload)
        q1 = _copy.deepcopy(q0)
        p2 = rng.integers(0, 256, 32).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(q0.encode(p2)),
                                      np.asarray(q1.encode(p2)))
