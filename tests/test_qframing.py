"""qpilotgen/qpilotsync and qdsync tests.

Modeled on liquid's qpilotsync_* (payload/spacing sweeps under gain, CFO
and phase impairments) and qdsync_cccf_k* (preamble sync at various
samples/symbol under delay + noise) autotests.
"""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.framing import QPilotGen, QPilotSync, QDSync
from yagi_tpu.modem import Modem


def _qpsk_payload(n, seed=0):
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, 4, n)
    modem = Modem.create("qpsk")
    x, _ = modem.modulate(syms.astype(np.uint32))
    return np.asarray(x), syms


class TestQPilot:
    @autotest(param_map={f"[{n}-{sp}]": f"qpilotsync_{n}_{sp}"
                         for n, sp in ((100, 16), (200, 20), (300, 24),
                                       (400, 28), (500, 32))})
    @pytest.mark.parametrize("payload_len,spacing", [
        (100, 16), (200, 20), (300, 24), (400, 28), (500, 32),
    ])
    def test_recover_impairments(self, payload_len, spacing):
        """liquid autotest qpilotsync_<len>_<spacing> model."""
        gen = QPilotGen(payload_len, spacing)
        sync = QPilotSync(payload_len, spacing)
        assert gen.get_frame_len() == sync.get_frame_len()
        payload, syms = _qpsk_payload(payload_len, seed=payload_len)
        frame = gen.execute(payload)
        # channel: gain, carrier frequency + phase offset
        gamma, dphi, phi = 0.7, 0.001, 2.1
        n = np.arange(frame.size)
        rx = gamma * frame * np.exp(1j * (dphi * n + phi))
        out, info = sync.execute(rx.astype(np.complex64))
        assert abs(info["dphi"] - dphi) < 1e-4
        assert abs(info["gain"] - gamma) < 0.02
        assert info["evm"] < 0.05
        # corrected payload demodulates error-free
        modem = Modem.create("qpsk")
        dsyms, _ = modem.demodulate(out)
        np.testing.assert_array_equal(np.asarray(dsyms), syms)

    def test_noisy(self):
        gen = QPilotGen(200, 20)
        sync = QPilotSync(200, 20)
        payload, syms = _qpsk_payload(200, seed=3)
        frame = gen.execute(payload)
        rng = np.random.default_rng(17)
        nstd = 10 ** (-30 / 20) / np.sqrt(2)
        n = np.arange(frame.size)
        rx = 1.2 * frame * np.exp(1j * (-0.002 * n + 0.5))
        rx = rx + nstd * (rng.standard_normal(rx.size)
                          + 1j * rng.standard_normal(rx.size))
        out, info = sync.execute(rx.astype(np.complex64))
        assert abs(info["dphi"] + 0.002) < 2e-4
        modem = Modem.create("qpsk")
        dsyms, _ = modem.demodulate(out)
        assert np.mean(np.asarray(dsyms) != syms) == 0.0

    @autotest("qpilotgen_config", "qpilotsync_config")
    def test_config_errors(self):
        with pytest.raises(ConfigError):
            QPilotGen(0, 16)
        with pytest.raises(ConfigError):
            QPilotGen(100, 1)
        with pytest.raises(ConfigError):
            QPilotSync(100, 1)
        gen = QPilotGen(100, 16)
        with pytest.raises(ConfigError):
            gen.execute(np.zeros(99, np.complex64))


class TestQDSync:
    @autotest(param_map={f"[{k}]": f"qdsync_cccf_k{k}" for k in (2, 3, 4)})
    @pytest.mark.parametrize("k", [2, 3, 4])
    def test_sync_k(self, k):
        """liquid autotest qdsync_cccf_k{2,3,4} model: preamble + payload
        at unknown delay/phase under noise; recovered symbols match."""
        rng = np.random.default_rng(k)
        pre = (1.0 - 2.0 * rng.integers(0, 2, 64)).astype(np.complex64)
        payload, syms = _qpsk_payload(240, seed=k)
        allsyms = np.concatenate([pre, payload,
                                  np.zeros(16, np.complex64)])
        sync = QDSync(pre, k=k, m=7, beta=0.3)
        # transmit: interpolate with the same root-Nyquist pulse
        h = sync._h
        up = np.zeros(allsyms.size * k, dtype=np.complex64)
        up[::k] = allsyms
        tx = np.convolve(up, h)
        delay = 113
        phi = 1.2
        buf = np.concatenate([np.zeros(delay, np.complex64),
                              tx * np.exp(1j * phi),
                              np.zeros(50, np.complex64)])
        nstd = 10 ** (-35 / 20) / np.sqrt(2)
        buf = buf + nstd * (rng.standard_normal(buf.size)
                            + 1j * rng.standard_normal(buf.size))
        res = sync.execute(buf.astype(np.complex64))
        assert res is not None
        out, stats = res
        assert stats["evm_db"] < -25.0
        assert abs((stats["tau"] - delay)) < 0.5
        got = out[64: 64 + 240]
        modem = Modem.create("qpsk")
        dsyms, _ = modem.demodulate(got.astype(np.complex64))
        np.testing.assert_array_equal(np.asarray(dsyms), syms)

    def test_cfo(self):
        """Carrier frequency offset within the detector's hypothesis range
        is estimated and removed."""
        rng = np.random.default_rng(8)
        pre = (1.0 - 2.0 * rng.integers(0, 2, 64)).astype(np.complex64)
        payload, syms = _qpsk_payload(120, seed=9)
        allsyms = np.concatenate([pre, payload, np.zeros(16, np.complex64)])
        sync = QDSync(pre, k=2, m=7, beta=0.3)
        up = np.zeros(allsyms.size * 2, dtype=np.complex64)
        up[::2] = allsyms
        tx = np.convolve(up, sync._h)
        dphi = 0.01
        n = np.arange(tx.size)
        buf = np.concatenate([np.zeros(40, np.complex64),
                              tx * np.exp(1j * dphi * n),
                              np.zeros(40, np.complex64)])
        res = sync.execute(buf.astype(np.complex64))
        assert res is not None
        out, stats = res
        assert abs(stats["dphi"] - dphi) < 5e-4
        modem = Modem.create("qpsk")
        dsyms, _ = modem.demodulate(out[64:64 + 120].astype(np.complex64))
        np.testing.assert_array_equal(np.asarray(dsyms), syms)

    def test_no_detection(self):
        rng = np.random.default_rng(2)
        pre = (1.0 - 2.0 * rng.integers(0, 2, 64)).astype(np.complex64)
        sync = QDSync(pre, k=2, m=7, beta=0.3)
        noise = 0.01 * (rng.standard_normal(2048)
                        + 1j * rng.standard_normal(2048))
        assert sync.execute(noise.astype(np.complex64)) is None

    @autotest("qdsync_set_buf_len")
    def test_set_buf_len(self):
        """Output cap bounds extracted symbols without losing the preamble
        (liquid qdsync_set_buf_len)."""
        rng = np.random.default_rng(12)
        pre = (1.0 - 2.0 * rng.integers(0, 2, 64)).astype(np.complex64)
        payload, _ = _qpsk_payload(120, seed=13)
        allsyms = np.concatenate([pre, payload, np.zeros(16, np.complex64)])
        sync = QDSync(pre, k=2, m=7, beta=0.3)
        with pytest.raises(ConfigError):
            sync.set_buf_len(8)  # shorter than the preamble
        sync.set_buf_len(100)
        assert sync.get_buf_len() == 100
        up = np.zeros(allsyms.size * 2, dtype=np.complex64)
        up[::2] = allsyms
        tx = np.convolve(up, sync._h)
        buf = np.concatenate([np.zeros(37, np.complex64), tx,
                              np.zeros(40, np.complex64)])
        res = sync.execute(buf.astype(np.complex64))
        assert res is not None
        out, _ = res
        assert out.size == 100  # capped, includes the 64-symbol preamble
        # explicit n_symbols still overrides the default cap
        out2, _ = sync.execute(buf.astype(np.complex64), n_symbols=80)
        assert out2.size == 80
        np.testing.assert_array_equal(out[:80], out2)

    @autotest("qdsync_cccf_copy")
    def test_copy(self):
        """Copied synchronizer detects identically (liquid qdsync_cccf_copy)."""
        import copy as _copy
        rng = np.random.default_rng(14)
        pre = (1.0 - 2.0 * rng.integers(0, 2, 64)).astype(np.complex64)
        payload, _ = _qpsk_payload(80, seed=15)
        allsyms = np.concatenate([pre, payload, np.zeros(16, np.complex64)])
        s0 = QDSync(pre, k=2, m=7, beta=0.3)
        s1 = _copy.deepcopy(s0)
        up = np.zeros(allsyms.size * 2, dtype=np.complex64)
        up[::2] = allsyms
        tx = np.convolve(up, s0._h)
        buf = np.concatenate([np.zeros(21, np.complex64), tx,
                              np.zeros(30, np.complex64)]).astype(np.complex64)
        r0, r1 = s0.execute(buf), s1.execute(buf)
        assert r0 is not None and r1 is not None
        np.testing.assert_array_equal(r0[0], r1[0])
        assert r0[1]["tau"] == r1[1]["tau"]

    @autotest("qdsync_cccf_config")
    def test_config_errors(self):
        pre = np.ones(64, np.complex64)
        with pytest.raises(ConfigError):
            QDSync(pre[:4])
        with pytest.raises(ConfigError):
            QDSync(pre, k=1)
        with pytest.raises(ConfigError):
            QDSync(pre, m=0)
        with pytest.raises(ConfigError):
            QDSync(pre, beta=0.0)
