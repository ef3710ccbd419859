"""OFDM frame gen/sync tests (liquid ofdmframegen/ofdmframesync behavior,
LIQUID_COMPAT.md:1801-1810; no yagi implementation exists)."""

import numpy as np

from tests.autotest import autotest
import pytest

from yagi_tpu.errors import ConfigError
from yagi_tpu.multichannel.ofdm import (
    OfdmFrameGen, OfdmFrameSync, default_sctype, NULL, PILOT, DATA,
)


def _qpsk(rng, shape):
    return ((1 - 2 * rng.integers(0, 2, shape))
            + 1j * (1 - 2 * rng.integers(0, 2, shape))) / np.sqrt(2)


class TestAllocation:
    def test_default_sctype_structure(self):
        p = default_sctype(64)
        assert p[0] == NULL  # DC null
        assert np.sum(p == PILOT) >= 2
        assert np.sum(p == DATA) > 32
        # guard band around mid (band edge in FFT order)
        assert (p[30:35] == NULL).any()

    @autotest("ofdmframe_common_config", "ofdmframegen_config", "ofdmframesync_config")
    def test_invalid_configs(self):
        with pytest.raises(ConfigError):
            OfdmFrameGen(4, 2)
        with pytest.raises(ConfigError):
            OfdmFrameGen(64, 128)
        with pytest.raises(ConfigError):
            OfdmFrameGen(64, 16, sctype=np.zeros(64, np.int32))  # no data
        with pytest.raises(ConfigError):
            OfdmFrameSync(64, 16, threshold=1.5)


class TestLoopback:
    @autotest("ofdmframesync_acquire_n64")
    def test_clean_reconstruction(self):
        rng = np.random.default_rng(0)
        gen = OfdmFrameGen(64, 16)
        syms = _qpsk(rng, (8, gen.n_data))
        frame = gen.assemble(syms)
        buf = np.zeros(frame.size + 200, np.complex64)
        buf[73: 73 + frame.size] = frame
        r = OfdmFrameSync(64, 16).execute(buf, 8)
        assert r is not None
        assert abs(r["stats"]["tau"] - 73) < 1.0
        evm = 10 * np.log10(np.mean(np.abs(r["symbols"] - syms) ** 2))
        assert evm < -60

    @pytest.mark.parametrize("cfo", [0.0, 0.004, -0.006])
    def test_multipath_cfo_awgn(self, cfo):
        rng = np.random.default_rng(1)
        gen = OfdmFrameGen(64, 16)
        syms = _qpsk(rng, (12, gen.n_data))
        frame = gen.assemble(syms)
        h = np.array([1.0, 0.25 + 0.15j, -0.1j])  # within CP
        sig = np.convolve(frame, h)
        n = np.arange(sig.size)
        sig = 0.8 * sig * np.exp(1j * (cfo * n + 0.9))
        buf = np.zeros(sig.size + 240, np.complex128)
        buf[117: 117 + sig.size] = sig
        p = np.mean(np.abs(sig) ** 2)
        buf += (np.sqrt(p) * 10 ** (-20 / 20) / np.sqrt(2)
                * (rng.normal(size=buf.size)
                   + 1j * rng.normal(size=buf.size)))
        r = OfdmFrameSync(64, 16).execute(buf, 12)
        assert r is not None
        # every QPSK hard decision correct at 20 dB SNR
        z = r["symbols"]
        assert (np.sign(z.real) == np.sign(syms.real)).all()
        assert (np.sign(z.imag) == np.sign(syms.imag)).all()
        assert r["stats"]["evm_pilots_db"] < -12

    def test_no_detection_on_noise(self):
        rng = np.random.default_rng(2)
        sync = OfdmFrameSync(64, 16)
        gen = OfdmFrameGen(64, 16)
        need = 3 * gen.sym_len + 4 * gen.sym_len + 100
        noise = (rng.normal(size=need)
                 + 1j * rng.normal(size=need)).astype(np.complex64)
        assert sync.execute(noise, 4) is None

    @autotest("ofdmframesync_acquire_n128", "ofdmframesync_acquire_n256", "ofdmframesync_acquire_n512")
    def test_other_geometries(self):
        rng = np.random.default_rng(3)
        for M, cp in [(32, 8), (128, 32), (64, 0)]:
            gen = OfdmFrameGen(M, cp)
            syms = _qpsk(rng, (4, gen.n_data))
            frame = gen.assemble(syms)
            buf = np.zeros(frame.size + 120, np.complex64)
            buf[50: 50 + frame.size] = frame
            r = OfdmFrameSync(M, cp).execute(buf, 4)
            assert r is not None, (M, cp)
            evm = 10 * np.log10(np.mean(np.abs(r["symbols"] - syms) ** 2))
            assert evm < -40, (M, cp, evm)
