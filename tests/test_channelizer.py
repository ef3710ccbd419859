"""Polyphase channelizer conformance tests.

Oracles (liquid firpfbch semantics, no yagi implementation exists):
* tone at channel k's center → energy only in channel k
* analyzer == per-channel mix-down → lowpass → M:1 decimate (the defining
  equivalence the polyphase structure factorizes)
* synthesizer → analyzer round trip on per-channel narrowband signals
* sharded (time-block + halo ppermute) == single-device, bit-identical
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from yagi_tpu.design import FirFilterShape
from yagi_tpu.errors import ConfigError
from yagi_tpu.filter import FirFilter
from yagi_tpu.multichannel import Firpfbch, Firpfbch2
from yagi_tpu.parallel import sharded_channelize, sharded_channelize_fm


class TestFirpfbch:
    @pytest.mark.parametrize("M", [4, 8, 16])
    @autotest("firpfbch_crcf_analysis")
    def test_tone_isolation(self, M):
        ch = Firpfbch.create_kaiser(M, 4, 60.0)
        n = 128
        t = np.arange(n * M)
        for k in [0, 1, M - 1]:
            x = np.exp(2j * np.pi * (k / M) * t).astype(np.complex64)
            y, _ = ch.analyzer_execute(x)
            p = np.mean(np.abs(np.asarray(y)[..., 16:]) ** 2, axis=-1)
            assert p.argmax() == k
            assert np.sort(p)[-2] / p.max() < 1e-6  # inter-channel leakage

    def test_matches_mix_filter_decimate(self):
        """Channel k == mix-down by k/M → h → keep every M-th sample."""
        M, m = 8, 3
        ch = Firpfbch.create_kaiser(M, m, 60.0)
        h = np.zeros(2 * M * m)
        br = np.asarray(ch.branches)
        for b in range(M):
            h[b::M] = br[b]
        rng = np.random.default_rng(1)
        n_steps = 64
        x = (rng.normal(size=n_steps * M) + 1j * rng.normal(size=n_steps * M)).astype(
            np.complex64
        )
        y, _ = ch.analyzer_execute(x)
        y = np.asarray(y)

        t = np.arange(len(x))
        for k in [0, 2, 5]:
            mixed = x * np.exp(-2j * np.pi * k * t / M)
            filt = FirFilter.create(h.astype(np.float32), dtype=jnp.complex64)
            z, _ = filt.execute_block(mixed)
            z = np.asarray(z)[::M]  # decimate, aligned at sample 0
            np.testing.assert_allclose(y[k], z, rtol=2e-4, atol=2e-4)

    @autotest("firpfbch_crcf_synthesis")
    def test_synthesis_analysis_roundtrip(self):
        M, m = 8, 4
        N = 300
        n = np.arange(N)
        amps = np.arange(1, M + 1)
        ych_in = np.stack(
            [a * np.exp(2j * np.pi * 0.01 * n) for a in amps]
        ).astype(np.complex64)
        sy = Firpfbch.create_kaiser(M, m, 80.0)
        x, _ = sy.synthesizer_execute(ych_in)
        an = Firpfbch.create_kaiser(M, m, 80.0)
        ych_out, _ = an.analyzer_execute(np.asarray(x))
        ych_out = np.asarray(ych_out)
        d = 2 * m
        for k in range(M):
            a = ych_out[k, d + 10 : N]
            b = ych_in[k, 10 : N - d]
            alpha = np.vdot(b, a) / np.vdot(b, b)
            res = np.abs(a - alpha * b).mean() / np.abs(b).mean()
            assert res < 1e-3, k
            assert abs(alpha) == pytest.approx(M, rel=0.01)

    def test_block_split_invariance(self):
        M = 8
        ch1 = Firpfbch.create_kaiser(M, 4, 60.0)
        rng = np.random.default_rng(2)
        x = (rng.normal(size=M * 96) + 1j * rng.normal(size=M * 96)).astype(
            np.complex64
        )
        y1, ch1 = ch1.analyzer_execute(x)
        ch2 = Firpfbch.create_kaiser(M, 4, 60.0)
        parts = []
        for c in np.split(x, [M * 16, M * 17, M * 60]):
            if len(c):
                y, ch2 = ch2.analyzer_execute(c)
                parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y1), np.concatenate(parts, axis=-1), rtol=1e-5, atol=1e-5
        )

    @autotest("firpfbch_crcf_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            Firpfbch.create_kaiser(1)
        ch = Firpfbch.create_kaiser(8, 3)
        with pytest.raises(ConfigError):
            ch.analyzer_execute(np.zeros(13, dtype=np.complex64))


class TestFirpfbch2:
    @autotest("firpfbch2_crcf_n8", "firpfbch2_crcf_n16", "firpfbch2_crcf_n32", "firpfbch2_crcf_n64")
    def test_tone_isolation_oversampled(self):
        # the reference sweeps n = 8..64 channels (firpfbch2_crcf_n*)
        for M in (8, 16, 32, 64):
            ch = Firpfbch2.create(M, 4, 60.0)
            n = 256
            t = np.arange(n * M // 2)
            for k in [0, 2, M - 3]:
                x = np.exp(2j * np.pi * (k / M) * t).astype(np.complex64)
                y, _ = ch.analyzer_execute(x)
                y = np.asarray(y)[..., 32:]
                p = np.mean(np.abs(y) ** 2, axis=-1)
                assert p.argmax() == k, (M, k, p)
                assert np.sort(p)[-2] / p.max() < 1e-5

    def test_output_rate(self):
        M = 8
        ch = Firpfbch2.create(M, 4, 60.0)
        x = np.zeros(M // 2 * 40, dtype=np.complex64)
        y, ch = ch.analyzer_execute(x)
        assert y.shape == (M, 40)  # one output step per M/2 inputs

    @autotest("firpfbch2_crcf_copy")
    def test_copy_midstream(self):
        """Copied oversampled channelizer continues bit-identically
        (liquid firpfbch2_crcf_copy)."""
        rng = np.random.default_rng(41)
        M = 8
        x = (rng.normal(size=M // 2 * 24)
             + 1j * rng.normal(size=M // 2 * 24)).astype(np.complex64)
        c0 = Firpfbch2.create(M, 4, 60.0)
        _, c0 = c0.analyzer_execute(x[: M // 2 * 12])
        c1 = jax.tree_util.tree_map(lambda v: v, c0)
        y0, _ = c0.analyzer_execute(x[M // 2 * 12:])
        y1, _ = c1.analyzer_execute(x[M // 2 * 12:])
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    @autotest("firpfbch2_crcf_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            Firpfbch2.create(7)


class TestShardedChannelizer:
    @pytest.fixture(scope="class")
    def mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return Mesh(np.asarray(jax.devices()[:8]), ("time",))

    def test_bit_identical(self, mesh):
        M = 16
        ch = Firpfbch.create_kaiser(M, 4, 60.0)
        T = 8 * 64
        rng = np.random.default_rng(0)
        x = (rng.normal(size=T * M) + 1j * rng.normal(size=T * M)).astype(
            np.complex64
        )
        y_sh = np.asarray(sharded_channelize(ch, jnp.asarray(x), mesh))
        y_ref, _ = ch.analyzer_execute(x)
        y_ref = np.asarray(y_ref)
        np.testing.assert_array_equal(y_sh[:, ch.p :], y_ref[:, ch.p :])

    @pytest.mark.slow
    def test_fm_workload(self, mesh):
        """Config[4]: channelize + FM discriminate; sharded == reference."""
        M = 16
        kf = 0.1
        ch = Firpfbch.create_kaiser(M, 4, 60.0)
        T = 8 * 32
        rng = np.random.default_rng(1)
        x = (rng.normal(size=T * M) + 1j * rng.normal(size=T * M)).astype(
            np.complex64
        )
        m_sh = np.asarray(sharded_channelize_fm(ch, kf, jnp.asarray(x), mesh))
        y_ref, _ = ch.analyzer_execute(x)
        y_ref = np.asarray(y_ref)
        m_ref = np.angle(np.conj(y_ref[:, :-1]) * y_ref[:, 1:]) / (2 * np.pi * kf)
        # m_sh[:, g] = pair(g-1, g) = m_ref[:, g-1]; device 0's zero-state
        # transient covers the first p+1 steps
        p = ch.p
        skip = p + 2
        L = m_ref.shape[1] - skip
        np.testing.assert_allclose(
            m_sh[:, skip : skip + L], m_ref[:, skip - 1 : skip - 1 + L],
            rtol=1e-4, atol=1e-5,
        )
