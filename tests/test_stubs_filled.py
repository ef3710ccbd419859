"""Tests for components that fill reference stubs: FirFarrow, AutoCorr, Dds,
Spwaterfall (firfarrow.rs/autocorr.rs/dds.rs are 0-byte; spwaterfall was not
ported by the reference). Behavior oracles are liquid-dsp semantics.
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax.numpy as jnp

from yagi_tpu.errors import ConfigError
from yagi_tpu.fft import Spwaterfall
from yagi_tpu.filter import AutoCorr, Dds, FirFarrow


class TestFirFarrow:
    @pytest.mark.parametrize("mu", [-0.1, 0.25] + [
        pytest.param(m, marks=pytest.mark.slow)
        for m in (-0.4, 0.0, 0.45)])
    def test_fractional_delay_tone(self, mu):
        f = FirFarrow.create(17, 3, dtype=jnp.float32)
        t = np.arange(300, dtype=np.float32)
        x = np.sin(2 * np.pi * 0.05 * t).astype(np.float32)
        y, _ = f.set_delay(mu).execute_block(x)
        want = np.sin(2 * np.pi * 0.05 * (t - (8 + mu)))
        assert np.abs(np.asarray(y)[40:] - want[40:]).max() < 0.01

    def test_groupdelay_tracks_mu(self):
        f = FirFarrow.create(21, 3, dtype=jnp.float32)
        gd0 = f.set_delay(0.0).groupdelay(0.0)
        gd_plus = f.set_delay(0.4).groupdelay(0.0)
        assert gd_plus - gd0 == pytest.approx(0.4, abs=0.02)

    def test_adjustable_at_runtime(self):
        """Delay is traced state: changing it does not retrigger design."""
        f = FirFarrow.create(17, 3, dtype=jnp.float32)
        import jax

        run = jax.jit(lambda f, x: f.execute_block(x)[0])
        x = np.random.default_rng(0).normal(size=64).astype(np.float32)
        y1 = run(f.set_delay(0.1), x)
        y2 = run(f.set_delay(-0.3), x)  # same compiled fn, different delay
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_invalid(self):
        with pytest.raises(ConfigError):
            FirFarrow.create(0, 3)
        with pytest.raises(ConfigError):
            FirFarrow.create(17, 0)
        with pytest.raises(ConfigError):
            FirFarrow.create(17, 3).set_delay(0.7)


class TestAutoCorr:
    def test_tone_autocorrelation(self):
        """rxx for a unit tone = W·e^{j2πf·d}."""
        W, d, f0 = 32, 4, 0.1
        ac = AutoCorr.create(W, d)
        x = np.exp(2j * np.pi * f0 * np.arange(200)).astype(np.complex64)
        r, ac = ac.execute_block(x)
        want = W * np.exp(2j * np.pi * f0 * d)
        assert abs(complex(np.asarray(r)[-1]) - want) < 1e-4

    @pytest.mark.slow
    def test_block_split_invariance(self):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=150) + 1j * rng.normal(size=150)).astype(np.complex64)
        a1 = AutoCorr.create(16, 3)
        r1, a1 = a1.execute_block(x)
        a2 = AutoCorr.create(16, 3)
        parts = []
        for c in np.split(x, [50, 51]):
            r, a2 = a2.execute_block(c)
            parts.append(np.asarray(r))
        np.testing.assert_allclose(
            np.asarray(r1), np.concatenate(parts), rtol=1e-5, atol=1e-5
        )

    def test_zero_delay_is_energy(self):
        ac = AutoCorr.create(8, 0)
        x = (np.arange(20) + 1).astype(np.complex64)
        r, _ = ac.execute_block(x)
        want = sum(abs(x[19 - w]) ** 2 for w in range(8))
        assert abs(np.asarray(r)[-1] - want) < 1e-3


class TestDds:
    @autotest("dds_cccf_0", "dds_cccf_1")
    def test_interp_places_carrier(self):
        dds = Dds.create(2, 0.2)
        xb = np.exp(2j * np.pi * 0.01 * np.arange(512)).astype(np.complex64)
        hi, dds = dds.interp_execute(xb)
        hi = np.asarray(hi)[400:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(hi * np.hanning(len(hi)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - (0.2 + 0.01 / 4)) < 0.005

    @autotest("dds_cccf_2", "dds_copy")
    @pytest.mark.slow
    def test_roundtrip(self):
        dds = Dds.create(2, 0.15)
        xb = np.exp(2j * np.pi * 0.02 * np.arange(1024)).astype(np.complex64)
        hi, dds = dds.interp_execute(xb)
        lo, dds = dds.decim_execute(np.asarray(hi))
        lo = np.asarray(lo)[200:]
        spec = np.abs(np.fft.fftshift(np.fft.fft(lo * np.hanning(len(lo)))))
        fg = np.arange(len(spec)) / len(spec) - 0.5
        assert abs(fg[spec.argmax()] - 0.02) < 0.005
        assert np.abs(np.abs(lo).mean() - 1.0) < 0.15

    @autotest("dds_config")
    def test_invalid(self):
        with pytest.raises(ConfigError):
            Dds.create(20, 0.1)
        with pytest.raises(ConfigError):
            Dds.create(2, 0.7)


@pytest.mark.slow
class TestSpwaterfall:
    def test_rows_and_peak(self):
        wf = Spwaterfall.create(64, time_rows=8, transforms_per_row=2)
        sig = np.exp(2j * np.pi * 0.2 * np.arange(1 << 13)).astype(np.complex64)
        wf = wf.write(sig)
        psd = np.asarray(wf.get_psd())
        assert psd.shape[1] == 64 and psd.shape[0] >= 2
        assert abs(int(psd[-1].argmax()) - (int(0.2 * 64) + 32)) <= 1

    def test_consolidation(self):
        """When rows fill, they decimate 2:1 and time scale doubles."""
        wf = Spwaterfall.create(32, time_rows=4, transforms_per_row=1)
        sig = np.exp(2j * np.pi * 0.1 * np.arange(1 << 13)).astype(np.complex64)
        wf = wf.write(sig)
        assert int(np.asarray(wf.row_scale)) >= 2
        assert int(np.asarray(wf.num_rows)) <= 4

    def test_invalid(self):
        with pytest.raises(ConfigError):
            Spwaterfall.create(64, time_rows=1)
