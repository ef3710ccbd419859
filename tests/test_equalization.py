"""Equalizer convergence tests.

Oracle: the reference's loop-convergence style (eqlms.rs:213-308: train on a
known channel, assert constellation RMSE below -20 dB).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yagi_tpu.equalization import Eqlms, Eqrls
from yagi_tpu.errors import ConfigError
from yagi_tpu.modem import Modem


def _channel(sym, taps):
    return np.convolve(sym, taps)[: len(sym)].astype(np.complex64)


class TestEqlms:
    def test_identity_default(self):
        """Default (no-h) equalizer starts as a pass-through at delay h/2."""
        eq = Eqlms.create(h_len=9)
        x = np.arange(1, 30, dtype=np.float32).astype(np.complex64)
        ys = []
        for xi in x:
            eq = eq.push(xi)
            ys.append(complex(eq.execute()))
        # center-tap passthrough: y[n] = x[n-4]
        np.testing.assert_allclose(np.asarray(ys)[8:], x[4 : len(x) - 4], atol=1e-5)

    def test_supervised_convergence_qpsk(self):
        """Train against a dispersive channel; RMSE < -20 dB (eqlms.rs:213)."""
        rng = np.random.default_rng(0)
        m = Modem.create("qpsk")
        n = 2000
        syms = rng.integers(0, 4, size=n).astype(np.uint32)
        d, _ = m.modulate(syms)
        d = np.asarray(d)
        taps = np.array([1.0, 0.0, -0.25 + 0.15j, 0.1], dtype=np.complex64)
        x = _channel(d, taps)

        eq = Eqlms.create(h_len=13).set_bw(0.3)
        # align: equalizer output delay = h_len//2; train with delayed reference
        delay = 13 // 2
        d_ref = np.roll(d, delay)
        y, eq = eq.train_block(x, d_ref)
        y = np.asarray(y)[-500:]
        d_tail = d_ref[-500:]
        rmse = np.sqrt(np.mean(np.abs(y - d_tail) ** 2))
        assert 20 * np.log10(rmse) < -20.0

    def test_blind_cm_keeps_modulus(self):
        """Blind CM update drives outputs toward unit modulus."""
        rng = np.random.default_rng(1)
        m = Modem.create("qpsk")
        syms = rng.integers(0, 4, size=3000).astype(np.uint32)
        d, _ = m.modulate(syms)
        d = np.asarray(d)
        taps = np.array([1.0, 0.0, 0.2 - 0.1j], dtype=np.complex64)
        x = _channel(d, taps)
        eq = Eqlms.create(h_len=11).set_bw(0.1)
        y, eq = eq.execute_block(1, jnp.asarray(x))
        mod_err = np.abs(np.abs(np.asarray(y)[-500:]) - 1.0)
        assert mod_err.mean() < 0.1

    def test_weights_shape_and_reset(self):
        eq = Eqlms.create_lowpass(21, 0.2)
        w0 = np.asarray(eq.get_weights())
        assert w0.shape == (21,)
        eq2 = eq.push(1.0 + 0j).step(1.0, 0.5)
        eq3 = eq2.reset()
        np.testing.assert_allclose(np.asarray(eq3.get_weights()), w0, atol=1e-7)

    def test_rnyquist_ctor(self):
        from yagi_tpu.design import FirFilterShape

        eq = Eqlms.create_rnyquist(FirFilterShape.RRCOS, 2, 7, 0.3)
        assert eq.h_len == 2 * 2 * 7 + 1

    def test_invalid(self):
        with pytest.raises(ConfigError):
            Eqlms.create()
        with pytest.raises(ConfigError):
            Eqlms.create(h_len=5).set_bw(-1.0)
        with pytest.raises(ConfigError):
            Eqlms.create_rnyquist(None, 1, 7, 0.3)


class TestEqrls:
    def test_supervised_convergence(self):
        """RLS converges faster than LMS on the same channel."""
        rng = np.random.default_rng(2)
        m = Modem.create("qpsk")
        n = 400
        syms = rng.integers(0, 4, size=n).astype(np.uint32)
        d, _ = m.modulate(syms)
        d = np.asarray(d)
        taps = np.array([1.0, -0.2 + 0.1j, 0.1], dtype=np.complex64)
        x = _channel(d, taps)

        p = 9
        eq = Eqrls.create(p=p)
        delay = 0  # h0 = delta at index p-1 → output aligns with newest
        y, eq = eq.train_block(x, d)
        y = np.asarray(y)[-100:]
        rmse = np.sqrt(np.mean(np.abs(y - d[-100:]) ** 2))
        assert 20 * np.log10(rmse) < -20.0

    def test_invalid(self):
        with pytest.raises(ConfigError):
            Eqrls.create(p=0)
        with pytest.raises(ConfigError):
            Eqrls.create(p=4).set_bw(1.5)
