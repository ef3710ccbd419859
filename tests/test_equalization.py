"""Equalizer convergence tests.

Oracle: the reference's loop-convergence style (eqlms.rs:213-308: train on a
known channel, assert constellation RMSE below -20 dB).
"""

import numpy as np

from tests.autotest import autotest
import pytest

import jax
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
    @autotest("eqrls_rrrf_01")
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

    @autotest("eqrls_rrrf_copy")
    def test_copy(self):
        """Copied RLS equalizer trains identically from the same state
        (liquid eqrls_rrrf_copy semantics)."""
        import jax as _jax
        rng = np.random.default_rng(9)
        m = Modem.create("qpsk")
        syms = rng.integers(0, 4, size=120).astype(np.uint32)
        d, _ = m.modulate(syms)
        d = np.asarray(d)
        x = _channel(d, np.array([1.0, -0.15 + 0.05j], dtype=np.complex64))
        eq0 = Eqrls.create(p=5)
        _, eq0 = eq0.train_block(x[:60], d[:60])
        eq1 = _jax.tree_util.tree_map(lambda v: v, eq0)
        y0, _ = eq0.train_block(x[60:], d[60:])
        y1, _ = eq1.train_block(x[60:], d[60:])
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


class TestEqlmsReferenceScenarios:
    """The reference's 12 numbered eqlms scenarios (eqlms.rs:213-380):
    interp → fixed 5-tap channel → adaptive equalizer as k-decimator; after
    num_symbols training updates (perfect / CM-blind / decision-directed),
    post-training RMSE must be < −20 dB."""

    _CASES = {
        "00": (2, 7, 0.3, 0, 7, 0.3, 800, 0, "qpsk"),
        "01": (2, 7, 0.3, 0, 7, 0.3, 800, 1, "qpsk"),
        "02": (2, 7, 0.3, 0, 7, 0.3, 800, 2, "qpsk"),
        "03": (2, 7, 0.3, 0, 7, 0.3, 800, 0, "qam16"),
        "04": (2, 7, 0.3, 1, 7, 0.3, 800, 0, "qam16"),
        "05": (2, 7, 0.3, 2, 7, 0.3, 800, 0, "qam16"),
        "06": (2, 7, 0.3, 3, 6, 0.3, 800, 0, "qam16"),
        "07": (2, 9, 0.3, 0, 7, 0.3, 800, 0, "qpsk"),
        "08": (2, 7, 0.2, 0, 9, 0.3, 800, 0, "qpsk"),
        "09": (2, 7, 0.3, 0, 3, 0.3, 800, 0, "qpsk"),
        "10": (2, 7, 0.3, 0, 7, 0.5, 800, 0, "arb64vt"),
        "11": (2, 7, 0.3, 0, 7, 0.1, 800, 0, "qpsk"),
    }

    @autotest(param_map={f"[{k}]": f"eqlms_{k}" for k in _CASES})
    @pytest.mark.parametrize("case", sorted(_CASES))
    def test_scenario(self, case):
        from yagi_tpu.design import FirFilterShape
        from yagi_tpu.filter import FirFilter, FirInterpolationFilter
        from yagi_tpu.math.windows import hamming
        from yagi_tpu.math.special import sincf
        from yagi_tpu.modem import Modem

        k, m, beta, init, p, mu, num_symbols, update, ms = self._CASES[case]
        rng = np.random.default_rng(int(case) + 17)
        modem = Modem.create(ms)
        M = modem.constellation_size
        n_total = 2 * num_symbols

        syms = rng.integers(0, M, size=n_total).astype(np.uint32)
        v, _ = modem.modulate(jnp.asarray(syms))
        v = np.asarray(v)

        interp = FirInterpolationFilter.create_prototype(
            FirFilterShape.ARKAISER, k, m, beta, dtype=jnp.complex64
        )
        x_i, _ = interp.execute_block(jnp.asarray(v))
        h = np.array([1.0 + 0j, -0.01j, -0.11 + 0.02j, 0.02 + 0.01j,
                      -0.09 - 0.04j], dtype=np.complex64)
        chan = FirFilter.create(h, dtype=jnp.complex64)
        x_c, _ = chan.execute_block(x_i)
        x_c = np.asarray(x_c)

        if init == 0:
            eq = Eqlms.create_rnyquist(FirFilterShape.ARKAISER, k, p, beta)
        elif init == 1:
            eq = Eqlms.create_lowpass(2 * k * p + 1, 0.5 / k)
        elif init == 2:
            i_ = np.arange(2 * k * p + 1)
            hp = (np.asarray(sincf(i_ / k - p)) *
                  np.asarray(hamming(2 * k * p + 1)) / k).astype(np.complex64)
            eq = Eqlms.create(h=hp)
        else:
            eq = Eqlms.create(h_len=2 * k * p + 1)
        eq = eq.set_bw(mu)

        demod = Modem.create(ms)
        step_perfect = jax.jit(
            lambda e, xk, d: (lambda y_e: (y_e[0], y_e[1].step(d, y_e[0])))(
                e.decim_execute(xk, k)))
        step_blind = jax.jit(
            lambda e, xk: (lambda y_e: (y_e[0], y_e[1].step_blind(y_e[0])))(
                e.decim_execute(xk, k)))
        decim_only = jax.jit(lambda e, xk: e.decim_execute(xk, k))

        rmse = 0.0
        for i in range(n_total):
            xk = jnp.asarray(x_c[i * k : (i + 1) * k])
            if i < m + p:
                _, eq = decim_only(eq, xk)
                continue
            d_in = v[i - (m + p)]
            if i < num_symbols:
                if update == 0:
                    _, eq = step_perfect(eq, xk, jnp.asarray(d_in))
                elif update == 1:
                    _, eq = step_blind(eq, xk)
                elif update == 2:
                    # decision-directed: step toward the decided point
                    y, eq_p = decim_only(eq, xk)
                    _, dm = demod.demodulate(jnp.asarray(np.asarray(y))[None])
                    d_hat = complex(np.asarray(dm.get_demodulator_sample()))
                    eq = eq_p.step(jnp.asarray(d_hat), y)
                else:
                    _, eq = decim_only(eq, xk)
                continue
            y, eq = decim_only(eq, xk)
            err = abs(complex(np.asarray(y)) - complex(d_in))
            rmse += err * err
        rmse_db = 10.0 * np.log10(rmse / num_symbols)
        assert rmse_db < -20.0, (case, rmse_db)

    @autotest("eqlms_config")
    def test_config_reference(self):
        with pytest.raises(ConfigError):
            Eqlms.create()
        with pytest.raises(ConfigError):
            Eqlms.create_rnyquist("arkaiser", 1, 7, 0.3)
        with pytest.raises(ConfigError):
            Eqlms.create_lowpass(0, 0.1)
        with pytest.raises(ConfigError):
            Eqlms.create(h_len=5).set_bw(-1.0)

    @autotest("eqlms_cccf_copy")
    def test_copy_reference(self):
        rng = np.random.default_rng(5)
        eq0 = Eqlms.create(h_len=7).set_bw(0.1)
        x = (rng.normal(size=30) + 1j * rng.normal(size=30)).astype(np.complex64)
        d = (np.sign(rng.normal(size=30)) + 0j).astype(np.complex64)
        _, eq0 = eq0.train_block(jnp.asarray(x), jnp.asarray(d))
        eq1 = jax.tree_util.tree_map(lambda v: v, eq0)
        x2 = (rng.normal(size=20) + 1j * rng.normal(size=20)).astype(np.complex64)
        d2 = (np.sign(rng.normal(size=20)) + 0j).astype(np.complex64)
        y0, _ = eq0.train_block(jnp.asarray(x2), jnp.asarray(d2))
        y1, _ = eq1.train_block(jnp.asarray(x2), jnp.asarray(d2))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
