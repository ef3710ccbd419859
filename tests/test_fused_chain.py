"""Fused Pallas chain kernel (kernels/chain.py) + planar boundary utilities.

Parity oracle: the two-stage XLA chain (chains/rx.py), itself golden-tested
against the reference semantics (firfilt.rs / resamp.rs / osc.rs). The fused
kernel collapses FIR ⊛ polyphase-branch filters into combined taps in f64, so
parity is tolerance-bounded (≲1e-4 rel) rather than bit-exact; the NCO phase
ramp is exact u32 and matches bit-for-bit.

On CPU the kernel runs in interpret mode; tools/tpu_chain_bench.py runs the
same parity check compiled on real TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yagi_tpu.chains import FusedRxChain, RxChain
from yagi_tpu.utils.planar import Planar, planar, planar_jit, planarize, unplanarize


def _rand_cplx(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


class TestPlanar:
    def test_roundtrip_host(self):
        rng = np.random.default_rng(0)
        tree = {"a": _rand_cplx(rng, (3, 4)), "b": np.float32(2.0), "c": 1 + 2j}
        p = planarize(tree)
        assert isinstance(p["a"], Planar) and isinstance(p["c"], Planar)
        back = unplanarize(p)
        np.testing.assert_array_equal(back["a"], tree["a"])
        assert back["c"] == tree["c"]

    def test_planar_jit_boundary_real(self):
        rng = np.random.default_rng(1)
        x = _rand_cplx(rng, (2, 8))
        f = planar_jit(lambda v: v * (1 + 1j))
        out = f(planarize(x))
        assert isinstance(out, Planar)
        assert out.re.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out.re) + 1j * np.asarray(out.im), x * (1 + 1j), rtol=1e-6
        )

    def test_planar_state_threading(self):
        """A stateful chain threads planar state across steps unchanged."""
        rng = np.random.default_rng(2)
        chain = RxChain.create(batch_shape=(2,))
        x = _rand_cplx(rng, (2, 512))
        y_ref, k_ref, c_ref = chain.step(jnp.asarray(x))
        pstep = planar_jit(lambda c, v: c.step(v))
        py, pk, pc = pstep(planarize(chain), planarize(jnp.asarray(x)))
        np.testing.assert_allclose(
            np.asarray(py.re) + 1j * np.asarray(py.im),
            np.asarray(y_ref),
            rtol=0,
            atol=1e-6,
        )
        # state leaves identical too
        y2_ref, _, _ = c_ref.step(jnp.asarray(x))
        py2, _, _ = pstep(pc, planarize(jnp.asarray(x)))
        np.testing.assert_allclose(
            np.asarray(py2.re) + 1j * np.asarray(py2.im),
            np.asarray(y2_ref),
            rtol=0,
            atol=1e-6,
        )


class TestFusedChain:
    @pytest.mark.parametrize("mix_freq", [0.0, 0.35])
    def test_parity_vs_xla_chain(self, mix_freq):
        C, T = 3, 2048
        ref = RxChain.create(mix_freq=mix_freq, batch_shape=(C,))
        fused = jax.jit(
            lambda: FusedRxChain.create(mix_freq=mix_freq, batch_shape=(C,), r=4)
        )().replace(interpret=True)
        rng = np.random.default_rng(7)
        for blk in range(3):  # streaming state carry across blocks
            x = _rand_cplx(rng, (C, T))
            y, k, ref = ref.step(jnp.asarray(x))
            f, fk, fused = fused.step(jnp.asarray(x))
            assert int(k) == int(fk) == 2 * T
            a = np.asarray(y)[:, : int(k)]
            b = np.asarray(f)
            err = np.abs(a - b) / (np.abs(a) + 1e-3)
            assert err.max() < 1e-4, f"block {blk}: rel err {err.max()}"

    def test_block_split_invariance(self):
        """One 4096 block == two 2048 blocks (state carry exact)."""
        C = 2
        rng = np.random.default_rng(8)
        x = _rand_cplx(rng, (C, 4096))
        mk = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=4))
        c1 = mk().replace(interpret=True)
        y_all, _, _ = c1.step(jnp.asarray(x))
        c2 = mk().replace(interpret=True)
        y_a, _, c2 = c2.step(jnp.asarray(x[:, :2048]))
        y_b, _, c2 = c2.step(jnp.asarray(x[:, 2048:]))
        y_cat = np.concatenate([np.asarray(y_a), np.asarray(y_b)], axis=-1)
        np.testing.assert_allclose(np.asarray(y_all), y_cat, rtol=0, atol=1e-5)

    def test_planar_step_matches_complex_step(self):
        C, T = 2, 1024
        rng = np.random.default_rng(9)
        x = _rand_cplx(rng, (C, T))
        c = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=2))().replace(
            interpret=True
        )
        y, k, _ = c.step(jnp.asarray(x))
        yr, yi, k2, _ = c.step_planar(
            jnp.asarray(np.ascontiguousarray(x.real)),
            jnp.asarray(np.ascontiguousarray(x.imag)),
        )
        np.testing.assert_array_equal(np.asarray(jnp.real(y)), np.asarray(yr))
        np.testing.assert_array_equal(np.asarray(jnp.imag(y)), np.asarray(yi))

    def test_rejects_bad_config(self):
        from yagi_tpu.errors import ConfigError

        with pytest.raises(ConfigError):
            FusedRxChain.create(rate=1.5, batch_shape=(2,))
        with pytest.raises(ConfigError):
            FusedRxChain.create(rate=3.0, batch_shape=(2,))  # 3 ∤ 2^24
        with pytest.raises(ConfigError):
            FusedRxChain.create(batch_shape=())
