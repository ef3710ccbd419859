"""Fused Pallas channelizer kernel (kernels/channelizer.py).

Parity oracle: the XLA analyzer (multichannel/firpfbch.py), itself proven
equal to mix+filter+decimate in test_channelizer.py. CPU runs use interpret
mode; tools/tpu_channelizer_bench.py runs the compiled kernel on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yagi_tpu.multichannel import Firpfbch, FusedChannelizer


def _stream(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


class TestFusedChannelizer:
    def test_parity_streaming_blocks(self):
        rng = np.random.default_rng(0)
        M, T = 64, 256
        ref = Firpfbch.create_kaiser(M, 4, 60.0)
        fz = FusedChannelizer.create_kaiser(M, 4, 60.0, r2=32).replace(
            interpret=True
        )
        for blk in range(3):
            x = _stream(rng, T * M)
            y_ref, ref = ref.analyzer_execute(jnp.asarray(x))
            y_f, fz = fz.analyzer_execute(jnp.asarray(x))
            a, b = np.asarray(y_ref), np.asarray(y_f)
            err = np.abs(a - b) / (np.abs(a) + 1e-3)
            assert err.max() < 1e-4, f"block {blk}: {err.max()}"

    def test_block_split_invariance(self):
        rng = np.random.default_rng(1)
        M = 64
        x = _stream(rng, 256 * M)
        mk = lambda: FusedChannelizer.create_kaiser(M, 4, 60.0, r2=32).replace(
            interpret=True
        )
        y_all, _ = mk().analyzer_execute(jnp.asarray(x))
        fz = mk()
        ya, fz = fz.analyzer_execute(jnp.asarray(x[: 128 * M]))
        yb, fz = fz.analyzer_execute(jnp.asarray(x[128 * M :]))
        cat = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=-1)
        np.testing.assert_allclose(np.asarray(y_all), cat, rtol=0, atol=1e-5)

    def test_planar_matches_complex(self):
        rng = np.random.default_rng(2)
        M = 64
        x = _stream(rng, 128 * M)
        fz = FusedChannelizer.create_kaiser(M, 4, 60.0, r2=32).replace(
            interpret=True
        )
        y, _ = fz.analyzer_execute(jnp.asarray(x))
        yr, yi, _ = fz.analyzer_execute_planar(
            jnp.asarray(np.ascontiguousarray(x.real)),
            jnp.asarray(np.ascontiguousarray(x.imag)),
        )
        np.testing.assert_array_equal(np.asarray(jnp.real(y)), np.asarray(yr).T)
        np.testing.assert_array_equal(np.asarray(jnp.imag(y)), np.asarray(yi).T)

    def test_rejects_bad_config(self):
        import pytest

        from yagi_tpu.errors import ConfigError

        with pytest.raises(ConfigError):
            FusedChannelizer.create_kaiser(32)
        with pytest.raises(ConfigError):
            FusedChannelizer.create_kaiser(64, m=0)
