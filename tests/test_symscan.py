"""Fused Pallas symsync scan (kernels/symscan.py) — interpret-mode parity.

The kernel must be BIT-EXACT against the XLA lax.scan formulation
(filter/symsync.execute_slots backend="xla"): same emissions, same values,
same carried state — including valid-prefix streaming and block splits.
On-chip bit-exactness was verified round 4 (/tmp/tpuq job 63); these tests
pin the semantics on the CPU interpreter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yagi_tpu.design import FirFilterShape
from yagi_tpu.filter import Symsync

from autotest import autotest

C, N = 128, 256


def _mk():
    return Symsync.create_rnyquist(
        FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(C,)
    ).set_lf_bw(0.02)


def _sig(n=N, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((C, n)) + 1j * rng.standard_normal((C, n))
            ).astype(np.complex64)


class TestSymscanKernel:
    @autotest("symsync_crcf_scenario_0")
    @pytest.mark.slow
    def test_bit_exact_vs_xla(self):
        x = _sig()
        ya, va, sa = _mk().execute_slots(jnp.asarray(x), backend="xla")
        yb, vb, sb = _mk().execute_slots(jnp.asarray(x), backend="pallas")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        for fa, fb in zip(jax.tree_util.tree_leaves(sa),
                          jax.tree_util.tree_leaves(sb)):
            np.testing.assert_allclose(
                np.asarray(fa), np.asarray(fb), rtol=1e-6, atol=1e-6
            )

    def test_n_valid_parity(self):
        x = _sig(seed=1)
        ya, va, _ = _mk().execute_slots(jnp.asarray(x), n_valid=200,
                                        backend="xla")
        yb, vb, _ = _mk().execute_slots(jnp.asarray(x), n_valid=200,
                                        backend="pallas")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))

    @pytest.mark.slow
    def test_block_split_invariance(self):
        x = _sig(seed=2)
        s = _mk()
        y1, v1, s = s.execute_slots(jnp.asarray(x[:, :128]), backend="pallas")
        y2, v2, s = s.execute_slots(jnp.asarray(x[:, 128:]), backend="pallas")
        yf, vf, _ = _mk().execute_slots(jnp.asarray(x), backend="pallas")
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(v1), np.asarray(v2)], axis=1),
            np.asarray(vf),
        )
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
            np.asarray(yf),
        )

    def test_unsupported_shapes_fall_back(self):
        # C not lane-aligned → backend="pallas" silently unsupported; the
        # XLA path must still serve it
        ss = Symsync.create_rnyquist(
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(3,)
        )
        x = (np.random.default_rng(3).standard_normal((3, 64))
             + 0j).astype(np.complex64)
        y, v, _ = ss.execute_slots(jnp.asarray(x), backend="pallas")
        assert y.shape[:2] == (3, 64)


class TestSymscanFused:
    """In-kernel-MF variant (backend="fused", symsync_scan_fused): the MF
    dots reassociate vs the XLA banded matmul, so cross-formulation parity
    is tolerance-level; the kernel's own block-split invariance and the
    emission schedule must stay exact."""

    def test_tolerance_parity_vs_xla(self):
        x = _sig(seed=3)
        ya, va, sa = _mk().execute_slots(jnp.asarray(x), backend="xla")
        yb, vb, sb = _mk().execute_slots(jnp.asarray(x), backend="fused")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        d = np.abs(np.asarray(ya) - np.asarray(yb))
        ref = np.abs(np.asarray(ya)).max()
        assert d.max() < 1e-4 * max(ref, 1.0), d.max()
        np.testing.assert_allclose(
            np.asarray(sa.tau), np.asarray(sb.tau), atol=1e-4
        )

    def test_n_valid_parity(self):
        x = _sig(seed=4)
        ya, va, _ = _mk().execute_slots(jnp.asarray(x), n_valid=200,
                                        backend="xla")
        yb, vb, _ = _mk().execute_slots(jnp.asarray(x), n_valid=200,
                                        backend="fused")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        assert np.abs(np.asarray(ya) - np.asarray(yb)).max() < 1e-4

    @pytest.mark.slow
    def test_block_split_invariance_bit_exact(self):
        """Against ITSELF the fused kernel is bit-invariant to splits."""
        x = _sig(seed=5)
        s = _mk()
        y1, v1, s = s.execute_slots(jnp.asarray(x[:, :128]), backend="fused")
        y2, v2, s = s.execute_slots(jnp.asarray(x[:, 128:]), backend="fused")
        yf, vf, _ = _mk().execute_slots(jnp.asarray(x), backend="fused")
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(v1), np.asarray(v2)], axis=1),
            np.asarray(vf),
        )
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
            np.asarray(yf),
        )


class TestLaneMisalignedPad:
    """C % 128 != 0 batches ride the kernel via edge-pad-to-128 + slice
    (filter/symsync.py pad branch): results must be BIT-EXACT vs the XLA
    scan at the original C — the pad channels are lane-parallel and
    independent, so they cannot perturb the real channels."""

    @pytest.mark.parametrize("c", [8, 64, 100])
    def test_pad_path_bit_exact(self, c):
        rng = np.random.default_rng(6)
        x = (rng.standard_normal((c, N)) + 1j *
             rng.standard_normal((c, N))).astype(np.complex64)
        mk = lambda: Symsync.create_rnyquist(  # noqa: E731
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(c,)
        ).set_lf_bw(0.02)
        ya, va, sa = mk().execute_slots(jnp.asarray(x), backend="xla")
        yb, vb, sb = mk().execute_slots(jnp.asarray(x), backend="pallas")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        assert np.asarray(vb).shape[0] == c
        for fa, fb in zip(jax.tree_util.tree_leaves(sa),
                          jax.tree_util.tree_leaves(sb)):
            assert np.asarray(fa).shape == np.asarray(fb).shape
            np.testing.assert_allclose(
                np.asarray(fa), np.asarray(fb), rtol=1e-6, atol=1e-6)

    def test_pad_path_fused_matches_unpadded_kernel(self):
        """The padded fused route at C=100 equals the first 100 channels of
        a C=128 kernel run on the edge-padded input (pad transparency)."""
        c = 100
        rng = np.random.default_rng(7)
        x = (rng.standard_normal((c, N)) + 1j *
             rng.standard_normal((c, N))).astype(np.complex64)
        xp = np.pad(x, [(0, 128 - c), (0, 0)], mode="edge")
        mk = lambda cc: Symsync.create_rnyquist(  # noqa: E731
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(cc,)
        ).set_lf_bw(0.02)
        ya, va, _ = mk(c).execute_slots(jnp.asarray(x), backend="fused")
        yb, vb, _ = mk(128).execute_slots(jnp.asarray(xp), backend="fused")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb)[:c])
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb)[:c])
