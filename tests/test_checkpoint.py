"""Checkpoint/restore round-trip: mid-stream state serialization.

The reference proves state capturability object-by-object with mid-stream
Clone tests (/root/reference/src/filter/resampler/resamp.rs:345-381,
src/filter/symsync.rs:290-336). Here the equivalent guarantee is stronger:
for every stateful streaming type, run N samples, serialize the state pytree
to DISK (utils/checkpoint.py), restore it into a freshly created object, and
prove the next M samples are BIT-IDENTICAL to the uninterrupted run — both
the outputs and every leaf of the final state.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yagi_tpu.agc import Agc
from yagi_tpu.chains import FmStereoRx, QamRx
from yagi_tpu.design import FirFilterShape
from yagi_tpu.equalization import Eqlms, Eqrls
from yagi_tpu.fft import Spgram
from yagi_tpu.filter import (FftFilt, FirFarrow, FirFilter, IirFilter,
                             IirFilterSos, MsResamp, MsResamp2, Resamp,
                             Resamp2, Symsync)
from yagi_tpu.modem import Freqdem, Freqmod, Fskdem, GmskDem
from yagi_tpu.multichannel import Firpfbch, Firpfbch2
from yagi_tpu.nco import Osc
from yagi_tpu.utils.checkpoint import load_state, save_state

from autotest import autotest


def _cx(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


def _re(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def _chunks(x, n_blocks):
    return np.array_split(x, n_blocks)


# Each case: (name, factory, step(state, block) -> (outputs_tuple, state),
#             input_generator)
_H9 = np.arange(1, 10, dtype=np.float32) / 10.0


def _sym_factory():
    return Symsync.create_rnyquist(FirFilterShape.RRCOS, 2, 7, 0.3).set_lf_bw(
        0.02
    )


CASES = {
    "resamp_arbitrary": (
        lambda: Resamp.create(0.7153),
        lambda s, x: ((lambda y, n, st: ((y, n), st))(*s.execute_block(x))),
        _cx,
    ),
    "resamp_fastpath": (
        lambda: Resamp.create(2.0),
        lambda s, x: ((lambda y, n, st: ((y, n), st))(*s.execute_block(x))),
        _cx,
    ),
    "resamp2_analyzer": (
        lambda: Resamp2.create(7),
        lambda s, x: (
            (lambda y0, y1, st: ((y0, y1), st))(*s.analyzer_execute_block(x))
        ),
        _cx,
    ),
    "msresamp": (
        lambda: MsResamp.create(0.37, 60.0),
        lambda s, x: ((lambda y, n, st: ((y, n), st))(*s.execute_block(x))),
        _cx,
    ),
    "msresamp2_decim": (
        lambda: MsResamp2.create(False, 2, 0.4, 0.0, 60.0),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        lambda n, seed=0: _cx(n - n % 4, seed),
    ),
    "symsync": (
        _sym_factory,
        lambda s, x: ((lambda y, n, st: ((y, n), st))(*s.execute(x))),
        _cx,
    ),
    "agc": (
        lambda: Agc.create().set_bandwidth(0.01),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        _cx,
    ),
    "osc_mix": (
        lambda: Osc.create("nco").set_frequency(0.31),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.mix_block_down(x))),
        _cx,
    ),
    "eqlms": (
        lambda: Eqlms.create(h_len=7).set_bw(0.02),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(2, x))),
        _cx,
    ),
    "eqrls": (
        lambda: Eqrls.create(p=5),
        lambda s, x: (
            (lambda y, st: ((y,), st))(*s.train_block(x, 0.5 * x))
        ),
        _cx,
    ),
    "firfilt": (
        lambda: FirFilter.create(_H9, dtype=jnp.complex64),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        _cx,
    ),
    "fftfilt": (
        lambda: FftFilt.create(_H9, 64, dtype=jnp.complex64),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_blocks(x))),
        lambda n, seed=0: _cx(n - n % 128, seed),
    ),
    "firfarrow": (
        lambda: FirFarrow.create(9, 4, 0.45, 40.0).set_delay(0.3),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        _cx,
    ),
    "iirfilt": (
        lambda: IirFilter.create_lowpass(5, 0.1, dtype=jnp.complex64),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        _cx,
    ),
    "iirfiltsos": (
        lambda: IirFilterSos.create([0.2, 0.4, 0.2], [1.0, -0.5, 0.1], dtype=jnp.complex64),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.execute_block(x))),
        _cx,
    ),
    "spgram": (
        lambda: Spgram.create(64),
        lambda s, x: ((), s.write(x)),
        _cx,
    ),
    "firpfbch_analyzer": (
        lambda: Firpfbch.create_kaiser(4, 5, 60.0),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.analyzer_execute(x))),
        lambda n, seed=0: _cx(n - n % 4, seed),
    ),
    "firpfbch2_analyzer": (
        lambda: Firpfbch2.create(4, 3, 60.0),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.analyzer_execute(x))),
        lambda n, seed=0: _cx(n - n % 2, seed),
    ),
    "qamrx": (
        lambda: QamRx.create(),
        lambda s, x: (
            (lambda sy, so, n, st: ((sy, so, n), st))(*s.step(x))
        ),
        lambda n, seed=0: _cx(n - n % 4, seed),
    ),
    "fm_stereo": (
        lambda: FmStereoRx.create(),
        lambda s, x: (
            (lambda l, r, p, st: ((l, r, p), st))(*s.step(x))
        ),
        lambda n, seed=0: (_cx(n - n % 16, seed) * 0.1),
    ),
    "freqdem": (
        lambda: Freqdem.create(0.1),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.demodulate(x))),
        _cx,
    ),
    "freqmod": (
        lambda: Freqmod.create(0.1),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.modulate(x))),
        _re,
    ),
    "gmskdem": (
        lambda: GmskDem.create(4, 3, 0.3),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.demodulate(x))),
        lambda n, seed=0: _cx(n - n % 4, seed),
    ),
    "fskdem": (
        lambda: Fskdem.create(2, 8, 0.25),
        lambda s, x: ((lambda y, st: ((y,), st))(*s.demodulate(x))),
        lambda n, seed=0: _cx(n - n % 8, seed),
    ),
}


@pytest.mark.parametrize("name", [
    n if n not in ("fm_stereo", "qamrx", "msresamp")
    else pytest.param(n, marks=pytest.mark.slow)
    for n in sorted(CASES)])
@autotest("resamp_crcf_copy", "symsync_copy", "agc_crcf_copy",
          "nco_crcf_copy", "eqlms_cccf_copy", "eqrls_rrrf_copy",
          "firfilt_crcf_copy", "iirfilt_copy_tf", "iirfiltsos_copy",
          "spgramcf_copy", "firpfbch2_crcf_copy", "fskdem_copy",
          "gmskdem_copy", "msresamp2_copy", "resamp2_copy")
def test_checkpoint_roundtrip(tmp_path, name):
    """Run N, save to disk, restore into a fresh object, run M: outputs and
    final state must be bit-identical to the uninterrupted run."""
    factory, step, gen = CASES[name]
    x = gen(600, seed=42)
    n1 = len(x) // 2
    b1, b2 = x[:n1], x[n1:]

    # uninterrupted reference
    s = factory()
    _, s = step(s, jnp.asarray(b1))
    ref_out, ref_state = step(s, jnp.asarray(b2))

    # checkpointed run
    s2 = factory()
    _, s2 = step(s2, jnp.asarray(b1))
    path = tmp_path / f"{name}.npz"
    save_state(path, s2)

    restored = load_state(path, factory())
    got_out, got_state = step(restored, jnp.asarray(b2))

    assert len(ref_out) == len(got_out)
    for a, b in zip(ref_out, got_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state),
        jax.tree_util.tree_leaves(got_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_mismatched_template(tmp_path):
    s = Agc.create()
    path = tmp_path / "agc.npz"
    save_state(path, s)
    with pytest.raises(ValueError):
        load_state(path, Eqlms.create(h_len=7))
    with pytest.raises(ValueError):
        load_state(path, Agc.create(batch_shape=(2,)))


def test_checkpoint_pytree_of_states(tmp_path):
    """A whole receiver graph (dict of states) checkpoints as one file."""
    graph = {
        "agc": Agc.create(),
        "sync": _sym_factory(),
        "dem": Freqdem.create(0.1),
    }
    x = _cx(256, seed=1)
    y, graph["agc"] = graph["agc"].execute_block(jnp.asarray(x))
    path = tmp_path / "graph.npz"
    save_state(path, graph)
    restored = load_state(
        path,
        {"agc": Agc.create(), "sync": _sym_factory(), "dem": Freqdem.create(0.1)},
    )
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(graph), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
