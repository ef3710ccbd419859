#!/usr/bin/env python
"""Real-TPU microbench for the feedback chains (configs [1] and [3]).

Round-3 attack on VERDICT item 1 (symsync 4 Msps / QamRx 3 Msps aggregate).
Measures, same-session:
  * symsync scan throughput at C = 64 / 256 / 1024 channels (channel-scaling
    table — if aggregate scales with C, the chip is step-overhead-bound);
  * compaction (argsort) cost in isolation;
  * QamRx full chain;
with the honest chained-state methodology (tools/perfcommon.py).

Writes FEEDBACK_PROFILE.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tools import perfcommon as pc
    from yagi_tpu.design import FirFilterShape
    from yagi_tpu.filter import Symsync
    from yagi_tpu.utils.planar import Planar

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(f"not a TPU backend ({plat})", file=sys.stderr)
        return 1

    results = {}
    block = 4096
    rng = np.random.default_rng(2)

    def make_px(channels):
        x = (rng.standard_normal((channels, block)) + 1j *
             rng.standard_normal((channels, block))).astype(np.complex64)
        return Planar(jnp.asarray(np.ascontiguousarray(x.real)),
                      jnp.asarray(np.ascontiguousarray(x.imag)))

    # --- symsync channel scaling, slots (no compaction) vs full execute ----
    for channels in (64, 256, 1024):
        px = make_px(channels)
        mk = lambda: Symsync.create_rnyquist(
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(channels,)
        ).set_lf_bw(0.02)
        n_steps = 8 if channels <= 256 else 4
        try:
            m_slots, r_slots = pc.chain_rate(
                jax, jnp, mk, lambda s, v: s.execute_slots(v),
                channels * block, n_steps, 3, px,
            )
            results[f"symsync_slots_c{channels}"] = {
                "msps": round(m_slots, 1),
                "spread": round((max(r_slots) - min(r_slots)) / m_slots, 3),
            }
            print(f"symsync slots C={channels}: {m_slots:.1f} Msps")
        except Exception as e:
            results[f"symsync_slots_c{channels}"] = {"error": str(e)[:200]}
            print(f"symsync slots C={channels} FAILED: {e}", file=sys.stderr)

    # full execute (with argsort compaction) at C=64 → compaction overhead
    px = make_px(64)
    mk = lambda: Symsync.create_rnyquist(
        FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(64,)
    ).set_lf_bw(0.02)
    try:
        m_full, r_full = pc.chain_rate(
            jax, jnp, mk, lambda s, v: s.execute(v), 64 * block, 8, 3, px,
        )
        results["symsync_execute_c64"] = {"msps": round(m_full, 1)}
        print(f"symsync execute (compacted) C=64: {m_full:.1f} Msps")
    except Exception as e:
        results["symsync_execute_c64"] = {"error": str(e)[:200]}
        print(f"symsync execute FAILED: {e}", file=sys.stderr)

    # --- QamRx (config[3]) -------------------------------------------------
    from yagi_tpu.chains import QamRx

    for channels in (64, 256):
        px = make_px(channels)
        mkq = lambda: QamRx.create(batch_shape=(channels,))
        try:
            m_q, r_q = pc.chain_rate(
                jax, jnp, mkq, lambda s, v: s.step(v),
                channels * block, 4, 3, px,
            )
            results[f"qamrx_c{channels}"] = {"msps": round(m_q, 1)}
            print(f"qamrx C={channels}: {m_q:.1f} Msps")
        except Exception as e:
            results[f"qamrx_c{channels}"] = {"error": str(e)[:200]}
            print(f"qamrx C={channels} FAILED: {e}", file=sys.stderr)

    # masked (slot-fed, no compaction) path — what bench config[3] measures
    for channels in (256, 1024):
        px = make_px(channels)
        mkq = lambda: QamRx.create(batch_shape=(channels,))
        n_steps = 4 if channels <= 256 else 2
        try:
            m_q, r_q = pc.chain_rate(
                jax, jnp, mkq, lambda s, v: s.step_masked(v),
                channels * block, n_steps, 3, px,
            )
            results[f"qamrx_masked_c{channels}"] = {"msps": round(m_q, 1)}
            print(f"qamrx masked C={channels}: {m_q:.1f} Msps")
        except Exception as e:
            results[f"qamrx_masked_c{channels}"] = {"error": str(e)[:200]}
            print(f"qamrx masked C={channels} FAILED: {e}", file=sys.stderr)

    pc.write_artifact("FEEDBACK_PROFILE.json", results, jax, jnp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
