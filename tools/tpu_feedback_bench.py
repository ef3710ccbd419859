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

    from tools import perfcommon as _pc

    # pin the session calibration to the RUN START: write_artifact reuses
    # the cached value, so the validity stamp describes the session at the
    # moment the measurements begin (contention swings minute-to-minute);
    # abort immediately on a contended session rather than measuring for
    # minutes only to have write_artifact refuse the stamp
    meta = _pc.calibrate(jax, jnp)  # pinned
    ok, why = _pc.calib_valid(meta)
    print(f"calibration: {meta} -> {why}", file=sys.stderr)
    if not ok:
        print("session contended; aborting without measuring", file=sys.stderr)
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
    for channels in (64, 256, 1024, 2048):
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

    # full execute (sort-compacted, round-4 default) → compaction overhead
    for channels in (64, 1024):
        px = make_px(channels)
        mk = lambda: Symsync.create_rnyquist(
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(channels,)
        ).set_lf_bw(0.02)
        try:
            m_full, r_full = pc.chain_rate(
                jax, jnp, mk, lambda s, v: s.execute(v),
                channels * block, 8, 3, px,
            )
            results[f"symsync_execute_c{channels}"] = {"msps": round(m_full, 1)}
            print(f"symsync execute (sort-compacted) C={channels}: {m_full:.1f} Msps")
        except Exception as e:
            results[f"symsync_execute_c{channels}"] = {"error": str(e)[:200]}
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
    for channels in (256, 1024, 2048):
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

    # --- config[1] composite: arbitrary msresamp (farrow) + symsync -------
    import bench

    try:
        m1, r1 = bench.bench_symsync(jax, jnp)
        results["config1_msresamp_symsync_c1024"] = {"msps": round(m1, 1)}
        print(f"config1 composite C=1024: {m1:.1f} Msps")
    except Exception as e:
        results["config1_msresamp_symsync_c1024"] = {"error": str(e)[:200]}
        print(f"config1 composite FAILED: {e}", file=sys.stderr)

    # --- small-C block LATENCY (VERDICT r3 next#8: per-stream floor) -------
    # Aggregate throughput needs C >= 256; a real SDR front-end also cares
    # about single-stream block latency. Block 4096, C in {1, 4, 16, 64}.
    import time as _t

    from yagi_tpu.chains import FmStereoRx

    lat = {}
    t_null = pc.null_latency(jax, jnp)
    for name, mkfn, stepfn, blk in (
        ("symsync", lambda C: Symsync.create_rnyquist(
            FirFilterShape.RRCOS, 2, 7, 0.3, batch_shape=(C,)).set_lf_bw(0.02),
         lambda s, v: s.execute_slots(v), 4096),
        ("qamrx", lambda C: QamRx.create(batch_shape=(C,)),
         lambda s, v: s.step_masked(v), 4096),
        ("fm_stereo", lambda C: FmStereoRx.create(batch_shape=(C,)),
         lambda s, v: s.step(v), 4096),
    ):
        for C in (1, 4, 16, 64):
            try:
                from yagi_tpu.utils.planar import planar_jit

                x = (rng.standard_normal((C, blk)) + 1j *
                     rng.standard_normal((C, blk))).astype(np.complex64) * 0.3
                pxl = Planar(jnp.asarray(x.real.copy()),
                             jnp.asarray(x.imag.copy()))
                st = planar_jit(lambda mk=mkfn, CC=C: mk(CC))()
                g = planar_jit(stepfn)
                rb = jax.jit(lambda v: jnp.abs(
                    jnp.ravel(v)[:1].astype(jnp.float32)).reshape(1, 1))
                out = g(st, pxl)
                lead = out[0]
                _ = np.asarray(rb(lead.re if isinstance(lead, Planar) else lead))
                ts = []
                for _r in range(5):
                    t0 = _t.perf_counter()
                    out = g(st, pxl)
                    lead = out[0]
                    _ = np.asarray(rb(
                        lead.re if isinstance(lead, Planar) else lead))
                    ts.append(_t.perf_counter() - t0 - t_null)
                ms = round(float(np.median(ts)) * 1e3, 2)
                if ms <= 0.05:
                    # device time below the tunnel round-trip floor
                    lat[f"{name}_c{C}_block{blk}_ms"] = "<null-RT floor"
                else:
                    lat[f"{name}_c{C}_block{blk}_ms"] = ms
                print(f"latency {name} C={C}: {ms:.2f} ms/block")
            except Exception as e:
                lat[f"{name}_c{C}_block{blk}_ms"] = f"skipped: {str(e)[:80]}"
    results["small_c_latency"] = lat

    pc.write_artifact("FEEDBACK_PROFILE.json", results, jax, jnp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
