#!/usr/bin/env python
"""Real-TPU parity + throughput record for the fused chain kernel.

Runs the fused Pallas chain (kernels/chain.py) COMPILED on the attached TPU,
checks tolerance-bounded parity against the two-stage XLA chain on-device,
and measures honest throughput (dependency chain + readback + null-latency
subtraction — see kernels/ROOFLINE.md "Measurement on axon").

Writes TPU_PARITY.json at the repo root:
  {"parity_rel_err": ..., "fused_msps": ..., "xla_msps": ..., ...}
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
    from yagi_tpu.utils.planar import Planar, planar_jit

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(f"not a TPU backend ({plat}); nothing to record", file=sys.stderr)
        return 1

    C, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xh = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(
        np.complex64
    )
    px = Planar(
        jnp.asarray(np.ascontiguousarray(xh.real)),
        jnp.asarray(np.ascontiguousarray(xh.imag)),
    )
    rb = jax.jit(lambda v: jnp.abs(v[:1, :1]))

    fc = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=64))()
    fstep = jax.jit(lambda c, a, b: c.step_planar(a, b))
    yr, yi, k, _ = fstep(fc, px.re, px.im)
    v = np.asarray(rb(yr))
    assert np.isfinite(v).all() and v.max() > 0

    rc = planar_jit(lambda: RxChain.create(batch_shape=(C,)))()
    rstep = planar_jit(lambda c, x: c.step(x))
    py, kk, _ = rstep(rc, px)
    K = 2 * T
    cmp = jax.jit(
        lambda ar, ai, br, bi: (
            jnp.max(jnp.abs(ar[:, :K] - br) + jnp.abs(ai[:, :K] - bi))
            / (jnp.max(jnp.abs(ar[:, :K]) + jnp.abs(ai[:, :K])) + 1e-9)
        ).reshape(1, 1)
    )
    rel = float(np.asarray(cmp(py.re, py.im, yr, yi))[0, 0])
    print(f"parity fused-vs-XLA (compiled, on-chip): rel err {rel:.2e}")

    # null round-trip
    tiny = jnp.ones((8, 8), jnp.float32)
    tf = jax.jit(lambda v: v + 1)
    _ = np.asarray(rb(tf(tiny)))
    t0 = time.perf_counter()
    _ = np.asarray(rb(tf(tiny)))
    t_null = time.perf_counter() - t0

    def rate(step_fn, state, n):
        c = state
        t0 = time.perf_counter()
        for _ in range(n):
            out = step_fn(c, px.re, px.im) if step_fn is fstep else step_fn(c, px)
            c = out[-1]
        lead = out[0].re if isinstance(out[0], Planar) else out[0]
        v = np.asarray(rb(lead))
        assert np.isfinite(v).all()
        return C * T * n / (time.perf_counter() - t0 - t_null) / 1e6

    fused_msps = max(rate(fstep, fc, 128) for _ in range(2))
    xla_msps = rate(rstep, rc, 8)
    print(f"fused: {fused_msps:.0f} Msps | XLA chain: {xla_msps:.1f} Msps")

    # ---- fused channelizer (config[4]) ---------------------------------
    from yagi_tpu.multichannel import Firpfbch, FusedChannelizer

    M, Tc = 64, 1 << 15
    rng = np.random.default_rng(1)
    xc = (rng.standard_normal(Tc * M) + 1j * rng.standard_normal(Tc * M)).astype(
        np.complex64
    )
    cxr = jnp.asarray(np.ascontiguousarray(xc.real))
    cxi = jnp.asarray(np.ascontiguousarray(xc.imag))
    fz = jax.jit(lambda: FusedChannelizer.create_kaiser(M, 4, 60.0, r2=128))()
    cstep = jax.jit(lambda c, a, b: c.analyzer_execute_planar(a, b))
    cyr, cyi, _ = cstep(fz, cxr, cxi)
    _ = np.asarray(rb(cyr))
    refc = planar_jit(lambda: Firpfbch.create_kaiser(M, 4, 60.0))()
    crstep = planar_jit(lambda c, v: c.analyzer_execute(v))
    pyc, _ = crstep(refc, Planar(cxr, cxi))
    ccmp = jax.jit(
        lambda ar, ai, br, bi: (
            jnp.max(jnp.abs(ar - br.T) + jnp.abs(ai - bi.T))
            / (jnp.max(jnp.abs(ar)) + 1e-9)
        ).reshape(1, 1)
    )
    chan_rel = float(np.asarray(ccmp(pyc.re, pyc.im, cyr, cyi))[0, 0])
    c = fz
    t0 = time.perf_counter()
    for _ in range(128):
        cyr, cyi, c = cstep(c, cxr, cxi)
    v = np.asarray(rb(cyr))
    assert np.isfinite(v).all()
    chan_msps = Tc * M * 128 / (time.perf_counter() - t0 - t_null) / 1e6
    print(f"fused channelizer: {chan_msps:.0f} Msps, parity {chan_rel:.2e}")

    from tools import perfcommon as pc

    pc.write_artifact(
        "TPU_PARITY.json",
        {
            "chain": {
                "parity_rel_err": rel,
                "fused_msps": round(fused_msps, 1),
                "xla_msps": round(xla_msps, 2),
                "channels": C,
                "block": T,
            },
            "channelizer": {
                "parity_rel_err": chan_rel,
                "fused_msps": round(chan_msps, 1),
                "M": M,
                "steps_per_block": Tc,
            },
            "platform": plat,
            "note": "compiled Pallas kernels on real TPU; methodology per kernels/ROOFLINE.md",
        },
        jax, jnp,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
