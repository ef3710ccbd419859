#!/usr/bin/env python
"""Tile-size sweep + parity for the merged-dot fused chain on real TPU.

Writes R_SWEEP.json: {"parity_rel_err": ..., "r32": msps, "r64": ..., ...}
Methodology per kernels/ROOFLINE.md (dependency chain + readback + null).
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
        print(f"not a TPU backend ({plat})", file=sys.stderr)
        return 1

    from tools import perfcommon as _pc

    # pin the session calibration to the RUN START: write_artifact reuses
    # the cached value, so the validity stamp describes the session at the
    # moment the measurements begin (contention swings minute-to-minute)
    _pc.calibrate(jax, jnp)  # pinned

    C, T = 16, 1 << 17
    rng = np.random.default_rng(0)
    xh = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(
        np.complex64
    )
    pxr = jnp.asarray(np.ascontiguousarray(xh.real))
    pxi = jnp.asarray(np.ascontiguousarray(xh.imag))
    rb = jax.jit(lambda v: jnp.abs(v[:1, :1]))
    results = {}

    # parity vs XLA chain at r=32
    fc = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=32))()
    fstep = jax.jit(lambda c, a, b: c.step_planar(a, b))
    yr, yi, k, _ = fstep(fc, pxr, pxi)
    v = np.asarray(rb(yr))
    assert np.isfinite(v).all() and v.max() > 0
    rc = planar_jit(lambda: RxChain.create(batch_shape=(C,)))()
    rstep = planar_jit(lambda c, x: c.step(x))
    py, kk, _ = rstep(rc, Planar(pxr, pxi))
    K = 2 * T
    cmp = jax.jit(
        lambda ar, ai, br, bi: (
            jnp.max(jnp.abs(ar[:, :K] - br) + jnp.abs(ai[:, :K] - bi))
            / (jnp.max(jnp.abs(ar[:, :K]) + jnp.abs(ai[:, :K])) + 1e-9)
        ).reshape(1, 1)
    )
    rel = float(np.asarray(cmp(py.re, py.im, yr, yi))[0, 0])
    results["parity_rel_err"] = rel
    print(f"parity merged-dot vs XLA (on-chip): rel err {rel:.2e}",
          file=sys.stderr, flush=True)

    tiny = jnp.ones((8, 8), jnp.float32)
    tf = jax.jit(lambda v: v + 1)
    _ = np.asarray(rb(tf(tiny)))
    t0 = time.perf_counter()
    _ = np.asarray(rb(tf(tiny)))
    t_null = time.perf_counter() - t0

    for r in (32, 64, 128):
        try:
            st = jax.jit(lambda r=r: FusedRxChain.create(batch_shape=(C,), r=r))()
            yr, yi, k, _ = fstep(st, pxr, pxi)
            v = np.asarray(rb(yr))
            assert np.isfinite(v).all()
            best = 0.0
            for _ in range(3):
                c = st
                n = 192
                t0 = time.perf_counter()
                for _ in range(n):
                    yr, yi, k, c = fstep(c, pxr, pxi)
                v = np.asarray(rb(yr))
                assert np.isfinite(v).all()
                msps = C * T * n / (time.perf_counter() - t0 - t_null) / 1e6
                best = max(best, msps)
            results[f"r{r}"] = round(best, 1)
            print(f"r={r}: {best:.0f} Msps", file=sys.stderr, flush=True)
        except Exception as e:
            msg = str(e)
            token = ("FAIL: compiler-crash" if "remote_compile" in msg or "INTERNAL" in msg
                     else "FAIL: " + type(e).__name__)
            results[f"r{r}"] = token
            print(f"r={r}: FAIL {str(e)[:100]}", file=sys.stderr, flush=True)
    from tools import perfcommon as pc

    pc.write_artifact("R_SWEEP.json", results, jax=jax, jnp=jnp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
