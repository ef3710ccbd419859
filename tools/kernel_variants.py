#!/usr/bin/env python
"""Chain-kernel formulation experiments on the attached TPU.

Times variants of the fused chain kernel (kernels/chain.py) with the honest
methodology; each variant runs in sequence with independent try/except so
one failure doesn't lose the rest. Results append to stderr and
KERNEL_VARIANTS.json.

Variants:
  base      — production: two [.,128]@[128,256] dots (prev + cur), HIGHEST
  k256      — one [.,256]@[256,256] dot over lane-concatenated [prev|cur]
  nomix     — base without the NCO rotation (isolates mix cost)
  nodot     — mix only (isolates DMA+VPU floor)
  r16/r64   — tile-size sweep
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from yagi_tpu.kernels.chain import chain_matrices
    from yagi_tpu import design
    from yagi_tpu.filter.firpfb import pfb_decompose

    C, T, P = 16, 1 << 17, 2
    LANE = 128
    NB = T // LANE
    OUTW = LANE * P
    PREC = jax.lax.Precision.HIGHEST

    h_fir = design.fir_design_kaiser(64, 0.2, 60.0, 0.0)
    n = 2 * 7 * 256 + 1
    hf = design.fir_design_kaiser(n, 0.25 / 256, 60.0, 0.0)
    h_pfb = (hf * (256 / np.sum(hf))).astype(np.float32)
    branches = pfb_decompose(h_pfb[: n - 1], 256)
    g_np = chain_matrices(h_fir, 0.4, branches, P)  # [2, 128, 256]

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    g = jnp.asarray(g_np)
    g256 = jnp.asarray(np.concatenate([g_np[0], g_np[1]], axis=0))  # [256,256]
    scal = jnp.asarray([7, 11], jnp.int32)
    rb = jax.jit(lambda v: jnp.abs(v[:1, :1, :1]))

    tiny = jnp.ones((8, 8), jnp.float32)
    tf = jax.jit(lambda v: v + 1)
    rbs = jax.jit(lambda v: jnp.abs(v[:1, :1]))
    _ = np.asarray(rbs(tf(tiny)))
    t0 = time.perf_counter()
    _ = np.asarray(rbs(tf(tiny)))
    t_null = time.perf_counter() - t0

    def build(r, mode):
        grid = NB // r
        x3r = xr.reshape(C, NB, LANE)
        x3i = xi.reshape(C, NB, LANE)
        hz = jnp.zeros((C, LANE), jnp.float32)
        hr_rows = jnp.concatenate(
            [hz[None], x3r[:, r - 1 :: r][:, :-1].transpose(1, 0, 2)], axis=0
        )
        hi_rows = jnp.concatenate(
            [hz[None], x3i[:, r - 1 :: r][:, :-1].transpose(1, 0, 2)], axis=0
        )

        def kernel(sref, ar, ai, gref, grf, hrr, hir, yr, yi):
            i = pl.program_id(0)
            xr_ = ar[:]
            xi_ = ai[:]
            h_r = hrr[0].reshape(C, 1, LANE)
            h_i = hir[0].reshape(C, 1, LANE)
            pr = jnp.concatenate([h_r, xr_[:, : r - 1]], axis=1)
            pi = jnp.concatenate([h_i, xi_[:, : r - 1]], axis=1)
            if mode == "nodot":
                zr = jnp.concatenate([xr_, xr_], axis=2)
                zi = jnp.concatenate([xi_, xi_], axis=2)
            elif mode == "k256":
                dn = (((2,), (0,)), ((), ()))
                fr = jnp.concatenate([pr, xr_], axis=2)  # [C, r, 256]
                fi = jnp.concatenate([pi, xi_], axis=2)
                dg = lambda a: jax.lax.dot_general(
                    a, grf[:], dn, preferred_element_type=jnp.float32,
                    precision=PREC)
                zr = dg(fr)
                zi = dg(fi)
            else:
                dn = (((2,), (0,)), ((), ()))
                dg = lambda a, w: jax.lax.dot_general(
                    a, w, dn, preferred_element_type=jnp.float32,
                    precision=PREC)
                zr = dg(pr, gref[0]) + dg(xr_, gref[1])
                zi = dg(pi, gref[0]) + dg(xi_, gref[1])
            if mode == "nomix" or mode == "nodot":
                yr[:] = zr
                yi[:] = zi
            else:
                rows = jax.lax.broadcasted_iota(jnp.int32, (r, OUTW), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (r, OUTW), 1)
                idx = (i * jnp.int32(r) + rows) * jnp.int32(OUTW) + cols
                theta = sref[0] + idx * sref[1]
                hi16 = jax.lax.shift_right_logical(theta, 16).astype(jnp.float32)
                lo16 = (theta & jnp.int32(0xFFFF)).astype(jnp.float32)
                t = (hi16 * jnp.float32(65536.0) + lo16) * jnp.float32(
                    2.0 * np.pi / 4294967296.0)
                c_ = jnp.cos(t)[None]
                s_ = jnp.sin(t)[None]
                yr[:] = zr * c_ + zi * s_
                yi[:] = zi * c_ - zr * s_

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((C, r, LANE), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, r, LANE), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LANE, OUTW), lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * LANE, OUTW), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, LANE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, LANE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((C, r, OUTW), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, r, OUTW), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM),
            ],
        )
        f0 = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((C, NB, OUTW), jnp.float32),) * 2,
            grid_spec=gs,
        )
        return jax.jit(lambda: f0(scal, x3r, x3i, g, g256, hr_rows, hi_rows))

    results = {}
    cases = [
        ("k256_r32", 32, "k256"),
        ("k256_r64", 64, "k256"),
        ("k256_r128", 128, "k256"),
        ("base_r32", 32, "base"),
    ]
    for tag, r, mode in cases:
        try:
            f = build(r, mode)
            t0 = time.perf_counter()
            y, y2 = f()
            v = np.asarray(rb(y))
            assert np.isfinite(v).all()
            compile_s = time.perf_counter() - t0
            n_steps = 192
            t0 = time.perf_counter()
            for _ in range(n_steps):
                y, y2 = f()
            v = np.asarray(rb(y))
            dt = time.perf_counter() - t0 - t_null
            msps = C * T * n_steps / dt / 1e6
            results[tag] = round(msps, 1)
            print(f"{tag:12s}: {msps:8.0f} Msps ({dt/n_steps*1e6:.0f} us/step, "
                  f"compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
        except Exception as e:
            results[tag] = f"FAIL {str(e)[:60]}"
            print(f"{tag:12s}: FAIL {str(e)[:80]}", file=sys.stderr, flush=True)
    pathlib.Path("KERNEL_VARIANTS.json").write_text(json.dumps(results, indent=1))
    print("wrote KERNEL_VARIANTS.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
