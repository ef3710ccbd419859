#!/usr/bin/env python
"""Same-session A/B of the fused-chain precision modes and tile sizes.

Regenerates KERNEL_VARIANTS.json — the artifact backing the bench headline's
bf16x3 mode choice (bench.py:248-261) — under the perfcommon validity rule
(calibration stamp, spread <= 0.3), replacing the round-3 hand-written
version whose session calibration was contention-invalid (spread 0.559).

Measures fp32-HIGHEST vs bf16x3 at r in {32, 64} via bench.bench_fused_chain
plus the one-block relative parity error between the two modes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench
    import tools.perfcommon as pc

    # Calibrate FIRST (perfcommon caches per process, so write_artifact
    # reuses this result): the stamp then reflects session conditions at
    # measurement start, and a contended session aborts before spending
    # minutes on measurements it would refuse to write.
    meta = pc.calibrate(jax, jnp)
    ok, why = pc.calib_valid(meta)
    print(f"calibration: {meta} -> {why}", file=sys.stderr)
    if not ok:
        print("session contended; aborting without measuring", file=sys.stderr)
        return 1

    results = {
        "note": "same-session A/B, C=16 block 2^17 n_steps=512 (median of 5 "
                "chained reps each), via bench.bench_fused_chain",
    }
    for name, prec, r in (
        ("highest_r64_msps", "highest", 64),
        ("bf16x3_r64_msps", "bf16x3", 64),
        ("highest_r32_msps", "highest", 32),
        ("bf16x3_r32_msps", "bf16x3", 32),
    ):
        m, rates = bench.bench_fused_chain(jax, jnp, precision=prec, r=r)
        results[name] = round(m)
        print(f"{name}: {m:.0f} (min/max {min(rates):.0f}/{max(rates):.0f})",
              file=sys.stderr)

    # one-block value parity between the two modes (identical input/state)
    from yagi_tpu.chains import FusedRxChain

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((16, 1 << 17)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((16, 1 << 17)).astype(np.float32))
    outs = {}
    for prec in ("highest", "bf16x3"):
        chain = jax.jit(lambda p=prec: FusedRxChain.create(
            n_taps=64, fc=0.2, as_=60.0, rate=2.0, mix_freq=0.35,
            batch_shape=(16,), r=64, precision=p))()
        yr, yi, k, _ = jax.jit(lambda c, a, b: c.step_planar(a, b))(
            chain, xr, xi)
        outs[prec] = np.asarray(yr).astype(np.float64) + 1j * np.asarray(
            yi).astype(np.float64)
    ref = outs["highest"]
    rel = float(np.max(np.abs(outs["bf16x3"] - ref)) /
                max(np.max(np.abs(ref)), 1e-30))
    results["bf16x3_parity_rel_vs_highest"] = float(f"{rel:.3g}")
    gain = results["bf16x3_r64_msps"] / results["highest_r64_msps"] - 1.0
    results["conclusion"] = (
        f"bf16x3 3-pass split {gain:+.0%} over fp32-HIGHEST same-session at "
        "r=64; production bench headline uses bf16x3 (documented ~1e-5 "
        "tolerance), HIGHEST kept as exactness mode/default")
    print(f"parity rel err: {rel:.2e}; bf16x3 gain at r=64: {gain:+.0%}",
          file=sys.stderr)

    pc.write_artifact("KERNEL_VARIANTS.json", results, jax, jnp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
