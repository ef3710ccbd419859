#!/usr/bin/env python
"""Benchmark: complex Msamples/s/chip through the firfilt+resamp+mix chain.

BASELINE.json config[0] workload on real hardware: 64-tap kaiser lowpass →
2x arbitrary polyphase resampler (256-branch PFB, u32 phase) → NCO mix-down,
run over a batch of channels in streaming blocks with full state carry.

The reference (yagi) publishes no throughput numbers (BASELINE.md), so
vs_baseline is the ratio against the previous recorded round (1.0 for the
first measurement).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from yagi_tpu.chains import RxChain

    channels = 16
    block = 1 << 17  # 131072 samples per channel per block
    n_blocks = 4
    n_reps = 5  # median-of-reps to ride out tunnel/host jitter
    warmup_blocks = 2

    chain = RxChain.create(
        n_taps=64, fc=0.2, as_=60.0, rate=2.0, mix_freq=0.35, batch_shape=(channels,)
    )

    rng = np.random.default_rng(0)
    x_host = (
        rng.standard_normal((channels, block)) + 1j * rng.standard_normal((channels, block))
    ).astype(np.complex64)
    x = jnp.asarray(x_host)

    step = jax.jit(lambda c, x: c.step(x))

    # warmup / compile
    c = chain
    for _ in range(warmup_blocks):
        y, k, c = step(c, x)
    jax.block_until_ready(y)

    rates = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            y, k, c = step(c, x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        rates.append(channels * block * n_blocks / dt / 1e6)
    msps = float(np.median(rates))
    print(
        f"[reps] chain Msps min/median/max: "
        f"{min(rates):.0f}/{msps:.0f}/{max(rates):.0f}",
        file=sys.stderr,
    )

    # secondary metric (stderr, not the driver's JSON line): the config[4]
    # 64-channel channelizer + per-channel FM discriminator, single chip
    try:
        from yagi_tpu.multichannel import Firpfbch

        M = 64
        chz = Firpfbch.create_kaiser(M, 4, 60.0)
        T = 1 << 15
        xc = jnp.asarray(
            (rng.standard_normal(T * M) + 1j * rng.standard_normal(T * M)).astype(
                np.complex64
            )
        )
        kf = 0.1

        def chan_fm(chz, xc):
            y, _ = chz.analyzer_execute(xc)
            return jnp.angle(jnp.conj(y[..., :-1]) * y[..., 1:]) * (
                1.0 / (2.0 * np.pi * kf)
            )

        fm_fn = jax.jit(chan_fm)
        r = fm_fn(chz, xc)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(8):
            r = fm_fn(chz, xc)
        jax.block_until_ready(r)
        dt_c = (time.perf_counter() - t0) / 8
        print(
            f"[secondary] 64-ch channelizer+FM: {T * M / dt_c / 1e6:.0f} Msps/chip",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover — secondary metric is best-effort
        print(f"[secondary] channelizer bench skipped: {e}", file=sys.stderr)

    prev = None
    try:
        with open("BENCH_PREV.json") as f:
            prev = json.load(f).get("value")
    except Exception:
        pass
    vs_baseline = (msps / prev) if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "complex Msamples/s/chip, firfilt64+resamp2x+ncomix chain",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
