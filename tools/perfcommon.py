"""Shared honest-measurement helpers for all TPU perf artifacts.

Every artifact (BENCH_r*.json, TPU_PARITY.json, STAGE_PROFILE.json,
KERNEL_VARIANTS.json, R_SWEEP.json) is stamped with the same session id and a
per-session CONTENTION CALIBRATION — a fixed fused-chain reference workload
measured at artifact-write time — so cross-artifact/cross-session numbers can
be normalized (VERDICT round 2 "what's weak" #5: raw Msps through the axon
tunnel swings ~2x with contention; only same-session A/Bs are comparable).

Methodology per kernels/ROOFLINE.md "Measurement on axon": long dependency
chain, small-f32 readback to force completion, finiteness assert, null
round-trip subtraction. Complex64 never crosses the host boundary.
"""

from __future__ import annotations

import json
import pathlib
import time
import uuid

import numpy as np

_SESSION_ID = None
_CALIB = None


def session_id() -> str:
    global _SESSION_ID
    if _SESSION_ID is None:
        _SESSION_ID = uuid.uuid4().hex[:12]
    return _SESSION_ID


def null_latency(jax, jnp, reps: int = 3) -> float:
    """Median null host↔device round-trip (subtract from timed loops)."""
    tiny = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    rb = jax.jit(lambda v: jnp.abs(v[:1, :1]))
    _ = np.asarray(rb(f(tiny)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(rb(f(tiny)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def calibrate(jax, jnp, reps: int = 3) -> dict:
    """Fixed fused-chain reference workload → session contention baseline.

    C=16, block 2^17, r=64, 64 chained steps. The absolute Msps of this
    exact workload is recorded in every artifact of the session; the ratio
    between two sessions' calib numbers is the contention normalizer.
    """
    global _CALIB
    if _CALIB is not None:
        return _CALIB
    from yagi_tpu.chains import FusedRxChain

    C, T, n_steps = 16, 1 << 17, 64
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    chain = jax.jit(lambda: FusedRxChain.create(batch_shape=(C,), r=64))()
    step = jax.jit(lambda c, a, b: c.step_planar(a, b))
    rb = jax.jit(lambda v: jnp.abs(v[:1, :1]))
    yr, yi, k, c = step(chain, xr, xi)
    v = np.asarray(rb(yr))
    assert np.isfinite(v).all()
    t_null = null_latency(jax, jnp)
    rates = []
    for _ in range(reps):
        c = chain
        t0 = time.perf_counter()
        for _ in range(n_steps):
            yr, yi, k, c = step(c, xr, xi)
        v = np.asarray(rb(yr))
        assert np.isfinite(v).all()
        rates.append(C * T * n_steps / (time.perf_counter() - t0 - t_null) / 1e6)
    _CALIB = {
        "calib_chain_msps": round(float(np.median(rates)), 1),
        "calib_spread": round((max(rates) - min(rates)) / np.median(rates), 3),
        "null_latency_ms": round(t_null * 1e3, 2),
    }
    return _CALIB


def chain_rate(jax, jnp, make_state, step_fn, samples_per_step, n_steps,
               reps, *step_args, lead_out=None):
    """Generic chained-state throughput; returns (median_msps, rates)."""
    from yagi_tpu.utils.planar import Planar, planar_jit

    if lead_out is None:
        def lead_out(o):
            v = o[0]
            return v.re if isinstance(v, Planar) else v
    state = planar_jit(make_state)()
    pstep = planar_jit(step_fn)
    rb = jax.jit(
        lambda v: jnp.abs(jnp.ravel(v)[:1].astype(jnp.float32)).reshape(1, 1)
    )
    out = pstep(state, *step_args)
    v = np.asarray(rb(lead_out(out)))
    assert np.isfinite(v).all()
    t_null = null_latency(jax, jnp)
    rates = []
    for _ in range(reps):
        c = state
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = pstep(c, *step_args)
            c = out[-1]
        v = np.asarray(rb(lead_out(out)))
        dt = time.perf_counter() - t0 - t_null
        assert np.isfinite(v).all()
        rates.append(samples_per_step * n_steps / dt / 1e6)
    return float(np.median(rates)), rates


# clean-session reference for the calibration workload (best observed
# uncontended median, BENCH_r03/r04 sessions). The validity rule below
# compares each session's calib against this.
CALIB_REF_MSPS = 8800.0


def calib_valid(meta: dict, max_spread: float = 0.3,
                max_dev: float = 0.4) -> tuple[bool, str]:
    """Artifact validity rule (VERDICT r3 weak #3/#4): a session whose
    calibration spread exceeds ``max_spread`` or whose calib throughput
    deviates more than ``max_dev`` from the clean-session reference is too
    contended for its ABSOLUTE numbers to be meaningful (same-session A/Bs
    remain valid)."""
    sp = meta.get("calib_spread")
    cm = meta.get("calib_chain_msps")
    if sp is None or cm is None:
        return False, "no calibration"
    if sp > max_spread:
        return False, f"calib_spread {sp:.2f} > {max_spread}"
    if abs(cm / CALIB_REF_MSPS - 1.0) > max_dev:
        return False, (f"calib {cm:.0f} deviates >{max_dev:.0%} from "
                       f"clean reference {CALIB_REF_MSPS:.0f}")
    return True, "ok"


def write_artifact(path: str, payload: dict, jax=None, jnp=None,
                   with_calib: bool = True, force: bool = False) -> bool:
    """Write a perf JSON stamped with session id (+ calibration if TPU).

    REFUSES to overwrite an existing artifact from a contended session
    (calib_valid fails) unless ``force=True``; a forced write stamps
    ``contention_warning`` so no number is silently trusted. Returns
    whether the artifact was written.
    """
    meta = {"session": session_id()}
    if with_calib and jax is not None:
        try:
            meta.update(calibrate(jax, jnp))
        except Exception as e:  # pragma: no cover
            meta["calib_error"] = str(e)[:200]
    ok, why = calib_valid(meta)
    if not ok:
        if not force and pathlib.Path(path).exists():
            print(f"REFUSING to overwrite {path}: contended session ({why}); "
                  f"pass force=True to override")
            return False
        meta["contention_warning"] = why
    payload = dict(payload)
    payload["_meta"] = meta
    pathlib.Path(path).write_text(json.dumps(payload, indent=1))
    print(f"wrote {path} (session {meta['session']}, calib: {why})")
    return True
