"""Pallas fused NCO mixer kernel.

Computes y[t] = x[t]·e^{-j(θ0 + t·dθ)} with the oscillator's exact u32
wrapping phase semantics (osc.rs:86-88,191-200) inside the kernel: the phase
ramp is synthesized per tile from the scalar-prefetched (θ0, dθ) — no phase
array ever touches HBM, and the complex multiply is fused with the sin/cos
evaluation in VMEM.

Complex data is handled as separate re/im planes (Mosaic has no complex
dtype); the public wrapper packs/unpacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_mix_down"]

_LANE = 128
_TILE_ROWS = 256  # rows of 128 lanes per grid step


def _mix_kernel(scalars_ref, xr_ref, xi_ref, yr_ref, yi_ref):
    """One [TILE_ROWS, 128] tile: phase ramp + rotate.

    scalars_ref (SMEM): [theta0, dtheta] as uint32.
    """
    i = pl.program_id(0)
    theta0 = scalars_ref[0]
    dtheta = scalars_ref[1]

    rows = jax.lax.broadcasted_iota(jnp.uint32, (_TILE_ROWS, _LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (_TILE_ROWS, _LANE), 1)
    # global sample index of element (r, c) in tile i (row-major)
    idx = (jnp.uint32(i) * jnp.uint32(_TILE_ROWS) + rows) * jnp.uint32(_LANE) + cols
    theta = theta0 + idx * dtheta  # u32 wrapping — exact oscillator phase
    # Mosaic lacks uint32->float32; go through 16-bit halves (each < 2^16
    # fits int32 exactly, and int32->float32 is supported)
    hi = (theta >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (theta & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    t = (hi * jnp.float32(65536.0) + lo) * jnp.float32(2.0 * np.pi / 4294967296.0)
    c = jnp.cos(t)
    s = jnp.sin(t)
    xr = xr_ref[:]
    xi = xi_ref[:]
    # (xr + j xi)·(c - j s)
    yr_ref[:] = xr * c + xi * s
    yi_ref[:] = xi * c - xr * s


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mix_down(x, theta0, dtheta, interpret: bool = False):
    """Mix x [N] (complex64, N a multiple of 32768) down by the u32 NCO.

    Returns x·e^{-jθ[t]} exactly as Osc.mix_block_down with mode="exact".
    """
    n = x.shape[-1]
    tile = _TILE_ROWS * _LANE
    assert n % tile == 0, f"length must be a multiple of {tile}"
    grid = n // tile

    xr = x.real.reshape(grid * _TILE_ROWS, _LANE)
    xi = x.imag.reshape(grid * _TILE_ROWS, _LANE)
    scalars = jnp.asarray([theta0, dtheta], dtype=jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    yr, yi = pl.pallas_call(
        _mix_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(xi.shape, jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, xr, xi)
    return (yr + 1j * yi).reshape(n).astype(jnp.complex64)
