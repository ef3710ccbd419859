"""Single second-order section (biquad).

Behavioral spec: /root/reference/src/filter/iir/iirfiltsos.rs. Direct form II
(execute_df2, iirfiltsos.rs:103) and direct form I (execute_df1, :79). Block
processing uses lax.scan over time (the recurrence is inherently sequential;
parallelism lives in the batch/channel dims, which scan bodies vectorize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .. import design as _design

__all__ = ["IirFilterSos"]


@struct.pytree
class IirFilterSos:
    """Biquad state (iirfiltsos.rs:7-15); df2 carries (v1, v2)."""

    b: jnp.ndarray = struct.field()  # [3] normalized feed-forward
    a: jnp.ndarray = struct.field()  # [3] normalized feed-back (a[0] = 1)
    v: jnp.ndarray = struct.field()  # [..., 2] direct-form-II state (v1, v2)
    # log-depth block path (associative scan, filter/_linrec.py); fp32-
    # tolerance-equal to the sequential scan, much faster for long blocks
    parallel: bool = struct.static_field(default=False)

    @classmethod
    def create(cls, b, a, batch_shape: tuple = (), dtype=jnp.float32) -> "IirFilterSos":
        b = np.asarray(b, dtype=np.float64)
        a = np.asarray(a, dtype=np.float64)
        if b.shape != (3,) or a.shape != (3,):
            raise ConfigError("biquad needs exactly 3 feed-forward and 3 feed-back coefficients")
        if a[0] == 0:
            raise ConfigError("a[0] cannot be zero")
        coeff_dtype = jnp.complex64 if (np.iscomplexobj(b) or np.iscomplexobj(a)) else jnp.float32
        return cls(
            b=jnp.asarray(b / a[0], dtype=coeff_dtype),
            a=jnp.asarray(a / a[0], dtype=coeff_dtype),
            v=jnp.zeros(batch_shape + (2,), dtype=jnp.dtype(dtype)),
        )

    def reset(self) -> "IirFilterSos":
        return self.replace(v=jnp.zeros_like(self.v))

    def execute(self, x):
        """One sample, direct form II (iirfiltsos.rs:103)."""
        v1 = self.v[..., 0]
        v2 = self.v[..., 1]
        v0 = x - self.a[1] * v1 - self.a[2] * v2
        y = self.b[0] * v0 + self.b[1] * v1 + self.b[2] * v2
        return y, self.replace(v=jnp.stack([v0, v1], axis=-1))

    def parallelize(self) -> "IirFilterSos":
        """Switch block processing to the log-depth associative-scan path."""
        return self.replace(parallel=True)

    def execute_block(self, x):
        """Block via scan over the time axis (last axis)."""
        x = jnp.asarray(x)
        if self.parallel:
            from ._linrec import allpole_parallel

            v0, v_fin = allpole_parallel(self.a[1:], self.v, x)
            ext = jnp.concatenate([self.v[..., ::-1].astype(v0.dtype), v0], axis=-1)
            T = x.shape[-1]
            y = (
                self.b[0] * ext[..., 2 : 2 + T]
                + self.b[1] * ext[..., 1 : 1 + T]
                + self.b[2] * ext[..., 0:T]
            )
            if not jnp.iscomplexobj(self.v) and jnp.iscomplexobj(v_fin):
                v_fin = v_fin.real
            return y, self.replace(v=v_fin.astype(self.v.dtype))

        # loop-invariant coefficient slices materialized outside the scan
        # (in-body a[i]/b[i] gets sunk into every iteration; see
        # utils.loop_constants)
        from ..utils.planar import loop_constants, planar_scan

        a1, a2, b0, b1, b2 = loop_constants(
            self.a[1], self.a[2], self.b[0], self.b[1], self.b[2],
            like=self.v[..., 0],
        )

        def step(v, xt):
            v1, v2 = v[..., 0], v[..., 1]
            v0 = xt - a1 * v1 - a2 * v2
            y = b0 * v0 + b1 * v1 + b2 * v2
            return jnp.stack([v0, v1], axis=-1), y

        xt = jnp.moveaxis(x, -1, 0)  # scan over time
        v_final, yt = planar_scan(step, self.v, xt, unroll=8)
        y = jnp.moveaxis(yt, 0, -1)
        return y, self.replace(v=v_final)

    __call__ = execute_block

    def groupdelay(self, fc: float) -> float:
        """Group delay (iirfiltsos.rs:120ff)."""
        return _design.iir_group_delay(np.asarray(self.b).real, np.asarray(self.a).real, fc) + 2.0
