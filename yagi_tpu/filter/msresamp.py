"""Multi-stage arbitrary resampler.

Behavioral spec: /root/reference/src/filter/resampler/msresamp.rs. The rate
is decomposed into halfband stages (bringing it into [0.5, 2]) plus one
arbitrary-rate stage (msresamp.rs:28-80). Interpolation runs arbitrary →
halfbands; decimation runs halfbands → arbitrary (msresamp.rs:129-164).

Because the arbitrary stage emits a data-dependent sample count, the
composite ``execute`` is host-orchestrated: each stage's kernel is jittable,
and the variable-length hand-off between stages is compacted on the host
using the exact count. (For end-to-end jit pipelines use Rresamp, whose
schedule is static.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError
from .resamp import Resamp
from .msresamp2 import MsResamp2

__all__ = ["MsResamp"]


@struct.pytree
class MsResamp:
    """Composite resampler state (msresamp.rs:10-20)."""

    rate: float = struct.static_field()
    interp: bool = struct.static_field()
    rate_arbitrary: float = struct.static_field()
    num_halfband_stages: int = struct.static_field()
    halfband: MsResamp2 = struct.field()
    arbitrary: Resamp = struct.field()
    # decim path: carried samples waiting to fill a 2^k group
    carry: jnp.ndarray = struct.field()  # [..., 2^k]
    carry_len: jnp.ndarray = struct.field()  # int32

    @classmethod
    def create(cls, rate: float, as_: float = 60.0, batch_shape: tuple = (), dtype=jnp.complex64) -> "MsResamp":
        """Rate decomposition per msresamp.rs:28-80."""
        if rate <= 0.0:
            raise ConfigError("resampling rate must be greater than zero")
        interp = rate > 1.0
        rate_arbitrary = rate
        num_hb = 0
        if interp:
            while rate_arbitrary > 2.0:
                num_hb += 1
                rate_arbitrary *= 0.5
        else:
            while rate_arbitrary < 0.5:
                num_hb += 1
                rate_arbitrary *= 2.0
        halfband = MsResamp2.create(
            interp, num_hb, 0.4, 0.0, as_, batch_shape=batch_shape, dtype=dtype
        )
        arbitrary = Resamp.create(
            rate_arbitrary,
            m=7,
            fc=min(0.515 * rate_arbitrary, 0.49),
            as_=as_,
            npfb=256,
            batch_shape=batch_shape,
            dtype=dtype,
        )
        return cls(
            rate=float(rate),
            interp=interp,
            rate_arbitrary=float(rate_arbitrary),
            num_halfband_stages=num_hb,
            halfband=halfband,
            arbitrary=arbitrary,
            carry=jnp.zeros(batch_shape + (1 << num_hb,), dtype=jnp.dtype(dtype)),
            carry_len=jnp.asarray(0, dtype=jnp.int32),
        )

    def reset(self) -> "MsResamp":
        return self.replace(
            halfband=self.halfband.reset(),
            arbitrary=self.arbitrary.reset(),
            carry=jnp.zeros_like(self.carry),
            carry_len=jnp.zeros_like(self.carry_len),
        )

    def get_rate(self) -> float:
        return self.rate

    def get_delay(self) -> float:
        """Composite delay (msresamp.rs:91-105)."""
        dh = self.halfband.get_delay()
        da = float(self.arbitrary.get_delay())
        if self.num_halfband_stages == 0:
            return da
        if self.interp:
            return dh / self.rate_arbitrary + da
        m = 1 << self.num_halfband_stages
        return dh + m * da

    def get_num_output(self, num_input: int) -> int:
        """Exact output count (msresamp.rs:113-124); host-side."""
        if self.interp:
            n = self.arbitrary.get_num_output(num_input)
            return n * (1 << self.num_halfband_stages)
        n = (int(np.asarray(self.carry_len)) + num_input) >> self.num_halfband_stages
        return self.arbitrary.get_num_output(n)

    def execute(self, x) -> tuple[np.ndarray, "MsResamp"]:
        """Resample a block; host-orchestrated composite (msresamp.rs:126-164).

        Returns a COMPACT array of exactly get_num_output(len(x)) samples.
        Requires concrete (non-traced) state.
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        if self.interp:
            # arbitrary stage first (low rate), then halfband interp
            y1, k, arb = self.arbitrary.execute_block(x)
            k = int(np.asarray(k))
            y1c = y1[..., :k]
            y2, hb = self.halfband.execute_block(y1c)
            return np.asarray(y2), self.replace(arbitrary=arb, halfband=hb)

        # decimation: gather into groups of 2^k, halfband decim, arbitrary
        m = 1 << self.num_halfband_stages
        cl = int(np.asarray(self.carry_len))
        xa = jnp.concatenate([self.carry[..., :cl], x], axis=-1)
        total = xa.shape[-1]
        n_groups = total // m
        rem = total - n_groups * m
        if n_groups > 0:
            y1, hb = self.halfband.execute_block(xa[..., : n_groups * m])
            y2, k, arb = self.arbitrary.execute_block(y1)
            k = int(np.asarray(k))
            out = np.asarray(y2[..., :k])
        else:
            hb, arb = self.halfband, self.arbitrary
            out = np.zeros(x.shape[:-1] + (0,), dtype=np.asarray(x).dtype)
        new_carry = jnp.zeros_like(self.carry)
        if rem > 0:
            new_carry = new_carry.at[..., :rem].set(xa[..., n_groups * m :])
        return out, self.replace(
            halfband=hb,
            arbitrary=arb,
            carry=new_carry,
            carry_len=jnp.asarray(rem, dtype=jnp.int32),
        )

    __call__ = execute
