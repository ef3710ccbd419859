"""CVSD — continuously variable slope delta audio codec.

Fills the reference's 0-byte audio module (src/audio/mod.rs is empty; liquid
upstream has cvsd with autotests cvsd_rmse_sine / cvsd_invalid_config,
LIQUID_COMPAT.md:29-34). Semantics follow liquid's cvsd:

* 1-bit delta modulation: each bit says whether the tracked reference is
  below (1) or above (0) the input; the reference moves by an adaptive step.
* Syllabic companding: when the last ``num_bits`` output bits are identical
  (slope overload) the step grows by ``zeta``; otherwise it decays by
  ``1/zeta``, clamped to [delta_min, delta_max].
* ``alpha`` sets a symmetric one-pole pre-emphasis (encode) / de-emphasis
  (decode) pair so the delta loop tracks the differentiated signal.

Encoder and decoder run the *same* step-size automaton, so a decoder fed the
encoder's bits reproduces the encoder's internal reference exactly — the
classic CVSD self-synchronizing property. Both are lax.scan loops over the
block with full state carry (block-split invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError

__all__ = ["Cvsd"]

_DELTA_MIN = 0.01
_DELTA_MAX = 1.0


@struct.pytree
class Cvsd:
    """CVSD codec state (shared by encode and decode directions)."""

    num_bits: int = struct.static_field()
    zeta: float = struct.static_field()
    alpha: float = struct.static_field()
    ref: jnp.ndarray = struct.field()  # tracked reference v
    delta: jnp.ndarray = struct.field()  # adaptive step
    bitref: jnp.ndarray = struct.field()  # last num_bits bits (uint32)
    pre_state: jnp.ndarray = struct.field()  # pre-emphasis x[n-1]
    post_state: jnp.ndarray = struct.field()  # de-emphasis y[n-1]

    @classmethod
    def create(
        cls,
        num_bits: int = 4,
        zeta: float = 1.5,
        alpha: float = 0.9,
        batch_shape: tuple = (),
    ) -> "Cvsd":
        if num_bits == 0:
            raise ConfigError("number of bits must be positive")
        if zeta <= 1.0:
            raise ConfigError("zeta must be greater than 1")
        if not 0.0 <= alpha < 1.0:
            raise ConfigError("alpha must be in [0, 1)")
        z = jnp.zeros(batch_shape, dtype=jnp.float32)
        return cls(
            num_bits=num_bits,
            zeta=float(zeta),
            alpha=float(alpha),
            ref=z,
            delta=jnp.full(batch_shape, _DELTA_MIN, dtype=jnp.float32),
            bitref=jnp.zeros(batch_shape, dtype=jnp.uint32),
            pre_state=z,
            post_state=z,
        )

    def reset(self) -> "Cvsd":
        return self.replace(
            ref=jnp.zeros_like(self.ref),
            delta=jnp.full_like(self.delta, _DELTA_MIN),
            bitref=jnp.zeros_like(self.bitref),
            pre_state=jnp.zeros_like(self.pre_state),
            post_state=jnp.zeros_like(self.post_state),
        )

    def _advance(self, ref, delta, bitref, bit):
        """Shared companding automaton: one step of the delta loop."""
        mask = jnp.uint32((1 << self.num_bits) - 1)
        bitref = ((bitref << 1) | bit) & mask
        overload = (bitref == mask) | (bitref == 0)
        delta = jnp.clip(
            jnp.where(overload, delta * self.zeta, delta / self.zeta),
            _DELTA_MIN,
            _DELTA_MAX,
        )
        step = jnp.where(bit == 1, delta, -delta)
        ref = jnp.clip(ref + step, -1.5, 1.5)
        return ref, delta, bitref

    def encode(self, x) -> tuple[jnp.ndarray, "Cvsd"]:
        """Audio [..., N] in ~[-1, 1] → bits uint8 [..., N]."""
        x = jnp.asarray(x, dtype=jnp.float32)

        def body(carry, xi):
            ref, delta, bitref, pre = carry
            v = xi - self.alpha * pre  # pre-emphasis
            bit = (v > ref).astype(jnp.uint32)
            ref, delta, bitref = self._advance(ref, delta, bitref, bit)
            return (ref, delta, bitref, xi), bit

        from ..utils.planar import planar_scan

        carry0 = (self.ref, self.delta, self.bitref, self.pre_state)
        (ref, delta, bitref, pre), bt = planar_scan(
            body, carry0, jnp.moveaxis(x, -1, 0)
        )
        bits = jnp.moveaxis(bt, 0, -1).astype(jnp.uint8)
        return bits, self.replace(
            ref=ref, delta=delta, bitref=bitref, pre_state=pre
        )

    def decode(self, bits) -> tuple[jnp.ndarray, "Cvsd"]:
        """Bits uint8 [..., N] → audio [..., N]."""
        bits = jnp.asarray(bits)

        def body(carry, bi):
            ref, delta, bitref, post = carry
            bi = (bi != 0).astype(jnp.uint32)  # any nonzero byte counts as 1
            ref, delta, bitref = self._advance(ref, delta, bitref, bi)
            y = ref + self.alpha * post  # de-emphasis
            return (ref, delta, bitref, y), y

        from ..utils.planar import planar_scan

        carry0 = (self.ref, self.delta, self.bitref, self.post_state)
        (ref, delta, bitref, post), yt = planar_scan(
            body, carry0, jnp.moveaxis(bits.astype(jnp.uint32), -1, 0)
        )
        y = jnp.moveaxis(yt, 0, -1)
        return y, self.replace(
            ref=ref, delta=delta, bitref=bitref, post_state=post
        )
