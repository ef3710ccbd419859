"""RLS adaptive equalizer.

Behavioral spec: /root/reference/src/equalization/eqrls.rs. P-matrix
recursion per training step (eqrls.rs:112-146):

  ζ = x·P₀·xᴴ + λ;  g = P₀·xᴴ/ζ;  P₁ = P₀/λ − (g·x/λ)·P₀;  w₁ = w₀ + α·g

Note the reference's execute is an UNconjugated dotprod w·r (eqrls.rs:108),
unlike Eqlms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._src import struct
from ..errors import ConfigError

__all__ = ["Eqrls"]


@struct.pytree
class Eqrls:
    """RLS equalizer state (eqrls.rs:8-24)."""

    p: int = struct.static_field()
    lam: jnp.ndarray = struct.field()  # forgetting factor
    h0: jnp.ndarray = struct.field()
    w: jnp.ndarray = struct.field()  # [..., p]
    P: jnp.ndarray = struct.field()  # [..., p, p]
    buffer: jnp.ndarray = struct.field()  # [..., p] oldest..newest

    delta: float = struct.static_field()

    @classmethod
    def create(cls, h=None, p: int | None = None, batch_shape: tuple = (), dtype=jnp.complex64):
        if h is not None:
            h = np.asarray(h).astype(np.complex64)
            p = len(h)
            h0 = h
        else:
            if p is None or p == 0:
                raise ConfigError("equalizer length must be greater than 0")
            h0 = np.zeros(p, dtype=np.complex64)
            h0[p - 1] = 1.0
        delta = 0.1
        P0 = np.eye(p, dtype=np.complex64) / delta
        return cls(
            p=p,
            lam=jnp.asarray(0.99, dtype=jnp.float32),
            h0=jnp.asarray(h0),
            w=jnp.broadcast_to(jnp.asarray(h0), batch_shape + (p,)),
            P=jnp.broadcast_to(jnp.asarray(P0), batch_shape + (p, p)),
            buffer=jnp.zeros(batch_shape + (p,), dtype=jnp.dtype(dtype)),
            delta=delta,
        )

    def reset(self) -> "Eqrls":
        P0 = jnp.eye(self.p, dtype=self.P.dtype) / self.delta
        return self.replace(
            w=jnp.broadcast_to(self.h0, self.w.shape),
            P=jnp.broadcast_to(P0, self.P.shape),
            buffer=jnp.zeros_like(self.buffer),
        )

    def set_bw(self, lam) -> "Eqrls":
        if isinstance(lam, (int, float)) and not (0.0 <= lam <= 1.0):
            raise ConfigError("learning rate must be in (0,1)")
        return self.replace(lam=jnp.asarray(lam, dtype=jnp.float32))

    def get_bw(self):
        return self.lam

    def get_weights(self):
        """User-facing taps = conj-reversed weights (eqrls.rs:148-156)."""
        return jnp.conj(self.w[..., ::-1])

    def push(self, x) -> "Eqrls":
        x = jnp.asarray(x, dtype=self.buffer.dtype)
        return self.replace(
            buffer=jnp.concatenate([self.buffer[..., 1:], x[..., None]], axis=-1)
        )

    def execute(self):
        """y = w·r, unconjugated (eqrls.rs:105-110)."""
        return jnp.sum(self.w * self.buffer, axis=-1)

    def step(self, d, d_hat) -> "Eqrls":
        """One RLS update (eqrls.rs:112-146)."""
        alpha = jnp.asarray(d) - jnp.asarray(d_hat)
        x = self.buffer  # [..., p]
        P0 = self.P
        lam = self.lam

        xp0 = jnp.einsum("...r,...rc->...c", x, P0)  # x·P0
        zeta = jnp.sum(xp0 * jnp.conj(x), axis=-1) + lam
        g = jnp.einsum("...rc,...c->...r", P0, jnp.conj(x)) / zeta[..., None]
        gxl = g[..., :, None] * x[..., None, :] / lam
        gxlP0 = jnp.einsum("...rk,...kc->...rc", gxl, P0)
        P1 = P0 / lam - gxlP0
        w1 = self.w + alpha[..., None] * g
        return self.replace(w=w1, P=P1)

    def train_block(self, x, d) -> tuple[jnp.ndarray, "Eqrls"]:
        """Supervised training via scan (reference train pattern)."""
        x = jnp.asarray(x)
        d = jnp.asarray(d)
        xt = jnp.moveaxis(x, -1, 0)
        dt = jnp.moveaxis(d, -1, 0)

        def body(eq, inp):
            xi, di = inp
            eq = eq.push(xi)
            y = eq.execute()
            eq = eq.step(di, y)
            return eq, y

        from ..utils.planar import planar_scan

        eq, yt = planar_scan(body, self, (xt, dt), unroll=4)
        return jnp.moveaxis(yt, 0, -1), eq
