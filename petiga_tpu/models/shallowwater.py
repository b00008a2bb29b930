"""Shallow-water equations — parity with demo/ShallowWater.c: dof=3
system (h, u, v) in non-conservative form,

  h_t + ∇·(h u) = 0
  u_t + u·∇u + g ∇h = 0

integrated with generalized-α on a periodic C¹ space."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.ts import AlphaStepper, integrate

__all__ = ["ifunction", "make_space", "run"]


def ifunction(pt, shift, Ve, t, Ue, ctx):
    g = ctx.get("gravity", 1.0)
    vals = pt.value(Ue)  # (3,) = (h, u, v)
    dvals = pt.value(Ve)
    grads = pt.grad(Ue)  # (3, 2)
    h, u, v = vals
    h_t, u_t, v_t = dvals
    gh, gu, gv = grads
    uvec = jnp.stack([u, v])
    div_hu = gh @ uvec + h * (gu[0] + gv[1])
    N0 = pt.shape0
    Rh = N0 * (h_t + div_hu)
    Ru = N0 * (u_t + uvec @ gu + g * gh[0])
    Rv = N0 * (v_t + uvec @ gv + g * gh[1])
    return jnp.stack([Rh, Ru, Rv], axis=-1)


def make_space(nel=16, dtype=jnp.float64) -> Space:
    axes = [Axis.uniform(p=2, nel=nel, periodic=True) for _ in range(2)]
    return Space(axes, dof=3, dtype=dtype)


def run(space, *, dt=0.01, nsteps=5, amp=0.05, newton_kw=None):
    """Gaussian hump release on a periodic basin."""
    G = space.greville_coordinates()
    r2 = np.sum((G - 0.5) ** 2, axis=1)
    h0 = 1.0 + amp * np.exp(-100 * r2)
    U0 = np.zeros((space.nnodes, 3))
    U0[:, 0] = h0
    U0 = jnp.asarray(U0, space.dtype)
    st = AlphaStepper(
        space, ifunction, ctx={"gravity": 1.0},
        newton_kw=newton_kw or dict(rtol=1e-8, linear_solver="bicgstab"),
    )
    U, V = integrate(st, U0, 0.0, dt, nsteps)
    return U0, U
