"""Richards equation (variably saturated flow) — parity with
demo/Richards.c: nonlinear transient scalar

  C(ψ) ψ_t = ∇·(K(ψ) ∇(ψ + z))

with the Gardner exponential constitutive model
K(ψ) = Ks e^{α min(ψ,0)}, θ(ψ) = θr + (θs-θr) e^{α min(ψ,0)}."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.ts import ThetaStepper, integrate

__all__ = ["ifunction", "make_space", "run"]


def _model(psi, ctx):
    Ks = ctx.get("Ks", 1.0)
    alpha = ctx.get("alpha", 2.0)
    ths, thr = ctx.get("theta_s", 0.4), ctx.get("theta_r", 0.05)
    pneg = jnp.minimum(psi, 0.0)
    K = Ks * jnp.exp(alpha * pneg)
    C = (ths - thr) * alpha * jnp.exp(alpha * pneg)  # dθ/dψ
    return K, C


def ifunction(pt, shift, Ve, t, Ue, ctx):
    psi = pt.value(Ue)[0]
    psi_t = pt.value(Ve)[0]
    gpsi = pt.grad(Ue)[0]
    K, C = _model(psi, ctx)
    # gravity along the last axis: ∇(ψ+z) adds e_z
    ez = jnp.zeros_like(gpsi).at[-1].set(1.0)
    flux = K * (gpsi + ez)
    return pt.shape0 * C * psi_t + pt.shape1 @ flux


def make_space(nel=16, dim=1, dtype=jnp.float64) -> Space:
    axes = [Axis.uniform(p=2, nel=nel) for _ in range(dim)]
    sp = Space(axes, dof=1, dtype=dtype)
    # ponded infiltration at the top (psi = 0), free drainage bottom
    sp.set_boundary_value(dim - 1, 1, 0, 0.0)
    return sp


def run(space, *, dt=1e-3, nsteps=5, psi0=-2.0, newton_kw=None):
    U0 = jnp.full((space.nnodes, 1), psi0, space.dtype)
    st = ThetaStepper(
        space, ifunction, theta=1.0,  # backward Euler for robustness
        ctx={},
        newton_kw=newton_kw or dict(rtol=1e-8, linear_solver="bicgstab",
                                    maxit=30),
    )
    U = integrate(st, U0, 0.0, dt, nsteps)
    return U0, U
