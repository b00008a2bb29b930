"""Two-phase two-component porous-media flow — parity with
demo/TwoPhaseTwoComponent.c (liquid pressure Pl + dissolved-gas density
ρ_lh, transient nonlinear IFunction with a boundary-integral injection
residual).  The constitutive model here is a simplified van
Genuchten/Henry closure (smooth saturation law) — the reference's
capability shape (dof=2, boundary residual forms, degenerate
diffusivities) with tamer numbers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.ts import ThetaStepper, integrate

__all__ = ["ifunction", "injection_boundary", "make_space", "run"]


def _eos(Pl, rholh, ctx):
    """Saturation + mobilities from a smooth capillary law."""
    H = ctx.get("H", 1.0)  # Henry constant (scaled)
    Pc = rholh / H - Pl  # capillary pressure proxy
    Sl = 1.0 / (1.0 + jnp.maximum(Pc, 0.0) ** 2)  # smooth vG-like law
    krl = Sl**2
    krg = (1 - Sl) ** 2
    return Sl, krl, krg


def ifunction(pt, shift, Ve, t, Ue, ctx):
    phi = ctx.get("porosity", 0.3)
    k = ctx.get("k", 1.0)
    D = ctx.get("D", 0.05)
    mul, mug = ctx.get("mul", 1.0), ctx.get("mug", 0.1)
    H = ctx.get("H", 1.0)

    vals = pt.value(Ue)
    dvals = pt.value(Ve)
    grads = pt.grad(Ue)
    Pl, rholh = vals
    Pl_t, rholh_t = dvals
    gPl, grholh = grads

    Sl, krl, krg = _eos(Pl, rholh, ctx)
    # gas pressure via Henry: Pg ~ rholh / H
    gPg = grholh / H
    N0, N1 = pt.shape0, pt.shape1

    # water component: φ ∂t(Sl) + ∇·(−k krl/μl ∇Pl)
    # (use chain rule on Sl via AD-friendly direct expression)
    eps = 1e-6
    Sl_p, _, _ = _eos(Pl + eps * Pl_t, rholh + eps * rholh_t, ctx)
    Sl_t = (Sl_p - Sl) / eps
    Rw = N0 * phi * Sl_t + (k * krl / mul) * (N1 @ gPl)
    # hydrogen component: φ ∂t(Sl ρ_lh) + diffusion + gas Darcy flux
    Rh = (
        N0 * phi * (Sl_t * rholh + Sl * rholh_t)
        + D * phi * Sl * (N1 @ grholh)
        + (k * krg / mug) * rholh * (N1 @ gPg)
    )
    return jnp.stack([Rw, Rh], axis=-1)


def injection_boundary(pt, Ue, aux_e, ctx):
    """Boundary injection flux (LeftInjectionResidual analog): constant
    hydrogen inflow on the flagged face."""
    q = ctx.get("inflow", 0.1)
    R = jnp.zeros((pt.nen, 2), pt.shape0.dtype)
    return R.at[:, 1].set(-q * pt.shape0)


def make_space(nel=16, dtype=jnp.float64) -> Space:
    sp = Space([Axis.uniform(p=1, nel=nel)], dof=2, dtype=dtype)
    # outflow (fixed state) at the right, injection at the left
    sp.set_boundary_value(0, 1, 0, 1.0)  # Pl
    sp.set_boundary_value(0, 1, 1, 0.0)  # rholh
    sp.set_boundary_form(0, 0)
    return sp


def run(space, *, dt=0.01, nsteps=5, ctx=None, newton_kw=None):
    c = {"inflow": 0.1, **(ctx or {})}
    U0 = np.zeros((space.nnodes, 2))
    U0[:, 0] = 1.0
    U0 = jnp.asarray(U0, space.dtype)
    st = ThetaStepper(
        space, ifunction, theta=1.0, ctx=c,
        newton_kw=dict(
            rtol=1e-8, linear_solver="bicgstab", maxit=30,
            # stage residuals carry aux closures, so the boundary form
            # takes the (pt, Xe, aux_e, ctx) signature
            boundary=injection_boundary,
            **(newton_kw or {}),
        ),
    )
    U = integrate(st, U0, 0.0, dt, nsteps)
    return U0, U
