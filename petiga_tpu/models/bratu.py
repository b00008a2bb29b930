"""Bratu equation -Δu = λ exp(u) — parity with demo/Bratu.c +
demo/BratuFJ.F90 of the reference (steady SNES and transient TS-θ
variants, Galerkin and collocation residuals).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.newton import newton

__all__ = ["bratu_residual", "bratu_jacobian", "bratu_collocation_residual",
           "make_space", "solve_bratu", "bratu_ifunction"]


def bratu_residual(pt, Ue, ctx):
    """Galerkin residual: F_a = ∇N_a·∇u - λ N_a exp(u)
    (BratuFJ.F90:48-57)."""
    lam = ctx["lambda"]
    u = pt.value(Ue)[0]
    gu = pt.grad(Ue)[0]
    return pt.shape1 @ gu - lam * jnp.exp(u) * pt.shape0


def bratu_jacobian(pt, Ue, ctx):
    """Hand-written Jacobian (BratuFJ.F90:88-100) — used to cross-check
    the AD Jacobian, like the reference's AutoDiff equivalence suite."""
    lam = ctx["lambda"]
    u = pt.value(Ue)[0]
    J = pt.shape1 @ pt.shape1.T
    return J - lam * jnp.exp(u) * jnp.outer(pt.shape0, pt.shape0)


def bratu_collocation_residual(pt, Ue, ctx):
    """Collocation residual: -Δu - λ exp(u) (BratuFJ.F90:48-50)."""
    lam = ctx["lambda"]
    u = pt.value(Ue)[0]
    return -pt.del2(Ue)[0] - lam * jnp.exp(u)


def bratu_ifunction(pt, a, Ve, t, Ue, ctx):
    """Transient residual: N_a u_t + ∇N_a·∇u - λ N_a exp(u)."""
    lam = ctx["lambda"]
    u = pt.value(Ue)[0]
    ut = pt.value(Ve)[0]
    gu = pt.grad(Ue)[0]
    return ut * pt.shape0 + pt.shape1 @ gu - lam * jnp.exp(u) * pt.shape0


def make_space(dim=2, p=2, nel=8, dtype=jnp.float32, **kw) -> Space:
    axes = [Axis.uniform(p=p, nel=nel) for _ in range(dim)]
    sp = Space(axes, dof=1, dtype=dtype, **kw)
    for d in range(dim):
        for s in range(2):
            sp.set_boundary_value(d, s, 0, 0.0)
    return sp


def solve_bratu(space, lam=6.80, *, use_ad: bool = True, rtol=1e-8, chunk=None):
    """Newton-Krylov solve of the steady Bratu problem (Bratu.c:78-92)."""
    U0 = jnp.zeros((space.nnodes, space.dof), space.dtype)
    return newton(
        space,
        bratu_residual,
        U0,
        {"lambda": lam},
        jacobian=None if use_ad else bratu_jacobian,
        rtol=rtol,
        chunk=chunk,
    )
