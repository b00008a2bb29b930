"""Finite-strain hyperelasticity — parity with demo/HyperElasticity.c
(the reference's largest demo): Neo-Hookean / St-Venant-Kirchhoff /
Mooney-Rivlin material models behind a material function pointer,
total-Lagrangian residual, Newton with AD tangent (replacing the
hand-derived geometric + material tangent of the reference).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.newton import newton

__all__ = ["neo_hookean", "st_venant", "mooney_rivlin", "residual",
           "make_space", "solve"]


def neo_hookean(lam, mu) -> Callable:
    """First Piola-Kirchhoff stress P(F) for compressible Neo-Hooke
    (HyperElasticity.c NeoHookeanModel)."""

    def P(F):
        J = jnp.linalg.det(F)
        Finv = jnp.linalg.inv(F)
        return mu * (F - Finv.T) + lam * jnp.log(J) * Finv.T

    return P


def st_venant(lam, mu) -> Callable:
    """P = F S with S = λ tr(E) I + 2 μ E, E = (F^T F - I)/2
    (StVenantModel)."""

    def P(F):
        dim = F.shape[0]
        E = 0.5 * (F.T @ F - jnp.eye(dim, dtype=F.dtype))
        S = lam * jnp.trace(E) * jnp.eye(dim, dtype=F.dtype) + 2 * mu * E
        return F @ S

    return P


def mooney_rivlin(c1, c2, lam) -> Callable:
    """Compressible Mooney-Rivlin via an energy density and AD:
    W = c1 (I1 - 3) + c2 (I2 - 3) - (2c1 + 4c2) ln J + λ/2 (ln J)^2;
    P = dW/dF (MooneyRivlinModel, derived by AD instead of by hand)."""

    def W(F):
        C = F.T @ F
        I1 = jnp.trace(C)
        I2 = 0.5 * (I1**2 - jnp.trace(C @ C))
        J = jnp.linalg.det(F)
        lnJ = jnp.log(J)
        return (
            c1 * (I1 - 3) + c2 * (I2 - 3) - (2 * c1 + 4 * c2) * lnJ
            + 0.5 * lam * lnJ**2
        )

    return jax.grad(W)


def residual(pt, Ue, ctx):
    """Total-Lagrangian residual R[a,i] = P_ij(F) ∂N_a/∂X_j - N_a b_i
    with F = I + ∇u (HyperElasticity.c Residual)."""
    Pfun = ctx["material"]
    gu = pt.grad(Ue)  # (dim, dim): du_i/dX_j
    dim = gu.shape[0]
    F = jnp.eye(dim, dtype=gu.dtype) + gu
    P = Pfun(F)
    R = pt.shape1 @ P.T  # (nen, dim)
    if "body_force" in ctx:
        b = ctx["body_force"](pt.x)
        R = R - pt.shape0[:, None] * b[None, :]
    return R


def make_space(dim=3, p=2, nel=4, dtype=jnp.float32, stretch=0.1) -> Space:
    """Clamped-left, stretched-right block (the reference's canonical
    run): u = 0 at x=0, u_x = stretch at x=1."""
    axes = [Axis.uniform(p=p, nel=nel) for _ in range(dim)]
    sp = Space(axes, dof=dim, dtype=dtype)
    for c in range(dim):
        sp.set_boundary_value(0, 0, c, 0.0)
    sp.set_boundary_value(0, 1, 0, stretch)
    return sp


def solve(space, *, material=None, lam=1.0, mu=1.0, rtol=1e-8, maxit=20,
          chunk=None, continuation=1):
    """Newton solve; ``continuation`` ramps the boundary stretch in
    steps for robustness at large strain (load stepping)."""
    material = material or neo_hookean(lam, mu)
    ctx = {"material": material}
    U = jnp.zeros((space.nnodes, space.dof), space.dtype)
    res = None
    for step in range(continuation):
        res = newton(
            space, residual, U, ctx, rtol=rtol, maxit=maxit,
            linear_solver="cg", chunk=chunk,
        )
        U = res.U
    return U, res
