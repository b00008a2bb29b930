"""Boundary-form models — parity with demo/NitscheMethod.c (weak
Dirichlet by Nitsche's method), demo/BoundaryIntegral.c and
demo/Neumann.c (natural-BC surface integrals via IGASetBoundaryForm).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..assembly.assemble import assemble_system
from ..solve.krylov import cg, bicgstab, jacobi_preconditioner

__all__ = [
    "nitsche_poisson",
    "boundary_integral_poisson",
    "make_open_space",
]


def make_open_space(dim=2, p=2, nel=8, dtype=jnp.float64) -> Space:
    """Space with no strong BCs; all faces flagged for boundary forms."""
    sp = Space([Axis.uniform(p=p, nel=nel) for _ in range(dim)], dtype=dtype)
    for d in range(dim):
        for s in range(2):
            sp.set_boundary_form(d, s)
    return sp


def nitsche_poisson(space, exact, forcing, *, C=None, rtol=1e-12):
    """-Δu = f with Dirichlet u = g imposed weakly
    (NitscheMethod.c:69-112):

      interior: K_ab = ∇N_a·∇N_b,             F_a = N_a f
      boundary: K_ab += -N_a ∂n N_b - N_b ∂n N_a + α N_a N_b
                F_a  += -∂n N_a g + α N_a g,   α = C(p+1)/h_n
    """
    p = max(space.degrees)
    Cpen = 5.0 * (p + 1) if C is None else C
    h = 1.0 / max(space.elem_shape)

    def interior(pt, ctx):
        f = forcing(pt.x)
        return pt.shape1 @ pt.shape1.T, f * pt.shape0

    def bnd(pt, ctx):
        g = exact(pt.x)[0]
        n = pt.normal
        dn = pt.shape1 @ n  # ∂n N_a
        alpha = Cpen / h
        K = (
            -jnp.outer(pt.shape0, dn)
            - jnp.outer(dn, pt.shape0)
            + alpha * jnp.outer(pt.shape0, pt.shape0)
        )
        F = -dn * g + alpha * pt.shape0 * g
        return K, F

    A, b = assemble_system(space, interior, boundary=bnd, apply_fix=False)
    res = cg(A.fast_operator(), b, M=jacobi_preconditioner(A), rtol=rtol)
    return res.x, {"iters": int(res.iters), "residual": float(res.residual)}


def boundary_integral_poisson(space, forcing, flux, fixed_faces, *,
                              rtol=1e-12):
    """-Δu = f with natural BC ∂n u = t(x) imposed by surface integral
    (BoundaryIntegral.c): boundary form F_a += N_a t(x); ``fixed_faces``
    is a list of (axis, side, value) strong conditions to pin the
    solution."""
    for d, s, v in fixed_faces:
        space.set_boundary_value(d, s, 0, v)

    def interior(pt, ctx):
        return pt.shape1 @ pt.shape1.T, forcing(pt.x) * pt.shape0

    def bnd(pt, ctx):
        t = flux(pt.x, pt.normal)
        K = jnp.zeros((pt.nen, pt.nen), pt.shape0.dtype)
        return K, t * pt.shape0

    A, b = assemble_system(space, interior, boundary=bnd)
    res = cg(A.fast_operator(), b, M=jacobi_preconditioner(A), rtol=rtol)
    return res.x, {"iters": int(res.iters), "residual": float(res.residual)}
