"""L2 projection — parity with demo/L2Projection.c: mass-matrix
projection of an arbitrary function onto the spline space with
`-check_error` style validation."""

from __future__ import annotations

import jax.numpy as jnp

from ..assembly.assemble import assemble_system, compute_error_norm
from ..solve.krylov import cg, jacobi_preconditioner

__all__ = ["l2_project", "projection_error"]


def l2_project(space, f, *, rtol=1e-12, chunk=None):
    """Project f(x) -> (dof,) onto the space: solve M u = (f, N)."""

    def form(pt, ctx):
        dof = space.dof
        K = jnp.outer(pt.shape0, pt.shape0)
        Kd = jnp.zeros((pt.nen, dof, pt.nen, dof), space.dtype)
        for d in range(dof):
            Kd = Kd.at[:, d, :, d].set(K)
        fv = jnp.atleast_1d(f(pt.x))
        F = pt.shape0[:, None] * fv[None, :]
        return Kd, F

    A, b = assemble_system(space, form, apply_fix=False, chunk=chunk)
    res = cg(A.fast_operator(), b, M=jacobi_preconditioner(A), rtol=rtol)
    return res.x


def projection_error(space, U, f):
    return float(
        compute_error_norm(space, U, lambda x: jnp.atleast_1d(f(x)), k=0)
    )
