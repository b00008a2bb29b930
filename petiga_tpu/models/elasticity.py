"""Linear elasticity (dof = dim vector problem) — parity with
demo/Elasticity.c / Elasticity3D.c: isotropic Lamé material, blocked
(dof×dof) operator exercising the block-stencil kernels, rigid-body
nullspace (IGACreateRigidBody, petigansp.c:119-131).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..assembly.assemble import assemble_system
from ..solve.krylov import cg, block_jacobi_preconditioner

__all__ = ["elasticity_system", "make_space", "solve", "rigid_body_modes",
           "body_force_system"]


def elasticity_system(pt, ctx):
    """K[a,i][b,j] = λ ∂_i N_a ∂_j N_b + μ ∂_j N_a ∂_i N_b
    + μ δ_ij ∇N_a·∇N_b (Elasticity3D.c:13-47)."""
    lam, mu = ctx["lambda"], ctx["mu"]
    N1 = pt.shape1  # (nen, dim)
    dim = N1.shape[1]
    gg = N1 @ N1.T  # (nen, nen)
    K = (
        lam * jnp.einsum("ai,bj->aibj", N1, N1)
        + mu * jnp.einsum("aj,bi->aibj", N1, N1)
        + mu * jnp.einsum("ab,ij->aibj", gg, jnp.eye(dim, dtype=N1.dtype))
    )
    F = jnp.zeros((pt.nen, dim), N1.dtype)
    if "body_force" in ctx:
        f = ctx["body_force"](pt.x)
        F = pt.shape0[:, None] * f[None, :]
    return K, F


def body_force_system(exact):
    """Manufactured-solution wrapper: given u_exact(x) (callable
    returning (dim,)), produce a system form with the matching body
    force computed by AD — the framework's answer to hand-derived MMS."""
    import jax

    def form(pt, ctx):
        lam, mu = ctx["lambda"], ctx["mu"]

        def op(x):
            # -div sigma(u) with sigma = lam tr(eps) I + 2 mu eps
            J = jax.jacfwd(exact)(x)  # (dim, dim) du_i/dx_j

            def divsig(x):
                Jx = jax.jacfwd(exact)(x)
                eps = 0.5 * (Jx + Jx.T)
                return lam * jnp.trace(eps) * jnp.eye(len(x)) + 2 * mu * eps

            dsig = jax.jacfwd(divsig)(x)  # (i,j,k) dsigma_ij/dx_k
            return -jnp.einsum("ijj->i", dsig)

        f = op(pt.x)
        K, _ = elasticity_system(pt, ctx)
        F = pt.shape0[:, None] * f[None, :]
        return K, F

    return form


def make_space(dim=3, p=2, nel=8, dtype=jnp.float32, clamp_axis=0) -> Space:
    axes = [Axis.uniform(p=p, nel=nel) for _ in range(dim)]
    sp = Space(axes, dof=dim, dtype=dtype)
    for s in range(2):
        for c in range(dim):
            sp.set_boundary_value(clamp_axis, s, c, 0.0)
    return sp


def solve(space, lam=1.0, mu=1.0, *, ctx_extra=None, rtol=1e-8, chunk=None):
    ctx = {"lambda": lam, "mu": mu, **(ctx_extra or {})}
    A, b = assemble_system(space, elasticity_system, ctx, chunk=chunk)
    M = block_jacobi_preconditioner(A)
    res = cg(A.fast_operator(), b, M=M, rtol=rtol)
    return res.x, {"iters": int(res.iters), "residual": float(res.residual),
                   "A": A, "b": b}


def rigid_body_modes(space) -> np.ndarray:
    """Rigid-body nullspace vectors from node coordinates
    (MatNullSpaceCreateRigidBody analog, petigansp.c:119-131):
    dim translations + dim(dim-1)/2 rotations; (nmodes, nnodes, dim)."""
    dim = space.dim
    X = (
        space.geometry
        if space.has_geometry
        else space.greville_coordinates()
    )
    n = space.nnodes
    modes = []
    for i in range(dim):
        t = np.zeros((n, dim))
        t[:, i] = 1.0
        modes.append(t)
    if dim >= 2:
        r = np.zeros((n, dim))
        r[:, 0] = -X[:, 1]
        r[:, 1] = X[:, 0]
        modes.append(r)
    if dim == 3:
        r = np.zeros((n, dim))
        r[:, 1] = -X[:, 2]
        r[:, 2] = X[:, 1]
        modes.append(r)
        r = np.zeros((n, dim))
        r[:, 0] = X[:, 2]
        r[:, 2] = -X[:, 0]
        modes.append(r)
    return np.stack(modes)
