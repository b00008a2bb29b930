"""Poisson / reaction-diffusion model — parity with demo/Poisson{,1D,2D,3D}.c,
demo/Laplace.c and the test/ConvTest.c Galerkin form of the reference.

The manufactured solution (ConvTest.c:8-40) is
``u = prod_i sin(pi x_i)`` with forcing ``(c + k dim pi^2) u`` for the
operator ``c u - k Δu``; homogeneous Dirichlet on all faces.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..assembly.assemble import (
    assemble_system,
    compute_error_norm,
    stencil_of,
)
from ..core.axis import Axis
from ..core.space import Space
from ..solve.krylov import cg, jacobi_preconditioner

__all__ = [
    "poisson_system",
    "exact_solution",
    "exact_gradient",
    "make_space",
    "solve_poisson",
]


def exact_solution(x):
    """u(x) = prod_i sin(pi x_i)."""
    return jnp.prod(jnp.sin(jnp.pi * x), axis=-1, keepdims=True)


def exact_gradient(x):
    """(1, dim) gradient of the manufactured solution."""
    dim = x.shape[-1]
    s = jnp.sin(jnp.pi * x)
    c = jnp.cos(jnp.pi * x)
    cols = []
    for i in range(dim):
        g = jnp.pi * c[..., i]
        for j in range(dim):
            if j != i:
                g = g * s[..., j]
        cols.append(g)
    return jnp.stack(cols, axis=-1)[None, :]


def poisson_system(pt, ctx):
    """Galerkin reaction-diffusion system form (ConvTest.c:50-78):
    K_ab = c N_a N_b + k ∇N_a·∇N_b, F_a = f N_a."""
    c = ctx.get("c", 0.0)
    k = ctx.get("k", 1.0)
    dim = pt.dim
    f = (c + k * dim * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * pt.x))
    N0, N1 = pt.shape0, pt.shape1
    K = c * jnp.outer(N0, N0) + k * (N1 @ N1.T)
    F = f * N0
    return K, F


def poisson_system_q(pt, w, ctx):
    """q-batched variant: Point leaves carry a leading quadrature axis;
    the q-contraction is one MXU matmul (the fast assembly path)."""
    c = ctx.get("c", 0.0)
    k = ctx.get("k", 1.0)
    dim = pt.u.shape[-1]
    f = (c + k * dim * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * pt.x), axis=-1)
    N0, N1 = pt.shape0, pt.shape1  # (Q, nen), (Q, nen, dim)
    K = k * jnp.einsum("q,qai,qbi->ab", w, N1, N1)
    if c != 0.0:
        K = K + c * jnp.einsum("q,qa,qb->ab", w, N0, N0)
    F = jnp.einsum("q,qa->a", w * f, N0)
    return K, F


poisson_system_q.qbatched = True


def make_space(dim, p=2, nel=8, continuity=None, dtype=jnp.float32, **kw) -> Space:
    """``nel`` may be a scalar or a per-axis sequence."""
    nels = list(nel) if isinstance(nel, (tuple, list)) else [nel] * dim
    axes = [Axis.uniform(p=p, nel=n, continuity=continuity) for n in nels]
    sp = Space(axes, dof=1, dtype=dtype, **kw)
    for d in range(dim):
        for s in range(2):
            sp.set_boundary_value(d, s, 0, 0.0)
    return sp


def poisson_forcing(c=0.0, k=1.0):
    """Manufactured forcing for the coefficient-form engine."""

    def forcing(x, ctx):
        dim = x.shape[-1]
        return (c + k * dim * jnp.pi**2) * jnp.prod(
            jnp.sin(jnp.pi * x), axis=-1
        )

    return forcing


def solve_poisson(
    space: Space,
    *,
    c: float = 0.0,
    k: float = 1.0,
    rtol: float = 1e-10,
    chunk: Optional[int] = None,
    engine: str = "auto",
):
    """Assemble + CG(Jacobi) solve; returns (U, info dict).

    ``engine="auto"`` uses the convolution (coefficient-form) assembler
    on eligible spaces (open, regular, unit-step — the MXU fast path;
    assembly/convform.py) and the generic pointwise path otherwise;
    "conv"/"pointwise" force a choice."""
    from ..assembly import fastpath

    use_conv = engine == "conv" or (
        engine == "auto"
        and not any(space.periodic)
        and not space.collocation
        and fastpath.is_unit_step(space)
        and (not (space.has_geometry or space.is_rational)
             or space.nsd == space.dim)
    )
    if use_conv:
        from ..assembly.convform import (
            assemble_coefficient_planes,
            poisson_coefficients,
        )

        op, b = assemble_coefficient_planes(
            space, poisson_coefficients, {"c": c, "k": k},
            forcing=poisson_forcing(c, k),
        )
        dinv = _jacobi_inv(op)
        res = cg(op, b, M=lambda r: r * dinv, rtol=rtol)
        return res.x, {
            "iters": int(res.iters),
            "residual": float(res.residual),
            "A": op,
            "b": b,
            "engine": "conv",
        }
    A, b = assemble_system(space, poisson_system, {"c": c, "k": k}, chunk=chunk)
    M = jacobi_preconditioner(A)
    res = cg(A.fast_operator(), b, M=M, rtol=rtol)
    return res.x, {"iters": int(res.iters), "residual": float(res.residual), "A": A, "b": b, "engine": "pointwise"}


def _jacobi_inv(op):
    d = op.scalar_diagonal()
    return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)


def l2_error(space, U) -> float:
    return float(compute_error_norm(space, U, exact_solution, k=0))


def h1_error(space, U) -> float:
    return float(compute_error_norm(space, U, exact_gradient, k=1))
