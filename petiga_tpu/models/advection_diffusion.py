"""Advection-diffusion, Galerkin and SUPG-stabilized — parity with
demo/AdvectionDiffusion.c (plain Galerkin with skew wind, boundary layer
via Dirichlet) plus the SUPG stabilization the reference exercises in
NavierStokesVMS-style demos.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..assembly.assemble import assemble_system
from ..solve.krylov import bicgstab, jacobi_preconditioner

__all__ = ["galerkin_system", "supg_system", "make_space", "solve"]


def galerkin_system(pt, ctx):
    """K_ab = κ ∇N_a·∇N_b + N_a w·∇N_b (AdvectionDiffusion.c:26-46)."""
    w = jnp.asarray(ctx["wind"])
    kappa = ctx.get("kappa", 1.0)
    N0, N1 = pt.shape0, pt.shape1
    K = kappa * (N1 @ N1.T) + jnp.outer(N0, N1 @ w)
    F = ctx.get("source", 0.0) * N0
    return K, F


def supg_system(pt, ctx):
    """Galerkin + SUPG: test functions augmented with τ w·∇N_a on the
    advective residual; τ = h/(2|w|) ξ(Pe_h) with the optimal coth rule."""
    w = jnp.asarray(ctx["wind"])
    kappa = ctx.get("kappa", 1.0)
    h = ctx["h"]
    N0, N1 = pt.shape0, pt.shape1
    wn = jnp.sqrt(jnp.sum(w * w)) + 1e-30
    peclet = wn * h / (2 * kappa)
    xi = 1.0 / jnp.tanh(peclet) - 1.0 / peclet
    tau = h / (2 * wn) * xi
    adv_test = N1 @ w  # w·∇N_a
    K = (
        kappa * (N1 @ N1.T)
        + jnp.outer(N0, adv_test)
        + tau * jnp.outer(adv_test, adv_test)
    )
    f = ctx.get("source", 0.0)
    F = f * (N0 + tau * adv_test)
    return K, F


def make_space(dim=2, p=1, nel=16, dtype=jnp.float64):
    axes = [Axis.uniform(p=p, nel=nel) for _ in range(dim)]
    sp = Space(axes, dof=1, dtype=dtype)
    return sp


def solve(space, wind, *, kappa=1.0, supg=False, source=0.0, rtol=1e-10):
    h = 1.0 / space.elem_shape[0]
    ctx = {"wind": np.asarray(wind, float), "kappa": kappa, "h": h,
           "source": source}
    form = supg_system if supg else galerkin_system
    A, b = assemble_system(space, form, ctx)
    res = bicgstab(A.fast_operator(), b, M=jacobi_preconditioner(A),
                   rtol=rtol, maxiter=5000)
    return res.x, {"iters": int(res.iters), "residual": float(res.residual)}
