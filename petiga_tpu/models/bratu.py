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


def bratu_jacobian_coefficients(x, ctx, fields):
    """The Bratu Newton-step Jacobian as a coefficient spec with a
    state-dependent reaction channel: J(w, v) = ∫ ∇w·∇v − λ eᵘ w v —
    the (0,0) channel is a pointwise function of the current iterate
    (``fields["u"]``), so the whole Jacobian assembles on the MXU conv
    engine (reference: the generic Jacobian loop petigasnes.c:82-139
    with the hand-written tangent BratuFJ.F90:88-100)."""
    lam = ctx["lambda"]
    dim = x.shape[-1]
    ch = {(d + 1, d + 1): 1.0 for d in range(dim)}
    ch[(0, 0)] = -lam * jnp.exp(fields["u"])
    return ch


def solve_bratu_conv(space, lam=6.80, *, rtol=1e-8, max_newton=20,
                     rtol_inner=1e-8, chunk=None, interpret=None):
    """Newton solve with the Jacobian assembled by the conv
    (coefficient-form) engine each iteration — the state enters the
    cached executable as a jit argument, so iterations after the first
    reuse one assembly program and one solve program.

    Returns ``(U, info)`` like :func:`solve_bratu` (iters, residual
    history)."""
    import jax

    from ..assembly.assemble import (
        assemble_function,
        dirichlet_post_fix_homogeneous,
    )
    from ..assembly.convform import assemble_coefficient_planes
    from ..solve.krylov import cg

    mask, vals = space.device("dirichlet")
    U = jnp.where(mask > 0, vals, 0.0).astype(space.dtype)
    lam_d = jnp.asarray(lam, space.dtype)
    hist = []
    it = 0
    for it in range(max_newton):
        R = assemble_function(
            space, bratu_residual, U, {"lambda": lam_d}, chunk=chunk
        )
        rnorm = float(jnp.linalg.norm(R))
        hist.append(rnorm)
        if it == 0:
            r0 = max(rnorm, 1e-30)
        if rnorm <= rtol * r0:
            break
        J, rhs = assemble_coefficient_planes(
            space, bratu_jacobian_coefficients, {"lambda": lam_d},
            fields={"u": U.reshape(-1)}, apply_fix=False,
            interpret=interpret,
        )
        J, rhs = dirichlet_post_fix_homogeneous(space, J, -R)

        key = ("bratu_conv_solve", J.kind, rtol_inner)
        solve = space._device_cache.get(key)
        if solve is None:
            @jax.jit
            def solve(DT, rr):
                dv = J.packed_diag_inv_of(DT)
                res = cg(
                    lambda v: J.matvec_xb(DT, v), J.pack_vec(rr),
                    M=lambda z: z * dv, rtol=rtol_inner, maxiter=2000,
                )
                return J.unpack_vec(res.x), res.iters

            space._device_cache[key] = solve
        dU, _ = solve(J.DT, rhs)
        U = U + dU
    return U, {"iters": it, "residuals": hist}
