"""Incompressible Navier-Stokes with VMS/SUPG-PSPG stabilization —
parity with demo/NavierStokesVMS.c (residual-based variational
multiscale, equal-order velocity/pressure on one spline space,
dof = dim + 1) in its steady form; the transient wrapper plugs the same
residual into the generalized-α stepper.

Unknowns per node: (u_1..u_dim, p).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.newton import newton

__all__ = ["vms_residual", "make_cavity_space", "solve_cavity"]


def vms_residual(pt, Ue, ctx):
    """Residual of steady incompressible NS with RBVMS-style SUPG/PSPG
    stabilization (NavierStokesVMS.c Residual, steady part):

      momentum: (u·∇u, w) + ν(∇u, ∇w) - (p, ∇·w) + SUPG
      mass:     (∇·u, q) + PSPG
    """
    nu = ctx["nu"]
    h = ctx["h"]
    dim = pt.dim
    vals = pt.value(Ue)  # (dim+1,)
    grads = pt.grad(Ue)  # (dim+1, nsd)
    u = vals[:dim]
    gu = grads[:dim, :]  # (dim, dim)
    p = vals[dim]
    gp = grads[dim, :]
    N0, N1 = pt.shape0, pt.shape1

    conv = gu @ u  # u·∇u
    divu = jnp.trace(gu)
    # strong momentum residual (viscous term dropped: C¹ splines could
    # include Δu via shape2; the reference's tau absorbs it)
    rm = conv + gp
    # stabilization parameters (diagonal-metric tau, VMS)
    unorm2 = jnp.sum(u * u)
    tau_m = 1.0 / jnp.sqrt(
        4 * unorm2 / h**2 + 36 * (nu / h**2) ** 2 + 1e-12
    )
    tau_c = h**2 / (12 * tau_m + 1e-12)

    adv_test = N1 @ u  # u·∇N_a

    R = jnp.zeros((pt.nen, dim + 1), N0.dtype)
    # momentum rows
    for i in range(dim):
        Ri = (
            N0 * conv[i]
            + nu * (N1 @ gu[i])
            - N1[:, i] * p
            + tau_m * adv_test * rm[i]  # SUPG
            + tau_c * N1[:, i] * divu  # grad-div (coarse-scale LSIC)
        )
        R = R.at[:, i].set(Ri)
    # continuity row + PSPG
    Rp = N0 * divu + tau_m * (N1 @ rm)
    R = R.at[:, dim].set(Rp)
    return R


def make_cavity_space(nel=16, p=2, dtype=jnp.float64, lid=1.0) -> Space:
    """Lid-driven cavity: u = (lid, 0) on top, no-slip elsewhere;
    pressure pinned via one fixed dof (corner node)."""
    sp = Space([Axis.uniform(p=p, nel=nel)] * 2, dof=3, dtype=dtype)
    for d in range(2):
        for s in range(2):
            for c in range(2):
                sp.set_boundary_value(d, s, c, 0.0)
    sp.set_boundary_value(1, 1, 0, lid)  # lid x-velocity
    return sp


def solve_cavity(space, *, nu=0.1, rtol=1e-6, maxit=30, chunk=None):
    h = 1.0 / space.elem_shape[0]
    ctx = {"nu": nu, "h": h}
    U0 = jnp.zeros((space.nnodes, space.dof), space.dtype)
    res = newton(
        space, vms_residual, U0, ctx, rtol=rtol, maxit=maxit,
        linear_solver="bicgstab", linear_rtol=1e-8, chunk=chunk,
    )
    # pressure has a one-dimensional nullspace (no pinning in the weak
    # form): report the zero-mean representative
    U = res.U
    p = U[:, 2] - U[:, 2].mean()
    U = U.at[:, 2].set(p)
    return U, res
