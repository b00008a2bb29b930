"""Incompressible Navier-Stokes with VMS/SUPG-PSPG stabilization —
parity with demo/NavierStokesVMS.c (residual-based variational
multiscale, equal-order velocity/pressure on one spline space,
dof = dim + 1): the steady RBVMS cavity AND the transient RBVMS
formulation (fine-scale closure + generalized-α, the reference's
turbulence configuration).

Unknowns per node: (u_1..u_dim, p).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..solve.newton import newton
from ..solve.ts import AlphaStepper

__all__ = [
    "vms_residual",
    "make_cavity_space",
    "solve_cavity",
    "vms_ifunction",
    "taylor_green_space",
    "taylor_green_exact",
    "solve_transient_vms",
    "kinetic_energy",
    "divergence_l2",
]


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


# --------------------------------------------------------- transient RBVMS


def vms_ifunction(pt, a, Ve, t, Ue, ctx):
    """Transient residual-based VMS residual
    (demo/NavierStokesVMS.c:80-165, Bazilevs et al. 2007):

      fine scales  u' = -tau_M (u_t + u.grad u + grad p - nu lap u - f),
                   p' = -tau_C div u                           (Eqn 58-62)
      tau_M = (4/dt^2 + u.G.u + C_I nu^2 G:G)^{-1/2},
      tau_C = (tau_M g.g)^{-1}                                 (Eqn 63-64)
      with the diagonal element metric G = diag(1/h_d^2), g_d = 1/h_d
      (InvGradGeomMap of an identity-geometry uniform mesh).

    Weak form rows: B_1 (time + pressure + symmetric viscous stress),
    Btilde_1 (fine-scale pressure), B_2 with advective velocity u + u'
    (cross terms), and the Reynolds-stress term in u'.
    ``ctx``: nu, dt, hvec (per-axis element widths), optional force.
    """
    dim = pt.dim
    nu = ctx["nu"]
    dt = ctx["dt"]
    f = jnp.asarray(ctx.get("force", (0.0,) * dim))
    hvec = jnp.asarray(ctx["hvec"])
    vals = pt.value(Ue)
    grads = pt.grad(Ue)
    H = pt.hess(Ue)
    ut = pt.value(Ve)[:dim]
    u = vals[:dim]
    p = vals[dim]
    gu = grads[:dim, :]     # gu[i, j] = d u_i / d x_j
    gp = grads[dim, :]
    lap = jnp.einsum("ijj->i", H[:dim])
    divu = jnp.trace(gu)

    Ginv = 1.0 / (hvec * hvec)          # diag of G = J J^T
    C_I = 1.0 / 12.0
    tauM = 1.0 / jnp.sqrt(
        4.0 / (dt * dt)
        + jnp.sum(u * u * Ginv)
        + C_I * nu * nu * jnp.sum(Ginv * Ginv)
    )
    tauC = 1.0 / (tauM * jnp.sum(Ginv))

    rm = ut + gu @ u + gp - nu * lap - f
    us = -tauM * rm                      # fine-scale velocity
    ps = -tauC * divu                    # fine-scale pressure
    ue = u + us                          # advective velocity

    N0, N1 = pt.shape0, pt.shape1
    adv_test = N1 @ ue                   # (u+u').grad N_a
    rows = []
    for i in range(dim):
        Ri = (
            N0 * (ut[i] - f[i])
            - N1[:, i] * p
            + nu * (N1 @ (gu[i, :] + gu[:, i]))   # symmetric stress
            - N1[:, i] * ps                        # Btilde_1
            + N0 * (ue @ gu[i, :])                 # B_2(W, U, U+U')
            - adv_test * us[i]                     # B_2(W, U', U+U')
        )
        rows.append(Ri)
    Rp = N0 * divu - N1 @ us                       # PSPG fine-scale
    return jnp.stack(rows + [Rp], axis=-1)


def taylor_green_space(nel=8, p=2, dtype=jnp.float64) -> Space:
    """Fully periodic [0,1]^2 space for the Taylor-Green vortex
    (dof = 3: u, v, p); C^{p-1} continuity supplies the Laplacian the
    fine-scale residual needs."""
    return Space(
        [Axis.uniform(p=p, nel=nel, periodic=True) for _ in range(2)],
        dof=3, dtype=dtype,
    )


def taylor_green_exact(x, t, nu):
    """u = (sin cos, -cos sin) e^{-8 pi^2 nu t} (2 pi-periodic on [0,1])."""
    decay = jnp.exp(-8 * jnp.pi**2 * nu * t)
    s, c = jnp.sin(2 * jnp.pi * x[..., 0]), jnp.cos(2 * jnp.pi * x[..., 0])
    sy, cy = jnp.sin(2 * jnp.pi * x[..., 1]), jnp.cos(2 * jnp.pi * x[..., 1])
    ux = s * cy * decay
    uy = -c * sy * decay
    pp = 0.25 * (jnp.cos(4 * jnp.pi * x[..., 0])
                 + jnp.cos(4 * jnp.pi * x[..., 1])) * decay**2
    return jnp.stack([ux, uy, pp], axis=-1)


def taylor_green_init(space, nu):
    """Greville interpolation of the t=0 field (good to O(h^2) — the
    energy-decay oracle uses ratios, insensitive to this error)."""
    G = space.greville_coordinates()
    return taylor_green_exact(jnp.asarray(G), 0.0, nu)


def kinetic_energy(space, U):
    """(1/2) int |u|^2 via the scalar functional driver."""
    from ..assembly.assemble import compute_scalar

    def e(pt, Ue, ctx):
        u = pt.value(Ue)[:2]
        return 0.5 * jnp.sum(u * u)

    return compute_scalar(space, e, U)[0]


def divergence_l2(space, U):
    from ..assembly.assemble import compute_scalar

    def d2(pt, Ue, ctx):
        gu = pt.grad(Ue)[:2, :]
        return jnp.trace(gu) ** 2

    return jnp.sqrt(compute_scalar(space, d2, U)[0])


def solve_transient_vms(space, U0, *, nu=0.01, dt=1e-2, nsteps=2,
                        rho_inf=0.5, newton_kw=None, V0=None):
    """March the RBVMS system with generalized-α (the reference runs
    TSALPHA, NavierStokesVMS.c:320-360).  Returns (U, V, t).

    The incompressible system is an index-2 DAE — the pressure has no
    time derivative, so the generic consistent-V0 solve is singular.
    Default V0 = 0 (the α-method's ρ∞ damping absorbs the startup
    transient, as PETSc's TSAlpha bootstrap does); pass an analytic V0
    when one is known."""
    hvec = tuple(1.0 / n for n in space.elem_shape)
    ctx = {"nu": nu, "dt": dt, "hvec": hvec}
    kw = {"rtol": 1e-8, "linear_solver": "bicgstab"}
    kw.update(newton_kw or {})
    stepper = AlphaStepper(space, vms_ifunction, rho_inf=rho_inf, ctx=ctx,
                           newton_kw=kw)
    U = jnp.asarray(U0).reshape(space.nnodes, space.dof)
    V = (jnp.zeros_like(U) if V0 is None
         else jnp.asarray(V0).reshape(U.shape))
    t = 0.0
    for _ in range(nsteps):
        U, V, info = stepper.step(U, V, t, dt)
        t += dt
    return U, V, t
