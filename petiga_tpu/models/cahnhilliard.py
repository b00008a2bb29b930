"""Cahn-Hilliard phase-field model — parity with demo/CahnHilliard2D.c /
CahnHilliard3D.c of the reference: 4th-order operator in primal form on
C¹ B-splines (periodic), degenerate mobility, logarithmic chemical
potential, generalized-α stepping, Ginzburg-Landau free-energy monitor.

The reference writes a long hand-derived tangent (CahnHilliard2D.c
Tangent); here the Jacobian is forward-mode AD of this residual.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..assembly.assemble import compute_scalar
from ..solve.ts import AlphaStepper, integrate

__all__ = [
    "mobility",
    "chemical_potential_d",
    "residual",
    "free_energy_stats",
    "make_space",
    "initial_condition",
    "run",
]


def mobility(c):
    """M(c) = c(1-c) (CahnHilliard2D.c:9-14)."""
    return c * (1 - c)


def dmobility(c):
    return 1 - 2 * c


def chemical_potential_d(c, theta, alpha):
    """dμ/dc = 3α (1/(2θ c(1-c)) - 2) (CahnHilliard2D.c:16-32)."""
    return 3 * alpha * (0.5 / theta / (c * (1 - c)) - 2.0)


def residual(pt, shift, Ve, t, Ue, ctx):
    """R_a = N_a c_t + (∇N_a·∇c)(M μ' + M' Δc) + ΔN_a M Δc
    (CahnHilliard2D.c:85-131)."""
    theta, alpha = ctx["theta"], ctx["alpha"]
    c = pt.value(Ue)[0]
    c_t = pt.value(Ve)[0]
    gc = pt.grad(Ue)[0]
    d2c = pt.del2(Ue)[0]
    M = mobility(c)
    dM = dmobility(c)
    dmu = chemical_potential_d(c, theta, alpha)
    t1 = M * dmu + dM * d2c
    lapN = jnp.trace(pt.shape2, axis1=-2, axis2=-1)  # (nen,)
    return pt.shape0 * c_t + (pt.shape1 @ gc) * t1 + lapN * M * d2c


def free_energy_stats(pt, Ue, ctx):
    """[free energy density, 2nd moment, 3rd moment]
    (CahnHilliard2D.c:34-57)."""
    theta, alpha = ctx["theta"], ctx["alpha"]
    cbar = ctx["cbar"]
    c = pt.value(Ue)[0]
    gc = pt.grad(Ue)[0]
    E = (
        c * jnp.log(c)
        + (1 - c) * jnp.log(1 - c)
        + 2 * theta * c * (1 - c)
        + theta / (3 * alpha) * jnp.sum(gc * gc)
    )
    diff = c - cbar
    return jnp.stack([E, diff * diff, diff * diff * diff])


def make_space(dim=2, nel=32, dtype=jnp.float64) -> Space:
    """Periodic C¹ quadratic space (CahnHilliard demos use periodic
    quadratic C¹ B-splines)."""
    axes = [Axis.uniform(p=2, nel=nel, periodic=True) for _ in range(dim)]
    return Space(axes, dof=1, dtype=dtype, order=2)


def initial_condition(space, cbar=0.63, noise=0.05, seed=0):
    """cbar + uniform noise (CahnHilliard2D.c FormInitialCondition)."""
    rng = np.random.default_rng(seed)
    u = cbar + noise * (rng.random((space.nnodes, 1)) - 0.5)
    return jnp.asarray(u, space.dtype)


def run(
    space,
    U0,
    *,
    theta=1.5,
    alpha=3000.0,
    cbar=0.63,
    dt=1e-11,
    nsteps=2,
    rho_inf=0.5,
    newton_kw=None,
    monitor=None,
):
    """Generalized-α integration with the free-energy/statistics monitor
    (StatsMonitor, CahnHilliard2D.c:59-83)."""
    ctx = {"theta": theta, "alpha": alpha, "cbar": cbar}
    stepper = AlphaStepper(
        space,
        residual,
        rho_inf=rho_inf,
        ctx=ctx,
        newton_kw=newton_kw or dict(rtol=1e-6, linear_solver="bicgstab"),
    )
    stats_log = []
    import jax

    stats_fn = jax.jit(
        lambda U: compute_scalar(space, free_energy_stats, U, ctx, order=1)
    )

    def mon(step, t, U):
        s = np.asarray(stats_fn(U))
        stats_log.append((step, t, *s))
        if monitor is not None:
            monitor(step, t, U, s)

    U, V = integrate(stepper, U0, 0.0, dt, nsteps, monitor=mon)
    return U, stats_log


def ddmobility(c):
    return -2.0 * jnp.ones_like(c)


def chemical_potential_dd(c, theta, alpha):
    """d²μ/dc² = -3α/(2θ) · (1-2c)/(c(1-c))²."""
    return -3 * alpha / (2 * theta) * (1 - 2 * c) / (c * (1 - c)) ** 2


def jacobian_coefficients(x, ctx, fields):
    """The Cahn-Hilliard time-stepper Jacobian as a coefficient spec
    with second-derivative channels and state (value/gradient/Hessian)
    dependent coefficients — the 4th-order flagship class
    (CahnHilliard2D.c Tangent, demo/CahnHilliard3D.c:55-112) on the MXU
    conv engine.  Pass ``fields={"c": (C, 2)}``; ``ctx["shift"]`` adds
    the ∂/∂c_t mass term of the α scheme.

    J(w, v) = shift·w v + s·[∇w·∇v t1 + (∇v·∇c)(∂t1/∂c) w
              + (∇v·∇c) M' Δw + Δv M Δw + Δv M' Δc w]
    with t1 = Mμ' + M'Δc (rows = test v, cols = trial w) and
    ``s = ctx["scale"]`` the α-scheme chain factor α_f (spatial terms
    differentiate through U_αf = U0 + α_f (X - U0)).
    """
    theta, alpha = ctx["theta"], ctx["alpha"]
    shift = ctx.get("shift", 0.0)
    scale = ctx.get("scale", 1.0)
    dim = x.shape[-1]
    c = fields["c"]
    gc = fields["c_grad"]
    d2c = jnp.trace(fields["c_hess"], axis1=-2, axis2=-1)
    M = mobility(c)
    dM = dmobility(c)
    ddM = ddmobility(c)
    dmu = chemical_potential_d(c, theta, alpha)
    ddmu = chemical_potential_dd(c, theta, alpha)
    t1 = M * dmu + dM * d2c
    dt1 = dM * dmu + M * ddmu + ddM * d2c  # ∂t1/∂c
    ch = {}
    if not isinstance(shift, (int, float)) or shift != 0.0:
        ch[(0, 0)] = shift
    for d in range(dim):
        ch[(d + 1, d + 1)] = scale * t1
        ch[(d + 1, 0)] = scale * gc[..., d] * dt1
        ch[((d, d), 0)] = scale * dM * d2c
        for e in range(dim):
            ch[(d + 1, (e, e))] = scale * gc[..., d] * dM
            ch[((d, d), (e, e))] = scale * M
    return ch


def _mass_coef(x, c):
    # module-level (stable identity): the convform trace cache keys on
    # the coef function object — an inline lambda re-traces every call
    return {(0, 0): 1.0}


def residual_channels(x, ctx, fe):
    """The CH residual as conv TEST channels with state fields
    ``c`` (order 2) and ``ct`` (order 0), for
    :func:`~petiga_tpu.assembly.convform.assemble_residual_conv`:
    R_a = N_a·ct + ∇N_a·(∇c·t1) + ΔN_a·(M Δc), t1 = Mμ' + M'Δc
    (the same algebra as :func:`residual`, test side factored out)."""
    theta, alpha = ctx["theta"], ctx["alpha"]
    c = fe["c"]
    gc = fe["c_grad"]
    d2c = jnp.trace(fe["c_hess"], axis1=-2, axis2=-1)
    ct = fe["ct"]
    M = mobility(c)
    dM = dmobility(c)
    dmu = chemical_potential_d(c, theta, alpha)
    t1 = M * dmu + dM * d2c
    ch = {0: ct}
    dim = x.shape[-1]
    for d in range(dim):
        ch[d + 1] = gc[..., d] * t1
        ch[(d, d)] = M * d2c
    return ch


def run_conv(
    space,
    U0,
    *,
    theta=1.5,
    alpha=3000.0,
    cbar=0.63,
    dt=1e-11,
    nsteps=2,
    rho_inf=0.5,
    rtol_newton=1e-6,
    max_newton=8,
    rtol_inner=1e-8,
    monitor=None,
    counters=None,
    chunk=None,
    stol=0.0,
    conv_residual=True,
):
    """Generalized-α integration with the Jacobian CONV-ASSEMBLED each
    Newton iteration (order-2 channels + value/grad/Hessian state
    fields) — the large-scale route for the flagship transient class:
    per-step work is a handful of MXU conv assemblies + packed-kernel
    BiCGStab solves, no scatter anywhere.  Same α-scheme algebra as
    :class:`~petiga_tpu.solve.ts.AlphaStepper` (TSALPHA,
    petigats.c:23-90); state/iterate vectors enter every cached
    executable as jit arguments, so steps after the first trace
    nothing.

    ``stol > 0`` adds the increment convergence test (PETSc
    ``-snes_stol``): a Newton step with ||dX|| ≤ stol·||X|| ends the
    step immediately, skipping the final residual-only assembly.

    Returns ``(U, stats_log)`` like :func:`run`."""
    import jax

    from ..assembly.assemble import assemble_function
    from ..assembly.convform import (
        assemble_coefficient_planes,
        assemble_residual_conv,
    )
    from ..assembly.fastpath import is_unit_step as fastpath_unit_step
    from ..solve.krylov import bicgstab

    sp = space
    r = rho_inf
    am = 0.5 * (3 - r) / (1 + r)
    af = 1.0 / (1 + r)
    g = 0.5 + am - af
    ctx = {"theta": theta, "alpha": alpha, "cbar": cbar}

    def alpha_form(pt, Xe, aux_e, c):
        U0e, V0e = aux_e["U0"], aux_e["V0"]
        dts = c["dt"]
        V1e = (Xe - U0e) / (g * dts) + (1 - 1 / g) * V0e
        Uaf = U0e + af * (Xe - U0e)
        Vam = V0e + am * (V1e - V0e)
        shift = am * af / (g * dts)
        return residual(pt, shift, Vam, c["t"], Uaf, c)

    def jac(Uaf, shift):
        J, _ = assemble_coefficient_planes(
            sp, jacobian_coefficients,
            {"theta": theta, "alpha": alpha, "shift": shift,
             "scale": af},
            fields={"c": (Uaf, 2)}, apply_fix=False,
        )
        return J

    solve_cache = {}

    def lin_solve(J, R):
        key = J.kind
        fn = solve_cache.get(key)
        if fn is None:
            @jax.jit
            def fn(DT, rr):
                dv = J.packed_diag_inv_of(DT)
                res = bicgstab(
                    lambda v: J.matvec_xb(DT, v), J.pack_vec(rr),
                    M=lambda z: z * dv, rtol=rtol_inner, maxiter=2000,
                )
                return J.unpack_vec(res.x), res.iters

            solve_cache[key] = fn
        return fn(J.DT, -R)

    use_conv_res = (
        conv_residual and sp.dof == 1
        and not sp.has_geometry and not sp.is_rational
        and fastpath_unit_step(sp)
    )

    @jax.jit
    def _alpha_vectors(X, U, V, dts):
        # nodal α-state algebra in ONE dispatch (eager ops cost
        # 10-50 ms each on a remote-tunneled device)
        V1v = (X - U) / (g * dts) + (1 - 1 / g) * V
        Vamv = V + am * (V1v - V)
        Uafv = U + af * (X - U)
        return Uafv.reshape(-1), Vamv.reshape(-1)

    def newton_step(U, V, t, dts):
        cstep = dict(ctx)
        cstep["t"] = jnp.asarray(t, sp.dtype)
        cstep["dt"] = jnp.asarray(dts, sp.dtype)
        # dR/dX of the mass term: dVam/dX = am/(g·dt) — NO α_f factor
        # (the α_f chain applies only to the spatial terms evaluated at
        # U_αf, carried by the `scale` channel coefficient).  With the
        # extra α_f the mass channel is α_f× too small and Newton
        # degrades to a fixed-point iteration contracting at exactly
        # |1 - 1/α_f| = 0.5 per iteration (measured before the fix).
        shift = jnp.asarray(am / (g * dts), sp.dtype)
        X = U
        rnorm0 = None
        nit = 0
        rhist = []
        for _ in range(max_newton):
            if use_conv_res:
                # the α residual via conv TEST channels: Vam and Uaf
                # are nodal-linear in (X, U, V), so their point values
                # are the field evaluations of these node vectors
                Uafv, Vamv = _alpha_vectors(X, U, V, cstep["dt"])
                R = assemble_residual_conv(
                    sp, residual_channels, cstep,
                    fields={"c": (Uafv, 2), "ct": (Vamv, 0)},
                )
            else:
                R = assemble_function(
                    sp, alpha_form, X, cstep, aux={"U0": U, "V0": V},
                    chunk=chunk,
                )
            rn = float(jnp.linalg.norm(R))
            rhist.append(rn)
            if rnorm0 is None:
                rnorm0 = max(rn, 1e-30)
            if rn <= rtol_newton * rnorm0:
                break
            Uaf = (U + af * (X - U)).reshape(-1)
            J = jac(Uaf, shift)
            dX, _ = lin_solve(J, R)
            X = X + dX
            nit += 1
            if stol > 0.0:
                # increment criterion (SNES -snes_stol analog,
                # SNESConvergedDefault): ||dX|| <= stol ||X|| ends the
                # step WITHOUT the extra convergence-check residual
                # assembly — in the mass-dominated 1-iteration regime
                # that assembly is ~40% of the step cost.
                sn = float(jnp.linalg.norm(dX) / jnp.linalg.norm(X))
                if sn <= stol:
                    break
        if counters is not None:
            counters.setdefault("newton_iters", []).append(nit)
            counters.setdefault("fnorm", []).append(rn)
            counters.setdefault("rhist", []).append(rhist)
        V1 = (X - U) / (g * dts) + (1 - 1 / g) * V
        return X, V1

    stats_fn = jax.jit(
        lambda U: compute_scalar(space, free_energy_stats, U, ctx,
                                 order=1)
    )
    # consistent initial velocity: M V0 = -R_spatial(U0) (linear in V)
    def v0_res(pt, Xe, aux_e, c):
        return residual(pt, 1.0, jnp.zeros_like(Xe), 0.0, aux_e["U0"], c)

    Rsp = assemble_function(sp, v0_res, jnp.zeros_like(U0), ctx,
                            aux={"U0": U0}, chunk=chunk)
    Mop, _ = assemble_coefficient_planes(sp, _mass_coef,
                                         apply_fix=False)
    from ..solve.krylov import cg as _cg

    # dtype-matched tolerance: rtol 1e-12 is unreachable in f32 and
    # burns the full maxiter budget (measured 30 s of init at 64^3)
    rtol_m = 1e-12 if sp.dtype == jnp.float64 else 1e-6
    @jax.jit
    def msolve(DT, rr):
        dv = Mop.packed_diag_inv_of(DT)
        res = _cg(lambda v: Mop.matvec_xb(DT, v), Mop.pack_vec(rr),
                  M=lambda z: z * dv, rtol=rtol_m, maxiter=500)
        return Mop.unpack_vec(res.x)

    V = msolve(Mop.DT, -Rsp)
    U = U0
    t = 0.0
    stats_log = []
    for step in range(nsteps):
        U, V = newton_step(U, V, t, dt)
        t += dt
        s = np.asarray(stats_fn(U))
        stats_log.append((step + 1, t, *s))
        if monitor is not None:
            monitor(step + 1, t, U, s)
    return U, stats_log
