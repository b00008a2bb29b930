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

    J(w, v) = shift·w v + ∇w·∇v t1 + (∇v·∇c)(∂t1/∂c) w
              + (∇v·∇c) M' Δw + Δv M Δw + Δv M' Δc w
    with t1 = Mμ' + M'Δc (rows = test v, cols = trial w).
    """
    theta, alpha = ctx["theta"], ctx["alpha"]
    shift = ctx.get("shift", 0.0)
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
        ch[(d + 1, d + 1)] = t1
        ch[(d + 1, 0)] = gc[..., d] * dt1
        ch[((d, d), 0)] = dM * d2c
        for e in range(dim):
            ch[(d + 1, (e, e))] = gc[..., d] * dM
            ch[((d, d), (e, e))] = M
    return ch
