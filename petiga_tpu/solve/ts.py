"""Time integration — the analog of the reference's TS layer
(``petigats.c`` IFunction/IJacobian forms into PETSc TSTHETA/TSALPHA,
``petigats2.c`` I2Function into TSALPHA2, RHS forms for explicit
stepping).

All schemes reduce each step to a Newton solve of a *stage residual*
that is affine in the unknown end-of-step state; the affine states
(U0, V0, A0) travel through the assembly's ``aux`` closures and the
Jacobian (including the shift structure a·dF/dV + dF/dU) comes from
forward-mode AD of the composed residual — no hand-written IJacobian
needed (user-provided ones are still accepted).

Each stepper caches ONE jitted step function with (U..., t, dt) as
traced arguments, so a whole transient run compiles exactly once.

User forms (matching petiga.h:166-197 typedefs):
  ifunction(pt, shift, Ve, t, Ue, ctx) -> R          [TSTHETA/TSALPHA]
  iefunction(pt, shift, Ve, t, Ue, t0, U0e, ctx) -> R  [energy-stable]
  i2function(pt, shiftA, Ae, shiftV, Ve, t, Ue, ctx) -> R  [TSALPHA2]
  rhsfunction(pt, t, Ue, ctx) -> R                   [explicit]
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..assembly.assemble import assemble_system
from .krylov import cg, jacobi_preconditioner
from .newton import newton

__all__ = [
    "ThetaStepper",
    "AlphaStepper",
    "Alpha2Stepper",
    "ExplicitStepper",
    "integrate",
    "integrate_adaptive",
    "integrate_adaptive_device",
    "AdaptResult",
]


@dataclasses.dataclass
class ThetaStepper:
    """θ-method (PETSc TSTHETA, non-endpoint): solve
    F(t+θdt, U0+θ(U1-U0), (U1-U0)/dt) = 0 for U1.
    θ=1 → backward Euler; θ=0.5 → midpoint (2nd order)."""

    space: object
    ifunction: Callable
    theta: float = 0.5
    ctx: Optional[dict] = None
    newton_kw: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        th = self.theta
        sp, ifn, ctx, nkw = self.space, self.ifunction, self.ctx, self.newton_kw

        @jax.jit
        def step_fn(U, t, dt):
            def form(pt, Xe, aux_e, c):
                U0e = aux_e["U0"]
                Ue = U0e + th * (Xe - U0e)
                Ve = (Xe - U0e) / dt
                return ifn(pt, th / dt, Ve, t + th * dt, Ue, c)

            res = newton(sp, form, U, ctx, aux={"U0": U}, **nkw)
            return res.U, (res.iters, res.fnorm, res.converged)

        self._step = step_fn

    def step(self, U, t, dt):
        return self._step(U, jnp.asarray(t), jnp.asarray(dt))


@dataclasses.dataclass
class AlphaStepper:
    """Generalized-α for first-order systems (PETSc TSALPHA; used by the
    reference's CahnHilliard demos).  ρ∞ ∈ [0,1] controls high-frequency
    damping: α_m = ½(3-ρ)/(1+ρ), α_f = 1/(1+ρ), γ = ½ + α_m - α_f."""

    space: object
    ifunction: Callable = None
    rho_inf: float = 0.5
    ctx: Optional[dict] = None
    newton_kw: dict = dataclasses.field(default_factory=dict)
    iefunction: Callable = None  # IEFunction variant carrying (t0, U0)

    def coeffs(self):
        r = self.rho_inf
        am = 0.5 * (3 - r) / (1 + r)
        af = 1.0 / (1 + r)
        g = 0.5 + am - af
        return am, af, g

    def __post_init__(self):
        am, af, g = self.coeffs()
        sp, ifn, ctx, nkw = self.space, self.ifunction, self.ctx, self.newton_kw
        iefn = self.iefunction
        if ifn is None and iefn is None:
            raise ValueError("need ifunction or iefunction")
        if ifn is None:
            # adapt the IE form (petigats.c IEFunction: extra (t0, U0)
            # arguments for energy-stable semi-implicit splittings)
            def ifn(pt, shift, Ve, t, Ue, c, _aux=None):
                raise RuntimeError  # replaced below

        @jax.jit
        def step_fn(U, V, t, dt):
            def form(pt, Xe, aux_e, c):
                U0e, V0e = aux_e["U0"], aux_e["V0"]
                # V1 = (X - U0)/(γ dt) + (1 - 1/γ) V0
                V1e = (Xe - U0e) / (g * dt) + (1 - 1 / g) * V0e
                Uaf = U0e + af * (Xe - U0e)
                Vam = V0e + am * (V1e - V0e)
                shift = am * af / (g * dt)
                if iefn is not None:
                    return iefn(pt, shift, Vam, t + af * dt, Uaf, t, U0e, c)
                return ifn(pt, shift, Vam, t + af * dt, Uaf, c)

            res = newton(sp, form, U, ctx, aux={"U0": U, "V0": V}, **nkw)
            U1 = res.U
            V1 = (U1 - U) / (g * dt) + (1 - 1 / g) * V
            return U1, V1, (res.iters, res.fnorm, res.converged)

        @jax.jit
        def v0_fn(U, t):
            def form(pt, Xe, aux_e, c):
                if iefn is not None:
                    return iefn(pt, 1.0, Xe, t, aux_e["U0"], t, aux_e["U0"], c)
                return ifn(pt, 1.0, Xe, t, aux_e["U0"], c)

            V0 = jnp.zeros((sp.nnodes, sp.dof), sp.dtype)
            res = newton(sp, form, V0, ctx, aux={"U0": U}, **nkw)
            return res.U

        self._step = step_fn
        self._v0 = v0_fn

    def initial_velocity(self, U, t):
        """Consistent V0: solve F(t, U0, V0) = 0 for V0 (the reference
        relies on PETSc's TSAlpha bootstrap; here one Newton solve in V).
        Fix rows give V0 = 0 on Dirichlet dofs — correct for constant BCs.
        """
        return self._v0(U, jnp.asarray(t))

    def step(self, U, V, t, dt):
        return self._step(U, V, jnp.asarray(t), jnp.asarray(dt))


@dataclasses.dataclass
class Alpha2Stepper:
    """Generalized-α for second-order-in-time systems (PETSc TSALPHA2;
    reference demo ElasticRod.c via IGACreateTS2, petigats2.c:177-280).
    α_m = (2-ρ)/(1+ρ), α_f = 1/(1+ρ), γ = ½+α_m-α_f, β = ¼(1+α_m-α_f)²."""

    space: object
    i2function: Callable
    rho_inf: float = 0.5
    ctx: Optional[dict] = None
    newton_kw: dict = dataclasses.field(default_factory=dict)

    def coeffs(self):
        r = self.rho_inf
        am = (2 - r) / (1 + r)
        af = 1.0 / (1 + r)
        g = 0.5 + am - af
        b = 0.25 * (1 + am - af) ** 2
        return am, af, g, b

    def __post_init__(self):
        am, af, g, b = self.coeffs()
        sp, ifn, ctx, nkw = self.space, self.i2function, self.ctx, self.newton_kw

        @jax.jit
        def step_fn(U, V, A, t, dt):
            def newmark(Xe, U0e, V0e, A0e):
                A1 = (
                    (Xe - U0e) / (b * dt * dt)
                    - V0e / (b * dt)
                    - (0.5 / b - 1) * A0e
                )
                V1 = V0e + dt * ((1 - g) * A0e + g * A1)
                return V1, A1

            def form(pt, Xe, aux_e, c):
                U0e, V0e, A0e = aux_e["U0"], aux_e["V0"], aux_e["A0"]
                V1e, A1e = newmark(Xe, U0e, V0e, A0e)
                Uaf = U0e + af * (Xe - U0e)
                Vaf = V0e + af * (V1e - V0e)
                Aam = A0e + am * (A1e - A0e)
                return ifn(
                    pt, am / (b * dt * dt), Aam, af * g / (b * dt), Vaf,
                    t + af * dt, Uaf, c,
                )

            res = newton(
                sp, form, U, ctx, aux={"U0": U, "V0": V, "A0": A}, **nkw
            )
            U1 = res.U
            A1 = (U1 - U) / (b * dt * dt) - V / (b * dt) - (0.5 / b - 1) * A
            V1 = V + dt * ((1 - g) * A + g * A1)
            return U1, V1, A1, (res.iters, res.fnorm, res.converged)

        self._step = step_fn

    def step(self, U, V, A, t, dt):
        return self._step(U, V, A, jnp.asarray(t), jnp.asarray(dt))


class ExplicitStepper:
    """Explicit stepping for RHS forms M u̇ = R(t, u) (the reference's
    TSRHSFunction path, petigats.c RHS loops): consistent-mass CG solves
    each stage; forward Euler and SSP-RK3."""

    def __init__(self, space, rhsfunction, scheme="rk3", ctx=None,
                 mass_rtol=1e-10):
        self.space = space
        self.rhsfunction = rhsfunction
        self.scheme = scheme
        self.ctx = ctx
        sp = space

        def mass(pt, c):
            K = jnp.outer(pt.shape0, pt.shape0)
            dof = sp.dof
            Kd = jnp.zeros((pt.nen, dof, pt.nen, dof), sp.dtype)
            for d in range(dof):
                Kd = Kd.at[:, d, :, d].set(K)
            return Kd, jnp.zeros((pt.nen, dof), sp.dtype)

        # the mass matrix gets the same symmetric Dirichlet elimination as
        # the residual (fixed rows of R are u - v), so fixed dofs decouple
        # and du/dt = v - u there (→ 0 once the BC is satisfied)
        M, _ = assemble_system(sp, mass, apply_fix=True)
        Mprec = jacobi_preconditioner(M)
        Mop = M.fast_operator()  # Pallas kernel on TPU, XLA elsewhere
        rhsfn = rhsfunction
        ctx_ = ctx

        from ..assembly.assemble import assemble_function

        def rhs(U, t):
            def form(pt, Ue, c):
                return rhsfn(pt, t, Ue, c)

            R = assemble_function(sp, form, U, ctx_)
            return cg(Mop, R, M=Mprec, rtol=mass_rtol).x

        @jax.jit
        def step_fn(U, t, dt):
            if scheme == "euler":
                return U + dt * rhs(U, t), None
            k1 = U + dt * rhs(U, t)
            k2 = 0.75 * U + 0.25 * (k1 + dt * rhs(k1, t + dt))
            U1 = U / 3 + 2 / 3 * (k2 + dt * rhs(k2, t + 0.5 * dt))
            return U1, None

        self._step = step_fn

    def step(self, U, t, dt):
        return self._step(U, jnp.asarray(t), jnp.asarray(dt))


def integrate(
    stepper,
    U0,
    t0: float,
    dt: float,
    nsteps: int,
    ctx=None,
    *,
    V0=None,
    A0=None,
    monitor: Optional[Callable] = None,
):
    """Fixed-step host loop (TSSolve analog).  ``monitor(step, t, U)`` is
    called after each step (free energy / norm monitors in the demos).
    ``ctx`` here is accepted for backward compatibility but the stepper's
    own ctx (given at construction) is what reaches the forms."""
    U, V, A = U0, V0, A0
    t = t0
    if isinstance(stepper, AlphaStepper) and V is None:
        V = stepper.initial_velocity(U0, t0)
    for k in range(nsteps):
        if isinstance(stepper, AlphaStepper):
            U, V, _ = stepper.step(U, V, t, dt)
        elif isinstance(stepper, Alpha2Stepper):
            U, V, A, _ = stepper.step(U, V, A, t, dt)
        else:
            U, _ = stepper.step(U, t, dt)
        t += dt
        if monitor is not None:
            monitor(k + 1, t, U)
    if isinstance(stepper, Alpha2Stepper):
        return U, V, A
    if isinstance(stepper, AlphaStepper):
        return U, V
    return U


class AdaptResult(NamedTuple):
    t: float
    steps: int
    rejections: int
    dt_final: float


def integrate_adaptive(
    stepper,
    U0,
    t0: float,
    dt0: float,
    t_end: float,
    *,
    V0=None,
    rtol: float = 1e-2,
    atol: float = 1e-2,
    safety: float = 0.9,
    clip: tuple = (0.1, 10.0),
    dt_min: float = 1e-12,
    max_steps: int = 100000,
    monitor: Optional[Callable] = None,
):
    """Error-controlled generalized-α stepping — the analog of the
    reference's ``TSAlphaUseAdapt`` + PETSc ``TSADAPTBASIC``
    (src/petscts.c:11-22; enabled by the CahnHilliard demos with
    ``-ts_adapt_type basic``).

    The local-error estimate is the embedded backward-Euler comparison
    PETSc's TSAlpha uses for its WLTE: the α solution U1 is 2nd-order,
    ``U_BE = U0 + dt·V1`` is 1st-order, and their difference is measured
    in the weighted-RMS norm with weights ``atol + rtol·max(|U0|,|U1|)``.
    The basic controller accepts when wlte < 1 and proposes
    ``dt·clip(safety·wlte^(-1/(order+1)))`` with order = 2.

    dt is a traced argument of the cached step function, so the whole
    adaptive run still compiles exactly one XLA program per phase.
    Returns ``(U, V, AdaptResult)``.
    """
    if not isinstance(stepper, AlphaStepper):
        raise TypeError("integrate_adaptive requires an AlphaStepper "
                        "(the reference hook targets TSALPHA only)")

    # Fixed (Dirichlet) dofs are algebraic, not evolved: the first-step
    # BC-enforcement jump would otherwise put a dt-independent floor
    # under the estimate, so they are excluded from the norm.
    mask, _ = stepper.space.dirichlet_mask()
    free = jnp.asarray(~mask)
    nfree = max(int(free.sum()), 1)

    @jax.jit
    def wlte_fn(Uold, Unew, Vnew, dt):
        U_be = Uold + dt * Vnew
        w = atol + rtol * jnp.maximum(jnp.abs(Uold), jnp.abs(Unew))
        d = jnp.where(free, (Unew - U_be) / w, 0.0)
        return jnp.sqrt(jnp.sum(d * d) / nfree)

    U, V = U0, V0
    if V is None:
        V = stepper.initial_velocity(U0, t0)
    t, dt = float(t0), float(dt0)
    steps = rejections = 0
    lo, hi = clip
    while t < t_end - 1e-14 * max(1.0, abs(t_end)) and steps < max_steps:
        dt_try = min(dt, t_end - t)
        U1, V1, info = stepper.step(U, V, t, dt_try)
        err = float(wlte_fn(U, U1, V1, jnp.asarray(dt_try)))
        fac = safety * err ** (-1.0 / 3.0) if err > 0 else hi
        dt = dt_try * min(max(fac, lo), hi)
        if err < 1.0:
            U, V = U1, V1
            t += dt_try
            steps += 1
            if monitor is not None:
                monitor(steps, t, U)
        else:
            rejections += 1
            if dt < dt_min:
                raise RuntimeError(f"adaptive dt underflow at t={t}")
    return U, V, AdaptResult(t, steps, rejections, dt)


def integrate_adaptive_device(
    stepper,
    U0,
    t0: float,
    dt0: float,
    t_end: float,
    *,
    V0=None,
    rtol: float = 1e-2,
    atol: float = 1e-2,
    safety: float = 0.9,
    clip: tuple = (0.1, 10.0),
    dt_min: float = 1e-12,
    max_steps: int = 100000,
):
    """:func:`integrate_adaptive` with the WHOLE adaptive run as one
    compiled ``lax.while_loop`` — step, WLTE estimate, accept/reject and
    the dt controller all on device, zero per-step host round trips
    (each of which costs ~0.5 s on the remote-TPU tunnel; the host-loop
    variant keeps per-step monitors instead).  Same basic controller as
    PETSc's TSADAPTBASIC.  Returns ``(U, V, AdaptResult)``."""
    if not isinstance(stepper, AlphaStepper):
        raise TypeError("integrate_adaptive_device requires an AlphaStepper")
    sp = stepper.space
    mask, _ = sp.dirichlet_mask()
    free = jnp.asarray(~mask)
    nfree = max(int(free.sum()), 1)
    lo, hi = clip
    order_pow = -1.0 / 3.0  # order 2 controller exponent

    def wlte(Uold, Unew, Vnew, dt):
        U_be = Uold + dt * Vnew
        w = atol + rtol * jnp.maximum(jnp.abs(Uold), jnp.abs(Unew))
        d = jnp.where(free, (Unew - U_be) / w, 0.0)
        return jnp.sqrt(jnp.sum(d * d) / nfree)

    U = jnp.asarray(U0).reshape(sp.nnodes, sp.dof)
    V = (stepper.initial_velocity(U, t0) if V0 is None
         else jnp.asarray(V0).reshape(U.shape))
    eps_end = 1e-14 * max(1.0, abs(t_end))

    @jax.jit
    def run(U, V):
        def cond(s):
            U, V, t, dt, steps, rej = s
            return (
                (t < t_end - eps_end) & (steps < max_steps) & (dt > dt_min)
            )

        def body(s):
            U, V, t, dt, steps, rej = s
            dt_try = jnp.minimum(dt, t_end - t)
            U1, V1, _ = stepper._step(U, V, t, dt_try)
            err = wlte(U, U1, V1, dt_try)
            fac = jnp.where(err > 0, safety * err ** order_pow, hi)
            dt_new = dt_try * jnp.clip(fac, lo, hi)
            accept = err < 1.0
            U = jnp.where(accept, U1, U)
            V = jnp.where(accept, V1, V)
            t = jnp.where(accept, t + dt_try, t)
            steps = steps + accept.astype(jnp.int32)
            rej = rej + (1 - accept.astype(jnp.int32))
            return (U, V, t, dt_new, steps, rej)

        t = jnp.asarray(float(t0), U.dtype)
        dt = jnp.asarray(float(dt0), U.dtype)
        return jax.lax.while_loop(
            cond, body, (U, V, t, dt, jnp.int32(0), jnp.int32(0))
        )

    U, V, t, dt, steps, rej = run(U, V)
    return U, V, AdaptResult(float(t), int(steps), int(rej), float(dt))
