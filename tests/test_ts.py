"""Time integration: heat-equation decay (θ, generalized-α, explicit
RK3) and a second-order wave problem (α2) against exact solutions,
including temporal order checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import compute_error_norm
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.solve.ts import (
    AlphaStepper,
    Alpha2Stepper,
    ExplicitStepper,
    ThetaStepper,
    integrate,
    integrate_adaptive,
)

F64 = jnp.float64


def heat_ifunction(pt, shift, Ve, t, Ue, ctx):
    ut = pt.value(Ve)[0]
    gu = pt.grad(Ue)[0]
    return ut * pt.shape0 + pt.shape1 @ gu


def make_heat_space(nel=16, p=2):
    sp = Space([Axis.uniform(p=p, nel=nel)], dtype=F64)
    sp.set_boundary_value(0, 0, 0, 0.0)
    sp.set_boundary_value(0, 1, 0, 0.0)
    return sp


def project_initial(sp, f):
    """L2 projection of f onto the space (L2Projection.c pattern)."""
    from petiga_tpu.assembly.assemble import assemble_system

    def proj(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0)
        F = f(pt.x) * pt.shape0
        return K, F

    A, b = assemble_system(sp, proj, apply_fix=False)
    return cg(A, b, M=jacobi_preconditioner(A), rtol=1e-13).x


def heat_exact_error(sp, U, t):
    exact = lambda x: jnp.asarray([jnp.exp(-jnp.pi**2 * t) * jnp.sin(jnp.pi * x[0])])
    return float(compute_error_norm(sp, U, exact, k=0))


def test_theta_backward_euler_and_midpoint_orders():
    sp = make_heat_space(nel=32, p=3)
    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    T = 0.08
    errs = {}
    for theta in (1.0, 0.5):
        e = []
        for nsteps in (4, 8):
            st = ThetaStepper(sp, heat_ifunction, theta=theta,
                              newton_kw=dict(rtol=1e-12))
            U = integrate(st, U0, 0.0, T / nsteps, nsteps)
            e.append(heat_exact_error(sp, U, T))
        errs[theta] = e
    rate_be = np.log2(errs[1.0][0] / errs[1.0][1])
    rate_mid = np.log2(errs[0.5][0] / errs[0.5][1])
    assert abs(rate_be - 1) < 0.15, (rate_be, errs)
    assert rate_mid > 1.8, (rate_mid, errs)


def test_alpha_second_order():
    sp = make_heat_space(nel=32, p=3)
    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    T = 0.08
    e = []
    for nsteps in (4, 8):
        st = AlphaStepper(sp, heat_ifunction, rho_inf=0.5,
                          newton_kw=dict(rtol=1e-12))
        U, V = integrate(st, U0, 0.0, T / nsteps, nsteps)
        e.append(heat_exact_error(sp, U, T))
    rate = np.log2(e[0] / e[1])
    assert rate > 1.8, (rate, e)


def test_alpha_initial_velocity_consistent():
    sp = make_heat_space()
    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    st = AlphaStepper(sp, heat_ifunction, newton_kw=dict(rtol=1e-12))
    V0 = st.initial_velocity(U0, 0.0)
    # for the heat equation, V0 should approximate -π² u0 (interior)
    exact = lambda x: jnp.asarray([-jnp.pi**2 * jnp.sin(jnp.pi * x[0])])
    err = float(compute_error_norm(sp, V0, exact, k=0))
    assert err < 5e-2, err


def test_alpha2_wave():
    """u_tt = Δu, u = sin(πx) cos(πt): I2Function = N A + ∇N·∇u."""
    sp = make_heat_space(nel=16, p=2)

    def wave(pt, sA, Ae, sV, Ve, t, Ue, ctx):
        a = pt.value(Ae)[0]
        gu = pt.grad(Ue)[0]
        return a * pt.shape0 + pt.shape1 @ gu

    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    V0 = jnp.zeros_like(U0)
    A0 = project_initial(sp, lambda x: -jnp.pi**2 * jnp.sin(jnp.pi * x[0]))
    T = 0.5
    e = []
    for nsteps in (32, 64):
        st = Alpha2Stepper(sp, wave, rho_inf=0.9, newton_kw=dict(rtol=1e-12))
        U, V, A = integrate(st, U0, 0.0, T / nsteps, nsteps, V0=V0, A0=A0)
        exact = lambda x: jnp.asarray(
            [jnp.cos(jnp.pi * T) * jnp.sin(jnp.pi * x[0])]
        )
        e.append(float(compute_error_norm(sp, U, exact, k=0)))
    rate = np.log2(e[0] / e[1])
    assert rate > 1.7, (rate, e)


def test_alpha_adaptive_basic():
    """TSAlphaUseAdapt analog: starting from a too-small dt the basic
    controller must grow the step, reach t_end exactly, and stay
    accurate; starting too large it must reject and recover."""
    sp = make_heat_space(nel=16, p=2)
    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    T = 0.1
    st = AlphaStepper(sp, heat_ifunction, rho_inf=0.5,
                      newton_kw=dict(rtol=1e-12))

    U, V, stats = integrate_adaptive(st, U0, 0.0, 1e-4, T,
                                     rtol=1e-4, atol=1e-4)
    assert abs(stats.t - T) < 1e-12
    assert stats.dt_final > 5e-4, stats  # controller grew the step
    assert heat_exact_error(sp, U, T) < 2e-3, stats

    # oversized initial step: must reject at least once yet converge
    U2, _, stats2 = integrate_adaptive(st, U0, 0.0, 0.2, T,
                                       rtol=1e-5, atol=1e-5)
    assert stats2.rejections >= 1, stats2
    assert abs(stats2.t - T) < 1e-12
    assert heat_exact_error(sp, U2, T) < 2e-3, stats2


def test_explicit_rk3_heat():
    sp = make_heat_space(nel=16, p=2)

    def rhs(pt, t, Ue, ctx):
        gu = pt.grad(Ue)[0]
        return -(pt.shape1 @ gu)

    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    st = ExplicitStepper(sp, rhs, scheme="rk3")
    dt = 2e-5
    U = integrate(st, U0, 0.0, dt, 200)
    err = heat_exact_error(sp, U, 200 * dt)
    assert err < 2e-4, err


def test_alpha_adaptive_device_matches_host():
    """The one-while_loop on-device adaptive controller reproduces the
    host controller (same WLTE, same basic controller) and reaches t_end
    with the same accuracy — zero per-step host syncs."""
    from petiga_tpu.solve.ts import integrate_adaptive_device

    sp = make_heat_space(nel=16, p=2)
    U0 = project_initial(sp, lambda x: jnp.sin(jnp.pi * x[0]))
    T = 0.1
    st = AlphaStepper(sp, heat_ifunction, rho_inf=0.5,
                      newton_kw=dict(rtol=1e-12))
    Uh, _, sh = integrate_adaptive(st, U0, 0.0, 1e-4, T,
                                   rtol=1e-4, atol=1e-4)
    Ud, _, sd = integrate_adaptive_device(st, U0, 0.0, 1e-4, T,
                                          rtol=1e-4, atol=1e-4)
    assert abs(sd.t - T) < 1e-10
    assert sd.steps == sh.steps and sd.rejections == sh.rejections, (sd, sh)
    np.testing.assert_allclose(np.asarray(Ud), np.asarray(Uh), atol=1e-10)
    assert heat_exact_error(sp, Ud, T) < 2e-3, sd
