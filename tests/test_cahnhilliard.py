"""Cahn-Hilliard short-horizon run (the reference's `-ts_max_steps 2`
smoke strategy, demo/makefile) + free-energy decay check."""

import numpy as np
import jax.numpy as jnp

from petiga_tpu.models import cahnhilliard as ch


def test_cahnhilliard_2d_short():
    sp = ch.make_space(dim=2, nel=16, dtype=jnp.float64)
    U0 = ch.initial_condition(sp, seed=1)
    U, stats = ch.run(
        sp,
        U0,
        dt=1e-11,
        nsteps=2,
        newton_kw=dict(rtol=1e-6, linear_solver="bicgstab", maxit=20),
    )
    assert np.isfinite(np.asarray(U)).all()
    # concentration stays in (0, 1)
    assert float(U.min()) > 0 and float(U.max()) < 1
    # mass conservation: mean concentration preserved (periodic, no flux)
    np.testing.assert_allclose(float(U.mean()), float(U0.mean()), rtol=1e-7)
    # monitor produced stats and free energy did not increase
    energies = [s[2] for s in stats]
    assert len(energies) == 2
    assert energies[-1] <= energies[0] + 1e-8


def test_residual_order2_shapes():
    """The residual uses Hessians (C¹ requirement): order-2 tabulation
    present on the periodic quadratic space."""
    sp = ch.make_space(dim=2, nel=8)
    assert sp.order >= 2
    assert all(ax.periodic for ax in sp.axes)
    assert all(ax.continuity == 1 for ax in sp.axes)


def test_run_conv_matches_alpha_stepper():
    """The conv-Jacobian α driver (run_conv) reproduces the one-program
    AlphaStepper integration — same residual, same α algebra, Jacobian
    via order-2 conv channels instead of AD."""
    from petiga_tpu.models.cahnhilliard import (
        initial_condition, make_space, run, run_conv,
    )

    sp = make_space(2, nel=6)
    U0 = initial_condition(sp, seed=3)
    Ua, loga = run(sp, U0, dt=1e-11, nsteps=2,
                   newton_kw=dict(rtol=1e-10, linear_solver="bicgstab"))
    Ub, logb = run_conv(sp, U0, dt=1e-11, nsteps=2, rtol_newton=1e-10)
    np.testing.assert_allclose(
        np.asarray(Ub), np.asarray(Ua), atol=2e-9
    )
    np.testing.assert_allclose(
        np.asarray(logb[-1][2:]), np.asarray(loga[-1][2:]), rtol=1e-7
    )


def test_run_conv_newton_is_newton():
    """Regression: the conv Jacobian's mass channel must carry
    dVam/dX = αm/(γ·dt) with NO αf factor (the αf chain belongs to the
    spatial channels only).  With the extra αf the iteration degrades
    to a fixed-point contraction of exactly |1 − 1/αf| = 0.5/iter;
    correct Newton on a mass-dominated step converges ~quadratically —
    ≥3 orders in the first two corrections."""
    from petiga_tpu.models.cahnhilliard import (
        initial_condition, make_space, run_conv,
    )

    sp = make_space(2, nel=6)  # f64
    U0 = initial_condition(sp, seed=3)
    cnt = {}
    run_conv(sp, U0, dt=1e-9, nsteps=1, rtol_newton=1e-12,
             max_newton=6, counters=cnt)
    h = cnt["rhist"][0]
    assert h[2] < 1e-3 * h[0], h
