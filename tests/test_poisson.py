"""End-to-end Poisson solves + convergence-rate oracle — the analog of
the reference's test/ConvTest.py (L2 rate ≈ p+1, H1 rate ≈ p, log-log
slope fit with tolerance 0.075, ConvTest.py:69-104)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.models.poisson import (
    make_space,
    solve_poisson,
    l2_error,
    h1_error,
)

F64 = jnp.float64


@pytest.mark.parametrize("dim", [1, 2])
def test_poisson_solves_accurately(dim):
    sp = make_space(dim, p=2, nel=8, dtype=F64)
    U, info = solve_poisson(sp, rtol=1e-12)
    err = l2_error(sp, U)
    assert err < 5e-4, err
    assert info["iters"] < sp.nnodes


def test_poisson_3d_small():
    sp = make_space(3, p=2, nel=4, dtype=F64)
    U, info = solve_poisson(sp, rtol=1e-11)
    assert l2_error(sp, U) < 5e-3


@pytest.mark.parametrize(
    "dim,p",
    [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3), (3, 2)],
)
def test_convergence_rates(dim, p):
    """Log-log slope of L2/H1 error across two meshes (ConvTest.py:69-104)."""
    nels = {1: (16, 32), 2: (8, 16), 3: (8, 16)}[dim]
    if p >= 3:
        nels = tuple(2 * n for n in nels)
    errs_l2, errs_h1 = [], []
    for nel in nels:
        sp = make_space(dim, p=p, nel=nel, dtype=F64)
        U, _ = solve_poisson(sp, rtol=1e-13)
        errs_l2.append(l2_error(sp, U))
        errs_h1.append(h1_error(sp, U))
    rate_l2 = np.log2(errs_l2[0] / errs_l2[1])
    rate_h1 = np.log2(errs_h1[0] / errs_h1[1])
    assert abs(rate_l2 - (p + 1)) < 0.075, (rate_l2, errs_l2)
    assert abs(rate_h1 - p) < 0.075, (rate_h1, errs_h1)


def test_reaction_diffusion():
    """c u - k Δu with c,k != default still reproduces the solution."""
    sp = make_space(2, p=2, nel=12, dtype=F64)
    U, _ = solve_poisson(sp, c=1.0, k=2.0, rtol=1e-12)
    assert l2_error(sp, U) < 2e-4


def test_periodic_poisson():
    """Periodic in one axis: u = sin(2πx) sin(πy) with Dirichlet in y."""
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space
    from petiga_tpu.assembly.assemble import assemble_system, compute_error_norm
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

    def system(pt, ctx):
        f = 5 * jnp.pi**2 * jnp.sin(2 * jnp.pi * pt.x[0]) * jnp.sin(jnp.pi * pt.x[1])
        K = pt.shape1 @ pt.shape1.T
        return K, f * pt.shape0

    for nel, _ in [(8, None)]:
        sp = Space(
            [Axis.uniform(p=2, nel=16, periodic=True), Axis.uniform(p=2, nel=16)],
            dtype=F64,
        )
        sp.set_boundary_value(1, 0, 0, 0.0)
        sp.set_boundary_value(1, 1, 0, 0.0)
        A, b = assemble_system(sp, system)
        res = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-12)
        exact = lambda x: jnp.asarray(
            [jnp.sin(2 * jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])]
        )
        err = float(compute_error_norm(sp, res.x, exact, k=0))
        assert err < 5e-4, err


def test_logg_challenge():
    """demo/LoggChallenge.c: -Δu = 2π² sin(πx)sin(πy), L2 error < 1e-6
    (high-degree splines make this easy: p=4 on a 16² mesh)."""
    sp = make_space(2, p=4, nel=16, dtype=F64)
    U, _ = solve_poisson(sp, rtol=1e-13)
    assert l2_error(sp, U) < 1e-6
