"""Newton-Krylov + Bratu: AD-vs-hand Jacobian equivalence (the
reference's AutoDiff cross-validation strategy) and nonlinear solves
(Test_SNES_2D analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.assembly.assemble import (
    assemble_function,
    assemble_jacobian,
)
from petiga_tpu.models.bratu import (
    bratu_jacobian,
    bratu_residual,
    make_space,
    solve_bratu,
)
from petiga_tpu.solve.newton import newton

F64 = jnp.float64


def test_jacobian_ad_matches_handwritten():
    sp = make_space(2, p=2, nel=4, dtype=F64)
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp.nnodes, 1)))
    ctx = {"lambda": 3.0}
    J_ad = assemble_jacobian(sp, bratu_residual, U, ctx)
    J_hand = assemble_jacobian(sp, bratu_residual, U, ctx, jacobian=bratu_jacobian)
    np.testing.assert_allclose(
        np.asarray(J_ad.data), np.asarray(J_hand.data), atol=1e-12
    )


def test_jacobian_matches_fd():
    """AD Jacobian vs directional finite differences of the residual."""
    sp = make_space(2, p=2, nel=3, dtype=F64)
    rng = np.random.default_rng(4)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp.nnodes, 1)))
    V = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    ctx = {"lambda": 2.0}
    J = assemble_jacobian(sp, bratu_residual, U, ctx)
    h = 1e-7
    Fp = assemble_function(sp, bratu_residual, U + h * V, ctx)
    Fm = assemble_function(sp, bratu_residual, U - h * V, ctx)
    fd = np.asarray(Fp - Fm) / (2 * h)
    jv = np.asarray(J.matvec(V))
    np.testing.assert_allclose(jv, fd, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_ad", [True, False])
def test_bratu_solve(use_ad):
    sp = make_space(2, p=2, nel=8, dtype=F64)
    res = solve_bratu(sp, lam=6.0, use_ad=use_ad, rtol=1e-10)
    assert bool(res.converged)
    assert int(res.iters) <= 10
    # residual actually small
    F = assemble_function(sp, bratu_residual, res.U, {"lambda": 6.0})
    assert float(jnp.abs(F).max()) < 1e-9
    # solution is positive inside, zero on boundary, max in the center
    Ug = np.asarray(res.U).reshape(sp.node_shape[::-1])
    assert Ug.max() > 0.1
    np.testing.assert_allclose(Ug[0, :], 0, atol=1e-12)
    np.testing.assert_allclose(Ug[:, 0], 0, atol=1e-12)


def test_bratu_linear_limit():
    """λ=0 reduces to Laplace with zero RHS → zero solution in one step."""
    sp = make_space(2, p=2, nel=6, dtype=F64)
    res = solve_bratu(sp, lam=0.0, rtol=1e-12)
    assert float(jnp.abs(res.U).max()) < 1e-12


def test_newton_with_inhomogeneous_bc():
    """Nonlinear solve with nonzero Dirichlet: fix-value semantics drive
    boundary dofs to their values (IGAFixTable-style check)."""
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space
    from petiga_tpu.solve.newton import newton

    sp = Space([Axis.uniform(p=2, nel=6) for _ in range(2)], dtype=F64)
    for d in range(2):
        for s in range(2):
            sp.set_boundary_value(d, s, 0, 1.0)

    def residual(pt, Ue, ctx):
        # -Δu + u^3 = 1  (manufactured: u=1 is the exact solution)
        u = pt.value(Ue)[0]
        gu = pt.grad(Ue)[0]
        return pt.shape1 @ gu + (u**3 - 1.0) * pt.shape0

    U0 = jnp.zeros((sp.nnodes, 1), F64)
    res = newton(sp, residual, U0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.U), 1.0, atol=1e-10)


def test_bratu_jfnk_matches_assembled():
    """operator='jfnk' (never assembles the Jacobian — the route to
    nonlinear problems whose stencil exceeds HBM) reproduces the
    assembled Newton solve."""
    from petiga_tpu.sparse.matfree import MatFreeOperator

    sp = make_space(2, p=2, nel=6, dtype=jnp.float64)
    U0 = jnp.zeros((sp.nnodes, 1), jnp.float64)
    ra = newton(sp, bratu_residual, U0, {"lambda": 4.0}, rtol=1e-10)
    assert bool(ra.converged)
    # precondition the inner CG with the Jacobi diagonal of the linear
    # (Laplacian) part -- spectrally close to the Bratu Jacobian
    lap = MatFreeOperator(sp, c=0.0, kappa=1.0)
    dinv = 1.0 / lap.scalar_diagonal()

    def pc(U):
        return lambda r: r * dinv

    rj = newton(
        sp, bratu_residual, U0, {"lambda": 4.0}, rtol=1e-10,
        operator="jfnk", jfnk_pc=pc,
    )
    assert bool(rj.converged)
    np.testing.assert_allclose(
        np.asarray(rj.U), np.asarray(ra.U), atol=1e-8
    )
