"""Mixed-precision iterative refinement: f32 assembled inner solve +
f64 matrix-free residual must reach the f64 solution, not the f32
rounding floor."""

import numpy as np
import jax.numpy as jnp

from petiga_tpu.models.poisson import (
    make_space,
    poisson_system,
    poisson_system_q,
    exact_solution,
)
from petiga_tpu.assembly.assemble import (
    assemble_system,
    assemble_system_planes,
    compute_error_norm,
)
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.solve.refine import (
    assemble_rhs_f64,
    clone_f64,
    refined_solve,
)
from petiga_tpu.sparse.matfree import MatFreeOperator


def test_refined_solve_reaches_f64():
    c, k = 0.3, 1.0
    sp = make_space(3, p=2, nel=10, dtype=jnp.float32)
    op, _ = assemble_system_planes(
        sp, poisson_system_q, {"c": c, "k": k}, interpret=True
    )
    sp64 = clone_f64(sp)
    A64 = MatFreeOperator(sp64, c=c, kappa=k)

    def forcing(x):
        return (c + k * 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * x))

    b64 = assemble_rhs_f64(sp64, A64, forcing)

    # f64 reference solve (assembled, same BCs)
    A_ref, b_ref = assemble_system(
        sp64, poisson_system, {"c": c, "k": k}
    )
    np.testing.assert_allclose(
        np.asarray(b64), np.asarray(b_ref), atol=1e-13
    )
    M = jacobi_preconditioner(A_ref)
    ref = cg(A_ref, b_ref, M=M, rtol=1e-13)

    x64, info = refined_solve(
        sp, op, b64, c=c, kappa=k, A64=A64, sp64=sp64,
        rtol=1e-11, rtol_inner=1e-6,
    )
    # refinement must land far below the f32 floor (~1e-6 relative)
    assert info["relative_residual"] < 1e-11, info
    diff = float(jnp.max(jnp.abs(x64 - ref.x)))
    scale = float(jnp.max(jnp.abs(ref.x)))
    assert diff / scale < 1e-9, (diff, scale, info)

    # the L2 error on the f64 clone equals the f64 discretization error
    err64 = float(compute_error_norm(sp64, x64, exact_solution, k=0))
    err_ref = float(compute_error_norm(sp64, ref.x, exact_solution, k=0))
    assert abs(err64 - err_ref) / err_ref < 1e-6
    # and the residual history contracts fast (cond*eps_32 << 1)
    assert len(info["inner_iters"]) <= 4
