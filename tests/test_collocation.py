"""Collocation method: Poisson rates (≈p for even p, ≈p-1 for odd,
ConvTest.py:95-98) and nonlinear collocation (Bratu)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.collocation import (
    assemble_collocation,
    assemble_collocation_function,
    assemble_collocation_jacobian,
)
from petiga_tpu.assembly.assemble import compute_error_norm
from petiga_tpu.solve.krylov import bicgstab, jacobi_preconditioner

F64 = jnp.float64


def make_colloc_space(dim, p, nel):
    sp = Space(
        [Axis.uniform(p=p, nel=nel) for _ in range(dim)],
        collocation=True,
        dtype=F64,
    )
    for d in range(dim):
        for s in range(2):
            sp.set_boundary_value(d, s, 0, 0.0)
    return sp


def laplace_colloc(pt, ctx):
    """-Δu = f at the collocation point (Poisson.c:33-46)."""
    dim = pt.dim
    f = dim * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * pt.x))
    lapN = jnp.trace(pt.shape2, axis1=-2, axis2=-1)
    return -lapN[None, :], jnp.asarray([f])


def solve_colloc(sp):
    A, b = assemble_collocation(sp, laplace_colloc)
    res = bicgstab(A, b, M=jacobi_preconditioner(A), rtol=1e-12, maxiter=3000)
    return res.x


@pytest.mark.parametrize("dim,p", [(1, 2), (1, 3), (2, 2)])
def test_collocation_rates(dim, p):
    nels = (8, 16) if dim == 2 else (16, 32)
    errs = []
    for nel in nels:
        sp = make_colloc_space(dim, p, nel)
        U = solve_colloc(sp)
        exact = lambda x: jnp.asarray([jnp.prod(jnp.sin(jnp.pi * x))])
        # error norm via a Galerkin (quadrature) space clone
        spg = Space([Axis.uniform(p=p, nel=nel) for _ in range(dim)], dtype=F64)
        errs.append(float(compute_error_norm(spg, U, exact, k=0)))
    rate = np.log2(errs[0] / errs[1])
    expect = p if p % 2 == 0 else p - 1
    assert abs(rate - expect) < 0.35, (rate, errs)


def test_collocation_bratu():
    """Nonlinear collocation: -Δu - λ e^u = 0 (BratuFJ.F90:48-50)."""
    from petiga_tpu.models.bratu import bratu_collocation_residual

    sp = make_colloc_space(2, 2, 12)
    ctx = {"lambda": 4.0}
    U = jnp.zeros((sp.nnodes, 1), F64)
    for it in range(30):
        F = assemble_collocation_function(
            sp, bratu_collocation_residual, U, ctx
        )
        fnorm = float(jnp.linalg.norm(F))
        if fnorm < 1e-10:
            break
        J = assemble_collocation_jacobian(
            sp, bratu_collocation_residual, U, ctx
        )
        dU = bicgstab(J, F, M=jacobi_preconditioner(J), rtol=1e-10).x
        U = U - dU
    assert fnorm < 1e-10, fnorm
    # boundary rows honored
    mask, vals = sp.dirichlet_mask()
    np.testing.assert_allclose(np.asarray(U)[mask], 0.0, atol=1e-10)
    assert float(U.max()) > 0.05


def test_distributed_collocation_matches_serial():
    """Distributed collocation (per-device point evaluation; rows are
    point-local so no reverse halo) == serial assembly + solve — the
    reference's MPI collocation mode (petiga.c:1211-1274,
    demo/makefile:184-188)."""
    import jax
    from petiga_tpu.parallel.dist import DistSpace
    from petiga_tpu.solve.krylov import gmres, jacobi_preconditioner

    def colloc_space():
        sp = Space(
            [Axis.uniform(p=2, nel=9) for _ in range(2)],
            collocation=True, dtype=F64,
        )
        for d in range(2):
            for s in range(2):
                sp.set_boundary_value(d, s, 0, 0.0)
        return sp

    def poisson_colloc(pt, ctx):
        lap = -jnp.trace(pt.shape2, axis1=-2, axis2=-1)
        f = 2 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * pt.x))
        return lap, f * jnp.ones(())

    sp_s = colloc_space()
    A_s, F_s = assemble_collocation(sp_s, poisson_colloc)
    rs = gmres(A_s, F_s.reshape(-1, 1), M=jacobi_preconditioner(A_s),
               rtol=1e-10)
    for pg in [(2, 1), (2, 2)]:
        sp = colloc_space()
        ds = DistSpace(sp, devices=jax.devices()[: int(np.prod(pg))],
                       pgrid=pg, use_pallas=False)
        data, F = ds.assemble_collocation(poisson_colloc)
        dloc = np.asarray(
            ds.crop_flat(
                data.reshape(tuple(ds.Np[::-1]) + (ds.st.K,))
            )
        ).reshape(sp.nnodes, ds.st.K, 1, 1)
        np.testing.assert_allclose(dloc, np.asarray(A_s.data), atol=1e-13)
        x, info = ds.solve_collocation(poisson_colloc, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(rs.x).reshape(-1, 1), atol=1e-9
        )
