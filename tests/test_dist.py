"""Distributed assembly + solve over the virtual 8-device CPU mesh:
partition invariance (the reference's IGACreate.c / mpiexec -n N test
strategy) — same matrix, rhs, and solution for every process-grid
shape, periodic included."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system, stencil_of
from petiga_tpu.parallel.dist import DistSpace
from petiga_tpu.parallel.partition import factor_grid, block_sizes
from petiga_tpu.models.poisson import poisson_system, make_space, l2_error
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

F64 = jnp.float64


def test_factor_grid():
    assert factor_grid(8, (64, 64, 64)) == (2, 2, 2)
    assert factor_grid(4, (100, 10)) == (4, 1) or factor_grid(4, (100, 10)) == (2, 2)
    # surface-minimizing: long axis gets the cut
    m = factor_grid(2, (100, 4))
    assert m == (2, 1)
    assert block_sizes(10, 3).tolist() == [4, 3, 3]
    with pytest.raises(ValueError):
        factor_grid(8, (2, 2))  # cannot place 8 over 2x2=4 max? 2x2x... dim=2: 2x4>2
    assert factor_grid(6, (6, 2)) == (6, 1) or factor_grid(6, (6, 2)) == (3, 2)


def _serial_reference(sp, ctx):
    A, b = assemble_system(sp, poisson_system, ctx)
    return A, b


@pytest.mark.parametrize("pgrid", [(1, 1), (2, 1), (1, 2), (2, 2), (4, 2)])
def test_partition_invariance_2d(pgrid):
    ndev = int(np.prod(pgrid))
    sp = make_space(2, p=2, nel=9, dtype=F64)  # 11x11 nodes, uneven blocks
    ctx = {"c": 0.0, "k": 1.0}
    ds = DistSpace(sp, devices=jax.devices()[:ndev], pgrid=pgrid)
    data, b = ds.assemble_system(poisson_system, ctx)

    A_ref, b_ref = _serial_reference(sp, ctx)
    # compare cropped distributed arrays vs serial
    b_dist = np.asarray(ds.crop_flat(b))
    np.testing.assert_allclose(b_dist, np.asarray(b_ref), atol=1e-12)
    st = stencil_of(sp)
    dof = sp.dof
    data_flat = np.asarray(ds.crop_flat(
        data.reshape(tuple(ds.Np[::-1]) + (st.K * dof * dof,))
    )).reshape(sp.nnodes, st.K, dof, dof)
    np.testing.assert_allclose(data_flat, np.asarray(A_ref.data), atol=1e-12)

    # distributed solve matches serial solve
    x, k, res = ds.cg(data, b, rtol=1e-12)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-9
    )


def test_partition_invariance_periodic():
    """Periodic axis partitioned across devices: halo wrap pairs."""
    sp = Space(
        [Axis.uniform(p=2, nel=8, periodic=True), Axis.uniform(p=2, nel=8)],
        dtype=F64,
    )
    sp.set_boundary_value(1, 0, 0, 0.0)
    sp.set_boundary_value(1, 1, 0, 0.0)

    def system(pt, ctx):
        f = 5 * jnp.pi**2 * jnp.sin(2 * jnp.pi * pt.x[0]) * jnp.sin(jnp.pi * pt.x[1])
        return pt.shape1 @ pt.shape1.T, f * pt.shape0

    A_ref, b_ref = assemble_system(sp, system)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(4, 1))
    data, b = ds.assemble_system(system)
    st = stencil_of(sp)
    data_flat = np.asarray(ds.crop_flat(
        data.reshape(tuple(ds.Np[::-1]) + (st.K,))
    )).reshape(sp.nnodes, st.K)
    np.testing.assert_allclose(
        data_flat, np.asarray(A_ref.data).reshape(sp.nnodes, st.K), atol=1e-12
    )
    x, k, res = ds.cg(data, b, rtol=1e-12)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-9
    )


def test_distributed_3d_solve_accuracy():
    sp = make_space(3, p=2, nel=6, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:8], pgrid=(2, 2, 2))
    U, info = ds.solve_system(poisson_system, {"c": 0.0, "k": 1.0}, rtol=1e-11)
    err = l2_error(sp, U)
    assert err < 2e-3, err
    assert info["iters"] > 0


def test_distributed_newton_bratu():
    """Distributed residual/Jacobian/Newton matches the serial solve."""
    from petiga_tpu.models.bratu import bratu_residual, make_space, solve_bratu

    sp_serial = make_space(2, p=2, nel=8, dtype=F64)
    ref = solve_bratu(sp_serial, lam=5.0, rtol=1e-10)

    sp = make_space(2, p=2, nel=8, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    U, info = ds.newton(bratu_residual, jnp.zeros((sp.nnodes, 1), F64),
                        {"lambda": 5.0}, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref.U), atol=1e-8)


def test_distributed_function_matches_serial():
    from petiga_tpu.models.bratu import bratu_residual, make_space
    from petiga_tpu.assembly.assemble import assemble_function

    sp = make_space(2, p=2, nel=9, dtype=F64)
    rng = np.random.default_rng(7)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp.nnodes, 1)))
    ctx = {"lambda": 2.0}
    F_ref = assemble_function(sp, bratu_residual, U, ctx)
    ds = DistSpace(sp, devices=jax.devices()[:8], pgrid=(4, 2))
    F = ds.assemble_function(bratu_residual, ds.pad_grid(U), ctx)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(F)), np.asarray(F_ref), atol=1e-12
    )


def test_distributed_alpha_matches_serial():
    """Distributed generalized-α step equals the serial AlphaStepper
    (transient partition invariance — the TS analog of IGACreate.c)."""
    from petiga_tpu.models.bratu import bratu_ifunction, make_space
    from petiga_tpu.parallel.dist import DistAlphaStepper
    from petiga_tpu.solve.ts import AlphaStepper

    ctx = {"lambda": 1.0}
    sp_s = make_space(2, p=2, nel=7, dtype=F64)
    ser = AlphaStepper(sp_s, bratu_ifunction, rho_inf=0.5, ctx=ctx,
                       newton_kw={"rtol": 1e-12})
    U0 = jnp.zeros((sp_s.nnodes, 1), F64)
    V0 = ser.initial_velocity(U0, 0.0)
    U1s, V1s, _ = ser.step(U0, V0, 0.0, 1e-2)
    U2s, V2s, _ = ser.step(U1s, V1s, 1e-2, 1e-2)

    sp = make_space(2, p=2, nel=7, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    dst = DistAlphaStepper(ds, bratu_ifunction, rho_inf=0.5, ctx=ctx,
                           newton_kw={"rtol": 1e-12, "linear_rtol": 1e-12})
    U1, V1, info = dst.step(U0, np.asarray(V0), 0.0, 1e-2)
    U2, V2, _ = dst.step(U1, V1, 1e-2, 1e-2)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U2s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V2s), atol=1e-6)


def test_distributed_theta_matches_serial():
    from petiga_tpu.models.bratu import bratu_ifunction, make_space
    from petiga_tpu.parallel.dist import DistThetaStepper
    from petiga_tpu.solve.ts import ThetaStepper

    ctx = {"lambda": 1.0}
    sp_s = make_space(2, p=2, nel=6, dtype=F64)
    ser = ThetaStepper(sp_s, bratu_ifunction, theta=0.5, ctx=ctx,
                       newton_kw={"rtol": 1e-12})
    U0 = jnp.zeros((sp_s.nnodes, 1), F64)
    U1s, _ = ser.step(U0, 0.0, 5e-3)

    sp = make_space(2, p=2, nel=6, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:8], pgrid=(4, 2))
    dst = DistThetaStepper(ds, bratu_ifunction, theta=0.5, ctx=ctx,
                           newton_kw={"rtol": 1e-12, "linear_rtol": 1e-12})
    U1, info = dst.step(U0, 0.0, 5e-3)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U1s), atol=1e-8)
