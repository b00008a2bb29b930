"""Round-2 distributed parity: boundary forms, functionals, BiCGStab,
overlapped matvec, and the single-program Newton — each checked against
the serial path (the reference's mpiexec-partition-invariance strategy,
test/makefile:20-56)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petiga_tpu.assembly.assemble import (
    assemble_function,
    assemble_jacobian,
    assemble_system,
    compute_error_norm,
    compute_scalar,
    stencil_of,
)
from petiga_tpu.models.boundary import make_open_space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.parallel.dist import DistSpace
from petiga_tpu.solve.krylov import bicgstab, cg, jacobi_preconditioner

F64 = jnp.float64


def _exact(x):
    return jnp.asarray([jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])])


def _forcing(x):
    return 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])


def _nitsche_forms(sp):
    p = max(sp.degrees)
    alpha = 5.0 * (p + 1) * max(sp.elem_shape)

    def interior(pt, ctx):
        return pt.shape1 @ pt.shape1.T, _forcing(pt.x) * pt.shape0

    def bnd(pt, ctx):
        g = _exact(pt.x)[0]
        dn = pt.shape1 @ pt.normal
        K = (
            -jnp.outer(pt.shape0, dn)
            - jnp.outer(dn, pt.shape0)
            + alpha * jnp.outer(pt.shape0, pt.shape0)
        )
        F = -dn * g + alpha * pt.shape0 * g
        return K, F

    return interior, bnd


def _crop_data(ds, data):
    sp = ds.space
    st = ds.st
    dof = sp.dof
    return np.asarray(
        ds.crop_flat(data.reshape(tuple(ds.Np[::-1]) + (st.K * dof * dof,)))
    ).reshape(sp.nnodes, st.K, dof, dof)


@pytest.mark.parametrize("pgrid", [(2, 2), (4, 1)])
def test_dist_boundary_system_nitsche(pgrid):
    """Distributed Nitsche (system boundary form) == serial assembly,
    and the distributed solve converges to the weak solution."""
    sp_s = make_open_space(2, p=2, nel=9, dtype=F64)
    interior, bnd = _nitsche_forms(sp_s)
    A_ref, b_ref = assemble_system(sp_s, interior, boundary=bnd,
                                   apply_fix=False)

    sp = make_open_space(2, p=2, nel=9, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[: int(np.prod(pgrid))],
                   pgrid=pgrid)
    data, b = ds.assemble_system(interior, boundary=bnd, apply_fix=False)
    np.testing.assert_allclose(
        _crop_data(ds, data), np.asarray(A_ref.data), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(b)), np.asarray(b_ref), atol=1e-11
    )
    x, k, res = ds.cg(data, b, rtol=1e-12)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )


def test_dist_boundary_function_jacobian():
    """Nonlinear residual + boundary form: distributed
    assemble_function/assemble_jacobian == serial (Nitsche-type face
    terms under domain decomposition, petigaelem.c:427-447)."""
    def residual(pt, Ue, ctx):
        u = pt.value(Ue)[0]
        gu = pt.grad(Ue)[0]
        return pt.shape1 @ gu + pt.shape0 * (u * u - _forcing(pt.x))

    alpha = 40.0

    def bnd_residual(pt, Ue, ctx):
        u = pt.value(Ue)[0]
        g = _exact(pt.x)[0]
        dn = pt.shape1 @ pt.normal
        gun = pt.grad(Ue)[0] @ pt.normal
        return (
            -pt.shape0 * gun - dn * (u - g) + alpha * pt.shape0 * (u - g)
        )

    sp_s = make_open_space(2, p=2, nel=7, dtype=F64)
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp_s.nnodes, 1)))
    F_ref = assemble_function(sp_s, residual, U, boundary=bnd_residual)
    J_ref = assemble_jacobian(sp_s, residual, U, boundary=bnd_residual)

    sp = make_open_space(2, p=2, nel=7, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    F = ds.assemble_function(residual, ds.pad_grid(U),
                             boundary=bnd_residual)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(F)), np.asarray(F_ref), atol=1e-11
    )
    data = ds.assemble_jacobian(residual, ds.pad_grid(U),
                                boundary=bnd_residual)
    np.testing.assert_allclose(
        _crop_data(ds, data), np.asarray(J_ref.data), atol=1e-11
    )

    # whole-program distributed Newton with boundary forms
    U0 = jnp.zeros((sp.nnodes, 1), F64)
    Un, info = ds.newton(residual, U0, rtol=1e-11, boundary=bnd_residual)
    from petiga_tpu.solve.newton import newton as serial_newton

    ref = serial_newton(sp_s, residual, U0, rtol=1e-11,
                        boundary=bnd_residual)
    np.testing.assert_allclose(np.asarray(Un), np.asarray(ref.U), atol=1e-8)


def test_dist_compute_scalar_and_error_norm():
    """psum functionals == serial quadrature sums (the MPI_Allreduce of
    petigacomp.c:84) — the CahnHilliard energy-monitor mechanism."""
    sp = make_space(2, p=2, nel=9, dtype=F64)
    rng = np.random.default_rng(11)
    U = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))

    def energy(pt, Ue, ctx):
        u = pt.value(Ue)[0]
        gu = pt.grad(Ue)[0]
        return jnp.asarray([0.5 * (gu @ gu), 0.25 * u**4])

    ref = np.asarray(compute_scalar(sp, energy, U))
    ds = DistSpace(sp, devices=jax.devices()[:8], pgrid=(4, 2))
    val = np.asarray(ds.compute_scalar(energy, ds.pad_grid(U)))
    np.testing.assert_allclose(val, ref, rtol=1e-12)

    err_ref = float(compute_error_norm(sp, U, _exact, k=0))
    err = float(ds.compute_error_norm(ds.pad_grid(U), _exact, k=0))
    np.testing.assert_allclose(err, err_ref, rtol=1e-12)


def test_dist_bicgstab_advection():
    """Nonsymmetric operator (advection-diffusion) solved by the
    distributed BiCGStab matches the serial solution."""
    def adv_system(pt, ctx):
        beta = jnp.asarray([1.0, 0.5])
        K = pt.shape1 @ pt.shape1.T * 0.1 + jnp.outer(
            pt.shape0, pt.shape1 @ beta
        )
        return K, pt.shape0

    sp_s = make_space(2, p=2, nel=8, dtype=F64)
    A_ref, b_ref = assemble_system(sp_s, adv_system)
    x_ref = bicgstab(A_ref, b_ref, M=jacobi_preconditioner(A_ref),
                     rtol=1e-12).x

    sp = make_space(2, p=2, nel=8, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(adv_system)
    x, k, res = ds.bicgstab(data, b, rtol=1e-12)
    assert int(k) > 0
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )


def test_dist_gmres_advection():
    """Distributed restarted GMRES (general nonsymmetric solver) matches
    the serial solution and partitions invariantly."""
    from petiga_tpu.solve.krylov import gmres

    def adv_system(pt, ctx):
        beta = jnp.asarray([1.0, 0.5])
        K = pt.shape1 @ pt.shape1.T * 0.1 + jnp.outer(
            pt.shape0, pt.shape1 @ beta
        )
        return K, pt.shape0

    sp_s = make_space(2, p=2, nel=8, dtype=F64)
    A_ref, b_ref = assemble_system(sp_s, adv_system)
    x_ref = gmres(A_ref, b_ref, M=jacobi_preconditioner(A_ref),
                  rtol=1e-12, restart=20).x

    for pgrid in [(2, 2), (4, 1)]:
        sp = make_space(2, p=2, nel=8, dtype=F64)
        ds = DistSpace(sp, devices=jax.devices()[: int(np.prod(pgrid))],
                       pgrid=pgrid)
        data, b = ds.assemble_system(adv_system)
        x, k, res = ds.gmres(data, b, rtol=1e-12, restart=20)
        assert int(k) > 0
        np.testing.assert_allclose(
            np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
        )


def test_dist_pbjacobi_elasticity():
    """Point-block-Jacobi PC on a dof=3 elasticity system: the
    distributed CG matches serial and needs no more iterations than
    scalar Jacobi."""
    from petiga_tpu.models.elasticity import elasticity_system
    from petiga_tpu.models.elasticity import make_space as make_el
    from petiga_tpu.solve.krylov import block_jacobi_preconditioner

    sp_s = make_el(2, p=2, nel=6, dtype=F64)
    ctx = {"lambda": 1.0, "mu": 1.0,
           "body_force": lambda x: jnp.asarray([0.0, -1.0])}
    A_ref, b_ref = assemble_system(sp_s, elasticity_system, ctx)
    x_ref = cg(A_ref, b_ref, M=block_jacobi_preconditioner(A_ref),
               rtol=1e-12).x

    sp = make_el(2, p=2, nel=6, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(elasticity_system, ctx)
    x_pb, k_pb, _ = ds.cg(data, b, rtol=1e-12, pc="pbjacobi")
    x_j, k_j, _ = ds.cg(data, b, rtol=1e-12, pc="jacobi")
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x_pb)), np.asarray(x_ref), atol=1e-8
    )
    assert int(k_pb) <= int(k_j)


@pytest.mark.parametrize("pgrid,nel,periodic", [
    ((2, 2), 9, False),   # overlap path (L >= 2p)
    ((4, 1), 8, True),    # thin blocks on axis 0 -> auto fallback
])
def test_dist_matvec_overlap_equivalence(pgrid, nel, periodic):
    """Interior/frame-split matvec (comm/compute overlap) == plain
    exchange-then-compute == serial matvec."""
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space
    from petiga_tpu.sparse.stencil import StencilMatrix

    sp = Space(
        [Axis.uniform(p=2, nel=nel, periodic=periodic) for _ in range(2)],
        dtype=F64,
    )
    if not periodic:
        sp.set_boundary_value(0, 0, 0, 0.0)
    A_ref, _ = assemble_system(sp, poisson_system, {"c": 0.3, "k": 1.0})
    ndev = int(np.prod(pgrid))
    ds = DistSpace(sp, devices=jax.devices()[:ndev], pgrid=pgrid)
    data, _ = ds.assemble_system(poisson_system, {"c": 0.3, "k": 1.0})
    rng = np.random.default_rng(5)
    x = rng.normal(size=(sp.nnodes, 1))
    xg = ds.pad_grid(jnp.asarray(x))

    def region(d_loc, x_loc):
        return (
            ds.matvec_local(d_loc, x_loc, overlap=True),
            ds.matvec_local(d_loc, x_loc, overlap=False),
        )

    from jax.sharding import PartitionSpec as P

    shard = jax.shard_map(
        region,
        mesh=ds.mesh,
        in_specs=(ds.grid_spec(3), ds.grid_spec(1)),
        out_specs=(ds.grid_spec(1), ds.grid_spec(1)),
        check_vma=False,
    )
    y1, y2 = shard(data, xg)
    y_ref = np.asarray(A_ref.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(y1)), y_ref, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(y2)), y_ref, atol=1e-12
    )


def test_dist_pallas_matvec_and_cg_parity():
    """The per-device Pallas kernel path (local_pallas_planes +
    matvec_local(DT_loc=...)) matches the XLA slot-loop path through the
    same shard_map solvers — VERDICT r2 item 2: without this every
    distributed solve rides the 0.5%-roofline XLA path."""
    import jax
    from petiga_tpu.models.poisson import make_space, poisson_system
    from petiga_tpu.parallel.dist import DistSpace

    sp_r = make_space(2, p=1, nel=8, dtype=jnp.float64)
    sp_p = make_space(2, p=1, nel=8, dtype=jnp.float64)
    ds_ref = DistSpace(sp_r, pgrid=(2, 2), use_pallas=False)
    ds_pal = DistSpace(sp_p, pgrid=(2, 2), use_pallas=True)
    assert ds_pal._pk is not None
    A_p, b_p = ds_pal.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})
    A_r, b_r = ds_ref.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})

    def mv(ds, overlap):
        def body(data_loc, x_loc):
            dof = ds.space.dof
            dl = data_loc.reshape(tuple(ds.L[::-1]) + (ds.st.K, dof, dof))
            xl = x_loc.reshape(tuple(ds.L[::-1]) + (dof,))
            DT = ds.local_pallas_planes(dl)
            return ds.matvec_local(dl, xl, overlap=overlap, DT_loc=DT)

        return jax.shard_map(
            body,
            mesh=ds.mesh,
            in_specs=(ds.grid_spec(3), ds.grid_spec(1)),
            out_specs=ds.grid_spec(1),
            check_vma=False,
        )

    rng = np.random.default_rng(0)
    x = ds_pal.pad_grid(jnp.asarray(rng.normal(size=(sp_p.nnodes, 1))))
    for ov in (False, True):
        y_pal = mv(ds_pal, ov)(A_p, x)
        y_ref = mv(ds_ref, ov)(A_r, x)
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), atol=1e-12
        )

    xs, it, res = ds_pal.cg(A_p, b_p, rtol=1e-9)
    xr, it2, _ = ds_ref.cg(A_r, b_r, rtol=1e-9)
    assert int(it) == int(it2)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xr), atol=1e-10)
