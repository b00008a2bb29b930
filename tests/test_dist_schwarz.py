"""Distributed two-level Schwarz preconditioner: correctness against
the serial solve, iteration-count advantage over point Jacobi, and
partition invariance incl. periodic axes (the role PCBDDC plays under
MPI in the reference, petigapcbddc.c)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.parallel.dist import DistSpace
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.solve.schwarz import (
    schwarz_local_preconditioner,
    schwarz_preconditioner,
)

F64 = jnp.float64


@pytest.mark.parametrize("pgrid", [(2, 2), (4, 1)])
def test_dist_schwarz_cg_matches_serial(pgrid):
    sp_s = make_space(2, p=2, nel=16, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}
    A_ref, b_ref = assemble_system(sp_s, poisson_system, ctx)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x

    ndev = int(np.prod(pgrid))
    sp = make_space(2, p=2, nel=16, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:ndev], pgrid=pgrid)
    data, b = ds.assemble_system(poisson_system, ctx)

    # one subdomain per device (classic DD) + the constants coarse space
    pc = schwarz_local_preconditioner(subdomains=(1, 1))
    x, k_sz, res = ds.cg(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )
    _, k_j, _ = ds.cg(data, b, rtol=1e-12, pc="jacobi")
    assert int(k_sz) < int(k_j)


def test_dist_schwarz_periodic():
    sp = Space(
        [Axis.uniform(p=2, nel=12, periodic=True) for _ in range(2)],
        dtype=F64,
    )
    ctx = {"c": 1.0, "k": 1.0}  # reaction term keeps the operator SPD
    A_ref, b_ref = assemble_system(sp, poisson_system, ctx)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x

    sp2 = Space(
        [Axis.uniform(p=2, nel=12, periodic=True) for _ in range(2)],
        dtype=F64,
    )
    ds = DistSpace(sp2, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(poisson_system, ctx)
    pc = schwarz_local_preconditioner(subdomains=(2, 2))
    x, k, res = ds.cg(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )


def test_dist_schwarz_ras_bicgstab():
    """Restricted (RAS) variant paired with BiCGStab on a nonsymmetric
    advection-diffusion operator."""
    def adv_system(pt, ctx):
        beta = jnp.asarray([1.0, 0.5])
        K = pt.shape1 @ pt.shape1.T * 0.2 + jnp.outer(
            pt.shape0, pt.shape1 @ beta
        )
        return K, pt.shape0

    sp_s = make_space(2, p=2, nel=10, dtype=F64)
    from petiga_tpu.solve.krylov import bicgstab

    A_ref, b_ref = assemble_system(sp_s, adv_system)
    x_ref = bicgstab(A_ref, b_ref, M=jacobi_preconditioner(A_ref),
                     rtol=1e-12).x

    sp = make_space(2, p=2, nel=10, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(adv_system)
    pc = schwarz_local_preconditioner(
        subdomains=(2, 2), restricted=True, coarse=False
    )
    x, k, res = ds.bicgstab(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-7
    )


def test_dist_schwarz_rigid_body_coarse():
    """Distributed mode-weighted coarse level (rigid-body modes):
    partition-invariant iteration counts and the same solution as the
    serial RBM-coarse solve."""
    from petiga_tpu.models.elasticity import (
        elasticity_system,
        make_space as make_el,
        rigid_body_modes,
    )
    from petiga_tpu.solve.krylov import cg as scg

    ctx = {"lambda": 2.0, "mu": 1.0,
           "body_force": lambda x: jnp.sin(jnp.pi * x)}
    sp_s = make_el(2, p=2, nel=12, dtype=F64)
    A_s, b_s = assemble_system(sp_s, elasticity_system, ctx)
    rbm_s = rigid_body_modes(sp_s)
    M = schwarz_preconditioner(A_s, subdomains=(4, 4), coarse_modes=rbm_s)
    rs = scg(A_s, b_s, M=M, rtol=1e-8)

    iters = {}
    for ndev, pg in [(1, (1, 1)), (4, (2, 2))]:
        sp = make_el(2, p=2, nel=12, dtype=F64)
        ds = DistSpace(sp, devices=jax.devices()[:ndev], pgrid=pg,
                       use_pallas=False)
        A, b = ds.assemble_system(elasticity_system, ctx)
        pc = schwarz_local_preconditioner(
            subdomains=(2, 2), coarse_modes=rigid_body_modes(sp)
        )
        x, it, res = ds.cg(A, b, rtol=1e-8, pc=pc)
        iters[ndev] = int(it)
        np.testing.assert_allclose(
            np.asarray(ds.crop_flat(x)), np.asarray(rs.x), atol=1e-7
        )
    # 4 devices x (2,2) boxes == serial (4,4) boxes: same global PC
    assert iters[4] == int(rs.iters)
