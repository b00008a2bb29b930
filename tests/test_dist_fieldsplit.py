"""Distributed fieldsplit preconditioning (parallel -pc_type fieldsplit
role): per-field sub-blocks of the distributed stencil with full halo
semantics, additive and multiplicative, stationary and inner-Krylov."""

import numpy as np
import jax
import jax.numpy as jnp

from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.models.elasticity import elasticity_system
from petiga_tpu.models.elasticity import make_space as make_el
from petiga_tpu.parallel.dist import DistSpace
from petiga_tpu.solve.fieldsplit import fieldsplit_local_preconditioner
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

F64 = jnp.float64

CTX = {"lambda": 1.0, "mu": 1.0,
       "body_force": lambda x: jnp.asarray([0.5, -1.0])}


def _setup():
    sp_s = make_el(2, p=2, nel=6, dtype=F64)
    A_ref, b_ref = assemble_system(sp_s, elasticity_system, CTX)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x
    sp = make_el(2, p=2, nel=6, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(elasticity_system, CTX)
    return ds, data, b, x_ref


def test_dist_fieldsplit_additive_cg():
    ds, data, b, x_ref = _setup()
    pc = fieldsplit_local_preconditioner(kind="additive", inner="jacobi")
    x, k, res = ds.cg(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )


def test_dist_fieldsplit_inner_cg_gmres():
    ds, data, b, x_ref = _setup()
    pc = fieldsplit_local_preconditioner(inner="cg", inner_iters=5)
    x, k, res = ds.gmres(data, b, rtol=1e-11, restart=20, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-7
    )


def test_dist_fieldsplit_multiplicative_bicgstab():
    ds, data, b, x_ref = _setup()
    pc = fieldsplit_local_preconditioner(kind="multiplicative",
                                         inner="jacobi")
    x, k, res = ds.bicgstab(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )
