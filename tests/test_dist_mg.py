"""Distributed multigrid preconditioner: fine-level distributed
smoothing + replicated knot-insertion coarse correction matches the
serial solve and beats Jacobi iteration counts (parallel PCMG role,
petigapcmg.c).  Kept to two compiles (the CPU-mesh shard_map programs
dominate suite time)."""

import numpy as np
import jax
import jax.numpy as jnp

from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.parallel.dist import DistSpace
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.solve.multigrid import mg_local_preconditioner

F64 = jnp.float64

CTX = {"c": 0.0, "k": 1.0}


def _assemble(s):
    A, _ = assemble_system(s, poisson_system, CTX)
    return A


def test_dist_mg_cg_matches_serial():
    sp_s = make_space(2, p=2, nel=16, dtype=F64)
    A_ref, b_ref = assemble_system(sp_s, poisson_system, CTX)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x

    sp = make_space(2, p=2, nel=16, dtype=F64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(poisson_system, CTX)

    pc = mg_local_preconditioner(_assemble, levels=2)
    x, k_mg, res = ds.cg(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )
    _, k_j, _ = ds.cg(data, b, rtol=1e-12, pc="jacobi")
    assert int(k_mg) < int(k_j)


def test_dist_mg_periodic():
    def mk():
        return Space(
            [Axis.uniform(p=2, nel=12, periodic=True) for _ in range(2)],
            dtype=F64,
        )

    ctx = {"c": 1.0, "k": 1.0}
    sp = mk()
    A_ref, b_ref = assemble_system(sp, poisson_system, ctx)
    x_ref = cg(A_ref, b_ref, M=jacobi_preconditioner(A_ref), rtol=1e-12).x

    ds = DistSpace(mk(), devices=jax.devices()[:4], pgrid=(2, 2))
    data, b = ds.assemble_system(poisson_system, ctx)

    def asm(s):
        A, _ = assemble_system(s, poisson_system, ctx)
        return A

    pc = mg_local_preconditioner(asm, levels=2)
    x, k, res = ds.cg(data, b, rtol=1e-12, pc=pc)
    np.testing.assert_allclose(
        np.asarray(ds.crop_flat(x)), np.asarray(x_ref), atol=1e-8
    )
