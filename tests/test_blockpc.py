"""EBE / BBB preconditioners: SPD application, CG acceleration vs
Jacobi (PCIGAEBE/PCIGABBB analogs)."""

import numpy as np
import jax.numpy as jnp

from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.assembly.assemble import assemble_system, stencil_of, _chunks
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.solve.blockpc import bbb_preconditioner, ebe_preconditioner

F64 = jnp.float64


def _element_blocks(sp, ctx):
    """Assemble per-element fixed blocks (the EBE input)."""
    import jax
    from petiga_tpu.assembly.assemble import (
        _fix_arrays,
        _fix_system,
        _normalize_F,
        _normalize_K,
        _scan_points,
    )
    from petiga_tpu.assembly.tabulation import tabulate_elements

    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=1)
    nen, dof, dt = sp.nen, sp.dof, sp.dtype

    def body(acc, pt, w):
        K, F = jax.vmap(lambda p: poisson_system(p, ctx))(pt)
        K = jax.vmap(lambda k: _normalize_K(k, nen, dof, dt))(K)
        return acc + w[:, None, None] * K

    Ke = _scan_points(pb, body, jnp.zeros((sp.nel, nen * dof, nen * dof), dt))
    emap = sp.device("mapping")[ids]
    m, v = _fix_arrays(sp, emap)
    Ke, _ = _fix_system(Ke, jnp.zeros((sp.nel, nen * dof), dt), m, v)
    return Ke


def test_ebe_converges():
    """EBE is a weak (Jacobi-class) PC; correctness + bounded iterations
    is the contract (the reference uses it mainly matrix-free)."""
    sp = make_space(2, p=2, nel=12, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}
    A, b = assemble_system(sp, poisson_system, ctx)
    it_jac = int(cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10).iters)
    Ke = _element_blocks(sp, ctx)
    M = ebe_preconditioner(sp, Ke)
    res = cg(A, b, M=M, rtol=1e-10)
    assert int(res.iters) <= 3 * it_jac
    # solution matches
    x_ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-12).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-8)


def test_bbb_accelerates_bicgstab():
    """BBB is an (unsymmetric) approximate inverse: pair it with
    BiCGStab; it cuts iterations well below Jacobi-CG."""
    from petiga_tpu.solve.krylov import bicgstab

    sp = make_space(2, p=2, nel=12, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}
    A, b = assemble_system(sp, poisson_system, ctx)
    it_jac = int(cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10).iters)
    M = bbb_preconditioner(A, overlap=2)
    res = bicgstab(A, b, M=M, rtol=1e-10)
    assert int(res.iters) < it_jac, (int(res.iters), it_jac)
    x_ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-12).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-8)


def test_bbb_periodic():
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space

    sp = Space([Axis.uniform(p=2, nel=8, periodic=True)] * 2, dtype=F64)

    def sys(pt, ctx):
        K = pt.shape1 @ pt.shape1.T + 0.1 * jnp.outer(pt.shape0, pt.shape0)
        f = jnp.sin(2 * jnp.pi * pt.x[0]) * jnp.cos(2 * jnp.pi * pt.x[1])
        return K, f * pt.shape0

    A, b = assemble_system(sp, sys)
    M = bbb_preconditioner(A, overlap=1)
    res = cg(A, b, M=M, rtol=1e-10)
    x_ref = cg(A, b, rtol=1e-12).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-7)
