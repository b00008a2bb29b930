"""Field-split preconditioners (the PCFIELDSPLIT analog of
DMCreateFieldDecomposition_IGA, petigadm.c:294-383)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.solve.krylov import bicgstab, cg, jacobi_preconditioner
from petiga_tpu.solve.fieldsplit import field_split, fieldsplit_preconditioner

F64 = jnp.float64


def _elastic_system():
    from petiga_tpu.models.elasticity import elasticity_system, make_space

    sp = make_space(2, p=2, nel=6, dtype=F64)
    ctx = {"lambda": 1.0, "mu": 1.0,
           "body_force": lambda x: jnp.array([0.0, -1.0])}

    def system(pt, c):
        K, F = elasticity_system(pt, c)
        return K, F

    A, b = assemble_system(sp, system, ctx)
    return sp, A, b


def test_field_split_blocks_reassemble():
    """Diagonal sub-operators agree with the full operator applied to
    single-field vectors with the other fields zeroed."""
    sp, A, b = _elastic_system()
    subs = field_split(A)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, sp.dof)))
    for f, sub in enumerate(subs):
        xf = jnp.zeros_like(x).at[:, f].set(x[:, f])
        yf = A.matvec(xf)[:, f]
        ys = sub.matvec(x[:, f : f + 1])[:, 0]
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yf), atol=1e-12)


@pytest.mark.parametrize("kind", ["additive", "multiplicative"])
def test_fieldsplit_pc_converges(kind):
    sp, A, b = _elastic_system()
    M = fieldsplit_preconditioner(A, kind=kind)
    solver = cg if kind == "additive" else bicgstab
    res = solver(A, b, M=M, rtol=1e-10, maxiter=4000)
    ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10, maxiter=4000)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), atol=1e-7
    )


def test_fieldsplit_groups():
    """Grouped splitting (fields (0,1) + (2,)) on a dof=3 operator."""
    from petiga_tpu.models.elasticity import elasticity_system, make_space

    sp = make_space(3, p=1, nel=4, dtype=F64)
    ctx = {"lambda": 1.0, "mu": 1.0,
           "body_force": lambda x: jnp.array([0.0, 0.0, -1.0])}
    A, b = assemble_system(sp, elasticity_system, ctx)
    M = fieldsplit_preconditioner(A, groups=[(0, 1), (2,)])
    res = cg(A, b, M=M, rtol=1e-9, maxiter=4000)
    ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-9, maxiter=4000)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-6)
