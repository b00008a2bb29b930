"""Pallas stencil SpMV (interpreter mode on CPU) vs the XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.sparse.pallas_spmv import pallas_matvec

F64 = jnp.float64


def mass(pt, ctx):
    return jnp.outer(pt.shape0, pt.shape0), pt.shape0 * 1.0


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_spmv_matches_xla(periodic):
    sp = Space(
        [Axis.uniform(p=2, nel=4, periodic=periodic) for _ in range(3)],
        dtype=F64,
    )
    A, _ = assemble_system(sp, mass, apply_fix=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    y_ref = A.matvec(x)
    y = pallas_matvec(A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-12)


def test_pallas_spmv_dof2_fallback():
    sp = Space([Axis.uniform(p=1, nel=5) for _ in range(3)], dof=2, dtype=F64)

    def form(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0)
        Kd = jnp.zeros((pt.nen, 2, pt.nen, 2), F64)
        Kd = Kd.at[:, 0, :, 0].set(2 * K).at[:, 1, :, 1].set(K)
        Kd = Kd.at[:, 0, :, 1].set(0.3 * K).at[:, 1, :, 0].set(0.3 * K)
        return Kd, jnp.zeros((pt.nen, 2), F64)

    A, _ = assemble_system(sp, form, apply_fix=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 2)))
    y_ref = A.matvec(x)
    y = pallas_matvec(A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-12)


def test_pallas_spmv_multichunk():
    """nnodes > ROWS*LANES exercises the grid streaming + guard rows."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space([Axis.uniform(p=2, nel=24) for _ in range(3)], dtype=F64)
    A, _ = assemble_system(sp, mass, apply_fix=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    op = PallasStencilOperator(A, interpret=True)
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
