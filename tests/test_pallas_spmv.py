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
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space(
        [Axis.uniform(p=2, nel=4, periodic=periodic) for _ in range(3)],
        dtype=F64,
    )
    A, _ = assemble_system(sp, mass, apply_fix=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    y_ref = A.matvec(x)
    op = PallasStencilOperator(A, interpret=True)
    assert op.ok, "periodic axes must run through the kernel, not fall back"
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(y_ref), atol=1e-12
    )


@pytest.mark.parametrize("periodic", [(True, False), (False, True)])
def test_pallas_spmv_mixed_periodic(periodic):
    """Mixed periodic/open axes on the extended-grid packing (2D)."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space(
        [Axis.uniform(p=2, nel=7, periodic=per) for per in periodic],
        dtype=F64,
    )
    A, _ = assemble_system(sp, mass, apply_fix=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    op = PallasStencilOperator(A, interpret=True)
    assert op.ok
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


def test_pallas_spmv_periodic_dof2():
    """Periodic C¹ dof=2 — the CahnHilliard/PhaseFieldCrystal layout."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space(
        [Axis.uniform(p=2, nel=6, periodic=True) for _ in range(2)],
        dof=2,
        dtype=F64,
    )
    A, _ = assemble_system(sp, _block_form(2), apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    assert op.ok
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 2)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


def _block_form(dof):
    def form(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
        # nonsymmetric inter-field coupling to catch (a, b) plane swaps
        C = jnp.asarray(
            [[2.0 + a + 0.3 * b for b in range(dof)] for a in range(dof)], F64
        )
        Kd = jnp.einsum("ij,ab->iajb", K, C)
        return Kd, jnp.zeros((pt.nen, dof), F64)

    return form


@pytest.mark.parametrize("dof", [2, 3])
def test_pallas_spmv_block_dof(dof):
    """dof > 1 BSR path through the kernel itself (per-field planes)."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space([Axis.uniform(p=1, nel=5) for _ in range(3)], dof=dof, dtype=F64)
    A, _ = assemble_system(sp, _block_form(dof), apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    assert op.ok, "block path should be supported, not a fallback"
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, dof)))
    y_ref = A.matvec(x)
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(y_ref), atol=1e-12
    )
    # flat-vector calling convention round-trips too
    np.testing.assert_allclose(
        np.asarray(op.matvec(x.reshape(-1))),
        np.asarray(y_ref).reshape(-1),
        atol=1e-12,
    )


def test_pallas_spmv_oversize_dof_falls_back():
    """K·dof² beyond the VMEM streaming budget falls back to XLA."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space([Axis.uniform(p=2, nel=4) for _ in range(3)], dof=5, dtype=F64)
    A, _ = assemble_system(sp, _block_form(5), apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    assert not op.ok  # 125 * 25 planes * f64 exceeds the budget
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 5)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


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
