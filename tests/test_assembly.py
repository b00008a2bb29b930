"""Assembly + stencil operator tests: symmetry, exact small systems,
Dirichlet semantics, SpMV vs dense."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import (
    assemble_system,
    assemble_vector,
    assemble_matrix,
    stencil_of,
)
from petiga_tpu.sparse.stencil import StencilMatrix

F64 = jnp.float64


def mass_form(pt, ctx):
    K = jnp.outer(pt.shape0, pt.shape0)
    F = pt.shape0 * 1.0
    return K, F


def stiffness_form(pt, ctx):
    K = pt.shape1 @ pt.shape1.T
    return K, jnp.zeros_like(pt.shape0)


def test_mass_matrix_1d_exact():
    """p=1 mass matrix on uniform mesh = classical FEM tridiagonal."""
    sp = Space([Axis.uniform(p=1, nel=4)], dtype=F64)
    A, b = assemble_system(sp, mass_form, apply_fix=False)
    M = A.to_dense()
    h = 0.25
    expected = np.zeros((5, 5))
    for e in range(4):
        expected[e : e + 2, e : e + 2] += h * np.array([[2, 1], [1, 2]]) / 6
    np.testing.assert_allclose(M, expected, atol=1e-14)
    # RHS = integral of each basis
    np.testing.assert_allclose(
        np.asarray(b).ravel(), [h / 2, h, h, h, h / 2], atol=1e-14
    )


def test_row_sums_mass():
    """Mass-matrix row sums = integrals of basis functions; total = volume."""
    sp = Space([Axis.uniform(p=2, nel=3), Axis.uniform(p=2, nel=4)], dtype=F64)
    A, b = assemble_system(sp, mass_form, apply_fix=False)
    M = A.to_dense()
    np.testing.assert_allclose(M.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose(M.sum(axis=1), np.asarray(b).ravel(), atol=1e-13)
    # symmetry
    np.testing.assert_allclose(M, M.T, atol=1e-14)


def test_stiffness_nullspace():
    """Stiffness matrix annihilates constants; SPD on the complement."""
    sp = Space([Axis.uniform(p=2, nel=3) for _ in range(2)], dtype=F64)
    A = assemble_matrix(sp, lambda pt, c: pt.shape1 @ pt.shape1.T, apply_fix=False)
    K = A.to_dense()
    np.testing.assert_allclose(K @ np.ones(K.shape[0]), 0.0, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert w[0] > -1e-12  # PSD


@pytest.mark.parametrize("periodic", [False, True])
def test_spmv_matches_dense(periodic):
    sp = Space(
        [Axis.uniform(p=2, nel=6, periodic=periodic) for _ in range(2)],
        dtype=F64,
    )
    A, _ = assemble_system(sp, mass_form, apply_fix=False)
    M = A.to_dense()
    rng = np.random.default_rng(0)
    x = rng.normal(size=sp.nnodes)
    y1 = np.asarray(A.matvec(jnp.asarray(x)))
    y2 = M @ x
    np.testing.assert_allclose(y1, y2, atol=1e-12)


def test_spmv_dof2():
    """Vector-valued (dof=2) block SpMV vs dense."""
    sp = Space([Axis.uniform(p=2, nel=4) for _ in range(2)], dof=2, dtype=F64)

    def vec_form(pt, ctx):
        # block-diagonal elasticity-like coupling
        N1 = pt.shape1
        base = N1 @ N1.T  # (nen, nen)
        K = jnp.zeros((pt.nen, 2, pt.nen, 2))
        K = K.at[:, 0, :, 0].set(2 * base)
        K = K.at[:, 1, :, 1].set(base)
        K = K.at[:, 0, :, 1].set(0.1 * base)
        K = K.at[:, 1, :, 0].set(0.1 * base)
        F = jnp.stack([pt.shape0, -pt.shape0], axis=-1)
        return K, F

    A, b = assemble_system(sp, vec_form, apply_fix=False)
    M = A.to_dense()
    np.testing.assert_allclose(M, M.T, atol=1e-13)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(sp.nnodes, 2))
    y1 = np.asarray(A.matvec(jnp.asarray(x)))
    y2 = (M @ x.ravel()).reshape(-1, 2)
    np.testing.assert_allclose(y1, y2, atol=1e-12)


def test_dirichlet_fix_semantics():
    """Fixed rows/cols are eliminated symmetrically; diag = element
    multiplicity; RHS lifted (petigaelem.c:1360-1439)."""
    sp = Space([Axis.uniform(p=2, nel=4)], dtype=F64)
    sp.set_boundary_value(0, 0, 0, 1.5)
    A, b = assemble_system(sp, mass_form)
    M = A.to_dense()
    bb = np.asarray(b).ravel()
    # node 0 is fixed: row/col zero except diagonal
    np.testing.assert_allclose(M[0, 1:], 0.0, atol=1e-14)
    np.testing.assert_allclose(M[1:, 0], 0.0, atol=1e-14)
    assert M[0, 0] == 1.0  # node 0 only in first element
    np.testing.assert_allclose(bb[0], 1.5)
    # solving returns exactly the BC value at the fixed node
    x = np.linalg.solve(M, bb)
    np.testing.assert_allclose(x[0], 1.5)


def test_chunked_assembly_matches():
    sp = Space([Axis.uniform(p=2, nel=5) for _ in range(2)], dtype=F64)
    A1, b1 = assemble_system(sp, mass_form, apply_fix=False)
    A2, b2 = assemble_system(sp, mass_form, apply_fix=False, chunk=7)
    np.testing.assert_allclose(np.asarray(A1.data), np.asarray(A2.data), atol=1e-13)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-13)


def test_boundary_load_flux():
    """Neumann load table: v * elementFaceArea added to face closures
    (AddFlux, petigaelem.c:1192-1215)."""
    sp = Space([Axis.uniform(p=1, nel=4) for _ in range(2)], dtype=F64)
    sp.set_boundary_load(0, 1, 0, 2.0)
    _, b0 = assemble_system(sp, mass_form)
    sp2 = Space([Axis.uniform(p=1, nel=4) for _ in range(2)], dtype=F64)
    _, b1 = assemble_system(sp2, mass_form)
    extra = np.asarray(b0 - b1).reshape(5, 5)  # (x, y) grid? flat is x-fastest
    extra = np.asarray(b0 - b1).ravel().reshape(5, 5)[:, :]  # [y, x] after C-reshape?
    # node grid flat = ix + 5*iy -> reshape (5,5) gives [iy, ix]
    extra = np.asarray(b0 - b1).ravel().reshape(5, 5)
    # only the right boundary column ix=4 receives flux
    np.testing.assert_allclose(extra[:, :4], 0.0, atol=1e-14)
    # face element length = 0.25; interior face nodes belong to 2 elements
    np.testing.assert_allclose(extra[:, 4], [0.5, 1.0, 1.0, 1.0, 0.5])


def test_stencil_transpose_jittable():
    """A^T in stencil storage is pure shifted slices (jittable) and
    exactly matches the dense transpose, incl. periodic wrap and
    nonsymmetric dof>1 blocks."""
    import jax
    from petiga_tpu.sparse.stencil import StencilMatrix

    def form(pt, ctx):
        beta = jnp.arange(1.0, pt.dim + 1.0)
        K = pt.shape1 @ pt.shape1.T + jnp.outer(
            pt.shape0, pt.shape1 @ beta
        )
        return K, pt.shape0

    for per in [(False, False), (True, False)]:
        sp = Space(
            [Axis.uniform(p=2, nel=5, periodic=pp) for pp in per],
            dtype=F64,
        )
        A, _ = assemble_system(sp, form, apply_fix=False)
        AT_data = jax.jit(lambda A=A: A.transpose().data)()
        DT = StencilMatrix(A.stencil, AT_data).to_dense()
        np.testing.assert_allclose(DT, A.to_dense().T, atol=1e-13)
