"""Symmetric (SBAIJ-analog) stencil storage: round trip + matvec parity
with full storage (petigamat.c:400-405, 493-495)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.sparse.stencil import SymmetricStencilMatrix

F64 = jnp.float64


@pytest.mark.parametrize("periodic", [False, True])
def test_symmetric_roundtrip_and_matvec(periodic):
    sp = Space(
        [Axis.uniform(p=2, nel=5, periodic=periodic) for _ in range(3)],
        dtype=F64,
    )
    if not periodic:
        for d in range(3):
            for s in range(2):
                sp.set_boundary_value(d, s, 0, 0.0)
    A, _ = assemble_system(
        sp, poisson_system, {"c": 0.3, "k": 1.0}, apply_fix=not periodic
    )
    S = SymmetricStencilMatrix.from_full(A)
    assert S.data.shape[1] == (A.stencil.K + 1) // 2
    np.testing.assert_allclose(
        np.asarray(S.to_full().data), np.asarray(A.data), atol=1e-15
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(S.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(S.scalar_diagonal()), np.asarray(A.scalar_diagonal())
    )


def test_symmetric_dof2_and_solve():
    sp = Space([Axis.uniform(p=1, nel=5) for _ in range(2)], dof=2, dtype=F64)

    def bform(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
        C = jnp.asarray([[2.0, 0.3], [0.3, 1.5]])  # symmetric coupling
        return (
            jnp.einsum("ij,ab->iajb", K, C).reshape(sp.nen * 2, sp.nen * 2),
            jnp.zeros(sp.nen * 2),
        )

    A, _ = assemble_system(sp, bform, apply_fix=False)
    S = SymmetricStencilMatrix.from_full(A)
    np.testing.assert_allclose(
        np.asarray(S.to_full().data), np.asarray(A.data)
    )
    x = jnp.asarray(np.random.default_rng(1).normal(size=(sp.nnodes, 2)))
    np.testing.assert_allclose(
        np.asarray(S.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    # CG through the symmetric operator reproduces the full-storage solve
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

    spp = make_space(3, p=2, nel=4, dtype=F64)
    Ap, bp = assemble_system(spp, poisson_system, {"c": 0.0, "k": 1.0})
    Sp = SymmetricStencilMatrix.from_full(Ap)
    r_full = cg(Ap, bp, M=jacobi_preconditioner(Ap), rtol=1e-10)
    r_sym = cg(Sp, bp, M=jacobi_preconditioner(Sp), rtol=1e-10)
    assert int(r_sym.iters) == int(r_full.iters)
    np.testing.assert_allclose(
        np.asarray(r_sym.x), np.asarray(r_full.x), atol=1e-10
    )


def test_symmetric_pallas_fast_operator():
    """fast_operator: transient expansion to the Pallas planes."""
    spp = make_space(3, p=2, nel=4, dtype=F64)
    Ap, _ = assemble_system(spp, poisson_system, {"c": 0.0, "k": 1.0})
    Sp = SymmetricStencilMatrix.from_full(Ap)
    op = Sp.fast_operator(interpret=True)
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator
    assert isinstance(op, PallasStencilOperator)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(spp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(Ap.matvec(x)), atol=1e-12
    )


def test_symmetric_mirrored_slot_kernel():
    """The mirrored-slot kernel (kind='sym') streams only the Ku upper
    planes and must match the full operator exactly — several sizes so
    the ring crosses chunk boundaries, plus a CG solve."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator
    from petiga_tpu.solve.krylov import cg

    for nel in (4, 6, 9):
        spp = make_space(3, p=2, nel=nel, dtype=F64)
        Ap, b = assemble_system(spp, poisson_system, {"c": 0.2, "k": 1.0})
        Sp = SymmetricStencilMatrix.from_full(Ap)
        op = PallasStencilOperator.from_symmetric(Sp, interpret=True)
        assert op.kind == "sym"
        assert op.DT.shape[0] == Sp.Ku
        x = jnp.asarray(
            np.random.default_rng(nel).normal(size=(spp.nnodes, 1))
        )
        np.testing.assert_allclose(
            np.asarray(op.matvec(x)), np.asarray(Ap.matvec(x)), atol=1e-12
        )
        if nel == 6:
            ref = cg(Ap, b, rtol=1e-11)
            res = cg(op, b, rtol=1e-11)
            np.testing.assert_allclose(
                np.asarray(res.x), np.asarray(ref.x), atol=1e-9
            )


def test_symmetric_mirrored_slot_kernel_dof():
    """dof > 1 mirrored-slot kernel: the mirror applies the transposed
    dof×dof block (the SBAIJ/BAIJ analog, petigamat.c:493-500) — matvec
    parity with full storage for an elasticity-style coupled system."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    for dim, dof, nel, p in ((2, 2, 6, 1), (3, 3, 4, 1)):
        sp = Space(
            [Axis.uniform(p=p, nel=nel) for _ in range(dim)],
            dof=dof, dtype=F64,
        )
        C = np.eye(dof) * 2.0 + 0.25  # SPD coupling block

        def bform(pt, ctx, C=jnp.asarray(C), dof=dof):
            K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
            return (
                jnp.einsum("ij,ab->iajb", K, C).reshape(
                    sp.nen * dof, sp.nen * dof
                ),
                jnp.zeros(sp.nen * dof),
            )

        A, _ = assemble_system(sp, bform, apply_fix=False)
        S = SymmetricStencilMatrix.from_full(A)
        op = PallasStencilOperator.from_symmetric(S, interpret=True)
        assert op.kind == "sym"
        assert op.DT.shape[0] == S.Ku * dof * dof
        x = jnp.asarray(
            np.random.default_rng(dim).normal(size=(sp.nnodes, dof))
        )
        np.testing.assert_allclose(
            np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
        )
