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

    # dof=5 (125·25 f64 planes) fits since the HBM-window plan budget
    # grew to ~88 MB (rows scale against the 128 MiB v5e VMEM); dof=9
    # (125·81 planes = 166 MB at rows=8) still exceeds it
    sp = Space([Axis.uniform(p=2, nel=4) for _ in range(3)], dof=5, dtype=F64)
    A, _ = assemble_system(sp, _block_form(5), apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    assert op.ok and op.kind == "hbm"
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 5)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    sp9 = Space([Axis.uniform(p=2, nel=3) for _ in range(3)], dof=9,
                dtype=F64)

    def bigform(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0)
        C = jnp.eye(9) + 0.01
        return (
            jnp.einsum("ij,ab->iajb", K, C).reshape(sp9.nen * 9, sp9.nen * 9),
            jnp.zeros(sp9.nen * 9),
        )

    A9, _ = assemble_system(sp9, bigform, apply_fix=False)
    op9 = PallasStencilOperator(A9, interpret=True)
    assert not op9.ok
    x9 = jnp.asarray(rng.normal(size=(sp9.nnodes, 9)))
    np.testing.assert_allclose(
        np.asarray(op9.matvec(x9)), np.asarray(A9.matvec(x9)), atol=1e-12
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


# ---------------------------------------------------- packed-vector API


def test_packed_roundtrip_and_matvec():
    """pack_vec/unpack_vec round-trip; matvec_xb == matvec (open axes)."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    sp = Space([Axis.uniform(p=2, nel=4) for _ in range(3)], dtype=F64)
    A, _ = assemble_system(sp, mass, apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    xb = op.pack_vec(x)
    np.testing.assert_allclose(np.asarray(op.unpack_vec(xb)), np.asarray(x))
    yb = op.matvec_xb(op.DT, xb)
    np.testing.assert_allclose(
        np.asarray(op.unpack_vec(yb)), np.asarray(A.matvec(x)), atol=1e-12
    )


def test_packed_cg_matches_standard():
    """A whole CG solve in packed layout (pack b once, unpack x once)
    reproduces the standard-layout solve — the solver fast path
    (VERDICT r2 item 4)."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
    from petiga_tpu.models.poisson import make_space, poisson_system

    sp = make_space(3, p=2, nel=4, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    op = PallasStencilOperator(A, interpret=True)
    r_std = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10)
    dinv = op.packed_diag_inv()
    r_pk = cg(
        lambda v: op.matvec_xb(op.DT, v),
        op.pack_vec(b),
        M=lambda r: r * dinv,
        rtol=1e-10,
    )
    assert int(r_pk.iters) == int(r_std.iters)
    np.testing.assert_allclose(
        np.asarray(op.unpack_vec(r_pk.x)), np.asarray(r_std.x), atol=1e-10
    )


def test_packed_matvec_periodic_rewrap():
    """matvec_xb re-wraps halo rows for periodic axes so packed solver
    iterations stay consistent."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    per = (True, False, True)
    sp = Space(
        [Axis.uniform(p=2, nel=4, periodic=pp) for pp in per], dtype=F64
    )
    A, _ = assemble_system(sp, mass, apply_fix=False)
    op = PallasStencilOperator(A, interpret=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    yb = op.matvec_xb(op.DT, op.pack_vec(x))
    np.testing.assert_allclose(
        np.asarray(op.unpack_vec(yb)), np.asarray(A.matvec(x)), atol=1e-12
    )
    # halo rows are consistent wrapped copies: yb == pack(unpack(yb))
    np.testing.assert_allclose(
        np.asarray(yb), np.asarray(op.pack_vec(op.unpack_vec(yb))),
        atol=1e-12,
    )
    # the packed mask counts every owned entry exactly once
    assert float(op.packed_mask().sum()) == sp.nnodes


# ----------------------------------------------- HBM-windowed variant


@pytest.mark.parametrize("dof", [1, 2])
def test_hbm_variant_matches(dof):
    """The double-buffered DMA variant (force_kind='hbm' — the 256³
    layout where x exceeds the VMEM budget) matches the XLA path."""
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    if dof == 1:
        sp = Space([Axis.uniform(p=2, nel=6) for _ in range(3)], dtype=F64)
        A, _ = assemble_system(sp, mass, apply_fix=False)
    else:
        sp = Space(
            [Axis.uniform(p=1, nel=5) for _ in range(3)], dof=dof, dtype=F64
        )
        A, _ = assemble_system(sp, _block_form(dof), apply_fix=False)
    op = PallasStencilOperator(A, interpret=True, force_kind="hbm")
    assert op.kind == "hbm"
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, dof)))
    y_ref = A.matvec(x)
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(y_ref), atol=1e-12
    )
    yb = op.matvec_xb(op.DT, op.pack_vec(x))
    np.testing.assert_allclose(
        np.asarray(op.unpack_vec(yb)), np.asarray(y_ref), atol=1e-12
    )
