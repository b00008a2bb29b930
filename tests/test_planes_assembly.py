"""Slot-major (plane-direct) assembly vs the node-major reference path.

``assemble_system_planes`` accumulates element blocks straight into the
Pallas flat slot-major layout (the zero-copy single-chip route to the
256³ assembled target, BASELINE.json) — it must reproduce
``assemble_system`` bit-for-bit in f64: operator action, load vector,
Dirichlet elimination, diagonals.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system, poisson_system_q
from petiga_tpu.assembly.assemble import assemble_system, assemble_system_planes

F64 = jnp.float64


@pytest.mark.parametrize("form", [poisson_system, poisson_system_q])
def test_planes_matches_nodemajor_3d(form):
    """Both the scanned and the q-batched MXU form paths, with Dirichlet
    elimination, awkward chunking (kz divisor logic)."""
    sp = make_space(3, p=2, nel=4, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.4, "k": 1.3})
    op, b2 = assemble_system_planes(
        sp, form, {"c": 0.4, "k": 1.3}, chunk=24, interpret=True
    )
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-13)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.scalar_diagonal()),
        np.asarray(A.scalar_diagonal()),
        atol=1e-13,
    )


def test_planes_dof2_blocks():
    sp = Space([Axis.uniform(p=2, nel=5) for _ in range(2)], dof=2, dtype=F64)

    def bform(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
        C = jnp.asarray([[2.0, 0.3], [0.7, 1.5]])
        return (
            jnp.einsum("ij,ab->iajb", K, C).reshape(sp.nen * 2, sp.nen * 2),
            jnp.zeros(sp.nen * 2),
        )

    A, _ = assemble_system(sp, bform, apply_fix=False)
    op, _ = assemble_system_planes(sp, bform, apply_fix=False, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(sp.nnodes, 2)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.diagonal()), np.asarray(A.diagonal()), atol=1e-13
    )


def test_planes_rejects_periodic_and_strided():
    sp = Space([Axis.uniform(p=2, nel=4, periodic=True) for _ in range(2)],
               dtype=F64)
    with pytest.raises(ValueError):
        assemble_system_planes(sp, poisson_system, interpret=True)
    spc = Space(
        [Axis.uniform(p=2, nel=4, continuity=0) for _ in range(2)], dtype=F64
    )
    with pytest.raises(ValueError):
        assemble_system_planes(spc, poisson_system, interpret=True)


def test_planes_packed_cg_solves_poisson():
    """End-to-end: plane-direct assembly + packed-layout CG reproduces
    the standard solve (the exact 256³ bench pipeline, scaled down)."""
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

    sp = make_space(3, p=2, nel=4, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    r_std = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10)
    op, b2 = assemble_system_planes(
        sp, poisson_system_q, {"c": 0.0, "k": 1.0}, interpret=True
    )
    dinv = op.packed_diag_inv()
    r_pk = cg(
        lambda v: op.matvec_xb(op.DT, v),
        op.pack_vec(b2),
        M=lambda r: r * dinv,
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(op.unpack_vec(r_pk.x)), np.asarray(r_std.x), atol=1e-9
    )


def test_post_fix_equivalence():
    """dirichlet_post_fix == per-element FixSystem summed, bit-for-bit
    on A and to 1e-13 on b: inhomogeneous values, periodic axes, fix
    tables, and the assemble_system(fix='post') switch."""
    from petiga_tpu.assembly.assemble import dirichlet_post_fix

    sp = make_space(3, p=2, nel=4, dtype=F64)
    sp.set_boundary_value(0, 0, 0, 1.5)
    sp.set_boundary_value(2, 1, 0, -0.7)
    A_el, b_el = assemble_system(sp, poisson_system, {"c": 0.2, "k": 1.0})
    A_pf, b_pf = assemble_system(
        sp, poisson_system, {"c": 0.2, "k": 1.0}, fix="post"
    )
    np.testing.assert_allclose(
        np.asarray(A_pf.data), np.asarray(A_el.data), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(b_pf), np.asarray(b_el), atol=1e-13
    )
    # periodic middle axis
    sp2 = Space(
        [Axis.uniform(p=2, nel=4, periodic=(d == 1)) for d in range(3)],
        dtype=F64,
    )
    for d in (0, 2):
        for s in range(2):
            sp2.set_boundary_value(d, s, 0, 0.3 * d - 0.1 * s)
    A2, b2 = assemble_system(sp2, poisson_system, {"c": 0.0, "k": 1.0})
    Ar, br = assemble_system(
        sp2, poisson_system, {"c": 0.0, "k": 1.0}, apply_fix=False
    )
    Ap, bp = dirichlet_post_fix(sp2, Ar, br)
    np.testing.assert_allclose(np.asarray(Ap.data), np.asarray(A2.data))
    np.testing.assert_allclose(np.asarray(bp), np.asarray(b2), atol=1e-13)
    # fix table
    sp3 = make_space(2, p=2, nel=5, dtype=F64)
    sp3.set_fix_table(np.random.default_rng(0).normal(size=(sp3.nnodes, 1)))
    Ae, be = assemble_system(sp3, poisson_system, {"c": 0.0, "k": 1.0})
    Af, bf = assemble_system(
        sp3, poisson_system, {"c": 0.0, "k": 1.0}, fix="post"
    )
    np.testing.assert_allclose(np.asarray(Af.data), np.asarray(Ae.data))
    np.testing.assert_allclose(np.asarray(bf), np.asarray(be), atol=1e-13)


def test_planes_row_aligned_mode():
    """Row-aligned plane layout (the >2 GB mode where the plane array
    stays (planes, M, 128) through assembly — grid-shaped
    materialization lane-pads 1.5x and OOMs at 256^3) matches the
    grid-shaped mode and the node-major reference."""
    sp = make_space(3, p=2, nel=6, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.2, "k": 1.1})
    op, b2 = assemble_system_planes(
        sp, poisson_system_q, {"c": 0.2, "k": 1.1}, chunk=72,
        interpret=True, row_aligned=True, donate_loop=True,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-13)


def test_separable_assembly_identical():
    """Sum-factorized separable assembly (Kronecker element matrices
    from per-axis 1-D factors) produces the IDENTICAL operator and load
    vector as the generic quadrature path."""
    from petiga_tpu.assembly.assemble import assemble_separable_planes

    sp = make_space(3, p=2, nel=6, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.4, "k": 1.3})

    def f(x):
        return (0.4 + 1.3 * 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * x))

    for ra in (False, True):
        op, b2 = assemble_separable_planes(
            sp, c=0.4, kappa=1.3, forcing=f, chunk=72, interpret=True,
            row_aligned=ra, donate_loop=ra,
        )
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(sp.nnodes, 1))
        )
        np.testing.assert_allclose(
            np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-13
        )
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b),
                                   atol=1e-14)


def test_cg_program_x64_invariant():
    """ADVICE r4: the f32 CG program must lower to identical HLO with
    x64 on and off (explicit i32 loop counters, explicit dtypes) — so
    enabling x64 for the refinement stage does not invalidate the
    persistent-compile-cache entries of the f32 solve programs."""
    import jax
    from petiga_tpu.solve.krylov import cg
    from petiga_tpu.sparse.stencil import StencilMatrix
    from petiga_tpu.assembly.assemble import stencil_of

    sp = make_space(2, p=2, nel=6, dtype=jnp.float32)
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})

    def solve(data, bb):
        Am = StencilMatrix(stencil_of(sp), data)
        r = cg(Am, bb, rtol=1e-6, maxiter=100)
        return r.x, r.iters

    shapes = (
        jax.ShapeDtypeStruct(A.data.shape, jnp.float32),
        jax.ShapeDtypeStruct(b.shape, jnp.float32),
    )
    with jax.enable_x64(True):
        hlo_on = jax.jit(solve).lower(*shapes).as_text()
    with jax.enable_x64(False):
        hlo_off = jax.jit(solve).lower(*shapes).as_text()
    assert hlo_on == hlo_off
