"""Matrix-free sum-factorized operator vs the assembled stencil."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.sparse.matfree import MatFreeOperator
from petiga_tpu.solve.krylov import cg

F64 = jnp.float64


def rd_form(c, k):
    def form(pt, ctx):
        K = c * jnp.outer(pt.shape0, pt.shape0) + k * (pt.shape1 @ pt.shape1.T)
        return K, pt.shape0 * 0.0

    return form


@pytest.mark.parametrize(
    "dim,p,periodic,c,k",
    [
        (1, 2, False, 0.0, 1.0),
        (2, 2, False, 0.5, 1.0),
        (2, 3, False, 0.0, 2.0),
        (3, 2, False, 1.0, 1.0),
        (2, 2, True, 0.3, 1.0),
    ],
)
def test_matfree_matches_assembled(dim, p, periodic, c, k):
    axes = [Axis.uniform(p=p, nel=5, periodic=periodic) for _ in range(dim)]
    sp = Space(axes, dtype=F64)
    if not periodic:
        sp.set_boundary_value(0, 0, 0, 0.0)
    A, _ = assemble_system(sp, rd_form(c, k))
    op = MatFreeOperator(sp, c=c, kappa=k)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    y1 = np.asarray(A.matvec(x))
    y2 = np.asarray(op.matvec(x))
    np.testing.assert_allclose(y2, y1, atol=1e-11)
    # diagonal matches too (Jacobi support)
    np.testing.assert_allclose(
        np.asarray(op.scalar_diagonal()), np.asarray(A.scalar_diagonal()),
        atol=1e-11,
    )


@pytest.mark.parametrize("dim,p,cont", [(1, 2, 0), (2, 2, 0), (2, 3, 1)])
def test_matfree_reduced_continuity(dim, p, cont):
    """Element steps > 1 (repeated interior knots): strided gathers and
    scatter-adds reproduce the assembled operator."""
    axes = [
        Axis.uniform(p=p, nel=5, continuity=cont) for _ in range(dim)
    ]
    sp = Space(axes, dtype=F64)
    sp.set_boundary_value(0, 0, 0, 0.0)
    A, _ = assemble_system(sp, rd_form(0.4, 1.3))
    op = MatFreeOperator(sp, c=0.4, kappa=1.3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-11
    )


def test_matfree_mapped_geometry():
    """Non-identity (curvilinear, non-affine) geometry: the pointwise
    metric path matches the assembled operator on the mapped domain."""
    sp = Space([Axis.uniform(p=2, nel=5) for _ in range(2)], dtype=F64)
    sp.set_boundary_value(0, 0, 0, 0.0)
    # warped map: x = u + 0.1 sin(pi u) v, y = v (det J > 0)
    g = sp.greville_coordinates()
    X = np.stack(
        [g[:, 0] + 0.1 * np.sin(np.pi * g[:, 0]) * g[:, 1], g[:, 1]],
        axis=1,
    )
    sp.init_geometry(X)
    A, _ = assemble_system(sp, rd_form(0.7, 1.0))
    op = MatFreeOperator(sp, c=0.7, kappa=1.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(A.matvec(x)), atol=1e-10
    )


def test_matfree_rational_rejected():
    sp = Space([Axis.uniform(p=2, nel=4) for _ in range(2)], dtype=F64)
    g = sp.greville_coordinates()
    W = np.full(sp.nnodes, 1.5)
    sp.init_geometry(np.asarray(g), W)
    with pytest.raises(ValueError):
        MatFreeOperator(sp)


def test_matfree_cg_solves_poisson():
    from petiga_tpu.models.poisson import make_space, poisson_system, l2_error
    from petiga_tpu.assembly.assemble import assemble_vector

    sp = make_space(2, p=2, nel=16, dtype=F64)
    # rhs from the assembled path (cheap), operator matrix-free
    _, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    op = MatFreeOperator(sp, c=0.0, kappa=1.0)
    d = op.scalar_diagonal()
    M = lambda r: r / d
    res = cg(op, b, M=M, rtol=1e-11)
    assert l2_error(sp, res.x) < 2e-4


@pytest.mark.parametrize("c", [0.0, 0.3])
def test_matfree_chunked_matches_unchunked(c):
    """zchunk (fori_loop of windowed applies — the bounded-memory 256³
    path) reproduces the unchunked apply, incl. periodic fast axes and
    mapped geometry."""
    from petiga_tpu.models.poisson import make_space

    sp = make_space(3, p=2, nel=6, dtype=F64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(sp.nnodes, 1)))
    A0 = MatFreeOperator(sp, c=c, kappa=1.2)
    A1 = MatFreeOperator(sp, c=c, kappa=1.2, zchunk=2)
    assert A1.zchunk == 2
    np.testing.assert_allclose(
        np.asarray(A1.matvec(x)), np.asarray(A0.matvec(x)), atol=1e-13
    )
    # periodic fast axis + awkward zchunk request (rounded to divisor)
    spp = Space(
        [Axis.uniform(p=2, nel=6, periodic=(d == 0)) for d in range(3)],
        dtype=F64,
    )
    xp = jnp.asarray(np.random.default_rng(1).normal(size=(spp.nnodes, 1)))
    B0 = MatFreeOperator(spp, c=0.5, kappa=2.0)
    B1 = MatFreeOperator(spp, c=0.5, kappa=2.0, zchunk=4)
    assert B1.zchunk == 3  # rounded down to a divisor of E_z=6
    np.testing.assert_allclose(
        np.asarray(B1.matvec(xp)), np.asarray(B0.matvec(xp)), atol=1e-13
    )


def test_matfree_chunked_mapped_geometry():
    from petiga_tpu.models.poisson import make_space

    sp = make_space(2, p=2, nel=6, dtype=F64)
    # smooth non-affine map (same construction as
    # test_matfree_mapped_geometry)
    g = sp.greville_coordinates()
    X = np.stack(
        [g[:, 0] + 0.1 * np.sin(np.pi * g[:, 0]) * g[:, 1], g[:, 1]],
        axis=1,
    )
    sp.init_geometry(X)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(sp.nnodes, 1)))
    A0 = MatFreeOperator(sp, c=0.2, kappa=1.0)
    A1 = MatFreeOperator(sp, c=0.2, kappa=1.0, zchunk=3)
    np.testing.assert_allclose(
        np.asarray(A1.matvec(x)), np.asarray(A0.matvec(x)), atol=1e-12
    )


def test_jacobian_free_operator_matches_assembled():
    """JFNK: jvp Jacobian action == assembled AD Jacobian (Bratu),
    incl. the Dirichlet identity rows."""
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.models.bratu import bratu_residual
    from petiga_tpu.assembly.assemble import assemble_jacobian
    from petiga_tpu.sparse.matfree import JacobianFreeOperator

    sp = make_space(2, p=2, nel=5, dtype=F64)
    rng = np.random.default_rng(3)
    U = jnp.asarray(0.1 * rng.normal(size=(sp.nnodes, 1)))
    J = assemble_jacobian(sp, bratu_residual, U, {"lambda": 3.0})
    op = JacobianFreeOperator(sp, bratu_residual, U, {"lambda": 3.0})
    v = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(op.matvec(v)), np.asarray(J.matvec(v)), atol=1e-12
    )


def test_matfree_load_vector_matches_assembled():
    """MatFreeOperator.load_vector (windowed sum-factorized f64 load —
    the 256³ refine rhs path) matches the generic tabulated load."""
    from petiga_tpu.assembly.assemble import assemble_vector
    from petiga_tpu.models.poisson import make_space

    for dim, nel, zc in ((2, 7, None), (3, 6, 2), (3, 8, 4)):
        sp = make_space(dim, p=2, nel=nel, dtype=jnp.float64)
        A = MatFreeOperator(sp, c=0.0, kappa=1.0, zchunk=zc)

        def forcing(x):
            return jnp.prod(jnp.sin(jnp.pi * x)) + x[0]

        b = A.load_vector(forcing)

        def vecform(pt, ctx):
            return forcing(pt.x) * pt.shape0

        bref = assemble_vector(sp, vecform, order=0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(bref), atol=1e-14
        )
