"""dim-D tabulation pipeline: tensor products, geometry maps, NURBS,
pushforward — validated against analytic integrals and finite
differences (the reference's IGAGeometryMap.c strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.tabulation import tabulate_elements

F64 = jnp.float64


def make_space(dim, p=2, nel=4, **kw):
    axes = [Axis.uniform(p=p, nel=nel) for _ in range(dim)]
    return Space(axes, dtype=F64, **kw)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_partition_of_unity_nd(dim):
    sp = make_space(dim)
    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=2)
    np.testing.assert_allclose(pb.shape[0].sum(axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(pb.shape[1].sum(axis=-2), 0.0, atol=1e-9)
    # integral of 1 over the unit domain
    np.testing.assert_allclose(pb.weight.sum(), 1.0, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_affine_geometry(dim):
    """Linear geometry x = A u + b: shape1 = N1 A^{-1}, detX = det(A)."""
    sp = make_space(dim, p=2, nel=3)
    A = np.eye(dim) + 0.1 * np.arange(dim * dim).reshape(dim, dim)
    b = np.arange(dim, dtype=float)
    # control points at Greville coords mapped affinely represent the
    # affine map exactly (B-splines reproduce linears at Greville)
    G = sp.greville_coordinates()
    sp.init_geometry(G @ A.T + b)
    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=1)
    detA = np.linalg.det(A)
    np.testing.assert_allclose(pb.detX, detA, rtol=1e-10)
    # physical point = A u + b
    np.testing.assert_allclose(
        pb.x, np.einsum("bqd,id->bqi", np.asarray(pb.u), A) + b, atol=1e-10
    )
    # total volume
    np.testing.assert_allclose(pb.weight.sum(), detA, rtol=1e-10)


def test_1d_nonlinear_geometry_fd():
    """1-D quadratic geometry: spatial derivatives vs finite differences."""
    p, nel = 2, 5
    sp = make_space(1, p=p, nel=nel, order=2)
    # geometry x(u) = u + 0.3 u^2 via exact quadratic control values:
    # for p=2 the control points that reproduce a quadratic f are
    # c_i = f(g_i) + corrections; easier: L2-fit x(u) on a fine grid.
    from petiga_tpu.core.bspline import bspline_ders

    ax = sp.axes[0]
    uu = np.linspace(0, 1, 400)
    spans = ax.find_span(uu)
    ders = bspline_ders(ax.U, p, spans, uu, 0)
    Acols = np.zeros((len(uu), ax.nbasis))
    for j in range(p + 1):
        Acols[np.arange(len(uu)), spans - p + j] = ders[:, 0, j]
    xexact = uu + 0.3 * uu**2
    c, *_ = np.linalg.lstsq(Acols, xexact, rcond=None)
    sp.init_geometry(c.reshape(-1, 1))

    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=2)
    u = np.asarray(pb.u)[..., 0]
    # analytic: dx/du = 1 + 0.6u ; dN/dx = dN/du / (1+0.6u)
    dxdu = 1 + 0.6 * u
    np.testing.assert_allclose(np.asarray(pb.detX), dxdu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pb.x)[..., 0], u + 0.3 * u**2, atol=1e-10)

    # pushforward self-consistency: spatial derivatives of a spline field
    # must match finite differences of (field(u), x(u)) — the strategy of
    # the reference's IGAGeometryMap.c test.
    c2, *_ = np.linalg.lstsq(Acols, np.sin(3 * xexact), rcond=None)
    emap = sp.mapping[np.asarray(ids)]
    ce = jnp.asarray(c2)[emap]  # (B, nen)
    grad = np.asarray(jnp.einsum("bqni,bn->bqi", pb.shape[1], ce)[..., 0])
    hess = np.asarray(jnp.einsum("bqnij,bn->bqij", pb.shape[2], ce)[..., 0, 0])

    def field_and_x(uu):
        sp_ = ax.find_span(uu)
        dd = bspline_ders(ax.U, p, sp_, uu, 0)[:, 0, :]
        idx = sp_[:, None] - p + np.arange(p + 1)[None, :]
        f = np.sum(dd * c2[idx], axis=1)
        xx = np.sum(dd * c[idx], axis=1)
        return f, xx

    uq = u.ravel()
    h = 1e-5
    fp, xp = field_and_x(uq + h)
    fm, xm = field_and_x(uq - h)
    f0, x0 = field_and_x(uq)
    fd_grad = (fp - fm) / (xp - xm)
    np.testing.assert_allclose(grad.ravel(), fd_grad, rtol=1e-5, atol=1e-5)
    # second derivative in x via chain rule on parametric finite differences:
    # d2f/dx2 = (f'' x' - f' x'') / x'^3  with parametric FD derivatives
    fuu = (fp - 2 * f0 + fm) / h**2
    fu = (fp - fm) / (2 * h)
    xu = (xp - xm) / (2 * h)
    xuu = (xp - 2 * x0 + xm) / h**2
    fd_hess = (fuu * xu - fu * xuu) / xu**3
    np.testing.assert_allclose(hess.ravel(), fd_hess, rtol=1e-3, atol=1e-3)


def test_nurbs_quarter_annulus_area():
    """Quarter annulus r in [1,2] via quadratic NURBS: exact area 3π/4.

    The classic exact-conic test: weights (1, 1/√2, 1) along the angular
    direction represent the circle exactly, so the quadrature-summed area
    must match to machine precision — validates rationalize + geometry +
    inverse map together.
    """
    p = 2
    ax_r = Axis.uniform(p=1, nel=1)  # radial, linear
    ax_t = Axis.uniform(p=2, nel=1)  # angular, one quadratic segment
    sp = Space([ax_r, ax_t], dtype=F64, quadrature=[4, 10])
    w = 1 / np.sqrt(2)
    # control net: radial index fastest (axis 0), 2 x 3 control points
    # angular control points for a 90° arc: (1,0), (1,1), (0,1) scaled by r
    P = np.zeros((2, 3, 2))
    W = np.zeros((2, 3))
    for i, r in enumerate([1.0, 2.0]):
        P[i, 0] = [r, 0]
        P[i, 1] = [r, r]
        P[i, 2] = [0, r]
        W[i] = [1, w, 1]
    # NURBS control points are stored in homogeneous form in PetIGA files,
    # but init_geometry takes Cartesian points + weights
    X = P.reshape(-1, 2, order="F")
    Wf = W.reshape(-1, order="F")
    sp.init_geometry(X, Wf)
    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=1)
    np.testing.assert_allclose(float(pb.weight.sum()), 3 * np.pi / 4, rtol=1e-10)
    # all mapped points lie in the annulus
    r = np.linalg.norm(np.asarray(pb.x), axis=-1)
    assert (r > 1 - 1e-9).all() and (r < 2 + 1e-9).all()


def test_boundary_face_tabulation():
    """Face tabulation: weights give face measure, normals point out."""
    sp = make_space(2, p=2, nel=3)
    # elements on face axis=0, side=0 (first column of elements)
    eshape = sp.elem_shape
    ids = jnp.asarray([0 + eshape[0] * j for j in range(eshape[1])])
    pb = tabulate_elements(sp, ids, order=1, face=(0, 0))
    np.testing.assert_allclose(float(pb.weight.sum()), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pb.normal)[..., 0], -1.0)
    np.testing.assert_allclose(np.asarray(pb.u)[..., 0], 0.0)


def test_boundary_face_mapped_normal():
    """Mapped geometry: face normal from cross products, dS scales."""
    sp = make_space(2, p=2, nel=2)
    G = sp.greville_coordinates()
    A = np.array([[2.0, 0.0], [0.0, 3.0]])
    sp.init_geometry(G @ A.T)
    eshape = sp.elem_shape
    ids = jnp.asarray([(eshape[0] - 1) + eshape[0] * j for j in range(eshape[1])])
    pb = tabulate_elements(sp, ids, order=1, face=(0, 1))
    # right face of [0,2]x[0,3]: length 3, outward normal +x
    np.testing.assert_allclose(float(pb.weight.sum()), 3.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(pb.normal)[..., 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pb.normal)[..., 1], 0.0, atol=1e-12)


def test_mapping_shape_and_range():
    sp = make_space(3, p=2, nel=3)
    m = sp.mapping
    assert m.shape == (27, 27)
    assert m.min() >= 0 and m.max() < sp.nnodes
    # every node referenced
    assert len(np.unique(m)) == sp.nnodes


def test_periodic_mapping_wraps():
    ax = Axis.uniform(p=2, nel=6, periodic=True)
    sp = Space([ax], dtype=F64)
    m = sp.mapping
    assert m.max() < sp.nnodes == 6
    # last element closure wraps to node 0
    assert 0 in m[-1]


@pytest.mark.parametrize("dim", [2, 3])
def test_mapped_identity_derivatives(dim):
    """IGAGeometryMap.c-style consistency: interpolating the geometry
    coordinates themselves, the pushed-forward field must satisfy
    value = x, grad = I, hess = 0 at every quadrature point."""
    from petiga_tpu.core.bspline import bspline_ders

    sp = Space([Axis.uniform(p=3, nel=3) for _ in range(dim)], dtype=F64,
               order=3)

    def warp(u):
        out = [u[..., d] + 0.1 * u[..., (d + 1) % dim] ** 2 for d in range(dim)]
        return np.stack(out, axis=-1)

    # least-squares fit of the (polynomial, hence exactly representable)
    # warp on a tensor sample grid, using the separable basis structure
    grids = [np.linspace(0, 1, 9) for _ in range(dim)]
    mats = []
    for d in range(dim):
        ax = sp.axes[d]
        sp_d = ax.find_span(grids[d])
        dd = bspline_ders(ax.U, ax.p, sp_d, grids[d], 0)
        Bd = np.zeros((len(grids[d]), ax.nbasis))
        for j in range(ax.p + 1):
            Bd[np.arange(len(grids[d])), sp_d - ax.p + j] = dd[:, 0, j]
        mats.append(Bd)
    if dim == 2:
        M = np.einsum("pa,qb->qpba", mats[0], mats[1]).reshape(
            mats[0].shape[0] * mats[1].shape[0], -1
        )
    else:
        M = np.einsum("pa,qb,rc->rqpcba", mats[0], mats[1], mats[2]).reshape(
            mats[0].shape[0] * mats[1].shape[0] * mats[2].shape[0], -1
        )
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel(order="F") for m in mesh], axis=-1)
    X = warp(pts)
    coef, res_, *_ = np.linalg.lstsq(M, X, rcond=None)
    sp.init_geometry(coef)

    ids = jnp.arange(sp.nel)
    pb = tabulate_elements(sp, ids, order=2)
    ce = jnp.asarray(coef)[sp.mapping[np.asarray(ids)]]  # (B, nen, dim)
    val = jnp.einsum("bqn,bnd->bqd", pb.shape[0], ce)
    grad = jnp.einsum("bqni,bnd->bqdi", pb.shape[1], ce)
    hess = jnp.einsum("bqnij,bnd->bqdij", pb.shape[2], ce)
    np.testing.assert_allclose(np.asarray(val), np.asarray(pb.x), atol=1e-10)
    eye = np.eye(dim)
    np.testing.assert_allclose(
        np.asarray(grad), np.broadcast_to(eye, grad.shape), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(hess), 0.0, atol=1e-7)


def test_der4_parametric():
    """Point.der4 (IGA_GetDer4, petigaval.F90:271-287): L2-project x^4
    onto degree-4 splines (exact) and check the 4th derivative is 24."""
    from petiga_tpu.models.projection import l2_project
    from petiga_tpu.assembly.assemble import compute_scalar

    sp = make_space(1, p=4, nel=4)
    U = l2_project(sp, lambda x: jnp.atleast_1d(x[0] ** 4))

    def fn(pt, Ue, ctx):
        d4 = pt.der4(Ue)  # (dof, 1, 1, 1, 1)
        return ((d4[0, 0, 0, 0, 0] - 24.0) ** 2)[None]

    err = compute_scalar(sp, fn, U, order=4)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-14)


def test_validate_geometry_guard():
    """petigaelem.c:989-993 analog: accept a valid warped map, reject a
    folded (non-injective) one, naming the offending elements."""
    import pytest
    from petiga_tpu.assembly.tabulation import validate_geometry
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space

    def mk():
        return Space([Axis.uniform(p=2, nel=4) for _ in range(2)],
                     dtype=jnp.float64)

    sp = mk()
    g = sp.greville_coordinates()
    X = np.stack(
        [g[:, 0] + 0.1 * np.sin(np.pi * g[:, 0]) * g[:, 1], g[:, 1]],
        axis=1,
    )
    sp.init_geometry(X)
    validate_geometry(sp)  # must not raise

    sp2 = mk()
    Xf = np.asarray(g).copy()
    Xf[:, 0] = -Xf[:, 0]  # mirrored: detJ < 0 everywhere
    sp2.init_geometry(Xf)
    with pytest.raises(ValueError, match="Jacobian"):
        validate_geometry(sp2)
