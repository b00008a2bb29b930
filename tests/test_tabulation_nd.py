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
