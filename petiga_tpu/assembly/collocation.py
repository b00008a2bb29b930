"""Collocation assembly — the reference's collocation method
(``-iga_collocation``): one equation per control point, enforced at its
Greville abscissa (petigabasis.c:226-299 tabulation; petigaelem.c
collocation branches of FixSystem/FixFunction/FixJacobian :1389-1523).

Forms receive a Point at the collocation abscissa and return one
block equation:
  system(pt, ctx) -> (K, F) with K reshapeable to (dof, nen*dof), F (dof,)
  function(pt, Ue, ctx) -> R (dof,)

Boundary rows: a Dirichlet value BC replaces the row with the
interpolation equation sum_a N_a u_a = v; a boundary *load* (Neumann)
replaces it with the normal-derivative equation (petigaelem.c:1389-1439).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.stencil import StencilMatrix
from .assemble import stencil_of, _points_of
from .tabulation import tabulate_elements

__all__ = ["assemble_collocation", "assemble_collocation_function",
           "assemble_collocation_jacobian"]


def _colloc_structure(space):
    """Row ids, per-(point, a) slot indices, boundary masks — host."""
    sp = space
    if not sp.collocation:
        raise ValueError("space was not built with collocation=True")
    dim = sp.dim
    npts = sp.nel  # = nnp per axis, one point per control point
    st = stencil_of(sp)
    emulti = np.unravel_index(np.arange(npts), sp.elem_shape, order="F")
    # slot per axis: offset + a - i + p, wrapped for periodic axes
    grids = np.meshgrid(*[np.arange(n) for n in sp.nen_shape], indexing="ij")
    locs = [g.ravel(order="F") for g in grids]
    slot = np.zeros((npts, sp.nen), dtype=np.int64)
    stride = 1
    for d in range(dim):
        off = sp.tabs[d].offset[emulti[d]]  # (npts,)
        j = off[:, None] + locs[d][None, :]  # unwrapped column index
        o = j - emulti[d][:, None]
        if sp.axes[d].periodic:
            N = sp.node_shape[d]
            o = np.mod(o + N // 2, N) - N // 2
        if o.min() < -sp.degrees[d] or o.max() > sp.degrees[d]:
            raise ValueError("collocation stencil exceeds bandwidth")
        slot += (o + sp.degrees[d]) * stride
        stride *= 2 * sp.degrees[d] + 1
    return jnp.asarray(slot.astype(np.int32))


def _boundary_normals(space):
    """(nnp..., ) boundary masks per point: for each face with a value
    BC, which points lie on it."""
    mask, vals = space.dirichlet_mask()
    return mask, vals


def assemble_collocation(space, system: Callable, ctx=None, *, order=None):
    """Assemble (A, b) by collocation (IGAComputeSystem collocation path).
    """
    sp = space
    st = stencil_of(sp)
    dof, nen = sp.dof, sp.nen
    dt = sp.dtype
    npts = sp.nel
    slot = _colloc_structure(sp)
    ids = jnp.arange(npts)

    pb = tabulate_elements(sp, ids, order=order)
    pts = jax.tree.map(lambda a: a[:, 0], _points_of(pb))

    K, F = jax.vmap(lambda p: system(p, ctx))(pts)
    K = K.reshape(npts, dof, nen * dof).astype(dt)
    F = F.reshape(npts, dof).astype(dt)

    # Dirichlet rows -> interpolation equation (petigaelem.c:1419-1434)
    mask, vals = _boundary_normals(sp)
    mask_j = jnp.asarray(mask)  # (nnodes, dof)
    vals_j = jnp.asarray(vals, dt)
    shape0 = pts.shape0  # (npts, nen)
    interp = jnp.zeros((npts, dof, nen, dof), dt)
    for c in range(dof):
        interp = interp.at[:, c, :, c].set(shape0)
    interp = interp.reshape(npts, dof, nen * dof)
    m = mask_j[:, :, None].astype(dt)
    K = K * (1 - m) + interp * m
    F = jnp.where(mask_j, vals_j, F)

    data = jnp.zeros((st.nnodes * st.K, dof, dof), dt)
    rows = ids[:, None] * st.K + slot  # (npts, nen)
    Kb = K.reshape(npts, dof, nen, dof).transpose(0, 2, 1, 3)  # (npts,nen,dof,dof)
    data = data.at[rows.reshape(-1)].add(Kb.reshape(-1, dof, dof))
    A = StencilMatrix(st, data.reshape(st.nnodes, st.K, dof, dof))
    return A, F


def assemble_collocation_function(space, function: Callable, U, ctx=None, *,
                                  order=None):
    """Collocation residual: R[i] = function at point i with fixed rows
    u - v (petigaelem.c:1460-1481)."""
    sp = space
    dof, nen = sp.dof, sp.nen
    dt = sp.dtype
    npts = sp.nel
    U = U.reshape(sp.nnodes, dof)
    ids = jnp.arange(npts)
    pb = tabulate_elements(sp, ids, order=order)
    pts = jax.tree.map(lambda a: a[:, 0], _points_of(pb))
    emap = sp.device_emap(ids)
    mask, vals = _boundary_normals(sp)
    mask_j = jnp.asarray(mask)
    vals_j = jnp.asarray(vals, dt)
    Uf = jnp.where(mask_j, vals_j, U)
    Ue = Uf[emap]
    R = jax.vmap(lambda p, ue: jnp.reshape(function(p, ue, ctx), (dof,)))(
        pts, Ue
    ).astype(dt)
    R = jnp.where(mask_j, U - vals_j, R)
    return R


def assemble_collocation_jacobian(space, function: Callable, U, ctx=None, *,
                                  order=None):
    """Collocation Jacobian by forward AD of the pointwise residual;
    Dirichlet rows become the interpolation row (petigaelem.c:1496-1520,
    here simplified to the identity row consistent with R = u - v)."""
    sp = space
    st = stencil_of(sp)
    dof, nen = sp.dof, sp.nen
    dt = sp.dtype
    npts = sp.nel
    slot = _colloc_structure(sp)
    U = U.reshape(sp.nnodes, dof)
    ids = jnp.arange(npts)
    pb = tabulate_elements(sp, ids, order=order)
    pts = jax.tree.map(lambda a: a[:, 0], _points_of(pb))
    emap = sp.device_emap(ids)
    mask, vals = _boundary_normals(sp)
    mask_j = jnp.asarray(mask)
    vals_j = jnp.asarray(vals, dt)
    Uf = jnp.where(mask_j, vals_j, U)
    Ue = Uf[emap]

    def res(ue_flat, p):
        return jnp.reshape(function(p, ue_flat.reshape(nen, dof), ctx), (dof,))

    J = jax.vmap(jax.jacfwd(res))(Ue.reshape(npts, nen * dof), pts)
    J = J.reshape(npts, dof, nen, dof).astype(dt)
    # fixed rows: d(u - v)/dU — the point's own coefficient only.  The
    # point's own node is in its closure at local index a* with
    # mapping[i, a*] == i; build that one-hot.
    own = (emap == ids[:, None]).astype(dt)  # (npts, nen)
    ident = jnp.einsum("pa,cd->pcad", own, jnp.eye(dof, dtype=dt))
    m = mask_j[:, :, None, None].astype(dt)
    J = J * (1 - m) + ident * m

    data = jnp.zeros((st.nnodes * st.K, dof, dof), dt)
    rows = ids[:, None] * st.K + slot
    Jb = J.transpose(0, 2, 1, 3)
    data = data.at[rows.reshape(-1)].add(Jb.reshape(-1, dof, dof))
    return StencilMatrix(st, data.reshape(st.nnodes, st.K, dof, dof))
