"""Element- and block-structured preconditioners — analogs of the
reference's PCIGAEBE (petigapce.c: block-diagonal of inverted element
matrices) and PCIGABBB (petigapcb.c: dense-inverted overlapping
neighborhood block per control point).

Both are embarrassingly parallel batched dense inverses + gathers —
a natural fit for the MXU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly.assemble import stencil_of

__all__ = ["ebe_preconditioner", "bbb_preconditioner"]


def ebe_preconditioner(space, element_matrices, *, scaled: bool = True):
    """Element-by-element PC (PCIGAEBE, petigapce.c:18-259).

    ``element_matrices``: (nel, nen*dof, nen*dof) element blocks (as
    produced during assembly, after the Dirichlet fix).  Application:
        M^{-1} r = D^{-1/2} (sum_e C_e^T (W Ke W)^+ C_e) D^{-1/2} r
    with W the inverse multiplicity weights (each dof counted once).
    """
    dof = space.dof
    nen = space.nen
    mapping = space.device("mapping")  # (nel, nen)
    # dof multiplicity: how many elements touch each node
    mult = np.zeros((space.nnodes,), np.float64)
    np.add.at(mult, space.mapping.ravel(), 1.0)
    w = jnp.asarray(1.0 / np.sqrt(mult), space.dtype)  # (nnodes,)

    Ke = element_matrices.reshape(-1, nen * dof, nen * dof)
    if scaled:
        We = w[mapping]  # (nel, nen)
        We = jnp.repeat(We, dof, axis=1)  # (nel, nen*dof)
        Ke = Ke * We[:, :, None] * We[:, None, :]
    Kinv = jnp.linalg.pinv(Ke)  # batched (MXU)

    def M(r):
        shape = r.shape
        rv = r.reshape(space.nnodes, dof)
        re = rv[mapping].reshape(-1, nen * dof)  # gather closures
        ze = jnp.einsum("eij,ej->ei", Kinv, re)
        z = jnp.zeros_like(rv)
        z = z.at[mapping.reshape(-1)].add(
            ze.reshape(-1, nen, dof).reshape(-1, dof)
        )
        return z.reshape(shape)

    return M


def bbb_preconditioner(A, *, overlap: int = 1):
    """Block-by-block PC (PCIGABBB, petigapcb.c): for every control
    point, dense-invert the (2*overlap+1)^dim neighborhood block of the
    assembled operator and apply its center row.

    ``overlap`` defaults to 1 (3^dim neighborhoods); the reference
    defaults to the polynomial degree (petigapcb.c:91-106) which is
    stronger but much more expensive.
    """
    st = A.stencil
    dim, dof = st.dim, st.dof
    N = st.node_shape
    m = 2 * overlap + 1
    nb = m**dim  # neighborhood size

    # neighborhood offsets (axis-0 fastest)
    offs = np.stack(
        np.meshgrid(*[np.arange(-overlap, overlap + 1)] * dim, indexing="ij"),
        axis=-1,
    ).reshape(-1, dim, order="F")

    # neighbor flat indices per node (nnodes, nb) with validity
    multi = np.unravel_index(np.arange(st.nnodes), N, order="F")
    nbr = np.zeros((st.nnodes, nb), np.int64)
    valid = np.ones((st.nnodes, nb), bool)
    stride = 1
    for d in range(dim):
        j = multi[d][:, None] + offs[None, :, d]
        if st.periodic[d]:
            j = np.mod(j, N[d])
        else:
            bad = (j < 0) | (j >= N[d])
            valid &= ~bad
            j = np.clip(j, 0, N[d] - 1)
        nbr += j * stride
        stride *= N[d]
    nbr_j = jnp.asarray(nbr)
    valid_j = jnp.asarray(valid)

    # extract the neighborhood operator blocks: B[n, i, j] = A[nbr[n,i], nbr[n,j]]
    # via the stencil slot of the offset between neighbors
    cols = st.column_index()  # (nnodes, K)
    slot_of = {}
    soffs = st.slot_offsets()
    for s in range(st.K):
        slot_of[tuple(soffs[s])] = s
    pairs = np.zeros((nb, nb), np.int64)
    pair_ok = np.zeros((nb, nb), bool)
    for i in range(nb):
        for j in range(nb):
            o = tuple(offs[j] - offs[i])
            if all(abs(o[d]) <= st.widths[d] for d in range(dim)):
                pairs[i, j] = slot_of[o]
                pair_ok[i, j] = True
    pairs_j = jnp.asarray(pairs)

    # B[n, i, :, j, :] = data[nbr[n,i], pairs[i,j]] when valid
    data = A.data  # (nnodes, K, dof, dof)
    Bk = data[nbr_j[:, :, None], pairs_j[None, :, :]]  # (nnodes, nb, nb, dof, dof)
    mask = (
        valid_j[:, :, None]
        & valid_j[:, None, :]
        & jnp.asarray(pair_ok)[None, :, :]
    )
    Bk = jnp.where(mask[..., None, None], Bk, 0.0)
    B = Bk.transpose(0, 1, 3, 2, 4).reshape(st.nnodes, nb * dof, nb * dof)
    # regularize invalid diagonal entries so the inverse exists
    eye = jnp.eye(nb * dof, dtype=B.dtype)
    diag_fix = (~valid_j)[:, :, None] * jnp.ones((1, 1, dof), bool)
    diag_fix = diag_fix.reshape(st.nnodes, nb * dof)
    B = B + eye[None] * diag_fix[:, :, None]
    Binv = jnp.linalg.inv(B)
    center = nb // 2
    # center row of the inverse: (nnodes, dof, nb*dof)
    Crow = Binv[:, center * dof : (center + 1) * dof, :]

    def M(r):
        shape = r.shape
        rv = r.reshape(st.nnodes, dof)
        rn = rv[nbr_j]  # (nnodes, nb, dof)
        rn = jnp.where(valid_j[..., None], rn, 0.0).reshape(st.nnodes, nb * dof)
        z = jnp.einsum("nij,nj->ni", Crow, rn)
        return z.reshape(shape)

    return M
