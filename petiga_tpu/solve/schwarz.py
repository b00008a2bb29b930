"""Two-level overlapping Schwarz preconditioner — the TPU-native
analog of the reference's BDDC preparation layer (petigapcbddc.c).

The reference feeds PETSc's PCBDDC three ingredients: a subdomain
decomposition with its local adjacency graph (``IGAComputeBDDCGraph``,
petigapcbddc.c:68-144), primal vertices at subdomain corners
(petigapcbddc.c:262-306), and "minimal" near-null-space vectors —
masked *constants* per subdomain (petigapcbddc.c:310-460).  The role of
all three is the same: local subdomain solves plus a small coarse
problem whose space contains the constants, giving iteration counts
independent of the number of subdomains.

The TPU-native formulation keeps exactly those ingredients but drops
the PETSc machinery:

* the node grid is split into a dim-D grid of boxes (the same balanced
  block distribution the device partitioner uses), extended by
  ``overlap`` layers (default: the stencil width p, matching the ghost
  shell);
* every extended box extracts its dense local operator straight from
  the stencil slot storage (no graph, no MatIS) and is inverted
  **batched** — one ``jnp.linalg.inv`` over all subdomains, an MXU
  matmul pipeline;
* the coarse space is the per-subdomain, per-field constants — the
  direct analog of the reference's minimal near-null-space mask
  vectors — with the coarse operator ``A0 = R0 A R0^T`` formed by
  applying the stencil matvec to the (few) coarse basis vectors and
  dense-inverted.

Application is the symmetric *balancing* (hybrid) form — coarse solve,
local solves on the deflated residual, coarse solve again:

    z1 = C r,   z2 = z1 + sum_s R_s^T (A_s)^{-1} R_s (r - A z1),
    M r = z2 + C (r - A z2),        C = R0^T A0^{-1} R0

which keeps the PC symmetric for CG and, unlike the plain additive sum,
never degrades the one-level method (the coarse payoff shows once the
subdomain count is large relative to what CG can deflate by itself).
With ``restricted=True`` the local scatter uses the non-overlapping
owned boxes (RAS) — nonsymmetric, pair with BiCGStab/GMRES.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "schwarz_preconditioner",
    "schwarz_local_preconditioner",
    "subdomain_boxes",
]


def subdomain_boxes(N, nsub):
    """Balanced 1-D block split per axis: ``N[d]`` nodes into ``nsub[d]``
    chunks (the IGA_Dist1D rule: N//s + (N%s > rank))."""
    starts, sizes = [], []
    for n, s in zip(N, nsub):
        if not (1 <= s <= n):
            raise ValueError(f"cannot split {n} nodes into {s} subdomains")
        sz = np.full(s, n // s, np.int64)
        sz[: n % s] += 1
        st = np.concatenate([[0], np.cumsum(sz)[:-1]])
        starts.append(st)
        sizes.append(sz)
    return starts, sizes


MAX_SUBDOMAIN_BLOCK = 4096  # dense-inverse guard: (nb*dof)^2 entries


def _check_block(N, subdomains, ov, dof, max_block):
    """Refuse memory-quadratic dense subdomain inverses."""
    nb = 1
    for n, s in zip(N, subdomains):
        nb *= -(-n // s) + 2 * ov
    if nb * dof > max_block:
        raise ValueError(
            f"Schwarz subdomain block is {nb * dof} dofs "
            f"(> max_block={max_block}); its dense inverse would need "
            f"{(nb * dof) ** 2 * 8 / 2**30:.1f} GiB per box — use more "
            f"subdomains (smaller boxes) or raise max_block explicitly"
        )


def schwarz_preconditioner(
    A,
    *,
    subdomains=None,
    overlap=None,
    coarse: bool = True,
    restricted: bool = False,
    coarse_modes=None,
    max_block: int = MAX_SUBDOMAIN_BLOCK,
):
    """Build the two-level Schwarz PC for a :class:`StencilMatrix` ``A``.

    Args:
      A: assembled stencil operator (Dirichlet rows already fixed).
      subdomains: per-axis subdomain counts; default ~N_d/8 boxes.
      overlap: extension layers; default = max stencil half-width.
      coarse: include the subdomain coarse correction.
      restricted: RAS scatter (owned boxes only; nonsymmetric).
      coarse_modes: optional (nmodes, nnodes, dof) near-null-space
        vectors replacing the per-field constants in the coarse basis —
        e.g. ``models.elasticity.rigid_body_modes`` (the reference feeds
        the same vectors to BDDC, petigapcbddc.c:310-460, and to
        solvers via MatNullSpaceCreateRigidBody, petigansp.c:119-131).
        Constants-only coarse spaces leave rotations unaddressed for
        elasticity, so iteration counts grow with the subdomain count.
      max_block: guard on the dense subdomain block size — the inverses
        are (nb·dof)² dense; a 32³ dof=1 subdomain would be a 39304²
        matrix (~12 GB f64).  Raise instead of silently allocating.

    Returns ``M(r) -> z``, closed over device-resident factors.
    """
    st = A.stencil
    dim, dof, N = st.dim, st.dof, st.node_shape
    if subdomains is None:
        subdomains = tuple(max(1, n // 8) for n in N)
    subdomains = tuple(int(s) for s in subdomains)
    if len(subdomains) != dim:
        raise ValueError("subdomains must give one count per axis")
    if overlap is None:
        overlap = max(st.widths)
    ov = int(overlap)
    for n, p in zip(N, st.widths):
        if n <= 2 * p:
            raise ValueError("grid too small for the stencil width")
    _check_block(N, subdomains, ov, dof, max_block)

    starts, sizes = subdomain_boxes(N, subdomains)
    nsub = int(np.prod(subdomains))
    ext = tuple(int(sizes[d].max()) + 2 * ov for d in range(dim))
    nb = int(np.prod(ext))

    # local multi-index grid of the extended box, axis-0 fastest
    grids = np.meshgrid(*[np.arange(e) for e in ext], indexing="ij")
    local = np.stack([g.ravel(order="F") for g in grids], axis=-1)  # (nb, dim)

    # subdomain multi-ids, axis-0 fastest
    sub_multi = np.unravel_index(np.arange(nsub), subdomains, order="F")

    idx = np.zeros((nsub, nb), np.int64)
    valid = np.ones((nsub, nb), bool)
    owned = np.ones((nsub, nb), bool)  # inside the non-overlapping box
    stride = 1
    for d in range(dim):
        base = starts[d][sub_multi[d]] - ov  # (nsub,)
        sz = sizes[d][sub_multi[d]]  # (nsub,)
        j = base[:, None] + local[None, :, d]  # (nsub, nb)
        # entries past this subdomain's (possibly shorter) extended box
        valid &= local[None, :, d] < (sz[:, None] + 2 * ov)
        owned &= (local[None, :, d] >= ov) & (local[None, :, d] < sz[:, None] + ov)
        if st.periodic[d]:
            j = np.mod(j, N[d])
        else:
            bad = (j < 0) | (j >= N[d])
            valid &= ~bad
            j = np.clip(j, 0, N[d] - 1)
        idx += j * stride
        stride *= N[d]
    owned &= valid
    # invariant (unequal boxes at overlap == p reach one past the
    # shorter extended block): every table entry is in-range — invalid
    # entries are per-axis clipped/wrapped above and neutralized by the
    # valid/owned masks, never read out of bounds
    assert idx.min() >= 0 and idx.max() < st.nnodes

    # pair slot table over the local box (shared by all subdomains):
    # the slot of the coupling i -> j is the local offset j - i
    slot_of = {}
    soffs = st.slot_offsets()
    for s in range(st.K):
        slot_of[tuple(soffs[s])] = s
    off = local[None, :, :] - local[:, None, :]  # (nb, nb, dim)
    pair_ok = np.all(np.abs(off) <= np.asarray(st.widths), axis=-1)
    pairs = np.zeros((nb, nb), np.int64)
    ii, jj = np.nonzero(pair_ok)
    pairs[ii, jj] = [slot_of[tuple(o)] for o in off[ii, jj]]

    idx_j = jnp.asarray(idx)
    valid_j = jnp.asarray(valid)
    scatter_j = jnp.asarray(owned if restricted else valid)

    # dense local operators: B[s, i, :, j, :] = data[idx[s,i], pairs[i,j]]
    data = A.data  # (nnodes, K, dof, dof)
    Bk = data[idx_j[:, :, None], jnp.asarray(pairs)[None, :, :]]
    mask = valid_j[:, :, None] & valid_j[:, None, :] & jnp.asarray(pair_ok)[None]
    Bk = jnp.where(mask[..., None, None], Bk, 0.0)
    B = Bk.transpose(0, 1, 3, 2, 4).reshape(nsub, nb * dof, nb * dof)
    # identity on masked-out entries so the batched inverse exists
    diag_fix = jnp.repeat(~valid_j, dof, axis=1)  # (nsub, nb*dof)
    B = B + jnp.eye(nb * dof, dtype=B.dtype)[None] * diag_fix[:, :, None]
    Binv = jnp.linalg.inv(B)  # batched (MXU)

    if coarse:
        # coarse basis: per-subdomain near-null-space vectors restricted
        # to the OWNED boxes (the reference's minimal near-null-space
        # mask vectors, petigapcbddc.c:310-460); default = per-field
        # constants, or user modes (rigid bodies for elasticity).
        # Owned boxes tile the grid exactly.
        if coarse_modes is None:
            modes = np.zeros((dof, st.nnodes, dof))
            for f in range(dof):
                modes[f, :, f] = 1.0
        else:
            modes = np.asarray(coarse_modes, np.float64)
            if modes.shape[1:] != (st.nnodes, dof):
                raise ValueError(
                    f"coarse_modes must be (nmodes, {st.nnodes}, {dof})"
                )
        nm = modes.shape[0]
        R0 = np.zeros((nsub * nm, st.nnodes, dof))
        for s in range(nsub):
            rows = idx[s][owned[s]]
            for mmode in range(nm):
                R0[s * nm + mmode, rows, :] = modes[mmode, rows, :]
        R0_j = jnp.asarray(R0, data.dtype)
        # A0[c, c'] = R0_c . A R0_c'  via nc stencil matvecs
        AR = jnp.stack([A.matvec(R0_j[c]) for c in range(nsub * nm)])
        A0 = jnp.einsum("cnd,knd->ck", R0_j, AR)
        # Dirichlet-eliminated rows can zero a mode on a box entirely
        dead0 = jnp.abs(jnp.diagonal(A0)) < 1e-30
        A0 = A0 + jnp.eye(A0.shape[0], dtype=A0.dtype) * dead0[:, None]
        A0inv = jnp.linalg.inv(A0)

    nnodes = st.nnodes

    def local_solves(rv):
        re = rv[idx_j]  # (nsub, nb, dof)
        re = jnp.where(valid_j[..., None], re, 0.0).reshape(nsub, nb * dof)
        ze = jnp.einsum("sij,sj->si", Binv, re).reshape(nsub, nb, dof)
        ze = jnp.where(scatter_j[..., None], ze, 0.0)
        z = jnp.zeros_like(rv)
        return z.at[idx_j.reshape(-1)].add(ze.reshape(-1, dof))

    def coarse_solve(rv):
        rc = jnp.einsum("cnd,nd->c", R0_j, rv)
        return jnp.einsum("cnd,c->nd", R0_j, A0inv @ rc)

    def M(r):
        shape = r.shape
        rv = r.reshape(nnodes, dof)
        if not coarse:
            return local_solves(rv).reshape(shape)
        z1 = coarse_solve(rv)
        z2 = z1 + local_solves(rv - A.matvec(z1))
        z = z2 + coarse_solve(rv - A.matvec(z2))
        return z.reshape(shape)

    return M


def schwarz_local_preconditioner(
    *,
    subdomains=None,
    overlap=None,
    coarse: bool = True,
    restricted: bool = False,
    coarse_modes=None,
    max_block: int = MAX_SUBDOMAIN_BLOCK,
):
    """Distributed two-level Schwarz — the serial PC above applied
    *inside* the device-mesh Krylov loops (the role PCBDDC plays under
    MPI in the reference, petigapcbddc.c + petigaksp.c:260-384).

    Returns a ``pc`` callable for ``DistSpace.cg/bicgstab/gmres``'s
    ``pc=`` argument (signature ``(ds, data_loc) -> Mv``, evaluated
    inside the shard_map region).  Per device: the *owned* block is
    split into subdomain boxes extended by ``overlap`` layers (capped at
    the stencil width so every needed row is in the p-wide halo shell
    the layer already exchanges); the dense subdomain operators are
    extracted from the halo-gathered stencil rows and batch-inverted on
    the MXU.  Overlap regions crossing device boundaries are handled by
    the forward halo (residual gather) and the reverse halo fold
    (solution scatter) — no extra communication primitives.

    The coarse space is one constant per (device, box, field) on the
    disjoint owned boxes — the global analog of the reference's minimal
    near-null-space vectors (petigapcbddc.c:310-460).  The coarse
    operator ``A0 = R0 A R0^T`` is assembled algebraically from the
    local stencil rows (each entry's column box is computed from the
    slot offset) and ``psum``-reduced, so it is bitwise-replicated on
    every device; application is the symmetric balancing form.
    """

    def pc(ds, data_loc):
        sp = ds.space
        st = ds.st
        dim, dof = st.dim, st.dof
        p = tuple(int(w) for w in st.widths)
        L = tuple(int(l) for l in ds.L)
        m = tuple(int(g) for g in ds.pgrid)
        names = ds.names
        K = st.K

        ov = tuple(
            min(p[d], p[d] if overlap is None else int(overlap))
            for d in range(dim)
        )
        nsub = (
            tuple(max(1, L[d] // 8) for d in range(dim))
            if subdomains is None
            else tuple(int(s) for s in subdomains)
        )
        starts, sizes = subdomain_boxes(L, nsub)
        nsub_loc = int(np.prod(nsub))
        ndev = int(np.prod(m))
        ext = tuple(int(sizes[d].max()) + 2 * ov[d] for d in range(dim))
        nb = int(np.prod(ext))
        if nb * dof > max_block:
            raise ValueError(
                f"Schwarz subdomain block is {nb * dof} dofs (> "
                f"max_block={max_block}) — use more subdomains per "
                f"device or raise max_block explicitly"
            )
        Lext = tuple(L[d] + 2 * p[d] for d in range(dim))
        next_ = int(np.prod(Lext))

        # ---- static tables (identical on every device: equal padded blocks)
        grids = np.meshgrid(*[np.arange(e) for e in ext], indexing="ij")
        local = np.stack([g.ravel(order="F") for g in grids], axis=-1)
        sub_multi = np.unravel_index(np.arange(nsub_loc), nsub, order="F")

        idx = np.zeros((nsub_loc, nb), np.int64)
        valid = np.ones((nsub_loc, nb), bool)
        owned = np.ones((nsub_loc, nb), bool)
        stride = 1
        for d in range(dim):
            # extended-block coord of box entry: p - ov + start + local
            base = p[d] - ov[d] + starts[d][sub_multi[d]]
            sz = sizes[d][sub_multi[d]]
            j = base[:, None] + local[None, :, d]
            valid &= local[None, :, d] < (sz[:, None] + 2 * ov[d])
            owned &= (local[None, :, d] >= ov[d]) & (
                local[None, :, d] < sz[:, None] + ov[d]
            )
            idx += j * stride
            stride *= Lext[d]
        owned &= valid

        soffs = st.slot_offsets()
        slot_of = {tuple(soffs[s]): s for s in range(K)}
        off = local[None, :, :] - local[:, None, :]
        pair_ok = np.all(np.abs(off) <= np.asarray(p), axis=-1)
        pairs = np.zeros((nb, nb), np.int64)
        ii, jj = np.nonzero(pair_ok)
        pairs[ii, jj] = [slot_of[tuple(o)] for o in off[ii, jj]]

        idx_j = jnp.asarray(idx)
        valid_j = jnp.asarray(valid)
        scatter_j = jnp.asarray(owned if restricted else valid)
        pairs_j = jnp.asarray(pairs)
        pair_ok_j = jnp.asarray(pair_ok)

        # ---- dense subdomain operators from halo-gathered stencil rows
        dataK = data_loc.reshape(
            tuple(L[::-1]) + (K * dof * dof,)
        )
        data_ext = ds.halo_gather(dataK).reshape(next_, K, dof, dof)
        Bk = data_ext[idx_j[:, :, None], pairs_j[None, :, :]]
        mask = valid_j[:, :, None] & valid_j[:, None, :] & pair_ok_j[None]
        Bk = jnp.where(mask[..., None, None], Bk, 0.0)
        B = Bk.transpose(0, 1, 3, 2, 4).reshape(
            nsub_loc, nb * dof, nb * dof
        )
        # identity on dead rows (mask, padding, open-boundary shell)
        dead = jnp.sum(jnp.abs(B), axis=2) == 0.0
        B = B + jnp.eye(nb * dof, dtype=B.dtype) * dead[:, :, None]
        Binv = jnp.linalg.inv(B)

        Av = lambda v: ds.matvec_local(data_loc, v)

        def local_solves(r_loc):
            r_ext = ds.halo_gather(r_loc).reshape(next_, dof)
            re = r_ext[idx_j]
            re = jnp.where(valid_j[..., None], re, 0.0).reshape(
                nsub_loc, nb * dof
            )
            ze = jnp.einsum("sij,sj->si", Binv, re).reshape(
                nsub_loc, nb, dof
            )
            ze = jnp.where(scatter_j[..., None], ze, 0.0)
            zext = (
                jnp.zeros((next_, dof), r_loc.dtype)
                .at[idx_j.reshape(-1)]
                .add(ze.reshape(-1, dof))
            )
            return ds.halo_fold(zext.reshape(tuple(Lext[::-1]) + (dof,)))

        if not coarse:
            return local_solves

        if coarse_modes is not None:
            return _modes_coarse(
                ds, data_loc, local_solves, coarse_modes, starts, sizes,
                nsub, ov, restricted,
            )

        # ---- coarse level: constants on the disjoint owned boxes
        nc = ndev * nsub_loc * dof
        nloc = int(np.prod(L))
        # per-axis box-id lookup over owned coords, and local coords
        boxtab = [
            np.searchsorted(starts[d], np.arange(L[d]), side="right") - 1
            for d in range(dim)
        ]
        lgrids = np.meshgrid(*[np.arange(l) for l in L], indexing="ij")
        lc = np.stack([g.ravel(order="F") for g in lgrids], axis=-1)
        row_box = np.zeros(nloc, np.int64)
        for d in range(dim - 1, -1, -1):
            row_box = row_box * nsub[d] + boxtab[d][lc[:, d]]
        row_box_j = jnp.asarray(row_box)
        lc_j = jnp.asarray(lc)
        boxtab_j = [jnp.asarray(b) for b in boxtab]
        soffs_j = jnp.asarray(soffs)

        dev_flat = jnp.asarray(0)
        origin = []
        for d in range(dim - 1, -1, -1):
            ci = jax.lax.axis_index(names[d])
            dev_flat = dev_flat * m[d] + ci
        for d in range(dim):
            origin.append(jax.lax.axis_index(names[d]) * L[d])

        row_cid = dev_flat * nsub_loc + row_box_j  # (nloc,)

        # column coarse ids per (node, slot)
        cdev_flat = jnp.zeros((nloc, K), jnp.int32)
        cbox_flat = jnp.zeros((nloc, K), jnp.int32)
        for d in range(dim - 1, -1, -1):
            g = origin[d] + lc_j[:, d:d + 1] + soffs_j[None, :, d]
            if sp.periodic[d]:
                g = jnp.mod(g, sp.node_shape[d])
            else:
                g = jnp.clip(g, 0, L[d] * m[d] - 1)
            cdev = g // L[d]
            clocal = g - cdev * L[d]
            cdev_flat = cdev_flat * m[d] + cdev
            cbox_flat = cbox_flat * nsub[d] + boxtab_j[d][clocal]
        col_cid = cdev_flat * nsub_loc + cbox_flat  # (nloc, K)

        vals = data_loc.reshape(nloc, K, dof, dof)
        I2 = (row_cid[:, None, None, None] * dof
              + jnp.arange(dof)[None, None, :, None])
        J2 = (col_cid[:, :, None, None] * dof
              + jnp.arange(dof)[None, None, None, :])
        A0 = (
            jnp.zeros((nc, nc), vals.dtype)
            .at[
                jnp.broadcast_to(I2, vals.shape).reshape(-1),
                jnp.broadcast_to(J2, vals.shape).reshape(-1),
            ]
            .add(vals.reshape(-1))
        )
        A0 = jax.lax.psum(A0, tuple(names))
        dead0 = jnp.diagonal(A0) == 0.0
        A0 = A0 + jnp.eye(nc, dtype=A0.dtype) * dead0[None, :] * dead0[:, None]
        A0inv = jnp.linalg.inv(A0)

        rows_dof = (row_cid[:, None] * dof + jnp.arange(dof)[None, :])

        def coarse_solve(r_loc):
            rv = r_loc.reshape(nloc, dof)
            rc = (
                jnp.zeros((nc,), rv.dtype)
                .at[rows_dof.reshape(-1)]
                .add(rv.reshape(-1))
            )
            rc = jax.lax.psum(rc, tuple(names))
            z0 = A0inv @ rc
            return z0[rows_dof].reshape(r_loc.shape)

        def M(r_loc):
            z1 = coarse_solve(r_loc)
            z2 = z1 + local_solves(r_loc - Av(z1))
            return z2 + coarse_solve(r_loc - Av(z2))

        return M

    return pc


def _modes_coarse(ds, data_loc, local_solves, coarse_modes, starts, sizes,
                  nsub, ov, restricted):
    """Mode-weighted coarse level for the distributed Schwarz PC: the
    coarse basis is each near-null-space vector restricted to a
    (device, box) — rigid-body modes for elasticity (the reference's
    BDDC near-null-space intent, petigapcbddc.c:310-460).  The coarse
    operator ``A0[c,c'] = Σ_{i,j} W_c[i]·A[i,j]·W_c'[j]`` is assembled
    algebraically from the local stencil rows with halo-gathered column
    weights, psum-reduced so it is bitwise-replicated on every device.
    Runs inside shard_map."""
    sp = ds.space
    st = ds.st
    dim, dof = st.dim, st.dof
    p = tuple(int(w) for w in st.widths)
    L = tuple(int(l) for l in ds.L)
    m = tuple(int(g) for g in ds.pgrid)
    names = ds.names
    K = st.K
    nsub_loc = int(np.prod(nsub))
    ndev = int(np.prod(m))
    nloc = int(np.prod(L))
    Lext = tuple(L[d] + 2 * p[d] for d in range(dim))
    next_ = int(np.prod(Lext))

    modes = np.asarray(coarse_modes, np.float64)
    nm = modes.shape[0]
    if modes.shape[1:] != (sp.nnodes, dof):
        raise ValueError(f"coarse_modes must be (nmodes, {sp.nnodes}, {dof})")
    nc = ndev * nsub_loc * nm

    # padded global mode grid, replicated closure constant
    Np = ds.Np
    Wg = np.zeros(tuple(Np[::-1]) + (nm * dof,))
    Ngrid = tuple(sp.node_shape[::-1])
    Wfull = np.moveaxis(modes, 0, 1).reshape(sp.nnodes, nm * dof)
    Wg[tuple(slice(0, n) for n in Ngrid)] = Wfull.reshape(
        Ngrid + (nm * dof,)
    )
    Wg_j = jnp.asarray(Wg, data_loc.dtype)

    origin_rev = tuple(
        (jax.lax.axis_index(names[dim - 1 - g])
         * L[dim - 1 - g]).astype(jnp.int32)
        for g in range(dim)
    )
    W_loc = jax.lax.dynamic_slice(
        Wg_j, origin_rev + (jnp.int32(0),), tuple(L[::-1]) + (nm * dof,)
    )
    W_ext = ds.halo_gather(W_loc).reshape(next_, nm, dof)
    Wr = W_loc.reshape(nloc, nm, dof)

    # box id per local row (static tables)
    boxtab = [
        np.searchsorted(starts[d], np.arange(L[d]), side="right") - 1
        for d in range(dim)
    ]
    lgrids = np.meshgrid(*[np.arange(l) for l in L], indexing="ij")
    lc = np.stack([g.ravel(order="F") for g in lgrids], axis=-1)
    row_box = np.zeros(nloc, np.int64)
    for d in range(dim - 1, -1, -1):
        row_box = row_box * nsub[d] + boxtab[d][lc[:, d]]

    soffs = st.slot_offsets()
    # ext-grid flat index of each (row, slot) column — always in the
    # halo-extended block; and its (device, box) coarse id
    col_ext = np.zeros((nloc, K), np.int64)
    stride = 1
    for d in range(dim):
        j = p[d] + lc[:, d:d + 1] + soffs[None, :, d]
        col_ext += j * stride
        stride *= Lext[d]
    col_ext_j = jnp.asarray(col_ext)

    # column coarse ids (device may differ across the halo)
    dev_flat = jnp.asarray(0)
    for d in range(dim - 1, -1, -1):
        dev_flat = dev_flat * m[d] + jax.lax.axis_index(names[d])
    row_cid = dev_flat * nsub_loc + jnp.asarray(row_box)
    boxtab_j = [jnp.asarray(b) for b in boxtab]
    soffs_j = jnp.asarray(soffs)
    lc_j = jnp.asarray(lc)
    cdev_flat = jnp.zeros((nloc, K), jnp.int64)
    cbox_flat = jnp.zeros((nloc, K), jnp.int64)
    for d in range(dim - 1, -1, -1):
        g = (jax.lax.axis_index(names[d]) * L[d]
             + lc_j[:, d:d + 1] + soffs_j[None, :, d])
        if sp.periodic[d]:
            g = jnp.mod(g, sp.node_shape[d])
        else:
            g = jnp.clip(g, 0, L[d] * m[d] - 1)
        cdev = g // L[d]
        clocal = g - cdev * L[d]
        cdev_flat = cdev_flat * m[d] + cdev
        cbox_flat = cbox_flat * nsub[d] + boxtab_j[d][clocal]
    col_cid = cdev_flat * nsub_loc + cbox_flat  # (nloc, K)

    vals = data_loc.reshape(nloc, K, dof, dof)
    We = W_ext[col_ext_j]  # (nloc, K, nm, dof)
    contrib = jnp.einsum("ikab,ima,iknb->ikmn", vals, Wr, We)
    I2 = (row_cid[:, None, None, None] * nm
          + jnp.arange(nm)[None, None, :, None])
    J2 = (col_cid[:, :, None, None] * nm
          + jnp.arange(nm)[None, None, None, :])
    A0 = (
        jnp.zeros((nc, nc), vals.dtype)
        .at[
            jnp.broadcast_to(I2, contrib.shape).reshape(-1),
            jnp.broadcast_to(J2, contrib.shape).reshape(-1),
        ]
        .add(contrib.reshape(-1))
    )
    A0 = jax.lax.psum(A0, tuple(names))
    dead0 = jnp.abs(jnp.diagonal(A0)) < 1e-30
    A0 = A0 + jnp.eye(nc, dtype=A0.dtype) * dead0[:, None]
    A0inv = jnp.linalg.inv(A0)

    rows_nm = row_cid[:, None] * nm + jnp.arange(nm)[None, :]
    Av = lambda v: ds.matvec_local(
        data_loc.reshape(tuple(L[::-1]) + (K, dof, dof)), v
    )

    def coarse_solve(r_loc):
        rv = r_loc.reshape(nloc, dof)
        rm = jnp.einsum("ima,ia->im", Wr, rv)
        rc = (
            jnp.zeros((nc,), rv.dtype)
            .at[rows_nm.reshape(-1)]
            .add(rm.reshape(-1))
        )
        rc = jax.lax.psum(rc, tuple(names))
        z0 = A0inv @ rc
        z = jnp.einsum("ima,im->ia", Wr, z0[rows_nm])
        return z.reshape(r_loc.shape)

    def M(r_loc):
        z1 = coarse_solve(r_loc)
        z2 = z1 + local_solves(r_loc - Av(z1))
        return z2 + coarse_solve(r_loc - Av(z2))

    return M
