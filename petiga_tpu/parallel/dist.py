"""Distributed assembly and solve over a device mesh — the TPU-native
replacement of the reference's MPI layer (``petigapart.c`` process
grids, ``petigagrid.c`` ghost scatters, ``petigavec.c`` g2l/l2g
exchanges, PETSc MatAssembly stash).

Design (SURVEY.md §2.3/§7): the node grid is block-partitioned over a
dim-D ``jax.sharding.Mesh`` chosen by the surface-minimizing
factorization; all hot ops run inside ``shard_map`` with explicit
neighbor ``ppermute`` halo exchange over ICI:

  * forward halo (the g2l ghost gather): each device fills a p-wide
    shell of its local block from its neighbors (zeros at open
    boundaries, wrap pairs for periodic axes),
  * reverse halo (the l2g ADD / assembly stash): ghost-shell
    contributions written during element assembly are ppermuted back and
    added into their owners — this replaces MatSetValues stash traffic,
  * reductions (dots, norms) are ``lax.psum`` over all mesh axes.

Element ownership: an element belongs to the device owning its first
closure node (unwrapped basis index), so each device writes at most a
p-wide ghost shell — exactly the reference's one-sided geometry/node
overlap (petiga.c:1149-1292).

Padding: each axis is padded to ``L_d * m_d`` nodes; padded rows carry
zero data and decouple.  Periodic axes require ``m_d | N_d`` (the wrap
halo must start right after the last real node).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly.assemble import (
    _faces_to_visit,
    _fix_arrays,
    _fix_system,
    _normalize_F,
    _normalize_K,
    _points_of,
    _scan_points,
    boundary_flux_vector,
    stencil_of,
)
from ..assembly.tabulation import tabulate_elements
from ..sparse.stencil import stencil_apply
from .partition import block_ranges, factor_grid

__all__ = ["DistSpace", "DistThetaStepper", "DistAlphaStepper"]


def _axis_names(dim):
    return tuple(f"p{d}" for d in range(dim))


class DistSpace:
    """A Space partitioned over a device mesh.

    Arrays live as jax global arrays of *padded* shape, sharded over the
    mesh in grid layout (reversed spatial axes); shard_map regions see
    per-device local blocks.
    """

    def __init__(self, space, devices=None, pgrid=None, use_pallas=None):
        self.space = space
        dim = space.dim
        devices = jax.devices() if devices is None else devices
        ndev = len(devices)
        if pgrid is None:
            pgrid = factor_grid(ndev, space.node_shape)
        self.pgrid = tuple(pgrid)
        used = int(np.prod(self.pgrid))
        self.names = _axis_names(dim)  # name for spatial axis d
        # mesh layout: reversed spatial order (slowest grid axis first)
        mesh_shape = tuple(self.pgrid[::-1])
        devs = np.asarray(devices[:used]).reshape(mesh_shape)
        self.mesh = Mesh(devs, tuple(self.names[::-1]))

        N = space.node_shape
        self.L = tuple(
            math.ceil(N[d] / self.pgrid[d]) for d in range(dim)
        )
        for d in range(dim):
            if space.periodic[d] and N[d] % self.pgrid[d] != 0:
                raise ValueError(
                    f"periodic axis {d}: device count {self.pgrid[d]} must "
                    f"divide node count {N[d]}"
                )
        self.Np = tuple(self.L[d] * self.pgrid[d] for d in range(dim))
        self.widths = space.degrees
        self.st = stencil_of(space)

        # Per-device Pallas SpMV on the halo-extended local block: the
        # (L_d + 2 p_d) frame is an open regular grid in which every
        # stencil slot is a constant flat shift (halo matrix rows are
        # zero) — exactly the serial flat-slot-major packing, with the
        # halo data coming from the ppermute exchange instead of a wrap.
        # Without this every distributed solve rides the XLA slot-loop
        # path (~0.5% of roofline on hardware, BENCH_r02).
        if use_pallas is None:
            use_pallas = jax.default_backend() in ("tpu", "axon")
        self._device_jit_cache: dict = {}
        self._pk = None
        if use_pallas:
            from ..sparse.stencil import Stencil
            from ..sparse.pallas_spmv import PallasStencilOperator

            lst = Stencil(
                node_shape=self.L,
                widths=self.widths,
                periodic=(False,) * dim,
                dof=space.dof,
            )
            pk = PallasStencilOperator(
                stencil=lst,
                dtype=space.dtype,
                ext_pads=tuple((p, p) for p in self.widths),
            )
            self._pk = pk if pk.ok else None

        self._partition_elements()

    # ----------------------------------------------------------- host setup

    def _partition_elements(self):
        """Assign each element to the device owning its first closure
        node; build per-device padded element-id arrays."""
        sp = self.space
        dim = sp.dim
        emulti = np.unravel_index(np.arange(sp.nel), sp.elem_shape, order="F")
        owner = []
        for d in range(dim):
            off = sp.tabs[d].offset[emulti[d]]  # unwrapped first basis index
            owner.append(np.clip(off // self.L[d], 0, self.pgrid[d] - 1))
        # flat device index in mesh order (reversed: spatial dim-1 slowest)
        dev_flat = np.zeros(sp.nel, dtype=np.int64)
        for d in range(dim - 1, -1, -1):
            dev_flat = dev_flat * self.pgrid[d] + owner[d]
        ndev = int(np.prod(self.pgrid))
        lists = [np.where(dev_flat == r)[0] for r in range(ndev)]
        emax = max(len(l) for l in lists)
        ids = np.zeros((ndev, emax), dtype=np.int32)
        valid = np.zeros((ndev, emax), dtype=bool)
        for r, l in enumerate(lists):
            ids[r, : len(l)] = l
            valid[r, : len(l)] = True
        # reshape to mesh layout (m_{dim-1}, ..., m_0, emax)
        mesh_shape = tuple(self.pgrid[::-1])
        self.elem_ids = ids.reshape(mesh_shape + (emax,))
        self.elem_valid = valid.reshape(mesh_shape + (emax,))
        self.emax = emax
        self._face_cache = {}

    def _element_owner_flat(self, eids):
        """Flat mesh-order device index owning each element id (owner of
        the first closure node, as in _partition_elements)."""
        sp = self.space
        dim = sp.dim
        emulti = np.unravel_index(eids, sp.elem_shape, order="F")
        dev_flat = np.zeros(len(eids), dtype=np.int64)
        for d in range(dim - 1, -1, -1):
            off = sp.tabs[d].offset[emulti[d]]
            owner = np.clip(off // self.L[d], 0, self.pgrid[d] - 1)
            dev_flat = dev_flat * self.pgrid[d] + owner
        return dev_flat

    def _partition_face_elements(self, d, s):
        """Per-device padded (ids, valid) mesh-layout arrays for the
        elements adjacent to face (d, s); devices away from the face own
        none (all-invalid rows).  Cached per face."""
        from ..assembly.assemble import _face_elements

        key = (d, s)
        if key in self._face_cache:
            return self._face_cache[key]
        sp = self.space
        fids = _face_elements(sp, d, s)
        dev_flat = self._element_owner_flat(fids)
        ndev = int(np.prod(self.pgrid))
        lists = [fids[dev_flat == r] for r in range(ndev)]
        fmax = max(1, max(len(l) for l in lists))
        ids = np.zeros((ndev, fmax), dtype=np.int32)
        valid = np.zeros((ndev, fmax), dtype=bool)
        for r, l in enumerate(lists):
            ids[r, : len(l)] = l
            valid[r, : len(l)] = True
        mesh_shape = tuple(self.pgrid[::-1])
        out = (
            jnp.asarray(ids.reshape(mesh_shape + (fmax,))),
            jnp.asarray(valid.reshape(mesh_shape + (fmax,))),
        )
        self._face_cache[key] = out
        return out

    def _face_args(self, boundary):
        """Flat [ids0, valid0, ids1, valid1, ...] for the visited faces
        (empty when no boundary form)."""
        if boundary is None:
            return []
        args = []
        for d, s in _faces_to_visit(self.space):
            ids, valid = self._partition_face_elements(d, s)
            args += [ids, valid]
        return args

    def _box_setup(self):
        """Per-device element sub-box tables for the shift fastpath
        (unit-step regular spaces): owned elements per axis form the
        contiguous range [e0_d, e0_d + cnt_d); returns mesh-layout
        (e0, cnt) arrays and the static max box ``ebox``.  Cached."""
        if hasattr(self, "_box_cache"):
            return self._box_cache
        sp = self.space
        dim = sp.dim
        off0 = [int(sp.tabs[d].offset[0]) for d in range(dim)]
        e0s, cnts, ebox = [], [], []
        for d in range(dim):
            m, Ld = self.pgrid[d], self.L[d]
            nel_d = sp.elem_shape[d]
            lo = np.clip(np.arange(m) * Ld - off0[d], 0, nel_d)
            hi = np.clip((np.arange(m) + 1) * Ld - off0[d], 0, nel_d)
            hi[-1] = nel_d  # last device also owns the overhang
            e0s.append(lo)
            cnts.append(hi - lo)
            ebox.append(max(1, int(np.max(hi - lo))))
        ndev = int(np.prod(self.pgrid))
        e0_arr = np.zeros((ndev, dim), np.int32)
        cnt_arr = np.zeros((ndev, dim), np.int32)
        for r in range(ndev):
            rem = r
            # flat mesh order: spatial dim-1 slowest (see _partition_elements)
            coords = []
            for d in range(dim):
                coords.append(rem % self.pgrid[d])
                rem //= self.pgrid[d]
            for d in range(dim):
                e0_arr[r, d] = e0s[d][coords[d]]
                cnt_arr[r, d] = cnts[d][coords[d]]
        mesh_shape = tuple(self.pgrid[::-1])
        out = (
            jnp.asarray(e0_arr.reshape(mesh_shape + (dim,))),
            jnp.asarray(cnt_arr.reshape(mesh_shape + (dim,))),
            tuple(ebox),
            tuple(off0),
        )
        self._box_cache = out
        return out

    # ------------------------------------------------------------- shardings

    def grid_spec(self, extra: int = 1) -> P:
        """PartitionSpec for grid-layout arrays: spatial axes sharded,
        trailing ``extra`` axes replicated."""
        return P(*(self.names[::-1] + (None,) * extra))

    def elem_spec(self) -> P:
        return P(*(self.names[::-1] + (None,)))

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    # ---------------------------------------------------- conversion helpers

    def pad_grid(self, v: jnp.ndarray) -> jnp.ndarray:
        """(nnodes, c) flat vector -> padded grid (Np_rev..., c)."""
        sp = self.space
        N = sp.node_shape
        c = v.shape[-1]
        g = v.reshape(tuple(N[::-1]) + (c,))
        pads = [(0, self.Np[d] - N[d]) for d in range(sp.dim)][::-1] + [(0, 0)]
        return jnp.pad(g, pads)

    def crop_flat(self, g: jnp.ndarray) -> jnp.ndarray:
        """Padded grid (Np_rev..., c) -> flat (nnodes, c)."""
        sp = self.space
        N = sp.node_shape
        sl = tuple(slice(0, N[d]) for d in range(sp.dim))[::-1]
        return g[sl].reshape(sp.nnodes, g.shape[-1])

    # ------------------------------------------------------- halo primitives

    def _perm(self, d, direction):
        """ppermute pairs along spatial axis d; direction +1 sends to the
        right (higher block index)."""
        m = self.pgrid[d]
        pairs = []
        for r in range(m):
            dst = r + direction
            if 0 <= dst < m:
                pairs.append((r, dst))
            elif self.space.periodic[d]:
                pairs.append((r, dst % m))
        return pairs

    def halo_gather(self, xl):
        """Forward halo: local block (L_rev..., c) -> padded
        (L_rev + 2p ..., c) with neighbor shells (g2l ghost gather,
        petigavec.c:147-211).  Must run inside shard_map."""
        sp = self.space
        dim = sp.dim
        p = self.widths
        out = xl
        for g in range(dim):  # grid axis g = spatial axis dim-1-g
            d = dim - 1 - g
            pd = p[d]
            if pd == 0:
                pads = [(0, 0)] * out.ndim
                continue
            # slabs of current array along grid axis g
            lo = jax.lax.slice_in_dim(out, 0, pd, axis=g)
            hi = jax.lax.slice_in_dim(out, out.shape[g] - pd, out.shape[g], axis=g)
            # receive from left neighbor the slab it sent right (its hi)
            from_left = jax.lax.ppermute(hi, self.names[d], self._perm(d, +1))
            from_right = jax.lax.ppermute(lo, self.names[d], self._perm(d, -1))
            out = jnp.concatenate([from_left, out, from_right], axis=g)
        return out

    def halo_fold(self, ext):
        """Reverse halo: extended local block (L_rev + 2p ..., c) ->
        (L_rev..., c) with ghost shells added into neighbors (the l2g ADD
        / MatAssembly stash, petigavec.c:213-254).  Must run inside
        shard_map.  Fold axis by axis so corner contributions propagate."""
        sp = self.space
        dim = sp.dim
        p = self.widths
        out = ext
        for g in range(dim):
            d = dim - 1 - g
            pd = p[d]
            if pd == 0:
                continue
            n = out.shape[g]
            lo = jax.lax.slice_in_dim(out, 0, pd, axis=g)
            hi = jax.lax.slice_in_dim(out, n - pd, n, axis=g)
            core = jax.lax.slice_in_dim(out, pd, n - pd, axis=g)
            # my low ghost belongs to my left neighbor's high interior
            to_right = jax.lax.ppermute(hi, self.names[d], self._perm(d, +1))
            to_left = jax.lax.ppermute(lo, self.names[d], self._perm(d, -1))
            Lg = core.shape[g]
            pad_lo = [(0, 0)] * core.ndim
            pad_lo[g] = (0, Lg - pd)
            pad_hi = [(0, 0)] * core.ndim
            pad_hi[g] = (Lg - pd, 0)
            core = core + jnp.pad(to_right, pad_lo) + jnp.pad(to_left, pad_hi)
            out = core
        return out

    # -------------------------------------------------------------- assembly

    def assemble_system(self, system, ctx=None, *, order=None,
                        apply_fix=True, boundary=None):
        """Distributed IGAComputeSystem: per-device element batches,
        local scatter into an extended block, reverse-halo fold.
        ``boundary(pt, ctx) -> (K, F)`` is evaluated on the visited
        faces' elements owned per device (petigaelem.c:427-447).

        Returns (A_data, b) as padded sharded global arrays:
        A_data (Np_rev..., K, dof, dof), b (Np_rev..., dof).
        """
        sp = self.space
        dim, dof, nen = sp.dim, sp.dof, sp.nen
        dt = sp.dtype
        st = self.st
        K = st.K
        L = self.L
        p = self.widths
        slot = jnp.asarray(st.slot_table(sp.nen_shape))
        names = self.names

        # per-axis unwrapped closure index tables (replicated constants)
        offs = [jnp.asarray(sp.tabs[d].offset) for d in range(dim)]
        flux = boundary_flux_vector(sp)
        dir_mask = sp.device("dirichlet")[0] if apply_fix else None

        Lext = tuple(L[d] + 2 * p[d] for d in range(dim))
        next_ext = int(np.prod(Lext))

        def elem_KF(ids, valid, face, form):
            """Element (Ke, Fe, loc_rows) for one batch (volume or face)."""
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order, face=face)
            emap = sp.device_emap(ids)

            def body(acc, pt, w):
                Ka, Fa = acc
                Kq, Fq = jax.vmap(lambda pp: form(pp, ctx))(pt)
                Kq = jax.vmap(lambda k: _normalize_K(k, nen, dof, dt))(Kq)
                Fq = jax.vmap(lambda f: _normalize_F(f, nen, dof, dt))(Fq)
                return (Ka + w[:, None, None] * Kq, Fa + w[:, None] * Fq)

            Ke = jnp.zeros((B, nen * dof, nen * dof), dt)
            Fe = jnp.zeros((B, nen * dof), dt)
            Ke, Fe = _scan_points(pb, body, (Ke, Fe))
            if apply_fix:
                m, v = _fix_arrays(sp, emap)
                Ke, Fe = _fix_system(Ke, Fe, m, v)
            vmask = valid.astype(dt)
            Ke = Ke * vmask[:, None, None]
            Fe = Fe * vmask[:, None]
            loc_rows, _ = self._local_rows(ids)
            return Ke, Fe, loc_rows

        def scatter(data_ext, b_ext, Ke, Fe, loc_rows):
            B = Ke.shape[0]
            Keb = Ke.reshape(B, nen, dof, nen, dof).transpose(0, 1, 3, 2, 4)
            sidx = loc_rows[:, :, None] * K + slot[None, :, :]
            data_ext = data_ext.at[sidx.reshape(-1)].add(
                Keb.reshape(-1, dof, dof), mode="drop"
            )
            b_ext = b_ext.at[loc_rows.reshape(-1)].add(
                Fe.reshape(B, nen, dof).reshape(-1, dof), mode="drop"
            )
            return data_ext, b_ext

        from ..assembly import fastpath

        use_box = fastpath.is_unit_step(sp)
        eshape = sp.elem_shape

        def box_interior(e0_a, cnt_a):
            """Shift fastpath per device: the owned elements form a
            regular sub-box, so accumulation is (nen)^2 static slice
            adds into a box grid placed at the device origin — no
            scatter (the 10-100x cheaper path the serial assembly uses,
            assembly/fastpath.py).  The box tabulates in z-SLAB chunks:
            one batch over the whole device box OOMs once per-device
            boxes are large (observed: 128³ on one device needs ~24 GB
            of tabulation arrays)."""
            _, _, ebox, off0 = self._box_setup()
            e0 = e0_a.reshape(dim)
            cnt = cnt_a.reshape(dim)
            Bslab = int(np.prod(ebox[:-1])) if dim > 1 else 1
            kz = max(1, min(ebox[-1], 65536 // max(Bslab, 1)))
            Gm = Gv = None
            for z0 in range(0, ebox[-1], kz):
                zext = min(kz, ebox[-1] - z0)
                Bc = Bslab * zext
                cshape = tuple(ebox[:-1]) + (zext,)
                jm = np.unravel_index(np.arange(Bc), cshape, order="F")
                ids = jnp.zeros((Bc,), jnp.int32)
                valid = jnp.ones((Bc,), bool)
                stride = 1
                for d in range(dim):
                    jd = jnp.asarray(jm[d], jnp.int32)
                    if d == dim - 1:
                        jd = jd + z0
                    idx = e0[d] + jd
                    valid = valid & (jd < cnt[d])
                    ids = ids + jnp.clip(idx, 0, eshape[d] - 1) * stride
                    stride *= eshape[d]
                Ke, Fe, _ = elem_KF(ids, valid, None, system)
                Keb = Ke.reshape(Bc, nen, dof, nen, dof).transpose(
                    0, 1, 3, 2, 4
                )
                Gm, Gv = fastpath.accumulate_box(
                    sp, ebox, Keb, Fe.reshape(Bc, nen, dof), z0, Gm, Gv
                )
            origs = []
            for g in range(dim):
                d = dim - 1 - g
                r_d = jax.lax.axis_index(names[d])
                origs.append(off0[d] + e0[d] - r_d * L[d] + p[d])
            zero3 = jnp.asarray(0, jnp.int32)
            data_ext_g = jax.lax.dynamic_update_slice(
                jnp.zeros(tuple(Lext[::-1]) + (K, dof, dof), dt), Gm,
                tuple(origs) + (zero3, zero3, zero3),
            )
            b_ext_g = jax.lax.dynamic_update_slice(
                jnp.zeros(tuple(Lext[::-1]) + (dof,), dt), Gv,
                tuple(origs) + (zero3,),
            )
            return (
                data_ext_g.reshape(next_ext * K, dof, dof),
                b_ext_g.reshape(next_ext, dof),
            )

        def local(elem_ids, elem_valid, *rest):
            # leading mesh axes are size 1 inside shard_map
            if use_box:
                e0_a, cnt_a = rest[:2]
                face_args = rest[2:]
                data_ext, b_ext = box_interior(e0_a, cnt_a)
            else:
                face_args = rest
                ids = elem_ids.reshape(-1)
                valid = elem_valid.reshape(-1)
                data_ext = jnp.zeros((next_ext * K, dof, dof), dt)
                b_ext = jnp.zeros((next_ext, dof), dt)
                Ke, Fe, loc_rows = elem_KF(ids, valid, None, system)
                data_ext, b_ext = scatter(data_ext, b_ext, Ke, Fe, loc_rows)
            if boundary is not None:
                faces = _faces_to_visit(sp)
                for (d, s), fids_a, fval_a in zip(
                    faces, face_args[0::2], face_args[1::2]
                ):
                    Kf, Ff, frows = elem_KF(
                        fids_a.reshape(-1), fval_a.reshape(-1), (d, s),
                        boundary,
                    )
                    data_ext, b_ext = scatter(data_ext, b_ext, Kf, Ff, frows)

            # grid layout (reversed axes) + reverse halo fold
            data_ext = data_ext.reshape(
                tuple(Lext[::-1]) + (K * dof * dof,)
            )
            b_ext = b_ext.reshape(tuple(Lext[::-1]) + (dof,))
            data_loc = self.halo_fold(data_ext).reshape(
                tuple(L[::-1]) + (K, dof, dof)
            )
            b_loc = self.halo_fold(b_ext).reshape(tuple(L[::-1]) + (dof,))
            return data_loc, b_loc

        face_args = self._face_args(boundary)
        extra = []
        if use_box:
            e0_arr, cnt_arr, _, _ = self._box_setup()
            extra = [e0_arr, cnt_arr]
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec())
            + (self.elem_spec(),) * (len(extra) + len(face_args)),
            out_specs=(self.grid_spec(3), self.grid_spec(1)),
            check_vma=False,
        )
        data, b = shard(
            jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid),
            *extra, *face_args,
        )
        if flux is not None:
            fl = self.pad_grid(jnp.where(sp.device("dirichlet")[0], 0.0,
                                         flux.astype(dt)))
            b = b + fl
        return data, b

    # ----------------------------------------------- residual / Jacobian

    def _local_rows(self, ids):
        """Extended-buffer row index per (element, a) — inside shard_map."""
        sp = self.space
        dim = sp.dim
        L, p = self.L, self.widths
        Lext = tuple(L[d] + 2 * p[d] for d in range(dim))
        offs = [jnp.asarray(sp.tabs[d].offset) for d in range(dim)]
        eshape = sp.elem_shape
        grids = np.meshgrid(*[np.arange(n) for n in sp.nen_shape], indexing="ij")
        locs = [jnp.asarray(g.ravel(order="F")) for g in grids]
        B = ids.shape[0]
        rem = ids
        loc_rows = jnp.zeros((B, sp.nen), jnp.int32)
        stride = 1
        for d in range(dim):
            e_d = rem % eshape[d]
            rem = rem // eshape[d]
            r_d = jax.lax.axis_index(self.names[d])
            idx = offs[d][e_d][:, None] + locs[d][None, :]
            idx = idx - r_d * L[d] + p[d]
            loc_rows = loc_rows + idx.astype(jnp.int32) * stride
            stride *= Lext[d]
        return loc_rows, Lext

    def _residual_local(self, function, ctx, order, aux_keys, boundary=None):
        """Per-device residual body (inside shard_map): halo-gather U,
        element residuals with fix-value semantics, optional boundary
        forms on this device's face elements, reverse-halo fold."""
        from ..assembly.assemble import _element_residual

        sp = self.space
        dim, dof, nen = sp.dim, sp.dof, sp.nen
        dt = sp.dtype

        def local(elem_ids, elem_valid, U_loc, *rest):
            naux = len(aux_keys)
            aux_locs = rest[:naux]
            face_args = rest[naux:]
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order)
            emap = sp.device_emap(ids)
            loc_rows, Lext = self._local_rows(ids)
            Uext = self.halo_gather(U_loc).reshape(-1, dof)
            Ue = Uext[loc_rows]  # (B, nen, dof)
            aux_ext = [self.halo_gather(al) for al in aux_locs]
            aux_e = None
            if aux_keys:
                aux_e = {
                    k: ext.reshape(-1, ext.shape[-1])[loc_rows]
                    for k, ext in zip(aux_keys, aux_ext)
                }
            m, v = _fix_arrays(sp, emap)
            uorig = Ue.reshape(B, nen * dof)
            Re = _element_residual(
                sp, function, ctx, pb, Ue, m, v, uorig, order, aux_e
            )
            Re = Re * valid.astype(dt)[:, None]
            next_ext = int(np.prod(Lext))
            b_ext = jnp.zeros((next_ext, dof), dt)
            b_ext = b_ext.at[loc_rows.reshape(-1)].add(
                Re.reshape(B, nen, dof).reshape(-1, dof), mode="drop"
            )
            # boundary forms (IGAElementNextForm under decomposition,
            # petigaelem.c:427-447): each visited face contributes only
            # through face elements owned by this device
            if boundary is not None:
                faces = _faces_to_visit(sp)
                for (d, s), fids_a, fval_a in zip(
                    faces, face_args[0::2], face_args[1::2]
                ):
                    fids = fids_a.reshape(-1)
                    fval = fval_a.reshape(-1)
                    Bf = fids.shape[0]
                    pbf = tabulate_elements(sp, fids, order=order,
                                            face=(d, s))
                    femap = sp.device_emap(fids)
                    frows, _ = self._local_rows(fids)
                    Ufe = Uext[frows]
                    faux_e = None
                    if aux_keys:
                        faux_e = {
                            k: ext.reshape(-1, ext.shape[-1])[frows]
                            for k, ext in zip(aux_keys, aux_ext)
                        }
                    fm, fv = _fix_arrays(sp, femap)
                    # boundary forms only ADD to interior rows (the fixed
                    # rows keep their u - v identity from the volume pass)
                    Rf = _element_residual(
                        sp, boundary, ctx, pbf, Ufe, fm, fv, fv, order,
                        faux_e,
                    )
                    Rf = Rf * (1.0 - fm)
                    Rf = Rf * fval.astype(dt)[:, None]
                    b_ext = b_ext.at[frows.reshape(-1)].add(
                        Rf.reshape(Bf, nen, dof).reshape(-1, dof),
                        mode="drop",
                    )
            b_ext = b_ext.reshape(tuple(Lext[::-1]) + (dof,))
            return self.halo_fold(b_ext).reshape(tuple(self.L[::-1]) + (dof,))

        return local

    def assemble_function(self, function, U, ctx=None, *, aux=None,
                          order=None, boundary=None):
        """Distributed IGAComputeFunction: halo-gather U, per-device
        element residuals with fix-value semantics, reverse-halo fold.
        U and aux values are padded sharded grids (Np_rev..., dof).
        ``boundary`` adds face forms on the visited faces
        (petigaelem.c:427-447 under domain decomposition)."""
        sp = self.space
        dt = sp.dtype
        flux = boundary_flux_vector(sp)
        aux_keys = tuple(aux.keys()) if aux is not None else ()
        local = self._residual_local(function, ctx, order, aux_keys,
                                     boundary=boundary)
        naux = len(aux_keys)
        face_args = self._face_args(boundary)
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec(), self.grid_spec(1))
            + (self.grid_spec(1),) * naux
            + (self.elem_spec(),) * len(face_args),
            out_specs=self.grid_spec(1),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid), U]
        if aux is not None:
            args += list(aux.values())
        args += face_args
        F = shard(*args)
        if flux is not None:
            mask = sp.device("dirichlet")[0]
            F = F - self.pad_grid(jnp.where(mask, 0.0, flux.astype(dt)))
        return F

    def _jacobian_local(self, function, ctx, order, aux_keys, boundary=None):
        """Per-device Jacobian body (inside shard_map): forward AD of the
        element residual, optional boundary-form tangents, halo fold."""
        from ..assembly.assemble import _element_residual

        sp = self.space
        dim, dof, nen = sp.dim, sp.dof, sp.nen
        dt = sp.dtype
        st = self.st
        K = st.K
        slot = jnp.asarray(st.slot_table(sp.nen_shape))

        def local(elem_ids, elem_valid, U_loc, *rest):
            naux = len(aux_keys)
            aux_locs = rest[:naux]
            face_args = rest[naux:]
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order)
            emap = sp.device_emap(ids)
            loc_rows, Lext = self._local_rows(ids)
            Uext = self.halo_gather(U_loc).reshape(-1, dof)
            Ue = Uext[loc_rows]
            aux_ext = [self.halo_gather(al) for al in aux_locs]
            aux_e = None
            if aux_keys:
                aux_e = {
                    k: ext.reshape(-1, ext.shape[-1])[loc_rows]
                    for k, ext in zip(aux_keys, aux_ext)
                }
            m, v = _fix_arrays(sp, emap)

            def make_elem_res(form, face):
                def elem_res(ue_flat, pb_e, m_e, v_e, aux_el):
                    pb1 = jax.tree.map(lambda a: a[None], pb_e)
                    aux1 = (
                        None if aux_el is None
                        else jax.tree.map(lambda a: a[None], aux_el)
                    )
                    r = _element_residual(
                        sp, form, ctx, pb1, ue_flat.reshape(1, nen, dof),
                        m_e[None], v_e[None],
                        v_e[None] if face else ue_flat[None], order, aux1,
                    )
                    res = r[0]
                    if face:
                        res = res * (1.0 - m_e)
                    return res
                return elem_res

            def batch_jac(form, face, Ue_b, pb_b, m_b, v_b, aux_b):
                er = make_elem_res(form, face)
                B_ = Ue_b.shape[0]
                if aux_b is None:
                    return jax.vmap(
                        lambda u, pp, mm, vv: jax.jacfwd(er)(u, pp, mm, vv, None)
                    )(Ue_b.reshape(B_, nen * dof), pb_b, m_b, v_b)
                return jax.vmap(jax.jacfwd(er))(
                    Ue_b.reshape(B_, nen * dof), pb_b, m_b, v_b, aux_b
                )

            Je = batch_jac(function, False, Ue, pb, m, v, aux_e)
            Je = Je * valid.astype(dt)[:, None, None]
            next_ext = int(np.prod(Lext))
            data_ext = jnp.zeros((next_ext * K, dof, dof), dt)

            def scatter(data_ext, Je_b, rows_b):
                B_ = Je_b.shape[0]
                Jb = Je_b.reshape(B_, nen, dof, nen, dof).transpose(
                    0, 1, 3, 2, 4
                )
                sidx = rows_b[:, :, None] * K + slot[None, :, :]
                return data_ext.at[sidx.reshape(-1)].add(
                    Jb.reshape(-1, dof, dof), mode="drop"
                )

            data_ext = scatter(data_ext, Je, loc_rows)

            if boundary is not None:
                faces = _faces_to_visit(sp)
                for (d, s), fids_a, fval_a in zip(
                    faces, face_args[0::2], face_args[1::2]
                ):
                    fids = fids_a.reshape(-1)
                    fval = fval_a.reshape(-1)
                    pbf = tabulate_elements(sp, fids, order=order,
                                            face=(d, s))
                    femap = sp.device_emap(fids)
                    frows, _ = self._local_rows(fids)
                    Ufe = Uext[frows]
                    faux_e = None
                    if aux_keys:
                        faux_e = {
                            k: ext.reshape(-1, ext.shape[-1])[frows]
                            for k, ext in zip(aux_keys, aux_ext)
                        }
                    fm, fv = _fix_arrays(sp, femap)
                    Jf = batch_jac(boundary, True, Ufe, pbf, fm, fv, faux_e)
                    Jf = Jf * fval.astype(dt)[:, None, None]
                    data_ext = scatter(data_ext, Jf, frows)

            data_ext = data_ext.reshape(tuple(Lext[::-1]) + (K * dof * dof,))
            return self.halo_fold(data_ext).reshape(
                tuple(self.L[::-1]) + (K, dof, dof)
            )

        return local

    def assemble_jacobian(self, function, U, ctx=None, *, aux=None,
                          order=None, boundary=None):
        """Distributed IGAComputeJacobian via forward AD of the element
        residual; same layout as :meth:`assemble_system`'s A_data."""
        sp = self.space
        aux_keys = tuple(aux.keys()) if aux is not None else ()
        local = self._jacobian_local(function, ctx, order, aux_keys,
                                     boundary=boundary)
        naux = len(aux_keys)
        face_args = self._face_args(boundary)
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec(), self.grid_spec(1))
            + (self.grid_spec(1),) * naux
            + (self.elem_spec(),) * len(face_args),
            out_specs=self.grid_spec(3),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid), U]
        if aux is not None:
            args += list(aux.values())
        args += face_args
        return shard(*args)

    def newton(self, function, U0, ctx=None, *, rtol=1e-8, maxit=20,
               linear_rtol=1e-8, order=None, aux=None, boundary=None,
               linear_solver="cg", pc="jacobi"):
        """Distributed Newton-Krylov (SNES analog over the device mesh,
        petigasnes.c:23-139) as ONE compiled program: residual assembly,
        AD Jacobian, halo-exchange CG and the Newton update all run in a
        single shard_map ``lax.while_loop`` — no per-iteration host
        round trips (the reference's SNESSolve likewise stays inside
        PETSc once launched).

        U0: flat (nnodes, dof) or padded sharded grid.  ``aux``: dict of
        flat (nnodes, c) state vectors (the IFunction multi-state
        mechanism); with aux the form signature is
        ``function(pt, Xe, aux_e, ctx)``.  ``boundary`` adds face
        residual/tangent forms on the visited faces."""
        sp = self.space
        dof = sp.dof
        if U0.ndim == 2 and U0.shape[0] == sp.nnodes:
            U0 = self.pad_grid(U0)
        if aux is not None:
            aux = {
                k: (v if v.ndim == sp.dim + 1
                    else self.pad_grid(jnp.asarray(v).reshape(sp.nnodes, -1)))
                for k, v in aux.items()
            }
        aux_keys = tuple(aux.keys()) if aux is not None else ()
        naux = len(aux_keys)
        res_local = self._residual_local(function, ctx, order, aux_keys,
                                         boundary=boundary)
        jac_local = self._jacobian_local(function, ctx, order, aux_keys,
                                         boundary=boundary)
        face_args = self._face_args(boundary)

        def region(elem_ids, elem_valid, U_loc, *rest):
            aux_locs = rest[:naux]
            fargs = rest[naux:]

            def F_of(U):
                return res_local(elem_ids, elem_valid, U, *aux_locs, *fargs)

            def J_of(U):
                return jac_local(elem_ids, elem_valid, U, *aux_locs, *fargs)

            def n2(F):
                return self._psum_all(jnp.sum(F * F))

            F = F_of(U_loc)
            tol2 = jnp.maximum(rtol * rtol * n2(F), 1e-60)

            def cond(stt):
                U, F, k = stt
                return (n2(F) > tol2) & (k < maxit)

            inner = {
                "cg": self._cg_local,
                "bicgstab": self._bicgstab_local,
                "gmres": self._gmres_local,
            }[linear_solver]

            def step(stt):
                U, F, k = stt
                data = J_of(U)
                dx, _, _ = inner(data, F, rtol=linear_rtol, pc=pc)
                U = U - dx
                return (U, F_of(U), k + 1)

            U, F, k = jax.lax.while_loop(cond, step, (U_loc, F, 0))
            return U, k, jnp.sqrt(n2(F))

        shard = jax.shard_map(
            region,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec(), self.grid_spec(1))
            + (self.grid_spec(1),) * naux
            + (self.elem_spec(),) * len(face_args),
            out_specs=(self.grid_spec(1), P(), P()),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid), U0]
        if aux is not None:
            args += list(aux.values())
        args += face_args
        U, k, fn = shard(*args)
        return self.crop_flat(U), {"iters": int(k), "fnorm": float(fn)}

    # ------------------------------------------------------------------ spmv

    # ---------------------------------------------------------- collocation

    def _partition_points(self):
        """Per-device padded point-id arrays in mesh layout
        (m_rev..., nloc): collocation rows are the *nodes* themselves,
        so the point partition is exactly the node-box partition — the
        role of the reference's Greville-shifted collocation partition
        (petiga.c:1211-1274).  Local enumeration is box-grid order
        (reversed C-order), matching the local block layout."""
        sp = self.space
        dim = sp.dim
        N = sp.node_shape
        nloc = int(np.prod(self.L))
        lgrids = np.meshgrid(
            *[np.arange(l) for l in self.L[::-1]], indexing="ij"
        )  # reversed-axis order
        mesh_shape = tuple(self.pgrid[::-1])
        ndev = int(np.prod(self.pgrid))
        ids = np.zeros((ndev,) + tuple(self.L[::-1]), np.int64)
        valid = np.zeros((ndev,) + tuple(self.L[::-1]), bool)
        for k, coords in enumerate(np.ndindex(*mesh_shape)):
            flat = np.zeros(tuple(self.L[::-1]), np.int64)
            ok = np.ones(tuple(self.L[::-1]), bool)
            stride = 1
            for d in range(dim):
                g = dim - 1 - d  # grid axis of spatial axis d
                j = coords[g] * self.L[d] + lgrids[g]
                ok &= j < N[d]
                flat += np.minimum(j, N[d] - 1) * stride
                stride *= N[d]
            ids[k] = flat
            valid[k] = ok
        ids = ids.reshape(mesh_shape + (nloc,))
        valid = valid.reshape(mesh_shape + (nloc,))
        return jnp.asarray(ids.astype(np.int32)), jnp.asarray(valid)

    def assemble_collocation(self, system, ctx=None, *, order=None):
        """Distributed collocation assembly (the reference's MPI
        collocation mode, petiga.c:1211-1274 + demo/makefile:184-188):
        each device evaluates the collocation equations of the points it
        owns.  Rows are point-local (a point writes only its own stencil
        slots), so — unlike Galerkin — no reverse-halo fold is needed;
        the returned padded sharded (A_data, F) plug into the
        nonsymmetric solvers (bicgstab/gmres) unchanged.
        """
        from ..assembly.collocation import _colloc_structure

        sp = self.space
        if not sp.collocation:
            raise ValueError("space was not built with collocation=True")
        st = self.st
        dof, nen = sp.dof, sp.nen
        dt = sp.dtype
        dim = sp.dim
        slot_all = _colloc_structure(sp)  # (npts, nen) int32
        mask_all, vals_all = sp.device("dirichlet")
        ids_b, valid_b = self._partition_points()
        nloc = int(np.prod(self.L))
        Lrev = tuple(self.L[::-1])

        def local(ids, valid):
            ids = ids.reshape(nloc)
            valid = valid.reshape(nloc)
            pb = tabulate_elements(sp, ids, order=order)
            pts = jax.tree.map(lambda a: a[:, 0], _points_of(pb))
            K, F = jax.vmap(lambda p: system(p, ctx))(pts)
            K = K.reshape(nloc, dof, nen * dof).astype(dt)
            F = F.reshape(nloc, dof).astype(dt)
            # Dirichlet rows -> interpolation equation
            m = mask_all[ids].astype(dt)  # (nloc, dof)
            v = vals_all[ids].astype(dt)
            interp = jnp.zeros((nloc, dof, nen, dof), dt)
            for c in range(dof):
                interp = interp.at[:, c, :, c].set(pts.shape0)
            interp = interp.reshape(nloc, dof, nen * dof)
            K = K * (1 - m[:, :, None]) + interp * m[:, :, None]
            F = jnp.where(m > 0, v, F)
            vmask = valid.astype(dt)
            K = K * vmask[:, None, None]
            F = F * vmask[:, None]
            slots = slot_all[ids]  # (nloc, nen)
            Kb = K.reshape(nloc, dof, nen, dof).transpose(0, 2, 1, 3)
            data = jnp.zeros((nloc * st.K, dof, dof), dt)
            rows = (jnp.arange(nloc, dtype=jnp.int32)[:, None] * st.K
                    + slots)
            data = data.at[rows.reshape(-1)].add(
                Kb.reshape(-1, dof, dof)
            )
            return (
                data.reshape(Lrev + (st.K, dof, dof)),
                F.reshape(Lrev + (dof,)),
            )

        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec()),
            out_specs=(self.grid_spec(3), self.grid_spec(1)),
            check_vma=False,
        )
        return shard(ids_b, valid_b)

    def solve_collocation(self, system, ctx=None, *, rtol=1e-8,
                          order=None, maxiter=10000, solver="gmres",
                          pc="jacobi", **kw):
        """Distributed collocation assemble + nonsymmetric Krylov solve
        (collocation operators are nonsymmetric)."""
        data, F = self.assemble_collocation(system, ctx, order=order)
        solve = {"bicgstab": self.bicgstab, "gmres": self.gmres}[solver]
        x, k, res = solve(data, F, rtol=rtol, maxiter=maxiter, pc=pc, **kw)
        return self.crop_flat(x), {"iters": int(k), "residual": float(res)}

    def _halo_shell(self, x_loc):
        """Extended local block holding ONLY the received halo shells
        (interior zeroed) — the collective-dependent part of the
        exchanged vector."""
        dim = self.space.dim
        p = self.widths
        ext = self.halo_gather(x_loc)
        interior = tuple(
            slice(p[dim - 1 - g], p[dim - 1 - g] + x_loc.shape[g])
            for g in range(dim)
        ) + (slice(None),)
        return ext.at[interior].set(0.0)

    def local_pallas_planes(self, data_loc):
        """Pack a local operator block (L_rev..., K, dof, dof) into the
        per-device Pallas plane layout — once per solve, inside
        shard_map.  Returns None when the kernel is disabled or the
        layout is unsupported."""
        if self._pk is None:
            return None
        dof = self.space.dof
        return self._pk.pack_planes(
            data_loc.reshape(tuple(self.L[::-1]) + (self.st.K * dof * dof,))
        )

    def _pallas_apply_ext(self, DT_loc, x_ext):
        """Kernel apply on an extended local block -> (L_rev..., dof)."""
        pk = self._pk
        y = pk._kernel(DT_loc, pk.pack_ext(x_ext))
        return pk._unpack_y(y).reshape(
            tuple(self.L[::-1]) + (self.space.dof,)
        )

    def matvec_local(self, data_loc, x_loc, overlap=True, DT_loc=None):
        """Local SpMV with forward halo (inside shard_map):
        data_loc (L_rev..., K, dof, dof), x_loc (L_rev..., dof).

        With ``overlap`` (default) the apply is split so the ppermute
        halo exchange overlaps the interior compute — the comm/compute
        overlap the reference's split-phase VecScatterBegin/End never
        achieves (petigavec.c:147-211): the bulk term
        ``stencil_apply(data, zero-padded local x)`` has no collective
        dependence, so XLA schedules it between collective-permute-start
        and -done; only the O(surface·p) frame correction waits for the
        halo.

        With ``DT_loc`` (from :meth:`local_pallas_planes`) the bulk
        apply runs through the flat Pallas kernel instead of the XLA
        slot loop; the O(surface·p) frame correction stays XLA."""
        offs = self.st.slot_offsets()
        sp = self.space
        dim = sp.dim
        p = self.widths
        Lrev = x_loc.shape[:dim]
        if overlap:
            for g in range(dim):
                if p[dim - 1 - g] > 0 and Lrev[g] < 2 * p[dim - 1 - g]:
                    overlap = False  # face slabs would overlap
        pad = [(p[dim - 1 - g],) * 2 for g in range(dim)] + [(0, 0)]
        if not overlap:
            xp = self.halo_gather(x_loc)
            if DT_loc is not None and self._pk is not None:
                return self._pallas_apply_ext(DT_loc, xp)
            return stencil_apply(data_loc, xp, self.widths, offs)

        # interior: depends only on the local block
        xp0 = jnp.pad(x_loc, pad)
        if DT_loc is not None and self._pk is not None:
            y = self._pallas_apply_ext(DT_loc, xp0)
        else:
            y = stencil_apply(data_loc, xp0, self.widths, offs)

        # frame correction from the halo-only shell, onion-decomposed so
        # every boundary row is corrected exactly once
        h = self._halo_shell(x_loc)
        for g in range(dim):
            d = dim - 1 - g
            pd = p[d]
            if pd == 0:
                continue
            for side in (0, 1):
                out_sl, h_sl = [], []
                for g2 in range(dim):
                    d2 = dim - 1 - g2
                    p2 = p[d2]
                    L2 = Lrev[g2]
                    if g2 < g:
                        out_sl.append(slice(p2, L2 - p2))
                        h_sl.append(slice(p2, L2 + p2))
                    elif g2 == g:
                        if side == 0:
                            out_sl.append(slice(0, pd))
                            h_sl.append(slice(0, 3 * pd))
                        else:
                            out_sl.append(slice(L2 - pd, L2))
                            h_sl.append(slice(L2 - pd, L2 + 2 * pd))
                    else:
                        out_sl.append(slice(0, L2))
                        h_sl.append(slice(0, L2 + 2 * p2))
                dslab = data_loc[tuple(out_sl) + (slice(None),) * 3]
                hwin = h[tuple(h_sl) + (slice(None),)]
                corr = stencil_apply(dslab, hwin, self.widths, offs)
                y = y.at[tuple(out_sl) + (slice(None),)].add(corr)
        return y

    def _psum_all(self, v):
        return jax.lax.psum(v, tuple(self.names))

    def _jacobi_inv(self, data_loc):
        diag_slot = self.st.diag_slot
        dvals = jnp.diagonal(
            data_loc[..., diag_slot, :, :], axis1=-2, axis2=-1
        )
        return jnp.where(
            dvals != 0, 1.0 / jnp.where(dvals == 0, 1.0, dvals), 1.0
        )

    def _pc_local(self, data_loc, pc):
        """Per-device preconditioner application ``Mv(r)`` built inside
        the shard_map region.  ``pc``: None/"none" (identity), "jacobi"
        (point diagonal — PCJACOBI), "pbjacobi" (dof×dof diagonal blocks
        — the BAIJ point-block PC natural for dof>1 systems), or a
        callable ``(dist, data_loc) -> Mv`` for user preconditioners
        (e.g. :func:`schwarz_local_preconditioner`)."""
        if callable(pc):
            return pc(self, data_loc)
        if pc in (None, False, "none"):
            return lambda r: r
        if pc in (True, "jacobi"):
            dinv = self._jacobi_inv(data_loc)
            return lambda r: r * dinv
        if pc == "pbjacobi":
            D = data_loc[..., self.st.diag_slot, :, :]  # (L_rev..., dof, dof)
            dof = self.space.dof
            # guard EVERY singular block, not just all-zero ones (a zero
            # diagonal entry with nonzero in-block coupling would pass
            # jnp.linalg.inv and poison the solve with inf/nan —
            # PCPBJACOBI's zero-pivot handling): fall back to the
            # scalar-Jacobi inverse of that block's diagonal.
            det = jnp.linalg.det(D)
            dmax = jnp.max(jnp.abs(D), axis=(-2, -1))
            bad = jnp.abs(det) <= 1e-12 * jnp.maximum(dmax, 1.0) ** dof
            Dsafe = jnp.where(
                bad[..., None, None], jnp.eye(dof, dtype=D.dtype), D
            )
            Dinv = jnp.linalg.inv(Dsafe)
            diag = jnp.diagonal(D, axis1=-2, axis2=-1)
            sinv = jnp.where(diag != 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 1.0)
            Sinv = sinv[..., :, None] * jnp.eye(dof, dtype=D.dtype)
            Dinv = jnp.where(bad[..., None, None], Sinv, Dinv)
            return lambda r: jnp.einsum("...ab,...b->...a", Dinv, r)
        raise ValueError(f"unknown preconditioner {pc!r}")

    def _cg_local(self, data_loc, b_loc, *, rtol=1e-8, atol=0.0,
                  maxiter=10000, pc="jacobi"):
        """Per-device preconditioned CG body (inside shard_map): halos
        via ppermute (overlapped), reductions via psum."""
        sp = self.space
        dof = sp.dof
        st = self.st
        data_loc = data_loc.reshape(tuple(self.L[::-1]) + (st.K, dof, dof))
        b_loc = b_loc.reshape(tuple(self.L[::-1]) + (dof,))
        Mv = self._pc_local(data_loc, pc)
        DT_loc = self.local_pallas_planes(data_loc)  # once per solve
        Av = lambda v: self.matvec_local(data_loc, v, DT_loc=DT_loc)

        def dot(a, c):
            return self._psum_all(jnp.sum(a * c))

        x = jnp.zeros_like(b_loc)
        r = b_loc - Av(x)
        z = Mv(r)
        pvec = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(b_loc, b_loc))
        tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

        def cond(stt):
            x, r, z, pv, rz, k = stt
            return (dot(r, r) > tol2) & (k < maxiter)

        def step(stt):
            x, r, z, pv, rz, k = stt
            Ap = Av(pv)
            alpha = rz / dot(pv, Ap)
            x = x + alpha * pv
            r = r - alpha * Ap
            z = Mv(r)
            rznew = dot(r, z)
            pv = z + (rznew / rz) * pv
            return (x, r, z, pv, rznew, k + 1)

        x, r, z, pv, rz, k = jax.lax.while_loop(
            cond, step, (x, r, z, pvec, rz, 0)
        )
        res = jnp.sqrt(dot(r, r))
        return x, k, res

    def _bicgstab_local(self, data_loc, b_loc, *, rtol=1e-8, atol=0.0,
                        maxiter=10000, pc="jacobi"):
        """Per-device preconditioned BiCGStab body (inside shard_map) —
        the nonsymmetric-solver counterpart of :meth:`_cg_local`
        (advection/SUPG, VMS Navier-Stokes operators)."""
        sp = self.space
        dof = sp.dof
        st = self.st
        data_loc = data_loc.reshape(tuple(self.L[::-1]) + (st.K, dof, dof))
        b_loc = b_loc.reshape(tuple(self.L[::-1]) + (dof,))
        dt = b_loc.dtype
        Mv = self._pc_local(data_loc, pc)
        DT_loc = self.local_pallas_planes(data_loc)  # once per solve
        Av = lambda v: self.matvec_local(data_loc, v, DT_loc=DT_loc)

        def dot(a, c):
            return self._psum_all(jnp.sum(a * c))

        x = jnp.zeros_like(b_loc)
        r = b_loc - Av(x)
        rhat = r
        bnorm = jnp.sqrt(dot(b_loc, b_loc))
        tol2 = jnp.maximum(rtol * bnorm, atol) ** 2
        one = jnp.asarray(1.0, dt)
        v = pvec = jnp.zeros_like(b_loc)

        def cond(stt):
            x, r, pv, v, rho, alpha, omega, k = stt
            return (dot(r, r) > tol2) & (k < maxiter)

        def step(stt):
            x, r, pv, v, rho, alpha, omega, k = stt
            rho_new = dot(rhat, r)
            beta = (rho_new / rho) * (alpha / omega)
            pv = r + beta * (pv - omega * v)
            phat = Mv(pv)
            v = Av(phat)
            alpha = rho_new / dot(rhat, v)
            s = r - alpha * v
            shat = Mv(s)
            t = Av(shat)
            omega = dot(t, s) / dot(t, t)
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            return (x, r, pv, v, rho_new, alpha, omega, k + 1)

        st0 = (x, r, pvec, v, one, one, one, 0)
        x, r, pv, v, rho, alpha, omega, k = jax.lax.while_loop(
            cond, step, st0
        )
        return x, k, jnp.sqrt(dot(r, r))

    def _gmres_local(self, data_loc, b_loc, *, rtol=1e-8, atol=0.0,
                     restart=30, maxiter=200, pc="jacobi"):
        """Per-device restarted GMRES(m) body (inside shard_map) with
        left preconditioning.  The Krylov basis is stored shard-local
        ((restart+1, n_loc) per device); every inner product is a psum
        over the mesh, so the Hessenberg matrix H and the least-squares
        solve are bitwise-replicated across devices — the same structure
        PETSc's parallel KSPGMRES gets from MPI_Allreduce dots.

        ``maxiter`` counts INNER iterations (matvecs), like cg/bicgstab:
        it is converted to ``ceil(maxiter/restart)`` full cycles, and the
        reported iteration count ``k·restart`` is an upper bound (the
        final cycle may have needed fewer columns)."""
        maxiter = -(-int(maxiter) // int(restart))  # cycles
        sp = self.space
        dof = sp.dof
        st = self.st
        data_loc = data_loc.reshape(tuple(self.L[::-1]) + (st.K, dof, dof))
        b_loc = b_loc.reshape(tuple(self.L[::-1]) + (dof,))
        dt = b_loc.dtype
        shape = b_loc.shape
        n = b_loc.size
        Mv = self._pc_local(data_loc, pc)
        DT_loc = self.local_pallas_planes(data_loc)  # once per solve
        Av = lambda v: self.matvec_local(data_loc, v, DT_loc=DT_loc)

        def dot(a, c):
            return self._psum_all(jnp.sum(a * c))

        bnorm = jnp.sqrt(dot(b_loc, b_loc))
        tol = jnp.maximum(rtol * bnorm, atol)

        def arnoldi_cycle(x):
            r = Mv(b_loc - Av(x)).reshape(-1)
            beta = jnp.sqrt(dot(r, r))
            V = jnp.zeros((restart + 1, n), dt)
            H = jnp.zeros((restart + 1, restart), dt)
            V = V.at[0].set(jnp.where(beta > 0, r / beta, 0))

            def body(j, VH):
                V, H = VH
                w = Mv(Av(V[j].reshape(shape))).reshape(-1)

                def mgs(i, wH):
                    w, H = wH
                    h = jnp.where(i <= j, dot(V[i], w), 0.0)
                    H = H.at[i, j].set(h)
                    return (w - h * V[i], H)

                w, H = jax.lax.fori_loop(0, restart, mgs, (w, H))
                hn = jnp.sqrt(dot(w, w))
                H = H.at[j + 1, j].set(hn)
                V = V.at[j + 1].set(jnp.where(hn > 1e-30, w / hn, 0))
                return (V, H)

            V, H = jax.lax.fori_loop(0, restart, body, (V, H))
            e1 = jnp.zeros(restart + 1, dt).at[0].set(beta)
            y, *_ = jnp.linalg.lstsq(H, e1)
            return x + (y @ V[:restart]).reshape(shape)

        def cond(stt):
            x, k = stt
            r = b_loc - Av(x)
            return (jnp.sqrt(dot(r, r)) > tol) & (k < maxiter)

        def step(stt):
            x, k = stt
            return (arnoldi_cycle(x), k + 1)

        x, k = jax.lax.while_loop(cond, step, (jnp.zeros_like(b_loc), 0))
        r = b_loc - Av(x)
        return x, k * restart, jnp.sqrt(dot(r, r))

    def _krylov(self, body, data, b, cache_key=None):
        """shard_map a local Krylov body; with ``cache_key``, the
        jitted program is cached on the DistSpace so repeated solves
        with the same parameters reuse ONE executable (a fresh closure
        per call misses the jit cache and re-traces every solve)."""
        fn = None
        if cache_key is not None:
            fn = self._device_jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(self.grid_spec(3), self.grid_spec(1)),
                out_specs=(self.grid_spec(1), P(), P()),
                check_vma=False,
            ))
            if cache_key is not None:
                self._device_jit_cache[cache_key] = fn
        return fn(data, b)

    def cg(self, data, b, *, rtol=1e-8, atol=0.0, maxiter=10000,
           jacobi=True, pc=None):
        """Distributed preconditioned CG: one shard_map region, halos via
        overlapped ppermute, reductions via psum.  Returns
        (x, iters, residual) as (padded sharded grid, scalar, scalar).
        ``pc`` overrides the legacy ``jacobi`` flag — see
        :meth:`_pc_local` for the options."""
        pc = ("jacobi" if jacobi else "none") if pc is None else pc
        return self._krylov(
            lambda d, v: self._cg_local(
                d, v, rtol=rtol, atol=atol, maxiter=maxiter, pc=pc
            ),
            data, b,
            cache_key=("cg", rtol, atol, maxiter, pc),
        )

    def bicgstab(self, data, b, *, rtol=1e-8, atol=0.0, maxiter=10000,
                 jacobi=True, pc=None):
        """Distributed preconditioned BiCGStab (nonsymmetric operators);
        same layout contract as :meth:`cg`."""
        pc = ("jacobi" if jacobi else "none") if pc is None else pc
        return self._krylov(
            lambda d, v: self._bicgstab_local(
                d, v, rtol=rtol, atol=atol, maxiter=maxiter, pc=pc
            ),
            data, b,
            cache_key=("bicgstab", rtol, atol, maxiter, pc),
        )

    def gmres(self, data, b, *, rtol=1e-8, atol=0.0, restart=30,
              maxiter=200, pc="jacobi"):
        """Distributed restarted GMRES(m) — the general nonsymmetric
        solver (the parallel KSPGMRES the reference gets from PETSc,
        petigaksp.c:260-384); same layout contract as :meth:`cg`."""
        return self._krylov(
            lambda d, v: self._gmres_local(
                d, v, rtol=rtol, atol=atol, restart=restart,
                maxiter=maxiter, pc=pc
            ),
            data, b,
            cache_key=("gmres", rtol, atol, restart, maxiter, pc),
        )

    # ------------------------------------------------------------ functionals

    def compute_scalar(self, functional, U=None, ctx=None, *, order=None):
        """Distributed IGAComputeScalar (petigacomp.c:35-90): per-device
        quadrature sums, then ``psum`` over the mesh — the MPI_Allreduce
        at petigacomp.c:84.  Returns the replicated (nsc,) result, so
        e.g. the CahnHilliard free-energy monitor runs sharded."""
        from ..assembly.assemble import _probe_functional

        sp = self.space
        dof = sp.dof
        dt = sp.dtype
        if U is not None and U.ndim == 2 and U.shape[0] == sp.nnodes:
            U = self.pad_grid(U)
        Uv_probe = None if U is None else jnp.zeros((sp.nnodes, dof), dt)
        nsc = jax.eval_shape(
            lambda: _probe_functional(sp, functional, Uv_probe, ctx, order)
        ).shape[0]

        def local(elem_ids, elem_valid, *maybe_U):
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            pb = tabulate_elements(sp, ids, order=order)
            Ue = None
            if maybe_U:
                loc_rows, _ = self._local_rows(ids)
                Uext = self.halo_gather(maybe_U[0]).reshape(-1, dof)
                Ue = Uext[loc_rows]

            def body(a, pt, w):
                if Ue is None:
                    s = jax.vmap(
                        lambda p_: jnp.atleast_1d(functional(p_, None, ctx))
                    )(pt)
                else:
                    s = jax.vmap(
                        lambda p_, ue: jnp.atleast_1d(functional(p_, ue, ctx))
                    )(pt, Ue)
                w = w * valid.astype(dt)
                return a + jnp.sum(w[:, None] * s, axis=0)

            acc = _scan_points(pb, body, jnp.zeros((nsc,), dt))
            return self._psum_all(acc)

        has_U = U is not None
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec())
            + ((self.grid_spec(1),) if has_U else ()),
            out_specs=P(),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid)]
        if has_U:
            args.append(U)
        return shard(*args)

    def compute_error_norm(self, U, exact, k: int = 0, ctx=None, *,
                           order=None):
        """Distributed IGAComputeErrorNorm (petigacomp.c:102-186): L2
        (k=0) or H^k-seminorm of u - u_exact with the psum reduction."""
        def err2(pt, Ue, _):
            if k == 0:
                e = pt.value(Ue) - exact(pt.x)
            elif k == 1:
                e = pt.grad(Ue) - exact(pt.x)
            elif k == 2:
                e = pt.hess(Ue) - exact(pt.x)
            elif k == 3:
                e = pt.der3(Ue) - exact(pt.x)
            elif k == 4:
                e = pt.der4(Ue) - exact(pt.x)
            else:
                raise ValueError("k must be in 0..4")
            return jnp.sum(e * e)

        val = self.compute_scalar(
            err2, U, ctx, order=max(k, 1) if order is None else order
        )
        return jnp.sqrt(val[0])

    # ------------------------------------------------------------ high level

    def solve_system(self, system, ctx=None, *, rtol=1e-8, order=None,
                     maxiter=10000, boundary=None, solver="cg", pc=None):
        """Assemble + Krylov solve in one call; returns the flat
        (nnodes, dof) solution (gathered/cropped) plus info."""
        data, b = self.assemble_system(system, ctx, order=order,
                                       boundary=boundary)
        solve = {"cg": self.cg, "bicgstab": self.bicgstab,
                 "gmres": self.gmres}[solver]
        kw = {} if pc is None else {"pc": pc}
        x, k, res = solve(data, b, rtol=rtol, maxiter=maxiter, **kw)
        return self.crop_flat(x), {"iters": int(k), "residual": float(res)}


class DistThetaStepper:
    """Distributed θ-method (TSTHETA under domain decomposition): the
    stage residual of solve/ts.ThetaStepper driven by DistSpace.newton —
    IGAComputeIFunction's MPI loop (petigats.c:23-90) becomes per-device
    element residuals with halo folds."""

    def __init__(self, ds: DistSpace, ifunction: Callable, theta=0.5,
                 ctx=None, newton_kw=None):
        self.ds, self.ifn, self.theta = ds, ifunction, theta
        self.ctx = ctx
        self.newton_kw = newton_kw or {}

    def step(self, U, t, dt):
        ds, th, ifn = self.ds, self.theta, self.ifn

        def form(pt, Xe, aux_e, c):
            U0e = aux_e["U0"]
            Ue = U0e + th * (Xe - U0e)
            Ve = (Xe - U0e) / dt
            return ifn(pt, th / dt, Ve, t + th * dt, Ue, c)

        U = jnp.asarray(U).reshape(ds.space.nnodes, ds.space.dof)
        U1, info = ds.newton(form, U, self.ctx, aux={"U0": U},
                             **self.newton_kw)
        return U1, info


class DistAlphaStepper:
    """Distributed generalized-α for first-order systems (TSALPHA over
    the device mesh; the reference runs CahnHilliard this way under MPI).
    Same stage algebra as solve/ts.AlphaStepper; the Newton solve, halo
    exchanges, and reductions run distributed."""

    def __init__(self, ds: DistSpace, ifunction: Callable, rho_inf=0.5,
                 ctx=None, newton_kw=None):
        self.ds, self.ifn = ds, ifunction
        r = rho_inf
        self.am = 0.5 * (3 - r) / (1 + r)
        self.af = 1.0 / (1 + r)
        self.g = 0.5 + self.am - self.af
        self.ctx = ctx
        self.newton_kw = newton_kw or {}

    def step(self, U, V, t, dt):
        ds, ifn = self.ds, self.ifn
        am, af, g = self.am, self.af, self.g

        def form(pt, Xe, aux_e, c):
            U0e, V0e = aux_e["U0"], aux_e["V0"]
            V1e = (Xe - U0e) / (g * dt) + (1 - 1 / g) * V0e
            Uaf = U0e + af * (Xe - U0e)
            Vam = V0e + am * (V1e - V0e)
            shift = am * af / (g * dt)
            return ifn(pt, shift, Vam, t + af * dt, Uaf, c)

        sp = ds.space
        U = jnp.asarray(U).reshape(sp.nnodes, sp.dof)
        V = jnp.asarray(V).reshape(sp.nnodes, sp.dof)
        U1, info = ds.newton(form, U, self.ctx, aux={"U0": U, "V0": V},
                             **self.newton_kw)
        V1 = (U1 - U) / (g * dt) + (1 - 1 / g) * V
        return U1, V1, info
