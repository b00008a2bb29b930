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
    _fix_arrays,
    _fix_system,
    _normalize_F,
    _normalize_K,
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

    def __init__(self, space, devices=None, pgrid=None):
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
                        apply_fix=True):
        """Distributed IGAComputeSystem: per-device element batches,
        local scatter into an extended block, reverse-halo fold.

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
        mapping_np = sp.mapping  # host
        slot = jnp.asarray(st.slot_table(sp.nen_shape))
        names = self.names

        # per-axis unwrapped closure index tables (replicated constants)
        offs = [jnp.asarray(sp.tabs[d].offset) for d in range(dim)]
        mapping = sp.device("mapping")
        flux = boundary_flux_vector(sp)
        dir_mask = sp.device("dirichlet")[0] if apply_fix else None

        Lext = tuple(L[d] + 2 * p[d] for d in range(dim))
        next_ext = int(np.prod(Lext))

        def local(elem_ids, elem_valid):
            # leading mesh axes are size 1 inside shard_map
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order)
            emap = mapping[ids]

            def body(acc, pt, w):
                Ka, Fa = acc
                Kq, Fq = jax.vmap(lambda pp: system(pp, ctx))(pt)
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

            # local extended row index per (element, a): unwrapped per-axis
            # index - block start + halo width
            eshape = sp.elem_shape
            rem = ids
            loc_rows = jnp.zeros((B, nen), jnp.int32)
            stride = 1
            # local basis multi-indices (axis-0 fastest) — static
            grids = np.meshgrid(*[np.arange(n) for n in sp.nen_shape],
                                indexing="ij")
            locs = [jnp.asarray(g.ravel(order="F")) for g in grids]
            for d in range(dim):
                e_d = rem % eshape[d]
                rem = rem // eshape[d]
                r_d = jax.lax.axis_index(names[d])
                idx = offs[d][e_d][:, None] + locs[d][None, :]  # (B, nen)
                idx = idx - r_d * L[d] + p[d]
                loc_rows = loc_rows + idx.astype(jnp.int32) * stride
                stride *= Lext[d]

            data_ext = jnp.zeros((next_ext * K, dof, dof), dt)
            b_ext = jnp.zeros((next_ext, dof), dt)
            Keb = Ke.reshape(B, nen, dof, nen, dof).transpose(0, 1, 3, 2, 4)
            sidx = loc_rows[:, :, None] * K + slot[None, :, :]
            data_ext = data_ext.at[sidx.reshape(-1)].add(
                Keb.reshape(-1, dof, dof), mode="drop"
            )
            b_ext = b_ext.at[loc_rows.reshape(-1)].add(
                Fe.reshape(B, nen, dof).reshape(-1, dof), mode="drop"
            )

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

        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec()),
            out_specs=(self.grid_spec(3), self.grid_spec(1)),
            check_vma=False,
        )
        data, b = shard(
            jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid)
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

    def assemble_function(self, function, U, ctx=None, *, aux=None,
                          order=None):
        """Distributed IGAComputeFunction: halo-gather U, per-device
        element residuals with fix-value semantics, reverse-halo fold.
        U and aux values are padded sharded grids (Np_rev..., dof)."""
        from ..assembly.assemble import _element_residual

        sp = self.space
        dim, dof, nen = sp.dim, sp.dof, sp.nen
        dt = sp.dtype
        mapping = sp.device("mapping")
        flux = boundary_flux_vector(sp)

        def local(elem_ids, elem_valid, U_loc, *aux_locs):
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order)
            emap = mapping[ids]
            loc_rows, Lext = self._local_rows(ids)
            Uext = self.halo_gather(U_loc).reshape(-1, dof)
            Ue = Uext[loc_rows]  # (B, nen, dof)
            aux_e = None
            if aux is not None:
                aux_e = {}
                for (k, _), al in zip(aux.items(), aux_locs):
                    ext = self.halo_gather(al)
                    aux_e[k] = ext.reshape(-1, ext.shape[-1])[loc_rows]
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
            b_ext = b_ext.reshape(tuple(Lext[::-1]) + (dof,))
            return self.halo_fold(b_ext).reshape(tuple(self.L[::-1]) + (dof,))

        naux = 0 if aux is None else len(aux)
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec(), self.grid_spec(1))
            + (self.grid_spec(1),) * naux,
            out_specs=self.grid_spec(1),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid), U]
        if aux is not None:
            args += list(aux.values())
        F = shard(*args)
        if flux is not None:
            mask = sp.device("dirichlet")[0]
            F = F - self.pad_grid(jnp.where(mask, 0.0, flux.astype(dt)))
        return F

    def assemble_jacobian(self, function, U, ctx=None, *, aux=None,
                          order=None):
        """Distributed IGAComputeJacobian via forward AD of the element
        residual; same layout as :meth:`assemble_system`'s A_data."""
        from ..assembly.assemble import _element_residual

        sp = self.space
        dim, dof, nen = sp.dim, sp.dof, sp.nen
        dt = sp.dtype
        st = self.st
        K = st.K
        mapping = sp.device("mapping")
        slot = jnp.asarray(st.slot_table(sp.nen_shape))

        def local(elem_ids, elem_valid, U_loc, *aux_locs):
            ids = elem_ids.reshape(-1)
            valid = elem_valid.reshape(-1)
            B = ids.shape[0]
            pb = tabulate_elements(sp, ids, order=order)
            emap = mapping[ids]
            loc_rows, Lext = self._local_rows(ids)
            Uext = self.halo_gather(U_loc).reshape(-1, dof)
            Ue = Uext[loc_rows]
            aux_e = None
            if aux is not None:
                aux_e = {}
                for (k, _), al in zip(aux.items(), aux_locs):
                    ext = self.halo_gather(al)
                    aux_e[k] = ext.reshape(-1, ext.shape[-1])[loc_rows]
            m, v = _fix_arrays(sp, emap)

            def elem_res(ue_flat, pb_e, m_e, v_e, aux_el):
                pb1 = jax.tree.map(lambda a: a[None], pb_e)
                aux1 = (
                    None if aux_el is None
                    else jax.tree.map(lambda a: a[None], aux_el)
                )
                r = _element_residual(
                    sp, function, ctx, pb1, ue_flat.reshape(1, nen, dof),
                    m_e[None], v_e[None], ue_flat[None], order, aux1,
                )
                return r[0]

            if aux_e is None:
                Je = jax.vmap(
                    lambda u, pp, mm, vv: jax.jacfwd(elem_res)(u, pp, mm, vv, None)
                )(Ue.reshape(B, nen * dof), pb, m, v)
            else:
                Je = jax.vmap(jax.jacfwd(elem_res))(
                    Ue.reshape(B, nen * dof), pb, m, v, aux_e
                )
            Je = Je * valid.astype(dt)[:, None, None]
            next_ext = int(np.prod(Lext))
            data_ext = jnp.zeros((next_ext * K, dof, dof), dt)
            Jb = Je.reshape(B, nen, dof, nen, dof).transpose(0, 1, 3, 2, 4)
            sidx = loc_rows[:, :, None] * K + slot[None, :, :]
            data_ext = data_ext.at[sidx.reshape(-1)].add(
                Jb.reshape(-1, dof, dof), mode="drop"
            )
            data_ext = data_ext.reshape(tuple(Lext[::-1]) + (K * dof * dof,))
            return self.halo_fold(data_ext).reshape(
                tuple(self.L[::-1]) + (K, dof, dof)
            )

        naux = 0 if aux is None else len(aux)
        shard = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self.elem_spec(), self.elem_spec(), self.grid_spec(1))
            + (self.grid_spec(1),) * naux,
            out_specs=self.grid_spec(3),
            check_vma=False,
        )
        args = [jnp.asarray(self.elem_ids), jnp.asarray(self.elem_valid), U]
        if aux is not None:
            args += list(aux.values())
        return shard(*args)

    def newton(self, function, U0, ctx=None, *, rtol=1e-8, maxit=20,
               linear_rtol=1e-8, order=None, aux=None):
        """Distributed Newton-Krylov (SNES analog over the device mesh).
        U0: flat (nnodes, dof) or padded sharded grid.  ``aux``: dict of
        flat (nnodes, c) state vectors (the IFunction multi-state
        mechanism); with aux the form signature is
        ``function(pt, Xe, aux_e, ctx)``."""
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

        def fnorm(F):
            return jnp.sqrt(jnp.sum(F * F))

        U = U0
        F = self.assemble_function(function, U, ctx, aux=aux, order=order)
        f0 = float(fnorm(F))
        tol = max(rtol * f0, 1e-30)
        k = 0
        while float(fnorm(F)) > tol and k < maxit:
            data = self.assemble_jacobian(function, U, ctx, aux=aux,
                                          order=order)
            dx, it, res = self.cg(data, F, rtol=linear_rtol)
            U = U - dx
            F = self.assemble_function(function, U, ctx, aux=aux, order=order)
            k += 1
        return self.crop_flat(U), {"iters": k, "fnorm": float(fnorm(F))}

    # ------------------------------------------------------------------ spmv

    def matvec_local(self, data_loc, x_loc):
        """Local SpMV with forward halo (inside shard_map):
        data_loc (L_rev..., K, dof, dof), x_loc (L_rev..., dof)."""
        xp = self.halo_gather(x_loc)
        return stencil_apply(
            data_loc, xp, self.widths, self.st.slot_offsets()
        )

    def _psum_all(self, v):
        return jax.lax.psum(v, tuple(self.names))

    def cg(self, data, b, *, rtol=1e-8, atol=0.0, maxiter=10000,
           jacobi=True):
        """Distributed preconditioned CG: one shard_map region, halos via
        ppermute, reductions via psum.  Returns (x, iters, residual) as
        (padded sharded grid, scalar, scalar)."""
        sp = self.space
        dim, dof = sp.dim, sp.dof
        st = self.st
        diag_slot = st.diag_slot

        def region(data_loc, b_loc):
            data_loc = data_loc.reshape(
                tuple(self.L[::-1]) + (st.K, dof, dof)
            )
            b_loc = b_loc.reshape(tuple(self.L[::-1]) + (dof,))

            if jacobi:
                dvals = jnp.diagonal(
                    data_loc[..., diag_slot, :, :], axis1=-2, axis2=-1
                )
                dinv = jnp.where(dvals != 0, 1.0 / jnp.where(dvals == 0, 1.0, dvals), 1.0)
                Mv = lambda r: r * dinv
            else:
                Mv = lambda r: r

            Av = lambda v: self.matvec_local(data_loc, v)

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

        shard = jax.shard_map(
            region,
            mesh=self.mesh,
            in_specs=(self.grid_spec(3), self.grid_spec(1)),
            out_specs=(self.grid_spec(1), P(), P()),
            check_vma=False,
        )
        return shard(data, b)

    # ------------------------------------------------------------ high level

    def solve_system(self, system, ctx=None, *, rtol=1e-8, order=None,
                     maxiter=10000):
        """Assemble + CG in one call; returns the flat (nnodes, dof)
        solution (gathered/cropped) plus info."""
        data, b = self.assemble_system(system, ctx, order=order)
        x, k, res = self.cg(data, b, rtol=rtol, maxiter=maxiter)
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
