"""Matrix-free sum-factorized operator application.

For variable-coefficient reaction-diffusion forms

    a(u, v) = ∫ c(x) u v + κ(x) ∇u·∇v

the operator is applied without ever forming element matrices: element
closures are gathered by shifted slices (regular spaces — the same
translation invariance the shift assembly uses), values/gradients at
quadrature points come from per-axis *sum-factorized* contractions
(small batched matmuls on the MXU: O(p^{d+1}) instead of O(p^{2d}) per
dof), and the transpose chain scatters back with shifted adds.

This is the preferred operator for high degree and for Newton loops
(no reassembly); the assembled stencil remains the fast path for low-p
SpMV-heavy solves.  (No analog in the reference, which always assembles;
cf. the matrix-free literature referenced in PAPERS.md.)
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly.fastpath import _steps, is_regular

__all__ = ["MatFreeOperator", "JacobianFreeOperator"]


class MatFreeOperator:
    """y = A x for a(u,v) = ∫ v_a C_ab u_b + ∇v_a · K_ab ∇u_b.

    dof = 1: ``c`` and ``kappa`` are scalars (the classic
    reaction-diffusion form).  dof > 1: pass ``C``/``Kmat`` as (dof,dof)
    coefficient matrices coupling the fields (e.g. multi-species
    reaction-diffusion; zero entries are skipped statically, so the cost
    is one sum-factorized pass per NONZERO block).  Dirichlet rows/cols
    follow the assembled semantics (eliminated, diagonal = element
    multiplicity).

    Supported spaces: any *regular* space — maximal or reduced
    continuity (element steps > 1 become strided slice gathers), open or
    periodic axes, and non-rational mapped geometry (pointwise metric
    precomputed at quadrature points; see ``__init__``).  Rational
    (NURBS) weights and manifold embeddings (nsd != dim) fall back to
    the assembled operator.  ``scalar_diagonal`` is exact for the
    identity map and a spectrally-equivalent estimate under mapping
    (fine for Jacobi preconditioning).
    """

    def __init__(self, space, c=0.0, kappa=1.0, C=None, Kmat=None,
                 zchunk: Optional[int] = None):
        if not is_regular(space):
            raise ValueError("matrix-free apply requires a regular space")
        self.space = space
        self.steps = _steps(space)
        self.off0 = tuple(int(t.offset[0]) for t in space.tabs)
        # chunked apply: bound the gather/eval temporaries to zchunk
        # element slabs of the slowest axis at a time (a fori_loop of
        # windowed sum-factorized applies) — required at 256³ where the
        # unchunked closures alone are ~1.8 GB per field.  Open slowest
        # axis only; zchunk is rounded down to a divisor of E_z.
        self.zchunk = None
        if zchunk is not None and space.dim > 1 and not space.periodic[-1]:
            kz = max(1, min(int(zchunk), space.elem_shape[-1]))
            while space.elem_shape[-1] % kz:
                kz -= 1
            self.zchunk = kz
        dof = space.dof
        self.C = np.asarray(
            C if C is not None else np.eye(dof) * c, np.float64
        ).reshape(dof, dof)
        self.Kmat = np.asarray(
            Kmat if Kmat is not None else np.eye(dof) * kappa, np.float64
        ).reshape(dof, dof)
        # dof=1 compatibility attributes
        self.c = float(self.C[0, 0])
        self.kappa = float(self.Kmat[0, 0])
        sp = space
        dim = sp.dim
        dt = sp.dtype
        # per-axis tables: value/derivative (nel_d, nqp_d, p_d+1)
        self.B0 = [jnp.asarray(t.value[:, :, 0, :], dt) for t in sp.tabs]
        self.B1 = [jnp.asarray(t.value[:, :, 1, :], dt) for t in sp.tabs]
        # quadrature weights incl. parametric detJac, separable
        self.w1d = [
            jnp.asarray(t.weight * t.detJac[:, None], dt) for t in sp.tabs
        ]
        mask, _ = sp.dirichlet_mask()
        self.fixed = jnp.asarray(mask)  # (nnodes, dof)
        mult = np.zeros(sp.nnodes)
        np.add.at(mult, sp.mapping.ravel(), 1.0)
        self.mult = jnp.asarray(mult, dt)

        # mapped geometry: pointwise metric G = J^{-1} J^{-T} detJ and
        # detJ at every quadrature point (computed once by the same
        # sum-factorized pipeline; the per-axis tables stay separable,
        # only these pointwise factors are dense) — covers the
        # reference's mapped-domain operators (petigarat/petigatabs
        # pushforward) without assembling.
        self._G = None
        self._detJ = None
        if sp.has_geometry:
            if sp.is_rational:
                raise ValueError(
                    "rational (NURBS) geometry is not supported "
                    "matrix-free; use the assembled stencil operator"
                )
            if sp.nsd != dim:
                raise ValueError(
                    "matrix-free geometry requires nsd == dim "
                    "(no manifold embedding)"
                )
            X = jnp.asarray(sp.geometry, dt)  # (nnodes, dim)
            N = sp.node_shape
            Jcols = []
            for dpar in range(dim):
                tabs = [
                    self.B1[d] if d == dpar else self.B0[d]
                    for d in range(dim)
                ]
                rows = []
                for i in range(dim):
                    xe = self._gather(X[:, i].reshape(tuple(N[::-1])))
                    rows.append(self._contract(xe, tabs))
                Jcols.append(jnp.stack(rows, axis=-1))  # (..., i)
            J = jnp.stack(Jcols, axis=-1)  # (E_rev..., q_rev..., i, dpar)
            detJ = jnp.linalg.det(J)
            Jinv = jnp.linalg.inv(J)
            self._detJ = detJ
            self._G = (
                jnp.einsum("...ik,...jk->...ij", Jinv, Jinv)
                * detJ[..., None, None]
            )

    # ------------------------------------------------------------ gather

    def _gather(self, xg):
        """Element closures from the node grid by (strided) shifted
        slices: out[(e_rev...), (a_rev...)] = x[off0 + s*e + a] — the
        arithmetic-progression offset structure of any regular axis
        (step s > 1 = repeated interior knots / reduced continuity)."""
        sp = self.space
        dim = sp.dim
        E = sp.elem_shape
        nsh = sp.nen_shape
        parts = []
        for amulti in np.ndindex(*nsh[::-1]):  # reversed order (a_z, a_y, a_x)
            block = xg
            for g in range(dim):
                d = dim - 1 - g
                a_d = amulti[g]
                if sp.periodic[d]:
                    block = jnp.roll(block, -a_d, axis=g)
                    block = jax.lax.slice_in_dim(block, 0, E[d], axis=g)
                else:
                    s = self.steps[d]
                    start = self.off0[d] + a_d
                    block = jax.lax.slice_in_dim(
                        block, start, start + s * (E[d] - 1) + 1,
                        stride=s, axis=g,
                    )
            parts.append(block)
        out = jnp.stack(parts, axis=-1)  # (E_rev..., nen) a-rev-flat
        return out.reshape(tuple(E[::-1]) + tuple(nsh[::-1]))

    def _scatter(self, ye):
        """Transpose of _gather: node grid from per-(element, a) values."""
        sp = self.space
        dim = sp.dim
        E = sp.elem_shape
        N = sp.node_shape
        nsh = sp.nen_shape
        unit = all(s == 1 for s in self.steps)
        yg = jnp.zeros(tuple(N[::-1]), ye.dtype)
        for amulti in np.ndindex(*nsh[::-1]):
            block = ye[(Ellipsis,) + tuple(amulti)]
            if unit and all(self.off0[d] == 0 for d in range(dim)):
                g2 = block
                for g in range(dim):
                    d = dim - 1 - g
                    a_d = amulti[g]
                    if sp.periodic[d]:
                        g2 = jnp.roll(g2, a_d, axis=g) if E[d] == N[d] else g2
                    else:
                        pad = [(0, 0)] * g2.ndim
                        pad[g] = (a_d, N[d] - E[d] - a_d)
                        g2 = jnp.pad(g2, pad)
                yg = yg + g2
            else:
                sl = []
                for g in range(dim):
                    d = dim - 1 - g
                    a_d = amulti[g]
                    if sp.periodic[d]:  # step-1 wrap (is_regular invariant)
                        block = jnp.roll(block, a_d, axis=g)
                        sl.append(slice(0, N[d], 1))
                    else:
                        s = self.steps[d]
                        start = self.off0[d] + a_d
                        sl.append(
                            slice(start, start + s * (E[d] - 1) + 1, s)
                        )
                yg = yg.at[tuple(sl)].add(block)
        return yg

    # ------------------------------------------------------------- apply

    def matvec(self, x):
        # highest precision: default MXU bf16 matmuls would put ~1e-3
        # relative error in the sum-factorized apply
        with jax.default_matmul_precision("highest"):
            return self._matvec_impl(x)

    def _matvec_impl(self, x):
        sp = self.space
        dof = sp.dof
        N = sp.node_shape
        flat_in = x.ndim == 1
        xv = x.reshape(sp.nnodes, dof)
        xm = jnp.where(self.fixed, 0.0, xv)
        ys = []
        for a in range(dof):
            ya = None
            for b in range(dof):
                cab = float(self.C[a, b])
                kab = float(self.Kmat[a, b])
                if cab == 0.0 and kab == 0.0:
                    continue
                xg = xm[:, b].reshape(tuple(N[::-1]))
                t = self._apply_field(xg, cab, kab)
                ya = t if ya is None else ya + t
            ys.append(
                ya if ya is not None
                else jnp.zeros(sp.nnodes, xv.dtype)
            )
        y = jnp.stack(ys, axis=-1)  # (nnodes, dof)
        y = jnp.where(self.fixed, self.mult[:, None] * xv, y)
        return y.reshape(-1) if flat_in else y

    # forward sum factorization: contract each local axis with its
    # per-element 1-D table → values/derivatives at quad points.
    # Explicit einsums keep the layout (E_rev..., q_rev...) unambiguous.

    def _labels(self):
        dim = self.space.dim
        return "ZYX"[3 - dim:], "zyx"[3 - dim:], "wvu"[3 - dim:]

    def _contract(self, xe, tabs):
        """(E_rev..., a_rev...) closures -> (E_rev..., q_rev...) point
        values for per-axis tables ``tabs``."""
        dim = self.space.dim
        E_LBL, A_LBL, Q_LBL = self._labels()
        out = xe
        cur = list(A_LBL)
        for g in range(dim - 1, -1, -1):  # contract x first
            d = dim - 1 - g
            T = tabs[d]  # (E_d, Q_d, p_d+1)
            lhs = f"{E_LBL[g]}{Q_LBL[g]}{A_LBL[g]}"
            src = E_LBL + "".join(cur)
            cur[g] = Q_LBL[g]
            dst = E_LBL + "".join(cur)
            out = jnp.einsum(f"{lhs},{src}->{dst}", T, out)
        return out

    def _contract_T(self, z, tabs):
        """Transpose of :meth:`_contract`: point values back to
        closures."""
        dim = self.space.dim
        E_LBL, A_LBL, Q_LBL = self._labels()
        out = z
        cur = list(Q_LBL)
        for g in range(dim - 1, -1, -1):
            d = dim - 1 - g
            T = tabs[d]
            lhs = f"{E_LBL[g]}{Q_LBL[g]}{A_LBL[g]}"
            src = E_LBL + "".join(cur)
            cur[g] = A_LBL[g]
            dst = E_LBL + "".join(cur)
            out = jnp.einsum(f"{lhs},{src}->{dst}", T, out)
        return out

    def _gather_win(self, xw, kz):
        """Windowed :meth:`_gather`: closures of ``kz`` z-slabs of
        elements from the x window ``xw`` (rows
        ``[off0_z + ci·kz·s_z, + s_z(kz-1)+p_z+1)`` of the node grid)."""
        sp = self.space
        dim = sp.dim
        E = sp.elem_shape
        nsh = sp.nen_shape
        parts = []
        for amulti in np.ndindex(*nsh[::-1]):
            block = xw
            for g in range(dim):
                d = dim - 1 - g
                a_d = amulti[g]
                s = self.steps[d]
                if g == 0:  # z: window-local, open
                    block = jax.lax.slice_in_dim(
                        block, a_d, a_d + s * (kz - 1) + 1, stride=s, axis=0
                    )
                elif sp.periodic[d]:
                    block = jnp.roll(block, -a_d, axis=g)
                    block = jax.lax.slice_in_dim(block, 0, E[d], axis=g)
                else:
                    start = self.off0[d] + a_d
                    block = jax.lax.slice_in_dim(
                        block, start, start + s * (E[d] - 1) + 1,
                        stride=s, axis=g,
                    )
            parts.append(block)
        out = jnp.stack(parts, axis=-1)
        return out.reshape(
            (kz,) + tuple(E[:-1][::-1]) + tuple(nsh[::-1])
        )

    def _scatter_win(self, ye, kz, Wz):
        """Windowed :meth:`_scatter`: per-(element, a) values of ``kz``
        z-slabs back onto a (Wz, N_rev[1:]...) node window."""
        sp = self.space
        dim = sp.dim
        E = sp.elem_shape
        N = sp.node_shape
        nsh = sp.nen_shape
        yw = jnp.zeros((Wz,) + tuple(N[:-1][::-1]), ye.dtype)
        for amulti in np.ndindex(*nsh[::-1]):
            block = ye[(Ellipsis,) + tuple(amulti)]
            sl = []
            for g in range(dim):
                d = dim - 1 - g
                a_d = amulti[g]
                s = self.steps[d]
                if g == 0:
                    sl.append(slice(a_d, a_d + s * (kz - 1) + 1, s))
                elif sp.periodic[d]:
                    block = jnp.roll(block, a_d, axis=g)
                    sl.append(slice(0, N[d], 1))
                else:
                    start = self.off0[d] + a_d
                    sl.append(slice(start, start + s * (E[d] - 1) + 1, s))
            yw = yw.at[tuple(sl)].add(block)
        return yw

    def _weights(self, zslice=None):
        """Separable quadrature weights on the (E_rev, q_rev) grid; with
        ``zslice=(z0, kz)`` the slowest axis is restricted."""
        sp = self.space
        dim = sp.dim
        w = None
        for g in range(dim):
            d = dim - 1 - g
            wd = self.w1d[d]  # (E_d, Q_d)
            if g == 0 and zslice is not None:
                wd = jax.lax.dynamic_slice_in_dim(
                    wd, zslice[0], zslice[1], axis=0
                )
            shape = [1] * (2 * dim)
            shape[g] = wd.shape[0]
            shape[dim + g] = wd.shape[1]
            w_d = wd.reshape(shape)
            w = w_d if w is None else w * w_d
        return w

    def _field_tabs(self, zslice=None):
        """(name, tabs) list for value + per-axis gradients, with the
        slowest-axis tables restricted when windowed."""
        dim = self.space.dim

        def ztab(T):
            if zslice is None:
                return T
            return jax.lax.dynamic_slice_in_dim(T, zslice[0], zslice[1], 0)

        def tabs_for(dd):
            out = []
            for d in range(dim):
                T = self.B1[d] if d == dd else self.B0[d]
                out.append(ztab(T) if d == dim - 1 else T)
            return out

        fields = [("val", [ztab(T) if d == dim - 1 else T
                           for d, T in enumerate(self.B0)])]
        for dd in range(dim):
            fields.append((f"g{dd}", tabs_for(dd)))
        return fields

    def _accumulate_point(self, evals, c, kappa, w, zslice=None):
        """Pointwise coefficient application (identity or mapped)."""
        dim = self.space.dim
        acc = {}
        G, detJ = self._G, self._detJ
        if zslice is not None and G is not None:
            G = jax.lax.dynamic_slice_in_dim(G, zslice[0], zslice[1], 0)
            detJ = jax.lax.dynamic_slice_in_dim(detJ, zslice[0], zslice[1], 0)
        if G is None:
            if "val" in evals:
                acc["val"] = c * w * evals["val"]
            for dd in range(dim):
                acc[f"g{dd}"] = kappa * w * evals[f"g{dd}"]
        else:
            if "val" in evals:
                acc["val"] = c * w * detJ * evals["val"]
            for dd in range(dim):
                t = None
                for ee in range(dim):
                    term = G[..., dd, ee] * evals[f"g{ee}"]
                    t = term if t is None else t + term
                acc[f"g{dd}"] = kappa * w * t
        return acc

    def _apply_field(self, xg, c, kappa):
        """Sum-factorized apply of one scalar field pair; returns flat
        (nnodes,)."""
        if self.zchunk is not None:
            return self._apply_field_chunked(xg, c, kappa)
        xe = self._gather(xg)  # (E_rev..., a_z, a_y, a_x)
        fields = self._field_tabs()
        if c == 0.0:
            fields = fields[1:]
        evals = {name: self._contract(xe, tabs) for name, tabs in fields}
        w = self._weights()
        acc = self._accumulate_point(evals, c, kappa, w)
        ye = None
        for name, tabs in fields:
            term = self._contract_T(acc[name], tabs)
            ye = term if ye is None else ye + term
        return self._scatter(ye).reshape(-1)

    def _apply_field_chunked(self, xg, c, kappa):
        """Windowed variant of :meth:`_apply_field`: a ``fori_loop``
        over z-slab groups of ``zchunk`` elements keeps the closure and
        quadrature-grid temporaries bounded — O(zchunk/E_z) of the
        unchunked footprint — at identical results (the overlap rows
        accumulate across iterations, which the sequential loop orders
        deterministically)."""
        sp = self.space
        dim = sp.dim
        kz = self.zchunk
        Ez = sp.elem_shape[-1]
        nchunks = Ez // kz
        s_z = self.steps[dim - 1]
        p_z = sp.degrees[dim - 1]
        off0z = self.off0[dim - 1]
        Wz = s_z * (kz - 1) + 1 + p_z
        N = sp.node_shape
        yg = jnp.zeros(tuple(N[::-1]), xg.dtype)

        def body(ci, yg):
            z0 = off0z + ci * kz * s_z
            zsl = (ci * kz, kz)
            xw = jax.lax.dynamic_slice_in_dim(xg, z0, Wz, axis=0)
            xe = self._gather_win(xw, kz)
            fields = self._field_tabs(zsl)
            if c == 0.0:
                fields = fields[1:]
            evals = {name: self._contract(xe, tabs) for name, tabs in fields}
            w = self._weights(zsl)
            acc = self._accumulate_point(evals, c, kappa, w, zsl)
            ye = None
            for name, tabs in fields:
                term = self._contract_T(acc[name], tabs)
                ye = term if ye is None else ye + term
            yw = self._scatter_win(ye, kz, Wz)
            cur = jax.lax.dynamic_slice_in_dim(yg, z0, Wz, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                yg, cur + yw, z0, axis=0
            )

        return jax.lax.fori_loop(0, nchunks, body, yg).reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)

    def load_vector(self, forcing):
        """Load vector ``b_a = ∫ f N_a`` by the same windowed
        sum-factorized contractions as the matvec (``forcing(x) ->
        scalar`` at a physical point).  This replaces the f64 conv load
        at scale: XLA lowers non-MXU (f64) convolutions via patch
        materialization — multi-GB scratch at 256³ — while these are
        plain (emulated-f64-capable) dots.  Identity map, dof = 1."""
        sp = self.space
        if sp.geometry is not None or sp.dof != 1:
            raise ValueError("load_vector: identity map, dof=1 only")
        dim = sp.dim
        dt = sp.dtype
        E = sp.elem_shape
        nq = [t.nqp for t in sp.tabs]
        pts = [jnp.asarray(t.point, dt) for t in sp.tabs]  # (E_d, Q_d)

        def fvals(zslice=None):
            """(E_rev..., q_rev...) forcing values (slowest axis
            windowed; the start index may be traced)."""
            Ez = E[dim - 1] if zslice is None else zslice[1]
            shape = ((Ez,) + tuple(E[:-1][::-1])
                     + tuple(nq[::-1]))
            comps = []
            for d in range(dim):
                P = pts[d]
                if d == dim - 1 and zslice is not None:
                    P = jax.lax.dynamic_slice_in_dim(
                        P, zslice[0], zslice[1], 0
                    )
                g = dim - 1 - d
                sh = [1] * (2 * dim)
                sh[g] = P.shape[0]
                sh[dim + g] = P.shape[1]
                comps.append(jnp.broadcast_to(P.reshape(sh), shape))
            X = jnp.stack(comps, axis=-1)
            f = jax.vmap(forcing)(X.reshape(-1, dim))
            return f.reshape(shape)

        with jax.default_matmul_precision("highest"):
            if self.zchunk is None:
                acc = self._weights() * fvals()
                tabs = self._field_tabs()[0][1]
                ye = self._contract_T(acc, tabs)
                return self._scatter(ye).reshape(sp.nnodes, 1)
            # one fori_loop body (like _apply_field_chunked): an
            # unrolled python loop at 256³ crashed the remote compile
            # helper on program size — and so does a >~10M-point f64
            # chunk body (compiler-side failure at 28M, passes at 7M),
            # so the load caps its own slab depth
            Ez = E[dim - 1]
            per_slab = 1
            for d in range(dim - 1):
                per_slab *= E[d]
            for n in nq:
                per_slab *= n
            kz = max(1, min(self.zchunk,
                            int(8e6 // max(per_slab, 1)) or 1))
            while Ez % kz:
                kz -= 1
            s_z = self.steps[dim - 1]
            p_z = sp.degrees[dim - 1]
            Wz = s_z * (kz - 1) + 1 + p_z
            N = sp.node_shape
            yg0 = jnp.zeros(tuple(N[::-1]), dt)

            def body(ci, yg):
                zsl = (ci * kz, kz)
                acc = self._weights(zsl) * fvals(zsl)
                tabs = self._field_tabs(zsl)[0][1]
                ye = self._contract_T(acc, tabs)
                yw = self._scatter_win(ye, kz, Wz)
                z0 = self.off0[dim - 1] + ci * kz * s_z
                cur = jax.lax.dynamic_slice_in_dim(yg, z0, Wz, axis=0)
                return jax.lax.dynamic_update_slice_in_dim(
                    yg, cur + yw, z0, axis=0
                )

            yg = jax.lax.fori_loop(0, Ez // kz, body, yg0)
            return yg.reshape(sp.nnodes, 1)

    def scalar_diagonal(self):
        with jax.default_matmul_precision("highest"):
            return self._scalar_diagonal_impl()

    def _scalar_diagonal_impl(self):
        """Approximate diagonal for Jacobi: assembled-free estimate via
        per-axis table sums (exact for the identity map)."""
        sp = self.space
        dim = sp.dim
        # exact diagonal by applying to unit grid? cost dim+1 matvecs of
        # special structure — use the cheap standard trick: diag(A) via
        # sum over q of w * (c N_a^2 + κ Σ_d (∂N_a)^2), separable per axis
        def axis_diag(tabs):
            # (nnodes_d,) per axis: Σ_e Σ_q w N[a]^2 scattered by a
            outs = []
            for d in range(dim):
                T = tabs[d]
                w = self.w1d[d]
                val = jnp.einsum("eq,eqa->ea", w, T * T)
                Nd = sp.node_shape[d]
                o = jnp.zeros(Nd, val.dtype)
                offs = jnp.asarray(sp.tabs[d].offset)
                p1 = sp.degrees[d] + 1
                idx = (offs[:, None] + jnp.arange(p1)[None, :]) % sp.axes[d].nnp
                o = o.at[idx.reshape(-1)].add(val.reshape(-1))
                outs.append(o)
            return outs

        def outer(parts):
            g = None
            for gax in range(dim):
                d = dim - 1 - gax
                shape = [1] * dim
                shape[gax] = parts[d].shape[0]
                pd = parts[d].reshape(shape)
                g = pd if g is None else g * pd
            return g.reshape(-1)

        cols = []
        for a in range(sp.dof):
            caa = float(self.C[a, a])
            kaa = float(self.Kmat[a, a])
            total = jnp.zeros(sp.nnodes, sp.dtype)
            if caa != 0.0:
                total = total + caa * outer(axis_diag(self.B0))
            for dd in range(dim):
                tabs = [
                    self.B1[d] if d == dd else self.B0[d]
                    for d in range(dim)
                ]
                total = total + kaa * outer(axis_diag(tabs))
            cols.append(total)
        out = jnp.stack(cols, axis=-1)
        return jnp.where(self.fixed, self.mult[:, None], out)


class JacobianFreeOperator:
    """Exact Jacobian *action* J(U)·v by forward-mode AD of the batched
    residual — Newton–Krylov without ever materializing the stencil
    (JFNK).  Where the reference can only Newton-solve what it can
    assemble (petigasnes.c:82-139 builds the full matrix every
    iteration), the AD linearization of ``assemble_function`` gives the
    exact operator at ~2 residual evaluations per matvec and O(vector)
    memory — the route to nonlinear problems at meshes whose assembled
    Jacobian exceeds HBM (256³: 8.6 GB at p=2 dof=1).

    Dirichlet semantics carry over exactly: fixed residual rows are
    ``u - v`` (petigaelem.c:1441-1481), so their linearization is the
    identity row — the same elimination the assembled path applies.
    """

    def __init__(self, space, function, U, ctx=None, *, aux=None,
                 order=None, chunk=None, boundary=None):
        from ..assembly.assemble import assemble_function

        self.space = space
        shape = (space.nnodes, space.dof)
        self.U = U.reshape(shape)

        def resid(V):
            return assemble_function(
                space, function, V, ctx, aux=aux, order=order, chunk=chunk,
                boundary=boundary,
            )

        self._resid = resid

    def matvec(self, v):
        flat_in = v.ndim == 1
        vv = v.reshape(self.U.shape)
        _, Jv = jax.jvp(self._resid, (self.U,), (vv,))
        return Jv.reshape(-1) if flat_in else Jv

    def __matmul__(self, v):
        return self.matvec(v)
