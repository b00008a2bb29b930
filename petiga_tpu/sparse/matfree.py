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

__all__ = ["MatFreeOperator"]


class MatFreeOperator:
    """y = A x for a(u,v) = ∫ v_a C_ab u_b + ∇v_a · K_ab ∇u_b.

    dof = 1: ``c`` and ``kappa`` are scalars (the classic
    reaction-diffusion form).  dof > 1: pass ``C``/``Kmat`` as (dof,dof)
    coefficient matrices coupling the fields (e.g. multi-species
    reaction-diffusion; zero entries are skipped statically, so the cost
    is one sum-factorized pass per NONZERO block).  Dirichlet rows/cols
    follow the assembled semantics (eliminated, diagonal = element
    multiplicity).
    """

    def __init__(self, space, c=0.0, kappa=1.0, C=None, Kmat=None):
        if not is_regular(space):
            raise ValueError("matrix-free apply requires a regular space")
        if any(_steps(space)[d] != 1 for d in range(space.dim)):
            raise ValueError("maximal continuity only (step 1 offsets)")
        self.space = space
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

    # ------------------------------------------------------------ gather

    def _gather(self, xg):
        """Element closures from the node grid by shifted slices:
        out[(e_rev...), (a_rev...)] = x[e + a]."""
        sp = self.space
        dim = sp.dim
        E = sp.elem_shape
        nsh = sp.nen_shape
        parts = []
        for amulti in np.ndindex(*nsh[::-1]):  # reversed order (a_z, a_y, a_x)
            sl = []
            for g in range(dim):
                d = dim - 1 - g
                a_d = amulti[g]
                if sp.periodic[d]:
                    sl.append(None)  # handled by roll
                else:
                    sl.append(slice(a_d, a_d + E[d]))
            block = xg
            for g in range(dim):
                d = dim - 1 - g
                if sp.periodic[d]:
                    block = jnp.roll(block, -amulti[g], axis=g)
                    block = jax.lax.slice_in_dim(block, 0, E[d], axis=g)
                else:
                    block = jax.lax.slice_in_dim(
                        block, amulti[g], amulti[g] + E[d], axis=g
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
        yg = jnp.zeros(tuple(N[::-1]), ye.dtype)
        idx = 0
        for amulti in np.ndindex(*nsh[::-1]):
            block = ye[(Ellipsis,) + tuple(amulti)]
            g2 = block
            for g in range(dim):
                d = dim - 1 - g
                a_d = amulti[g]
                if sp.periodic[d]:
                    # place at (e + a) mod N: pad to N then roll
                    g2 = jnp.roll(g2, a_d, axis=g) if E[d] == N[d] else g2
                else:
                    pad = [(0, 0)] * g2.ndim
                    pad[g] = (a_d, N[d] - E[d] - a_d)
                    g2 = jnp.pad(g2, pad)
            yg = yg + g2
        return yg

    # ------------------------------------------------------------- apply

    def matvec(self, x):
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

    def _apply_field(self, xg, c, kappa):
        """Sum-factorized apply of one scalar field pair; returns flat
        (nnodes,)."""
        sp = self.space
        dim = sp.dim

        xe = self._gather(xg)  # (E_rev..., a_z, a_y, a_x)

        # forward sum factorization: contract each local axis with its
        # per-element 1-D table → values/derivatives at quad points.
        # Explicit einsums keep the layout (E_rev..., q_rev...) unambiguous.
        E_LBL = "ZYX"[3 - dim :]
        A_LBL = "zyx"[3 - dim :]
        Q_LBL = "wvu"[3 - dim :]

        def contract(tabs):
            out = xe  # (E_rev..., a_rev...)
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

        # values and per-axis parametric derivatives at quad points
        fields = []
        c_is_zero = c == 0.0
        if not c_is_zero:
            fields.append(("val", [self.B0[d] for d in range(dim)]))
        for dd in range(dim):
            tabs = [self.B1[d] if d == dd else self.B0[d] for d in range(dim)]
            fields.append((f"g{dd}", tabs))

        evals = {name: contract(tabs) for name, tabs in fields}

        # weights (separable) on the q grid — broadcast per axis
        def wq_shape():
            w = None
            for g in range(dim):
                d = dim - 1 - g
                wd = self.w1d[d]  # (E_d, Q_d)
                shape = [1] * (2 * dim)
                shape[g] = wd.shape[0]
                shape[dim + g] = wd.shape[1]
                w_d = wd.reshape(shape)
                w = w_d if w is None else w * w_d
            return w

        w = wq_shape()

        # geometric factors: identity parametric map (geometry not yet
        # supported matrix-free); gradient in physical = parametric here
        acc = {}
        if not c_is_zero:
            acc["val"] = c * w * evals["val"]
        for dd in range(dim):
            acc[f"g{dd}"] = kappa * w * evals[f"g{dd}"]

        # transpose chain: contract back to closures and scatter
        def contract_T(z, tabs):
            out = z  # (E_rev..., q_rev...)
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

        ye = None
        for name, tabs in fields:
            term = contract_T(acc[name], tabs)
            ye = term if ye is None else ye + term

        return self._scatter(ye).reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)

    def scalar_diagonal(self):
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
