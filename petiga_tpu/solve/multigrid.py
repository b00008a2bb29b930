"""Geometric multigrid for IGA — the analog of the reference's PCMG
preparation (petigapcmg.c: per-axis coarsening factors + DMDA shell for
PETSc's PCMG).  Here the whole hierarchy is native: spline spaces are
nested under uniform refinement, prolongation is exact knot-insertion
(Boehm's algorithm) applied as separable per-axis tensor contractions
(MXU-friendly), coarse operators are re-assembled on each level, and the
V-cycle with weighted-Jacobi smoothing is a jittable preconditioner for
CG.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.axis import Axis
from ..core.space import Space

__all__ = [
    "knot_insertion_matrix",
    "prolongation_1d",
    "MGHierarchy",
    "mg_preconditioner",
    "mg_local_preconditioner",
]


def knot_insertion_matrix(p: int, U_coarse: np.ndarray, U_fine: np.ndarray) -> np.ndarray:
    """Global knot-insertion (subdivision) matrix T with
    N_c_j(u) = sum_i T[i, j] N_f_i(u): coarse basis expressed in the fine
    space.  Boehm insertion of one knot at a time; exact for nested knot
    vectors."""
    U = np.asarray(U_coarse, dtype=np.float64).copy()
    n = len(U) - p - 1  # number of coarse basis functions
    T = np.eye(n)
    # multiset difference: fine knots missing from the coarse vector
    missing = []
    j = 0
    Uc_sorted = sorted(U)
    for u in sorted(U_fine):
        if j < len(Uc_sorted) and abs(u - Uc_sorted[j]) < 1e-12:
            j += 1
        else:
            missing.append(u)
    for u in missing:
        m = len(U) - 1
        # find span k with U[k] <= u < U[k+1]
        k = int(np.searchsorted(U, u, side="right") - 1)
        k = min(max(k, p), m - p - 1)
        nold = len(U) - p - 1
        # Boehm: new control values c'_i = a_i c_i + (1-a_i) c_{i-1}
        A = np.zeros((nold + 1, nold))
        for i in range(nold + 1):
            if i <= k - p:
                A[i, i] = 1.0
            elif i <= k:
                denom = U[i + p] - U[i]
                a = (u - U[i]) / denom if denom > 0 else 0.0
                A[i, i] = a
                A[i, i - 1] = 1.0 - a
            else:
                A[i, i - 1] = 1.0
        T = A @ T
        U = np.insert(U, k + 1, u)
    return T  # (n_fine, n_coarse)


def prolongation_1d(coarse: Axis, fine: Axis) -> np.ndarray:
    """(nnp_fine, nnp_coarse) prolongation between nested axes, with
    periodic wrap of the duplicate basis functions."""
    if fine.p != coarse.p:
        raise ValueError("degrees must match")
    if not coarse.periodic:
        return knot_insertion_matrix(coarse.p, coarse.U, fine.U)
    # periodic: the unwrapped shadow knots differ structurally, so Boehm
    # does not apply; the spaces are still nested on the torus, so the
    # exact coefficients come from interpolation at the fine Greville
    # points (square well-conditioned system)
    from ..core.bspline import bspline_ders

    def wrapped_basis(ax, u):
        u0, u1 = ax.limits
        uu = u0 + np.mod(u - u0, u1 - u0)
        spans = ax.find_span(uu)
        ders = bspline_ders(ax.U, ax.p, spans, uu, 0)
        B = np.zeros((len(u), ax.nnp))
        for j in range(ax.p + 1):
            cols = (spans - ax.p + j) % ax.nnp
            B[np.arange(len(u)), cols] += ders[:, 0, j]
        return B

    shift = (fine.nbasis - fine.nnp) // 2
    g = fine.greville()[shift : shift + fine.nnp]
    Bf = wrapped_basis(fine, g)
    Bc = wrapped_basis(coarse, g)
    P = np.linalg.solve(Bf, Bc)
    P[np.abs(P) < 1e-12] = 0.0
    return P


class MGHierarchy:
    """Spaces + operators from coarse to fine, with separable
    prolongations."""

    def __init__(self, spaces, operators, prolongs):
        self.spaces = spaces  # coarse -> fine
        self.operators = operators
        self.prolongs = prolongs  # per level: list of per-axis (nf, nc)

    @staticmethod
    def build(
        space: Space,
        assemble: Callable,
        levels: Optional[int] = None,
        min_nel: int = 4,
    ) -> "MGHierarchy":
        """``assemble(space) -> StencilMatrix`` called per level.

        Coarsening halves each axis while even and above ``min_nel``
        (DMDAComputeCoarsenFactor analog, petigapcmg.c:96-114).
        """
        spaces = [space]
        while (levels is None or len(spaces) < levels) and all(
            n % 2 == 0 and n // 2 >= min_nel for n in spaces[-1].elem_shape
        ):
            cur = spaces[-1]
            axes = [
                Axis.uniform(
                    p=ax.p,
                    nel=ax.nel // 2,
                    u0=ax.limits[0],
                    u1=ax.limits[1],
                    continuity=ax.continuity,
                    periodic=ax.periodic,
                )
                for ax in cur.axes
            ]
            cs = Space(
                axes,
                dof=cur.dof,
                basis_type=cur.basis_type,
                order=cur.order,
                dtype=cur.dtype,
            )
            cs.bc = cur.bc
            cs.bc_visit = cur.bc_visit
            spaces.append(cs)
        spaces = spaces[::-1]  # coarse -> fine
        operators = [assemble(s) for s in spaces]
        prolongs = []
        for lvl in range(len(spaces) - 1):
            coarse, fine = spaces[lvl], spaces[lvl + 1]
            Ps = [
                jnp.asarray(
                    prolongation_1d(coarse.axes[d], fine.axes[d]),
                    fine.dtype,
                )
                for d in range(fine.dim)
            ]
            prolongs.append(Ps)
        return MGHierarchy(spaces, operators, prolongs)

    # ----------------------------------------------------------- transfer

    def _tensor_apply(self, Ps, x, shapes_in, shapes_out, dof):
        """Apply separable operator: per-axis matrices on a grid vector."""
        dim = len(Ps)
        g = x.reshape(tuple(shapes_in[::-1]) + (dof,))
        for d in range(dim):
            gax = dim - 1 - d
            g = jnp.tensordot(Ps[d], g, axes=([1], [gax]))
            # tensordot puts the new axis first; move it back
            g = jnp.moveaxis(g, 0, gax)
        return g.reshape(-1, dof)

    def prolong(self, lvl, xc):
        """coarse lvl -> lvl+1."""
        Ps = self.prolongs[lvl]
        cs, fs = self.spaces[lvl], self.spaces[lvl + 1]
        return self._tensor_apply(Ps, xc, cs.node_shape, fs.node_shape, cs.dof)

    def restrict(self, lvl, xf):
        """fine lvl+1 -> lvl (transpose)."""
        Ps = [P.T for P in self.prolongs[lvl]]
        cs, fs = self.spaces[lvl], self.spaces[lvl + 1]
        return self._tensor_apply(Ps, xf, fs.node_shape, cs.node_shape, cs.dof)


def mg_preconditioner(
    hier: MGHierarchy,
    *,
    nsmooth: int = 2,
    omega: float = 0.6,
    coarse_iters: int = 50,
):
    """V-cycle preconditioner M(r) ≈ A^{-1} r (jit-traceable).

    Weighted-Jacobi smoothing; coarsest level solved by CG with a fixed
    iteration budget (static shapes).
    """
    from .krylov import cg, jacobi_preconditioner

    nlev = len(hier.spaces)
    diags = []
    for A in hier.operators:
        d = A.scalar_diagonal()
        diags.append(jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0))
    # smoother/residual matvecs ride the Pallas kernel on TPU (the fine
    # level dominates the V-cycle cost)
    fastops = [A.fast_operator() for A in hier.operators]

    def smooth(lvl, x, b):
        A = fastops[lvl]
        dinv = diags[lvl]
        for _ in range(nsmooth):
            r = b - A.matvec(x)
            x = x + omega * dinv * r
        return x

    def vcycle(lvl, b):
        if lvl == 0:
            A = hier.operators[0]
            res = cg(
                fastops[0], b, M=jacobi_preconditioner(A), rtol=1e-10,
                maxiter=coarse_iters,
            )
            return res.x
        x = smooth(lvl, jnp.zeros_like(b), b)
        r = b - fastops[lvl].matvec(x)
        rc = hier.restrict(lvl - 1, r)
        xc = vcycle(lvl - 1, rc)
        x = x + hier.prolong(lvl - 1, xc)
        return smooth(lvl, x, b)

    def M(r):
        shape = r.shape
        dof = hier.spaces[-1].dof
        out = vcycle(nlev - 1, r.reshape(-1, dof))
        return out.reshape(shape)

    return M


def mg_local_preconditioner(
    assemble: Callable,
    *,
    levels: Optional[int] = None,
    nsmooth: int = 2,
    omega: float = 0.6,
    min_nel: int = 4,
    coarse_rtol: float = 1e-8,
    coarse_maxiter: int = 200,
):
    """Multigrid under domain decomposition — the role PCMG plays when
    the reference runs parallel (petigapcmg.c + PETSc's distributed MG).

    Returns a ``pc`` callable for ``DistSpace.cg/bicgstab/gmres``'s
    ``pc=`` argument.  The finest level is smoothed *distributed*
    (weighted Jacobi through the halo-exchange ``matvec_local``); the
    residual is restricted straight to the coarse hierarchy by the
    exact knot-insertion transfer, evaluated as per-device partial
    tensor contractions ``psum``-reduced into a *replicated* coarse
    vector (coarse grids are orders of magnitude smaller than the fine
    grid, so replicated coarse work is the standard parallel-MG
    agglomeration endgame — every rank of a PETSc PCMG run does the
    same on its coarsest level).  The coarse problem is solved by CG
    preconditioned with the serial V-cycle over the remaining levels,
    then prolonged back into the device blocks.

    ``assemble(space) -> StencilMatrix`` builds the coarse operators
    (Galerkin-by-reassembly, as in :meth:`MGHierarchy.build`).
    """
    from .krylov import cg as serial_cg

    def pc(ds, data_loc):
        sp = ds.space
        dim = sp.dim
        dof = sp.dof
        dt = sp.dtype
        L = tuple(int(l) for l in ds.L)
        names = ds.names

        # hierarchy below the finest level (the finest operator already
        # lives distributed in data_loc — skip its serial assembly)
        sentinel = object()
        hier = MGHierarchy.build(
            sp,
            lambda s: sentinel if s is sp else assemble(s),
            levels=levels,
            min_nel=min_nel,
        )
        if len(hier.spaces) < 2:
            raise ValueError("grid too coarse for a multigrid hierarchy")
        sub = MGHierarchy(
            hier.spaces[:-1], hier.operators[:-1], hier.prolongs[:-1]
        )
        Ac = sub.operators[-1]
        if len(sub.spaces) > 1:
            coarse_M = mg_preconditioner(sub, nsmooth=nsmooth, omega=omega)
        else:
            from .krylov import jacobi_preconditioner

            coarse_M = jacobi_preconditioner(Ac)
        cs = sub.spaces[-1]
        Nc = cs.node_shape

        # finest-level transfer, padded to the device grid: P rows past
        # the real node range are zero (padding stays decoupled).  Built
        # in pure numpy (prolongation_1d) — this code runs inside a
        # trace, so hier.prolongs are staged tracers, not constants.
        P_pad = []
        for d in range(dim):
            P = prolongation_1d(cs.axes[d], sp.axes[d])
            Pp = np.zeros((ds.Np[d], Nc[d]))
            Pp[: P.shape[0]] = P
            P_pad.append(jnp.asarray(Pp, dt))

        diag_slot = ds.st.diag_slot
        dvals = jnp.diagonal(
            data_loc[..., diag_slot, :, :], axis1=-2, axis2=-1
        )
        dinv = jnp.where(dvals != 0, 1.0 / jnp.where(dvals == 0, 1.0, dvals), 1.0)
        Av = lambda v: ds.matvec_local(data_loc, v)

        def P_loc(d):
            start = jax.lax.axis_index(names[d]) * L[d]
            zero = jnp.zeros((), start.dtype)
            return jax.lax.dynamic_slice(
                P_pad[d], (start, zero), (L[d], Nc[d])
            )

        def restrict(r_loc):
            """(L_rev..., dof) -> replicated coarse (Nc_rev..., dof)."""
            out = r_loc
            for d in range(dim):
                gax = dim - 1 - d
                out = jnp.tensordot(P_loc(d).T, out, axes=([1], [gax]))
                out = jnp.moveaxis(out, 0, gax)
            return jax.lax.psum(out, tuple(names))

        def prolong(xc):
            """Replicated coarse grid -> local fine block."""
            out = xc
            for d in range(dim):
                gax = dim - 1 - d
                out = jnp.tensordot(P_loc(d), out, axes=([1], [gax]))
                out = jnp.moveaxis(out, 0, gax)
            return out

        def smooth(x, b):
            for _ in range(nsmooth):
                x = x + omega * dinv * (b - Av(x))
            return x

        def M(r_loc):
            x = smooth(jnp.zeros_like(r_loc), r_loc)
            rc = restrict(r_loc - Av(x))  # (Nc_rev..., dof) replicated
            res = serial_cg(
                Ac, rc.reshape(-1, dof), M=coarse_M,
                rtol=coarse_rtol, maxiter=coarse_maxiter,
            )
            xc = res.x.reshape(tuple(Nc[::-1]) + (dof,))
            x = x + prolong(xc)
            return smooth(x, r_loc)

        return M

    return pc
