"""Field-split preconditioning — the analog of the reference's per-field
decomposition for PCFIELDSPLIT (DMCreateFieldDecomposition_IGA,
petigadm.c:294-383, which hands PETSc one IS per dof field so
``-pc_type fieldsplit`` can build block preconditioners).

Here the decomposition is a slice of the stencil storage: the (f, g)
block of a dof>1 :class:`StencilMatrix` is itself a stencil operator on
the same node grid, so field (or field-group) sub-operators come out as
``data[:, :, idx, :][..., idx]`` views with no index machinery at all.

Two combinators are provided, mirroring PETSc's
``-pc_fieldsplit_type additive | multiplicative``:

  * additive (block Jacobi over fields): M⁻¹r = diag(M_0⁻¹, …) r
  * multiplicative (block Gauss-Seidel over fields): sweeps fields in
    order, updating the residual with the off-diagonal stencil blocks.

``inner`` maps each diagonal sub-operator to its approximate inverse —
any of the library's preconditioner factories (jacobi, bbb, mg, …).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..sparse.stencil import StencilMatrix
from .krylov import jacobi_preconditioner

__all__ = [
    "field_split",
    "fieldsplit_preconditioner",
    "fieldsplit_local_preconditioner",
]


class _RectBlock:
    """Rectangular (rows × cols) field-coupling block: same stencil
    geometry, block shape (len(rows), len(cols)).  matvec maps
    (nnodes, ncols) -> (nnodes, nrows)."""

    def __init__(self, A: StencilMatrix, rows, cols):
        self.nrows, self.ncols = len(rows), len(cols)
        self._sq = dataclasses.replace(A.stencil, dof=max(self.nrows,
                                                          self.ncols))
        self.data = A.data[:, :, jnp.asarray(list(rows)), :][
            :, :, :, jnp.asarray(list(cols))
        ]

    def matvec(self, x):
        # embed into a square block of size max(nrows, ncols), apply the
        # square stencil matvec, crop — keeps one code path
        n = self._sq.nnodes
        m = self._sq.dof
        data = self.data
        if (self.nrows, self.ncols) != (m, m):
            pad = jnp.zeros(
                (data.shape[0], data.shape[1], m, m), data.dtype
            )
            data = pad.at[:, :, : self.nrows, : self.ncols].set(data)
        xv = x.reshape(n, self.ncols)
        if self.ncols != m:
            xv = jnp.pad(xv, ((0, 0), (0, m - self.ncols)))
        y = StencilMatrix(self._sq, data).matvec(xv)
        return y[:, : self.nrows]


def _sub_operator(A: StencilMatrix, rows: Sequence[int],
                  cols: Sequence[int]):
    """The (rows × cols) field block as a stencil operator."""
    if len(rows) != len(cols):
        return _RectBlock(A, rows, cols)
    st = dataclasses.replace(A.stencil, dof=len(rows))
    rows = jnp.asarray(list(rows))
    cols = jnp.asarray(list(cols))
    data = A.data[:, :, rows, :][:, :, :, cols]
    return StencilMatrix(st, data)


def field_split(A: StencilMatrix, groups: Optional[Sequence] = None):
    """Split a dof>1 operator into diagonal field(-group) sub-operators.

    groups: list of index tuples partitioning range(dof); default one
    group per scalar field (the reference's default splitting,
    petigadm.c:327-344).  Returns a list of StencilMatrix.
    """
    dof = A.stencil.dof
    if groups is None:
        groups = [(f,) for f in range(dof)]
    return [_sub_operator(A, g, g) for g in groups]


def fieldsplit_preconditioner(
    A: StencilMatrix,
    groups: Optional[Sequence] = None,
    inner: Optional[Callable] = None,
    kind: str = "additive",
):
    """Field-split preconditioner M(r) for a dof>1 stencil operator.

    Args:
      groups: partition of range(dof) into field groups (default single
        fields).
      inner: factory sub_A -> M_sub (default Jacobi).
      kind: "additive" (block Jacobi over fields) or "multiplicative"
        (block Gauss-Seidel sweep, needs the off-diagonal blocks).
    """
    dof = A.stencil.dof
    if groups is None:
        groups = [(f,) for f in range(dof)]
    groups = [tuple(g) for g in groups]
    inner = jacobi_preconditioner if inner is None else inner
    diag_ops = [_sub_operator(A, g, g) for g in groups]
    Ms = [inner(op) for op in diag_ops]

    if kind == "additive":

        def M(r):
            flat = r.ndim == 1
            rv = r.reshape(-1, dof)
            z = jnp.zeros_like(rv)
            for g, Mg in zip(groups, Ms):
                idx = jnp.asarray(g)
                zg = Mg(rv[:, idx])
                z = z.at[:, idx].set(zg.reshape(rv.shape[0], len(g)))
            return z.reshape(-1) if flat else z

        return M

    if kind == "multiplicative":
        # off-diagonal coupling blocks A[gi, gj] for the Gauss-Seidel
        # residual update
        off = {
            (i, j): _sub_operator(A, gi, gj)
            for i, gi in enumerate(groups)
            for j, gj in enumerate(groups)
            if i != j
        }

        def M(r):
            flat = r.ndim == 1
            rv = r.reshape(-1, dof)
            z = jnp.zeros_like(rv)
            for i, (g, Mg) in enumerate(zip(groups, Ms)):
                idx = jnp.asarray(g)
                ri = rv[:, idx]
                for j, gj in enumerate(groups):
                    if j >= i:
                        continue  # only already-updated fields
                    blk = off[(i, j)]
                    zj = z[:, jnp.asarray(gj)]
                    ri = ri - blk.matvec(zj.reshape(-1, len(gj))).reshape(
                        ri.shape
                    )
                zi = Mg(ri)
                z = z.at[:, idx].set(zi.reshape(rv.shape[0], len(g)))
            return z.reshape(-1) if flat else z

        return M

    raise ValueError("kind must be 'additive' or 'multiplicative'")


def fieldsplit_local_preconditioner(
    groups: Optional[Sequence] = None,
    kind: str = "additive",
    inner: str = "jacobi",
    inner_iters: int = 5,
):
    """Field-split preconditioning under domain decomposition — the
    parallel ``-pc_type fieldsplit`` role (petigadm.c:294-383 hands
    PETSc the per-field index sets; under MPI the sub-solves run on the
    distributed sub-matrices).

    Returns a ``pc`` callable for ``DistSpace.cg/bicgstab/gmres``'s
    ``pc=`` argument.  Field(-group) sub-blocks are strided slices of
    the distributed stencil storage; the halo-exchange ``matvec_local``
    is dof-agnostic, so each sub-block keeps full distributed semantics.

    ``inner``: "jacobi" (stationary — safe inside CG) or "cg" (a fixed
    ``inner_iters``-step Jacobi-PCG sub-solve per application; the PC
    then varies between outer iterations, so pair it with
    ``DistSpace.gmres`` — the same caveat PETSc's fieldsplit+inner-KSP
    carries for non-flexible outer solvers).  ``kind`` as in
    :func:`fieldsplit_preconditioner`.
    """
    import jax

    if inner not in ("jacobi", "cg"):
        raise ValueError("inner must be 'jacobi' or 'cg'")

    def pc(ds, data_loc):
        dof = ds.space.dof
        gs = (
            [(f,) for f in range(dof)]
            if groups is None
            else [tuple(g) for g in groups]
        )
        diag_slot = ds.st.diag_slot

        def sub(gi, gj):
            ai = jnp.asarray(gi)
            aj = jnp.asarray(gj)
            return data_loc[..., ai, :][..., aj]

        def dot(a, c):
            return ds._psum_all(jnp.sum(a * c))

        def make_inner(dsub):
            dv = jnp.diagonal(
                dsub[..., diag_slot, :, :], axis1=-2, axis2=-1
            )
            dinv = jnp.where(dv != 0, 1.0 / jnp.where(dv == 0, 1.0, dv), 1.0)
            if inner == "jacobi":
                return lambda r: r * dinv

            def Msub(r):
                Av = lambda v: ds.matvec_local(dsub, v)
                x = jnp.zeros_like(r)
                z = r * dinv
                p_ = z
                rz = dot(r, z)

                def body(i, st):
                    x, rr, p_, rz = st
                    Ap = Av(p_)
                    pAp = dot(p_, Ap)
                    alpha = jnp.where(
                        pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0
                    )
                    x = x + alpha * p_
                    rr = rr - alpha * Ap
                    z = rr * dinv
                    rznew = dot(rr, z)
                    beta = jnp.where(
                        rz > 0, rznew / jnp.where(rz == 0, 1.0, rz), 0.0
                    )
                    return (x, rr, z + beta * p_, rznew)

                x, *_ = jax.lax.fori_loop(
                    0, inner_iters, body, (x, r, p_, rz)
                )
                return x

            return Msub

        inners = [make_inner(sub(g, g)) for g in gs]

        if kind == "additive":

            def M(r):
                z = jnp.zeros_like(r)
                for g, Mg in zip(gs, inners):
                    ai = jnp.asarray(g)
                    z = z.at[..., ai].set(Mg(r[..., ai]))
                return z

            return M

        if kind == "multiplicative":

            def M(r):
                z = jnp.zeros_like(r)
                for i, (g, Mg) in enumerate(zip(gs, inners)):
                    ai = jnp.asarray(g)
                    ri = r[..., ai]
                    for j in range(i):
                        gj = gs[j]
                        ri = ri - ds.matvec_local(
                            sub(g, gj), z[..., jnp.asarray(gj)]
                        )
                    z = z.at[..., ai].set(Mg(ri))
                return z

            return M

        raise ValueError("kind must be 'additive' or 'multiplicative'")

    return pc
