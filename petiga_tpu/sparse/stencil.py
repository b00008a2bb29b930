"""Stencil-structured block-sparse operator — the TPU-native replacement
of the reference's assembled PETSc matrix (``petigamat.c``).

On a tensor-product IGA patch the sparsity is a fixed stencil: row
(control point) ``i`` couples to columns ``j`` with per-axis offset
``|j_d - i_d| <= p_d`` — ``K = prod(2 p_d + 1)`` slots per row
(petigamat.c:197-267 computes the same from 1-D knot overlap).  Instead
of CSR/BAIJ we store a dense slot array

    ``data[nnodes, K, dof, dof]``

and apply the operator as K shifted fused multiply-adds over the
zero/wrap-padded node grid — no gathers, no indices, pure stencil
compute that XLA fuses and the MXU/VPU stream at HBM speed.  CSR/COO/
dense exports are provided for interop and direct solves.

Grid layout convention: node grids are stored with axes *reversed*
(``(N_{d-1}, ..., N_0, dof)``) so that C-order flattening reproduces the
axis-0-fastest flat node index used everywhere else.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Stencil", "StencilMatrix", "SymmetricStencilMatrix",
           "stencil_apply"]


@dataclasses.dataclass(frozen=True)
class Stencil:
    """Static stencil geometry for a space: slot tables and paddings."""

    node_shape: tuple  # (N_0, ..., N_{dim-1})
    widths: tuple  # per-axis half-width (= degree p_d)
    periodic: tuple  # per-axis periodic flags
    dof: int

    @property
    def dim(self) -> int:
        return len(self.node_shape)

    @property
    def K(self) -> int:
        K = 1
        for p in self.widths:
            K *= 2 * p + 1
        return K

    @property
    def nnodes(self) -> int:
        n = 1
        for N in self.node_shape:
            n *= N
        return n

    @property
    def diag_slot(self) -> int:
        s, stride = 0, 1
        for p in self.widths:
            s += p * stride
            stride *= 2 * p + 1
        return s

    def slot_offsets(self) -> np.ndarray:
        """(K, dim) per-slot per-axis offsets in [-p_d, p_d], slot index
        axis-0 fastest."""
        offs = np.stack(
            np.meshgrid(
                *[np.arange(-p, p + 1) for p in self.widths], indexing="ij"
            ),
            axis=-1,
        )  # shape (2p0+1, ..., dim) with axis order (o0, o1, ...)
        return offs.reshape(-1, self.dim, order="F")

    def slot_table(self, nen_shape: Sequence[int]) -> np.ndarray:
        """(nen, nen) table: slot index for the column offset b - a of two
        local basis indices (independent of the element — the stencil is
        translation invariant)."""
        dim = self.dim
        grids = np.meshgrid(*[np.arange(n) for n in nen_shape], indexing="ij")
        locs = [g.ravel(order="F") for g in grids]  # axis-0-fastest local ids
        nen = locs[0].shape[0]
        slot = np.zeros((nen, nen), dtype=np.int64)
        stride = 1
        for d in range(dim):
            off = locs[d][None, :] - locs[d][:, None] + self.widths[d]
            slot += off * stride
            stride *= 2 * self.widths[d] + 1
        return slot.astype(np.int32)

    def column_index(self) -> np.ndarray:
        """(nnodes, K) flat column index per (row, slot); out-of-range
        slots (clipped at open boundaries) point at the row itself — they
        only ever hold zero data.  Used for CSR/COO export."""
        dim = self.dim
        N = self.node_shape
        multi = np.unravel_index(np.arange(self.nnodes), N, order="F")
        offs = self.slot_offsets()  # (K, dim)
        cols = np.zeros((self.nnodes, offs.shape[0]), dtype=np.int64)
        valid = np.ones((self.nnodes, offs.shape[0]), dtype=bool)
        stride = 1
        for d in range(dim):
            j = multi[d][:, None] + offs[None, :, d]
            if self.periodic[d]:
                j = np.mod(j, N[d])
            else:
                bad = (j < 0) | (j >= N[d])
                valid &= ~bad
                j = np.clip(j, 0, N[d] - 1)
            cols += j * stride
            stride *= N[d]
        rows = np.arange(self.nnodes)[:, None]
        cols = np.where(valid, cols, rows)
        return cols



def _pad0(a, pw):
    """Zero pad with a dtype-strong constant: the default Python-int 0
    pad value canonicalizes to i64 under x64 and changes the lowered
    HLO of otherwise f32-only programs (cache invalidation — ADVICE
    r4)."""
    return jnp.pad(a, pw, constant_values=np.zeros((), a.dtype))

def stencil_apply(data_grid, x_padded, widths, slot_offsets):
    """Core stencil SpMV: K shifted fused multiply-adds.

    Args:
      data_grid: (N_{d-1},...,N_0, K, dof, dof) — slot data on the
        (reversed-axis) node grid.
      x_padded: (N_{d-1}+2p_{d-1}, ..., N_0+2p_0, dof) — halo-padded input.
      widths: per-spatial-axis half widths (p_0..p_{d-1}).
      slot_offsets: (K, dim) array of per-slot offsets.

    Returns y on the unpadded grid, shape (N_rev..., dof).

    Shared by the serial operator and the shard_map-distributed operator
    (where x_padded comes from a ppermute halo exchange).
    """
    with jax.default_matmul_precision("highest"):  # bf16-free blocks
        return _stencil_apply_impl(data_grid, x_padded, widths,
                                   slot_offsets)


def _stencil_apply_impl(data_grid, x_padded, widths, slot_offsets):
    dim = len(widths)
    N_rev = data_grid.shape[:dim]
    K = data_grid.shape[dim]
    y = None
    for sidx in range(K):
        slices = []
        for g in range(dim):
            d = dim - 1 - g
            o = int(slot_offsets[sidx, d])
            p = widths[d]
            slices.append(slice(p + o, p + o + N_rev[g]))
        xs = x_padded[tuple(slices)]
        term = jnp.einsum("...ab,...b->...a", data_grid[..., sidx, :, :], xs)
        y = term if y is None else y + term
    return y


class StencilMatrix:
    """A block operator in stencil storage.

    ``data``: (nnodes, K, dof, dof) jnp array.  Row/column block index =
    flat node index; ``y[i] = sum_s data[i, s] @ x[i + off(s)]``.
    """

    def __init__(self, stencil: Stencil, data: jnp.ndarray):
        self.stencil = stencil
        self.data = data

    @staticmethod
    def zeros(stencil: Stencil, dtype=jnp.float32) -> "StencilMatrix":
        s = stencil
        return StencilMatrix(
            s, jnp.zeros((s.nnodes, s.K, s.dof, s.dof), dtype=dtype)
        )

    # ---------------------------------------------------------------- apply

    @jax.named_scope("MatMult")
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x with x, y of shape (nnodes, dof) (or (nnodes*dof,))."""
        from ..utils import profiling

        profiling.count("MatMult", profiling.spmv_flops(self.stencil))
        s = self.stencil
        dim, dof = s.dim, s.dof
        N = s.node_shape
        flat_in = x.ndim == 1
        x = x.reshape(s.nnodes, dof)
        # grid layout: reversed axes + dof
        xg = x.reshape(tuple(N[::-1]) + (dof,))
        # pad: axis d of the grid corresponds to space axis dim-1-d
        pad = [(s.widths[dim - 1 - g], s.widths[dim - 1 - g]) for g in range(dim)]
        pad.append((0, 0))
        modes = [s.periodic[dim - 1 - g] for g in range(dim)]
        if all(modes):
            xp = jnp.pad(xg, pad, mode="wrap")
        elif not any(modes):
            xp = _pad0(xg, pad)
        else:
            xp = xg
            for g in range(dim):
                pw = [(0, 0)] * (dim + 1)
                pw[g] = pad[g]
                xp = (jnp.pad(xp, pw, mode="wrap") if modes[g]
                      else _pad0(xp, pw))

        # XLA-TPU miscompiles the fusion of (reshape -> pad -> K sliced
        # consumers) at some shapes (observed: 13^3 grid, dof=3, K=27 —
        # silently wrong values, compile-dependent).  Materializing the
        # padded grid with an optimization barrier breaks the bad fusion;
        # the extra write/read of x is negligible next to the matrix
        # stream.  Verified by scripts/check_pallas_tpu.py on hardware.
        xp = jax.lax.optimization_barrier(xp)

        dg = self.data.reshape(tuple(N[::-1]) + (s.K, dof, dof))
        y = stencil_apply(dg, xp, s.widths, s.slot_offsets())
        y = y.reshape(s.nnodes, dof)
        return y.reshape(-1) if flat_in else y

    def __matmul__(self, x):
        return self.matvec(x)

    def fast_operator(self, interpret: Optional[bool] = None):
        """Return this operator re-packed for the Pallas stencil-SpMV
        kernel (sparse/pallas_spmv.py) when running on TPU and the
        layout supports it (K·dof² planes within the streaming budget) —
        else ``self``.  The result exposes the same ``matvec`` /
        ``diagonal`` surface, so it drops into the Krylov solvers and
        preconditioners unchanged.

        Off-TPU the XLA path is returned unless ``interpret=True``
        explicitly asks for the (slow, python-level) kernel
        interpreter — this keeps CPU test/debug runs fast while every
        default solve on hardware rides the kernel."""
        from .pallas_spmv import PallasStencilOperator, supported

        if interpret is None and jax.default_backend() not in (
            "tpu", "axon"
        ):
            return self
        if supported(self.stencil, jnp.dtype(self.data.dtype).itemsize):
            return PallasStencilOperator(self, interpret=interpret)
        return self

    # ------------------------------------------------------------ structure

    def diagonal(self) -> jnp.ndarray:
        """Block diagonal (nnodes, dof, dof)."""
        return self.data[:, self.stencil.diag_slot, :, :]

    def scalar_diagonal(self) -> jnp.ndarray:
        """Point diagonal (nnodes, dof)."""
        d = self.diagonal()
        return jnp.diagonal(d, axis1=-2, axis2=-1)

    def transpose(self) -> "StencilMatrix":
        """A^T in the same storage: ``AT[j, s] = A[j + off(s), rev(s)]^T``
        with rev(s) = K-1-s (the slot enumeration is symmetric).  Pure
        shifted slices/rolls on the node grid — jittable, usable inside
        traced regions (e.g. building the normal-equations operator)."""
        s = self.stencil
        dim, dof, K = s.dim, s.dof, s.K
        N = s.node_shape
        offs = s.slot_offsets()
        dg = self.data.reshape(tuple(N[::-1]) + (K, dof, dof))
        planes = []
        for snew in range(K):
            # reversed slot of the source, block axes swapped
            src = jnp.swapaxes(dg[..., K - 1 - snew, :, :], -1, -2)
            for g in range(dim):
                d = dim - 1 - g
                o = int(offs[snew, d])
                if o == 0:
                    continue
                if s.periodic[d]:
                    src = jnp.roll(src, -o, axis=g)
                else:
                    # AT[j] = A[j + o]: slice with zero fill
                    pad = [(0, 0)] * src.ndim
                    if o > 0:
                        pad[g] = (0, o)
                        src = jnp.pad(
                            jax.lax.slice_in_dim(src, o, N[d], axis=g), pad
                        )
                    else:
                        pad[g] = (-o, 0)
                        src = jnp.pad(
                            jax.lax.slice_in_dim(src, 0, N[d] + o, axis=g),
                            pad,
                        )
            planes.append(src)
        data = jnp.stack(planes, axis=dim)  # (N_rev..., K, dof, dof)
        return StencilMatrix(s, data.reshape(s.nnodes, K, dof, dof))

    # -------------------------------------------------------------- exports

    def to_dense(self) -> np.ndarray:
        """(nnodes*dof, nnodes*dof) dense numpy export (tests only)."""
        s = self.stencil
        cols = s.column_index()
        n, dof = s.nnodes, s.dof
        A = np.zeros((n, dof, n, dof))
        data = np.asarray(self.data)
        for i in range(n):
            for k in range(s.K):
                A[i, :, cols[i, k], :] += data[i, k]
        return A.reshape(n * dof, n * dof)

    def to_coo(self):
        """(rows, cols, blocks) in block COO (duplicate-free only where
        slots are valid; padded slots carry zero blocks on the diagonal
        column)."""
        s = self.stencil
        cols = s.column_index()
        rows = np.repeat(np.arange(s.nnodes), s.K)
        return rows, cols.ravel(), np.asarray(self.data).reshape(-1, s.dof, s.dof)

    def to_csr(self):
        """Scalar CSR export: (indptr, indices, data) for the
        (nnodes*dof)-square scalar matrix (numpy, host-side)."""
        s = self.stencil
        rows, cols, blocks = self.to_coo()
        dof = s.dof
        # expand blocks to scalar triplets
        ri = (rows[:, None, None] * dof + np.arange(dof)[None, :, None]).ravel()
        ci = (cols[:, None, None] * dof + np.arange(dof)[None, None, :]).ravel()
        vi = blocks.reshape(len(rows), dof, dof).ravel()
        n = s.nnodes * dof
        order = np.lexsort((ci, ri))
        ri, ci, vi = ri[order], ci[order], vi[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, ri + 1, 1)
        indptr = np.cumsum(indptr)
        return indptr, ci, vi


class SymmetricStencilMatrix:
    """Symmetric-storage stencil operator — the SBAIJ analog
    (``/root/reference/src/petigamat.c:400-405, 493-495``): only the
    ``Ku = (K+1)//2`` upper slots (diagonal slot onward; the slot
    enumeration is antisymmetric, ``off(K-1-s) = -off(s)``) are stored,
    halving operator memory for SPD systems — e.g. the 256³ p=2 stencil
    drops from 8.6 GB to 4.3 GB.

    ``matvec`` applies each stored slot twice: the direct term
    ``y[i] += D_s[i] x[i+off]`` and the mirrored term
    ``y[i+off] += D_s[i]^T x[i]`` — still shift-structured slice work
    (no gathers).  ``to_full()`` reconstructs full storage (the route to
    the Pallas kernel, which needs all K planes: ``fast_operator``
    expands transiently).
    """

    def __init__(self, stencil: Stencil, data: jnp.ndarray):
        self.stencil = stencil
        self.data = data  # (nnodes, Ku, dof, dof), slots diag..K-1

    @property
    def Ku(self) -> int:
        return (self.stencil.K + 1) // 2

    @classmethod
    def from_full(cls, A: StencilMatrix) -> "SymmetricStencilMatrix":
        """Crop a (symmetric) full-storage operator to its upper slots.
        The caller asserts symmetry (Galerkin forms with symmetric
        element matrices, e.g. after the symmetric Dirichlet
        elimination)."""
        s = A.stencil
        return cls(s, A.data[:, s.diag_slot:, :, :])

    def to_full(self) -> StencilMatrix:
        """Reconstruct full storage: lower slot s < diag is
        ``A[i, s] = A[i + off(s), K-1-s]^T`` (zero-filled at open
        boundaries, wrapped for periodic axes)."""
        s = self.stencil
        dim, dof, K = s.dim, s.dof, s.K
        N = s.node_shape
        offs = s.slot_offsets()
        dg = self.data.reshape(tuple(N[::-1]) + (self.Ku, dof, dof))
        planes = []
        for snew in range(s.diag_slot):
            src = jnp.swapaxes(
                dg[..., (K - 1 - snew) - s.diag_slot, :, :], -1, -2
            )
            for g in range(dim):
                d = dim - 1 - g
                o = int(offs[snew, d])
                if o == 0:
                    continue
                if s.periodic[d]:
                    src = jnp.roll(src, -o, axis=g)
                else:
                    pad = [(0, 0)] * src.ndim
                    if o > 0:
                        pad[g] = (0, o)
                        src = jnp.pad(
                            jax.lax.slice_in_dim(src, o, N[d], axis=g), pad
                        )
                    else:
                        pad[g] = (-o, 0)
                        src = jnp.pad(
                            jax.lax.slice_in_dim(src, 0, N[d] + o, axis=g),
                            pad,
                        )
            planes.append(src)
        lower = jnp.stack(planes, axis=dim)
        data = jnp.concatenate(
            [lower.reshape(s.nnodes, s.diag_slot, dof, dof), self.data],
            axis=1,
        )
        return StencilMatrix(s, data)

    @jax.named_scope("MatMultSym")
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        with jax.default_matmul_precision("highest"):
            return self._matvec_impl(x)

    def _matvec_impl(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..utils import profiling

        profiling.count("MatMult", profiling.spmv_flops(self.stencil))
        s = self.stencil
        dim, dof = s.dim, s.dof
        N = s.node_shape
        offs = s.slot_offsets()
        flat_in = x.ndim == 1
        x = x.reshape(s.nnodes, dof)
        xg = x.reshape(tuple(N[::-1]) + (dof,))
        pad = [(s.widths[dim - 1 - g],) * 2 for g in range(dim)]
        modes = [s.periodic[dim - 1 - g] for g in range(dim)]
        xp = xg
        for g in range(dim):
            pw = [(0, 0)] * (dim + 1)
            pw[g] = pad[g]
            xp = jnp.pad(xp, pw, mode="wrap" if modes[g] else "constant")
        xp = jax.lax.optimization_barrier(xp)
        dg = self.data.reshape(tuple(N[::-1]) + (self.Ku, dof, dof))

        y = None
        # direct terms: stored slots diag..K-1
        for ku in range(self.Ku):
            sidx = s.diag_slot + ku
            sl = []
            for g in range(dim):
                d = dim - 1 - g
                o = int(offs[sidx, d])
                p = s.widths[d]
                sl.append(slice(p + o, p + o + N[::-1][g]))
            xs = xp[tuple(sl)]
            term = jnp.einsum("...ab,...b->...a", dg[..., ku, :, :], xs)
            y = term if y is None else y + term
        # mirrored terms: y[i+off] += D^T[i] x[i] for strictly-upper
        # slots — compute t[i] = D[i]^T x[i] on the grid, then place it
        # shifted by +off (the scatter-free transpose of the slice read)
        tg = jnp.zeros(
            tuple(Ne + 2 * s.widths[dim - 1 - g]
                  for g, Ne in enumerate(N[::-1])) + (dof,),
            x.dtype,
        )
        for ku in range(1, self.Ku):
            sidx = s.diag_slot + ku
            t = jnp.einsum(
                "...ab,...a->...b", dg[..., ku, :, :], xg
            )
            sl = []
            for g in range(dim):
                d = dim - 1 - g
                o = int(offs[sidx, d])
                p = s.widths[d]
                sl.append(slice(p + o, p + o + N[::-1][g]))
            tg = tg.at[tuple(sl) + (slice(None),)].add(t)
        # fold the padded frame back (wrap for periodic, drop for open)
        for g in range(dim):
            d = dim - 1 - g
            p = s.widths[d]
            if p == 0:
                continue
            n = tg.shape[g]
            lo = jax.lax.slice_in_dim(tg, 0, p, axis=g)
            hi = jax.lax.slice_in_dim(tg, n - p, n, axis=g)
            core = jax.lax.slice_in_dim(tg, p, n - p, axis=g)
            if s.periodic[d]:
                Lg = core.shape[g]
                pl = [(0, 0)] * core.ndim
                pl[g] = (Lg - p, 0)
                ph = [(0, 0)] * core.ndim
                ph[g] = (0, Lg - p)
                core = core + _pad0(lo, pl) + _pad0(hi, ph)
            tg = core
        y = y + tg
        y = y.reshape(s.nnodes, dof)
        return y.reshape(-1) if flat_in else y

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        return self.data[:, 0, :, :]

    def scalar_diagonal(self) -> jnp.ndarray:
        return jnp.diagonal(self.data[:, 0], axis1=-2, axis2=-1)

    def fast_operator(self, interpret=None):
        """Pallas operator for the symmetric storage.

        Open axes (any dof): the mirrored-slot kernel streams ONLY the
        stored upper planes (direct read at +c, transposed ring-
        accumulated scatter at -c) — solve-time memory AND HBM traffic
        are both half the full-storage kernel's, like the reference's
        SBAIJ MatMult (petigamat.c:493-495; dof>1 mirrors the
        transposed dof×dof block like MatMult_SeqSBAIJ).  Other layouts
        fall back to transient expansion (storage stays half at
        rest)."""
        from .pallas_spmv import PallasStencilOperator, supported

        s = self.stencil
        if interpret is None and jax.default_backend() not in (
            "tpu", "axon"
        ):
            return self
        if (
            not any(s.periodic)
            and supported(s, jnp.dtype(self.data.dtype).itemsize)
        ):
            return PallasStencilOperator.from_symmetric(
                self, interpret=interpret
            )
        return self.to_full().fast_operator(interpret)
