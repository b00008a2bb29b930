"""Pallas TPU stencil-SpMV kernel.

The XLA slot-loop SpMV (StencilMatrix.matvec) reaches only ~9% of the
HBM roofline on TPU: each of the K shifted multiply-adds re-reads the
shifted x window, and the (grid, K)-layout slot extraction defeats
Mosaic's tiling.  This kernel uses a *flat slot-major* layout instead:

  DT[K, M, 128]   slot-major matrix planes — flat node index packed into
                  (sublane, lane); rows pad only nnodes -> 128·M (<1%)
  xb[G+M+G, 128]  the vector in the same flat packing with G guard rows

For open (non-periodic) axes every stencil slot s is a *constant flat
shift* c_s = Σ_d o_d·stride_d of the node index, because out-of-range
slots already store zero blocks (Stencil.column_index semantics) — no
spatial padding, no wrap bookkeeping.  A flat shift by c = 128·q + m
decomposes into a sublane shift q and a lane rotation m with carry,
realized as two row-shifted loads + `pltpu.roll` + a lane select — all
full-(R,128)-tile VPU ops at 100% lane utilization.  The matrix planes
stream through VMEM exactly once; x stays VMEM-resident (~1.3 MB for
64³ p=2).  HBM traffic ≈ nnz·4 B — the roofline minimum.

Periodic axes (wrap columns are not constant flat shifts) and dof>1
fall back to the XLA path; the distributed layer handles periodicity by
halo exchange before the local kernel sees the data.

Use :class:`PallasStencilOperator` to pre-pack the layout once per
operator (e.g. around a whole CG solve), or ``pallas_matvec(A, x)`` for
one-off applications.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_matvec", "supported", "PallasStencilOperator"]

LANES = 128


def _rows_for(K: int, itemsize: int = 4) -> int:
    """Rows per grid step such that the double-buffered DT block
    (2·K·ROWS·128·itemsize) stays within ~10 MB of the 16 MB scoped
    VMEM budget (the rest holds xb + the output block)."""
    budget = 10 * 2**20
    r = 128
    while r > 8 and 2 * K * r * LANES * itemsize > budget:
        r //= 2
    return r


def supported(stencil) -> bool:
    """Open axes, scalar dof (any dim).  dof > 1 would need per-field
    deinterleaving; periodic wrap is not a constant flat shift."""
    return stencil.dof == 1 and not any(stencil.periodic)


def _flat_shifts(stencil) -> np.ndarray:
    """(K,) constant flat-index shift per slot (axis-0 fastest)."""
    offs = stencil.slot_offsets()  # (K, dim)
    c = np.zeros(offs.shape[0], dtype=np.int64)
    stride = 1
    for d in range(stencil.dim):
        c += offs[:, d] * stride
        stride *= stencil.node_shape[d]
    return c


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "nnodes", "guard", "rows", "interpret"),
)
def _flat_spmv(DT, xb, *, shifts, nnodes, guard, rows, interpret=False):
    """DT: (K, Mp, 128) slot-major planes; xb: (G+Mp+G, 128) packed x.
    Returns y: (Mp, 128)."""
    K, Mp, _ = DT.shape
    G = guard
    ROWS = rows
    nchunks = Mp // ROWS
    dtype = xb.dtype

    def kernel(dt_ref, x_ref, y_ref):
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        acc = jnp.zeros((ROWS, LANES), dtype)
        for s, c in enumerate(shifts):
            q, m = divmod(int(c), LANES)  # floor div: m in [0, 128)
            base = i * ROWS + G + q
            A = x_ref[pl.ds(base, ROWS), :]
            if m == 0:
                xs = A
            else:
                B = x_ref[pl.ds(base + 1, ROWS), :]
                ra = pltpu.roll(A, LANES - m, 1)
                rb = pltpu.roll(B, LANES - m, 1)
                xs = jnp.where(lane < LANES - m, ra, rb)
            acc = acc + dt_ref[s] * xs
        y_ref[:, :] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, LANES), dtype),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (K, ROWS, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(DT, xb)


class PallasStencilOperator:
    """A StencilMatrix re-packed for the flat Pallas kernel.

    Build once per operator (the slot-major transpose costs one pass
    over the matrix); ``matvec`` then runs at the HBM roofline.  Falls
    back to ``A.matvec`` when :func:`supported` is False.
    """

    def __init__(self, A, interpret: bool = False):
        self.A = A
        self.st = st = A.stencil
        self.interpret = interpret
        self.ok = supported(st)
        if not self.ok:
            return
        n, K = st.nnodes, st.K
        itemsize = jnp.dtype(A.data.dtype).itemsize
        self.rows = _rows_for(K, itemsize)
        M = math.ceil(n / LANES)
        Mp = math.ceil(M / self.rows) * self.rows
        c = _flat_shifts(st)
        G = int(np.max(np.abs(c))) // LANES + 2
        self.nnodes, self.M, self.Mp, self.G = n, M, Mp, G
        self.shifts = tuple(int(v) for v in c)
        data = A.data.reshape(n, K)
        DT = jnp.swapaxes(data, 0, 1)  # (K, n)
        DT = jnp.pad(DT, ((0, 0), (0, Mp * LANES - n)))
        self.DT = DT.reshape(K, Mp, LANES)

    def matvec(self, x):
        if not self.ok:
            return self.A.matvec(x)
        flat_in = x.ndim == 1
        xv = x.reshape(-1)
        pad_lo = self.G * LANES
        pad_hi = (self.G + self.Mp) * LANES - self.nnodes
        xb = jnp.pad(xv, (pad_lo, pad_hi)).reshape(-1, LANES)
        y = _flat_spmv(
            self.DT,
            xb,
            shifts=self.shifts,
            nnodes=self.nnodes,
            guard=self.G,
            rows=self.rows,
            interpret=self.interpret,
        )
        y = y.reshape(-1)[: self.nnodes]
        return y if flat_in else y.reshape(self.nnodes, 1)

    def __matmul__(self, x):
        return self.matvec(x)

    # CG/Jacobi interop: expose the pieces preconditioners ask for
    @property
    def stencil(self):
        return self.st

    @property
    def data(self):
        return self.A.data

    def scalar_diagonal(self):
        return self.A.scalar_diagonal()

    def diagonal(self):
        return self.A.diagonal()


def pallas_matvec(A, x, interpret: bool = False):
    """One-off SpMV through the Pallas kernel (pre-packs the layout on
    every call — prefer PallasStencilOperator around a solve)."""
    return PallasStencilOperator(A, interpret=interpret).matvec(x)
