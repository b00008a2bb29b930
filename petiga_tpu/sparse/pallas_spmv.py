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

dof > 1 (the BSR/BAIJ analog) uses the same kernel with per-field
vector planes: x is deinterleaved into ``dof`` flat planes, the matrix
into ``K·dof·dof`` slot-major planes, and each output field accumulates
``sum_{s,b} DT[s,a,b] * shift(x_b, c_s)`` — still one streaming pass
over the matrix at ~nnz·itemsize HBM traffic.

Periodic axes (wrap columns are not constant flat shifts) fall back to
the XLA path; the distributed layer handles periodicity by halo
exchange before the local kernel sees the data.

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


def _rows_for(planes: int, itemsize: int = 4):
    """Rows per grid step such that the double-buffered DT block
    (2·planes·ROWS·128·itemsize) stays within ~10 MB of the 16 MB scoped
    VMEM budget (the rest holds xb + the output block).  Returns None
    when even 8 rows do not fit (very large K·dof²)."""
    budget = 10 * 2**20
    r = 128
    while r > 8 and 2 * planes * r * LANES * itemsize > budget:
        r //= 2
    if 2 * planes * r * LANES * itemsize > budget:
        return None
    return r


def supported(stencil, itemsize: int = 4) -> bool:
    """Open axes, any dim, any dof whose K·dof² matrix planes fit the
    VMEM streaming budget; periodic wrap is not a constant flat shift."""
    if any(stencil.periodic):
        return False
    return _rows_for(stencil.K * stencil.dof**2, itemsize) is not None


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
    static_argnames=("shifts", "dof", "guard", "rows", "interpret"),
)
def _flat_spmv(DT, xb, *, shifts, dof, guard, rows, interpret=False):
    """DT: (K·dof·dof, Mp, 128) slot-major matrix planes (plane index
    ``(s·dof + a)·dof + b``); xb: (dof, G+Mp+G, 128) per-field packed x.
    Returns y: (dof, Mp, 128)."""
    Mp = DT.shape[1]
    G = guard
    ROWS = rows
    nchunks = Mp // ROWS
    dtype = xb.dtype
    K = len(shifts)

    NACC = 4  # independent accumulators to break the FMA latency chain

    def kernel(dt_ref, x_ref, y_ref):
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        acc = [
            [jnp.zeros((ROWS, LANES), dtype) for _ in range(NACC)]
            for _ in range(dof)
        ]
        loads = {}  # (b, q) -> window; slots sharing a sublane base reuse it
        masks = {}  # m -> lane mask

        def window(b, q):
            key = (b, q)
            if key not in loads:
                loads[key] = x_ref[b, pl.ds(i * ROWS + G + q, ROWS), :]
            return loads[key]

        for s, c in enumerate(shifts):
            q, m = divmod(int(c), LANES)  # floor div: m in [0, 128)
            for b in range(dof):
                A = window(b, q)
                if m == 0:
                    xs = A
                else:
                    B = window(b, q + 1)
                    if m not in masks:
                        masks[m] = lane < LANES - m
                    ra = pltpu.roll(A, LANES - m, 1)
                    rb = pltpu.roll(B, LANES - m, 1)
                    xs = jnp.where(masks[m], ra, rb)
                for a in range(dof):
                    j = s % NACC
                    acc[a][j] = acc[a][j] + dt_ref[(s * dof + a) * dof + b] * xs
        for a in range(dof):
            tot = acc[a][0]
            for j in range(1, NACC):
                tot = tot + acc[a][j]
            y_ref[a, :, :] = tot

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dof, Mp, LANES), dtype),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (K * dof * dof, ROWS, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dof, ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
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
        itemsize = jnp.dtype(A.data.dtype).itemsize
        self.ok = supported(st, itemsize)
        if not self.ok:
            return
        n, K, dof = st.nnodes, st.K, st.dof
        self.rows = _rows_for(K * dof * dof, itemsize)
        M = math.ceil(n / LANES)
        Mp = math.ceil(M / self.rows) * self.rows
        c = _flat_shifts(st)
        G = int(np.max(np.abs(c))) // LANES + 2
        self.nnodes, self.M, self.Mp, self.G = n, M, Mp, G
        self.dof = dof
        self.shifts = tuple(int(v) for v in c)
        # plane (s·dof + a)·dof + b <- data[n, s, a, b]
        DT = A.data.transpose(1, 2, 3, 0).reshape(K * dof * dof, n)
        DT = jnp.pad(DT, ((0, 0), (0, Mp * LANES - n)))
        self.DT = DT.reshape(K * dof * dof, Mp, LANES)

    def matvec(self, x):
        if not self.ok:
            return self.A.matvec(x)
        flat_in = x.ndim == 1
        xT = x.reshape(self.nnodes, self.dof).T  # (dof, n)
        pad_lo = self.G * LANES
        pad_hi = (self.G + self.Mp) * LANES - self.nnodes
        xb = jnp.pad(xT, ((0, 0), (pad_lo, pad_hi))).reshape(
            self.dof, -1, LANES
        )
        y = _flat_spmv(
            self.DT,
            xb,
            shifts=self.shifts,
            dof=self.dof,
            guard=self.G,
            rows=self.rows,
            interpret=self.interpret,
        )
        y = y.reshape(self.dof, -1)[:, : self.nnodes].T  # (n, dof)
        return y.reshape(-1) if flat_in else y

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
