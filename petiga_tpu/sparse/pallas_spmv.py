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

Periodic axes (petigaaxis.c wrap semantics) are handled by packing on
the *extended* grid: each periodic axis is padded by p on both sides,
matrix rows in the halo hold zero planes and the x halo holds the
wrapped copies, so every slot is again a constant flat shift in the
extended index space.  The overhead is the halo volume
(prod(N_d + 2 p_d) / prod(N_d) − 1 ≈ 3·2p/N extra zero rows streamed),
e.g. +20% for periodic 64³ p=2 — still ~4x faster than the XLA path.

dof > 1 (the BSR/BAIJ analog) uses the same kernel with per-field
vector planes: x is deinterleaved into ``dof`` flat planes, the matrix
into ``K·dof·dof`` slot-major planes, and each output field accumulates
``sum_{s,b} DT[s,a,b] * shift(x_b, c_s)`` — still one streaming pass
over the matrix at ~nnz·itemsize HBM traffic.

The VMEM plan keeps x (with guards), the double-buffered DT block and
the output block within ~14 MB; when no row-block size fits (very large
K·dof² or an x too big for VMEM residency) ``supported`` is False and
callers fall back to the XLA path.

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
VMEM_BUDGET = 14 * 2**20


def _ext_shape(stencil):
    """Extended node shape: periodic axes padded by p on both sides."""
    return tuple(
        N + 2 * p if per else N
        for N, p, per in zip(
            stencil.node_shape, stencil.widths, stencil.periodic
        )
    )


def _flat_shifts(stencil) -> np.ndarray:
    """(K,) constant flat-index shift per slot in the extended index
    space (axis-0 fastest)."""
    offs = stencil.slot_offsets()  # (K, dim)
    Ne = _ext_shape(stencil)
    c = np.zeros(offs.shape[0], dtype=np.int64)
    stride = 1
    for d in range(stencil.dim):
        c += offs[:, d] * stride
        stride *= Ne[d]
    return c


def _plan(stencil, itemsize: int = 4):
    """VMEM plan: (rows, guard, M, next) with x + guards, the
    double-buffered DT block and the output block within the budget.
    Returns None when nothing fits."""
    K, dof = stencil.K, stencil.dof
    planes = K * dof * dof
    Ne = _ext_shape(stencil)
    next_ = int(np.prod(Ne))
    M = math.ceil(next_ / LANES)
    c = _flat_shifts(stencil)
    G = int(np.max(np.abs(c))) // LANES + 2
    for r in (128, 64, 32, 16, 8):
        Mp = math.ceil(M / r) * r
        x_bytes = dof * (Mp + 2 * G) * LANES * itemsize
        dt_bytes = 2 * planes * r * LANES * itemsize
        out_bytes = 2 * dof * r * LANES * itemsize
        if x_bytes + dt_bytes + out_bytes <= VMEM_BUDGET:
            return r, G, M, next_
    return None


def supported(stencil, itemsize: int = 4) -> bool:
    """Any dim, any dof, open or periodic axes, provided the K·dof²
    matrix planes plus the VMEM-resident x fit the streaming budget."""
    return _plan(stencil, itemsize) is not None


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "dof", "guard", "rows", "interpret"),
)
def _flat_spmv(DT, xb, *, shifts, dof, guard, rows, interpret=False):
    """DT: (K·dof·dof, Mp, 128) slot-major matrix planes (plane index
    ``(s·dof + a)·dof + b``); xb: (dof·(G+Mp+G), 128) per-field packed x
    segments stacked along rows.  Returns y: (dof, Mp, 128).

    Field segments are addressed with *static* row offsets into a 2-D
    ref (``x_ref[pl.ds(b·seg + ..., ROWS)]``) and the output block is
    written in one shot — integer leading-axis indexing of VMEM refs
    miscompiles on real Mosaic for dof>1 (correct under interpret=True),
    so only 2-D dynamic-slice reads and whole-block writes are used.
    """
    Mp = DT.shape[1]
    G = guard
    ROWS = rows
    nchunks = Mp // ROWS
    dtype = xb.dtype
    K = len(shifts)
    seg = G + Mp + G  # rows per field segment of xb

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
                loads[key] = x_ref[
                    pl.ds(b * seg + i * ROWS + G + q, ROWS), :
                ]
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
        tot = [
            sum(acc[a][1:], acc[a][0])
            for a in range(dof)
        ]
        y_ref[:, :, :] = jnp.stack(tot, axis=0)

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

    def __init__(self, A, interpret: bool | None = None):
        self.A = A
        self.st = st = A.stencil
        if interpret is None:
            # Mosaic only exists on TPU; elsewhere (CPU tests, debugging)
            # run the kernel through the interpreter.
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        itemsize = jnp.dtype(A.data.dtype).itemsize
        plan = _plan(st, itemsize)
        self.ok = plan is not None
        if not self.ok:
            return
        self.rows, self.G, M, next_ = plan
        dim, K, dof = st.dim, st.K, st.dof
        N = st.node_shape
        p = st.widths
        self.Ne = Ne = _ext_shape(st)
        self.next = next_
        self.M = M
        self.Mp = Mp = math.ceil(M / self.rows) * self.rows
        self.dof = dof
        self.shifts = tuple(int(v) for v in _flat_shifts(st))
        # grid pad spec for periodic axes (grid layout = reversed axes)
        self._gpads = [
            (p[dim - 1 - g], p[dim - 1 - g])
            if st.periodic[dim - 1 - g]
            else (0, 0)
            for g in range(dim)
        ]
        self._any_per = any(st.periodic)
        # pack matrix planes on the extended grid: halo rows zero
        dg = A.data.reshape(tuple(N[::-1]) + (K * dof * dof,))
        if self._any_per:
            dg = jnp.pad(dg, self._gpads + [(0, 0)])
        DT = dg.reshape(next_, K * dof * dof).T
        DT = jnp.pad(DT, ((0, 0), (0, Mp * LANES - next_)))
        self.DT = DT.reshape(K * dof * dof, Mp, LANES)

    def _pack_x(self, x):
        """(nnodes, dof) -> (dof, G+Mp+G, 128) on the extended grid with
        wrap halos for periodic axes."""
        st = self.st
        dim = st.dim
        xg = x.reshape(tuple(st.node_shape[::-1]) + (st.dof,))
        if self._any_per:
            for g in range(dim):
                if self._gpads[g] != (0, 0):
                    pw = [(0, 0)] * (dim + 1)
                    pw[g] = self._gpads[g]
                    xg = jnp.pad(xg, pw, mode="wrap")
        xT = xg.reshape(self.next, st.dof).T  # (dof, next)
        pad_lo = self.G * LANES
        pad_hi = (self.G + self.Mp) * LANES - self.next
        return jnp.pad(xT, ((0, 0), (pad_lo, pad_hi))).reshape(-1, LANES)

    def _unpack_y(self, y):
        """(dof, Mp, 128) -> (nnodes, dof): crop the extended grid."""
        st = self.st
        dim = st.dim
        y = y.reshape(self.dof, -1)[:, : self.next].T  # (next, dof)
        if self._any_per:
            yg = y.reshape(tuple(self.Ne[::-1]) + (self.dof,))
            sl = tuple(
                slice(lo, lo + st.node_shape[dim - 1 - g])
                for g, (lo, _) in enumerate(self._gpads)
            )
            y = yg[sl].reshape(st.nnodes, self.dof)
        return y

    def matvec(self, x):
        if not self.ok:
            return self.A.matvec(x)
        return self.matvec_packed(self.DT, x)

    def matvec_packed(self, DT, x):
        """matvec with the packed slot-major planes passed explicitly.

        Closing a jitted solve over ``self.DT`` embeds the (GB-scale)
        planes as an HLO constant — which overflows remote-compile
        request limits and bloats executables.  Pass ``op.DT`` as a jit
        argument and apply with this method instead; ``self`` then only
        contributes static packing metadata."""
        flat_in = x.ndim == 1
        xb = self._pack_x(x.reshape(self.st.nnodes, self.dof))
        y = _flat_spmv(
            DT,
            xb,
            shifts=self.shifts,
            dof=self.dof,
            guard=self.G,
            rows=self.rows,
            interpret=self.interpret,
        )
        y = self._unpack_y(y)
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
