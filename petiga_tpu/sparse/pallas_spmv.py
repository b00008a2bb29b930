"""Pallas TPU stencil-SpMV kernel.

The XLA slot-loop SpMV (StencilMatrix.matvec) reaches only ~0.5-9% of
the HBM roofline on TPU: each of the K shifted multiply-adds re-reads
the shifted x window, and the (grid, K)-layout slot extraction defeats
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
stream through VMEM exactly once; HBM traffic ≈ nnz·4 B — the roofline
minimum.

Two kernel variants, selected automatically by the VMEM plan:

  * ``vmem`` — x (with guards) stays VMEM-resident for the whole kernel
    (~9 MB at 128³ p=2); windows are row-shifted VMEM loads.  84% of the
    HBM roofline measured on v5e (artifacts/bench_spmv.json).
  * ``hbm`` — for grids whose x exceeds the VMEM budget (256³ p=2 needs
    69 MB): x stays in HBM and each grid step double-buffer-DMAs the
    (ROWS + 2G)-row window it needs into a VMEM scratch — the manual
    async-copy pipeline pattern.  Extra HBM traffic is the window
    overlap, ≈ (1 + 2G/ROWS)·|x| ≈ 0.15·|matrix| at 256³ p=2.

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

Packed-vector solver API: repacking x/y on every matvec costs more than
the O(vector) it touches (extra XLA fusion boundaries inside the solve
while_loop).  ``pack_vec``/``unpack_vec``/``matvec_xb`` keep an entire
Krylov solve in the packed (G+Mp+G, 128) layout — pack b once, iterate
on packed vectors (axpys/dots are exact: padding and guard rows are
zero for open axes), unpack the solution once.  See
``petiga_tpu.solve.krylov.cg`` usage in bench.py.

Use :class:`PallasStencilOperator` to pre-pack the layout once per
operator (e.g. around a whole CG solve), or ``pallas_matvec(A, x)`` for
one-off applications.  ``PallasStencilOperator.from_planes`` builds the
operator directly from slot-major planes (the zero-copy path used by
``assemble_system_planes`` for meshes where node-major storage plus the
packed planes would exceed HBM, e.g. 256³ p=2 = 2×8.6 GB).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_matvec",
    "supported",
    "PallasStencilOperator",
    "alignment_pads",
]

LANES = 128
VMEM_BUDGET = 14 * 2**20



def _pad0(a, pw):
    """Zero pad with a dtype-strong constant: the default Python-int 0
    pad value canonicalizes to i64 under x64 and changes the lowered
    HLO of otherwise f32-only programs (cache invalidation — ADVICE
    r4)."""
    return jnp.pad(a, pw, constant_values=np.zeros((), a.dtype))

def _default_pads(stencil, align=None):
    """Per-spatial-axis (lo, hi) grid pads: periodic halo (p, p) plus
    optional high-side alignment pads."""
    al = align if align is not None else (0,) * stencil.dim
    return tuple(
        (p, p + a) if per else (0, a)
        for p, per, a in zip(stencil.widths, stencil.periodic, al)
    )


def _ext_shape(stencil, align=None, pads=None):
    """Extended node shape from explicit or derived pads."""
    if pads is None:
        pads = _default_pads(stencil, align)
    return tuple(
        N + lo + hi for N, (lo, hi) in zip(stencil.node_shape, pads)
    )


def _flat_shifts(stencil, align=None, pads=None) -> np.ndarray:
    """(K,) constant flat-index shift per slot in the extended index
    space (axis-0 fastest)."""
    offs = stencil.slot_offsets()  # (K, dim)
    Ne = _ext_shape(stencil, align, pads)
    c = np.zeros(offs.shape[0], dtype=np.int64)
    stride = 1
    for d in range(stencil.dim):
        c += offs[:, d] * stride
        stride *= Ne[d]
    return c


def alignment_pads(stencil, lanes: int = LANES, row_aligned: bool = False):
    """Per-axis high-side pads making prod(ext_shape) divisible by
    ``lanes`` with minimal volume overhead — required by the zero-copy
    plane-direct layout (``from_planes``), where the flat tail pad of
    the packed arrays must be absorbed into the grid itself (a late
    flat-tail ``jnp.pad`` would copy the multi-GB plane array).

    ``row_aligned`` (dim == 3) additionally makes the product of the two
    FAST axes divisible by ``lanes``, so every slowest-axis layer is a
    whole number of (·, 128) rows — the plane array can then live in the
    kernel's (planes, M, 128) layout THROUGHOUT assembly.  Required at
    large scale: materializing the planes grid-shaped makes XLA lane-pad
    the minor spatial dim (e.g. 260→384, 1.5× = +4 GB at 256³) and
    insert layout copies, which OOMs the chip.

    Small exhaustive search over the fast axes (pads 0..31) with the
    slowest axis rounded up to the needed multiple.
    """
    N = _ext_shape(stencil)  # include periodic halos
    dim = stencil.dim
    if dim == 1:
        extra = (-N[0]) % lanes
        return (extra,)
    best = None
    import itertools

    rng = range(0, 32)
    fast_axes = list(range(dim - 1))
    for pads in itertools.product(rng, repeat=len(fast_axes)):
        rest = 1
        for ax, a in zip(fast_axes, pads):
            rest *= N[ax] + a
        if row_aligned:
            if rest % lanes:
                continue
            last = N[dim - 1]
        else:
            g = math.gcd(rest, lanes)
            mult = lanes // g
            last = math.ceil(N[dim - 1] / mult) * mult
        vol = rest * last
        if best is None or vol < best[0]:
            best = (vol, pads + (last - N[dim - 1],))
    if best is None:
        raise ValueError("no row-aligned pad found")
    return tuple(best[1])


def _plan(stencil, itemsize: int = 4, align=None, pads=None, planes=None):
    """VMEM plan: (kind, rows, guard, M, next).

    kind "vmem": x + guards VMEM-resident alongside the double-buffered
    DT block and the output block.  kind "hbm": x stays in HBM, each
    grid step DMAs its (rows + 2·guard)-row window into scratch.
    Returns None when nothing fits (very large K·dof²)."""
    K, dof = stencil.K, stencil.dof
    if planes is None:
        planes = K * dof * dof
    Ne = _ext_shape(stencil, align, pads)
    next_ = int(np.prod(Ne))
    M = math.ceil(next_ / LANES)
    c = _flat_shifts(stencil, align, pads)
    G = int(np.max(np.abs(c))) // LANES + 2
    for r in (128, 64, 32, 16, 8):
        Mp = math.ceil(M / r) * r
        x_bytes = dof * (Mp + 2 * G) * LANES * itemsize
        dt_bytes = 2 * planes * r * LANES * itemsize
        out_bytes = 2 * dof * r * LANES * itemsize
        if x_bytes + dt_bytes + out_bytes <= VMEM_BUDGET:
            return ("vmem", r, G, M, next_)
    Gh = -(-G // 8) * 8  # sublane-aligned DMA windows
    # The x window-read amplification is (rows + 2·guard)/rows, so rows
    # should be as large as the physical VMEM allows (v5e: 128 MiB per
    # core; the kernel raises Mosaic's scoped-vmem cap accordingly).
    # ~88 MiB of explicit buffers leaves headroom for Mosaic's stack
    # and the (q-grouped, ≤2 live) window loads.
    # rows=512 passed the 124 MB compile-time check (116.8 MB of
    # explicit+stack buffers) but crashed the TPU worker at runtime at
    # 256^3 -- keep a real safety margin on the 128 MiB core
    hbm_budget = int(66 * 2**20)
    for r in (384, 256, 128, 64, 32, 16, 8):
        win = r + 2 * Gh
        dt_bytes = 2 * planes * r * LANES * itemsize
        x_bytes = 2 * dof * win * LANES * itemsize
        out_bytes = 2 * dof * r * LANES * itemsize
        if x_bytes + dt_bytes + out_bytes <= hbm_budget:
            return ("hbm", r, Gh, M, next_)
    return None


def supported(stencil, itemsize: int = 4) -> bool:
    """Any dim, any dof, open or periodic axes, provided the K·dof²
    matrix planes fit the streaming budget (either x VMEM-resident or
    the HBM-windowed variant)."""
    return _plan(stencil, itemsize) is not None


def _accumulate(window, shifts, dof, dtype, rows, dt_ref):
    """Shared accumulation body: for each slot shift c = 128·q + m, two
    row-shifted window loads + lane roll-with-carry, FMA into per-field
    accumulators (NACC-way split to break the FMA latency chain).

    Slots are processed GROUPED by their sublane offset q so at most two
    window loads per field are live at a time — an unordered slot loop
    keeps ~K live (rows, 128) window values and blows the Mosaic scoped
    VMEM budget at large guard sizes (256³: K=125 × 32 KB = 4 MB)."""
    NACC = 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    acc = [
        [jnp.zeros((rows, LANES), dtype) for _ in range(NACC)]
        for _ in range(dof)
    ]
    byq: dict = {}
    for s, c in enumerate(shifts):
        q, m = divmod(int(c), LANES)  # floor div: m in [0, 128)
        byq.setdefault(q, []).append((s, m))

    for q in sorted(byq):
        group = byq[q]
        need_hi = any(m != 0 for _, m in group)
        for b in range(dof):
            A = window(b, q)
            B = window(b, q + 1) if need_hi else None
            for s, m in group:
                if m == 0:
                    xs = A
                else:
                    # mask recomputed per slot: a cache keyed on m keeps
                    # up to ~K live (rows, 128) vectors and blows the
                    # Mosaic scoped-vmem stack at rows=512 (observed
                    # 116.8 MB); the compare is cheap VPU work.
                    # i32 cast: a bare Python int lowers to i64 under
                    # x64 and tpu.dynamic_rotate requires an i32 shift
                    sh = jnp.int32(LANES - m)
                    ra = pltpu.roll(A, sh, 1)
                    rb = pltpu.roll(B, sh, 1)
                    xs = jnp.where(lane < LANES - m, ra, rb)
                for a in range(dof):
                    j = s % NACC
                    acc[a][j] = (
                        acc[a][j] + dt_ref[(s * dof + a) * dof + b] * xs
                    )
    return [sum(acc[a][1:], acc[a][0]) for a in range(dof)]


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "dof", "guard", "rows", "interpret"),
)
def _flat_spmv(DT, xb, *, shifts, dof, guard, rows, interpret=False):
    """x-VMEM-resident variant.  DT: (K·dof·dof, M, 128) slot-major
    matrix planes (plane index ``(s·dof + a)·dof + b``); xb:
    (dof·(G+Mp+G), 128) per-field packed x segments stacked along rows,
    with Mp = ceil(M/rows)·rows.  Returns y: (dof, M, 128).

    Field segments are addressed with *static* row offsets into a 2-D
    ref (``x_ref[pl.ds(b·seg + ..., ROWS)]``) and the output block is
    written in one shot — integer leading-axis indexing of VMEM refs
    miscompiles on real Mosaic for dof>1 (correct under interpret=True),
    so only 2-D dynamic-slice reads and whole-block writes are used.
    """
    M = DT.shape[1]
    G = guard
    ROWS = rows
    nchunks = -(-M // ROWS)
    dtype = xb.dtype
    K = len(shifts)
    seg = G + nchunks * ROWS + G  # rows per field segment of xb

    def kernel(dt_ref, x_ref, y_ref):
        i = pl.program_id(0)

        def window(b, q):
            return x_ref[pl.ds(b * seg + i * ROWS + G + q, ROWS), :]

        tot = _accumulate(window, shifts, dof, dtype, ROWS, dt_ref)
        y_ref[:, :, :] = jnp.stack(tot, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dof, M, LANES), dtype),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (K * dof * dof, ROWS, LANES),
                lambda i: (jnp.int32(0), i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            # explicit whole-array map: the synthesized default returns
            # python-int zeros, which trace to i64 under x64 and fail
            # Mosaic legalization
            pl.BlockSpec(
                (dof * seg, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (dof, ROWS, LANES), lambda i: (jnp.int32(0), i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(DT, xb)


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "dof", "guard", "rows", "interpret"),
)
def _flat_spmv_hbm(DT, xb, *, shifts, dof, guard, rows, interpret=False):
    """HBM-windowed variant for grids whose packed x exceeds the VMEM
    budget (e.g. 256³ p=2: 69 MB).  x stays in HBM; each grid step
    double-buffer-DMAs the (ROWS + 2G)-row window it needs into a VMEM
    scratch (async-copy pipeline), so the next window streams while the
    current block computes.  Same layout contract as :func:`_flat_spmv`.
    """
    M = DT.shape[1]
    G = guard
    ROWS = rows
    WIN = ROWS + 2 * G
    nchunks = -(-M // ROWS)
    dtype = xb.dtype
    K = len(shifts)
    seg = G + nchunks * ROWS + G

    def kernel(x_hbm, dt_ref, y_ref, xwin, sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        def dma(slot_, chunk, b):
            # i32 casts: python-int literals (the i==0 prefetch) trace
            # to i64 under x64 and tpu.memref_slice requires i32
            slot_ = jnp.int32(slot_)
            chunk = jnp.int32(chunk)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(b * seg + chunk * ROWS, WIN), :],
                xwin.at[pl.ds((slot_ * dof + b) * WIN, WIN), :],
                sems.at[slot_, jnp.int32(b)],
            )

        @pl.when(i == 0)
        def _():
            for b in range(dof):
                dma(0, 0, b).start()

        @pl.when(i + 1 < nchunks)
        def _():
            for b in range(dof):
                dma(1 - slot, i + 1, b).start()

        for b in range(dof):
            dma(slot, i, b).wait()

        def window(b, q):
            return xwin[pl.ds((slot * dof + b) * WIN + G + q, ROWS), :]

        tot = _accumulate(window, shifts, dof, dtype, ROWS, dt_ref)
        y_ref[:, :, :] = jnp.stack(tot, axis=0)

    kwargs = {}
    if not interpret:
        # Mosaic's default scoped-vmem limit is 16 MB; the plan sizes
        # rows against ~88 MB of explicit buffers (large rows shrink the
        # x window-read amplification (rows+2G)/rows), so raise the cap
        # toward the 128 MB physical VMEM of a v5e core.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dof, M, LANES), dtype),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays off-chip
            pl.BlockSpec(
                (K * dof * dof, ROWS, LANES),
                lambda i: (jnp.int32(0), i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (dof, ROWS, LANES), lambda i: (jnp.int32(0), i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * dof * WIN, LANES), dtype),
            pltpu.SemaphoreType.DMA((2, dof)),
        ],
        interpret=interpret,
        **kwargs,
    )(xb, DT)


@functools.partial(
    jax.jit,
    static_argnames=("shifts", "dof", "guard", "rows", "interpret"),
)
def _flat_spmv_sym(DTu, xb, *, shifts, dof=1, guard, rows,
                   interpret=False):
    """Symmetric (mirrored-slot) variant: ``DTu`` holds only the
    ``Ku = (K+1)//2`` upper slots (diagonal onward, flat shifts
    ``c >= 0``; plane index ``(ku·dof + a)·dof + b``); each stored plane
    is applied at ``+c`` (direct read) AND transposed at ``-c``
    (mirror) in ONE streaming pass — half the full-storage HBM traffic,
    matching the reference's SBAIJ MatMult (petigamat.c:400-405,
    493-495).  dof > 1 applies the transposed dof×dof block on the
    mirror side (``y[j,b] += sum_a D[a,b]·x[i,a]``), the block analog of
    SBAIJ's ``MatMult_SeqSBAIJ`` upper-triangle walk.

    Mirror terms are forward scatters; each output field accumulates in
    its own VMEM ring of ``rows + qmax`` rows that slides with the
    grid: block ``j``'s slot-``c`` contribution lands at STATIC ring
    offset ``c`` (the ring base advances by ``rows`` per step), so no
    dynamic indexing is needed.  x is HBM-windowed like
    :func:`_flat_spmv_hbm`.
    """
    M = DTu.shape[1]
    G = guard
    ROWS = rows
    WIN = ROWS + 2 * G
    nchunks = -(-M // ROWS)
    dtype = xb.dtype
    Ku = len(shifts)
    seg = G + nchunks * ROWS + G
    assert shifts[0] == 0 and all(c >= 0 for c in shifts)
    qmax = max(c // LANES for c in shifts)
    RING = ROWS + qmax + 2

    def kernel(x_hbm, dt_ref, y_ref, xwin, ring, sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        def dma(slot_, chunk, b):
            slot_ = jnp.int32(slot_)  # i64 under x64 otherwise
            chunk = jnp.int32(chunk)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(b * seg + chunk * ROWS, WIN), :],
                xwin.at[pl.ds((slot_ * dof + b) * WIN, WIN), :],
                sems.at[slot_, jnp.int32(b)],
            )

        @pl.when(i == 0)
        def _():
            ring[:, :] = jnp.zeros((dof * RING, LANES), dtype)
            for b in range(dof):
                dma(0, 0, b).start()

        @pl.when(i + 1 < nchunks)
        def _():
            for b in range(dof):
                dma(1 - slot, i + 1, b).start()

        for b in range(dof):
            dma(slot, i, b).wait()

        def window(b, q):
            return xwin[pl.ds((slot * dof + b) * WIN + G + q, ROWS), :]

        # direct terms (existing q-grouped accumulation)
        tot = _accumulate(window, shifts, dof, dtype, ROWS, dt_ref)

        # mirror terms: u_b = sum_a D_c[a,b] ⊙ x_a (aligned block,
        # transposed), forward-shifted by +c into field b's ring
        # (static offsets; lane roll with row carry)
        x0 = [window(a, 0) for a in range(dof)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        for ku in range(1, Ku):
            c = int(shifts[ku])
            q, m = divmod(c, LANES)
            for b in range(dof):
                u = dt_ref[(ku * dof + 0) * dof + b] * x0[0]
                for a in range(1, dof):
                    u = u + dt_ref[(ku * dof + a) * dof + b] * x0[a]
                r0 = b * RING
                if m == 0:
                    ring[r0 + q:r0 + q + ROWS, :] = (
                        ring[r0 + q:r0 + q + ROWS, :] + u
                    )
                else:
                    v = pltpu.roll(u, jnp.int32(m), 1)
                    ring[r0 + q:r0 + q + ROWS, :] = (
                        ring[r0 + q:r0 + q + ROWS, :]
                        + jnp.where(lane >= m, v, 0.0)
                    )
                    ring[r0 + q + 1:r0 + q + 1 + ROWS, :] = (
                        ring[r0 + q + 1:r0 + q + 1 + ROWS, :]
                        + jnp.where(lane < m, v, 0.0)
                    )

        # emit: direct + matured ring rows, then slide each field ring
        y_ref[:, :, :] = jnp.stack(
            [tot[b] + ring[b * RING:b * RING + ROWS, :] for b in range(dof)],
            axis=0,
        )
        for b in range(dof):
            r0 = b * RING
            tail = ring[r0 + ROWS:r0 + RING, :]
            ring[r0:r0 + RING - ROWS, :] = tail
            ring[r0 + RING - ROWS:r0 + RING, :] = jnp.zeros(
                (ROWS, LANES), dtype
            )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dof, M, LANES), dtype),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays off-chip
            pl.BlockSpec(
                (Ku * dof * dof, ROWS, LANES),
                lambda i: (jnp.int32(0), i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (dof, ROWS, LANES), lambda i: (jnp.int32(0), i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * dof * WIN, LANES), dtype),
            pltpu.VMEM((dof * RING, LANES), dtype),
            pltpu.SemaphoreType.DMA((2, dof)),
        ],
        interpret=interpret,
        **kwargs,
    )(xb, DTu)


class PallasStencilOperator:
    """A StencilMatrix re-packed for the flat Pallas kernel.

    Build once per operator (the slot-major transpose costs one pass
    over the matrix); ``matvec`` then runs at the HBM roofline.  Falls
    back to ``A.matvec`` when :func:`supported` is False.
    """

    def __init__(self, A=None, interpret: bool | None = None, *,
                 stencil=None, align=None, dtype=None, force_kind=None,
                 ext_pads=None):
        self.A = A
        self.st = st = A.stencil if A is not None else stencil
        if interpret is None:
            # Mosaic only exists on TPU; elsewhere (CPU tests, debugging)
            # run the kernel through the interpreter.
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        dtype = A.data.dtype if A is not None else dtype
        self.dtype = dtype
        itemsize = jnp.dtype(dtype).itemsize
        self.align = align
        # per-spatial-axis (lo, hi) grid pads: explicit (the shard_map
        # halo-frame layout) or derived (periodic halo + alignment)
        pads = (tuple(ext_pads) if ext_pads is not None
                else _default_pads(st, align))
        self.pads = pads
        plan = _plan(st, itemsize, pads=pads)
        self.ok = plan is not None
        if not self.ok:
            return
        if force_kind is not None and plan[0] != force_kind:
            # testing hook: exercise the HBM-windowed kernel on grids
            # small enough that the VMEM plan would normally win
            kind, r, G, M_, next__ = plan
            if force_kind == "hbm":
                plan = ("hbm", r, -(-G // 8) * 8, M_, next__)
            else:
                raise ValueError(f"cannot force {force_kind} here")
        self.kind, self.rows, self.G, M, next_ = plan
        dim, K, dof = st.dim, st.K, st.dof
        N = st.node_shape
        self.Ne = _ext_shape(st, pads=pads)
        self.next = next_
        self.M = M
        self.Mp = math.ceil(M / self.rows) * self.rows
        self.dof = dof
        self.shifts = tuple(int(v) for v in _flat_shifts(st, pads=pads))
        # grid layout = reversed axes
        self._gpads = [pads[dim - 1 - g] for g in range(dim)]
        self._any_per = any(st.periodic)
        self.DT = self.pack_planes(
            A.data.reshape(tuple(N[::-1]) + (K * dof * dof,))
        ) if A is not None else None  # else supplied via from_planes

    def _setup_sym(self):
        """Re-plan this operator for the mirrored-slot kernel: only the
        ``Ku·dof²`` upper planes are stored AND streamed."""
        st = self.st
        if any(st.periodic):
            raise ValueError("sym kernel requires open axes")
        Ku = (st.K + 1) // 2
        plan = _plan(st, jnp.dtype(self.dtype).itemsize,
                     pads=self.pads, planes=Ku * st.dof * st.dof)
        kind, r, G, M, next_ = plan
        self.rows = r
        self.G = -(-G // 8) * 8
        self.Mp = math.ceil(self.M / self.rows) * self.rows
        self.kind = "sym"
        shifts_all = _flat_shifts(st, pads=self.pads)
        self.shifts_u = tuple(int(v) for v in shifts_all[st.diag_slot:])
        if self.shifts_u[0] != 0 or any(c < 0 for c in self.shifts_u):
            raise ValueError("upper-slot shifts must be non-negative")

    @classmethod
    def from_symmetric(cls, S, interpret=None):
        """Pack a :class:`~petiga_tpu.sparse.stencil.SymmetricStencilMatrix`
        for the mirrored-slot kernel (kind ``"sym"``): only the
        ``Ku = (K+1)//2`` upper planes are stored AND streamed — the
        solve-time operator memory and HBM traffic are both halved,
        matching the reference's SBAIJ MatMult
        (petigamat.c:400-405, 493-495).  Any dof, open axes (the mirror
        applies the transposed dof×dof block)."""
        st = S.stencil
        op = cls(None, interpret, stencil=st, dtype=S.data.dtype)
        if not op.ok:
            raise ValueError("Pallas layout unsupported for this stencil")
        op._setup_sym()
        Ku = S.Ku
        N = st.node_shape
        op.DT = op.pack_planes(
            S.data.reshape(tuple(N[::-1]) + (Ku * st.dof * st.dof,)),
            planes=Ku * st.dof * st.dof,
        )
        op.A = S  # diagonal/fallback surface
        return op

    @classmethod
    def from_planes_symmetric(cls, stencil, DTu, align, interpret=None):
        """Zero-copy symmetric construction from pre-packed upper-slot
        planes (Ku·dof², M, 128) on the alignment-padded grid — the path
        symmetric plane-direct assembly uses so the half-storage
        operator is never expanded (256³ p=2: 4.3 GB instead of
        8.6 GB)."""
        op = cls(None, interpret, stencil=stencil, align=align,
                 dtype=DTu.dtype)
        if not op.ok:
            raise ValueError("Pallas layout unsupported for this stencil")
        op._setup_sym()
        Ku = (stencil.K + 1) // 2
        want = (Ku * stencil.dof**2, op.M, LANES)
        if DTu.shape != want:
            raise ValueError(f"plane shape {DTu.shape} != {want}")
        op.DT = DTu
        return op

    @classmethod
    def from_planes(cls, stencil, DT, align, interpret=None):
        """Zero-copy construction from pre-packed slot-major planes
        (K·dof², M, 128) laid out on the alignment-padded grid
        (``alignment_pads``) — the path ``assemble_system_planes`` uses
        so the multi-GB operator is never stored twice."""
        op = cls(None, interpret, stencil=stencil, align=align,
                 dtype=DT.dtype)
        if not op.ok:
            raise ValueError("Pallas layout unsupported for this stencil")
        if DT.shape != (stencil.K * stencil.dof**2, op.M, LANES):
            raise ValueError(
                f"plane shape {DT.shape} != "
                f"{(stencil.K * stencil.dof**2, op.M, LANES)}"
            )
        op.DT = DT
        return op

    # ------------------------------------------------------------- packing

    def pack_planes(self, data_grid, planes=None):
        """(N_rev..., K·dof²) grid-layout slot data -> (K·dof², M, 128)
        kernel planes (halo/pad rows zero).  Jittable — this is also the
        per-solve local pack the distributed solvers run inside
        shard_map (one pass over the local operator)."""
        st = self.st
        if planes is None:
            planes = st.K * st.dof * st.dof
        if any(pp != (0, 0) for pp in self._gpads):
            data_grid = _pad0(data_grid, self._gpads + [(0, 0)])
        DT = data_grid.reshape(self.next, planes).T
        DT = _pad0(DT, ((0, 0), (0, self.M * LANES - self.next)))
        return DT.reshape(planes, self.M, LANES)

    def pack_ext(self, x_ext):
        """Pack an ALREADY-extended grid (Ne_rev..., dof) — e.g. the
        shard_map halo-exchanged local block — into the kernel vector
        layout (dof·(G+Mp+G), 128)."""
        xT = x_ext.reshape(self.next, self.st.dof).T
        pad_lo = self.G * LANES
        pad_hi = (self.G + self.Mp) * LANES - self.next
        return _pad0(xT, ((0, 0), (pad_lo, pad_hi))).reshape(-1, LANES)

    def _pack_x(self, x):
        """(nnodes, dof) -> (dof·(G+Mp+G), 128) on the extended grid
        with wrap halos for periodic axes."""
        st = self.st
        dim = st.dim
        xg = x.reshape(tuple(st.node_shape[::-1]) + (st.dof,))
        for g in range(dim):
            lo, hi = self._gpads[g]
            d = dim - 1 - g
            if st.periodic[d] and lo > 0:
                pw = [(0, 0)] * (dim + 1)
                pw[g] = (lo, lo)
                xg = jnp.pad(xg, pw, mode="wrap")
                lo, hi = 0, hi - lo
            if (lo, hi) != (0, 0):
                pw = [(0, 0)] * (dim + 1)
                pw[g] = (lo, hi)
                xg = _pad0(xg, pw)
        return self.pack_ext(xg)

    def _unpack_y(self, y):
        """(dof, M or Mp, 128) -> (nnodes, dof): crop the extended
        grid."""
        st = self.st
        dim = st.dim
        y = y.reshape(self.dof, -1)[:, : self.next].T  # (next, dof)
        if any(pp != (0, 0) for pp in self._gpads):
            yg = y.reshape(tuple(self.Ne[::-1]) + (self.dof,))
            sl = tuple(
                slice(lo, lo + st.node_shape[dim - 1 - g])
                for g, (lo, _) in enumerate(self._gpads)
            )
            y = yg[sl].reshape(st.nnodes, self.dof)
        return y

    # public packed-vector API (solver loops stay in kernel layout)

    def pack_vec(self, x):
        """Flat (nnodes·dof,) or (nnodes, dof) -> packed
        (dof·(G+Mp+G), 128).  Linear; zero padding/guards for open axes,
        wrapped halo copies for periodic axes."""
        return self._pack_x(x.reshape(self.st.nnodes, self.dof))

    def unpack_vec(self, xb, flat: bool = False):
        """Packed -> (nnodes, dof) (or flat (nnodes·dof,))."""
        seg = xb.shape[0] // self.dof
        y = xb.reshape(self.dof, seg, LANES)[:, self.G: seg - self.G]
        y = self._unpack_y(y)
        return y.reshape(-1) if flat else y

    def embed(self, y):
        """Kernel output (dof, M, 128) -> packed layout with zero
        guards (valid as solver-iterate layout for OPEN axes)."""
        pad_hi = self.G + self.Mp - y.shape[1]
        return _pad0(y, ((0, 0), (self.G, pad_hi), (0, 0))).reshape(
            -1, LANES
        )

    def packed_mask(self):
        """(dof·seg, 128) 1/0 mask of real (owned) entries — for exact
        dots on packed vectors when halo rows duplicate entries
        (periodic axes).  Open axes: dots on packed vectors are already
        exact (padding is zero)."""
        g2 = np.zeros(tuple(self.Ne[::-1]) + (self.dof,), np.float32)
        sl = tuple(
            slice(lo, lo + self.st.node_shape[self.st.dim - 1 - gg])
            for gg, (lo, _) in enumerate(self._gpads)
        )
        g2[sl] = 1.0
        xT = g2.reshape(self.next, self.dof).T
        pad_lo = self.G * LANES
        pad_hi = (self.G + self.Mp) * LANES - self.next
        out = np.pad(xT, ((0, 0), (pad_lo, pad_hi))).reshape(-1, LANES)
        return jnp.asarray(out)

    # --------------------------------------------------------------- apply

    def _kernel(self, DT, xb):
        if self.kind == "sym":
            return _flat_spmv_sym(
                DT, xb, shifts=self.shifts_u, dof=self.dof, guard=self.G,
                rows=self.rows, interpret=self.interpret,
            )
        fn = _flat_spmv if self.kind == "vmem" else _flat_spmv_hbm
        return fn(
            DT,
            xb,
            shifts=self.shifts,
            dof=self.dof,
            guard=self.G,
            rows=self.rows,
            interpret=self.interpret,
        )

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
        y = self._unpack_y(self._kernel(DT, xb))
        return y.reshape(-1) if flat_in else y

    def matvec_xb(self, DT, xb):
        """Packed-in, packed-out matvec — the solver-loop fast path.

        Open axes: guards/padding are zero and stay zero under the
        solver's linear updates, so iterating entirely on packed vectors
        is exact.  Periodic axes: the halo rows must be re-wrapped after
        each apply (one grid-layout round trip, O(vector))."""
        y = self._kernel(DT, xb)
        if self._any_per:
            return self._pack_x(self._unpack_y(y))
        return self.embed(y)

    def packed_diag_inv(self):
        """Jacobi inverse-diagonal in packed layout (zero on padding so
        preconditioned residuals stay zero there)."""
        d = self.A.scalar_diagonal() if self.A is not None else (
            self.diag_from_planes()
        )
        inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
        return self._pack_x(inv.reshape(self.st.nnodes, self.dof))

    def diag_from_planes(self, DT=None):
        """Scalar diagonal recovered from the packed planes (nnodes,
        dof) — for ``from_planes`` operators with no StencilMatrix.
        Symmetric storage keeps the diagonal slot first (ku = 0).
        Pass ``DT`` explicitly inside jitted code (closing over
        ``self.DT`` embeds the planes as an HLO constant)."""
        if DT is None:
            DT = self.DT
        s = self.st
        dslot = 0 if self.kind == "sym" else s.diag_slot
        cols = []
        for a in range(self.dof):
            plane = DT[(dslot * self.dof + a) * self.dof + a]
            cols.append(plane.reshape(-1)[: self.next])
        y = jnp.stack(cols, axis=-1)  # (next, dof)
        return self._unpack_from_ext(y)

    def packed_diag_inv_of(self, DT):
        """Jacobi inverse-diagonal in packed layout from explicit
        planes (jit-argument form of :meth:`packed_diag_inv`)."""
        d = self.diag_from_planes(DT)
        inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
        return self._pack_x(inv.reshape(self.st.nnodes, self.dof))

    def _unpack_from_ext(self, y):
        dim = self.st.dim
        if any(pp != (0, 0) for pp in self._gpads):
            yg = y.reshape(tuple(self.Ne[::-1]) + (self.dof,))
            sl = tuple(
                slice(lo, lo + self.st.node_shape[dim - 1 - g])
                for g, (lo, _) in enumerate(self._gpads)
            )
            y = yg[sl].reshape(self.st.nnodes, self.dof)
        return y

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
        if self.A is not None:
            return self.A.scalar_diagonal()
        return self.diag_from_planes()

    def diagonal(self):
        if self.A is not None:
            return self.A.diagonal()
        s = self.st
        dof = self.dof
        dslot = 0 if self.kind == "sym" else s.diag_slot
        blocks = []
        for a in range(dof):
            row = []
            for b in range(dof):
                plane = self.DT[(dslot * dof + a) * dof + b]
                row.append(plane.reshape(-1)[: self.next])
            blocks.append(jnp.stack(row, axis=-1))
        y = jnp.stack(blocks, axis=-2)  # (next, dof, dof)
        if any(pp != (0, 0) for pp in self._gpads):
            dim = s.dim
            yg = y.reshape(tuple(self.Ne[::-1]) + (dof, dof))
            sl = tuple(
                slice(lo, lo + s.node_shape[dim - 1 - g])
                for g, (lo, _) in enumerate(self._gpads)
            )
            y = yg[sl].reshape(s.nnodes, dof, dof)
        return y


def pallas_matvec(A, x, interpret: bool = False):
    """One-off SpMV through the Pallas kernel (pre-packs the layout on
    every call — prefer PallasStencilOperator around a solve)."""
    return PallasStencilOperator(A, interpret=interpret).matvec(x)
