"""Batched assembly drivers — the TPU-native replacement of the
reference's element-loop drivers (``petigaksp.c`` IGAComputeSystem/
Vector/Matrix, ``petigasnes.c`` IGAComputeFunction/Jacobian,
``petigacomp.c`` IGAComputeScalar/ErrorNorm) and of the per-element
Dirichlet machinery (``petigaelem.c`` FixSystem/FixFunction/FixJacobian,
:1360-1523).

Design: user forms are *pure functions of one quadrature point*
(vmapped over elements, scanned over quadrature points); Jacobians come
from forward-mode AD of the element residual (replacing petigafdjac.c
and the C++ FAD layer); element contributions are scattered into the
stencil operator with a translation-invariant slot table.  The element
loop is a ``lax.scan`` over fixed-size chunks so memory stays bounded
and the whole assembly jits into one XLA program.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.stencil import Stencil, StencilMatrix
from ..utils import profiling
from .point import Point
from .tabulation import PointBlock, tabulate_elements

__all__ = [
    "stencil_of",
    "assemble_system",
    "assemble_system_planes",
    "assemble_separable_planes",
    "assemble_matrix",
    "assemble_vector",
    "assemble_function",
    "assemble_jacobian",
    "compute_scalar",
    "compute_error_norm",
    "boundary_flux_vector",
    "dirichlet_post_fix",
]


# ----------------------------------------------------------------- utilities



def _highest(fn):
    """Trace the wrapped driver under highest matmul precision: the
    MXU's default single-pass-bf16 f32 matmul contaminates assembly,
    residuals, and functionals at ~1e-3 relative (the reference is f64
    end to end; f32 paths must be f32-grade).  Applies at trace time,
    so user form callbacks evaluated inside are covered too."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped

def stencil_of(space) -> Stencil:
    return Stencil(
        node_shape=space.node_shape,
        widths=space.degrees,
        periodic=space.periodic,
        dof=space.dof,
    )


def _points_of(pb: PointBlock, q: int = None):
    """Split a PointBlock into per-q Point leaves (stacked over B)."""
    order = len(pb.shape) - 1
    return Point(
        u=pb.u,
        x=pb.x,
        shape0=pb.shape[0],
        shape1=pb.shape[1] if order >= 1 else None,
        shape2=pb.shape[2] if order >= 2 else None,
        shape3=pb.shape[3] if order >= 3 else None,
        shape4=pb.shape[4] if order >= 4 else None,
        normal=pb.normal,
        gmap1=pb.gmap1,
        gmap2=pb.gmap2,
    )


def _scan_points(pb: PointBlock, body: Callable, init):
    """scan over the quadrature axis (axis 1) of a PointBlock.

    ``body(acc, pt_batch, w_batch)`` with pt leaves of shape (B, ...).
    """
    pts = _points_of(pb)
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, 1, 0), (pts, pb.weight))

    def step(acc, x):
        pt, w = x
        return body(acc, pt, w), None

    acc, _ = jax.lax.scan(step, init, xs)
    return acc


def _chunks(space, chunk: Optional[int]):
    """Pad element ids to a multiple of chunk; returns (ids, valid) of
    shape (nchunks, chunk)."""
    nel = space.nel
    if chunk is None or chunk >= nel:
        chunk = nel
    nchunks = math.ceil(nel / chunk)
    ids = np.arange(nchunks * chunk, dtype=np.int32)
    valid = ids < nel
    ids = np.where(valid, ids, 0)
    return (
        jnp.asarray(ids.reshape(nchunks, chunk)),
        jnp.asarray(valid.reshape(nchunks, chunk)),
    )


def _fix_arrays(space, emap):
    """Per-element Dirichlet mask/values (float mask) flattened to
    (B, nen*dof)."""
    mask, vals = space.device("dirichlet")
    B = emap.shape[0]
    m = mask[emap].reshape(B, -1)
    v = vals[emap].reshape(B, -1)
    return m.astype(vals.dtype), v


def _fix_system(Ke, Fe, m, v):
    """Symmetric Dirichlet elimination with RHS lift, batched
    (petigaelem.c:1378-1387): zero row+col k, unit diagonal, F -= K[:,k] v,
    F[k] = v."""
    lift = m * v
    Fe = Fe - jnp.einsum("bij,bj->bi", Ke, lift)
    keep = 1.0 - m
    Ke = Ke * keep[:, :, None] * keep[:, None, :]
    n = Ke.shape[-1]
    Ke = Ke + m[:, :, None] * jnp.eye(n, dtype=Ke.dtype)[None]
    Fe = Fe * keep + lift
    return Ke, Fe


def _scatter_matrix(space, A_data, Ke, emap, valid):
    """Scatter element blocks (B, nen, nen, dof, dof) into stencil data."""
    st = stencil_of(space)
    slot = jnp.asarray(st.slot_table(space.nen_shape))  # (nen, nen)
    B, nen = emap.shape
    dof = space.dof
    Ke = Ke * valid[:, None, None, None, None].astype(Ke.dtype)
    rows = emap[:, :, None] * st.K + slot[None, :, :]  # (B, nen, nen)
    return A_data.at[rows.reshape(-1)].add(
        Ke.reshape(-1, dof, dof), mode="drop"
    )


def _scatter_vector(space, b, Fe, emap, valid):
    Fe = Fe * valid[:, None, None].astype(Fe.dtype)
    return b.at[emap.reshape(-1)].add(Fe.reshape(-1, space.dof), mode="drop")


def _faces_to_visit(space):
    return [
        (d, s)
        for d in range(space.dim)
        for s in range(2)
        if space.bc_visit[d][s]
    ]


def _face_elements(space, d, s):
    """Flat ids of elements adjacent to face (d, s) — host-side."""
    eshape = space.elem_shape
    multi = np.unravel_index(np.arange(space.nel), eshape, order="F")
    tgt = 0 if s == 0 else eshape[d] - 1
    return np.where(multi[d] == tgt)[0].astype(np.int32)


# --------------------------------------------------------------- assembly


def _normalize_K(K, nen, dof, dtype):
    K = jnp.asarray(K, dtype=dtype)
    return K.reshape(nen * dof, nen * dof)


def _normalize_F(F, nen, dof, dtype):
    F = jnp.asarray(F, dtype=dtype)
    return F.reshape(nen * dof)


_MULT_CACHE: dict = {}


def _node_multiplicity(space) -> np.ndarray:
    """(nnodes,) element multiplicity of every node — the Dirichlet
    diagonal value of the reference's per-element fix summed over
    elements (petigaelem.c:1383: each element adds 1).  Separable:
    per-axis closure counts outer-multiplied."""
    key = id(space)
    if key in _MULT_CACHE:
        return _MULT_CACHE[key]
    dim = space.dim
    parts = []
    for d in range(dim):
        m = np.zeros(space.node_shape[d])
        p1 = space.degrees[d] + 1
        off = np.asarray(space.tabs[d].offset)
        idx = (off[:, None] + np.arange(p1)[None, :]) % space.node_shape[d]
        np.add.at(m, idx.ravel(), 1.0)
        parts.append(m)
    g = np.ones(tuple(space.node_shape[::-1]))
    for gax in range(dim):
        d = dim - 1 - gax
        shape = [1] * dim
        shape[gax] = space.node_shape[d]
        g = g * parts[d].reshape(shape)
    out = g.reshape(-1)
    _MULT_CACHE[key] = out
    return out


_POSTFIX_CACHE: dict = {}


def _postfix_planes_fn(st, meta):
    """Cached jitted (DT, b, mask, vals, mult) -> (DT2, b2) for the
    plane layout.  ``meta`` = (Ne, gpads, M, shifts, dof, kind, rows, G,
    interpret) — hashable static layout; one trace/compile per layout,
    DT donated so the fix stays single-copy in HBM (256³: 8.6 GB)."""
    from ..sparse.pallas_spmv import (
        LANES, _flat_spmv, _flat_spmv_hbm, _flat_spmv_sym,
    )

    key = ("planes", st, meta)
    if key in _POSTFIX_CACHE:
        return _POSTFIX_CACHE[key]
    Ne, gpads, M, shifts, dof, kind, rows, G, interpret = meta
    dim, K = st.dim, st.K
    N = st.node_shape
    offs = st.slot_offsets()
    nflat = int(np.prod(Ne))
    Mp = -(-M // rows) * rows
    # symmetric (upper-slot) storage: the fix masks only the stored
    # slots (row OR column fixed zeroes the entry — same keep_a·keep_b
    # product, symmetric by construction) and the lift matvec runs the
    # mirrored-slot kernel
    sym = kind == "sym"
    slot_list = list(range(st.diag_slot, K)) if sym else list(range(K))
    wins = []
    for s in slot_list:
        sl = []
        for g in range(dim):
            d = dim - 1 - g
            o = int(offs[s, d])
            p = st.widths[d]
            sl.append(slice(p + o, p + o + Ne[::-1][g]))
        wins.append(tuple(sl))
    tail = ((0, 0), (0, M * LANES - nflat))

    def flat(grid_field):  # (Ne_rev,) -> (M, 128)
        return jnp.pad(grid_field.reshape(1, -1), tail).reshape(M, LANES)

    def run(DT, b, mask, vals, mult):
        dt = DT.dtype
        mask = mask.astype(dt)
        vals = vals.astype(dt)
        keep = 1.0 - mask
        lift = mask * vals
        # b2 = b - A_unfixed @ lift through the kernel
        lg = jnp.pad(lift.reshape(tuple(N[::-1]) + (dof,)),
                     list(gpads) + [(0, 0)])
        xT = lg.reshape(nflat, dof).T
        xb = jnp.pad(
            xT, ((0, 0), (G * LANES, (G + Mp) * LANES - nflat))
        ).reshape(-1, LANES)
        if sym:
            y = _flat_spmv_sym(DT, xb, shifts=shifts, dof=dof, guard=G,
                               rows=rows, interpret=interpret)
        else:
            kernel = _flat_spmv if kind == "vmem" else _flat_spmv_hbm
            y = kernel(DT, xb, shifts=shifts, dof=dof, guard=G,
                       rows=rows, interpret=interpret)
        y = y.reshape(dof, -1)[:, :nflat].T.reshape(
            tuple(Ne[::-1]) + (dof,))
        sl = tuple(
            slice(lo, lo + N[dim - 1 - g])
            for g, (lo, _) in enumerate(gpads)
        )
        Alift = y[sl].reshape(b.shape)
        b2 = b - Alift
        b2 = jnp.where(mask > 0, mult[:, None] * vals, b2 * keep)

        keep_e = jnp.pad(keep.reshape(tuple(N[::-1]) + (dof,)),
                         list(gpads) + [(0, 0)])
        padw = [(st.widths[dim - 1 - g],) * 2 for g in range(dim)]
        keep_p = jnp.pad(keep_e, padw + [(0, 0)])
        dadd_e = jnp.pad(
            (mult[:, None] * mask).reshape(tuple(N[::-1]) + (dof,)),
            list(gpads) + [(0, 0)],
        )
        for si, s in enumerate(slot_list):
            win = keep_p[wins[si]]
            for a in range(dof):
                ka = flat(keep_e[..., a])
                for bb in range(dof):
                    kb = flat(win[..., bb])
                    i = (si * dof + a) * dof + bb
                    DT = DT.at[i].set(DT[i] * ka * kb)
        dslot = 0 if sym else st.diag_slot
        for a in range(dof):
            i = (dslot * dof + a) * dof + a
            DT = DT.at[i].set(DT[i] + flat(dadd_e[..., a]))
        return DT, b2

    fn = jax.jit(run, donate_argnums=0)
    _POSTFIX_CACHE[key] = fn
    return fn


def _postfix_node_fn(st):
    """Cached jitted (data, b, mask, vals, mult) -> (data2, b2) for
    node-major stencil storage (open or periodic axes)."""
    key = ("node", st)
    if key in _POSTFIX_CACHE:
        return _POSTFIX_CACHE[key]
    from ..sparse.stencil import StencilMatrix, stencil_apply

    dim, K, dof = st.dim, st.K, st.dof
    N = st.node_shape
    offs = st.slot_offsets()

    def run(data, b, mask, vals, mult):
        dt = data.dtype
        mask = mask.astype(dt)
        vals = vals.astype(dt)
        keep = 1.0 - mask
        lift = mask * vals
        Alift = StencilMatrix(st, data).matvec(lift)
        b2 = b - Alift.reshape(b.shape)
        b2 = jnp.where(mask > 0, mult[:, None] * vals, b2 * keep)
        keep_g = keep.reshape(tuple(N[::-1]) + (dof,))
        pad = [(st.widths[dim - 1 - g],) * 2 for g in range(dim)]
        modes = [st.periodic[dim - 1 - g] for g in range(dim)]
        kp = keep_g
        for g in range(dim):
            pw = [(0, 0)] * (dim + 1)
            pw[g] = pad[g]
            kp = jnp.pad(kp, pw, mode="wrap" if modes[g] else "constant")
        dg = data.reshape(tuple(N[::-1]) + (K, dof, dof))
        planes = []
        for s in range(K):
            sl = []
            for g in range(dim):
                d = dim - 1 - g
                o = int(offs[s, d])
                p = st.widths[d]
                sl.append(slice(p + o, p + o + N[::-1][g]))
            win = kp[tuple(sl)]  # (N_rev..., dof)
            planes.append(
                dg[..., s, :, :] * keep_g[..., :, None] * win[..., None, :]
            )
        dg2 = jnp.stack(planes, axis=dim)
        dadd = (mult[:, None] * mask).reshape(tuple(N[::-1]) + (dof,))
        eye = jnp.eye(dof, dtype=dt)
        dg2 = dg2.at[..., st.diag_slot, :, :].add(dadd[..., :, None] * eye)
        return dg2.reshape(st.nnodes, K, dof, dof), b2

    fn = jax.jit(run, donate_argnums=0)
    _POSTFIX_CACHE[key] = fn
    return fn


def dirichlet_post_fix(space, A, b):
    """Global Dirichlet elimination on the *assembled* system —
    algebraically identical to the reference's per-element FixSystem
    (petigaelem.c:1360-1439) summed over elements: every fixed row/col
    zeroed, the diagonal set to the node's element multiplicity, the RHS
    lifted by the unfixed operator (``b -= A (m∘v)``) and fixed rows set
    to ``mult · v`` (each element adds its lift, petigaelem.c:1386).

    One stencil-structured masked pass over the operator plus one matvec
    instead of per-element (B, nen², …) mask work — ~100× cheaper on TPU
    (the per-element masks tile terribly; see BASELINE.md round-3
    profile).  Used by the Galerkin *system* assemblers only: the
    nonlinear residual/Jacobian paths keep element-level semantics
    (FixValues overwrites coefficients *before* evaluation, which has no
    post-assembly equivalent).

    ``A``: StencilMatrix or a plane-direct PallasStencilOperator (open
    axes).  Returns ``(A_fixed, b_fixed)``.  One jitted program per
    stencil layout (cached), operator buffer donated.
    """
    from ..sparse.stencil import StencilMatrix
    from ..sparse.pallas_spmv import PallasStencilOperator

    st = A.stencil
    if not any(
        space.bc[d][s].value
        for d in range(space.dim)
        for s in range(2)
    ):
        return A, b
    mask_b, vals = space.device("dirichlet")
    mult = jnp.asarray(_node_multiplicity(space), space.dtype)

    if isinstance(A, PallasStencilOperator):
        sym = A.kind == "sym"
        meta = (A.Ne, tuple(A._gpads), A.M,
                A.shifts_u if sym else A.shifts, A.dof, A.kind,
                A.rows, A.G, A.interpret)
        fn = _postfix_planes_fn(st, meta)
        DT2, b2 = fn(A.DT, b, mask_b, vals, mult)
        if sym:
            A2 = PallasStencilOperator.from_planes_symmetric(
                st, DT2, A.align, interpret=A.interpret
            )
        else:
            A2 = PallasStencilOperator.from_planes(
                st, DT2, A.align, interpret=A.interpret
            )
        return A2, b2

    fn = _postfix_node_fn(st)
    data2, b2 = fn(A.data, b, mask_b, vals, mult)
    return StencilMatrix(st, data2), b2


def dirichlet_post_fix_homogeneous(space, A, b):
    """Newton-system Dirichlet fix (FixJacobian semantics,
    petigaelem.c:1483-1523): rows/cols of fixed dofs zeroed, diagonal =
    multiplicity, and the rhs (``-R``) zeroed on fixed rows — the update
    δ is zero there (FixValues already pinned the iterate).  Implemented
    as :func:`dirichlet_post_fix` with a zero lift."""
    from ..sparse.stencil import StencilMatrix
    from ..sparse.pallas_spmv import PallasStencilOperator

    st = A.stencil
    if not any(
        space.bc[d][s].value
        for d in range(space.dim)
        for s in range(2)
    ):
        return A, b
    mask_b, _ = space.device("dirichlet")
    vals0 = jnp.zeros_like(mask_b, dtype=b.dtype)
    mult = jnp.asarray(_node_multiplicity(space), space.dtype)
    if isinstance(A, PallasStencilOperator):
        sym = A.kind == "sym"
        meta = (A.Ne, tuple(A._gpads), A.M,
                A.shifts_u if sym else A.shifts, A.dof, A.kind,
                A.rows, A.G, A.interpret)
        fn = _postfix_planes_fn(st, meta)
        DT2, b2 = fn(A.DT, b, mask_b, vals0, mult)
        mk = (PallasStencilOperator.from_planes_symmetric if sym
              else PallasStencilOperator.from_planes)
        return mk(st, DT2, A.align, interpret=A.interpret), b2
    fn = _postfix_node_fn(st)
    data2, b2 = fn(A.data, b, mask_b, vals0, mult)
    return StencilMatrix(st, data2), b2


def _make_element_KF(space, ctx, order, apply_fix):
    """Per-chunk element (K, F) evaluator shared by the node-major and
    the slot-major (plane-direct) system assemblers.

    Returns ``element_KF(ids, valid, face, form) -> (Ke, Fe, emap)``
    with Ke (B, nen, nen, dof, dof) — row/col local indices unflattened
    from the (nen·dof) element matrix — and Fe (B, nen, dof)."""
    dt = space.dtype
    nen, dof = space.nen, space.dof

    @jax.named_scope("IGA_FormSystem")
    def element_KF(ids, valid, face, form):
        # highest precision: the MXU's default single-pass bf16 matmul
        # contaminates f32 assembly at ~1e-3 relative (the reference is
        # f64 end to end; f32 assembly must be f32-grade).  The context
        # applies at trace time, covering the user form's einsums too.
        with jax.default_matmul_precision("highest"):
            return _element_KF_impl(ids, valid, face, form)

    def _element_KF_impl(ids, valid, face, form):
        pb = tabulate_elements(space, ids, order=order, face=face)
        emap = space.device_emap(ids)
        B = ids.shape[0]

        if getattr(form, "qbatched", False):
            pts = _points_of(pb)

            def one(pt, w):
                K, F = form(pt, w, ctx)
                return (
                    _normalize_K(K, nen, dof, dt),
                    _normalize_F(F, nen, dof, dt),
                )

            Ke, Fe = jax.vmap(one)(pts, pb.weight)
        else:
            def body(acc, pt, w):
                Ka, Fa = acc
                K, F = jax.vmap(lambda p: form(p, ctx))(pt)
                K = jax.vmap(lambda k: _normalize_K(k, nen, dof, dt))(K)
                F = jax.vmap(lambda f: _normalize_F(f, nen, dof, dt))(F)
                return (Ka + w[:, None, None] * K, Fa + w[:, None] * F)

            Ke = jnp.zeros((B, nen * dof, nen * dof), dtype=dt)
            Fe = jnp.zeros((B, nen * dof), dtype=dt)
            Ke, Fe = _scan_points(pb, body, (Ke, Fe))
        if apply_fix:
            m, v = _fix_arrays(space, emap)
            Ke, Fe = _fix_system(Ke, Fe, m, v)
        vmask = valid.astype(dt)
        Ke = Ke * vmask[:, None, None]
        Fe = Fe * vmask[:, None]
        Ke = Ke.reshape(B, nen, dof, nen, dof).transpose(0, 1, 3, 2, 4)
        return Ke, Fe.reshape(B, nen, dof), emap

    return element_KF


@_highest
def assemble_system_planes(
    space,
    system: Callable,
    ctx=None,
    *,
    order: Optional[int] = None,
    chunk: Optional[int] = None,
    apply_fix: bool = True,
    interpret: Optional[bool] = None,
    donate_loop: bool = False,
    row_aligned: Optional[bool] = None,
):
    """Slot-major (plane-direct) system assembly: element blocks
    accumulate straight into the Pallas flat slot-major plane layout, so
    the operator is never stored twice (node-major A + packed planes).
    This is the single-chip route to the BASELINE.json 256³ p=2
    assembled target: the 8.6 GB plane array plus CG vectors fit one
    v5e HBM, while node-major + packed (2 × 8.6 GB) would not.

    Same semantics as :func:`assemble_system` (IGAComputeSystem,
    petigaksp.c:149-202, incl. the per-element Dirichlet elimination)
    restricted to open, regular, unit-step spaces (maximal continuity —
    the bench/production layout).  Returns ``(op, b)`` with ``op`` a
    :class:`~petiga_tpu.sparse.pallas_spmv.PallasStencilOperator` built
    zero-copy from the planes and ``b`` the (nnodes, dof) load vector.
    """
    from . import fastpath
    from ..sparse.pallas_spmv import (
        LANES,
        PallasStencilOperator,
        alignment_pads,
    )

    st = stencil_of(space)
    if any(space.periodic):
        raise ValueError("plane-direct assembly requires open axes")
    if not fastpath.is_unit_step(space):
        raise ValueError(
            "plane-direct assembly requires a regular unit-step space"
        )
    profiling.count("IGA_FormSystem", profiling.system_flops(space))
    dt = space.dtype
    dim, dof = space.dim, space.dof
    # row-aligned mode (3-D): the plane array lives in the kernel's
    # (planes, M, 128) layout throughout — mandatory once the planes are
    # a significant fraction of HBM (grid-shaped materialization
    # lane-pads the minor spatial dim 1.5x and copies; OOM at 256³)
    est = st.K * dof * dof * st.nnodes * jnp.dtype(dt).itemsize
    if row_aligned is None:
        row_aligned = dim == 3 and est > 2 * 2**30
    row_aligned = bool(row_aligned) and dim == 3
    align = alignment_pads(st, row_aligned=row_aligned)
    Ne = tuple(N + a for N, a in zip(space.node_shape, align))
    eshape = space.elem_shape
    slab = int(np.prod(eshape[:-1])) if dim > 1 else 1
    if chunk is None:
        chunk = min(space.nel, 8192)
    kz = max(1, min(eshape[-1], chunk // slab))
    while eshape[-1] % kz:
        kz -= 1  # exact slab coverage: no padded chunks, no over-alloc
    chunk_sz = kz * slab
    nchunks = eshape[-1] // kz
    ids, valid = _chunks(space, chunk_sz)
    assert ids.shape[0] == nchunks

    # Dirichlet handled POST-assembly (dirichlet_post_fix — algebraically
    # identical to per-element FixSystem for the Galerkin system, ~100x
    # cheaper than the per-element masks on TPU)
    element_KF = _make_element_KF(space, ctx, order, False)

    planes_n = st.K * dof * dof
    M = int(np.prod(Ne)) // 128
    if row_aligned:
        P = jnp.zeros((planes_n, M, 128), dt)
    else:
        P = jnp.zeros((planes_n,) + tuple(Ne[::-1]), dt)
    b_grid = jnp.zeros(tuple(space.node_shape[::-1]) + (dof,), dt)

    def chunk_step(carry, xs):
        P, bg = carry
        ids_c, valid_c, c = xs
        Ke, Fe, _ = element_KF(ids_c, valid_c, None, system)
        P = fastpath.accumulate_matrix_dyn_planes(
            space, P, Ke, c * kz, align, row_aligned=row_aligned
        )
        bg = fastpath.accumulate_vector_dyn(space, bg, Fe, c * kz)
        return (P, bg), None

    if donate_loop:
        # lax.scan may fail to alias the multi-GB plane carry in place
        # (observed at 256³: the 8.9 GB carry double-buffers and OOMs a
        # 16 GB chip).  An eager per-chunk loop over a DONATED jitted
        # step guarantees single-copy accumulation at the cost of one
        # dispatch per chunk.
        step = jax.jit(
            lambda P, bg, ids_c, valid_c, c: chunk_step(
                (P, bg), (ids_c, valid_c, c)
            )[0],
            donate_argnums=(0, 1),
        )
        for c in range(nchunks):
            P, b_grid = step(
                P, b_grid, ids[c], valid[c], jnp.asarray(c, jnp.int32)
            )
    else:
        (P, b_grid), _ = jax.lax.scan(
            chunk_step,
            (P, b_grid),
            (ids, valid, jnp.arange(nchunks, dtype=jnp.int32)),
        )
    op = PallasStencilOperator.from_planes(
        st, P.reshape(planes_n, M, LANES), align, interpret=interpret
    )
    b = b_grid.reshape(st.nnodes, dof)
    if apply_fix:
        op, b = dirichlet_post_fix(space, op, b)
    flux = boundary_flux_vector(space)
    if flux is not None:
        mask, _ = space.device("dirichlet")
        b = b + jnp.where(mask, 0.0, flux.astype(dt))
    return op, b


@_highest
def assemble_separable_planes(
    space,
    *,
    c: float = 0.0,
    kappa: float = 1.0,
    forcing: Optional[Callable] = None,
    chunk: Optional[int] = None,
    apply_fix: bool = True,
    interpret: Optional[bool] = None,
    donate_loop: bool = False,
    row_aligned: Optional[bool] = None,
):
    """Sum-factorized assembly of the separable reaction–diffusion
    system ``a(u,v) = ∫ c u v + κ ∇u·∇v`` (identity map, constant
    coefficients): the element matrix is the Kronecker combination

        Ke = c M_z⊗M_y⊗M_x + κ (S_z⊗M_y⊗M_x + M_z⊗S_y⊗M_x + M_z⊗M_y⊗S_x)

    of per-axis 1-D element mass/stiffness matrices ((p+1)² each,
    precomputed once per axis) — O(p^{d+1}) broadcast multiplies per
    element instead of the O(Q·nen²) quadrature contraction, and no
    dim-D tabulation at all.  This is the sum-factorized fast assembly
    of the IGA literature (PAPERS.md), applied at element-matrix level;
    the reference runs its generic element loop even for this form
    (petigaksp.c:171-193).  Produces the identical operator to
    ``assemble_system_planes`` with the generic Poisson form (tested to
    f64 round-off), at several times the throughput.

    ``forcing(x) -> scalar`` builds the load vector through the usual
    (order-0) tabulation; Dirichlet elimination is the post-assembly
    fix.  Open regular unit-step spaces, dof = 1.  Returns ``(op, b)``.
    """
    from . import fastpath
    from ..sparse.pallas_spmv import (
        LANES,
        PallasStencilOperator,
        alignment_pads,
    )

    st = stencil_of(space)
    if any(space.periodic):
        raise ValueError("separable assembly requires open axes")
    if not fastpath.is_unit_step(space) or space.dof != 1:
        raise ValueError(
            "separable assembly requires a regular unit-step dof=1 space"
        )
    if space.has_geometry:
        raise ValueError("separable assembly requires the identity map")
    profiling.count("IGA_FormSystem", profiling.system_flops(space))
    dt = space.dtype
    dim = space.dim
    est = st.K * st.nnodes * jnp.dtype(dt).itemsize
    if row_aligned is None:
        row_aligned = dim == 3 and est > 2 * 2**30
    row_aligned = bool(row_aligned) and dim == 3
    align = alignment_pads(st, row_aligned=row_aligned)
    Ne = tuple(N + a for N, a in zip(space.node_shape, align))
    eshape = space.elem_shape
    slab = int(np.prod(eshape[:-1])) if dim > 1 else 1
    if chunk is None:
        chunk = min(space.nel, 8192)
    kz = max(1, min(eshape[-1], chunk // slab))
    while eshape[-1] % kz:
        kz -= 1
    chunk_sz = kz * slab
    nchunks = eshape[-1] // kz
    ids, valid = _chunks(space, chunk_sz)

    # per-axis 1-D element matrices (nel_d, p_d+1, p_d+1)
    Ms, Ss = [], []
    for d in range(dim):
        t = space.tabs[d]
        w = jnp.asarray(t.weight * t.detJac[:, None], dt)  # (nel, q)
        B0 = jnp.asarray(t.value[:, :, 0, :], dt)  # (nel, q, p+1)
        B1 = jnp.asarray(t.value[:, :, 1, :], dt)
        Ms.append(jnp.einsum("eq,eqa,eqb->eab", w, B0, B0))
        Ss.append(jnp.einsum("eq,eqa,eqb->eab", w, B1, B1))

    nen = space.nen
    nshape = space.nen_shape

    def chunk_Ke(eids):
        """(B,) flat element ids -> (B, nen, nen) Kronecker element
        matrices; factors gathered per axis."""
        rem = eids
        fac = []
        for d in range(dim):
            ed = rem % eshape[d]
            rem = rem // eshape[d]
            fac.append((Ms[d][ed], Ss[d][ed]))  # ((B,p+1,p+1), ...)
        B = eids.shape[0]

        def kron(parts):
            # parts[d]: (B, p_d+1, p_d+1); combine slowest-axis-major so
            # the flat local index comes out axis-0 fastest
            out = parts[dim - 1]
            for d in range(dim - 2, -1, -1):
                t = parts[d]
                na, nb = out.shape[1], out.shape[2]
                out = (
                    out[:, :, None, :, None]
                    * t[:, None, :, None, :]
                ).reshape(B, na * t.shape[1], nb * t.shape[2])
            return out

        Ke = c * kron([f[0] for f in fac]) if c != 0.0 else None
        for dd in range(dim):
            term = kappa * kron(
                [fac[d][1] if d == dd else fac[d][0] for d in range(dim)]
            )
            Ke = term if Ke is None else Ke + term
        return Ke

    planes_n = st.K
    M = int(np.prod(Ne)) // LANES
    if row_aligned:
        P = jnp.zeros((planes_n, M, 128), dt)
    else:
        P = jnp.zeros((planes_n,) + tuple(Ne[::-1]), dt)
    b_grid = jnp.zeros(tuple(space.node_shape[::-1]) + (1,), dt)

    def F_chunk(eids, ev):
        if forcing is None:
            return None
        pb = tabulate_elements(space, eids, order=0)
        f = jax.vmap(jax.vmap(forcing))(pb.x)  # (B, Q)
        wf = pb.weight * f * ev[:, None].astype(dt)
        return jnp.einsum("bq,bqa->ba", wf, pb.shape[0])[..., None]

    def chunk_step(carry, xs):
        P, bg = carry
        ids_c, valid_c, cix = xs
        Ke = chunk_Ke(ids_c) * valid_c[:, None, None].astype(dt)
        Ke = Ke[..., None, None]  # (B, nen_a, nen_b, 1, 1)
        P = fastpath.accumulate_matrix_dyn_planes(
            space, P, Ke, cix * kz, align, row_aligned=row_aligned
        )
        Fe = F_chunk(ids_c, valid_c)
        if Fe is not None:
            bg = fastpath.accumulate_vector_dyn(space, bg, Fe, cix * kz)
        return (P, bg), None

    if donate_loop:
        step = jax.jit(
            lambda P, bg, i_, v_, cix: chunk_step((P, bg), (i_, v_, cix))[0],
            donate_argnums=(0, 1),
        )
        for cix in range(nchunks):
            P, b_grid = step(
                P, b_grid, ids[cix], valid[cix], jnp.asarray(cix, jnp.int32)
            )
    else:
        (P, b_grid), _ = jax.lax.scan(
            chunk_step,
            (P, b_grid),
            (ids, valid, jnp.arange(nchunks, dtype=jnp.int32)),
        )

    op = PallasStencilOperator.from_planes(
        st, P.reshape(planes_n, M, LANES), align, interpret=interpret
    )
    b = b_grid.reshape(st.nnodes, 1)
    if apply_fix:
        op, b = dirichlet_post_fix(space, op, b)
    flux = boundary_flux_vector(space)
    if flux is not None:
        mask, _ = space.device("dirichlet")
        b = b + jnp.where(mask, 0.0, flux.astype(dt))
    return op, b


@_highest
def assemble_system(
    space,
    system: Callable,
    ctx=None,
    *,
    boundary: Optional[Callable] = None,
    order: Optional[int] = None,
    chunk: Optional[int] = None,
    apply_fix: bool = True,
    method: str = "auto",
    fix: str = "element",
):
    """Assemble (A, b) from a Galerkin system form
    (IGAComputeSystem, petigaksp.c:149-202).

    ``fix="post"`` applies the Dirichlet elimination globally after
    assembly (:func:`dirichlet_post_fix` — algebraically identical,
    ~100x cheaper on TPU than the per-element masks).

    ``system(pt, ctx) -> (K, F)`` at one quadrature point, with
    K reshapeable to (nen*dof, nen*dof) and F to (nen*dof).
    ``boundary(pt, ctx) -> (K, F)`` is evaluated on faces flagged with
    ``space.set_boundary_form`` (IGAElementNextForm, petigaelem.c:427-447).

    ``method``: "shift" uses the scatter-free shifted-slice accumulation
    (regular knot vectors), "scatter" the index-based scatter-add,
    "auto" picks shift when available.

    ``qbatched`` forms: if ``system`` has an attribute ``qbatched=True``
    it is called as ``system(pt, w, ctx)`` with Point leaves carrying a
    leading quadrature axis (Q, ...) and weights w (Q,), and must return
    the quadrature-summed (K, F) — this lets the form contract over q
    with one MXU matmul instead of scanned outer products (the
    speed-of-light path for bilinear forms).
    """
    from . import fastpath

    st = stencil_of(space)
    dt = space.dtype
    nen, dof = space.nen, space.dof
    fast = method != "scatter" and fastpath.is_regular(space)
    if method == "shift" and not fast:
        raise ValueError("shift method requires a regular (non-collocation) space")
    if fix not in ("element", "post"):
        raise ValueError(f"unknown fix mode {fix!r}")
    post_fix = apply_fix and fix == "post"
    profiling.count("IGA_FormSystem", profiling.system_flops(space))

    element_KF = _make_element_KF(
        space, ctx, order, apply_fix and not post_fix
    )

    slot_np = st.slot_table(space.nen_shape)

    if fast:
        if chunk is None:
            chunk = min(space.nel, 8192)
        chunk_sz = fastpath.slab_chunk(space, chunk)
        slab = 1 if space.dim == 1 else int(np.prod(space.elem_shape[:-1]))
        kz = chunk_sz // slab
        ids, valid = _chunks(space, chunk_sz)
        nchunks = ids.shape[0]
        N_rev = list(space.node_shape[::-1])
        crop = N_rev[0]
        if not space.periodic[-1]:
            # over-allocate the slow axis so padded trailing chunks still
            # fit their static placement windows; cropped afterwards
            from .fastpath import _steps

            s_last = _steps(space)[-1]
            need = (nchunks * kz - 1) * s_last + 1 + space.degrees[-1]
            N_rev[0] = max(N_rev[0], need)
        N_rev = tuple(N_rev)
        A_grid = jnp.zeros(N_rev + (st.K, dof, dof), dt)
        b_grid = jnp.zeros(N_rev + (dof,), dt)

        if not space.periodic[-1] and nchunks > 1:
            # scan over chunks with dynamic slab starts: one compiled
            # chunk body — compile time independent of the mesh size
            def chunk_step(carry, xs):
                Ag, bg = carry
                ids_c, valid_c, c = xs
                Ke, Fe, _ = element_KF(ids_c, valid_c, None, system)
                Ag = fastpath.accumulate_matrix_dyn(
                    space, Ag, Ke, c * kz, slot_np
                )
                bg = fastpath.accumulate_vector_dyn(space, bg, Fe, c * kz)
                return (Ag, bg), None

            (A_grid, b_grid), _ = jax.lax.scan(
                chunk_step,
                (A_grid, b_grid),
                (ids, valid, jnp.arange(nchunks, dtype=jnp.int32)),
            )
        else:
            # static placement per chunk (wrapping slow axis needs the
            # static two-segment split; z0 static -> in-place slice adds)
            for c in range(nchunks):
                Ke, Fe, _ = element_KF(ids[c], valid[c], None, system)
                A_grid = fastpath.accumulate_matrix(
                    space, A_grid, Ke, c * kz, slot_np
                )
                b_grid = fastpath.accumulate_vector(space, b_grid, Fe, c * kz)
        A_data = A_grid[:crop].reshape(st.nnodes, st.K, dof, dof)
        b = b_grid[:crop].reshape(st.nnodes, dof)
    else:
        A_data = jnp.zeros((st.nnodes * st.K, dof, dof), dtype=dt)
        b = jnp.zeros((st.nnodes, dof), dtype=dt)
        ids, valid = _chunks(space, chunk)

        def body(carry, xs):
            A_data, b = carry
            ids, valid = xs
            Ke, Fe, emap = element_KF(ids, valid, None, system)
            A_data = _scatter_matrix(space, A_data, Ke, emap, valid)
            b = _scatter_vector(space, b, Fe, emap, valid)
            return (A_data, b), None

        (A_data, b), _ = jax.lax.scan(body, (A_data, b), (ids, valid))
        A_data = A_data.reshape(st.nnodes, st.K, dof, dof)

    if boundary is not None:
        A_flat = A_data.reshape(st.nnodes * st.K, dof, dof)
        for d, s in _faces_to_visit(space):
            fids = _face_elements(space, d, s)
            Ke, Fe, emap = element_KF(
                jnp.asarray(fids), jnp.ones(len(fids), bool), (d, s), boundary
            )
            A_flat = _scatter_matrix(space, A_flat, Ke, emap,
                                     jnp.ones(len(fids), bool))
            b = _scatter_vector(space, b, Fe, emap,
                                jnp.ones(len(fids), bool))
        A_data = A_flat.reshape(st.nnodes, st.K, dof, dof)

    A = StencilMatrix(st, A_data)
    if post_fix:
        A, b = dirichlet_post_fix(space, A, b)

    flux = boundary_flux_vector(space)
    if flux is not None:
        # nodal fluxes are added before the Dirichlet overwrite; fixed
        # dofs keep their boundary value (reference order:
        # petigaelem.c:1370-1387)
        mask, _ = space.device("dirichlet")
        b = b + jnp.where(mask, 0.0, flux.astype(dt))

    return A, b


@_highest
def assemble_vector(space, vecform, ctx=None, *, order=None, chunk=None):
    """Assemble a load vector from F-only form (IGAComputeVector)."""
    dt = space.dtype
    nen, dof = space.nen, space.dof
    b = jnp.zeros((space.nnodes, dof), dtype=dt)
    ids, valid = _chunks(space, chunk)
    profiling.count("IGA_FormVector", profiling.residual_flops(space))

    @jax.named_scope("IGA_FormVector")
    def chunk_body(carry, xs):
        b = carry
        ids, valid = xs
        pb = tabulate_elements(space, ids, order=order)
        emap = space.device_emap(ids)
        B = ids.shape[0]

        def body(Fa, pt, w):
            F = jax.vmap(lambda p: _normalize_F(vecform(p, ctx), nen, dof, dt))(pt)
            return Fa + w[:, None] * F

        Fe = _scan_points(pb, body, jnp.zeros((B, nen * dof), dtype=dt))
        return _scatter_vector(space, b, Fe.reshape(B, nen, dof), emap, valid), None

    b, _ = jax.lax.scan(chunk_body, b, (ids, valid))
    return b


def assemble_matrix(space, matform, ctx=None, *, order=None, chunk=None,
                    apply_fix: bool = True):
    """Assemble A from a K-only form (IGAComputeMatrix)."""
    def system(pt, c):
        K = matform(pt, c)
        return K, jnp.zeros((space.nen * space.dof,), dtype=space.dtype)

    A, _ = assemble_system(
        space, system, ctx, order=order, chunk=chunk, apply_fix=apply_fix
    )
    return A


def _call_function(function, pt, ue, aux_e, ctx):
    """Call a residual form, passing per-element auxiliary closures (time
    integrator states U0/V0/..., each (nen, c)) when present."""
    if aux_e is None:
        return function(pt, ue, ctx)
    return function(pt, ue, aux_e, ctx)


def _element_residual(space, function, ctx, pb, Ue, m, v, uorig, order, aux_e=None):
    """Residual of one element batch with Dirichlet semantics
    (FixValues + FixFunction, petigaelem.c:1343-1358, 1441-1481):
    fixed coefficients are overwritten with their boundary values before
    evaluation; fixed residual rows become u - v."""
    dt = space.dtype
    nen, dof = space.nen, space.dof
    B = Ue.shape[0]
    Uf = jnp.where(m.reshape(B, nen, dof) > 0, v.reshape(B, nen, dof), Ue)

    def body(Ra, pt, w):
        if aux_e is None:
            R = jax.vmap(
                lambda p, ue: _normalize_F(function(p, ue, ctx), nen, dof, dt)
            )(pt, Uf)
        else:
            R = jax.vmap(
                lambda p, ue, ax: _normalize_F(function(p, ue, ax, ctx), nen, dof, dt)
            )(pt, Uf, aux_e)
        return Ra + w[:, None] * R

    Re = _scan_points(pb, body, jnp.zeros((B, nen * dof), dtype=dt))
    Re = Re * (1.0 - m) + m * (uorig - v)
    return Re


def _gather_aux(space, aux, emap):
    if aux is None:
        return None
    return {k: v.reshape(space.nnodes, -1)[emap] for k, v in aux.items()}


@_highest
def assemble_function(space, function, U, ctx=None, *, aux=None, order=None,
                      chunk=None, boundary=None):
    """Assemble the residual F(U) (IGAComputeFunction, petigasnes.c:23-80).

    ``function(pt, Ue, ctx) -> R`` reshapeable to (nen*dof) with Ue the
    element coefficients (nen, dof).  With ``aux`` (dict of global
    (nnodes, c) vectors) the signature is ``function(pt, Ue, aux_e, ctx)``
    with aux_e holding (nen, c) element closures — the mechanism behind
    the reference's IFunction/I2Function/IEFunction multi-state forms.
    """
    dt = space.dtype
    nen, dof = space.nen, space.dof
    U = U.reshape(space.nnodes, dof)
    F = jnp.zeros((space.nnodes, dof), dtype=dt)
    ids, valid = _chunks(space, chunk)
    profiling.count("IGA_FormFunction", profiling.residual_flops(space))

    @jax.named_scope("IGA_FormFunction")
    def chunk_body(carry, xs, face=None, form=function):
        F = carry
        ids, valid = xs
        pb = tabulate_elements(space, ids, order=order, face=face)
        emap = space.device_emap(ids)
        Ue = U[emap]
        m, v = _fix_arrays(space, emap)
        B = ids.shape[0]
        uorig = Ue.reshape(B, nen * dof)
        aux_e = _gather_aux(space, aux, emap)
        zero_fix = face is not None  # boundary forms only ADD interior rows
        Re = _element_residual(
            space, form, ctx, pb, Ue, m, v,
            v if zero_fix else uorig, order, aux_e,
        )
        if zero_fix:
            Re = Re * (1.0 - m)
        return _scatter_vector(space, F, Re.reshape(B, nen, dof), emap, valid), None

    F, _ = jax.lax.scan(chunk_body, F, (ids, valid))
    if boundary is not None:
        for d, s in _faces_to_visit(space):
            fids = _face_elements(space, d, s)
            F, _ = chunk_body(
                F,
                (jnp.asarray(fids), jnp.ones(len(fids), bool)),
                face=(d, s),
                form=boundary,
            )
    flux = boundary_flux_vector(space)
    if flux is not None:
        mask, _ = space.device("dirichlet")
        F = F - jnp.where(mask, 0.0, flux.astype(dt))
    return F


@_highest
def assemble_jacobian(
    space, function, U, ctx=None, *, jacobian=None, aux=None, order=None,
    chunk=None, boundary=None
):
    """Assemble J = dF/dU by forward-mode AD of the element residual
    (IGAComputeJacobian, petigasnes.c:82-139; AD replaces
    petigafdjac.c / the FAD templates).  If ``jacobian(pt, Ue, ctx) -> K``
    is given it is used directly instead.
    """
    st = stencil_of(space)
    dt = space.dtype
    nen, dof = space.nen, space.dof
    U = U.reshape(space.nnodes, dof)
    A_data = jnp.zeros((st.nnodes * st.K, dof, dof), dtype=dt)
    ids, valid = _chunks(space, chunk)
    profiling.count("IGA_FormJacobian", profiling.jacobian_flops(space))

    @jax.named_scope("IGA_FormJacobian")
    def chunk_body(carry, xs, face=None, form=function, jacform=None):
        A_data = carry
        ids, valid = xs
        pb = tabulate_elements(space, ids, order=order, face=face)
        emap = space.device_emap(ids)
        Ue = U[emap]
        m, v = _fix_arrays(space, emap)
        B = ids.shape[0]
        aux_e = _gather_aux(space, aux, emap)
        function_, jacobian_ = form, jacform

        if jacobian_ is not None:
            Uf = jnp.where(m.reshape(B, nen, dof) > 0, v.reshape(B, nen, dof), Ue)

            def body(Ka, pt, w):
                if aux_e is None:
                    K = jax.vmap(
                        lambda p, ue: _normalize_K(jacobian_(p, ue, ctx), nen, dof, dt)
                    )(pt, Uf)
                else:
                    K = jax.vmap(
                        lambda p, ue, ax: _normalize_K(
                            jacobian_(p, ue, ax, ctx), nen, dof, dt
                        )
                    )(pt, Uf, aux_e)
                return Ka + w[:, None, None] * K

            Je = _scan_points(pb, body, jnp.zeros((B, nen * dof, nen * dof), dt))
            # FixJacobian: zero rows+cols, unit diagonal (petigaelem.c:1483)
            keep = 1.0 - m
            Je = Je * keep[:, :, None] * keep[:, None, :]
            if face is None:
                Je = Je + m[:, :, None] * jnp.eye(nen * dof, dtype=dt)[None]
        else:
            def elem_res(ue_flat, pb_e, m_e, v_e, aux_el):
                pb1 = jax.tree.map(lambda a: a[None], pb_e)
                aux1 = (
                    None
                    if aux_el is None
                    else jax.tree.map(lambda a: a[None], aux_el)
                )
                r = _element_residual(
                    space,
                    function_,
                    ctx,
                    pb1,
                    ue_flat.reshape(1, nen, dof),
                    m_e[None],
                    v_e[None],
                    # boundary forms must not re-add the fixed-row identity
                    v_e[None] if face is not None else ue_flat[None],
                    order,
                    aux1,
                )
                res = r[0]
                if face is not None:
                    res = res * (1.0 - m_e)
                return res

            if aux_e is None:
                Je = jax.vmap(
                    lambda u, p, mm, vv: jax.jacfwd(elem_res)(u, p, mm, vv, None)
                )(Ue.reshape(B, nen * dof), pb, m, v)
            else:
                Je = jax.vmap(jax.jacfwd(elem_res))(
                    Ue.reshape(B, nen * dof), pb, m, v, aux_e
                )

        Je = Je.reshape(B, nen, dof, nen, dof).transpose(0, 1, 3, 2, 4)
        Je = Je * valid.astype(dt)[:, None, None, None, None]
        return Je, emap

    from . import fastpath

    fast = fastpath.is_regular(space)
    slot_np = st.slot_table(space.nen_shape)
    if fast:
        if chunk is None:
            chunk_sz = fastpath.slab_chunk(space, min(space.nel, 8192))
        else:
            chunk_sz = fastpath.slab_chunk(space, chunk)
        slab = 1 if space.dim == 1 else int(np.prod(space.elem_shape[:-1]))
        kz = chunk_sz // slab
        ids, valid = _chunks(space, chunk_sz)
        nchunks = ids.shape[0]
        N_rev = list(space.node_shape[::-1])
        crop = N_rev[0]
        if not space.periodic[-1]:
            from .fastpath import _steps

            s_last = _steps(space)[-1]
            need = (nchunks * kz - 1) * s_last + 1 + space.degrees[-1]
            N_rev[0] = max(N_rev[0], need)
        N_rev = tuple(N_rev)
        A_grid = jnp.zeros(N_rev + (st.K, dof, dof), dt)
        if not space.periodic[-1] and nchunks > 1:
            def chunk_step(Ag, xs):
                ids_c, valid_c, c = xs
                Je, _ = chunk_body(None, (ids_c, valid_c), jacform=jacobian)
                return fastpath.accumulate_matrix_dyn(
                    space, Ag, Je, c * kz, slot_np
                ), None

            A_grid, _ = jax.lax.scan(
                chunk_step,
                A_grid,
                (ids, valid, jnp.arange(nchunks, dtype=jnp.int32)),
            )
        else:
            for c in range(nchunks):
                Je, _ = chunk_body(None, (ids[c], valid[c]), jacform=jacobian)
                A_grid = fastpath.accumulate_matrix(
                    space, A_grid, Je, c * kz, slot_np
                )
        A_data = A_grid[:crop].reshape(st.nnodes * st.K, dof, dof)
    else:
        def body(carry, xs):
            A_data = carry
            Je, emap = chunk_body(None, xs, jacform=jacobian)
            ids, valid = xs
            return _scatter_matrix(space, A_data, Je, emap, valid), None

        A_data, _ = jax.lax.scan(body, A_data, (ids, valid))

    if boundary is not None:
        for d, s in _faces_to_visit(space):
            fids = _face_elements(space, d, s)
            fv = jnp.ones(len(fids), bool)
            Je, emap = chunk_body(
                None, (jnp.asarray(fids), fv), face=(d, s), form=boundary
            )
            A_data = _scatter_matrix(space, A_data, Je, emap, fv)
    return StencilMatrix(st, A_data.reshape(st.nnodes, st.K, dof, dof))


# ----------------------------------------------------------- functionals


@_highest
def compute_scalar(space, functional, U=None, ctx=None, *, order=None, chunk=None):
    """Quadrature sum of a scalar functional (IGAComputeScalar,
    petigacomp.c:35-90).  ``functional(pt, Ue, ctx) -> (nsc,)``."""
    dt = space.dtype
    Uv = None if U is None else U.reshape(space.nnodes, space.dof)
    ids, valid = _chunks(space, chunk)
    profiling.count("IGA_FormScalar", profiling.residual_flops(space))

    @jax.named_scope("IGA_FormScalar")
    def chunk_body(acc, xs):
        ids, valid = xs
        pb = tabulate_elements(space, ids, order=order)
        emap = space.device_emap(ids)
        Ue = None if Uv is None else Uv[emap]

        def body(a, pt, w):
            if Ue is None:
                s = jax.vmap(lambda p: jnp.atleast_1d(functional(p, None, ctx)))(pt)
            else:
                s = jax.vmap(
                    lambda p, ue: jnp.atleast_1d(functional(p, ue, ctx))
                )(pt, Ue)
            w = w * valid.astype(dt)
            return a + jnp.sum(w[:, None] * s, axis=0)

        return _scan_points(pb, body, acc), None

    probe = jnp.atleast_1d(
        jnp.zeros(
            jax.eval_shape(
                lambda: _probe_functional(space, functional, Uv, ctx, order)
            ).shape,
            dt,
        )
    )
    acc, _ = jax.lax.scan(chunk_body, jnp.zeros_like(probe), (ids, valid))
    return acc


def _probe_functional(space, functional, Uv, ctx, order):
    ids = jnp.zeros((1,), jnp.int32)
    pb = tabulate_elements(space, ids, order=order)
    pt = jax.tree.map(lambda a: a[0, 0], _points_of(pb))
    Ue = None if Uv is None else Uv[space.device_emap(ids)][0]
    return jnp.atleast_1d(functional(pt, Ue, ctx))


@_highest
def compute_error_norm(space, U, exact, k: int = 0, ctx=None, *, order=None,
                       chunk=None):
    """L2 (k=0) or H^k-seminorm (k=1..4) of u - u_exact
    (IGAComputeErrorNorm, petigacomp.c:102-186; derivative orders follow
    IGAPointEvaluate, petigaval.F90:183-287).

    ``exact(x) -> (dof,) + (nsd,)*k`` — value / gradient / Hessian / ...
    """
    def err2(pt, Ue, _):
        if k == 0:
            e = pt.value(Ue) - exact(pt.x)
        elif k == 1:
            e = pt.grad(Ue) - exact(pt.x)
        elif k == 2:
            e = pt.hess(Ue) - exact(pt.x)
        elif k == 3:
            e = pt.der3(Ue) - exact(pt.x)
        elif k == 4:
            e = pt.der4(Ue) - exact(pt.x)
        else:
            raise ValueError("k must be in 0..4")
        return jnp.sum(e * e)

    val = compute_scalar(
        space, err2, U, ctx, order=max(k, 1) if order is None else order,
        chunk=chunk,
    )
    return jnp.sqrt(val[0])


# -------------------------------------------------------- boundary fluxes

_FLUX_CACHE: dict = {}


def boundary_flux_vector(space):
    """Global nodal flux vector from the per-face load tables
    (BuildFix/AddFlux, petigaelem.c:1192-1215): every element adjacent to
    a loaded face adds ``value * elementFaceArea`` to each face-local
    basis function of its closure.  Returns (nnodes, dof) or None."""
    key = id(space)
    tag = tuple(
        (d, s, tuple(space.bc[d][s].load))
        for d in range(space.dim)
        for s in range(2)
    )
    cached = _FLUX_CACHE.get(key)
    if cached is not None and cached[0] == tag:
        return cached[1]

    any_load = any(space.bc[d][s].load for d in range(space.dim) for s in range(2))
    if not any_load:
        _FLUX_CACHE[key] = (tag, None)
        return None

    flux = np.zeros((space.nnodes, space.dof))
    nen_shape = space.nen_shape
    for d in range(space.dim):
        for s in range(2):
            loads = space.bc[d][s].load
            if not loads:
                continue
            fids = _face_elements(space, d, s)
            areas = _element_face_areas(space, d, s, fids)
            # face-local slab of the closure (BuildFix, petigaelem.c:1225-1240)
            grids = np.meshgrid(*[np.arange(n) for n in nen_shape], indexing="ij")
            locs = [g.ravel(order="F") for g in grids]
            tgt = nen_shape[d] - 1 if s else 0
            slab = np.where(locs[d] == tgt)[0]
            nodes = space.mapping[fids][:, slab]  # (nface, nslab)
            for field, value in loads:
                np.add.at(
                    flux[:, field], nodes.ravel(),
                    np.repeat(value * areas, len(slab)),
                )
    out = jnp.asarray(flux, dtype=space.dtype)
    _FLUX_CACHE[key] = (tag, out)
    return out


def _element_face_areas(space, d, s, fids):
    """Area of each face element's boundary face (BoundaryArea,
    petigaelem.c:1107-1165)."""
    if not space.has_geometry:
        area = np.ones(len(fids))
        emulti = np.unravel_index(fids, space.elem_shape, order="F")
        for dd in range(space.dim):
            if dd == d:
                continue
            area *= 2.0 * space.tabs[dd].detJac[emulti[dd]]
        return area
    # mapped geometry: integrate dS over the face tabulation
    pb = tabulate_elements(space, jnp.asarray(fids), order=1, face=(d, s))
    return np.asarray(pb.weight.sum(axis=1))
