"""Coefficient-form convolution assembly: the MXU-native generic
assembly engine.

The reference's generic element loop (``IGAComputeSystem``,
``/root/reference/src/petigaksp.c:171-193``; tabulation chain
petigaelem.c:794-1033) evaluates, for every element and quadrature
point, ``K_ab += w_q * sum_ij C_ij(x_q) D_i N_a(q) D_j N_b(q)`` — every
second-order bilinear form (mass, diffusion, advection, reaction) is of
this shape with ``D_0 = id`` and ``D_i = d/dx_i``.

TPU-first restructuring: on a regular unit-step patch the basis-product
factors ``P[(q,i,j), a, b] = D_i N_a(q) D_j N_b(q)`` are *identical for
every interior element* (per-axis 1-D tables repeat), so the whole
quadrature contraction *and* the stencil accumulation collapse into one
dense convolution over the element grid:

    planes[n, slot] = sum_a sum_k W[n - a, k] * Kc[k, a, slot]

with ``W[e, (ch, q)] = w_q * C_ch(x_{e,q})`` the per-element pointwise
coefficient evaluations (the only data that varies per element) and
``Kc`` a static ``(p+1)^dim``-tap kernel with ``nch*Q`` input channels
and ``K = (2p+1)^dim`` output channels, built once from the 1-D basis
tables.  ``lax.conv_general_dilated`` maps this straight onto the MXU —
no per-element small GEMMs, no scatter, and the element matrices are
never materialized.  Boundary-layer elements (modified open-knot basis)
fall outside the constant-kernel block; they are assembled by the
existing batched quadrature path over at most ``2*dim`` thin boxes and
shift-accumulated at static offsets.

The same coefficient spec also synthesizes the equivalent pointwise
q-batched form (:func:`coefficient_pointwise_form`), used for the
boundary boxes and as the equivalence oracle in tests — the conv path
reproduces the generic quadrature path to round-off.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import profiling
from . import fastpath
from .assemble import (
    _make_element_KF,
    boundary_flux_vector,
    dirichlet_post_fix,
    stencil_of,
)

__all__ = [
    "coefficient_pointwise_form",
    "poisson_coefficients",
    "assemble_coefficient_planes",
]


# ------------------------------------------------------------ coefficient API


def poisson_coefficients(x, ctx):
    """Reaction–diffusion channels ``c u v + k grad(u).grad(v)`` —
    the ConvTest.c:50-78 Galerkin form as a coefficient spec."""
    ctx = ctx or {}
    c = ctx.get("c", 0.0)
    k = ctx.get("k", 1.0)
    dim = x.shape[-1]
    ch = {(i + 1, i + 1): k for i in range(dim)}
    if not isinstance(c, (int, float)) or c != 0.0:
        ch[(0, 0)] = c
    return ch


def coefficient_pointwise_form(coef: Callable, forcing: Optional[Callable] = None):
    """Synthesize the pointwise q-batched form equivalent to a
    coefficient spec: ``K_ab = sum_q w_q sum_ij C_ij D_i N_a D_j N_b``.

    ``coef(x, ctx) -> {(i, j): value}`` with ``i, j in 0..dim`` (0 =
    value channel, ``i`` = d/dx_{i-1}); values are scalars or arrays
    broadcastable against ``x[..., 0]``.  ``forcing(x, ctx) -> f`` adds
    the load ``F_a = sum_q w_q f N_a``.
    """

    def form(pt, w, ctx):
        X = pt.x  # (Q, nsd)
        dt = pt.shape0.dtype
        ch = coef(X, ctx)
        D = [pt.shape0] + [
            pt.shape1[..., d] for d in range(pt.shape1.shape[-1])
        ]
        K = None
        for (i, j), c in ch.items():
            wc = w * jnp.broadcast_to(jnp.asarray(c, dt), w.shape)
            term = jnp.einsum("q,qa,qb->ab", wc, D[i], D[j])
            K = term if K is None else K + term
        if forcing is None:
            F = jnp.zeros(pt.shape0.shape[-1], dt)
        else:
            f = jnp.broadcast_to(
                jnp.asarray(forcing(X, ctx), dt), w.shape
            )
            F = jnp.einsum("q,qa->a", w * f, pt.shape0)
        return K, F

    form.qbatched = True
    return form


# ----------------------------------------------------------- type detection


def _axis_interior_run(t):
    """Longest contiguous run of elements sharing the modal (interior)
    1-D basis table on one axis -> (lo, hi).  Boundary-layer elements of
    an open knot vector have modified basis values and fall outside."""
    nel = t.nel
    rows = np.round(
        np.concatenate(
            [
                t.value[:, :, :2, :].reshape(nel, -1),
                t.weight,
                t.detJac[:, None],
            ],
            axis=1,
        ),
        12,
    )
    _, inv = np.unique(rows, axis=0, return_inverse=True)
    vals, counts = np.unique(inv, return_counts=True)
    mode = vals[np.argmax(counts)]
    best = (0, 0)
    i = 0
    while i < nel:
        if inv[i] == mode:
            j = i
            while j < nel and inv[j] == mode:
                j += 1
            if j - i > best[1] - best[0]:
                best = (i, j)
            i = j
        else:
            i += 1
    return best


# ------------------------------------------------------------- kernel build


def _dimension_numbers(dim):
    return {
        1: ("NWC", "WIO", "NWC"),
        2: ("NHWC", "HWIO", "NHWC"),
        3: ("NDHWC", "DHWIO", "NDHWC"),
    }[dim]


def _interior_kernel(space, chlist, dtype):
    """Static conv kernel (taps_rev..., nch*Q, K) from the interior-type
    1-D tables; taps pre-flipped for lax's correlation convention."""
    dim = space.dim
    p = space.degrees
    nq = [space.tabs[d].nqp for d in range(dim)]
    nen_d = [p[d] + 1 for d in range(dim)]
    sK = [2 * p[d] + 1 for d in range(dim)]

    G = []
    for d in range(dim):
        t = space.tabs[d]
        lo, _ = _axis_interior_run(t)
        V = t.value[lo, :, :2, :]  # (nq, 2, p+1)
        # quadrature weights live in W (W = wq * C), NOT in the kernel
        g = np.zeros((2, 2, nq[d], nen_d[d], sK[d]))
        for a in range(nen_d[d]):
            for s in range(sK[d]):
                b = a + s - p[d]
                if 0 <= b <= p[d]:
                    for da in range(2):
                        for db in range(2):
                            g[da, db, :, a, s] = V[:, da, a] * V[:, db, b]
        G.append(g)

    kers = []
    for (i, j) in chlist:
        k = np.ones(tuple(nq[::-1]) + tuple(nen_d[::-1]) + tuple(sK[::-1]))
        for d in range(dim):
            g = G[d][int(i == d + 1), int(j == d + 1)]  # (q, a, s)
            sh = [1] * (3 * dim)
            gi = dim - 1 - d
            sh[gi] = nq[d]
            sh[dim + gi] = nen_d[d]
            sh[2 * dim + gi] = sK[d]
            k = k * g.reshape(sh)
        kers.append(k)
    ker = np.stack(kers)  # (nch, q_rev..., a_rev..., s_rev...)
    Q = int(np.prod(nq))
    K = int(np.prod(sK))
    ker = ker.reshape((len(chlist) * Q,) + tuple(nen_d[::-1]) + (K,))
    ker = np.flip(ker, axis=tuple(range(1, 1 + dim)))  # correlation -> conv
    ker = np.moveaxis(ker, 0, dim)  # (taps_rev..., nch*Q, K)
    return jnp.asarray(ker, dtype)


def _forcing_kernel(space, dtype):
    """(taps_rev..., Q, 1) load-vector kernel from interior tables."""
    dim = space.dim
    p = space.degrees
    nq = [space.tabs[d].nqp for d in range(dim)]
    nen_d = [p[d] + 1 for d in range(dim)]
    k = np.ones(tuple(nq[::-1]) + tuple(nen_d[::-1]))
    for d in range(dim):
        t = space.tabs[d]
        lo, _ = _axis_interior_run(t)
        g = t.value[lo, :, 0, :]  # weights live in Wf = wq * f
        sh = [1] * (2 * dim)
        gi = dim - 1 - d
        sh[gi] = nq[d]
        sh[dim + gi] = nen_d[d]
        k = k * g.reshape(sh)
    Q = int(np.prod(nq))
    k = k.reshape((Q,) + tuple(nen_d[::-1]) + (1,))
    k = np.flip(k, axis=tuple(range(1, 1 + dim)))
    k = np.moveaxis(k, 0, dim)  # (taps_rev..., Q, 1)
    return jnp.asarray(k, dtype)


# ----------------------------------------------------------------- W tensors


def _box_1d_tables(space, lo, ext, dtype):
    """Per-axis (wdet, x) slices for an element box."""
    wdet, xs = [], []
    for d in range(space.dim):
        t = space.tabs[d]
        sl = slice(lo[d], lo[d] + ext[d])
        wdet.append(jnp.asarray(t.weight[sl] * t.detJac[sl, None], dtype))
        xs.append(jnp.asarray(t.point[sl], dtype))
    return wdet, xs


def _box_wq_x(space, wdet, xs):
    """(E_rev..., q_rev...) weight grid and (E_rev..., q_rev..., dim)
    quad-point coordinates for a box, from per-axis 1-D tables."""
    dim = space.dim
    eshape = [w.shape[0] for w in wdet]
    nq = [w.shape[1] for w in wdet]
    full = tuple(eshape[::-1]) + tuple(nq[::-1])

    def lift(arr, d):
        sh = [1] * (2 * dim)
        gi = dim - 1 - d
        sh[gi] = eshape[d]
        sh[dim + gi] = nq[d]
        return arr.reshape(sh)

    wq = lift(wdet[0], 0)
    for d in range(1, dim):
        wq = wq * lift(wdet[d], d)
    wq = jnp.broadcast_to(wq, full)
    X = jnp.stack(
        [jnp.broadcast_to(lift(xs[d], d), full) for d in range(dim)],
        axis=-1,
    )
    return wq, X


# ------------------------------------------------------- shell accumulation


def _accumulate_box_grid(space, Pg, Ke, lo, ext):
    """Shift-accumulate element blocks of a static box into grid-shaped
    planes ``Pg (K, Ne_rev...)`` (dof = 1).  All offsets static."""
    dim = space.dim
    p = space.degrees
    nen = space.nen
    nshape = space.nen_shape
    sbox_rev = tuple(2 * pd + 1 for pd in p)[::-1]
    Ne_rev = Pg.shape[1:]
    locs = fastpath._local_multi(space)
    KeG = Ke.reshape(tuple(ext[::-1]) + (nen,) + tuple(nshape[::-1]))
    Pv = Pg.reshape(sbox_rev + Ne_rev)
    for a in range(nen):
        am = [int(locs[d][a]) for d in range(dim)]
        g = KeG[..., a, :, :, :] if dim == 3 else (
            KeG[..., a, :, :] if dim == 2 else KeG[..., a, :]
        )
        # g: (box_rev..., b_rev...) -> (b_rev..., box_rev...)
        g = jnp.moveaxis(
            g, tuple(range(dim)), tuple(range(dim, 2 * dim))
        )
        slot_sl = tuple(
            slice(p[dim - 1 - gx] - am[dim - 1 - gx],
                  p[dim - 1 - gx] - am[dim - 1 - gx] + nshape[dim - 1 - gx])
            for gx in range(dim)
        )
        node_sl = tuple(
            slice(lo[dim - 1 - gx] + am[dim - 1 - gx],
                  lo[dim - 1 - gx] + am[dim - 1 - gx] + ext[dim - 1 - gx])
            for gx in range(dim)
        )
        Pv = Pv.at[slot_sl + node_sl].add(g)
    return Pv.reshape(Pg.shape)


def _accumulate_box_vector(space, bg, Fe, lo, ext):
    """Vector counterpart: ``bg (N_rev..., dof)``, Fe (B, nen, dof)."""
    dim = space.dim
    nen = space.nen
    nshape = space.nen_shape
    locs = fastpath._local_multi(space)
    FeG = Fe.reshape(tuple(ext[::-1]) + (nen, space.dof))
    for a in range(nen):
        am = [int(locs[d][a]) for d in range(dim)]
        node_sl = tuple(
            slice(lo[dim - 1 - gx] + am[dim - 1 - gx],
                  lo[dim - 1 - gx] + am[dim - 1 - gx] + ext[dim - 1 - gx])
            for gx in range(dim)
        )
        bg = bg.at[node_sl + (slice(None),)].add(FeG[..., a, :])
    return bg


def _shell_boxes(eshape, lo, hi):
    """Partition of the element grid minus the interior box into at most
    2*dim disjoint boxes (slowest axis split first, full cross-section)."""
    dim = len(eshape)
    boxes = []
    for d in range(dim - 1, -1, -1):
        pre = [(lo[dd], hi[dd] - lo[dd]) for dd in range(d + 1, dim)]
        full = [(0, eshape[dd]) for dd in range(d)]

        def mk(r0, r1):
            blo = [0] * dim
            bext = [0] * dim
            for dd in range(d):
                blo[dd], bext[dd] = full[dd]
            blo[d], bext[d] = r0, r1 - r0
            for k, dd in enumerate(range(d + 1, dim)):
                blo[dd], bext[dd] = pre[k]
            return tuple(blo), tuple(bext)

        if lo[d] > 0:
            boxes.append(mk(0, lo[d]))
        if hi[d] < eshape[d]:
            boxes.append(mk(hi[d], eshape[d]))
    return [b for b in boxes if all(e > 0 for e in b[1])]


def _split_box(lo, ext, max_elems):
    """Split a box along its largest axis until each part has at most
    ``max_elems`` elements."""
    vol = int(np.prod(ext))
    if vol <= max_elems:
        return [(tuple(lo), tuple(ext))]
    d = int(np.argmax(ext))
    nparts = -(-vol // max_elems)
    nparts = min(nparts, ext[d])
    step = -(-ext[d] // nparts)
    out = []
    s = 0
    while s < ext[d]:
        e = min(step, ext[d] - s)
        nlo = list(lo)
        nex = list(ext)
        nlo[d] += s
        nex[d] = e
        out.extend(_split_box(nlo, nex, max_elems))
        s += e
    return out


def _box_ids(eshape, lo, ext):
    """Flat element ids (axis-0 fastest) of a box, box-grid order."""
    dim = len(eshape)
    idx = np.meshgrid(
        *[np.arange(lo[d], lo[d] + ext[d]) for d in range(dim)][::-1],
        indexing="ij",
    )[::-1]  # idx[d] has grid shape ext_rev
    flat = np.zeros(tuple(np.array(ext)[::-1]), dtype=np.int64)
    stride = 1
    for d in range(dim):
        flat = flat + idx[d] * stride
        stride *= eshape[d]
    return jnp.asarray(flat.reshape(-1), jnp.int32)


# ------------------------------------------------------------- the assembler


def assemble_coefficient_planes(
    space,
    coef: Callable,
    ctx=None,
    *,
    forcing: Optional[Callable] = None,
    chunk_z: Optional[int] = None,
    shell_chunk: int = 32768,
    apply_fix: bool = True,
    interpret: Optional[bool] = None,
):
    """Assemble the system for a coefficient-form bilinear operator as
    one interior convolution plus thin boundary boxes; returns
    ``(op, b)`` exactly like :func:`assemble_system_planes` (same
    Dirichlet post-fix, same Pallas operator).

    Restrictions: open regular unit-step axes, identity map, dof = 1,
    order-1 channels.  Everything else falls back to the pointwise path
    (use ``coefficient_pointwise_form(coef, forcing)`` with
    ``assemble_system_planes``).
    """
    from ..sparse.pallas_spmv import (
        LANES,
        PallasStencilOperator,
        alignment_pads,
    )

    st = stencil_of(space)
    if any(space.periodic):
        raise ValueError("conv assembly requires open axes")
    if not fastpath.is_unit_step(space):
        raise ValueError("conv assembly requires a regular unit-step space")
    if space.dof != 1:
        raise ValueError("conv assembly currently supports dof=1")
    if space.has_geometry or space.rational is not None:
        raise ValueError("conv assembly requires the identity map")
    profiling.count("IGA_FormSystem", profiling.system_flops(space))

    dim = space.dim
    dt = space.dtype
    p = space.degrees
    eshape = space.elem_shape
    N = space.node_shape
    align = alignment_pads(st)
    Ne = tuple(n + a for n, a in zip(N, align))
    K = st.K

    runs = [_axis_interior_run(space.tabs[d]) for d in range(dim)]
    lo = [r[0] for r in runs]
    hi = [r[1] for r in runs]
    have_interior = all(hi[d] > lo[d] for d in range(dim))

    # channel list: probe the spec once at a representative point
    x0 = np.zeros((1, dim))
    chlist = sorted(coef(jnp.asarray(x0, dt), ctx).keys())
    for (i, j) in chlist:
        if not (0 <= i <= dim and 0 <= j <= dim):
            raise ValueError(f"channel {(i, j)} out of range (order-1 only)")

    ker = _interior_kernel(space, chlist, dt) if have_interior else None
    kerf = (
        _forcing_kernel(space, dt)
        if (have_interior and forcing is not None)
        else None
    )
    dn = _dimension_numbers(dim)
    pad = [(p[d], p[d]) for d in range(dim)][::-1]

    form = coefficient_pointwise_form(coef, forcing)
    element_KF = _make_element_KF(space, ctx, 1, False)

    # interior z-chunks (slowest-axis splits of the interior box)
    int_ext = tuple(hi[d] - lo[d] for d in range(dim))
    if have_interior:
        ez = int_ext[dim - 1]
        if chunk_z is None:
            # keep the per-chunk W tensor around ~128 MB
            Q = int(np.prod([space.tabs[d].nqp for d in range(dim)]))
            per_layer = (
                int(np.prod(int_ext[:-1])) * len(chlist) * Q * jnp.dtype(dt).itemsize
            )
            chunk_z = max(1, min(ez, (128 * 2**20) // max(per_layer, 1)))
        zsplits = []
        s = 0
        while s < ez:
            e = min(chunk_z, ez - s)
            zsplits.append((s, e))
            s += e
    else:
        zsplits = []

    shell = []
    for blo, bext in _shell_boxes(eshape, lo, hi) if have_interior else [
        (tuple(0 for _ in range(dim)), tuple(eshape))
    ]:
        shell.extend(_split_box(blo, bext, shell_chunk))

    def run():
        Pg = jnp.zeros((K,) + tuple(Ne[::-1]), dt)
        bg = jnp.zeros(tuple(N[::-1]) + (1,), dt)

        # ---- interior convolution, chunked along the slowest axis
        for (zs, zext) in zsplits:
            blo = list(lo)
            bext = list(int_ext)
            blo[dim - 1] = lo[dim - 1] + zs
            bext[dim - 1] = zext
            wdet, xs = _box_1d_tables(space, blo, bext, dt)
            wq, X = _box_wq_x(space, wdet, xs)
            ch = coef(X, ctx)
            W = jnp.stack(
                [
                    wq * jnp.broadcast_to(jnp.asarray(ch[c], dt), wq.shape)
                    for c in chlist
                ],
                axis=dim,
            )  # (E_rev..., nch, q_rev...)
            W = W.reshape(tuple(bext[::-1]) + (-1,))
            out = jax.lax.conv_general_dilated(
                W[None], ker, (1,) * dim, pad, dimension_numbers=dn,
                preferred_element_type=dt,
            )[0]
            # nodes [blo, blo + bext + p) per axis
            node_sl = tuple(
                slice(blo[dim - 1 - g],
                      blo[dim - 1 - g] + bext[dim - 1 - g] + p[dim - 1 - g])
                for g in range(dim)
            )
            Pg = Pg.at[(slice(None),) + node_sl].add(
                jnp.moveaxis(out, dim, 0)
            )
            if kerf is not None:
                f = jnp.broadcast_to(
                    jnp.asarray(forcing(X, ctx), dt), wq.shape
                )
                Wf = (wq * f).reshape(tuple(bext[::-1]) + (-1,))
                outf = jax.lax.conv_general_dilated(
                    Wf[None], kerf, (1,) * dim, pad, dimension_numbers=dn,
                    preferred_element_type=dt,
                )[0]
                bg = bg.at[node_sl + (slice(None),)].add(outf)

        # ---- boundary boxes through the generic quadrature path
        for (blo, bext) in shell:
            ids = _box_ids(eshape, blo, bext)
            valid = jnp.ones((ids.shape[0],), bool)
            Ke, Fe, _ = element_KF(ids, valid, None, form)
            Ke = Ke.reshape(ids.shape[0], space.nen, space.nen)
            Pg = _accumulate_box_grid(space, Pg, Ke, blo, bext)
            bg = _accumulate_box_vector(space, bg, Fe, blo, bext)
        return Pg, bg

    Pg, bg = jax.jit(run)()
    M = int(np.prod(Ne)) // LANES
    op = PallasStencilOperator.from_planes(
        st, Pg.reshape(K, M, LANES), align, interpret=interpret
    )
    b = bg.reshape(st.nnodes, 1)
    if apply_fix:
        op, b = dirichlet_post_fix(space, op, b)
    flux = boundary_flux_vector(space)
    if flux is not None:
        mask, _ = space.device("dirichlet")
        b = b + jnp.where(mask, 0.0, flux.astype(dt))
    return op, b
