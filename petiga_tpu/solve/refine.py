"""Mixed-precision iterative refinement: f32 assembled inner solves with
an f64 matrix-free residual.

The reference computes in ``PetscReal`` (double) end-to-end; at 256³ p=2
an f64 assembled operator is ~17 GB and cannot fit one chip, but the f64
*residual* only needs the per-axis 1-D tables (sum-factorized apply —
:class:`~petiga_tpu.sparse.matfree.MatFreeOperator` on an f64 clone of
the space).  Classic iterative refinement (Wilkinson; Carson–Higham
SIAM 2018):

    x_{k+1} = x_k + solve_f32(b_f64 - A_f64 x_k)

contracts the error by ~cond(A)·eps_f32 per pass (~1e-2 at the 256³
condition number), so 2–4 passes leave the solution at the f64/
discretization floor instead of the f32 rounding floor (round-3 gap:
L2 3.8e-4 vs the ~1e-6 f64 discretization error; VERDICT r3 item 4).

Dirichlet semantics match the assembled post-fix exactly (fixed rows
``mult·u``): ``MatFreeOperator`` implements the same elimination, so the
f64 residual of the f32-assembled, post-fixed operator is consistent.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.assemble import _node_multiplicity, assemble_vector
from ..sparse.matfree import MatFreeOperator
from .krylov import cg

__all__ = ["clone_f64", "assemble_rhs_f64", "refined_solve"]


def clone_f64(space):
    """f64 clone sharing the discretization, BCs, and geometry."""
    sp64 = space.clone(dtype=jnp.float64)
    sp64.bc = space.bc
    sp64.bc_visit = space.bc_visit
    sp64.fix_table = space.fix_table
    sp64.geometry = space.geometry
    sp64.rational = space.rational
    sp64.property = space.property
    return sp64


def _fix_rhs(sp64, A64, b):
    """Dirichlet elimination on an f64 load vector, mirroring the
    assembled post-fix (b -= A·lift; fixed rows = mult·v).  Jitted:
    the matrix-free apply dispatched eagerly costs one remote round
    trip per op on this backend."""
    mask, vals = sp64.device("dirichlet")
    mult = jnp.asarray(_node_multiplicity(sp64), b.dtype)
    # homogeneous BCs (the common case): the lift is identically zero,
    # so skip the A·lift matvec entirely
    homogeneous = not bool(np.any(np.asarray(vals)))

    @jax.jit
    def fix(b, mask, vals, mult):
        mask = mask.astype(b.dtype)
        vals = vals.astype(b.dtype)
        if homogeneous:
            b2 = b
        else:
            lift = mask * vals
            b2 = b - A64.matvec(lift).reshape(b.shape)
        return jnp.where(mask > 0, mult[:, None] * vals,
                         b2 * (1.0 - mask))

    return fix(b, mask, vals, mult)


def assemble_rhs_f64(sp64, A64, forcing: Callable, *, chunk=None):
    """f64 load vector ``b_a = ∫ f N_a`` with assembled-style Dirichlet
    elimination; ``forcing(x) -> scalar`` at a physical point.

    Eligible spaces ride the matrix-free operator's windowed
    sum-factorized load (``MatFreeOperator.load_vector``): the earlier
    f64 conv load OOMed at 256³ (XLA materializes non-MXU f64 conv
    patches — multi-GB scratch) and the scatter-based f64 path crashes
    libtpu there."""
    use_mf = (
        not sp64.collocation
        and not (sp64.has_geometry or sp64.is_rational)
        and sp64.dof == 1
    )
    if use_mf:
        b = jax.jit(lambda: A64.load_vector(forcing))()
    else:
        def vecform(pt, ctx):
            return forcing(pt.x) * pt.shape0

        b = assemble_vector(sp64, vecform, order=0, chunk=chunk)
    return _fix_rhs(sp64, A64, b)


def refined_solve(
    space,
    op,
    b64,
    *,
    c: float = 0.0,
    kappa: float = 1.0,
    C=None,
    Kmat=None,
    rtol_inner: float = 1e-6,
    rtol: float = 1e-12,
    max_refine: int = 6,
    maxiter_inner: int = 2000,
    zchunk: Optional[int] = None,
    A64: Optional[MatFreeOperator] = None,
    sp64=None,
):
    """Solve ``A x = b`` to f64 accuracy with f32 inner solves.

    Args:
      space: the (f32) space the operator was assembled on.
      op: packed f32 ``PallasStencilOperator`` (Dirichlet post-fixed).
      b64: f64 load vector (``assemble_rhs_f64``).
      c/kappa/C/Kmat: the coefficient(s) of the assembled form, passed
        to the f64 matrix-free residual operator.
      rtol: outer stopping criterion on ||r||/||b|| in f64.

    Returns ``(x64, info)`` with per-pass residual history.
    """
    if sp64 is None:
        sp64 = clone_f64(space)
    if A64 is None:
        A64 = MatFreeOperator(sp64, c=c, kappa=kappa, C=C, Kmat=Kmat,
                              zchunk=zchunk)
    dinv = op.packed_diag_inv()

    # DT / dinv / b64 enter as jit ARGUMENTS: a closure over the packed
    # planes embeds them as an HLO constant — GBs in the compile
    # request at 256³ (see PallasStencilOperator.matvec_packed)
    @jax.jit
    def inner(DT, dv, r32):
        res = cg(
            lambda v: op.matvec_xb(DT, v),
            op.pack_vec(r32),
            M=lambda z: z * dv,
            rtol=rtol_inner,
            maxiter=maxiter_inner,
        )
        return op.unpack_vec(res.x), res.iters

    @jax.jit
    def residual(b64, x64):
        r = b64 - A64.matvec(x64).reshape(b64.shape)
        return r, jnp.sqrt(jnp.vdot(r, r).real)

    bnorm = float(jnp.sqrt(jnp.vdot(b64, b64).real))
    x = jnp.zeros_like(b64)
    x_good, rn_good = x, float("inf")
    hist = []
    iters = []
    for _ in range(max_refine):
        r, rn = residual(b64, x)
        rn = float(rn)
        hist.append(rn)
        if not np.isfinite(rn):
            # guard: a non-finite residual evaluation (observed once on
            # flaky 256³ f64 hardware passes) must not poison the
            # converged iterate — stop and keep the last good x
            break
        if rn < rn_good:
            x_good, rn_good = x, rn
        if rn <= rtol * bnorm:
            break
        e32, it = inner(op.DT, dinv, r.astype(jnp.float32))
        iters.append(int(it))
        x = x + e32.astype(jnp.float64)
    r, rn = residual(b64, x)
    rn = float(rn)
    if np.isfinite(rn) and rn < rn_good:
        x_good, rn_good = x, rn
    hist.append(rn)
    return x_good, {
        "residuals": hist,
        "inner_iters": iters,
        "relative_residual": rn_good / bnorm,
    }
