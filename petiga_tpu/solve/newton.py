"""Newton-Krylov nonlinear solver — the analog of the reference's SNES
glue (``petigasnes.c``: IGAComputeFunction/Jacobian wired into PETSc's
Newton line-search solver).

The whole solve is one jittable loop: residual assembly, AD-Jacobian
assembly, preconditioned Krylov inner solve, and the convergence test
all run on-device inside ``lax.while_loop`` with static shapes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..assembly.assemble import assemble_function, assemble_jacobian
from .krylov import cg, bicgstab, jacobi_preconditioner

__all__ = ["newton", "NewtonResult"]


class NewtonResult(NamedTuple):
    U: jnp.ndarray
    iters: jnp.ndarray
    fnorm: jnp.ndarray
    converged: jnp.ndarray


def newton(
    space,
    function: Callable,
    U0: jnp.ndarray,
    ctx=None,
    *,
    jacobian: Optional[Callable] = None,
    aux=None,
    boundary: Optional[Callable] = None,
    rtol: float = 1e-8,
    atol: float = 1e-50,
    maxit: int = 50,
    linear_rtol: float = 1e-8,
    linear_solver: str = "cg",
    order: Optional[int] = None,
    chunk: Optional[int] = None,
    damping: float = 1.0,
    operator: str = "stencil",
    jfnk_pc: Optional[Callable] = None,
) -> NewtonResult:
    """Solve F(U) = 0 by Newton's method with an inner Krylov solve.

    ``function(pt, Ue, ctx) -> R (nen, dof)`` is the pointwise residual;
    the Jacobian defaults to forward-mode AD of the element residual.
    Dirichlet dofs are driven to their boundary values through the
    fix-value residual semantics (petigaelem.c:1441-1481).

    ``operator="fast"`` routes every inner matvec through the Pallas
    stencil kernel (``StencilMatrix.fast_operator``) — the preferred
    setting on TPU; it falls back to the XLA path automatically when the
    layout is unsupported.

    ``operator="jfnk"`` never assembles the Jacobian at all: inner
    matvecs are exact AD Jacobian actions (jax.jvp of the batched
    residual, :class:`~petiga_tpu.sparse.matfree.JacobianFreeOperator`)
    at ~2 residual evaluations each and O(vector) memory — the route to
    Newton at meshes whose stencil would not fit HBM.  ``jfnk_pc``
    optionally supplies a preconditioner factory ``U -> (r -> M^{-1}r)``
    (e.g. a Jacobi estimate from a spectrally-close
    :class:`~petiga_tpu.sparse.matfree.MatFreeOperator`); default is
    unpreconditioned.
    """
    from ..utils import profiling

    profiling.count("SNESSolve")
    dof = space.dof
    shape = (space.nnodes, dof)
    U0 = U0.reshape(shape)
    from .krylov import gmres

    solver = {"cg": cg, "bicgstab": bicgstab, "gmres": gmres}[linear_solver]
    if operator not in ("stencil", "fast", "jfnk"):
        raise ValueError(f"unknown operator {operator!r}")

    def resid(U):
        return assemble_function(
            space, function, U, ctx, aux=aux, order=order, chunk=chunk,
            boundary=boundary,
        )

    def jac(U):
        return assemble_jacobian(
            space, function, U, ctx, jacobian=jacobian, aux=aux, order=order,
            chunk=chunk, boundary=boundary,
        )

    F0 = resid(U0)
    f0 = jnp.sqrt(jnp.vdot(F0, F0)).real
    tol = jnp.maximum(rtol * f0, atol)

    def cond(st):
        U, F, fnorm, k = st
        return (fnorm > tol) & (k < maxit)

    def step(st):
        U, F, fnorm, k = st
        if operator == "jfnk":
            from ..sparse.matfree import JacobianFreeOperator

            A = JacobianFreeOperator(
                space, function, U, ctx, aux=aux, order=order, chunk=chunk,
                boundary=boundary,
            )
            M = jfnk_pc(U) if jfnk_pc is not None else None
        else:
            A = jac(U)
            M = jacobi_preconditioner(A)
            if operator == "fast":
                A = A.fast_operator()
        res = solver(A, F, M=M, rtol=linear_rtol)
        U = U - damping * res.x.reshape(shape)
        F = resid(U)
        fnorm = jnp.sqrt(jnp.vdot(F, F)).real
        return (U, F, fnorm, k + 1)

    U, F, fnorm, k = jax.lax.while_loop(cond, step, (U0, F0, f0, 0))
    return NewtonResult(U=U, iters=k, fnorm=fnorm, converged=fnorm <= tol)
