"""Krylov solvers on stencil operators — the analog of the PETSc KSP
layer the reference delegates to (petigaksp.c wires IGA matrices into
KSPSolve; here CG/BiCGStab/GMRES run natively in JAX so the whole solve
jits into one XLA program with ``lax.while_loop`` and stays on-device).

All solvers accept either a :class:`StencilMatrix`-like object (with
``.matvec``) or a callable ``x -> A@x``, and an optional preconditioner
``M(x) -> M^{-1} x``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..utils import profiling

__all__ = ["cg", "bicgstab", "gmres", "jacobi_preconditioner", "block_jacobi_preconditioner"]


def _as_matvec(A) -> Callable:
    return A.matvec if hasattr(A, "matvec") else A


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray  # final residual norm

    # tuple-unpacking compatibility: (x, info)


def jacobi_preconditioner(A):
    """Point-Jacobi M^{-1} = 1/diag(A) (guards zero diagonals)."""
    d = A.scalar_diagonal()  # (nnodes, dof)
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)

    def M(r):
        return (r.reshape(inv.shape) * inv).reshape(r.shape)

    return M


def block_jacobi_preconditioner(A):
    """Block-Jacobi with the dof×dof diagonal blocks (the BAIJ-style
    point-block preconditioner natural for dof>1 problems)."""
    D = A.diagonal()  # (nnodes, dof, dof)
    Dinv = jnp.linalg.inv(D)

    def M(r):
        shape = r.shape
        r = r.reshape(D.shape[0], D.shape[1])
        return jnp.einsum("nab,nb->na", Dinv, r).reshape(shape)

    return M


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def cg(
    A,
    b,
    x0: Optional[jnp.ndarray] = None,
    *,
    M: Optional[Callable] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 10000,
) -> KrylovResult:
    """Preconditioned conjugate gradients (SPD operators).

    Converges on ``||r|| <= max(rtol*||b||, atol)`` like PETSc's default
    KSP test.  Runs entirely in a ``lax.while_loop``.
    """
    profiling.count("KSPSolve")
    matvec = _as_matvec(A)
    Mv = M if M is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = Mv(r)
    p = z
    rz = _dot(r, z)
    bnorm = jnp.sqrt(_dot(b, b)).real
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (_dot(r, r).real > tol2) & (k < maxiter)

    def step(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Mv(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    # i32 counter: a Python-int 0 canonicalizes to i64 under x64, which
    # would change (and recompile) the otherwise f32-only solve program
    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, step, (x, r, z, p, rz, jnp.int32(0))
    )
    return KrylovResult(x=x, iters=k, residual=jnp.sqrt(_dot(r, r).real))


def bicgstab(
    A,
    b,
    x0: Optional[jnp.ndarray] = None,
    *,
    M: Optional[Callable] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 10000,
) -> KrylovResult:
    """Preconditioned BiCGStab for nonsymmetric operators."""
    matvec = _as_matvec(A)
    Mv = M if M is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    bnorm = jnp.sqrt(_dot(b, b)).real
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)

    def cond(st):
        x, r, p, v, rho, alpha, omega, k = st
        return (_dot(r, r).real > tol2) & (k < maxiter)

    def step(st):
        x, r, p, v, rho, alpha, omega, k = st
        rho_new = _dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = Mv(p)
        v = matvec(phat)
        alpha = rho_new / _dot(rhat, v)
        s = r - alpha * v
        shat = Mv(s)
        t = matvec(shat)
        omega = _dot(t, s) / _dot(t, t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    st = (x, r, p, v, rho, alpha, omega, jnp.int32(0))
    x, r, p, v, rho, alpha, omega, k = jax.lax.while_loop(cond, step, st)
    return KrylovResult(x=x, iters=k, residual=jnp.sqrt(_dot(r, r).real))


def gmres(
    A,
    b,
    x0: Optional[jnp.ndarray] = None,
    *,
    M: Optional[Callable] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 30,
    maxiter: int = 1000,
) -> KrylovResult:
    """Restarted GMRES(m) with left preconditioning.

    Fixed-shape Arnoldi basis (restart, n) inside ``lax.while_loop`` —
    iteration counts vary at runtime but shapes are static for XLA.

    ``maxiter`` counts INNER iterations (matvecs), consistent with
    cg/bicgstab: it is converted to ``ceil(maxiter/restart)`` restart
    cycles; the reported ``iters = k·restart`` is an upper bound (the
    final cycle may have needed fewer columns).
    """
    maxiter = -(-int(maxiter) // int(restart))
    matvec = _as_matvec(A)
    Mv = M if M is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    shape = b.shape
    n = b.size
    dt = b.dtype
    bnorm = jnp.sqrt(_dot(b, b)).real
    tol = jnp.maximum(rtol * bnorm, atol)

    def arnoldi_cycle(x):
        r = Mv(b - matvec(x)).reshape(-1)
        beta = jnp.sqrt(_dot(r, r)).real
        V = jnp.zeros((restart + 1, n), dt)
        H = jnp.zeros((restart + 1, restart), dt)
        V = V.at[0].set(jnp.where(beta > 0, r / beta, 0))

        def body(j, VH):
            V, H = VH
            w = Mv(matvec(V[j].reshape(shape))).reshape(-1)
            # modified Gram-Schmidt against all basis vectors (masked)
            def mgs(i, wH):
                w, H = wH
                h = jnp.where(i <= j, _dot(V[i], w), 0.0)
                H = H.at[i, j].set(h)
                return (w - h * V[i], H)

            w, H = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(restart), mgs, (w, H)
            )
            hn = jnp.sqrt(_dot(w, w)).real
            H = H.at[j + 1, j].set(hn)
            V = V.at[j + 1].set(jnp.where(hn > 1e-30, w / hn, 0))
            return (V, H)

        V, H = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(restart), body, (V, H)
        )
        # solve least squares min || beta e1 - H y ||
        e1 = jnp.zeros(restart + 1, dt).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        dx = (y @ V[:restart]).reshape(shape)
        return x + dx

    def cond(st):
        x, k = st
        r = b - matvec(x)
        return (jnp.sqrt(_dot(r, r)).real > tol) & (k < maxiter)

    def step(st):
        x, k = st
        return (arnoldi_cycle(x), k + 1)

    x, k = jax.lax.while_loop(cond, step, (x, jnp.int32(0)))
    r = b - matvec(x)
    return KrylovResult(x=x, iters=k * restart, residual=jnp.sqrt(_dot(r, r)).real)
