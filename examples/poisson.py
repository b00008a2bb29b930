#!/usr/bin/env python
"""Poisson — the canonical linear solve (reference demo/Poisson.c:48-110,
demo/Poisson{1,2,3}D.c).

    python examples/poisson.py --dim 3 -p 2 -N 16 --check-error 1e-4

Builds the space from CLI options (IGASetFromOptions analog), applies
homogeneous Dirichlet BCs, assembles the Galerkin system, solves with
Jacobi-CG, and reports the L2/H1 error against the manufactured
solution.  Pass ``--collocation`` for the Greville-collocation variant
(Poisson.c:11-46 has both forms).

On this machine: run with PYTHONPATH=/root/repo[:/root/.axon_site for TPU].
"""

import sys

import jax.numpy as jnp

from petiga_tpu.config import bind_cli, print_info


def main(argv=None):
    opts, ns = bind_cli(
        argv,
        extra=[("check-error", float, 0.0, "fail if L2 error exceeds this")],
    )
    space = opts.build_space()
    for d in range(space.dim):
        for s in range(2):
            space.set_boundary_value(d, s, 0, 0.0)
    print_info(space)

    if opts.collocation:
        from petiga_tpu.assembly.collocation import assemble_collocation
        from petiga_tpu.solve.krylov import bicgstab, jacobi_preconditioner

        def laplace_colloc(pt, ctx):
            # -Δu = f at the collocation point (Poisson.c:33-46)
            f = space.dim * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * pt.x))
            lapN = jnp.trace(pt.shape2, axis1=-2, axis2=-1)
            return -lapN[None, :], jnp.asarray([f])

        A, b = assemble_collocation(space, laplace_colloc)
        res = bicgstab(A, b, M=jacobi_preconditioner(A), rtol=1e-12,
                       maxiter=3000)
        U = res.x
        info = {"iters": int(res.iters), "residual": float(res.residual)}
    else:
        from petiga_tpu.models.poisson import solve_poisson

        U, info = solve_poisson(space)
    from petiga_tpu.models.poisson import l2_error, h1_error

    e0, e1 = l2_error(space, U), h1_error(space, U)
    print(f"iters={info['iters']} residual={info['residual']:.3e} "
          f"L2={e0:.6e} H1={e1:.6e}")
    tol = getattr(ns, "check_error")
    if tol and e0 > tol:
        print(f"FAIL: L2 error {e0:.3e} > {tol:.3e}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
