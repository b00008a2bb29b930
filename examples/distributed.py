#!/usr/bin/env python
"""Distributed Poisson over a device mesh — the reference's
``mpiexec -n N ./Poisson -iga_...`` workflow (demo/Poisson.c run under
MPI; petigapart.c picks the process grid) driven through ``DistSpace``.

    # 8-virtual-device CPU mesh (same shard_map program as a TPU slice)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py --dim 2 -p 2 -N 16 \
        --solver gmres --pc schwarz --checkpoint /tmp/ckpt

Solver: cg | bicgstab | gmres.  PC: jacobi | pbjacobi | schwarz | mg |
fieldsplit — the distributed analogs of -ksp_type/-pc_type.  With
``--checkpoint`` the solution is written as a per-device-block sharded
checkpoint (io/sharded.py) and read back.
"""

import numpy as np
import jax
import jax.numpy as jnp

from petiga_tpu.config import bind_cli, print_info


def main(argv=None):
    opts, ns = bind_cli(
        argv,
        extra=[
            ("solver", str, "cg", "cg | bicgstab | gmres"),
            ("pc", str, "jacobi",
             "jacobi | pbjacobi | schwarz | mg | fieldsplit"),
            ("checkpoint", str, "", "directory for a sharded checkpoint"),
            ("check-error", float, 0.0, "fail if L2 error exceeds this"),
        ],
    )
    from petiga_tpu.assembly.assemble import assemble_system
    from petiga_tpu.models.poisson import l2_error, poisson_system
    from petiga_tpu.parallel.dist import DistSpace

    space = opts.build_space()
    for d in range(space.dim):
        for s in range(2):
            space.set_boundary_value(d, s, 0, 0.0)
    print_info(space)

    ds = DistSpace(space)
    print(f"device mesh: {ds.pgrid} over {len(jax.devices())} devices")

    pc = ns.pc
    if pc == "schwarz":
        from petiga_tpu.solve.schwarz import schwarz_local_preconditioner

        pc = schwarz_local_preconditioner(subdomains=(1,) * space.dim)
    elif pc == "mg":
        from petiga_tpu.solve.multigrid import mg_local_preconditioner

        def asm(s):
            A, _ = assemble_system(s, poisson_system, {"c": 0.0, "k": 1.0})
            return A

        pc = mg_local_preconditioner(asm, levels=2)
    elif pc == "fieldsplit":
        from petiga_tpu.solve.fieldsplit import (
            fieldsplit_local_preconditioner,
        )

        pc = fieldsplit_local_preconditioner()

    U, info = ds.solve_system(
        poisson_system, {"c": 0.0, "k": 1.0},
        rtol=1e-10, solver=ns.solver, pc=pc,
    )
    err = float(l2_error(space, U))
    print(f"{ns.solver}({ns.pc}): iters={info['iters']} "
          f"residual={info['residual']:.3e} L2={err:.4e}")

    if ns.checkpoint:
        from petiga_tpu.io.sharded import load_sharded, save_sharded

        save_sharded(ds, jnp.asarray(U), ns.checkpoint, "U")
        back = load_sharded(ns.checkpoint, "U")
        assert np.array_equal(np.asarray(back), np.asarray(U))
        print(f"sharded checkpoint round trip ok: {ns.checkpoint}")

    if ns.check_error and err > ns.check_error:
        raise SystemExit(f"L2 error {err} exceeds {ns.check_error}")
    return 0


if __name__ == "__main__":
    main()
