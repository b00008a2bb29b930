#!/usr/bin/env python
"""Distributed-vs-serial Pallas CG A/B at 128^3 p=2 on hardware.

Times (a) the serial packed-layout Jacobi-CG (the bench.py solve) and
(b) the shard_map(1-device) distributed CG with the per-device Pallas
kernel — the multi-chip perf story rests on the distributed program
matching the serial kernel per iteration (VERDICT r3 item 8).  Appends
the result to artifacts/pallas_tpu_check.json.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def main(NEL=128):
    from petiga_tpu.models.poisson import make_space, poisson_system
    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes,
        poisson_coefficients,
    )
    from petiga_tpu.parallel.dist import DistSpace
    from petiga_tpu.solve.krylov import cg

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)

    def forcing(x, ctx):
        return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    # (a) serial packed CG
    op, b = assemble_coefficient_planes(
        sp, poisson_coefficients, {"c": 0.0, "k": jnp.float32(1.0)},
        forcing=forcing,
    )
    DT = op.DT
    dinv = op.packed_diag_inv()

    @jax.jit
    def solve(DT, b, dinv):
        r = cg(
            lambda v: op.matvec_xb(DT, v), op.pack_vec(b),
            M=lambda z: z * dinv, rtol=1e-6, maxiter=2000,
        )
        return r.iters, r.residual

    it, res = solve(DT, b, dinv)
    it = int(it)
    times = []
    for _ in range(3):
        barrier()
        t0 = time.time()
        solve(DT, b, dinv)
        barrier()
        times.append(time.time() - t0)
    t_serial = min(times)
    out = {
        "case": f"dist_ab_{NEL}",
        "serial_iters": it,
        "serial_solve_s": round(t_serial, 4),
        "serial_ms_per_iter": round(1e3 * t_serial / it, 3),
    }
    del op, DT, b, dinv

    # (b) shard_map(1-device) distributed CG, per-device Pallas kernel
    ds = DistSpace(sp, devices=jax.devices()[:1], use_pallas=True)
    out["dist_pallas_active"] = ds._pk is not None
    data, bd = ds.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})
    x, itd, resd = ds.cg(data, bd, rtol=1e-6)
    itd = int(itd)
    times = []
    for _ in range(3):
        barrier()
        t0 = time.time()
        x, itd2, resd2 = ds.cg(data, bd, rtol=1e-6)
        barrier()
        times.append(time.time() - t0)
    t_dist = min(times)
    out["dist_iters"] = itd
    out["dist_solve_s"] = round(t_dist, 4)
    out["dist_ms_per_iter"] = round(1e3 * t_dist / itd, 3)
    out["dist_over_serial"] = round(
        out["dist_ms_per_iter"] / out["serial_ms_per_iter"], 3
    )

    path = "/root/repo/artifacts/pallas_tpu_check.json"
    doc = json.load(open(path)) if os.path.exists(path) else {"cases": []}
    doc["cases"] = [
        c for c in doc.get("cases", []) if c.get("case") != out["case"]
    ] + [out]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
