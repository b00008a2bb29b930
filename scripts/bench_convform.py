#!/usr/bin/env python
"""Hardware bench: coefficient-form convolution assembly at 128^3 p=2.

Barrier methodology of bench.py (in-order axon queue; fetch one scalar
as a device barrier; coefficients as device scalars so repeats reuse one
executable).  Compares against the r03 generic plane-direct number
(BENCH_r03.json: 1.99 s / 134.1 Mnnz/s).
"""

import json
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


def scalar_nnz(sp):
    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        i = np.arange(N)
        nnz *= int(np.sum(np.minimum(i + p, N - 1) - np.maximum(i - p, 0) + 1))
    return nnz


def main(NEL=128):
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes,
        poisson_coefficients,
    )

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)
    nnz = scalar_nnz(sp)
    out = {"mesh": f"{NEL}^3 p2", "nnz": nnz}

    def forcing(x, ctx):
        return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def asm(kval):
        return assemble_coefficient_planes(
            sp, poisson_coefficients, {"c": 0.0, "k": kval},
            forcing=forcing, donate_loop=(NEL > 128),
        )

    barrier()
    t0 = time.time()
    op, b = asm(jnp.float32(1.0))
    barrier()
    out["compile_s"] = round(time.time() - t0, 1)

    reps = 5
    barrier()
    t0 = time.time()
    for i in range(reps):
        del op, b
        op, b = asm(jnp.float32(1.0 + 1e-6 * i))
    barrier()
    t_asm = (time.time() - t0) / reps
    out["assembly_s"] = round(t_asm, 4)
    out["assembly_Mnnz_s"] = round(nnz / t_asm / 1e6, 1)
    # conv MXU flops (incl. masked zero taps XLA still executes)
    Q = 27
    nch = 3
    Eint = (NEL - 4) ** 3
    flops = 2 * Eint * 27 * (nch * Q) * 125
    out["conv_tflops_s"] = round(flops / t_asm / 1e12, 2)

    # sanity: operator matches the generic path on a random vector
    from petiga_tpu.assembly.assemble import assemble_system_planes
    from petiga_tpu.models.poisson import poisson_system_q

    if NEL <= 64:
        A, b2 = assemble_system_planes(
            sp, poisson_system_q, {"c": 0.0, "k": 1.0 + 1e-6 * (reps - 1)},
            order=1,
        )
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(sp.nnodes, 1)), jnp.float32
        )
        d = float(jnp.max(jnp.abs(op.matvec(x) - A.matvec(x))))
        m = float(jnp.max(jnp.abs(A.matvec(x))))
        out["max_matvec_reldiff_vs_generic"] = d / m
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
