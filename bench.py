#!/usr/bin/env python
"""Benchmark: 3D Poisson p=2 (BASELINE.json reference config) on one chip.

Measures assembled-operator throughput (nnz/s), stencil SpMV (GF/s and
nnz/s), and a CG solve, then prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is relative to 5e7 nnz/s — the order of magnitude of the
reference's single-core C assembly path (no numbers are published
in-repo; see BASELINE.md).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    from petiga_tpu.models.poisson import make_space, poisson_system, poisson_system_q
    from petiga_tpu.assembly.assemble import assemble_system, stencil_of
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner

    NEL = 64
    P = 2
    CHUNK = 32768
    dtype = jnp.float32

    sp = make_space(3, p=P, nel=NEL, dtype=dtype)
    st = stencil_of(sp)

    # exact scalar nnz (separable: product over axes of summed window sizes)
    def axis_nnz(N, p):
        i = np.arange(N)
        lo = np.maximum(i - p, 0)
        hi = np.minimum(i + p, N - 1)
        return int(np.sum(hi - lo + 1))

    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        nnz *= axis_nnz(N, p)

    ctx = {"c": 0.0, "k": 1.0}

    @jax.jit
    def assemble():
        A, b = assemble_system(sp, poisson_system, ctx, chunk=CHUNK)
        return A.data, b

    t0 = time.time()
    A_data, b = jax.block_until_ready(assemble())
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        A_data, b = jax.block_until_ready(assemble())
        times.append(time.time() - t0)
    t_asm = min(times)
    nnz_per_s = nnz / t_asm

    from petiga_tpu.sparse.stencil import StencilMatrix

    A = StencilMatrix(st, A_data)

    @jax.jit
    def spmv_loop(x, n=50):
        def body(i, x):
            y = A.matvec(x)
            return y / jnp.sqrt(jnp.vdot(y, y))
        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.ones((sp.nnodes, 1), dtype)
    jax.block_until_ready(spmv_loop(x))
    t0 = time.time()
    jax.block_until_ready(spmv_loop(x))
    t_spmv = (time.time() - t0) / 50
    spmv_gflops = 2 * nnz / t_spmv / 1e9
    # HBM roofline: read matrix once (4 B/entry) at ~820 GB/s on v5e
    spmv_sol = nnz * 4 / 819e9
    spmv_eff = spmv_sol / t_spmv

    @jax.jit
    def solve(b):
        M = jacobi_preconditioner(A)
        r = cg(A, b, M=M, rtol=1e-6, maxiter=2000)
        return r.x, r.iters, r.residual

    jax.block_until_ready(solve(b))
    t0 = time.time()
    xsol, iters, res = jax.block_until_ready(solve(b))
    t_solve = time.time() - t0

    baseline = 5e7  # nnz/s, reference-class single-core assembly
    out = {
        "metric": "poisson3d_p2_64_assembly",
        "value": round(nnz_per_s / 1e6, 2),
        "unit": "Mnnz/s",
        "vs_baseline": round(nnz_per_s / baseline, 2),
        "mesh": f"{NEL}^3 p{P}",
        "nnz": nnz,
        "assembly_s": round(t_asm, 4),
        "spmv_gflops": round(spmv_gflops, 2),
        "spmv_roofline_frac": round(spmv_eff, 3),
        "cg_iters": int(iters),
        "cg_residual": float(res),
        "solve_s": round(t_solve, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
