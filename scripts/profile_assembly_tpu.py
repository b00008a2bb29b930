#!/usr/bin/env python
"""Hardware profile of the 128^3 p=2 assembly + solve paths (round 3).

Measures, with the in-order-queue barrier methodology of bench.py:
  1. node-major assembly with the q-batched MXU form (poisson_system_q)
  2. plane-direct (slot-major) assembly with the same form
  3. form+tabulation cost in isolation (accumulation stripped)
  4. packed-layout Jacobi-CG through the Pallas kernel (pack once,
     iterate packed, unpack once) vs the r02 repack-per-matvec solve

Prints one JSON line per measurement; run on the axon TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_assembly_tpu.py
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

NEL = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P = 2
CHUNK = 32768

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def main():
    from petiga_tpu.models.poisson import (
        make_space,
        poisson_system_q,
    )
    from petiga_tpu.assembly.assemble import (
        _chunks,
        _make_element_KF,
        assemble_system,
        assemble_system_planes,
        stencil_of,
    )
    from petiga_tpu.assembly import fastpath
    from petiga_tpu.solve.krylov import cg

    sp = make_space(3, p=P, nel=NEL, dtype=jnp.float32)
    st = stencil_of(sp)

    def axis_nnz(N, p):
        i = np.arange(N)
        return int(np.sum(np.minimum(i + p, N - 1) - np.maximum(i - p, 0) + 1))

    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        nnz *= axis_nnz(N, p)

    def report(name, seconds, **kw):
        out = {"which": name, "seconds": round(seconds, 4)}
        if seconds > 0:
            out["Mnnz_per_s"] = round(nnz / seconds / 1e6, 1)
        out.update(kw)
        print(json.dumps(out), flush=True)

    def time_fn(fn, n_lo=1, n_hi=3):
        """Warm (compile), then difference two loop lengths."""
        fn(0)
        barrier()
        t0 = time.time()
        for i in range(n_lo):
            fn(1 + i)
        barrier()
        t_lo = time.time() - t0
        t0 = time.time()
        for i in range(n_hi):
            fn(10 + i)
        barrier()
        t_hi = time.time() - t0
        return (t_hi - t_lo) / (n_hi - n_lo)

    # 1. node-major qbatched
    def asm_q(i):
        A, b = assemble_system(
            sp, poisson_system_q, {"c": 0.0, "k": 1.0 + 1e-7 * i}, chunk=CHUNK
        )
        return A

    t = time_fn(asm_q)
    report("assembly_nodemajor_qbatched", t)

    # 2. plane-direct qbatched
    def asm_p(i):
        op, b = assemble_system_planes(
            sp, poisson_system_q, {"c": 0.0, "k": 1.0 + 1e-7 * i}, chunk=CHUNK
        )
        return op

    t = time_fn(asm_p)
    report("assembly_planes_qbatched", t)

    # 3. forms+tabulation only (no accumulation): scan chunks, sum Ke
    chunk_sz = fastpath.slab_chunk(sp, CHUNK)
    ids, valid = _chunks(sp, chunk_sz)

    def forms_only(i):
        element_KF = _make_element_KF(sp, {"c": 0.0, "k": 1.0 + 1e-7 * i},
                                      None, True)

        def body(acc, xs):
            ids_c, valid_c = xs
            Ke, Fe, _ = element_KF(ids_c, valid_c, None, poisson_system_q)
            return acc + jnp.sum(Ke) + jnp.sum(Fe), None

        acc, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              (ids, valid))
        return float(acc)

    t = time_fn(forms_only)
    report("forms_tabulation_only", t)

    # 4. packed CG through the planes operator
    op, b = assemble_system_planes(
        sp, poisson_system_q, {"c": 0.0, "k": 1.0}, chunk=CHUNK
    )
    print(json.dumps({"which": "pallas_plan",
                      "kind": op.kind, "rows": op.rows, "G": op.G,
                      "M": op.M, "align": list(op.align)}), flush=True)
    DT = op.DT
    dinv = op.packed_diag_inv()

    @jax.jit
    def solve_packed(DT, b, dinv):
        r = cg(
            lambda v: op.matvec_xb(DT, v),
            op.pack_vec(b),
            M=lambda z: z * dinv,
            rtol=1e-6,
            maxiter=2000,
        )
        return op.unpack_vec(r.x), r.iters, r.residual

    x, iters, res = solve_packed(DT, b, dinv)
    iters = int(iters)
    barrier()
    t0 = time.time()
    x, it2, res = solve_packed(DT, b * 1.0000001, dinv)
    res = float(res)
    barrier()
    t_solve = time.time() - t0
    report("packed_cg_solve", t_solve, iters=iters, residual=res,
           ms_per_iter=round(1e3 * t_solve / max(iters, 1), 2))

    # 5. pure packed matvec rate (fori loop of matvec_xb)
    def mv_loop(n):
        @jax.jit
        def loop(DT, xb):
            def body(i, v):
                y = op.matvec_xb(DT, v)
                return y / jnp.sqrt(jnp.vdot(y, y))
            y = jax.lax.fori_loop(0, n, body, xb)
            return jnp.vdot(y, y)
        return loop

    xb0 = op.pack_vec(b)
    lo, hi = mv_loop(5), mv_loop(55)
    float(lo(DT, xb0)); float(hi(DT, xb0))
    barrier()
    t0 = time.time(); float(lo(DT, xb0)); t_lo = time.time() - t0
    t0 = time.time(); float(hi(DT, xb0)); t_hi = time.time() - t0
    t_mv = (t_hi - t_lo) / 50
    sol = st.nnodes * st.K * 4 / 819e9
    report("packed_matvec", t_mv,
           us=round(t_mv * 1e6, 1),
           roofline_frac=round(sol / t_mv, 3))


if __name__ == "__main__":
    main()
