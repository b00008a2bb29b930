#!/usr/bin/env python
"""Benchmark: 3D Poisson p=2 on one chip (toward the BASELINE.json
256^3 v5e-16 target; 128^3 is the largest single-chip size whose
stencil storage + assembly temporaries fit comfortably in 16 GB HBM —
see BASELINE.md "memory math").

Measures assembled-operator throughput (nnz/s), stencil SpMV through
BOTH the XLA slot-loop path and the Pallas flat-layout kernel
(sparse/pallas_spmv.py), and a Jacobi-CG solve running through the
Pallas operator.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Timing methodology (remote axon TPU): ``jax.block_until_ready`` does
NOT block on this backend — execution is queued server-side and only a
data FETCH waits, and the queue executes IN ORDER, so fetching one tiny
scalar is a full device barrier.  Every measurement below is
barrier-delimited, and per-op times come from differencing two loop
lengths (cancels the ~0.5 s fetch round trip and any constant
dispatch/launch overheads).

vs_baseline is relative to a *modeled* (not measured) reference rate of
5e7 nnz/s for PetIGA's single-core MatSetValues assembly path — see
BASELINE.md for the derivation and its error bars; no measured
reference numbers exist in-repo.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

_tiny = None


def barrier():
    """Full device barrier: the axon queue is in-order, so fetching one
    scalar waits for all previously queued work."""
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def measure_rtt(n=3):
    barrier()
    ts = []
    for _ in range(n):
        t0 = time.time()
        barrier()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from petiga_tpu.models.poisson import make_space, poisson_system
    from petiga_tpu.assembly.assemble import assemble_system, stencil_of
    from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
    from petiga_tpu.sparse.stencil import StencilMatrix
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

    NEL = 128
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

    # NOTE: no outer jit around assembly — big host tables would be
    # embedded as HLO constants and overflow the remote-compile request
    # limit; the chunk scan inside assemble_system is still one compiled
    # program with the ids as runtime arguments.
    def assemble(scale=1.0):
        A, b = assemble_system(
            sp, poisson_system, {"c": 0.0, "k": scale}, chunk=CHUNK
        )
        return A.data, b

    barrier()
    t0 = time.time()
    A_data, b = assemble()
    barrier()
    compile_s = time.time() - t0
    print(f"# assembled, compile+run {compile_s:.1f}s", flush=True)

    rtt = measure_rtt()
    print(f"# rtt {rtt*1e3:.0f}ms", flush=True)

    # k-scale varied per repeat so the server cannot serve cached results
    def time_assemblies(n, eps):
        barrier()
        t0 = time.time()
        for i in range(n):
            out = assemble(1.0 + eps * (i + 1))
        barrier()
        return time.time() - t0

    t1 = time_assemblies(1, 1e-7)
    t3 = time_assemblies(3, 1e-6)
    t_asm = (t3 - t1) / 2
    nnz_per_s = nnz / t_asm
    print(f"# assembly {t_asm:.3f}s", flush=True)

    A = StencilMatrix(st, A_data)
    op = PallasStencilOperator(A)
    assert op.ok, "Pallas operator must support the bench layout"
    DT = op.DT

    # operator data passes as jit ARGUMENTS (embedding the 1.1 GB
    # planes as constants overflows the remote-compile limit); per-op
    # time from differencing two loop lengths.
    def time_matvec(mv, data, n_lo=5, n_hi=55):
        def loop_fn(n):
            @jax.jit
            def loop(data, x):
                def body(i, x):
                    y = mv(data, x)
                    return y / jnp.sqrt(jnp.vdot(y, y))
                y = jax.lax.fori_loop(0, n, body, x)
                return jnp.vdot(y, y)
            return loop

        x = jnp.ones((sp.nnodes, 1), dtype)
        lo, hi = loop_fn(n_lo), loop_fn(n_hi)
        float(lo(data, x)); float(hi(data, x))  # compile + warm
        barrier()
        t0 = time.time(); float(lo(data, x)); t_lo = time.time() - t0
        t0 = time.time(); float(hi(data, x)); t_hi = time.time() - t0
        return (t_hi - t_lo) / (n_hi - n_lo)

    t_xla = time_matvec(lambda d, x: StencilMatrix(st, d).matvec(x), A_data)
    print(f"# xla matvec {t_xla*1e6:.0f}us", flush=True)
    t_pal = time_matvec(op.matvec_packed, DT)
    print(f"# pallas matvec {t_pal*1e6:.0f}us", flush=True)
    # HBM roofline: read the stencil matrix once.  Stencil storage
    # streams nnodes*K entries (incl. boundary zero slots); at 128^3 p=2
    # that is 1.6% above nnz.  ~819 GB/s on v5e.
    stream_bytes = st.nnodes * st.K * 4
    sol = stream_bytes / 819e9

    @jax.jit
    def solve(A_data, DT, b):
        Am = StencilMatrix(st, A_data)
        M = jacobi_preconditioner(Am)
        r = cg(lambda x: op.matvec_packed(DT, x), b, M=M, rtol=1e-6,
               maxiter=2000)
        return r.x, r.iters, r.residual

    xsol, iters, res = solve(A_data, DT, b)
    iters = int(iters)  # fetch forces the solve (compile + run)
    barrier()
    t0 = time.time()
    xsol, it2, res = solve(A_data, DT, b * 1.0000001)
    res = float(res)
    t_solve = time.time() - t0 - rtt

    baseline = 5e7  # nnz/s: MODELED reference single-core MatSetValues
    # assembly rate (BASELINE.md); not a measured number.
    out = {
        "metric": f"poisson3d_p2_{NEL}_assembly",
        "value": round(nnz_per_s / 1e6, 2),
        "unit": "Mnnz/s",
        "vs_baseline": round(nnz_per_s / baseline, 2),
        "baseline_model": "5e7 nnz/s modeled single-core MatSetValues (BASELINE.md)",
        "mesh": f"{NEL}^3 p{P}",
        "nnz": nnz,
        "assembly_s": round(t_asm, 4),
        "spmv_pallas_gflops": round(2 * nnz / t_pal / 1e9, 2),
        "spmv_pallas_roofline_frac": round(sol / t_pal, 3),
        "spmv_xla_gflops": round(2 * nnz / t_xla / 1e9, 2),
        "spmv_xla_roofline_frac": round(sol / t_xla, 3),
        "spmv_pallas_us": round(t_pal * 1e6, 1),
        "cg_iters": iters,
        "cg_residual": res,
        "solve_s": round(t_solve, 3),
        "compile_s": round(compile_s, 1),
        "rtt_s": round(rtt, 3),
        "timing": "in-order-queue barrier + loop-length differencing",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
