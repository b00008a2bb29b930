#!/usr/bin/env python
"""Benchmark: 3D Poisson p=2 (BASELINE.json targets).

Round-3 pipeline (see BASELINE.md for the round-2→3 methodology fixes):

  * 128³ single chip — plane-direct (slot-major) assembly with the
    q-batched MXU form and post-assembly Dirichlet elimination, then a
    Jacobi-CG solve that stays entirely in the packed Pallas kernel
    layout (pack b once, iterate packed, unpack x once).
  * 256³ single chip — the BASELINE.json end-to-end row: the same
    pipeline at 256³ (the HBM-windowed kernel variant: packed x exceeds
    VMEM), CG to rtol 1e-8, plus the matrix-free (sum-factorized,
    chunked) cross-check of the same solve.

Timing methodology (remote axon TPU): ``jax.block_until_ready`` does
NOT block on this backend — execution is queued server-side and only a
data FETCH waits; the queue executes IN ORDER, so fetching one tiny
scalar is a full device barrier.  Every measurement below is
barrier-delimited with NO data fetch inside the timed region.  Form
coefficients enter as device scalars so repeated assemblies reuse ONE
executable — round 2 unknowingly timed a recompile per repeat (Python-
float ctx values were embedded as HLO constants), which is why its
31.7 Mnnz/s was far below the real steady-state rate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

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
# x64 must be ON for the mixed-precision refinement stage (the f64
# matrix-free residual silently truncates to f32 otherwise); all f32
# stages declare explicit dtypes and the Pallas kernels use explicit
# i32 indices, so enabling it does not change the f32 programs.
jax.config.update("jax_enable_x64", True)
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


def scalar_nnz(sp):
    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        i = np.arange(N)
        nnz *= int(np.sum(np.minimum(i + p, N - 1) - np.maximum(i - p, 0) + 1))
    return nnz


def bench_mesh(NEL, chunk, solve_rtol, matfree=False, refine=False):
    """Assembly + packed-CG numbers for one mesh size."""
    from petiga_tpu.models.poisson import (
        exact_solution,
        make_space,
        poisson_system_q,
    )
    from petiga_tpu.assembly.assemble import (
        assemble_system_planes,
        compute_error_norm,
    )
    from petiga_tpu.solve.krylov import cg

    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes,
        poisson_coefficients,
    )

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)
    nnz = scalar_nnz(sp)
    out = {"nnz": nnz}

    # ---- conv (coefficient-form) assembly: the round-4 generic engine;
    # its operator (identical to the pointwise path to f32 round-off)
    # drives the solve below
    def forcing_c(x, c):
        return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def asm_conv(kval):
        return assemble_coefficient_planes(
            sp, poisson_coefficients, {"c": 0.0, "k": kval},
            forcing=forcing_c, donate_loop=(NEL > 128),
        )

    barrier()
    t0 = time.time()
    op, b = asm_conv(jnp.float32(1.0))
    barrier()
    out["conv_compile_s"] = round(time.time() - t0, 1)
    reps = 3 if NEL <= 128 else 1
    t0 = time.time()
    for i in range(reps):
        # free the previous operator FIRST: two resident plane arrays
        # would exceed HBM at 256³
        del op, b
        op, b = asm_conv(jnp.float32(1.0 + 1e-6 * i))
    barrier()
    t_conv = (time.time() - t0) / reps
    out["assembly_s"] = round(t_conv, 4)
    out["assembly_Mnnz_s"] = round(nnz / t_conv / 1e6, 1)
    Q = nen = (2 + 1) ** 3
    eflops = 2 * sp.nel * Q * nen * nen * 3
    out["assembly_elem_gflops"] = round(eflops / t_conv / 1e9, 1)
    st0 = op.stencil
    out["assembly_store_stream_frac"] = round(
        (st0.nnodes * st0.K * 4 / 819e9) / t_conv, 4
    )
    out["pallas_kind"] = op.kind

    # sum-factorized separable assembly of the SAME operator (Kronecker
    # element matrices from per-axis 1-D factors — no dim-D tabulation,
    # no quadrature contraction; verified identical to the generic path)
    from petiga_tpu.assembly.assemble import assemble_separable_planes

    def forcing(x):
        return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x))

    def asm_sep(kval):
        return assemble_separable_planes(
            sp, c=0.0, kappa=kval, forcing=forcing, chunk=chunk,
            donate_loop=(NEL > 128),
        )

    if NEL <= 128:  # at 256³ two resident operators would exceed HBM
        op_s, b_s = asm_sep(jnp.float32(1.0))
        barrier()
        t0 = time.time()
        for i in range(reps):
            op_s, b_s = asm_sep(jnp.float32(1.0 + 1e-6 * i))
        barrier()
        t_sep = (time.time() - t0) / reps
        out["assembly_separable_s"] = round(t_sep, 4)
        out["assembly_separable_Mnnz_s"] = round(nnz / t_sep / 1e6, 1)
        del op_s, b_s

    DT = op.DT
    dinv = op.packed_diag_inv()

    @jax.jit
    def solve(DT, b, dinv):
        r = cg(
            lambda v: op.matvec_xb(DT, v),
            op.pack_vec(b),
            M=lambda z: z * dinv,
            rtol=solve_rtol,
            maxiter=2000,
        )
        return op.unpack_vec(r.x), r.iters, r.residual

    x, iters, res = solve(DT, b, dinv)  # compile + run
    iters = int(iters)
    # min of 3 timed runs: the shared remote compile server adds
    # load-dependent noise on top of the device time
    times = []
    for _ in range(3):
        barrier()
        t0 = time.time()
        x, it2, res = solve(DT, b, dinv)
        barrier()
        times.append(time.time() - t0)
    t_solve = min(times)
    out["cg_iters"] = iters
    out["cg_residual"] = float(res)
    out["solve_s"] = round(t_solve, 3)
    out["cg_ms_per_iter"] = round(1e3 * t_solve / max(iters, 1), 2)

    # pure packed-matvec rate by loop-length differencing
    def mv_loop(n):
        @jax.jit
        def loop(DT, xb):
            def body(i, v):
                y = op.matvec_xb(DT, v)
                return y / jnp.sqrt(jnp.vdot(y, y))

            # i32 bounds keep the f32 loop program x64-invariant
            y = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, xb)
            return jnp.vdot(y, y)

        return loop

    xb0 = op.pack_vec(b)
    lo, hi = mv_loop(5), mv_loop(55)
    float(lo(DT, xb0))
    float(hi(DT, xb0))
    barrier()
    t0 = time.time()
    float(lo(DT, xb0))
    t_lo = time.time() - t0
    t0 = time.time()
    float(hi(DT, xb0))
    t_hi = time.time() - t0
    t_mv = (t_hi - t_lo) / 50
    st = op.stencil
    sol = st.nnodes * st.K * 4 / 819e9
    out["spmv_pallas_us"] = round(t_mv * 1e6, 1)
    out["spmv_pallas_gflops"] = round(2 * nnz / t_mv / 1e9, 1)
    out["spmv_pallas_roofline_frac"] = round(sol / t_mv, 3)

    # L2 error vs the manufactured solution (correctness witness)
    err = float(compute_error_norm(sp, x, exact_solution, k=0, chunk=chunk))
    out["l2_error"] = err

    if refine:
        # mixed-precision iterative refinement: f32 packed inner CG +
        # f64 sum-factorized matrix-free residual -> f64-grade solution
        # (the reference is double-precision end to end)
        from petiga_tpu.solve.refine import (
            assemble_rhs_f64,
            clone_f64,
            refined_solve,
        )
        from petiga_tpu.sparse.matfree import MatFreeOperator as MF64

        barrier()
        t0 = time.time()
        sp64 = clone_f64(sp)
        A64 = MF64(sp64, c=0.0, kappa=1.0, zchunk=16)

        def f64forcing(xx):
            return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * xx))

        b64 = assemble_rhs_f64(sp64, A64, f64forcing, chunk=chunk)
        x64, rinfo = refined_solve(
            sp, op, b64, c=0.0, kappa=1.0, A64=A64, sp64=sp64,
            rtol=1e-11, rtol_inner=1e-6, zchunk=16,
        )
        barrier()
        out["refine_total_s"] = round(time.time() - t0, 2)
        out["refine_passes"] = len(rinfo["inner_iters"])
        out["refine_inner_iters"] = rinfo["inner_iters"]
        out["refine_rel_residual"] = rinfo["relative_residual"]
        err64 = float(
            compute_error_norm(sp64, x64, exact_solution, k=0, chunk=chunk)
        )
        out["refined_l2_error"] = err64
        del x64, b64, A64

    # ---- pointwise q-batched generic assembly (the r03 path, timed for
    # comparison; at 256³ the conv operator must be freed first)
    def asm_pw(kval):
        return assemble_system_planes(
            sp, poisson_system_q, {"c": 0.0, "k": kval},
            chunk=chunk, order=1, donate_loop=(NEL > 128),
        )

    if NEL > 128:
        del op, DT
    op_p, b_p = asm_pw(jnp.float32(1.0))
    barrier()
    t0 = time.time()
    for i in range(reps):
        del op_p, b_p
        op_p, b_p = asm_pw(jnp.float32(1.0 + 1e-6 * i))
    barrier()
    t_pw = (time.time() - t0) / reps
    out["assembly_pointwise_s"] = round(t_pw, 4)
    out["assembly_pointwise_Mnnz_s"] = round(nnz / t_pw / 1e6, 1)
    del op_p, b_p

    if matfree:
        from petiga_tpu.sparse.matfree import MatFreeOperator

        A = MatFreeOperator(sp, c=0.0, kappa=1.0, zchunk=16)
        minv = 1.0 / A.scalar_diagonal()

        @jax.jit
        def solve_mf(b):
            r = cg(A, b, M=lambda z: z * minv, rtol=solve_rtol, maxiter=2000)
            return r.x, r.iters, r.residual

        xm, itm, resm = solve_mf(b)
        itm = int(itm)
        barrier()
        t0 = time.time()
        xm, itm2, resm = solve_mf(b * 1.0000001)
        barrier()
        out["matfree_solve_s"] = round(time.time() - t0, 3)
        out["matfree_iters"] = itm
        out["matfree_residual"] = float(resm)
        out["matfree_vs_assembled_max_diff"] = float(
            jnp.max(jnp.abs(xm - x))
        )
    return sp, out


def main():
    rtt0 = barrier()  # connect
    out128 = {}
    sp128, out128 = bench_mesh(128, chunk=131072, solve_rtol=1e-6)

    out256 = {}
    try:
        _, out256 = bench_mesh(
            256, chunk=65536, solve_rtol=1e-8, matfree=True, refine=True
        )
    except Exception as e:  # record the failure, keep the 128³ line
        out256 = {"error": f"{type(e).__name__}: {e}"[:300]}

    baseline = 5e7  # nnz/s: MODELED reference single-core MatSetValues
    # assembly rate (BASELINE.md); not a measured number.
    rate = out128["assembly_Mnnz_s"] * 1e6
    out = {
        "metric": "poisson3d_p2_128_assembly",
        "value": round(rate / 1e6, 2),
        "unit": "Mnnz/s",
        "vs_baseline": round(rate / baseline, 2),
        "baseline_model": "5e7 nnz/s modeled single-core MatSetValues (BASELINE.md)",
        "mesh": "128^3 p2 (+ 256^3 end-to-end extras)",
        "engine": "conv (coefficient-form) assembly; pointwise q-batched path in assembly_pointwise_*",
        "timing": "in-order-queue barrier, device-scalar ctx (no recompiles), no fetch inside timed regions",
        "m128": out128,
        "m256": out256,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
