"""Real-TPU (Mosaic) correctness spot-check of the round-5 paths:

  * dof>1 mirrored-slot symmetric kernel (transposed-block mirror)
  * symmetric (upper-slot) conv assembly + Dirichlet post-fix + CG
  * periodic conv assembly (wrap-folded output)
  * constant-coefficient outer-product assembly (timed vs the conv path)

Writes artifacts/r5_checks.json.  Run with
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_r5_tpu.py
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.assembly.assemble import assemble_system, stencil_of
from petiga_tpu.assembly.convform import (
    assemble_coefficient_planes,
    poisson_coefficients,
)
from petiga_tpu.sparse.stencil import SymmetricStencilMatrix
from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def forcing(x, ctx):
    return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)


def check_sym_dof():
    """dof=3 mirrored-slot kernel vs full-storage XLA matvec."""
    sp = Space([Axis.uniform(p=1, nel=12) for _ in range(3)], dof=3,
               dtype=jnp.float32)

    def form(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
        C = jnp.asarray(np.eye(3) * 2.0 + 0.25, jnp.float32)
        return jnp.einsum("ij,ab->iajb", K, C).reshape(
            sp.nen * 3, sp.nen * 3
        ), jnp.zeros(sp.nen * 3, jnp.float32)

    A, _ = assemble_system(sp, form, apply_fix=False)
    S = SymmetricStencilMatrix.from_full(A)
    op = PallasStencilOperator.from_symmetric(S)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(sp.nnodes, 3)), jnp.float32
    )
    y_sym = np.asarray(jax.jit(op.matvec)(x))
    y_ref = np.asarray(jax.jit(A.matvec)(x))
    scale = max(np.max(np.abs(y_ref)), 1e-30)
    err = float(np.max(np.abs(y_sym - y_ref)) / scale)
    return {"case": "sym_kernel_dof3", "rel_err": err, "kind": op.kind,
            "ok": bool(err < 1e-5)}


def check_sym_assembly(nel=48):
    """symmetric=True conv assembly (outer-product const path) with
    Dirichlet post-fix: operator action, rhs, and a packed CG solve vs
    the full-storage assembly."""
    from petiga_tpu.solve.krylov import cg

    sp = make_space(3, p=2, nel=nel, dtype=jnp.float32)
    ctx = {"c": 0.0, "k": jnp.float32(1.0)}
    A, b = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, forcing=forcing
    )
    S, bs = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, forcing=forcing, symmetric=True
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(sp.nnodes, 1)), jnp.float32
    )
    yf = np.asarray(jax.jit(A.matvec)(x))
    ys = np.asarray(jax.jit(S.matvec)(x))
    scale = max(np.max(np.abs(yf)), 1e-30)
    err = float(np.max(np.abs(ys - yf)) / scale)
    err_b = float(np.max(np.abs(np.asarray(bs) - np.asarray(b))) /
                  max(np.max(np.abs(np.asarray(b))), 1e-30))

    def solve(op, rhs):
        dinv = op.packed_diag_inv()

        @jax.jit
        def go(DT, rb, dv):
            r = cg(lambda v: op.matvec_xb(DT, v), op.pack_vec(rb),
                   M=lambda z: z * dv, rtol=1e-6, maxiter=500)
            return op.unpack_vec(r.x), r.iters

        return go(op.DT, rhs, dinv)

    xs, its = solve(S, bs)
    xf, itf = solve(A, b)
    err_x = float(
        np.max(np.abs(np.asarray(xs) - np.asarray(xf)))
        / max(np.max(np.abs(np.asarray(xf))), 1e-30)
    )
    # timed sym vs full matvec (packed loop differencing)
    def mv_time(op):
        xb0 = op.pack_vec(b)

        def loop(n):
            @jax.jit
            def go(DT, xb):
                def body(i, v):
                    y = op.matvec_xb(DT, v)
                    return y / jnp.sqrt(jnp.vdot(y, y))
                return jnp.vdot(
                    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body,
                                      xb), xb)
            return go
        lo, hi = loop(5), loop(45)
        float(lo(op.DT, xb0)); float(hi(op.DT, xb0))
        barrier()
        t0 = time.time(); float(lo(op.DT, xb0)); t_lo = time.time() - t0
        t0 = time.time(); float(hi(op.DT, xb0)); t_hi = time.time() - t0
        return (t_hi - t_lo) / 40
    t_sym = mv_time(S)
    t_full = mv_time(A)
    return {"case": f"sym_assembly_{nel}", "matvec_rel_err": err,
            "rhs_rel_err": err_b, "solve_rel_err": err_x,
            "iters_sym": int(its), "iters_full": int(itf),
            "spmv_full_us": round(t_full * 1e6, 1),
            "spmv_sym_us": round(t_sym * 1e6, 1),
            "sym_over_full": round(t_sym / t_full, 3),
            "ok": bool(err < 1e-5 and err_b < 1e-5 and err_x < 1e-4)}


def check_periodic(nel=32):
    """Periodic conv assembly vs the node-major scatter path.  (The
    oracle assembles under the highest-precision fix; its forcing is
    (c + 3π²k)·prod sin — match it.)"""
    sp = Space([Axis.uniform(p=2, nel=nel, periodic=True)
                for _ in range(3)], dtype=jnp.float32)
    ctx = {"c": 0.5, "k": jnp.float32(1.0)}

    def forcing(x, c):
        return (0.5 + 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * x),
                                                axis=-1)

    A, b = assemble_system(
        sp, poisson_system, {"c": 0.5, "k": 1.0}, apply_fix=False
    )
    out = {}
    for co in (True, False):
        B, c = assemble_coefficient_planes(
            sp, poisson_coefficients, ctx, forcing=forcing,
            apply_fix=False, const_outer=co,
        )
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(sp.nnodes, 1)),
            jnp.float32,
        )
        yb = np.asarray(jax.jit(B.matvec)(x))
        ya = np.asarray(jax.jit(A.matvec)(x))
        scale = max(np.max(np.abs(ya)), 1e-30)
        key = "outer" if co else "conv"
        out[f"rel_err_{key}"] = float(np.max(np.abs(yb - ya)) / scale)
        out[f"rhs_rel_err_{key}"] = float(
            np.max(np.abs(np.asarray(c) - np.asarray(b)))
            / max(np.max(np.abs(np.asarray(b))), 1e-30)
        )
    out["case"] = f"periodic_conv_{nel}"
    out["ok"] = bool(all(v < 1e-5 for k, v in out.items()
                         if k.startswith("r")))
    return out


def check_outer_timing(nel=128):
    """Constant-coefficient assembly timing: outer-product vs conv path
    (the VERDICT item-4 target — same methodology as bench.py: device
    scalar k, barrier-delimited, fresh assembly per rep)."""
    sp = make_space(3, p=2, nel=nel, dtype=jnp.float32)
    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        i = np.arange(N)
        nnz *= int(np.sum(np.minimum(i + p, N - 1) - np.maximum(i - p, 0) + 1))

    def asm(kval, co):
        return assemble_coefficient_planes(
            sp, poisson_coefficients, {"c": 0.0, "k": kval},
            forcing=forcing, const_outer=co,
        )

    res = {"case": f"outer_timing_{nel}", "nnz": nnz}
    for co, key in ((True, "outer"), (False, "conv")):
        barrier()
        t0 = time.time()
        op, b = asm(jnp.float32(1.0), co)
        barrier()
        res[f"compile_s_{key}"] = round(time.time() - t0, 1)
        t0 = time.time()
        for i in range(3):
            del op, b
            op, b = asm(jnp.float32(1.0 + 1e-6 * i), co)
        barrier()
        t = (time.time() - t0) / 3
        res[f"assembly_s_{key}"] = round(t, 4)
        res[f"assembly_Mnnz_s_{key}"] = round(nnz / t / 1e6, 1)
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(sp.nnodes, 1)),
            jnp.float32,
        )
        # DT as a jit ARGUMENT: closing over the GB-scale planes embeds
        # them as an HLO constant and overflows the remote-compile
        # request (HTTP 413)
        res[f"mv_norm_{key}"] = float(jnp.linalg.norm(
            jax.jit(lambda DT, xx: op.matvec_xb(DT, xx))(
                op.DT, op.pack_vec(x)
            )
        ))
        del op, b
    res["ok"] = bool(
        abs(res["mv_norm_outer"] - res["mv_norm_conv"])
        <= 1e-4 * abs(res["mv_norm_conv"])
    )
    return res


def main():
    out = {"device": str(jax.devices()[0]), "cases": []}
    for fn in (check_sym_dof, check_sym_assembly, check_periodic,
               check_outer_timing):
        t0 = time.time()
        r = fn()
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)
        out["cases"].append(r)
    out["all_ok"] = all(c["ok"] for c in out["cases"])
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/r5_checks.json", "w") as f:
        json.dump(out, f, indent=1)
    print("all_ok:", out["all_ok"])


if __name__ == "__main__":
    main()
