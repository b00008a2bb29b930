#!/usr/bin/env python
"""Cahn–Hilliard conv-α hardware witness (VERDICT r4 item 3).

The reference's flagship transient demo is periodic C¹ with Hessian
terms (/root/reference/demo/CahnHilliard3D.c:55-112) — exactly the
class the round-4 conv engine excluded.  Round 5 extended the engine
with periodic axes, order-2 channels, and state-field coefficients;
``models/cahnhilliard.py run_conv`` assembles the generalized-α
Jacobian on the MXU conv path each Newton iteration.  This script runs
it on hardware (default 64³ periodic C¹ p=2) and records per-step /
per-Newton wall plus the conv-Jacobian assembly rate, appending to
artifacts/r5_checks.json.
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


def main(NEL=64, dim=3, nsteps=3):
    from petiga_tpu.models.cahnhilliard import (
        initial_condition,
        make_space,
        run_conv,
    )

    t_all = time.time()
    sp = make_space(dim=dim, nel=NEL, dtype=jnp.float32)
    U0 = initial_condition(sp, seed=0)

    # first step compiles every program (residual, conv Jacobian,
    # BiCGStab); steps 2..n reuse the cached executables
    barrier()
    t0 = time.time()
    U1, log1 = run_conv(sp, U0, dt=1e-9, nsteps=1, rtol_newton=5e-3,
                        max_newton=4, chunk=32768)
    barrier()
    t_first = time.time() - t0

    # warm 1-step run: init (Rsp/Mop/V0 solve) + one step; the n-step
    # delta isolates the true per-step cost
    t0 = time.time()
    run_conv(sp, U0, dt=1e-9, nsteps=1, rtol_newton=5e-3,
             max_newton=4, chunk=32768)
    barrier()
    t_one = time.time() - t0

    cnt = {}
    t0 = time.time()
    Un, logn = run_conv(sp, U0, dt=1e-9, nsteps=nsteps,
                        rtol_newton=5e-3, max_newton=4, counters=cnt,
                        chunk=32768)
    barrier()
    t_n = time.time() - t0
    t_steps = t_n - t_one  # (nsteps-1) marginal steps

    newton_total = int(sum(cnt["newton_iters"]))
    fnorm_final = float(cnt["fnorm"][-1])
    nnz = 1
    for N, p in zip(sp.node_shape, sp.degrees):
        i = np.arange(N)
        # periodic: every row has the full (2p+1) band
        nnz *= N * (2 * p + 1)
    out = {
        "case": f"ch_conv_alpha_{dim}d_{NEL}",
        "mesh": f"{NEL}^{dim} periodic C1 p2",
        "dt": 1e-9,
        "rtol_newton": "5e-3 (f32 residual-cancellation floor ~2e-3 rel)",
        "nsteps": nsteps,
        "newton_iters_total": newton_total,
        "first_step_s": round(t_first, 2),
        "warm_1step_s": round(t_one, 3),
        "warm_nstep_s": round(t_n, 3),
        "s_per_step": round(t_steps / (nsteps - 1), 3),
        "s_per_newton": round(
            t_steps / max(newton_total * (nsteps - 1) / nsteps, 1), 3),
        "fnorm_final": fnorm_final,
        "jacobian_nnz": nnz,
        "jacobian_Mnnz_s_per_newton": round(
            nnz / max(t_steps / (nsteps - 1), 1e-9) / 1e6, 1
        ),
        "ok": bool(np.isfinite(fnorm_final)),
    }

    path = "/root/repo/artifacts/r5_checks.json"
    doc = json.load(open(path)) if os.path.exists(path) else {"cases": []}
    doc["cases"] = [
        c for c in doc.get("cases", []) if c.get("case") != out["case"]
    ] + [out]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    print(f"total wall {time.time() - t_all:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    NEL = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(NEL, dim)
