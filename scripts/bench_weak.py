#!/usr/bin/env python
"""Weak-scaling of distributed assembly + halo-CG on a virtual device
mesh (BASELINE.json target: >=80% weak-scaling efficiency).

Runs 3D Poisson p=2 with a fixed per-device element box while growing
the device count 1 -> 2 -> 4 -> 8, and reports assembly and CG-solve
efficiency relative to one device.  On this machine multi-chip hardware
is unavailable, so the mesh is 8 virtual CPU devices
(``--xla_force_host_platform_device_count``) — the same shard_map /
ppermute program that runs on a real slice; run unchanged on a v5e-8
for ICI numbers.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_weak.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    _n = os.environ.get("WEAK_NDEV", "8")
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_n}"
    ).strip()

import jax

# the axon sitecustomize force-registers the remote TPU backend and
# overrides JAX_PLATFORMS; the virtual mesh must be local CPU
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

# honest mode: N_DEV=2 on a 2-core host gives one physical core per
# device — the only configuration here where per-device times measure
# parallel efficiency rather than time-sharing (VERDICT r3 item 10)
N_DEV_ENV = int(os.environ.get("WEAK_NDEV", "0"))

from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.parallel.dist import DistSpace

PER_DEV_NEL = int(os.environ.get("WEAK_PERDEV", "8"))  # split-axis elements per device
BASE = int(os.environ.get("WEAK_BASE", "8"))  # elements along the other axes


def run(n_dev):
    # grow the slowest axis with the device count: fixed work per device
    nel = (BASE, BASE, PER_DEV_NEL * n_dev)
    sp = make_space(3, p=2, nel=nel, dtype=jnp.float32)
    ds = DistSpace(sp, devices=jax.devices()[:n_dev])

    # jit once so repeat calls reuse ONE executable: a fresh trace per
    # call times the compiler, not the device (r03's mistake)
    asm = jax.jit(
        lambda: ds.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})
    )
    A, b = jax.block_until_ready(asm())
    t0 = time.time()
    A, b = jax.block_until_ready(asm())
    t_asm = time.time() - t0

    def solve():
        return ds.cg(A, b, rtol=1e-6, maxiter=30)

    jax.block_until_ready(solve())  # compile (ds caches the program)
    t0 = time.time()
    res = jax.block_until_ready(solve())
    t_cg = time.time() - t0
    cg_iters = int(res[1])

    # overlapped vs non-overlapped halo matvec (30 applications each)
    def mv_loop(overlap):
        def body(data_loc, x_loc):
            dof = sp.dof
            dl = data_loc.reshape(tuple(ds.L[::-1]) + (ds.st.K, dof, dof))
            xl = x_loc.reshape(tuple(ds.L[::-1]) + (dof,))

            def step(i, v):
                y = ds.matvec_local(dl, v, overlap=overlap)
                return y / jnp.sqrt(jax.lax.psum(jnp.sum(y * y),
                                                 tuple(ds.names)))

            return jax.lax.fori_loop(0, 30, step, xl)

        return jax.jit(jax.shard_map(
            body, mesh=ds.mesh,
            in_specs=(ds.grid_spec(3), ds.grid_spec(1)),
            out_specs=ds.grid_spec(1), check_vma=False,
        ))

    x0 = ds.pad_grid(jnp.ones((sp.nnodes, sp.dof), sp.dtype))
    t_mv = {}
    for ov in (True, False):
        f = mv_loop(ov)
        jax.block_until_ready(f(A, x0))
        t0 = time.time()
        jax.block_until_ready(f(A, x0))
        t_mv[ov] = time.time() - t0
    return t_asm, t_cg, cg_iters, t_mv, ds.pgrid


def main():
    results = {}
    t1 = None
    counts = (1, 2) if N_DEV_ENV == 2 else (1, 2, 4, 8)
    for n in counts:
        if n > len(jax.devices()):
            break
        t_asm, t_cg, cg_iters, t_mv, pgrid = run(n)
        # per-ITERATION efficiency: weak-scaled problems converge in
        # different CG iteration counts (conditioning grows with the
        # refined axis), so total-time "efficiency" conflates algorithm
        # and machine — r4's cg_eff 0.162 was mostly iteration growth
        # against the maxiter=30 cap plus CPU-collective latency
        t_it = t_cg / max(cg_iters, 1)
        if t1 is None:
            t1 = (t_asm, t_cg, t_it)
        results[n] = {
            "pgrid": list(pgrid),
            "assembly_s": round(t_asm, 4),
            "cg_s": round(t_cg, 4),
            "cg_iters": cg_iters,
            "cg_ms_per_iter": round(1e3 * t_it, 3),
            "asm_eff": round(t1[0] / t_asm, 3),
            "cg_eff": round(t1[1] / t_cg, 3),
            "cg_iter_eff": round(t1[2] / t_it, 3),
            "matvec30_overlap_s": round(t_mv[True], 4),
            "matvec30_noverlap_s": round(t_mv[False], 4),
        }
    out = {
        "weak_scaling_poisson3d_p2": results,
        "machine": {
            "backend": jax.default_backend(),
            "physical_cpus": os.cpu_count(),
            "note": (
                "8 VIRTUAL devices on this host's physical cores — with "
                "fewer cores than devices the per-device times measure "
                "time-sharing contention, not parallel efficiency; the "
                "numbers bound program overhead structure only.  Run "
                "unchanged on a real v5e-8 for ICI efficiencies."
            ),
        },
    }
    if N_DEV_ENV == 2:
        out["machine"]["note"] = (
            "2 virtual devices on 2 physical cores (one core per "
            "device): the defensible 1->2 weak-scaling point on this "
            "host; larger counts time-share and are reported separately."
        )
    print(json.dumps(out))
    os.makedirs("artifacts", exist_ok=True)
    path = "artifacts/bench_weak.json"
    doc = {}
    if os.path.exists(path):
        try:
            doc = json.load(open(path))
        except Exception:
            doc = {}
    key = "2dev_one_core_each" if N_DEV_ENV == 2 else "8dev_timeshared"
    doc[key] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
