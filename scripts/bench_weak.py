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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.parallel.dist import DistSpace

PER_DEV_NEL = 8  # elements along the split axis per device
BASE = 8  # elements along the other axes


def run(n_dev):
    # grow the slowest axis with the device count: fixed work per device
    nel = (BASE, BASE, PER_DEV_NEL * n_dev)
    sp = make_space(3, p=2, nel=nel, dtype=jnp.float32)
    ds = DistSpace(sp, devices=jax.devices()[:n_dev])

    def asm():
        A, b = ds.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})
        return A, b

    A, b = jax.block_until_ready(asm())
    t0 = time.time()
    A, b = jax.block_until_ready(asm())
    t_asm = time.time() - t0

    def solve():
        return ds.cg(A, b, rtol=1e-6, maxiter=30)

    jax.block_until_ready(solve())
    t0 = time.time()
    res = jax.block_until_ready(solve())
    t_cg = time.time() - t0
    return t_asm, t_cg, ds.pgrid


def main():
    results = {}
    t1 = None
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        t_asm, t_cg, pgrid = run(n)
        if t1 is None:
            t1 = (t_asm, t_cg)
        results[n] = {
            "pgrid": list(pgrid),
            "assembly_s": round(t_asm, 4),
            "cg_s": round(t_cg, 4),
            "asm_eff": round(t1[0] / t_asm, 3),
            "cg_eff": round(t1[1] / t_cg, 3),
        }
    print(json.dumps({"weak_scaling_poisson3d_p2": results}))


if __name__ == "__main__":
    main()
