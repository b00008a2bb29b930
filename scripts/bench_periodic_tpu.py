#!/usr/bin/env python
"""Periodic 128³ p=2 assembly rate on hardware (VERDICT r4 item 3:
'periodic 128³ p=2 mass+diffusion assembly >= 400 Mnnz/s in an
artifact') plus the Bratu conv-Jacobian rate (item 7: 'a Bratu or
CahnHilliard Jacobian assembly >= 400 Mnnz/s recorded').

Appends results to artifacts/pallas_tpu_check.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_periodic_tpu.py
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


def nnz_of(sp):
    nnz = 1
    for N, p, per in zip(sp.node_shape, sp.degrees, sp.periodic):
        if per:
            nnz *= N * min(2 * p + 1, N)
        else:
            i = np.arange(N)
            nnz *= int(np.sum(
                np.minimum(i + p, N - 1) - np.maximum(i - p, 0) + 1
            ))
    return nnz


def bench_periodic(NEL=128):
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space
    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes, poisson_coefficients,
    )

    sp = Space(
        [Axis.uniform(p=2, nel=NEL, periodic=True) for _ in range(3)],
        dtype=jnp.float32,
    )
    nnz = nnz_of(sp)
    out = {"case": f"periodic_assembly_{NEL}", "nnz": nnz}
    for co, key in ((True, "outer"), (False, "conv")):
        def asm(kval):
            return assemble_coefficient_planes(
                sp, poisson_coefficients, {"c": 1.0, "k": kval},
                apply_fix=False, const_outer=co,
            )

        barrier()
        t0 = time.time()
        op, b = asm(jnp.float32(1.0))
        barrier()
        out[f"compile_s_{key}"] = round(time.time() - t0, 1)
        t0 = time.time()
        for i in range(3):
            del op, b
            op, b = asm(jnp.float32(1.0 + 1e-6 * i))
        barrier()
        t = (time.time() - t0) / 3
        out[f"assembly_s_{key}"] = round(t, 4)
        out[f"assembly_Mnnz_s_{key}"] = round(nnz / t / 1e6, 1)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(sp.nnodes, 1)),
            jnp.float32,
        )
        out[f"mv_norm_{key}"] = float(jnp.linalg.norm(
            jax.jit(lambda DT, xx: op.matvec_xb(DT, xx))(
                op.DT, op.pack_vec(x))
        ))
        del op, b
    out["ok"] = bool(
        abs(out["mv_norm_outer"] - out["mv_norm_conv"])
        <= 1e-4 * abs(out["mv_norm_conv"])
        and out["assembly_Mnnz_s_outer"] >= 400.0
    )
    return out


def bench_bratu_jacobian(NEL=128):
    from petiga_tpu.models.bratu import (
        bratu_jacobian_coefficients, make_space,
    )
    from petiga_tpu.assembly.convform import assemble_coefficient_planes

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)
    nnz = nnz_of(sp)
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.normal(scale=0.05, size=(sp.nnodes,)),
                    jnp.float32)
    lam = jnp.float32(1.2)

    def asm(u):
        return assemble_coefficient_planes(
            sp, bratu_jacobian_coefficients, {"lambda": lam},
            fields={"u": u}, apply_fix=False,
        )

    out = {"case": f"bratu_jacobian_{NEL}", "nnz": nnz}
    barrier()
    t0 = time.time()
    J, _ = asm(U)
    barrier()
    out["compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for i in range(3):
        del J, _
        J, _ = asm(U + jnp.float32(1e-6 * i))
    barrier()
    t = (time.time() - t0) / 3
    out["assembly_s"] = round(t, 4)
    out["assembly_Mnnz_s"] = round(nnz / t / 1e6, 1)
    out["ok"] = bool(out["assembly_Mnnz_s"] >= 400.0)
    return out


def main():
    path = "/root/repo/artifacts/pallas_tpu_check.json"
    doc = json.load(open(path)) if os.path.exists(path) else {"cases": []}
    for fn in (bench_periodic, bench_bratu_jacobian):
        r = fn()
        print(json.dumps(r), flush=True)
        doc["cases"] = [
            c for c in doc.get("cases", []) if c.get("case") != r["case"]
        ] + [r]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
