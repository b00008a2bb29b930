#!/usr/bin/env python
"""Hardware validation + timing of the symmetric mirrored-slot kernel:
matvec parity vs full storage, packed-CG solve parity, and the SpMV
time ratio (the sym kernel streams HALF the planes, so < 1.0 means the
storage halving also pays at solve time).  Appends to
artifacts/pallas_tpu_check.json."""

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

_t = None


def barrier():
    global _t
    if _t is None:
        _t = jax.jit(lambda x: jnp.sum(x))
    return float(_t(jnp.ones((2, 2), jnp.float32)))


def main(NEL=128):
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes, poisson_coefficients)
    from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator
    from petiga_tpu.sparse.stencil import StencilMatrix, SymmetricStencilMatrix
    from petiga_tpu.assembly.assemble import stencil_of

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)
    st = stencil_of(sp)
    op, b = assemble_coefficient_planes(
        sp, poisson_coefficients, {"c": 0.0, "k": jnp.float32(1.0)},
    )
    # symmetric storage from the packed planes: unpack node-major
    data = jnp.stack(
        [op.DT[s].reshape(-1)[: op.next] for s in range(st.K)], axis=1
    )
    # crop alignment pads back to the node grid
    Ne = op.Ne
    dg = data.reshape(tuple(Ne[::-1]) + (st.K,))
    sl = tuple(slice(0, st.node_shape[st.dim - 1 - g]) for g in range(st.dim))
    data = dg[sl].reshape(st.nnodes, st.K, 1, 1)
    A = StencilMatrix(st, data)
    S = SymmetricStencilMatrix.from_full(A)
    ops = PallasStencilOperator.from_symmetric(S)
    out = {"case": f"sym_kernel_{NEL}", "rows": ops.rows,
           "planes_full": st.K, "planes_sym": S.Ku}

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(sp.nnodes, 1)), jnp.float32)
    y1 = op.matvec(x)
    y2 = ops.matvec(x)
    d = float(jnp.max(jnp.abs(y1 - y2)))
    m = float(jnp.max(jnp.abs(y1)))
    out["matvec_reldiff"] = d / m
    out["ok"] = d / m < 1e-5

    def loop(oper, DT, n):
        @jax.jit
        def run(DT, xb):
            def body(i, v):
                y = oper.matvec_xb(DT, v)
                return y / jnp.sqrt(jnp.vdot(y, y))
            return jnp.vdot(jax.lax.fori_loop(0, n, body, xb), xb)
        return run

    for name, oper in (("full", op), ("sym", ops)):
        xb = oper.pack_vec(x)
        lo, hi = loop(oper, oper.DT, 5), loop(oper, oper.DT, 55)
        float(lo(oper.DT, xb)); float(hi(oper.DT, xb))
        barrier(); t0 = time.time(); float(lo(oper.DT, xb)); tl = time.time() - t0
        t0 = time.time(); float(hi(oper.DT, xb)); th = time.time() - t0
        out[f"spmv_{name}_us"] = round((th - tl) / 50 * 1e6, 1)
    out["sym_over_full"] = round(
        out["spmv_sym_us"] / out["spmv_full_us"], 3)

    path = "/root/repo/artifacts/pallas_tpu_check.json"
    doc = json.load(open(path)) if os.path.exists(path) else {"cases": []}
    doc["cases"] = [c for c in doc.get("cases", [])
                    if c.get("case") != out["case"]] + [out]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
