"""SpMV microbenchmark on real TPU: XLA slot-loop vs the Pallas
flat-layout kernel across layouts (open 64³/128³ p=2 scalar, fully
periodic 64³ — the CahnHilliard layout — and dof=3 p=1 BSR blocks).

Timing uses the in-order-queue barrier + loop-length differencing (see
bench.py docstring — block_until_ready does not block on axon).
Writes artifacts/bench_spmv.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_spmv.py
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
from petiga_tpu.assembly.assemble import assemble_system, stencil_of
from petiga_tpu.sparse.stencil import StencilMatrix
from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator

_tiny = jax.jit(lambda x: jnp.sum(x))


def barrier():
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def time_matvec(mv, data, nnodes, dof, n_lo=5, n_hi=55):
    def loop_fn(n):
        @jax.jit
        def loop(data, x):
            def body(i, x):
                y = mv(data, x)
                return y / jnp.sqrt(jnp.vdot(y, y))
            y = jax.lax.fori_loop(0, n, body, x)
            return jnp.vdot(y, y)
        return loop

    x = jnp.ones((nnodes, dof), jnp.float32)
    lo, hi = loop_fn(n_lo), loop_fn(n_hi)
    float(lo(data, x)); float(hi(data, x))
    barrier()
    t0 = time.time(); float(lo(data, x)); t_lo = time.time() - t0
    t0 = time.time(); float(hi(data, x)); t_hi = time.time() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def run_case(name, axes, dof, form):
    sp = Space(axes, dof=dof, dtype=jnp.float32)
    st = stencil_of(sp)

    def asm():
        A, b = assemble_system(sp, form, apply_fix=False, chunk=32768)
        return A.data

    A = StencilMatrix(st, asm())
    op = PallasStencilOperator(A)
    assert op.ok, name
    t_xla = time_matvec(lambda d, x: StencilMatrix(st, d).matvec(x), A.data,
                        st.nnodes, dof)
    t_pal = time_matvec(op.matvec_packed, op.DT, st.nnodes, dof)
    stream = st.nnodes * st.K * dof * dof * 4
    # Pallas periodic packing streams the extended grid
    stream_pal = op.Mp * 128 * st.K * dof * dof * 4
    sol = stream / 819e9
    out = {
        "case": name,
        "t_xla_us": round(t_xla * 1e6, 1),
        "t_pallas_us": round(t_pal * 1e6, 1),
        "xla_roofline": round(sol / t_xla, 3),
        "pallas_roofline": round(sol / t_pal, 3),
        "pallas_roofline_incl_halo_pad": round(stream_pal / 819e9 / t_pal, 3),
        "pallas_gflops": round(
            2 * st.nnodes * st.K * dof * dof / t_pal / 1e9, 1
        ),
        "speedup": round(t_xla / t_pal, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def mass_stiff(pt, ctx):
    return (
        jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T,
        pt.shape0 * 1.0,
    )


def block_form(pt, ctx):
    K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
    C = jnp.asarray(
        [[2.0 + a + 0.3 * b for b in range(3)] for a in range(3)],
        jnp.float32,
    )
    return jnp.einsum("ij,ab->iajb", K, C), jnp.zeros((pt.nen, 3), jnp.float32)


def main():
    cases = [
        ("open_p2_64", [Axis.uniform(p=2, nel=64)] * 3, 1, mass_stiff),
        ("open_p2_128", [Axis.uniform(p=2, nel=128)] * 3, 1, mass_stiff),
        ("periodic_p2_64",
         [Axis.uniform(p=2, nel=64, periodic=True)] * 3, 1, mass_stiff),
        ("dof3_p1_64", [Axis.uniform(p=1, nel=64)] * 3, 3, block_form),
    ]
    out = {"device": str(jax.devices()[0]), "cases": []}
    for name, axes, dof, form in cases:
        out["cases"].append(run_case(name, axes, dof, form))
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bench_spmv.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
