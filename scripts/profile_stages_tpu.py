#!/usr/bin/env python
"""Stage-by-stage decomposition of the 128^3 p=2 assembly cost.

All ctx values enter as device scalars (one executable per stage,
reused), so these are RUN times, not compiles.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stages_tpu.py
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
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def main():
    from petiga_tpu.models.poisson import make_space, poisson_system_q
    from petiga_tpu.assembly.assemble import (
        _chunks,
        _make_element_KF,
        assemble_system_planes,
    )
    from petiga_tpu.assembly.tabulation import tabulate_elements
    from petiga_tpu.assembly import fastpath

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)

    def report(name, seconds, **kw):
        out = {"which": name, "seconds": round(float(seconds), 4),
               "chunk": CHUNK}
        out.update(kw)
        print(json.dumps(out), flush=True)

    def timeit(name, fn, reps=2, **kw):
        fn(jnp.float32(1.0))  # compile
        barrier()
        t0 = time.time()
        for i in range(reps):
            fn(jnp.float32(1.0 + 1e-6 * i))
        barrier()
        report(name, (time.time() - t0) / reps, **kw)

    chunk_sz = fastpath.slab_chunk(sp, CHUNK)
    ids, valid = _chunks(sp, chunk_sz)
    nchunks = ids.shape[0]

    # 1. tabulation only (order=None -> space.order=2, and order=1)
    for order in (None, 1):
        def tab_only(k, order=order):
            def body(acc, xs):
                ids_c, _ = xs
                pb = tabulate_elements(sp, ids_c, order=order)
                s = jnp.sum(pb.shape[0]) + jnp.sum(pb.shape[1]) + jnp.sum(
                    pb.weight) * k
                return acc + s, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (ids, valid))
            return float(acc)

        timeit(f"tabulate_order{order}", tab_only)

    # 2. tabulation + qbatched form (no fix, no accumulate)
    def tab_form(k):
        kf = _make_element_KF(sp, {"c": 0.0, "k": k}, None, False)

        def body(acc, xs):
            ids_c, valid_c = xs
            Ke, Fe, _ = kf(ids_c, valid_c, None, poisson_system_q)
            return acc + jnp.sum(Ke) + jnp.sum(Fe), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (ids, valid))
        return float(acc)

    timeit("tab_form", tab_form)

    # 3. + Dirichlet fix
    def tab_form_fix(k):
        kf = _make_element_KF(sp, {"c": 0.0, "k": k}, None, True)

        def body(acc, xs):
            ids_c, valid_c = xs
            Ke, Fe, _ = kf(ids_c, valid_c, None, poisson_system_q)
            return acc + jnp.sum(Ke) + jnp.sum(Fe), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (ids, valid))
        return float(acc)

    timeit("tab_form_fix", tab_form_fix)

    # 4. accumulate only (random Ke, no tabulation/form)
    B = chunk_sz
    align = None
    from petiga_tpu.sparse.pallas_spmv import alignment_pads
    from petiga_tpu.assembly.assemble import stencil_of

    st = stencil_of(sp)
    align = alignment_pads(st)
    Ne = tuple(N + a for N, a in zip(sp.node_shape, align))
    sbox_rev = tuple(2 * p + 1 for p in sp.degrees)[::-1]
    Ke0 = jnp.ones((B, sp.nen, sp.nen, 1, 1), jnp.float32)
    kz = chunk_sz // int(np.prod(sp.elem_shape[:-1]))

    def acc_only(k):
        P = jnp.zeros((st.K,) + tuple(Ne[::-1]), jnp.float32)

        def body(P, c):
            return fastpath.accumulate_matrix_dyn_planes(
                sp, P, Ke0 * k, c * kz, align
            ), None

        P, _ = jax.lax.scan(body, P, jnp.arange(nchunks, dtype=jnp.int32))
        return float(P[62, 0, 0, 0])

    timeit("accumulate_planes_only", acc_only)

    # 5. full plane assembly, order=1 (the form only needs gradients)
    def full_o1(k):
        op, b = assemble_system_planes(
            sp, poisson_system_q, {"c": 0.0, "k": k}, chunk=CHUNK, order=1
        )
        return b

    timeit("planes_full_order1", full_o1)


if __name__ == "__main__":
    main()
