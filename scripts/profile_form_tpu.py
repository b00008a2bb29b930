#!/usr/bin/env python
"""Form-contraction layout variants for the q-batched MXU assembly path.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_form_tpu.py
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
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def main():
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.assembly.assemble import (
        _chunks,
        _make_element_KF,
        assemble_system_planes,
    )
    from petiga_tpu.assembly import fastpath

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)

    def report(name, seconds, **kw):
        out = {"which": name, "seconds": round(float(seconds), 4),
               "chunk": CHUNK}
        out.update(kw)
        print(json.dumps(out), flush=True)

    def timeit(name, fn, reps=2, **kw):
        fn(jnp.float32(1.0))
        barrier()
        t0 = time.time()
        for i in range(reps):
            fn(jnp.float32(1.0 + 1e-6 * i))
        barrier()
        report(name, (time.time() - t0) / reps, **kw)

    chunk_sz = fastpath.slab_chunk(sp, CHUNK)
    ids, valid = _chunks(sp, chunk_sz)

    def fq_v1(pt, w, ctx):
        k = ctx["k"]
        f = (k * 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * pt.x), axis=-1)
        N0, N1 = pt.shape0, pt.shape1
        K = k * jnp.einsum("q,qai,qbi->ab", w, N1, N1)
        F = jnp.einsum("q,qa->a", w * f, N0)
        return K, F

    fq_v1.qbatched = True

    def fq_v2(pt, w, ctx):
        k = ctx["k"]
        f = (k * 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * pt.x), axis=-1)
        N0, N1 = pt.shape0, pt.shape1  # (Q, nen), (Q, nen, dim)
        nen = N0.shape[-1]
        A1 = jnp.moveaxis(N1, 1, 0).reshape(nen, -1)  # (nen, Q*dim)
        B1 = jnp.moveaxis(N1 * w[:, None, None], 1, 0).reshape(nen, -1)
        K = k * (B1 @ A1.T)
        F = (w * f) @ N0
        return K, F

    fq_v2.qbatched = True

    def fq_v3(pt, w, ctx):
        # per-direction contraction: three (Q-contraction) matmuls on
        # (Q, nen) operands, no trailing dim-3 layout anywhere
        k = ctx["k"]
        f = (k * 3 * jnp.pi**2) * jnp.prod(jnp.sin(jnp.pi * pt.x), axis=-1)
        N0, N1 = pt.shape0, pt.shape1
        K = None
        for d in range(3):
            Nd = N1[..., d]  # (Q, nen)
            t = (Nd * w[:, None]).T @ Nd
            K = t if K is None else K + t
        F = (w * f) @ N0
        return k * K, F

    fq_v3.qbatched = True

    for name, form in [("v1_einsum", fq_v1), ("v2_matmul", fq_v2),
                       ("v3_perdir", fq_v3)]:
        def tab_form(kv, form=form):
            kf = _make_element_KF(sp, {"k": kv}, None, False)

            def body(acc, xs):
                ids_c, valid_c = xs
                Ke, Fe, _ = kf(ids_c, valid_c, None, form)
                return acc + jnp.sum(Ke) + jnp.sum(Fe), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (ids, valid))
            return float(acc)

        timeit(f"tab_form_{name}", tab_form)

    # full assembly with the best-candidate form at two chunk sizes
    def full(kv, form=fq_v3, ch=CHUNK):
        op, b = assemble_system_planes(sp, form, {"k": kv}, chunk=ch)
        return b

    timeit("planes_full_v3", full)
    timeit("planes_full_v3_c131072",
           lambda kv: full(kv, ch=131072))


if __name__ == "__main__":
    main()
