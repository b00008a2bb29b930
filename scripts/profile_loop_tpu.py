#!/usr/bin/env python
"""Isolate (a) the while_loop-vs-fori_loop CG cost gap and (b) the true
assembly runtime once ctx scalars are jit arguments (not embedded
constants forcing a recompile per call).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_loop_tpu.py
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
CHUNK = 32768

_tiny = None


def barrier():
    global _tiny
    if _tiny is None:
        _tiny = jax.jit(lambda x: jnp.sum(x))
    return float(_tiny(jnp.ones((2, 2), jnp.float32)))


def main():
    from petiga_tpu.models.poisson import make_space, poisson_system_q
    from petiga_tpu.assembly.assemble import assemble_system_planes

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)

    def report(name, seconds, **kw):
        out = {"which": name, "seconds": round(float(seconds), 4)}
        out.update(kw)
        print(json.dumps(out), flush=True)

    # ---- assembly with ctx as DEVICE scalars (one executable, reused)
    def asm(kval):
        # c stays a static Python float (forms branch on c == 0); k is a
        # device scalar so repeated assemblies reuse ONE executable
        # instead of recompiling per constant value.
        op, b = assemble_system_planes(
            sp, poisson_system_q, {"c": 0.0, "k": kval}, chunk=CHUNK,
        )
        return op, b

    t0 = time.time()
    op, b = asm(jnp.float32(1.0))
    barrier()
    report("assembly_first(compile+run)", time.time() - t0)
    for i in range(3):
        barrier()
        t0 = time.time()
        op, b = asm(jnp.float32(1.0 + 1e-6 * (i + 1)))
        barrier()
        report(f"assembly_repeat{i}", time.time() - t0)

    DT = op.DT
    dinv = op.packed_diag_inv()
    bb0 = op.pack_vec(b)
    NIT = 45

    def cg_step(state):
        x, r, z, p, rz = state
        Ap = op.matvec_xb(DT_g[0], p)
        alpha = rz / jnp.vdot(p.reshape(-1), Ap.reshape(-1))
        x = x + alpha * p
        r = r - alpha * Ap
        z = r * dinv_g[0]
        rz_new = jnp.vdot(r.reshape(-1), z.reshape(-1))
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new)

    DT_g = [None]
    dinv_g = [None]

    def init(bb):
        x = jnp.zeros_like(bb)
        r = bb
        z = r * dinv_g[0]
        return (x, r, z, z, jnp.vdot(r.reshape(-1), z.reshape(-1)))

    @jax.jit
    def solve_fori(DT, dinv, bb):
        DT_g[0] = DT
        dinv_g[0] = dinv

        def body(i, st):
            return cg_step(st)

        st = jax.lax.fori_loop(0, NIT, body, init(bb))
        r = st[1]
        return jnp.vdot(r.reshape(-1), r.reshape(-1))

    @jax.jit
    def solve_while_counter(DT, dinv, bb):
        DT_g[0] = DT
        dinv_g[0] = dinv

        def cond(st):
            return st[-1] < NIT

        def body(st):
            return cg_step(st[:-1]) + (st[-1] + 1,)

        st = jax.lax.while_loop(cond, body, init(bb) + (0,))
        r = st[1]
        return jnp.vdot(r.reshape(-1), r.reshape(-1))

    @jax.jit
    def solve_while_res(DT, dinv, bb):
        DT_g[0] = DT
        dinv_g[0] = dinv
        tol2 = jnp.float32(1e-12) * jnp.vdot(bb.reshape(-1), bb.reshape(-1))

        def cond(st):
            r = st[1]
            return (jnp.vdot(r.reshape(-1), r.reshape(-1)) > tol2) & (
                st[-1] < NIT
            )

        def body(st):
            return cg_step(st[:-1]) + (st[-1] + 1,)

        st = jax.lax.while_loop(cond, body, init(bb) + (0,))
        r = st[1]
        return jnp.vdot(r.reshape(-1), r.reshape(-1))

    for name, fn in [
        ("cg_fori45", solve_fori),
        ("cg_while_counter45", solve_while_counter),
        ("cg_while_rescheck45", solve_while_res),
    ]:
        float(fn(DT, dinv, bb0))  # compile
        barrier()
        t0 = time.time()
        float(fn(DT, dinv, bb0))
        barrier()
        t = time.time() - t0
        report(name, t, ms_per_iter=round(1e3 * t / NIT, 2))


if __name__ == "__main__":
    main()
