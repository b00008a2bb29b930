#!/usr/bin/env python
"""Stage profile of the conv assembly at one mesh size: W eval alone,
conv alone, accumulate-add alone, shell alone (barrier methodology)."""

import json
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


def timeit(fn, *args, reps=5):
    fn(*args)
    barrier()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    barrier()
    return (time.time() - t0) / reps, out


def main(NEL=64):
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.assembly import convform as cf

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)
    dt = jnp.float32
    dim = 3
    chlist = [(1, 1), (2, 2), (3, 3)]
    runs0 = [cf._axis_interior_run(sp.tabs[d])[0] for d in range(3)]
    ker = cf._conv_kernel(sp, chlist, dt, tuple(runs0))
    dn = cf._dimension_numbers(dim)
    p = sp.degrees
    pad = [(p[d], p[d]) for d in range(dim)][::-1]
    runs = [cf._axis_interior_run(sp.tabs[d]) for d in range(dim)]
    lo = [r[0] for r in runs]
    hi = [r[1] for r in runs]
    int_ext = tuple(hi[d] - lo[d] for d in range(dim))
    axis_w = tuple(
        jnp.asarray(sp.tabs[d].weight * sp.tabs[d].detJac[:, None], dt)
        for d in range(dim)
    )
    axis_x = tuple(jnp.asarray(sp.tabs[d].point, dt) for d in range(dim))
    out = {"mesh": f"{NEL}^3", "int_ext": int_ext, "ker_shape": list(ker.shape)}

    @jax.jit
    def eval_W(k, axis_w, axis_x):
        wdet, xs = cf._box_1d_tables(axis_w, axis_x, lo, int_ext)
        wq, X = cf._box_wq_x(sp, wdet, xs)
        W = jnp.stack([wq * k, wq * k, wq * k], axis=dim)
        return W.reshape(tuple(int_ext[::-1]) + (-1,))

    t_w, W = timeit(eval_W, jnp.float32(1.0), axis_w, axis_x)
    out["W_eval_s"] = round(t_w, 4)
    out["W_shape"] = list(W.shape)

    @jax.jit
    def conv(W):
        return jax.lax.conv_general_dilated(
            W[None], ker, (1,) * dim, pad, dimension_numbers=dn,
            preferred_element_type=dt,
        )[0]

    t_c, O = timeit(conv, W)
    out["conv_s"] = round(t_c, 4)
    Eint = int(np.prod(int_ext))
    out["conv_tflops_s"] = round(
        2 * Eint * 27 * ker.shape[-2] * 125 / t_c / 1e12, 2
    )

    # conv as 27 shifted GEMMs: tap-sum formulation
    K2 = np.asarray(ker)  # (3,3,3, C, 125)

    @jax.jit
    def tapsum(W):
        kj = jnp.asarray(K2.reshape(27, K2.shape[-2], 125))
        Wf = W.reshape(-1, W.shape[-1])
        acc = jnp.zeros(
            (int_ext[2] + 2, int_ext[1] + 2, int_ext[0] + 2, 125), dt
        )
        i = 0
        for tz in range(3):
            for ty in range(3):
                for tx in range(3):
                    o = jnp.dot(W.reshape(-1, W.shape[-1]), kj[i],
                                preferred_element_type=dt)
                    o = o.reshape(int_ext[::-1] + (125,))
                    acc = jax.lax.dynamic_update_slice(
                        acc,
                        jax.lax.dynamic_slice(
                            acc, (2 - tz, 2 - ty, 2 - tx, 0),
                            int_ext[::-1] + (125,),
                        ) + o,
                        (2 - tz, 2 - ty, 2 - tx, 0),
                    )
                    i += 1
        return acc

    t_t, O2 = timeit(tapsum, W)
    out["tapsum_s"] = round(t_t, 4)
    d = float(jnp.max(jnp.abs(O2 - O)))
    out["tapsum_maxdiff"] = d
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
