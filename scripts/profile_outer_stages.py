#!/usr/bin/env python
"""Stage profile of the constant-coefficient (outer-product) assembly
at 128³: planes-only vs +forcing vs +postfix (barrier methodology)."""

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


def main(NEL=128):
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.assembly.convform import (
        assemble_coefficient_planes, poisson_coefficients,
    )

    sp = make_space(3, p=2, nel=NEL, dtype=jnp.float32)

    def forcing(x, ctx):
        return 3 * jnp.pi**2 * jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    out = {"nel": NEL}
    cases = [
        ("planes_only", dict(forcing=None, apply_fix=False)),
        ("planes_fix", dict(forcing=None, apply_fix=True)),
        ("planes_forcing", dict(forcing=forcing, apply_fix=False)),
        ("full", dict(forcing=forcing, apply_fix=True)),
    ]
    for name, kw in cases:
        def asm(kval):
            return assemble_coefficient_planes(
                sp, poisson_coefficients, {"c": 0.0, "k": kval}, **kw
            )

        op, b = asm(jnp.float32(1.0))
        barrier()
        t0 = time.time()
        for i in range(3):
            del op, b
            op, b = asm(jnp.float32(1.0 + 1e-6 * i))
        barrier()
        out[name + "_s"] = round((time.time() - t0) / 3, 4)
        del op, b
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
