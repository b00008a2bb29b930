#!/usr/bin/env python
"""Finite-strain hyperelasticity — Newton with AD tangents and
selectable material models (reference demo/HyperElasticity.c:18-21:
Neo-Hookean / St-Venant / Mooney-Rivlin function pointers; here the
material is a first-Piola closure and the consistent tangent is
``jax.jacfwd`` of the residual).

    python examples/hyperelasticity.py --dim 2 -p 2 -N 6 \
        --material neo_hookean --stretch 0.2

Clamps the x=0 face, prescribes a stretch at x=1, and Newton-solves,
ramping the load in ``--steps`` continuation steps.

On this machine: run with PYTHONPATH=/root/repo[:/root/.axon_site for TPU].
"""

import sys

import jax.numpy as jnp

from petiga_tpu.config import bind_cli, print_info


def main(argv=None):
    opts, ns = bind_cli(
        argv,
        extra=[
            ("material", str, "neo_hookean",
             "neo_hookean | st_venant | mooney_rivlin"),
            ("stretch", float, 0.1, "prescribed end displacement"),
            ("lam", float, 1.0, "first Lame parameter"),
            ("mu", float, 1.0, "shear modulus"),
            ("steps", int, 1, "load-continuation steps"),
        ],
    )
    if opts.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)
    from petiga_tpu.models import hyperelasticity as hel

    dim = opts.dim or 2
    p = opts.degree if isinstance(opts.degree, int) else opts.degree[0]
    nel = (opts.elements if isinstance(opts.elements, int)
           else opts.elements[0])
    space = hel.make_space(dim=dim, p=p, nel=nel,
                           dtype=getattr(jnp, opts.dtype),
                           stretch=ns.stretch)
    print_info(space)

    if ns.material == "neo_hookean":
        mat = hel.neo_hookean(ns.lam, ns.mu)
    elif ns.material == "st_venant":
        mat = hel.st_venant(ns.lam, ns.mu)
    elif ns.material == "mooney_rivlin":
        mat = hel.mooney_rivlin(0.5 * ns.mu, 0.1 * ns.mu, ns.lam)
    else:
        raise SystemExit(f"unknown material {ns.material!r}")

    U, res = hel.solve(space, material=mat, rtol=1e-8,
                       continuation=ns.steps)
    umax = float(jnp.abs(U).max())
    print(f"newton iters={int(res.iters)} |F|={float(res.fnorm):.3e} "
          f"max|u|={umax:.4f}")
    return 0 if float(res.fnorm) < 1e-6 else 1


if __name__ == "__main__":
    sys.exit(main())
