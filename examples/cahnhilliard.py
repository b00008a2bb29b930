#!/usr/bin/env python
"""Cahn-Hilliard spinodal decomposition (reference demo/CahnHilliard2D.c).

    python examples/cahnhilliard.py --nel 32 --nsteps 20 --adaptive

C1 periodic B-splines, degenerate mobility, generalized-α stepping with
the free-energy/statistics monitor; ``--adaptive`` switches to the
error-controlled controller (the reference runs with
``-ts_adapt_type basic``).  Writes the final concentration field to a
VTK structured grid with ``--vtk out.vts``.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=32)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--cbar", type=float, default=0.63)
    ap.add_argument("--alpha", type=float, default=3000.0)
    ap.add_argument("--theta", type=float, default=1.5)
    ap.add_argument("--dt", type=float, default=1e-11)
    ap.add_argument("--nsteps", type=int, default=5)
    ap.add_argument("--t-end", type=float, default=None,
                    help="with --adaptive: integrate to this time")
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--conv-jacobian", action="store_true",
                    help="conv-assemble the Jacobian each Newton step "
                         "(the large-scale MXU route, run_conv)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vtk", default=None)
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)  # stiff 4th-order: f64
    from petiga_tpu.models import cahnhilliard as ch

    space = ch.make_space(dim=ns.dim, nel=ns.nel)
    U0 = ch.initial_condition(space, cbar=ns.cbar, seed=ns.seed)
    ctx = {"theta": ns.theta, "alpha": ns.alpha, "cbar": ns.cbar}

    if ns.adaptive:
        import jax
        from petiga_tpu.solve.ts import AlphaStepper, integrate_adaptive
        from petiga_tpu.assembly.assemble import compute_scalar

        stepper = AlphaStepper(
            space, ch.residual, rho_inf=0.5, ctx=ctx,
            newton_kw=dict(rtol=1e-6, linear_solver="bicgstab"),
        )
        stats_fn = jax.jit(
            lambda U: compute_scalar(space, ch.free_energy_stats, U, ctx,
                                     order=1)
        )

        def mon(step, t, U):
            s = np.asarray(stats_fn(U))
            print(f"step {step:4d} t={t:.4e} energy={s[0]:.6e}")

        t_end = ns.t_end if ns.t_end is not None else ns.nsteps * ns.dt * 100
        U, _, stats = integrate_adaptive(
            stepper, U0, 0.0, ns.dt, t_end, rtol=1e-3, atol=1e-3,
            monitor=mon,
        )
        print(f"adaptive: {stats.steps} steps, {stats.rejections} "
              f"rejections, final dt={stats.dt_final:.3e}")
    else:
        def mon(step, t, U, s):
            print(f"step {step:4d} t={t:.4e} energy={s[0]:.6e} "
                  f"mass={s[1]:.6e}")

        runner = ch.run_conv if ns.conv_jacobian else ch.run
        U, _ = runner(space, U0, theta=ns.theta, alpha=ns.alpha,
                      cbar=ns.cbar, dt=ns.dt, nsteps=ns.nsteps, monitor=mon)

    if ns.vtk:
        from petiga_tpu.post.sample import sample_grid, write_vts

        coords, vals, shape = sample_grid(space, U)
        write_vts(ns.vtk, coords, shape, point_data={"c": vals})
        print(f"wrote {ns.vtk}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
