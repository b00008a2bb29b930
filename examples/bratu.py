#!/usr/bin/env python
"""Bratu — nonlinear Newton-Krylov solve (reference demo/Bratu.c).

    python examples/bratu.py --dim 2 -p 2 -N 16 --lam 6.8 [--hand-jacobian]

Solves -Δu = λ e^u with homogeneous Dirichlet BCs; the Jacobian comes
from forward-mode AD of the residual by default (the reference offers
hand-written / FD / Fortran variants — ``--hand-jacobian`` uses the
hand-written one, and the test suite asserts all agree).
"""

import sys

from petiga_tpu.config import Options, bind_cli, print_info


def main(argv=None):
    opts, ns = bind_cli(
        argv,
        defaults=Options(dtype="float64"),  # Newton to 1e-8 needs f64
        extra=[("lam", float, 6.80, "Bratu parameter λ"),
               ("hand-jacobian", int, 0, "use the hand-written Jacobian")],
    )
    space = opts.build_space()
    for d in range(space.dim):
        for s in range(2):
            space.set_boundary_value(d, s, 0, 0.0)
    print_info(space)

    from petiga_tpu.models.bratu import solve_bratu

    res = solve_bratu(space, lam=ns.lam,
                      use_ad=not getattr(ns, "hand_jacobian"))
    print(f"newton iters={int(res.iters)} |F|={float(res.fnorm):.3e} "
          f"converged={bool(res.converged)} max(u)={float(res.U.max()):.6f}")
    return 0 if bool(res.converged) else 1


if __name__ == "__main__":
    sys.exit(main())
