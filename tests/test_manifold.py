"""dim != nsd manifolds: Laplace-Beltrami on a tilted plane matches the
flat 2-D solve; Kirchhoff plate matches the classical clamped-plate
deflection coefficient (ClassicalShell.c capability)."""

import numpy as np
import jax.numpy as jnp

from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.solve.krylov import cg, jacobi_preconditioner
from petiga_tpu.models.shell import (
    clamp_plate,
    kl_shell_system,
    laplace_beltrami_system,
    make_plate_space,
)

F64 = jnp.float64


def test_laplace_beltrami_tilted_plane():
    """On a rigidly rotated plane the surface Laplacian equals the 2-D
    Laplacian: solutions must agree exactly."""
    import jax

    def forcing(x):
        # pull parameters back: on the tilted plane the parametric coords
        # are the in-plane coords, so drive with a function of u via x of
        # the untilted plate — use a constant source for exactness
        return 1.0

    sols = []
    for tilt in (None, 0.7):
        sp = make_plate_space(nel=12, p=2, tilt=tilt)
        for d in range(2):
            for s in range(2):
                sp.set_boundary_value(d, s, 0, 0.0)
        A, b = assemble_system(
            sp, laplace_beltrami_system, {"forcing": forcing}
        )
        res = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-12)
        sols.append(np.asarray(res.x))
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-10)
    assert sols[0].max() > 0.05  # nontrivial solution


def test_kirchhoff_plate_clamped_deflection():
    """Clamped square plate, uniform load: w_max = 0.00126 q a^4 / D."""
    sp = make_plate_space(nel=16, p=3)
    clamp_plate(sp)
    D = 1.0
    A, b = assemble_system(sp, kl_shell_system, {"D": D, "load": 1.0})
    res = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-12, maxiter=20000)
    w = np.asarray(res.x)
    wmax = w.max()
    np.testing.assert_allclose(wmax, 0.00126, rtol=0.03)
