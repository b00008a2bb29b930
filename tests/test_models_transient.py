"""PatternFormation (IE split), ElasticRod (alpha2), Navier-Stokes VMS
cavity — capability-parity smoke + physics checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.models import patternformation as pf
from petiga_tpu.models import elasticrod as rod
from petiga_tpu.models import navierstokes as ns

F64 = jnp.float64


def test_patternformation_short():
    sp = pf.make_space(nel=12)
    U0 = pf.initial_condition(sp, seed=3)
    for implicit in (True, False):
        U = pf.run(sp, U0, dt=0.005, nsteps=2, implicit=implicit)
        assert np.isfinite(np.asarray(U)).all()
        # fields evolve but stay bounded
        assert float(jnp.abs(U - U0).max()) > 1e-8
        assert float(jnp.abs(U).max()) < 10.0


def test_elasticrod_energy_behavior():
    """Rod wave: displacement oscillates; α2 with ρ∞=0.5 damps high
    frequencies but total displacement norm stays bounded."""
    sp = rod.make_space(nel=64)
    U, V, A = rod.run(sp, dt=0.01, nsteps=20)
    u = np.asarray(U).ravel()
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 1.5
    # boundary conditions hold
    np.testing.assert_allclose(u[0], 0, atol=1e-12)
    np.testing.assert_allclose(u[-1], 0, atol=1e-12)
    # the pluck has radiated: center value decreased
    assert abs(u[len(u) // 2]) < 1.0


def test_cavity_vms():
    sp = ns.make_cavity_space(nel=8, p=2)
    U, res = ns.solve_cavity(sp, nu=0.5, rtol=1e-5, maxit=25)
    assert np.isfinite(np.asarray(U)).all()
    Ug = np.asarray(U).reshape(*sp.node_shape[::-1], 3)
    # lid velocity enforced; no-slip at the bottom
    np.testing.assert_allclose(Ug[-1, 1:-1, 0], 0.5 * 0 + 1.0, atol=1e-10)
    np.testing.assert_allclose(Ug[0, :, 0], 0.0, atol=1e-10)
    # interior recirculation: some negative u_x below the lid
    assert Ug[1:-1, :, 0].min() < -1e-3
    # residual reduced substantially
    assert float(res.fnorm) < 1e-4


def test_transient_vms_taylor_green():
    """Transient RBVMS Navier-Stokes (demo/NavierStokesVMS.c parity):
    two generalized-α steps on the Taylor-Green vortex decay the kinetic
    energy at ~exp(-16 pi^2 nu t) and keep the field divergence-small."""
    import numpy as np
    import jax.numpy as jnp
    from petiga_tpu.models.navierstokes import (
        taylor_green_space, taylor_green_init, solve_transient_vms,
        kinetic_energy, divergence_l2,
    )

    nu, dt = 0.02, 5e-3
    sp = taylor_green_space(nel=8, p=2)
    U0 = jnp.asarray(taylor_green_init(sp, nu))
    E0 = float(kinetic_energy(sp, U0))
    # analytic consistent initial rate: d/dt of the separable decay
    lam = 8 * np.pi**2 * nu
    V0 = U0 * jnp.asarray([-lam, -lam, -2 * lam])
    U, V, t = solve_transient_vms(sp, U0, nu=nu, dt=dt, nsteps=2, V0=V0)
    E1 = float(kinetic_energy(sp, U))
    expect = float(np.exp(-16 * np.pi**2 * nu * t))
    assert np.isfinite(np.asarray(U)).all()
    assert E1 < E0  # energy decays
    np.testing.assert_allclose(E1 / E0, expect, rtol=0.05)
    assert float(divergence_l2(sp, U)) < 0.5
