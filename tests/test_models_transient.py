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
