"""ShallowWater / Richards / PhaseFieldCrystal capability smoke +
physics checks (the reference's short -ts_max_steps run strategy)."""

import numpy as np
import jax.numpy as jnp

from petiga_tpu.models import phasefieldcrystal as pfc
from petiga_tpu.models import richards
from petiga_tpu.models import shallowwater as sw


def test_shallow_water_mass_conservation():
    sp = sw.make_space(nel=12)
    U0, U = sw.run(sp, dt=0.005, nsteps=4)
    assert np.isfinite(np.asarray(U)).all()
    # periodic: total water volume conserved (integrate h via mean)
    h0 = float(U0[:, 0].mean())
    h1 = float(U[:, 0].mean())
    np.testing.assert_allclose(h1, h0, rtol=1e-6)
    # hump spreads: peak decreases
    assert float(U[:, 0].max()) < float(U0[:, 0].max())


def test_richards_infiltration():
    sp = richards.make_space(nel=32, dim=1)
    U0, U = richards.run(sp, dt=1e-3, nsteps=5)
    u = np.asarray(U).ravel()
    assert np.isfinite(u).all()
    # wetting front: ponded top, still dry below
    assert u[-1] > -1e-6
    assert u[0] < -1.8
    # no oscillation blowup
    assert u.min() >= -2.3 and u.max() <= 0.1


def test_pfc_runs_and_conserves_mass():
    sp = pfc.make_space(nel=16)
    U0 = pfc.initial_condition(sp, seed=5)
    U = pfc.run(sp, U0, dt=0.05, nsteps=2)
    assert np.isfinite(np.asarray(U)).all()
    # φ is conserved (H^{-1} flow, periodic)
    np.testing.assert_allclose(
        float(U[:, 0].mean()), float(U0[:, 0].mean()), rtol=1e-7
    )


def test_nsk_short():
    from petiga_tpu.models import nsk

    sp = nsk.make_space(nel=12)
    U0 = nsk.vdw_bubble_ic(sp)
    U = nsk.run(sp, U0, dt=5e-5, nsteps=2)
    arr = np.asarray(U)
    assert np.isfinite(arr).all()
    # density stays in the physical van der Waals window
    assert arr[:, 0].min() > 0.05 and arr[:, 0].max() < 0.95
    # mass conserved on the periodic box
    np.testing.assert_allclose(
        float(U[:, 0].mean()), float(U0[:, 0].mean()), rtol=1e-6
    )


def test_twophase_injection():
    from petiga_tpu.models import twophase

    sp = twophase.make_space(nel=16)
    U0, U = twophase.run(sp, dt=0.02, nsteps=4)
    arr = np.asarray(U)
    assert np.isfinite(arr).all()
    # hydrogen accumulates near the injection face (left), none far field
    assert arr[0, 1] > 1e-4
    assert abs(arr[-1, 1]) < 1e-8  # fixed right boundary
