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


def test_adaptive_l2_projection():
    import jax.numpy as jnp
    from petiga_tpu.models.adaptive import adaptive_l2_projection

    # the reference's off-center Gaussian (AdaptiveL2Projection.c:13-18)
    def f(x):
        return jnp.asarray(
            [jnp.exp(-((x[0] - 0.85) ** 2 / 0.03125 + (x[1] - 0.45) ** 2 / 0.08))]
        )

    sp, U, hist = adaptive_l2_projection(f, dim=2, p=2, n0=3, iters=3)
    # adaptivity strictly reduces the error each step
    assert all(hist[i + 1] < hist[i] for i in range(len(hist) - 1)), hist
    assert hist[-1] < 0.3 * hist[0]
    # refinement concentrated near the feature: axis-0 breaks denser
    # around x = 0.85 than near 0
    b0 = np.asarray(sp.axes[0].U)
    assert ((b0 > 0.6) & (b0 < 1.0)).sum() > ((b0 > 0.0) & (b0 < 0.4)).sum()
