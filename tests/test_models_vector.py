"""Vector models: elasticity (blocked operator, MMS, rigid-body modes),
hyperelasticity (Newton, material models), L2 projection, SUPG
advection-diffusion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petiga_tpu.assembly.assemble import assemble_system, compute_error_norm
from petiga_tpu.models import elasticity as el
from petiga_tpu.models import hyperelasticity as hel
from petiga_tpu.models.advection_diffusion import make_space as ad_space, solve as ad_solve
from petiga_tpu.models.projection import l2_project, projection_error

F64 = jnp.float64


def test_elasticity_mms_2d():
    """Manufactured u = (sin πx sin πy, x(1-x)y(1-y)) with AD body force."""
    def exact(x):
        return jnp.asarray(
            [
                jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]),
                x[0] * (1 - x[0]) * x[1] * (1 - x[1]),
            ]
        )

    errs = []
    for nel in (8, 16):
        from petiga_tpu.core.axis import Axis
        from petiga_tpu.core.space import Space
        from petiga_tpu.solve.krylov import cg, block_jacobi_preconditioner

        sp = Space([Axis.uniform(p=2, nel=nel)] * 2, dof=2, dtype=F64)
        for d in range(2):
            for s in range(2):
                for c in range(2):
                    sp.set_boundary_value(d, s, c, 0.0)
        ctx = {"lambda": 1.0, "mu": 1.0}
        A, b = assemble_system(sp, el.body_force_system(exact), ctx)
        res = cg(A, b, M=block_jacobi_preconditioner(A), rtol=1e-12)
        err = float(compute_error_norm(sp, res.x, exact, k=0))
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert abs(rate - 3) < 0.2, (rate, errs)


def test_elasticity_3d_runs():
    sp = el.make_space(3, p=2, nel=4, dtype=F64)
    U, info = el.solve(sp, rtol=1e-10)
    # clamped both ends, no load -> zero displacement
    assert float(jnp.abs(U).max()) < 1e-10


def test_rigid_body_modes_in_nullspace():
    """Unconstrained stiffness annihilates all rigid-body modes."""
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space

    sp = Space([Axis.uniform(p=2, nel=3)] * 2, dof=2, dtype=F64)
    A, _ = assemble_system(
        sp, el.elasticity_system, {"lambda": 1.0, "mu": 1.0}, apply_fix=False
    )
    modes = el.rigid_body_modes(sp)
    assert modes.shape[0] == 3  # 2 translations + 1 rotation
    for m in modes:
        y = np.asarray(A.matvec(jnp.asarray(m)))
        np.testing.assert_allclose(y, 0.0, atol=1e-10)


@pytest.mark.parametrize(
    "material",
    ["neo_hookean", "st_venant", "mooney_rivlin"],
)
def test_hyperelasticity_materials(material):
    sp = hel.make_space(2, p=2, nel=4, dtype=F64, stretch=0.05)
    mat = {
        "neo_hookean": hel.neo_hookean(1.0, 1.0),
        "st_venant": hel.st_venant(1.0, 1.0),
        "mooney_rivlin": hel.mooney_rivlin(0.5, 0.1, 1.0),
    }[material]
    U, res = hel.solve(sp, material=mat, rtol=1e-10)
    assert bool(res.converged), float(res.fnorm)
    Ug = np.asarray(U).reshape(*sp.node_shape[::-1], 2)
    # right face displaced by the stretch, left clamped
    np.testing.assert_allclose(Ug[:, -1, 0], 0.05, atol=1e-10)
    np.testing.assert_allclose(Ug[:, 0, :], 0.0, atol=1e-10)


def test_hyperelastic_small_strain_matches_linear():
    """Small-strain Neo-Hooke ≈ linear elasticity."""
    from petiga_tpu.core.axis import Axis
    from petiga_tpu.core.space import Space
    from petiga_tpu.solve.krylov import cg, block_jacobi_preconditioner

    eps = 1e-4
    sp = hel.make_space(2, p=2, nel=4, dtype=F64, stretch=eps)
    U, res = hel.solve(sp, lam=1.0, mu=1.0, rtol=1e-12)
    sp2 = Space([Axis.uniform(p=2, nel=4)] * 2, dof=2, dtype=F64)
    for c in range(2):
        sp2.set_boundary_value(0, 0, c, 0.0)
    sp2.set_boundary_value(0, 1, 0, eps)
    A, b = assemble_system(sp2, el.elasticity_system, {"lambda": 1.0, "mu": 1.0})
    Ul = cg(A, b, M=block_jacobi_preconditioner(A), rtol=1e-12).x
    diff = float(jnp.abs(U - Ul).max()) / eps
    assert diff < 1e-3, diff


def test_l2_projection_rates():
    from petiga_tpu.models.poisson import make_space

    f = lambda x: jnp.asarray([jnp.exp(x[0]) * jnp.cos(2 * x[1])])
    errs = []
    for nel in (8, 16):
        sp = make_space(2, p=2, nel=nel, dtype=F64)
        U = l2_project(sp, f)
        errs.append(projection_error(sp, U, f))
    rate = np.log2(errs[0] / errs[1])
    assert abs(rate - 3) < 0.1, (rate, errs)


def test_supg_beats_galerkin_on_boundary_layer():
    """1D advection-diffusion at Pe_h >> 1: Galerkin oscillates, SUPG
    stays monotone away from the layer."""
    sp_g = ad_space(1, p=1, nel=32)
    sp_g.set_boundary_value(0, 0, 0, 0.0).set_boundary_value(0, 1, 0, 1.0)
    sp_s = ad_space(1, p=1, nel=32)
    sp_s.set_boundary_value(0, 0, 0, 0.0).set_boundary_value(0, 1, 0, 1.0)
    wind = [200.0]
    Ug, _ = ad_solve(sp_g, wind, supg=False)
    Us, _ = ad_solve(sp_s, wind, supg=True)
    wiggle_g = max(float(jnp.max(Ug)) - 1.0, -float(jnp.min(Ug)))
    over_s = float(jnp.max(Us)) - 1.0
    under_s = float(jnp.min(Us))
    assert wiggle_g > 0.05  # Galerkin oscillates at high cell Peclet
    assert over_s < 1e-8 and under_s > -1e-8  # SUPG nodally exactish
