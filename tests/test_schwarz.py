"""Two-level overlapping Schwarz PC (BDDC-prep analog, petigapcbddc.c):
correctness, acceleration over Jacobi, coarse-space effect, dof>1,
periodic wrap, and RAS variant."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space, poisson_system
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.solve.krylov import bicgstab, cg, jacobi_preconditioner
from petiga_tpu.solve.schwarz import schwarz_preconditioner, subdomain_boxes

F64 = jnp.float64


def test_subdomain_boxes_tile_exactly():
    starts, sizes = subdomain_boxes((25, 17), (4, 3))
    for st, sz, n in zip(starts, sizes, (25, 17)):
        assert st[0] == 0 and st[-1] + sz[-1] == n
        np.testing.assert_array_equal(st[1:], st[:-1] + sz[:-1])


def test_schwarz_accelerates_cg():
    sp = make_space(2, p=2, nel=20, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}
    A, b = assemble_system(sp, poisson_system, ctx)
    it_jac = int(cg(A, b, M=jacobi_preconditioner(A), rtol=1e-10).iters)
    M = schwarz_preconditioner(A, subdomains=(2, 2), coarse=False)
    res = cg(A, b, M=M, rtol=1e-10)
    assert int(res.iters) <= 0.7 * it_jac, (int(res.iters), it_jac)
    x_ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-13).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-8)


def test_coarse_space_helps_many_subdomains():
    """The subdomain-constant coarse space (the reference's minimal
    near-null-space vectors, petigapcbddc.c:310-460) pays off once the
    subdomain count exceeds what CG deflates by itself: many small
    subdomains, thin overlap."""
    sp = make_space(2, p=2, nel=48, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    it2 = int(
        cg(A, b, rtol=1e-10,
           M=schwarz_preconditioner(A, subdomains=(12, 12), overlap=1,
                                    coarse=True)).iters
    )
    it1 = int(
        cg(A, b, rtol=1e-10,
           M=schwarz_preconditioner(A, subdomains=(12, 12), overlap=1,
                                    coarse=False)).iters
    )
    assert it2 < it1, (it2, it1)


def test_schwarz_vector_dof():
    """dof=2 block system: per-field coarse constants, block local solves."""
    sp = make_space(2, p=2, nel=12, dtype=F64)
    sp = sp.clone(dof=2)
    for ax in range(2):
        for side in range(2):
            for f in range(2):
                sp.set_boundary_value(ax, side, f, 0.0)

    def sys(pt, ctx):
        lap = pt.shape1 @ pt.shape1.T
        mass = jnp.outer(pt.shape0, pt.shape0)
        K = jnp.kron(lap + 0.5 * mass, jnp.eye(2))
        f = jnp.asarray([1.0, -0.5])
        F = jnp.kron(pt.shape0, f)
        nen = pt.shape0.shape[0]
        return K.reshape(nen, 2, nen, 2), F.reshape(nen, 2)

    A, b = assemble_system(sp, sys)
    M = schwarz_preconditioner(A, subdomains=(2, 2))
    res = cg(A, b, M=M, rtol=1e-11)
    x_ref = cg(A, b, M=jacobi_preconditioner(A), rtol=1e-13).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-8)


def test_schwarz_periodic():
    sp = Space([Axis.uniform(p=2, nel=16, periodic=True)] * 2, dtype=F64)

    def sys(pt, ctx):
        K = pt.shape1 @ pt.shape1.T + 0.1 * jnp.outer(pt.shape0, pt.shape0)
        f = jnp.sin(2 * jnp.pi * pt.x[0]) * jnp.cos(2 * jnp.pi * pt.x[1])
        return K, f * pt.shape0

    A, b = assemble_system(sp, sys)
    M = schwarz_preconditioner(A, subdomains=(2, 2))
    res = cg(A, b, M=M, rtol=1e-10)
    x_ref = cg(A, b, rtol=1e-13).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-7)


def test_schwarz_restricted_with_bicgstab():
    sp = make_space(2, p=2, nel=16, dtype=F64)
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    M = schwarz_preconditioner(A, subdomains=(2, 2), restricted=True)
    res = bicgstab(A, b, M=M, rtol=1e-10)
    x_ref = cg(A, b, rtol=1e-13).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-8)


def test_schwarz_unequal_boxes():
    """Unequal subdomain boxes (N not divisible by nsub) at overlap==p
    — the ADVICE r2 fragile-index case: idx entries one past the
    shorter extended block must stay clamped and masked."""
    from petiga_tpu.models.poisson import make_space, poisson_system

    sp = make_space(2, p=2, nel=11, dtype=jnp.float64)  # 13 nodes/axis
    A, b = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    M = schwarz_preconditioner(A, subdomains=(2, 2), overlap=2)
    r = cg(A, b, M=M, rtol=1e-10)
    r_ref = cg(A, b, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(r.x), np.asarray(r_ref.x), atol=1e-8
    )


def test_schwarz_block_size_guard():
    from petiga_tpu.models.poisson import make_space, poisson_system

    sp = make_space(2, p=2, nel=62, dtype=jnp.float64)  # 64+2ov per axis
    A, _ = assemble_system(sp, poisson_system, {"c": 0.0, "k": 1.0})
    with pytest.raises(ValueError, match="max_block"):
        schwarz_preconditioner(A, subdomains=(1, 1))
    # explicit opt-out accepted
    schwarz_preconditioner(A, subdomains=(1, 1), max_block=2_000_000)


def test_schwarz_rigid_body_coarse_elasticity():
    """Rigid-body-mode coarse space (the reference's BDDC near-null-
    space intent, petigapcbddc.c:310-460): solves correctly and does not
    lose to the constants-only coarse space as subdomains grow."""
    from petiga_tpu.models.elasticity import (
        elasticity_system,
        make_space,
        rigid_body_modes,
    )

    sp = make_space(2, p=2, nel=12, dtype=jnp.float64)
    ctx = {"lambda": 2.0, "mu": 1.0,
           "body_force": lambda x: jnp.sin(jnp.pi * x)}
    A, b = assemble_system(sp, elasticity_system, ctx)
    rbm = rigid_body_modes(sp)
    r_ref = cg(A, b, rtol=1e-10)
    iters = {}
    for subs in [(2, 2), (3, 3)]:
        Mc = schwarz_preconditioner(A, subdomains=subs)
        Mr = schwarz_preconditioner(A, subdomains=subs, coarse_modes=rbm)
        rc = cg(A, b, M=Mc, rtol=1e-10)
        rr = cg(A, b, M=Mr, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(rr.x), np.asarray(r_ref.x), atol=1e-7
        )
        iters[subs] = (int(rc.iters), int(rr.iters))
        assert int(rr.iters) <= int(rc.iters) + 2
    # growth with subdomain count stays bounded for the RBM coarse space
    assert iters[(3, 3)][1] <= 1.6 * max(iters[(2, 2)][1], 1)
