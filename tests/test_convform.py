"""Conv (coefficient-form) assembly vs the generic quadrature path.

``assemble_coefficient_planes`` restructures the generic second-order
bilinear quadrature sum as one interior convolution + boundary boxes; it
must reproduce ``assemble_system_planes`` with the synthesized pointwise
form to f64 round-off — operator action, load vector, Dirichlet fix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.models.poisson import make_space
from petiga_tpu.assembly.assemble import assemble_system_planes
from petiga_tpu.assembly.convform import (
    assemble_coefficient_planes,
    coefficient_pointwise_form,
    poisson_coefficients,
)

F64 = jnp.float64


def _compare(sp, coef, ctx=None, forcing=None, atol=1e-12, **kw):
    kw.setdefault("conv_min", 8)  # exercise the conv path at test sizes
    form = coefficient_pointwise_form(coef, forcing)
    A, b = assemble_system_planes(sp, form, ctx, interpret=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(sp.nnodes, sp.dof))
    )
    # both engine variants: the constant-coefficient outer-product write
    # (default) and the forced convolution path
    for co in (True, False):
        B, c = assemble_coefficient_planes(
            sp, coef, ctx, forcing=forcing, interpret=True,
            const_outer=co, **kw
        )
        np.testing.assert_allclose(
            np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=atol
        )
        np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=atol)


@pytest.mark.parametrize("dim,p,nel", [(1, 2, 9), (2, 2, 7), (3, 2, 6)])
def test_conv_matches_generic_poisson(dim, p, nel):
    sp = make_space(dim, p=p, nel=nel, dtype=F64)
    _compare(
        sp,
        poisson_coefficients,
        {"c": 0.4, "k": 1.3},
        forcing=lambda x, ctx: jnp.prod(jnp.sin(jnp.pi * x), axis=-1),
    )


@pytest.mark.parametrize("p", [1, 3])
def test_conv_degrees(p):
    sp = make_space(2, p=p, nel=8, dtype=F64)
    _compare(sp, poisson_coefficients, {"c": 0.1, "k": 2.0})


def test_conv_variable_coefficients_advection():
    """Variable diffusivity + advection (nonsymmetric cross channels) +
    variable reaction: the full (1+d)^2 channel generality."""
    sp = make_space(2, p=2, nel=9, dtype=F64)

    def coef(x, ctx):
        kxx = 1.0 + 0.5 * x[..., 0] * x[..., 1]
        kyy = 2.0 - x[..., 0] ** 2 * 0.3
        kxy = 0.1 * x[..., 0]
        bx = 0.7 + x[..., 1]
        by = -0.2
        cc = 0.3 + x[..., 0]
        return {
            (1, 1): kxx,
            (2, 2): kyy,
            (1, 2): kxy,
            (2, 1): kxy,
            (0, 1): bx,   # advection: N_a * b_x d_x N_b
            (0, 2): by,
            (0, 0): cc,
        }

    _compare(sp, coef, forcing=lambda x, ctx: x[..., 0] + 2.0)


def test_conv_no_interior():
    """nel too small for an interior block: everything goes through the
    boundary-box path."""
    sp = make_space(2, p=2, nel=4, dtype=F64)
    _compare(sp, poisson_coefficients, {"c": 0.2, "k": 1.0})


def test_conv_default_threshold_all_generic():
    """Below the default conv_min everything runs generic — identical."""
    sp = make_space(2, p=2, nel=8, dtype=F64)
    _compare(sp, poisson_coefficients, {"c": 0.2, "k": 1.0},
             conv_min=2048)


def test_conv_anisotropic_mesh():
    sp = make_space(3, p=2, nel=(7, 5, 8), dtype=F64)
    _compare(sp, poisson_coefficients, {"c": 0.0, "k": 1.0})


def test_conv_shell_chunking():
    """Boundary boxes split into small chunks still accumulate exactly."""
    sp = make_space(2, p=2, nel=10, dtype=F64)
    form = coefficient_pointwise_form(poisson_coefficients)
    ctx = {"c": 0.4, "k": 1.3}
    A, _ = assemble_system_planes(sp, form, ctx, interpret=True)
    B, _ = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, shell_chunk=17, interpret=True
    )
    x = jnp.asarray(np.random.default_rng(1).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


def test_conv_interior_chunking():
    sp = make_space(3, p=2, nel=8, dtype=F64)
    ctx = {"c": 0.4, "k": 1.3}
    form = coefficient_pointwise_form(poisson_coefficients)
    A, _ = assemble_system_planes(sp, form, ctx, interpret=True)
    B, _ = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, chunk_z=2, interpret=True
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


def test_conv_row_aligned_mode():
    """Row-aligned plane layout (the >2 GB mode where the planes stay
    (K, M, 128) through assembly) matches the grid-shaped mode."""
    sp = make_space(3, p=2, nel=6, dtype=F64)
    ctx = {"c": 0.4, "k": 1.3}
    form = coefficient_pointwise_form(poisson_coefficients)
    A, b = assemble_system_planes(sp, form, ctx, interpret=True)
    B, c = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, interpret=True,
        conv_min=8, row_aligned=True, chunk_z=2,
        forcing=lambda x, ctx: x[..., 0] + 0.5,
    )
    B2, c2 = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, interpret=True,
        conv_min=8, row_aligned=False, chunk_z=2,
        forcing=lambda x, ctx: x[..., 0] + 0.5,
    )
    x = jnp.asarray(np.random.default_rng(3).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(B2.matvec(x)), atol=1e-13
    )


def test_conv_donate_loop():
    """Donated per-chunk eager loop (the >HBM/2 mode) matches the
    single-program path."""
    sp = make_space(3, p=2, nel=6, dtype=F64)
    ctx = {"c": 0.4, "k": 1.3}
    A, b = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, interpret=True, conv_min=8,
        chunk_z=2, forcing=lambda x, ctx: x[..., 1] + 0.5,
    )
    B, c = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, interpret=True, conv_min=8,
        chunk_z=2, forcing=lambda x, ctx: x[..., 1] + 0.5,
        donate_loop=True, row_aligned=True,
    )
    x = jnp.asarray(np.random.default_rng(4).normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-13
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-13)


def test_conv_dof2_blocks():
    """dof > 1: (dof, dof) channel blocks (constant + varying, with
    zero-pattern pruning) match the generic path, including the load
    vector with per-field forcing."""
    sp = Space([Axis.uniform(p=2, nel=7) for _ in range(2)], dof=2,
               dtype=F64)
    for d in range(2):
        for s in range(2):
            sp.set_boundary_value(d, s, 0, 0.0)

    def coef(x, ctx):
        lam, mu = 1.2, 0.7
        # elasticity-like constant blocks + a varying mass block
        ch = {}
        for i in range(1, 3):
            for j in range(1, 3):
                C = np.zeros((2, 2))
                C[i - 1, j - 1] += lam
                if i == j:
                    C[0, 0] += mu
                    C[1, 1] += mu
                C[j - 1, i - 1] += mu
                ch[(i, j)] = jnp.asarray(C)
        m = 0.3 + x[..., 0] * 0.5
        ch[(0, 0)] = m[..., None, None] * jnp.eye(2)
        return ch

    def forcing(x, ctx):
        return jnp.stack(
            [jnp.sin(jnp.pi * x[..., 0]), x[..., 1] + 0.2], axis=-1
        )

    form = coefficient_pointwise_form(coef, forcing)
    A, b = assemble_system_planes(sp, form, interpret=True)
    B, c = assemble_coefficient_planes(
        sp, coef, forcing=forcing, interpret=True, conv_min=8
    )
    x = jnp.asarray(np.random.default_rng(5).normal(size=(sp.nnodes, 2)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-12)


def test_conv_dof3_poisson_vector():
    """dof=3 with decoupled diagonal blocks (3 independent Poissons)."""
    sp = Space([Axis.uniform(p=2, nel=6) for _ in range(3)], dof=3,
               dtype=F64)

    def coef(x, ctx):
        I = jnp.eye(3)
        return {(i, i): I * (0.5 + 0.5 * i) for i in range(1, 4)}

    form = coefficient_pointwise_form(coef)
    A, _ = assemble_system_planes(sp, form, interpret=True, apply_fix=False)
    B, _ = assemble_coefficient_planes(
        sp, coef, interpret=True, conv_min=8, apply_fix=False
    )
    x = jnp.asarray(np.random.default_rng(6).normal(size=(sp.nnodes, 3)))
    np.testing.assert_allclose(
        np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
    )


def _curved_space(nel=8, p=2, rational=False):
    sp = make_space(2, p=p, nel=nel, dtype=F64)
    G = sp.greville_coordinates()  # (nnodes, 2) parametric
    X = np.asarray(G).copy()
    X[:, 0] = X[:, 0] + 0.08 * np.sin(np.pi * X[:, 1]) * X[:, 0] * (1 - X[:, 0] + 0.5)
    X[:, 1] = X[:, 1] + 0.06 * np.sin(np.pi * X[:, 0])
    W = None
    if rational:
        rng = np.random.default_rng(7)
        W = 1.0 + 0.4 * rng.random(sp.nnodes)
    sp.init_geometry(X, W)
    return sp


def test_conv_mapped_geometry():
    """Non-rational mapped geometry: the pullback (C-tilde = detX S^T C S)
    absorbed into the channels matches the tabulation-based path."""
    sp = _curved_space(nel=8)

    def coef(x, ctx):
        return {(1, 1): 1.0 + 0.2 * x[..., 1], (2, 2): 0.8,
                (0, 0): 0.5, (0, 1): 0.3 * x[..., 0]}

    _compare(sp, coef,
             forcing=lambda x, ctx: x[..., 0] * x[..., 1] + 1.0)


def test_conv_rational_identity():
    """Rational (NURBS) weights on the identity map: T-transform
    channels + node-weight conjugation."""
    sp = _curved_space(nel=7, rational=True)
    sp.geometry = None  # weights only

    def coef(x, ctx):
        return {(1, 1): 1.0, (2, 2): 1.0, (0, 0): 0.3}

    _compare(sp, coef, forcing=lambda x, ctx: x[..., 0] + 0.5)


def test_conv_full_nurbs():
    """Mapped geometry AND rational weights together."""
    sp = _curved_space(nel=7, rational=True)

    def coef(x, ctx):
        return {(1, 1): 1.0 + 0.1 * x[..., 0], (2, 2): 0.9, (0, 0): 0.2}

    _compare(sp, coef, forcing=lambda x, ctx: jnp.sin(x[..., 0]))


def test_conv_mapped_3d():
    sp = make_space(3, p=2, nel=6, dtype=F64)
    G = np.asarray(sp.greville_coordinates()).copy()
    G[:, 0] += 0.05 * np.sin(np.pi * G[:, 1]) * np.sin(np.pi * G[:, 2])
    sp.init_geometry(G)

    def coef(x, ctx):
        return {(i, i): 1.0 for i in range(1, 4)}

    _compare(sp, coef)


# ------------------------------------------------ round-5 additions


def _periodic_space(dim, nel, per, p=2):
    return Space(
        [
            Axis.uniform(p=p, nel=nel, periodic=per[d])
            for d in range(dim)
        ],
        dtype=F64,
    )


def _compare_vs_node(sp, coef, ctx=None, forcing=None, atol=1e-12, **kw):
    """Oracle = the node-major scatter assembler (assemble_system), the
    only generic path that supports periodic axes."""
    from petiga_tpu.assembly.assemble import assemble_system

    kw.setdefault("conv_min", 8)
    form = coefficient_pointwise_form(coef, forcing)
    A, b = assemble_system(sp, form, ctx, apply_fix=False)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(sp.nnodes, sp.dof))
    )
    for co in (True, False):
        B, c = assemble_coefficient_planes(
            sp, coef, ctx, forcing=forcing, interpret=True,
            apply_fix=False, const_outer=co, **kw
        )
        np.testing.assert_allclose(
            np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), atol=atol
        )
        np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=atol)


@pytest.mark.parametrize(
    "dim,per",
    [
        (1, (True,)),
        (2, (True, True)),
        (2, (True, False)),
        (3, (True, True, True)),
        (3, (False, True, False)),
    ],
)
def test_conv_periodic(dim, per):
    """Periodic unit-step axes: one interior type everywhere, conv
    output wrap-folded (petigaaxis.c:419-452 wrap semantics)."""
    sp = _periodic_space(dim, 7, per)
    _compare_vs_node(
        sp,
        poisson_coefficients,
        {"c": 0.3, "k": 1.2},
        forcing=lambda x, ctx: jnp.cos(2 * jnp.pi * x[..., 0]),
    )


def test_conv_periodic_variable_coef():
    sp = _periodic_space(2, 8, (True, False))

    def coef(x, ctx):
        return {
            (1, 1): 1.0 + 0.3 * jnp.sin(2 * jnp.pi * x[..., 0]),
            (2, 2): 0.8,
            (0, 0): 0.4 + 0.1 * x[..., 1],
        }

    _compare_vs_node(sp, coef, forcing=lambda x, ctx: x[..., 1])


@pytest.mark.parametrize("dim,nel", [(2, 9), (3, 6)])
def test_conv_symmetric(dim, nel):
    """symmetric=True assembles only the Ku upper planes (SBAIJ analog):
    operator action and Dirichlet post-fix must match full storage."""
    sp = make_space(dim, p=2, nel=nel, dtype=F64)
    ctx = {"c": 0.4, "k": 1.3}
    forcing = lambda x, ctx: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(sp.nnodes, 1)))
    for co in (True, False):
        A, b = assemble_coefficient_planes(
            sp, poisson_coefficients, ctx, forcing=forcing,
            interpret=True, const_outer=co, conv_min=8,
        )
        S, bs = assemble_coefficient_planes(
            sp, poisson_coefficients, ctx, forcing=forcing,
            interpret=True, symmetric=True, const_outer=co, conv_min=8,
        )
        assert S.kind == "sym"
        assert S.DT.shape[0] == (A.stencil.K + 1) // 2
        np.testing.assert_allclose(
            np.asarray(S.matvec(x)), np.asarray(A.matvec(x)), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(bs), np.asarray(b),
                                   atol=1e-12)


def test_conv_symmetric_solve():
    """CG through the symmetric half-storage operator reproduces the
    full-storage solve (packed-vector iteration)."""
    import jax
    from petiga_tpu.solve.krylov import cg

    sp = make_space(3, p=2, nel=6, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}
    forcing = lambda x, ctx: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A, b = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, forcing=forcing, interpret=True,
    )
    S, bs = assemble_coefficient_planes(
        sp, poisson_coefficients, ctx, forcing=forcing, interpret=True,
        symmetric=True,
    )
    def solve(op, rhs):
        dinv = op.packed_diag_inv()
        r = cg(
            lambda v: op.matvec_xb(op.DT, v), op.pack_vec(rhs),
            M=lambda z: z * dinv, rtol=1e-10, maxiter=500,
        )
        return op.unpack_vec(r.x), int(r.iters)
    xf, itf = solve(A, b)
    xs, its = solve(S, bs)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xf), atol=1e-9)


def test_conv_outer_exact_nonuniform():
    """The constant-coefficient outer-product factorization is exact for
    ANY knot vector (not just unit-step) — validated on a graded mesh
    via the node-major oracle with const_outer handled upstream."""
    import petiga_tpu.assembly.convform as cf
    from petiga_tpu.assembly.assemble import assemble_system
    from petiga_tpu.sparse.pallas_spmv import (
        PallasStencilOperator, alignment_pads,
    )

    # graded breaks: is_unit_step fails, so call the factor math direct
    breaks = np.asarray([0.0, 0.05, 0.2, 0.45, 0.7, 1.0])
    sp = Space([Axis.breaks(p=2, breaks=breaks) for _ in range(2)],
               dtype=F64)
    form = coefficient_pointwise_form(poisson_coefficients)
    ctx = {"c": 0.7, "k": 1.1}
    A, _ = assemble_system(sp, form, ctx, apply_fix=False)
    facs = cf._axis_factor_mats(sp, F64)
    # planes[s, n] = c·My⊗Mx + k·(Sy⊗Mx + My⊗Sx) gathered per slot
    st = A.stencil
    K = st.K
    scomp = []
    rem = np.arange(K)
    for d in range(2):
        sKd = 2 * sp.degrees[d] + 1
        scomp.append(rem % sKd)
        rem = rem // sKd
    def outer(fy, fx):
        # fy: (Ny, sK), fx: (Nx, sK) -> (K, Ny, Nx) per-slot outer rows
        Fy = np.asarray(fy)[:, scomp[1]]  # (Ny, K)
        Fx = np.asarray(fx)[:, scomp[0]]  # (Nx, K)
        return np.einsum("yk,xk->kyx", Fy, Fx)
    P = (
        ctx["c"] * outer(facs[1][0][0], facs[0][0][0])
        + ctx["k"] * outer(facs[1][1][1], facs[0][0][0])
        + ctx["k"] * outer(facs[1][0][0], facs[0][1][1])
    )
    data = np.moveaxis(np.asarray(P).reshape(K, sp.nnodes), 0, 1)
    np.testing.assert_allclose(
        data, np.asarray(A.data)[:, :, 0, 0], atol=1e-12
    )


def test_conv_field_coefficients_bratu_jacobian():
    """State-dependent coefficient channels (fields=): the
    conv-assembled Bratu Jacobian matches the AD/pointwise Jacobian at
    a random iterate, and the conv-Newton driver reproduces the
    standard Newton solve (petigasnes.c:82-139)."""
    from petiga_tpu.assembly.assemble import (
        assemble_jacobian,
        dirichlet_post_fix_homogeneous,
    )
    from petiga_tpu.models.bratu import (
        bratu_jacobian_coefficients,
        bratu_residual,
        make_space as bratu_space,
        solve_bratu,
        solve_bratu_conv,
    )

    sp = bratu_space(2, p=2, nel=7, dtype=F64)
    rng = np.random.default_rng(7)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp.nnodes, 1)))
    lam = jnp.asarray(1.5, F64)
    Jref = assemble_jacobian(sp, bratu_residual, U, {"lambda": lam})
    for co in (True, False):  # const_outer irrelevant (fields vary)
        J, _ = assemble_coefficient_planes(
            sp, bratu_jacobian_coefficients, {"lambda": lam},
            fields={"u": jnp.where(sp.device("dirichlet")[0] > 0,
                                   sp.device("dirichlet")[1],
                                   U).reshape(-1)},
            apply_fix=False, interpret=True, conv_min=8, const_outer=co,
        )
        J, _ = dirichlet_post_fix_homogeneous(
            sp, J, jnp.zeros((sp.nnodes, 1), F64)
        )
        x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
        yc = np.asarray(J.matvec(x))
        yr = np.asarray(Jref.matvec(x))
        np.testing.assert_allclose(yc, yr, atol=1e-11)

    # end-to-end Newton parity
    res1 = solve_bratu(sp, lam=1.5, rtol=1e-10)
    U2, info2 = solve_bratu_conv(sp, lam=1.5, rtol=1e-10,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(U2), np.asarray(res1.U).reshape(np.asarray(U2).shape),
        atol=1e-8,
    )


def test_conv_order2_channels_biharmonic():
    """Second-derivative channels: ∫ Δw Δv + c w v assembled by the
    conv engine (incl. the outer-product const path and symmetric
    storage) matches the generic order-2 quadrature path."""
    from petiga_tpu.assembly.assemble import assemble_system

    def coef(x, ctx):
        dim = x.shape[-1]
        ch = {(0, 0): 0.7}
        for d in range(dim):
            for e in range(dim):
                ch[((d, d), (e, e))] = 1.0
        return ch

    for per in (False, True):
        sp = Space(
            [Axis.uniform(p=2, nel=7, periodic=per) for _ in range(2)],
            dtype=F64,
        )
        form = coefficient_pointwise_form(coef)
        A, _ = assemble_system(sp, form, order=2, apply_fix=False)
        x = jnp.asarray(
            np.random.default_rng(11).normal(size=(sp.nnodes, 1))
        )
        for co in (True, False):
            B, _ = assemble_coefficient_planes(
                sp, coef, apply_fix=False, interpret=True,
                conv_min=8, const_outer=co,
            )
            np.testing.assert_allclose(
                np.asarray(B.matvec(x)), np.asarray(A.matvec(x)),
                atol=1e-11,
            )
        if not per:
            S, _ = assemble_coefficient_planes(
                sp, coef, apply_fix=False, interpret=True,
                conv_min=8, symmetric=True,
            )
            np.testing.assert_allclose(
                np.asarray(S.matvec(x)), np.asarray(A.matvec(x)),
                atol=1e-11,
            )


def test_conv_cahnhilliard_jacobian():
    """The CH Jacobian (order-2 channels, value/grad/Hessian fields,
    periodic C¹) conv-assembles to the AD Jacobian of the residual —
    the reference's flagship transient class on the MXU engine
    (demo/CahnHilliard3D.c:55-112)."""
    from petiga_tpu.assembly.assemble import assemble_jacobian
    from petiga_tpu.models import cahnhilliard as chm

    sp = chm.make_space(2, nel=6, dtype=F64)
    rng = np.random.default_rng(12)
    C = jnp.asarray(
        0.5 + 0.2 * np.sin(2 * np.pi * rng.random((sp.nnodes, 1)))
    )
    ctx = {"theta": 1.5, "alpha": 3000.0, "shift": 0.0}

    def fres(pt, ue, c):
        return chm.residual(pt, 0.0, jnp.zeros_like(ue), 0.0, ue, c)

    Jref = assemble_jacobian(sp, fres, C, ctx, order=2)
    J, _ = assemble_coefficient_planes(
        sp, chm.jacobian_coefficients, ctx, fields={"c": (C, 2)},
        apply_fix=False, interpret=True, conv_min=8,
    )
    x = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    np.testing.assert_allclose(
        np.asarray(J.matvec(x)), np.asarray(Jref.matvec(x)),
        atol=1e-8 * float(jnp.max(jnp.abs(Jref.matvec(x)))),
    )
    # with the alpha-scheme shift (mass term)
    ctx2 = {"theta": 1.5, "alpha": 3000.0, "shift": 7.3}

    def fres2(pt, ue, c):
        return chm.residual(
            pt, 0.0, jnp.zeros_like(ue), 0.0, ue, c
        ) + 7.3 * pt.value(ue)[0] * pt.shape0

    Jref2 = assemble_jacobian(sp, fres2, C, ctx, order=2)
    J2, _ = assemble_coefficient_planes(
        sp, chm.jacobian_coefficients, ctx2, fields={"c": (C, 2)},
        apply_fix=False, interpret=True, conv_min=8,
    )
    np.testing.assert_allclose(
        np.asarray(J2.matvec(x)), np.asarray(Jref2.matvec(x)),
        atol=1e-8 * float(jnp.max(jnp.abs(Jref2.matvec(x)))),
    )


def test_conv_periodic_end_to_end_solve():
    """Periodic conv assembly end to end: manufactured torus solution
    -Δu + u = f, packed-kernel CG solve, L2 at the discretization
    order (the flagship periodic transient class's operator path)."""
    from petiga_tpu.solve.krylov import cg
    from petiga_tpu.assembly.assemble import compute_error_norm

    errs = []
    for nel in (8, 16):
        sp = _periodic_space(2, nel, (True, True))

        def exact(x):
            return jnp.sin(2 * jnp.pi * x[..., 0]) * jnp.cos(
                2 * jnp.pi * x[..., 1]
            )

        op, b = assemble_coefficient_planes(
            sp, poisson_coefficients, {"c": 1.0, "k": 1.0},
            forcing=lambda x, ctx: (1.0 + 8 * jnp.pi**2) * exact(x),
            apply_fix=False, interpret=True, conv_min=8,
        )
        dinv = op.packed_diag_inv()
        r = cg(lambda v: op.matvec_xb(op.DT, v), op.pack_vec(b),
               M=lambda z: z * dinv, rtol=1e-12, maxiter=2000)
        x = op.unpack_vec(r.x)
        errs.append(float(compute_error_norm(
            sp, x, lambda xx: exact(xx), k=0
        )))
    rate = np.log2(errs[0] / errs[1])
    assert errs[1] < 3e-4 and rate > 2.5, (errs, rate)


def test_residual_conv_matches_pointwise():
    """assemble_residual_conv (derivative test channels, open/periodic,
    conv and gen-box paths) equals the pointwise assemble_function."""
    from petiga_tpu.assembly.assemble import assemble_function
    from petiga_tpu.assembly.convform import assemble_residual_conv

    for dim, nel, per in [(1, 8, True), (2, 6, False), (2, 6, True),
                          (3, 4, True)]:
        axes = [Axis.uniform(p=2, nel=nel, periodic=per)
                for _ in range(dim)]
        sp = Space(axes, dof=1, dtype=jnp.float64, order=2)

        def coefs(x, ctx, _dim=dim):
            ch = {0: jnp.sin(jnp.pi * x[..., 0]) * ctx["a"]}
            for d in range(_dim):
                ch[d + 1] = jnp.cos(jnp.pi * x[..., d]) + 0.3 * d
                ch[(d, d)] = 0.1 + 0.05 * x[..., 0]
            return ch

        ctx = {"a": jnp.float64(1.3)}
        b_conv = assemble_residual_conv(sp, coefs, ctx, conv_min=1)
        b_gen = assemble_residual_conv(sp, coefs, ctx, conv_min=10**9)

        def form(pt, Ue, c, _dim=dim, _coefs=coefs):
            ch = _coefs(pt.x, c)
            out = pt.shape0 * ch[0][..., None]
            for d in range(_dim):
                out = out + pt.shape1[..., d] * ch[d + 1][..., None]
                out = out + pt.shape2[..., d, d] * ch[(d, d)][..., None]
            return out

        b_pt = assemble_function(sp, form,
                                 jnp.zeros((sp.nnodes, 1)), ctx)
        scale = float(jnp.max(jnp.abs(b_pt)))
        assert float(jnp.max(jnp.abs(b_conv - b_pt))) < 1e-12 * scale
        assert float(jnp.max(jnp.abs(b_gen - b_pt))) < 1e-12 * scale


def test_residual_conv_state_fields_cahnhilliard():
    """The full CH residual (value/grad/Hessian state fields) through
    assemble_residual_conv equals the pointwise form."""
    import petiga_tpu.models.cahnhilliard as m
    from petiga_tpu.assembly.assemble import assemble_function
    from petiga_tpu.assembly.convform import assemble_residual_conv

    sp = m.make_space(2, nel=8)
    U = m.initial_condition(sp, seed=2)
    V = 0.1 * m.initial_condition(sp, seed=5)
    ctx = {"theta": jnp.float64(1.5), "alpha": jnp.float64(3000.0)}

    b_conv = assemble_residual_conv(
        sp, m.residual_channels, ctx,
        fields={"c": (U.reshape(-1), 2), "ct": (V.reshape(-1), 0)},
    )

    def form(pt, Xe, aux_e, c):
        return m.residual(pt, 1.0, aux_e["V0"], 0.0, Xe, c)

    b_pt = assemble_function(sp, form, U, ctx, aux={"V0": V})
    scale = float(jnp.max(jnp.abs(b_pt)))
    assert float(jnp.max(jnp.abs(b_conv - b_pt))) < 1e-12 * scale
