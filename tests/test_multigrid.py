"""Geometric multigrid: knot-insertion exactness, V-cycle convergence,
mesh-independent CG iteration counts (PCMG analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.bspline import bspline_ders
from petiga_tpu.solve.multigrid import (
    MGHierarchy,
    mg_preconditioner,
    prolongation_1d,
)
from petiga_tpu.models.poisson import make_space, poisson_system, l2_error
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.solve.krylov import cg

F64 = jnp.float64


@pytest.mark.parametrize("p,periodic", [(1, False), (2, False), (3, False),
                                        (2, True)])
def test_knot_insertion_exact(p, periodic):
    """Coarse basis functions exactly reproduced in the fine space."""
    coarse = Axis.uniform(p=p, nel=4, periodic=periodic)
    fine = Axis.uniform(p=p, nel=8, periodic=periodic)
    P = prolongation_1d(coarse, fine)
    assert P.shape == (fine.nnp, coarse.nnp)
    # evaluate both bases at sample points and compare N_c = P^T-weighted N_f
    u = np.linspace(0, 0.999, 53)
    for ax, nb in ((coarse, coarse.nnp), (fine, fine.nnp)):
        pass
    def basis_matrix(ax):
        spans = ax.find_span(u)
        ders = bspline_ders(ax.U, ax.p, spans, u, 0)
        Bm = np.zeros((len(u), ax.nbasis))
        for j in range(ax.p + 1):
            Bm[np.arange(len(u)), spans - ax.p + j] = ders[:, 0, j]
        # wrap periodic duplicates
        W = np.zeros((len(u), ax.nnp))
        for c in range(ax.nbasis):
            W[:, c % ax.nnp] += Bm[:, c]
        return W

    Bc = basis_matrix(coarse)
    Bf = basis_matrix(fine)
    np.testing.assert_allclose(Bf @ P, Bc, atol=1e-12)


def test_vcycle_reduces_error():
    sp = make_space(2, p=2, nel=16, dtype=F64)
    ctx = {"c": 0.0, "k": 1.0}

    def asm(s):
        A, _ = assemble_system(s, poisson_system, ctx)
        return A

    hier = MGHierarchy.build(sp, asm, min_nel=4)
    assert len(hier.spaces) >= 2
    M = mg_preconditioner(hier)
    A, b = assemble_system(sp, poisson_system, ctx)
    # one V-cycle as iteration: e -> (I - M A) e contraction
    x = M(b)
    r1 = b - A.matvec(x)
    x = x + M(r1)
    r2 = b - A.matvec(x)
    rho = float(jnp.linalg.norm(r2) / jnp.linalg.norm(r1))
    assert rho < 0.25, rho


def test_mg_cg_mesh_independent():
    """CG+MG iterations stay ~constant as the mesh refines."""
    iters = []
    for nel in (8, 16, 32):
        sp = make_space(2, p=2, nel=nel, dtype=F64)
        ctx = {"c": 0.0, "k": 1.0}

        def asm(s):
            A, _ = assemble_system(s, poisson_system, ctx)
            return A

        hier = MGHierarchy.build(sp, asm, min_nel=4)
        A, b = assemble_system(sp, poisson_system, ctx)
        res = cg(A, b, M=mg_preconditioner(hier), rtol=1e-10)
        iters.append(int(res.iters))
        # solution correct
        err = l2_error(sp, res.x)
        assert err < 1.0 / nel**2
    assert iters[-1] <= iters[0] + 3, iters
    assert max(iters) < 15, iters
