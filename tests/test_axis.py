"""Axis / knot-vector construction tests (vs closed forms, reference
semantics of petigaaxis.c)."""

import numpy as np
import pytest

from petiga_tpu.core.axis import Axis


def test_uniform_open_knots_p2():
    ax = Axis.uniform(p=2, nel=4)
    # p=2, C=1 ⇒ s=1, m = 2*3 + 3*1 - 1 = 8
    expected = [0, 0, 0, 0.25, 0.5, 0.75, 1, 1, 1]
    np.testing.assert_allclose(ax.U, expected)
    assert ax.nbasis == 6
    assert ax.nnp == 6
    assert ax.nel == 4
    np.testing.assert_array_equal(ax.spans, [2, 3, 4, 5])


def test_uniform_c0():
    ax = Axis.uniform(p=2, nel=3, continuity=0)
    expected = [0, 0, 0, 1 / 3, 1 / 3, 2 / 3, 2 / 3, 1, 1, 1]
    np.testing.assert_allclose(ax.U, expected)
    assert ax.nbasis == 7
    assert ax.nel == 3


def test_periodic_unwrap():
    # p=2, C=1 periodic, N=4: nnp = n - C
    ax = Axis.uniform(p=2, nel=4, periodic=True)
    n = ax.n
    assert ax.nnp == n - 1
    # periodic knots wrap: U[1] = U[p] - U[m-p] + U[n-0]
    p, m = ax.p, ax.m
    U = ax.U
    np.testing.assert_allclose(U[1], U[p] - U[m - p] + U[n])
    np.testing.assert_allclose(U[m - 1], U[m - p] - U[p] + U[p + 1])


def test_breaks_nonuniform():
    ax = Axis.breaks(p=3, breaks=[0.0, 0.1, 0.5, 1.0])
    assert ax.nel == 3
    assert ax.limits == (0.0, 1.0)
    # interior breaks have multiplicity 1 (maximal continuity)
    assert np.sum(ax.U == 0.1) == 1


def test_greville_uniform():
    ax = Axis.uniform(p=2, nel=4)
    g = ax.greville()
    # p=2: averages of 2 consecutive interior knots
    expected = [0, 0.125, 0.375, 0.625, 0.875, 1.0]
    np.testing.assert_allclose(g, expected)


def test_find_span():
    ax = Axis.uniform(p=2, nel=4)
    np.testing.assert_array_equal(ax.find_span([0.0, 0.3, 0.99, 1.0]), [2, 3, 5, 5])
    np.testing.assert_array_equal(ax.element_of([0.0, 0.3, 0.99, 1.0]), [0, 1, 3, 3])


def test_validation_errors():
    with pytest.raises(ValueError):
        Axis.uniform(p=0, nel=4)
    with pytest.raises(ValueError):
        Axis.uniform(p=2, nel=0)
    with pytest.raises(ValueError):
        Axis.uniform(p=2, nel=4, continuity=2)
    with pytest.raises(ValueError):
        Axis.from_knots(2, [0, 0, 1, 1])
