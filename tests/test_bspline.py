"""B-spline / Lagrange basis evaluation: partition of unity, finite
differences, closed forms."""

import numpy as np
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.bspline import bspline_ders, lagrange_ders, bernstein_ders


@pytest.mark.parametrize("p", [1, 2, 3, 4, 5])
def test_partition_of_unity(p):
    ax = Axis.uniform(p=p, nel=5)
    u = np.linspace(0, 0.999, 37)
    spans = ax.find_span(u)
    ders = bspline_ders(ax.U, p, spans, u, min(p, 4))
    np.testing.assert_allclose(ders[:, 0, :].sum(axis=1), 1.0, atol=1e-13)
    for k in range(1, min(p, 4) + 1):
        np.testing.assert_allclose(ders[:, k, :].sum(axis=1), 0.0, atol=1e-9)


def test_linear_closed_form():
    # p=1 on [0,1] single element: N0 = 1-u, N1 = u
    ax = Axis.uniform(p=1, nel=1)
    u = np.array([0.25, 0.5, 0.75])
    ders = bspline_ders(ax.U, 1, ax.find_span(u), u, 1)
    np.testing.assert_allclose(ders[:, 0, 0], 1 - u)
    np.testing.assert_allclose(ders[:, 0, 1], u)
    np.testing.assert_allclose(ders[:, 1, 0], -1.0)
    np.testing.assert_allclose(ders[:, 1, 1], 1.0)


@pytest.mark.parametrize("p", [2, 3, 4])
def test_derivatives_vs_fd(p):
    ax = Axis.uniform(p=p, nel=4)
    u = np.array([0.13, 0.42, 0.77])
    h = 1e-6
    spans = ax.find_span(u)
    d = min(p, 4)
    f0 = bspline_ders(ax.U, p, spans, u, d)
    fp = bspline_ders(ax.U, p, ax.find_span(u + h), u + h, d)
    fm = bspline_ders(ax.U, p, ax.find_span(u - h), u - h, d)
    for k in range(d):
        fd = (fp[:, k, :] - fm[:, k, :]) / (2 * h)
        np.testing.assert_allclose(fd, f0[:, k + 1, :], rtol=1e-4, atol=1e-4)


def test_quadratic_uniform_midpoint():
    # classical uniform quadratic B-spline at midpoint of interior span:
    # values (1/8, 6/8, 1/8)
    ax = Axis.uniform(p=2, nel=8)
    u = np.array([0.5 - 1 / 16])  # midpoint of span [0.375, 0.5]... use exact mid
    u = np.array([(0.375 + 0.5) / 2])
    ders = bspline_ders(ax.U, 2, ax.find_span(u), u, 2)
    np.testing.assert_allclose(ders[0, 0, :], [1 / 8, 6 / 8, 1 / 8])


def test_lagrange_kronecker():
    nodes = np.linspace(0, 1, 4)
    ders = lagrange_ders(nodes, nodes, 2)
    np.testing.assert_allclose(ders[:, 0, :], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(ders[:, 0, :].sum(axis=1), 1.0, atol=1e-12)


def test_bernstein_pou_and_endpoints():
    u = np.linspace(0, 1, 9)
    ders = bernstein_ders(3, 0.0, 1.0, u, 2)
    np.testing.assert_allclose(ders[:, 0, :].sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(ders[0, 0, :], [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(ders[-1, 0, :], [0, 0, 0, 1], atol=1e-12)
