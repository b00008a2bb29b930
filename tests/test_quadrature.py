"""Quadrature rules: exactness orders (vs reference hard-coded tables,
petigarule.c:182-320)."""

import numpy as np
import pytest

from petiga_tpu.core.quadrature import Rule, gauss_legendre, gauss_lobatto


@pytest.mark.parametrize("q", range(1, 11))
def test_legendre_exactness(q):
    x, w = gauss_legendre(q)
    # exact for polynomials of degree <= 2q-1
    for deg in range(2 * q):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-13)


@pytest.mark.parametrize("q", range(2, 11))
def test_lobatto_exactness(q):
    x, w = gauss_lobatto(q)
    assert x[0] == -1.0 and x[-1] == 1.0
    for deg in range(2 * q - 3 + 1):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-12)


def test_known_values():
    x, w = gauss_legendre(2)
    np.testing.assert_allclose(np.abs(x), 1 / np.sqrt(3))
    np.testing.assert_allclose(w, [1, 1])
    x, w = gauss_lobatto(3)
    np.testing.assert_allclose(x, [-1, 0, 1])
    np.testing.assert_allclose(w, [1 / 3, 4 / 3, 1 / 3])


def test_rule_factory():
    assert Rule.make("legendre", 3).nqp == 3
    assert Rule.make("lobatto", 3).kind == "lobatto"
    assert Rule.make("reduced", 3).kind == "reduced"
    with pytest.raises(ValueError):
        Rule.make("nope", 3)
