"""Per-axis tabulation tables: integration identities, collocation."""

import numpy as np
import pytest

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.basis import tabulate, tabulate_collocation, BasisType
from petiga_tpu.core.quadrature import Rule


@pytest.mark.parametrize("p", [1, 2, 3])
def test_mass_integral(p):
    """Integral of each basis sums over elements to axis length / pou."""
    ax = Axis.uniform(p=p, nel=6)
    tab = tabulate(ax, Rule.legendre(p + 1))
    # sum over elements/qps of w*detJ*N_a = integral of N_a;
    # total = length of domain (partition of unity)
    total = np.einsum("eq,e,eqa->", tab.weight, tab.detJac, tab.value[:, :, 0, :])
    np.testing.assert_allclose(total, 1.0, atol=1e-13)


def test_reduced_rule():
    ax = Axis.uniform(p=2, nel=5)
    tab = tabulate(ax, Rule.reduced(3))
    # interior elements: last weight zero
    assert np.all(tab.weight[1:-1, -1] == 0)
    assert np.all(tab.weight[0] > 0) and np.all(tab.weight[-1] > 0)
    # integrals still exact for degree <= 2*(q-1)-1 = 3 >= mass of p=2? no —
    # partition of unity integral is degree p=2 per element, q-1=2 points
    # are exact to degree 3, so still exact:
    total = np.einsum("eq,e,eqa->", tab.weight, tab.detJac, tab.value[:, :, 0, :])
    np.testing.assert_allclose(total, 1.0, atol=1e-13)


def test_offsets_and_boundary_tables():
    ax = Axis.uniform(p=2, nel=4)
    tab = tabulate(ax, Rule.legendre(3))
    np.testing.assert_array_equal(tab.offset, [0, 1, 2, 3])
    # boundary values: clamped B-spline interpolates at ends
    np.testing.assert_allclose(tab.bnd_value[0, 0, :], [1, 0, 0], atol=1e-13)
    np.testing.assert_allclose(tab.bnd_value[1, 0, :], [0, 0, 1], atol=1e-13)


def test_collocation_tables():
    ax = Axis.uniform(p=3, nel=5)
    tab = tabulate_collocation(ax)
    assert tab.nel == ax.nnp
    assert tab.nqp == 1
    # partition of unity at every Greville point
    np.testing.assert_allclose(tab.value[:, 0, 0, :].sum(axis=1), 1.0, atol=1e-13)


def test_collocation_periodic_shift():
    ax = Axis.uniform(p=2, nel=8, periodic=True)
    tab = tabulate_collocation(ax)
    assert tab.nel == ax.nnp


@pytest.mark.parametrize("btype", [BasisType.LAGRANGE, BasisType.SPECTRAL])
def test_c0_basis_types(btype):
    ax = Axis.uniform(p=3, nel=4, continuity=0)
    tab = tabulate(ax, Rule.legendre(4), basis_type=btype)
    total = np.einsum("eq,e,eqa->", tab.weight, tab.detJac, tab.value[:, :, 0, :])
    np.testing.assert_allclose(total, 1.0, atol=1e-12)


def test_c0_required_for_lagrange():
    ax = Axis.uniform(p=3, nel=4)  # C^2
    with pytest.raises(ValueError):
        tabulate(ax, Rule.legendre(4), basis_type=BasisType.LAGRANGE)
