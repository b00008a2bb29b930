"""Native C++ setup kernels: exact agreement with the numpy reference
implementations."""

import numpy as np
import pytest

from petiga_tpu import native
from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _numpy_ders(ax, u, nder):
    # force the pure-numpy path regardless of batch size
    from petiga_tpu.core import bspline as bs

    spans = ax.find_span(u)
    small = bs.bspline_ders(ax.U, ax.p, spans[:1], u[:1], nder)  # warm
    # call with small batches to stay on the numpy path
    parts = [
        bs.bspline_ders(ax.U, ax.p, spans[i : i + 1000], u[i : i + 1000], nder)
        for i in range(0, len(u), 1000)
    ]
    return np.concatenate(parts)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_native_bspline_matches_numpy(p):
    ax = Axis.uniform(p=p, nel=7)
    rng = np.random.default_rng(0)
    u = rng.random(5000) * 0.999
    spans = ax.find_span(u)
    d = min(p, 4)
    ref = _numpy_ders(ax, u, d)
    out = native.bspline_ders(ax.U, p, spans, u, d)
    np.testing.assert_allclose(out, ref, atol=1e-13)


def test_native_mapping_matches_numpy():
    # big enough to trip the native path in Space.mapping
    sp_big = Space(
        [Axis.uniform(p=2, nel=20), Axis.uniform(p=2, nel=20),
         Axis.uniform(p=2, nel=11, periodic=True)]
    )
    assert sp_big.nel >= 4096
    m_native = sp_big.mapping
    # numpy reference (the internal fallback)
    m_ref = native.build_mapping.__wrapped__ if False else None
    per_axis = sp_big.axis_node_index
    import numpy as np

    eshape = sp_big.elem_shape
    emulti = np.unravel_index(np.arange(sp_big.nel), eshape, order="F")
    grids = np.meshgrid(*[np.arange(n) for n in sp_big.nen_shape], indexing="ij")
    locs = [g.ravel(order="F") for g in grids]
    flat = np.zeros((sp_big.nel, sp_big.nen), dtype=np.int64)
    stride = 1
    for d in range(3):
        flat += per_axis[d][emulti[d]][:, locs[d]] * stride
        stride *= sp_big.node_shape[d]
    np.testing.assert_array_equal(m_native, flat.astype(np.int32))


def test_native_byteswap():
    rng = np.random.default_rng(1)
    a = rng.normal(size=1000)
    np.testing.assert_array_equal(
        native.byteswap_f64(a), a.astype(">f8").view(np.float64)
    )
