"""Sharded checkpoint I/O: per-device-block files + manifest are
mesh-independent — write under one process grid, read under another or
serially (the natural-ordering contract of petigagrid.c:469-576)."""

import numpy as np
import jax
import jax.numpy as jnp

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.io.checkpoint import read_vec
from petiga_tpu.io.sharded import (
    load_sharded,
    save_sharded,
    sharded_to_petiga_binary,
)
from petiga_tpu.parallel.dist import DistSpace

F64 = jnp.float64


def _space(nel=9, dof=2):
    return Space([Axis.uniform(p=2, nel=nel) for _ in range(2)],
                 dof=dof, dtype=F64)


def test_sharded_roundtrip_and_repartition(tmp_path):
    sp = _space()
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(size=(sp.nnodes, sp.dof)))

    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    save_sharded(ds, U, str(tmp_path), "U")

    # host-side load (no mesh)
    flat = load_sharded(str(tmp_path), "U")
    np.testing.assert_allclose(flat, np.asarray(U), atol=0)

    # repartitioning restart: different pgrid, different device count
    sp2 = _space()
    ds2 = DistSpace(sp2, devices=jax.devices()[:8], pgrid=(4, 2))
    g2 = load_sharded(str(tmp_path), "U", ds=ds2)
    assert g2.shape == tuple(ds2.Np[::-1]) + (sp.dof,)
    np.testing.assert_allclose(
        np.asarray(ds2.crop_flat(g2)), np.asarray(U), atol=0
    )

    # and back out from the new partition
    save_sharded(ds2, g2, str(tmp_path), "V")
    np.testing.assert_allclose(
        load_sharded(str(tmp_path), "V"), np.asarray(U), atol=0
    )


def test_sharded_to_petiga_binary(tmp_path):
    sp = _space(nel=6, dof=1)
    U = jnp.arange(sp.nnodes, dtype=F64).reshape(-1, 1) / sp.nnodes
    ds = DistSpace(sp, devices=jax.devices()[:2], pgrid=(2, 1))
    save_sharded(ds, U, str(tmp_path), "U")
    out = str(tmp_path / "u.dat")
    sharded_to_petiga_binary(str(tmp_path), sp, out, "U")
    np.testing.assert_allclose(
        np.asarray(read_vec(sp, out)), np.asarray(U), atol=0
    )


def test_sharded_mismatch_raises(tmp_path):
    sp = _space(nel=6, dof=1)
    ds = DistSpace(sp, devices=jax.devices()[:2], pgrid=(2, 1))
    save_sharded(ds, jnp.zeros((sp.nnodes, 1), F64), str(tmp_path), "U")
    other = _space(nel=9, dof=1)
    dso = DistSpace(other, devices=jax.devices()[:2], pgrid=(2, 1))
    import pytest

    with pytest.raises(ValueError):
        load_sharded(str(tmp_path), "U", ds=dso)


def test_load_sharded_reads_only_overlapping_shards(tmp_path, monkeypatch):
    """The ds-targeted load assembles each device block from only the
    source shards overlapping it (the multi-host restart contract:
    a process never reads shards outside its addressable blocks)."""
    from petiga_tpu.models.poisson import make_space
    from petiga_tpu.parallel.dist import DistSpace
    from petiga_tpu.io import sharded as sh

    sp = make_space(2, p=2, nel=10, dtype=jnp.float64)
    ds = DistSpace(sp, devices=jax.devices()[:4], pgrid=(2, 2))
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(sp.nnodes, 1)))
    sh.save_sharded(ds, U, str(tmp_path), "U")

    reads = []
    orig = np.load

    def counting_load(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(np, "load", counting_load)
    sp2 = make_space(2, p=2, nel=10, dtype=jnp.float64)
    ds2 = DistSpace(sp2, devices=jax.devices()[:4], pgrid=(2, 2))
    out = sh.load_sharded(str(tmp_path), "U", ds=ds2)
    np.testing.assert_allclose(
        np.asarray(ds2.crop_flat(out)), np.asarray(U), atol=1e-14
    )
    # matched partitions: every source shard is read exactly once (the
    # per-file cache), none more — no global gather
    assert sorted(set(reads)) == sorted(reads)
    assert len(reads) == 4
