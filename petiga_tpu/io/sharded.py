"""Sharded (per-device-block) checkpoint I/O.

The reference scales its checkpoints past one process with the
natural-ordering scatter machinery (``IGA_Grid_NewScatterApp``,
petigagrid.c:469-576): every rank writes/reads its own block of the
natural-order vector and MPI-IO glues the file together.  The TPU-native
analog: every *host* writes exactly the shards it can address
(``jax.Array.addressable_shards``) as individual ``.npy`` files next to
a tiny JSON manifest holding the padded-grid geometry, and on load each
device block is assembled from only the source shards overlapping it —
neither direction materialises the global vector on any host (except
the explicit serial path ``load_sharded(ds=None)``).  Because each
shard records its slice into the *padded natural-order grid*, a
checkpoint written under one process grid loads under any other (or
serially) — the same mesh-independence contract as :mod:`.checkpoint`,
extended to multi-host.

Layout on disk (``<dir>/<name>.meta.json`` + ``<dir>/<name>.shard<k>.npy``)::

    meta.json: {format, node_shape, pgrid, L, dof, dtype,
                shards: [{file, start, shape}, ...]}   # grid layout

``start``/``shape`` index the padded grid (reversed spatial axes,
trailing dof axis), so reassembly is pure slicing.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_sharded", "load_sharded", "sharded_to_petiga_binary"]

_FORMAT = "petiga_tpu-sharded-v1"


def _manifest_path(dirpath, name):
    return os.path.join(dirpath, f"{name}.meta.json")


def save_sharded(ds, U, dirpath: str, name: str = "U") -> None:
    """Write a distributed vector as per-shard files + manifest.

    ``U``: padded sharded grid (``Np_rev... , dof``) as produced by the
    distributed solvers, or a flat ``(nnodes, dof)`` array (it is padded
    and placed on the mesh first).  Multi-host: every process writes its
    addressable shards; process 0 writes the manifest (all processes
    compute identical manifests, so last-writer-wins is also safe on a
    shared filesystem).
    """
    sp = ds.space
    dof = sp.dof
    if U.ndim == 2 and U.shape[0] == sp.nnodes:
        U = ds.pad_grid(U)
    U = jax.device_put(U, ds.sharding(ds.grid_spec(1)))
    os.makedirs(dirpath, exist_ok=True)

    # manifest covers ALL shards (identical on every process); the data
    # files are written only by the process that can address them
    shards_meta = []
    global_shape = U.shape
    for k, sl in enumerate(_block_slices(ds, global_shape)):
        start = [s.start for s in sl]
        shape = [s.stop - s.start for s in sl]
        shards_meta.append(
            {"file": f"{name}.shard{k:05d}.npy", "start": start,
             "shape": shape}
        )

    for shard in U.addressable_shards:
        k = _shard_flat_index(ds, shard.index, global_shape)
        np.save(
            os.path.join(dirpath, shards_meta[k]["file"]),
            np.asarray(shard.data),
        )

    meta = {
        "format": _FORMAT,
        "node_shape": list(sp.node_shape),
        "pgrid": list(ds.pgrid),
        "L": list(ds.L),
        "dof": dof,
        "dtype": np.dtype(sp.dtype).name,
        "shards": shards_meta,
    }
    if jax.process_index() == 0:
        with open(_manifest_path(dirpath, name), "w") as f:
            json.dump(meta, f, indent=1)


def _block_slices(ds, global_shape):
    """Slices of every device block into the padded grid, in flat mesh
    order (spatial dim-1 slowest — matching ``DistSpace`` layout)."""
    dim = ds.space.dim
    out = []
    for coords in np.ndindex(*ds.pgrid[::-1]):  # (c_{dim-1}, ..., c_0)
        sl = []
        for g in range(dim):
            d = dim - 1 - g
            sl.append(slice(coords[g] * ds.L[d], (coords[g] + 1) * ds.L[d]))
        sl.append(slice(0, global_shape[-1]))
        out.append(tuple(sl))
    return out


def _shard_flat_index(ds, index, global_shape):
    """Flat mesh-order index of an addressable shard from its slice
    tuple into the global padded array."""
    dim = ds.space.dim
    k = 0
    for g in range(dim):
        d = dim - 1 - g
        start = index[g].start or 0
        k = k * ds.pgrid[d] + start // ds.L[d]
    return k


def load_sharded(dirpath: str, name: str = "U", *, ds=None):
    """Load a sharded checkpoint.

    With ``ds`` given, returns a padded grid array sharded over ``ds``'s
    mesh — the target process grid may differ from the one that wrote
    the checkpoint (repartitioning restart, the property petigagrid.c's
    natural-order scatters exist for).  Each device block is assembled
    from only the source shards overlapping it, so a multi-host process
    never reads shards outside its addressable blocks and never
    materialises the global vector.  Without ``ds``, the full flat
    natural-order ``(nnodes, dof)`` numpy array is gathered on the host
    (the serial/debug path).
    """
    with open(_manifest_path(dirpath, name)) as f:
        meta = json.load(f)
    if meta.get("format") != _FORMAT:
        raise IOError(f"not a sharded checkpoint: {meta.get('format')}")
    N = meta["node_shape"]
    L = meta["L"]
    pgrid = meta["pgrid"]
    dof = meta["dof"]
    dim = len(N)
    dtype = np.dtype(meta["dtype"])

    if ds is None:
        Np = [L[d] * pgrid[d] for d in range(dim)]
        g = np.zeros(tuple(Np[::-1]) + (dof,), dtype)
        for sh in meta["shards"]:
            sl = tuple(
                slice(s, s + n) for s, n in zip(sh["start"], sh["shape"])
            )
            g[sl] = np.load(os.path.join(dirpath, sh["file"]))
        crop = tuple(slice(0, N[d]) for d in range(dim))[::-1]
        return g[crop].reshape(-1, dof)

    sp = ds.space
    if list(sp.node_shape) != N or sp.dof != dof:
        raise ValueError(
            f"checkpoint grid {N}x{dof} does not match space "
            f"{sp.node_shape}x{sp.dof}"
        )
    # real-region extent per grid axis g (reversed layout): both the
    # source and target padded grids share the origin and crop to N
    real = [N[dim - 1 - g] for g in range(dim)]
    global_shape = tuple(ds.Np[::-1]) + (dof,)
    cache: dict = {}

    def shard_arr(sh):
        f = sh["file"]
        if f not in cache:
            cache[f] = np.load(os.path.join(dirpath, f))
        return cache[f]

    def build_block(index):
        # normalize (None starts/stops on full-extent slices)
        norm = [
            s.indices(global_shape[g]) for g, s in enumerate(index)
        ]
        out = np.zeros(
            tuple(hi - lo for lo, hi, _ in norm), sp.dtype
        )
        t_lo = [norm[g][0] for g in range(dim)]
        t_hi = [norm[g][1] for g in range(dim)]
        for sh in meta["shards"]:
            lo = [max(t_lo[g], sh["start"][g]) for g in range(dim)]
            hi = [
                min(t_hi[g], sh["start"][g] + sh["shape"][g], real[g])
                for g in range(dim)
            ]
            if any(lo[g] >= hi[g] for g in range(dim)):
                continue
            src = tuple(
                slice(lo[g] - sh["start"][g], hi[g] - sh["start"][g])
                for g in range(dim)
            ) + (slice(None),)
            dst = tuple(
                slice(lo[g] - t_lo[g], hi[g] - t_lo[g]) for g in range(dim)
            ) + (slice(None),)
            out[dst] = shard_arr(sh)[src]
        return out

    return jax.make_array_from_callback(
        global_shape, ds.sharding(ds.grid_spec(1)), build_block
    )


def sharded_to_petiga_binary(dirpath: str, space, path: str,
                             name: str = "U") -> None:
    """Convert a sharded checkpoint to the reference's single-file
    PetIGA/PETSc binary (petigaio.c:644-736) for interop with PetIGA
    and igakit."""
    from .checkpoint import write_vec

    write_vec(space, load_sharded(dirpath, name), path)
