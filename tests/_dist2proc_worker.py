"""Worker for the two-process ``jax.distributed`` smoke test.

Run as: ``python _dist2proc_worker.py <pid> <nproc> <port> <outdir>``.

Each process owns 4 virtual CPU devices (8 global), builds the SAME
DistSpace layout (the multi-controller SPMD contract: all processes
trace identical programs), assembles and CG-solves 3-D Poisson on the
global mesh, writes its addressable shards, reloads under a DIFFERENT
process grid, and reports replicated global scalars for the driver to
compare against the serial answer.

Parity: the reference's multi-rank MPI execution
(``/root/reference/src/petigagrid.c:27-61``, petigapart.c:136-168) —
every rank derives the same partition from first principles, which is
exactly what ``IGACreate.c`` tests under ``mpiexec -n N``.
"""

import json
import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

out = {"pid": pid}


def finish(**kw):
    out.update(kw)
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    sys.exit(0)


import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
except Exception as e:  # environment refuses multi-process
    finish(skip=f"{type(e).__name__}: {e}"[:300])

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

try:
    out["local_devices"] = jax.local_device_count()
    out["global_devices"] = jax.device_count()
    assert jax.device_count() == 4 * nproc

    from petiga_tpu.models.poisson import make_space, poisson_system
    from petiga_tpu.parallel.dist import DistSpace
    from petiga_tpu.io.sharded import load_sharded, save_sharded

    sp = make_space(3, p=2, nel=8, dtype=jnp.float64)
    ds = DistSpace(sp, pgrid=(1, 2, 4), use_pallas=False)
    data, b = ds.assemble_system(poisson_system, {"c": 0.3, "k": 1.0})
    x, it, res = ds.cg(data, b, rtol=1e-11)

    N = sp.node_shape  # crop the alignment pads before comparing

    @jax.jit
    def norms(x, b):
        xc = x[: N[2], : N[1], : N[0]]
        bc = b[: N[2], : N[1], : N[0]]
        return jnp.vdot(xc, xc).real, jnp.vdot(bc, bc).real

    nx, nb = norms(x, b)
    out["x_norm2"] = float(nx)
    out["b_norm2"] = float(nb)
    out["iters"] = int(it)
    out["residual"] = float(res)

    # sharded save under (1,2,4); reload under (2,2,2): the manifest is
    # partition-independent (natural-order padded-grid slices)
    save_sharded(ds, x, outdir, "U")
    # all processes must see all shard files before reloading
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("shards-written")
    ds2 = DistSpace(sp, pgrid=(2, 2, 2), use_pallas=False)
    x2 = load_sharded(outdir, "U", ds=ds2)

    @jax.jit
    def norm2(v):
        vc = v[: N[2], : N[1], : N[0]]
        return jnp.vdot(vc, vc).real

    out["x2_norm2"] = float(norm2(x2))
    finish(ok=True)
except Exception as e:
    import traceback

    finish(error=f"{type(e).__name__}: {e}"[:500],
           tb=traceback.format_exc()[-1500:])
