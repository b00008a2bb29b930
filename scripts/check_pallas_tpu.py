"""Real-TPU (Mosaic) correctness spot-check of the Pallas stencil SpMV:
open / periodic / mixed / dof=3 layouts vs the XLA slot-loop matvec.

Writes artifacts/pallas_tpu_check.json.  Run with
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_pallas_tpu.py
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from petiga_tpu.core.axis import Axis
from petiga_tpu.core.space import Space
from petiga_tpu.assembly.assemble import assemble_system
from petiga_tpu.sparse.pallas_spmv import PallasStencilOperator


def mass(pt, ctx):
    return jnp.outer(pt.shape0, pt.shape0), pt.shape0 * 1.0


def block_form(dof):
    def form(pt, ctx):
        K = jnp.outer(pt.shape0, pt.shape0) + pt.shape1 @ pt.shape1.T
        C = jnp.asarray(
            [[2.0 + a + 0.3 * b for b in range(dof)] for a in range(dof)],
            jnp.float32,
        )
        return jnp.einsum("ij,ab->iajb", K, C), jnp.zeros(
            (pt.nen, dof), jnp.float32
        )

    return form


def run_dist_case():
    """Per-device kernel through the real shard_map path on ONE chip
    (1-device mesh): the distributed matvec must match the serial XLA
    matvec bit-for-bit in structure (same halo-frame layout real
    multi-chip solves use)."""
    from petiga_tpu.parallel.dist import DistSpace
    from petiga_tpu.models.poisson import make_space, poisson_system

    sp = make_space(3, p=2, nel=16, dtype=jnp.float32)
    ds = DistSpace(sp, devices=jax.devices()[:1], use_pallas=True)
    if ds._pk is None:
        return {"case": "dist_1dev_pallas", "ok": False,
                "note": "kernel plan unsupported"}
    data, b = ds.assemble_system(poisson_system, {"c": 0.0, "k": 1.0})
    x, it, res = ds.cg(data, b, rtol=1e-6)
    from petiga_tpu.models.poisson import l2_error
    err = float(l2_error(sp, ds.crop_flat(x)))
    return {"case": "dist_1dev_pallas", "iters": int(it),
            "residual": float(res), "l2": err,
            "ok": bool(np.isfinite(err) and err < 1e-3)}


CASES = [
    ("open_p2_16", dict(p=2, nel=16, periodic=False, dof=1)),
    ("periodic_p2_16", dict(p=2, nel=16, periodic=True, dof=1)),
    ("dof3_p1_12", dict(p=1, nel=12, periodic=False, dof=3)),
    # the double-buffered DMA-window variant (the 256^3 layout where x
    # exceeds the VMEM budget), forced at testable size
    ("hbm_open_p2_16", dict(p=2, nel=16, periodic=False, dof=1,
                            force="hbm")),
    ("hbm_dof2_p1_12", dict(p=1, nel=12, periodic=False, dof=2,
                            force="hbm")),
]


def run_case(name, cfg):
    dof = cfg["dof"]
    sp = Space(
        [
            Axis.uniform(p=cfg["p"], nel=cfg["nel"], periodic=cfg["periodic"])
            for _ in range(3)
        ],
        dof=dof,
        dtype=jnp.float32,
    )
    form = mass if dof == 1 else block_form(dof)
    from petiga_tpu.sparse.stencil import StencilMatrix
    from petiga_tpu.assembly.assemble import stencil_of

    data = jax.jit(
        lambda: assemble_system(sp, form, apply_fix=False)[0].data
    )()
    A = StencilMatrix(stencil_of(sp), data)
    op = PallasStencilOperator(A, force_kind=cfg.get("force"))
    assert op.ok, name
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(sp.nnodes, dof)), jnp.float32)
    t0 = time.time()
    y_pal = jax.block_until_ready(jax.jit(op.matvec)(x))
    compile_s = time.time() - t0
    y_xla = jax.block_until_ready(jax.jit(A.matvec)(x))
    # host float64 reference from the block-COO export: catches silent
    # XLA-TPU miscompiles (reshape+pad+slice fusion — see
    # StencilMatrix.matvec) as well as kernel bugs
    rows, cols, blocks = A.to_coo()
    xh = np.asarray(x, np.float64)
    yh = np.zeros((sp.nnodes, dof))
    np.add.at(
        yh, rows,
        np.einsum("nab,nb->na", np.asarray(blocks, np.float64), xh[cols]),
    )
    scale = max(np.max(np.abs(yh)), 1e-30)
    err_pal = float(np.max(np.abs(np.asarray(y_pal) - yh)) / scale)
    err_xla = float(np.max(np.abs(np.asarray(y_xla) - yh)) / scale)
    return {"case": name, "rel_err": err_pal, "rel_err_xla": err_xla,
            "kind": op.kind,
            "compile_s": round(compile_s, 1), "nnodes": sp.nnodes,
            "ok": bool(err_pal < 1e-5 and err_xla < 1e-5)}


def main():
    out = {"device": str(jax.devices()[0]), "cases": []}
    for name, cfg in CASES:
        r = run_case(name, cfg)
        print(json.dumps(r), flush=True)
        out["cases"].append(r)
    r = run_dist_case()
    print(json.dumps(r), flush=True)
    out["cases"].append(r)
    out["all_ok"] = all(c["ok"] for c in out["cases"])
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/pallas_tpu_check.json", "w") as f:
        json.dump(out, f, indent=1)
    print("all_ok:", out["all_ok"])


if __name__ == "__main__":
    main()
