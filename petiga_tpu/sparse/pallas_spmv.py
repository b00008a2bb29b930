"""Pallas TPU stencil-SpMV kernel.

The XLA slot-loop SpMV reaches only ~7-8% of the HBM roofline (each of
the K shifted multiply-adds becomes its own pass).  This kernel streams
the slot data through VMEM one z-plane per grid step while the whole
halo-padded x lives in VMEM, so the matrix is read exactly once:

  grid  = (Nz,)
  data  block (1, Ny, Nx, K[, dof, dof])   — ~2 MB/plane for 64^2 p=2
  xp    whole (Nz+2p, Ny+2p, Nx+2p[, dof]) — ~1.4 MB for 64^3
  y     block (1, Ny, Nx[, dof])

Use ``spmv(A, x, use_pallas=True)`` or :func:`pallas_matvec` directly;
falls back to :meth:`StencilMatrix.matvec` off-TPU.  3-D only (1-D/2-D
operators are small enough for the XLA path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_matvec", "supported"]


def supported(stencil) -> bool:
    # dof > 1 would leave trailing unit/small dims that Mosaic pads to
    # full (8,128) tiles (catastrophic VMEM blow-up); use the XLA path
    return stencil.dim == 3 and stencil.dof == 1


@functools.partial(
    jax.jit, static_argnames=("N", "widths", "periodic", "dof", "interpret")
)
def _pallas_matvec_3d(data, x, *, N, widths, periodic, dof, interpret=False):
    """data: (nnodes, K, dof, dof); x: (nnodes, dof) — flat node index
    axis-0 fastest; returns y (nnodes, dof)."""
    N0, N1, N2 = N  # spatial axis sizes (x, y, z)
    p0, p1, p2 = widths
    K = data.shape[1]
    # offsets per slot, axis-0 fastest (matches Stencil.slot_offsets)
    offs = [
        (ox, oy, oz)
        for oz in range(-p2, p2 + 1)
        for oy in range(-p1, p1 + 1)
        for ox in range(-p0, p0 + 1)
    ]

    assert dof == 1
    xg = x.reshape(N2, N1, N0)
    pads = [(p2, p2), (p1, p1), (p0, p0)]
    modes = [periodic[2], periodic[1], periodic[0]]
    xp = xg
    for g in range(3):
        pw = [(0, 0)] * 3
        pw[g] = pads[g]
        xp = jnp.pad(xp, pw, mode="wrap" if modes[g] else "constant")

    dg = data.reshape(N2, N1, N0, K)

    def kernel(d_ref, xp_ref, y_ref):
        z = pl.program_id(0)
        acc = jnp.zeros((N1, N0), xp_ref.dtype)
        for s, (ox, oy, oz) in enumerate(offs):
            xs = xp_ref[
                z + p2 + oz,
                p1 + oy : p1 + oy + N1,
                p0 + ox : p0 + ox + N0,
            ]
            acc = acc + d_ref[0, :, :, s] * xs
        y_ref[0] = acc

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N2, N1, N0), x.dtype),
        grid=(N2,),
        in_specs=[
            pl.BlockSpec(
                (1, N1, N0, K),
                lambda z: (z, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N1, N0), lambda z: (z, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(dg, xp)
    return y.reshape(-1, dof)


def pallas_matvec(A, x, interpret: bool = False):
    """SpMV through the Pallas kernel (3-D stencils)."""
    st = A.stencil
    if not supported(st):
        return A.matvec(x)
    flat_in = x.ndim == 1
    xv = x.reshape(st.nnodes, st.dof)
    y = _pallas_matvec_3d(
        A.data,
        xv,
        N=tuple(st.node_shape),
        widths=tuple(st.widths),
        periodic=tuple(st.periodic),
        dof=st.dof,
        interpret=interpret,
    )
    return y.reshape(-1) if flat_in else y
