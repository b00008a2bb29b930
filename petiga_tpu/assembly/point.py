"""Quadrature-point view handed to user forms — the analog of
``IGAPoint`` (petiga.h:644-738, petigapoint.c, petigaval.F90:183-287).

A :class:`Point` is a per-point slice of a :class:`PointBlock` produced
by vmapping the form over elements and scanning over quadrature points.
Field-evaluation helpers contract the tabulated shape functions with the
element coefficient closure ``Ue`` of shape ``(nen, dof)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["Point"]


class Point(NamedTuple):
    """One quadrature point of one element (unweighted view; the
    assembly applies ``weight`` when accumulating, matching
    ``IGAPointAddMat/Vec``, petigapoint.c:451-492)."""

    u: jnp.ndarray  # (dim,) parametric coords
    x: jnp.ndarray  # (nsd,) physical coords
    shape0: jnp.ndarray  # (nen,)
    shape1: Optional[jnp.ndarray] = None  # (nen, nsd)
    shape2: Optional[jnp.ndarray] = None  # (nen, nsd, nsd)
    shape3: Optional[jnp.ndarray] = None  # (nen, nsd, nsd, nsd)
    shape4: Optional[jnp.ndarray] = None  # (nen, nsd, nsd, nsd, nsd)
    normal: Optional[jnp.ndarray] = None  # (nsd,)
    gmap1: Optional[jnp.ndarray] = None  # (nsd, dim) surface tangents
    gmap2: Optional[jnp.ndarray] = None  # (nsd, dim, dim) curvatures

    @property
    def nen(self) -> int:
        return self.shape0.shape[0]

    @property
    def dim(self) -> int:
        return self.u.shape[0]

    @property
    def nsd(self) -> int:
        return self.x.shape[0]

    # --- field evaluation (IGA_GetValue/Grad/Hess/Del2/Der3, petigaval.F90)

    def value(self, Ue) -> jnp.ndarray:
        """u(x): (dof,)"""
        return jnp.einsum("n,nd->d", self.shape0, Ue)

    def grad(self, Ue) -> jnp.ndarray:
        """∇u: (dof, nsd)"""
        return jnp.einsum("ni,nd->di", self.shape1, Ue)

    def hess(self, Ue) -> jnp.ndarray:
        """∇∇u: (dof, nsd, nsd)"""
        return jnp.einsum("nij,nd->dij", self.shape2, Ue)

    def del2(self, Ue) -> jnp.ndarray:
        """Δu: (dof,)"""
        return jnp.einsum("nii,nd->d", self.shape2, Ue)

    def der3(self, Ue) -> jnp.ndarray:
        """3rd derivatives: (dof, nsd, nsd, nsd)"""
        return jnp.einsum("nijk,nd->dijk", self.shape3, Ue)

    def der4(self, Ue) -> jnp.ndarray:
        """4th derivatives: (dof, nsd, nsd, nsd, nsd) (IGA_GetDer4,
        petigaval.F90:271-287; parametric-domain only, like the
        reference's unimplemented order-4 pushforward)."""
        return jnp.einsum("nijkl,nd->dijkl", self.shape4, Ue)
