"""Arbitrary-point solution evaluation — the analog of ``IGAProbe``
(petigaprobe.c): FindSpan → closure gather → 1-D basis eval → tensor
product → rationalize → geometry/inverse map → value/grad/hess.

Points are parametric; evaluation reuses the batched device tabulation
pipeline with each probe point treated as a one-point "element".  There
is no off-process collective path — arrays are globally addressable on
the mesh, which is the TPU-native answer to petigaprobe.c:295-307.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..assembly.tabulation import (
    geometry_map,
    inverse_map,
    push_forward,
    rationalize,
    tensor_basis,
)
from ..core.bspline import MAX_DER, bspline_ders

__all__ = ["Probe", "FixedProbe"]


class Probe:
    """Evaluate fields of a space at arbitrary parametric points."""

    def __init__(self, space, U=None, order: int = 2):
        self.space = space
        self.order = min(order, space.order)
        self.U = None if U is None else jnp.asarray(U).reshape(
            space.nnodes, space.dof
        )

    def set_vec(self, U):
        self.U = jnp.asarray(U).reshape(self.space.nnodes, self.space.dof)
        return self

    # ------------------------------------------------------------- internals

    def _tabulate(self, u):
        """u: (npts, dim) parametric points -> (shape tables, emap, x)."""
        sp = self.space
        dim = sp.dim
        u = np.atleast_2d(np.asarray(u, dtype=np.float64))
        npts = u.shape[0]
        d = self.order

        axis_tables = []
        closures = []
        for ax_i in range(dim):
            ax = sp.axes[ax_i]
            ui = u[:, ax_i]
            if ax.periodic:
                u0, u1 = ax.limits
                ui = u0 + np.mod(ui - u0, u1 - u0)
            spans = ax.find_span(ui)
            ders = bspline_ders(ax.U, ax.p, spans, ui, min(ax.p, MAX_DER))
            tab = np.zeros((npts, 1, MAX_DER + 1, ax.p + 1))
            tab[:, 0, : ders.shape[1], :] = ders
            axis_tables.append(jnp.asarray(tab, sp.dtype))
            idx = spans[:, None] - ax.p + np.arange(ax.p + 1)[None, :]
            closures.append(np.mod(idx, ax.nnp))
        # flat closure node indices (axis-0 fastest local ordering)
        grids = np.meshgrid(*[np.arange(n) for n in sp.nen_shape], indexing="ij")
        locs = [g.ravel(order="F") for g in grids]
        emap = np.zeros((npts, sp.nen), dtype=np.int64)
        stride = 1
        for ax_i in range(dim):
            emap += closures[ax_i][:, locs[ax_i]] * stride
            stride *= sp.node_shape[ax_i]
        emap = jnp.asarray(emap)

        N = tensor_basis(axis_tables, self.order)
        if sp.is_rational:
            W = sp.device("rational")[emap]
            N = rationalize(N, W)
        x = jnp.asarray(u, sp.dtype)[:, None, :]
        S = N
        detX = None
        if sp.has_geometry:
            Xe = sp.device("geometry")[emap]
            X = geometry_map(N, Xe)
            x = X[0]
            if dim == sp.nsd and self.order >= 1:
                detX, E = inverse_map(X)
                S = push_forward(N, E)
        return S, emap, x

    def _contract(self, Sk, emap, extra_axes):
        Ue = self.U[emap]  # (npts, nen, dof)
        eq = {0: "pqn,pnd->pd", 1: "pqni,pnd->pdi", 2: "pqnij,pnd->pdij",
              3: "pqnijk,pnd->pdijk", 4: "pqnijkl,pnd->pdijkl"}[extra_axes]
        return jnp.einsum(eq, Sk, Ue)

    # ------------------------------------------------------------------ API

    def value(self, u):
        """(npts, dof) field values at parametric points u (npts, dim)."""
        S, emap, _ = self._tabulate(u)
        return self._contract(S[0], emap, 0)

    def grad(self, u):
        S, emap, _ = self._tabulate(u)
        return self._contract(S[1], emap, 1)

    def hess(self, u):
        S, emap, _ = self._tabulate(u)
        return self._contract(S[2], emap, 2)

    def der3(self, u):
        """(npts, dof, nsd, nsd, nsd) third derivatives (needs order>=3)."""
        S, emap, _ = self._tabulate(u)
        return self._contract(S[3], emap, 3)

    def der4(self, u):
        """(npts, dof, nsd⁴) fourth derivatives (needs order=4)."""
        S, emap, _ = self._tabulate(u)
        return self._contract(S[4], emap, 4)

    def geometry(self, u):
        """(npts, nsd) mapped physical coordinates."""
        _, _, x = self._tabulate(u)
        return x[:, 0, :]

    def evaluate(self, u):
        """(value, grad) in one pass."""
        S, emap, _ = self._tabulate(u)
        return self._contract(S[0], emap, 0), self._contract(S[1], emap, 1)


class FixedProbe:
    """Probe at a FIXED set of parametric points, tabulated once.

    The host-side span search / 1-D basis evaluation of :class:`Probe`
    runs exactly once at construction; every evaluator afterwards is a
    pure device gather+einsum on the supplied coefficient vector — fully
    jittable and safe inside ``lax.scan``/``while_loop`` (a TS monitor
    probing points each step adds **zero** eager dispatches, unlike the
    reference's per-call IGAProbeSetPoint + IGAProbeFormValue,
    petigaprobe.c:319-410, and unlike :class:`Probe` whose per-call host
    tabulation costs 10-50 ms/op on a remote TPU).

    Example (sampling a point each adaptive time step)::

        probe = FixedProbe(space, [[0.5, 0.5]])
        def monitor(U):           # called inside the compiled stepper
            return probe.value(U)[0, 0]
    """

    def __init__(self, space, u, order: int = 2):
        self.space = space
        S, emap, x = Probe(space, None, order)._tabulate(u)
        self.S = S
        self.emap = emap
        self.x = x[:, 0, :]
        self.order = min(order, space.order)

    def _contract(self, Sk, U, extra_axes):
        U = jnp.asarray(U).reshape(self.space.nnodes, self.space.dof)
        Ue = U[self.emap]  # (npts, nen, dof)
        eq = {0: "pqn,pnd->pd", 1: "pqni,pnd->pdi", 2: "pqnij,pnd->pdij",
              3: "pqnijk,pnd->pdijk", 4: "pqnijkl,pnd->pdijkl"}[extra_axes]
        return jnp.einsum(eq, Sk, Ue)

    def value(self, U):
        """(npts, dof) values of U at the fixed points — device-only."""
        return self._contract(self.S[0], U, 0)

    def grad(self, U):
        return self._contract(self.S[1], U, 1)

    def hess(self, U):
        return self._contract(self.S[2], U, 2)

    def der3(self, U):
        return self._contract(self.S[3], U, 3)

    def der4(self, U):
        return self._contract(self.S[4], U, 4)

    def geometry(self):
        """(npts, nsd) mapped physical coordinates of the fixed points."""
        return self.x

    def evaluate(self, U):
        """(value, grad) in one pass."""
        return self.value(U), self.grad(U)
