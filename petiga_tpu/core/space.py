"""The tensor-product discretization object (analog of the reference ``IGA``).

A :class:`Space` bundles ``dim`` axes (knot vectors + tabulation tables),
the number of dofs per control point, optional NURBS weights / geometry
control points / property fields, and all derived static index maps:

  * node grid shape ``(N_0, ..., N_{dim-1})`` of unique control points,
  * element grid shape,
  * the element → control-point closure map (``mapping`` in the reference,
    petigaelem.c:693-755) expressed per axis as index tables,
  * per-element Dirichlet fix tables (petigaelem.c:1263-1325),
  * the stencil-slot machinery behind the Block-ELL / stencil operator
    (reference sparsity logic: petigamat.c:197-267).

All of this is computed once on the host in numpy; device code receives
dense arrays of static shape.  Indexing convention throughout: axis 0
fastest ("natural ordering", matching the reference's file ordering) —
``flat = i0 + N0*(i1 + N1*i2)``.

Reference: /root/reference/src/petiga.c (object + setup staging),
/root/reference/include/petiga.h:327-391 (struct _p_IGA).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .axis import Axis
from .basis import BasisType, Tabulation, tabulate, tabulate_collocation
from .quadrature import Rule

__all__ = ["Space", "BoundaryCondition"]


@dataclasses.dataclass
class BoundaryCondition:
    """Per-face boundary data (analog of IGAFormBC, petiga.h:220-225).

    ``value``: list of (field, value) strong Dirichlet conditions.
    ``load``: list of (field, value) nodal fluxes added to the RHS.
    """

    value: list  # [(field, value)]
    load: list  # [(field, value)]


def _flatten_index(multi: Sequence[np.ndarray], shape: Sequence[int]) -> np.ndarray:
    """Axis-0-fastest flattening."""
    flat = np.zeros_like(multi[0])
    stride = 1
    for idx, n in zip(multi, shape):
        flat = flat + idx * stride
        stride *= n
    return flat


class Space:
    """An IGA function space on a tensor-product patch."""

    def __init__(
        self,
        axes: Sequence[Axis],
        dof: int = 1,
        *,
        rule: Optional[Sequence[Rule]] = None,
        quadrature: Optional[Sequence[int]] = None,
        basis_type: str = BasisType.BSPLINE,
        collocation: bool = False,
        order: Optional[int] = None,
        nsd: Optional[int] = None,
        dtype: Any = jnp.float32,
    ):
        self.axes = tuple(axes)
        self.dim = len(self.axes)
        if not (1 <= self.dim <= 3):
            raise ValueError("dim must be 1, 2, or 3")
        self.dof = int(dof)
        self.nsd = self.dim if nsd is None else int(nsd)
        self.dtype = dtype
        self.collocation = bool(collocation)
        self.basis_type = basis_type
        maxp = max(ax.p for ax in self.axes)
        self.order = min(maxp, 4) if order is None else int(order)

        # quadrature rules (default p+1 Gauss points per axis, petigabasis.c:103)
        if rule is None:
            sizes = quadrature or [ax.p + 1 for ax in self.axes]
            rule = [Rule.legendre(q) for q in sizes]
        self.rules = tuple(rule)

        # per-axis tabulation
        if collocation:
            self.tabs: tuple[Tabulation, ...] = tuple(
                tabulate_collocation(ax) for ax in self.axes
            )
        else:
            self.tabs = tuple(
                tabulate(ax, r, basis_type) for ax, r in zip(self.axes, self.rules)
            )

        # geometry / rational weights / properties — set via init_geometry
        self.geometry: Optional[np.ndarray] = None  # (nnodes, nsd)
        self.rational: Optional[np.ndarray] = None  # (nnodes,)
        self.property: Optional[np.ndarray] = None  # (nnodes, npd)
        self.fix_table: Optional[np.ndarray] = None  # (nnodes, dof) values or None

        # boundary conditions: bc[axis][side] (petigaform.c:112-264)
        self.bc = [[BoundaryCondition([], []) for _ in range(2)] for _ in range(self.dim)]
        self.bc_visit = [[False, False] for _ in range(self.dim)]  # boundary-form flags

        self._device_cache: dict = {}

    # ------------------------------------------------------------------ sizes

    @cached_property
    def node_shape(self) -> tuple[int, ...]:
        """Unique control points per axis (nnp)."""
        return tuple(ax.nnp for ax in self.axes)

    @cached_property
    def elem_shape(self) -> tuple[int, ...]:
        return tuple(t.nel for t in self.tabs)

    @property
    def nnodes(self) -> int:
        return int(np.prod(self.node_shape))

    @property
    def nel(self) -> int:
        return int(np.prod(self.elem_shape))

    @cached_property
    def nen_shape(self) -> tuple[int, ...]:
        return tuple(ax.p + 1 for ax in self.axes)

    @property
    def nen(self) -> int:
        return int(np.prod(self.nen_shape))

    @cached_property
    def nqp_shape(self) -> tuple[int, ...]:
        return tuple(t.nqp for t in self.tabs)

    @property
    def nqp(self) -> int:
        return int(np.prod(self.nqp_shape))

    @property
    def degrees(self) -> tuple[int, ...]:
        return tuple(ax.p for ax in self.axes)

    @property
    def periodic(self) -> tuple[bool, ...]:
        return tuple(ax.periodic for ax in self.axes)

    @property
    def ndofs(self) -> int:
        return self.nnodes * self.dof

    # --------------------------------------------------------------- indexing

    @cached_property
    def axis_node_index(self) -> tuple[np.ndarray, ...]:
        """Per axis: table (nel_d, p_d+1) of control-point indices in the
        element closure (basis index modulo nnp for periodic axes)."""
        out = []
        for ax, t in zip(self.axes, self.tabs):
            idx = t.offset[:, None] + np.arange(ax.p + 1)[None, :]
            out.append(np.mod(idx, ax.nnp))
        return tuple(out)

    def device_emap(self, ids):
        """(B,) flat element ids -> (B, nen) flat closure node indices,
        computed ON DEVICE from the per-axis closure tables.

        This is the traced counterpart of :attr:`mapping` — the full
        (nel, nen) table would be embedded as an HLO constant (227 MB at
        128³ p=2, which overflows remote-compile request limits); the
        per-axis tables are O(nel_d · nen_d) instead."""
        import jax.numpy as jnp

        per_axis = self.device("axis_node_index")
        eshape = self.elem_shape
        grids = np.meshgrid(
            *[np.arange(n) for n in self.nen_shape], indexing="ij"
        )
        locs = [g.ravel(order="F") for g in grids]
        rem = ids
        flat = jnp.zeros((ids.shape[0], self.nen), jnp.int32)
        stride = 1
        for d in range(self.dim):
            e_d = rem % eshape[d]
            rem = rem // eshape[d]
            idx = per_axis[d][e_d][:, locs[d]]  # (B, nen)
            flat = flat + idx.astype(jnp.int32) * stride
            stride *= self.node_shape[d]
        return flat

    @cached_property
    def mapping(self) -> np.ndarray:
        """Element closure map: (nel, nen) flat control-point indices.

        Local basis ordering is axis-0 fastest, matching the tensor-product
        tabulation (reference builds the same map at petigaelem.c:693-755).
        Large meshes use the native C++ builder (petiga_tpu/native).
        """
        if self.nel >= 4096:
            from .. import native

            if native.available():
                return native.build_mapping(
                    self.dim,
                    self.elem_shape,
                    self.nen_shape,
                    self.node_shape,
                    [t.offset for t in self.tabs],
                )
        per_axis = self.axis_node_index
        eshape = self.elem_shape
        # element multi-indices, axis 0 fastest
        emulti = np.unravel_index(np.arange(self.nel), eshape, order="F")
        node_multi = []
        for d in range(self.dim):
            idx_d = per_axis[d][emulti[d]]  # (nel, p_d+1)
            node_multi.append(idx_d)
        # tensor product over local indices, axis 0 fastest
        grids = np.meshgrid(
            *[np.arange(n) for n in self.nen_shape], indexing="ij"
        )
        locs = [g.ravel(order="F") for g in grids]  # (nen,), axis0 fastest
        flat = np.zeros((self.nel, self.nen), dtype=np.int64)
        stride = 1
        for d in range(self.dim):
            flat += node_multi[d][:, locs[d]] * stride
            stride *= self.node_shape[d]
        return flat.astype(np.int32)

    def node_multi_index(self) -> tuple[np.ndarray, ...]:
        """Multi-index arrays of all nodes (axis-0-fastest order)."""
        return np.unravel_index(np.arange(self.nnodes), self.node_shape, order="F")

    # ------------------------------------------------------ boundary handling

    def set_boundary_value(self, axis: int, side: int, field: int, value: float):
        """Strong Dirichlet BC on a face (IGASetBoundaryValue, petigaform.c:324)."""
        self._check_face(axis, side, field)
        self.bc[axis][side].value.append((int(field), float(value)))
        self._device_cache.clear()
        return self

    def set_boundary_load(self, axis: int, side: int, field: int, value: float):
        """Nodal flux on a face (IGASetBoundaryLoad, petigaform.c:382)."""
        self._check_face(axis, side, field)
        self.bc[axis][side].load.append((int(field), float(value)))
        self._device_cache.clear()
        return self

    def set_boundary_form(self, axis: int, side: int, flag: bool = True):
        """Request boundary-integral evaluation on a face
        (IGASetBoundaryForm, petigaform.c:436)."""
        self._check_face(axis, side, 0)
        self.bc_visit[axis][side] = bool(flag)
        return self

    def set_fix_table(self, table: Optional[np.ndarray]):
        """Inhomogeneous Dirichlet values from a vector
        (IGASetFixTable, petigaform.c:273-322): boundary dofs are
        constrained to the values in ``table`` (shape (nnodes, dof))."""
        if table is not None:
            table = np.asarray(table, dtype=np.float64).reshape(self.nnodes, self.dof)
        self.fix_table = table
        self._device_cache.clear()
        return self

    def _check_face(self, axis: int, side: int, field: int):
        if not (0 <= axis < self.dim):
            raise ValueError(f"axis must be in [0,{self.dim-1}], got {axis}")
        if side not in (0, 1):
            raise ValueError("side must be 0 or 1")
        if not (0 <= field < self.dof):
            raise ValueError(f"field must be in [0,{self.dof-1}], got {field}")
        if self.axes[axis].periodic:
            raise ValueError("cannot set boundary data on a periodic axis")

    @cached_property
    def boundary_nodes(self) -> list:
        """Per (axis, side): flat indices of nodes on that boundary face."""
        out = []
        multi = self.node_multi_index()
        for d in range(self.dim):
            faces = []
            for side in range(2):
                tgt = 0 if side == 0 else self.node_shape[d] - 1
                faces.append(np.where(multi[d] == tgt)[0])
            out.append(faces)
        return out

    def dirichlet_mask(self) -> tuple[np.ndarray, np.ndarray]:
        """Global (nnodes, dof) fixed mask and values from the BC tables.

        With a fix table set, fixed dofs take their values from it
        (petigaelem.c:1180 AddFixa path).
        """
        mask = np.zeros((self.nnodes, self.dof), dtype=bool)
        vals = np.zeros((self.nnodes, self.dof), dtype=np.float64)
        for d in range(self.dim):
            for side in range(2):
                for field, value in self.bc[d][side].value:
                    nodes = self.boundary_nodes[d][side]
                    mask[nodes, field] = True
                    if self.fix_table is not None:
                        vals[nodes, field] = self.fix_table[nodes, field]
                    else:
                        vals[nodes, field] = value
        return mask, vals

    def flux_vector(self) -> Optional[np.ndarray]:
        """Global (nnodes, dof) nodal flux vector from boundary loads, or
        None if no loads are set (reference applies these per element as
        F[k] += v with element multiplicity — equivalently, the *global*
        assembled flux is multiplicity * v; we replicate by accumulating
        per element, see assembly)."""
        any_load = any(
            self.bc[d][s].load for d in range(self.dim) for s in range(2)
        )
        if not any_load:
            return None
        flux = np.zeros((self.nnodes, self.dof), dtype=np.float64)
        for d in range(self.dim):
            for side in range(2):
                for field, value in self.bc[d][side].load:
                    nodes = self.boundary_nodes[d][side]
                    flux[nodes, field] += value
        return flux

    # --------------------------------------------------------------- geometry

    def init_geometry(self, X: np.ndarray, W: Optional[np.ndarray] = None):
        """Attach geometry control points (nnodes..., nsd) and optional
        rational weights (NURBS)."""
        X = np.asarray(X, dtype=np.float64).reshape(self.nnodes, self.nsd)
        self.geometry = X
        if W is not None:
            W = np.asarray(W, dtype=np.float64).reshape(self.nnodes)
            self.rational = W
        self._device_cache.clear()
        return self

    def set_property(self, A: np.ndarray):
        A = np.asarray(A, dtype=np.float64)
        self.property = A.reshape(self.nnodes, -1)
        self._device_cache.clear()
        return self

    @property
    def has_geometry(self) -> bool:
        return self.geometry is not None

    @property
    def is_rational(self) -> bool:
        return self.rational is not None

    def greville_coordinates(self) -> np.ndarray:
        """Parametric coordinates of each node at Greville abscissae
        (IGACreateCoordinates, petigansp.c:33-117): (nnodes, dim)."""
        gs = []
        for ax in self.axes:
            g = ax.greville()
            if ax.periodic:
                shift = (ax.nbasis - ax.nnp) // 2
                g = g[shift : shift + ax.nnp]
            gs.append(g)
        multi = self.node_multi_index()
        return np.stack([gs[d][multi[d]] for d in range(self.dim)], axis=-1)

    # ------------------------------------------------------------ device data

    def device(self, key: str):
        """Cached device arrays derived from the host tables.

        Built under ``ensure_compile_time_eval`` so that first use inside
        a jit/scan trace still caches concrete arrays, not tracers.
        """
        if key in self._device_cache:
            return self._device_cache[key]
        import jax

        with jax.ensure_compile_time_eval():
            val = self._build_device(key)
        # compile-time eval does not escape every trace (e.g. shard_map);
        # never cache tracers — they would leak into later traces
        if not any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(val)
        ):
            self._device_cache[key] = val
        return val

    def _build_device(self, key: str):
        dt = self.dtype
        if key == "tabs_value":
            return tuple(jnp.asarray(t.value, dtype=dt) for t in self.tabs)
        if key == "tabs_weight":
            return tuple(jnp.asarray(t.weight, dtype=dt) for t in self.tabs)
        if key == "tabs_detJac":
            return tuple(jnp.asarray(t.detJac, dtype=dt) for t in self.tabs)
        if key == "tabs_point":
            return tuple(jnp.asarray(t.point, dtype=dt) for t in self.tabs)
        if key == "tabs_bnd_value":
            return tuple(jnp.asarray(t.bnd_value, dtype=dt) for t in self.tabs)
        if key == "mapping":
            return jnp.asarray(self.mapping)
        if key == "axis_node_index":
            return tuple(
                jnp.asarray(t, jnp.int32) for t in self.axis_node_index
            )
        if key == "geometry":
            return None if self.geometry is None else jnp.asarray(self.geometry, dt)
        if key == "rational":
            return None if self.rational is None else jnp.asarray(self.rational, dt)
        if key == "property":
            return None if self.property is None else jnp.asarray(self.property, dt)
        if key == "dirichlet":
            mask, vals = self.dirichlet_mask()
            return jnp.asarray(mask), jnp.asarray(vals, dt)
        raise KeyError(key)

    # ------------------------------------------------------------------ views

    def clone(self, dof: Optional[int] = None, **kw) -> "Space":
        """New space sharing the discretization with different dof
        (IGAClone, petiga.c:1495-1565)."""
        return Space(
            self.axes,
            dof=self.dof if dof is None else dof,
            rule=self.rules,
            basis_type=self.basis_type,
            collocation=self.collocation,
            nsd=kw.get("nsd", self.nsd),
            dtype=kw.get("dtype", self.dtype),
        )

    def __repr__(self) -> str:
        return (
            f"Space(dim={self.dim}, dof={self.dof}, "
            f"degrees={self.degrees}, elements={self.elem_shape}, "
            f"nodes={self.node_shape}, periodic={self.periodic}, "
            f"collocation={self.collocation})"
        )
