"""Function spaces: DOF layout over a mesh.

Parity target: the reference's FunctionSpace
(/root/reference/fea_symbolic.cu:196-260) binds a mesh to P1 Lagrange shape
functions and exposes the affine map and Jacobian.  This version generalizes
to P2 (edge DOFs) and vector-valued spaces, and owns the DOF connectivity
that all assembly paths consume.

DOF numbering:
  * P1 scalar: DOF = node index (same as reference).
  * P2 scalar: vertex DOFs first (node index), then one DOF per unique edge.
  * vector spaces: node-major, component-minor — global DOF of (scalar dof d,
    component c) is ``d * num_components + c``.  This keeps per-node blocks
    contiguous, which is what the BCSR block format wants.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from tpufem.fem.elements import ReferenceElement, element_for_cell
from tpufem.fem.quadrature import QuadratureRule, rule_for_cell
from tpufem.mesh.core import Mesh

__all__ = ["FunctionSpace", "VectorFunctionSpace"]

_EDGE_VERTICES = {
    # local edge -> local vertex pair; triangle edges ordered (1-2),(2-3),(3-1)
    # to match the P2Triangle DOF convention in elements.py; tet edges match
    # P2Tetrahedron._EDGES.
    "triangle": np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int64),
    "tetrahedron": np.array([[0, 1], [1, 2], [2, 0], [0, 3], [1, 3], [2, 3]],
                            dtype=np.int64),
}

# local facet -> local vertex triple (tet facet opposite each vertex)
_TET_FACETS = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]],
                       dtype=np.int64)


def _boundary_edge_keys_3d(conn: np.ndarray, num_nodes: int) -> np.ndarray:
    """Sorted flat keys (lo*NN+hi) of edges lying on boundary facets.

    In 3D an edge's element count says nothing about the boundary (interior
    edges of a tet mesh are shared by many cells, and an interior edge can
    connect two boundary nodes); the correct test is membership in a
    boundary FACET — a triangle appearing in exactly one tet.
    """
    tris = np.sort(conn[:, _TET_FACETS].astype(np.int64),
                   axis=2).reshape(-1, 3)
    # unique facet TRIPLES via row-wise unique — a cubic scalar key
    # num_nodes**2 * v0 would overflow int64 beyond ~2.1M nodes
    uk, counts = np.unique(tris, axis=0, return_counts=True)
    bk = uk[counts == 1]
    v0, v1, v2 = bk[:, 0], bk[:, 1], bk[:, 2]
    pairs = np.concatenate([np.stack([v0, v1], 1), np.stack([v1, v2], 1),
                            np.stack([v0, v2], 1)])
    lo = pairs.min(1)
    hi = pairs.max(1)
    return np.unique(lo * num_nodes + hi)


def _unique_edges(conn: np.ndarray, cell_type: str, num_nodes: int):
    """Unique mesh edges + per-element edge ids + boundary-edge mask."""
    ev = _EDGE_VERTICES[cell_type]
    pairs = conn[:, ev]                       # [NE, n_edges, 2]
    lo = np.minimum(pairs[..., 0], pairs[..., 1]).astype(np.int64)
    hi = np.maximum(pairs[..., 0], pairs[..., 1]).astype(np.int64)
    keys = lo * num_nodes + hi               # [NE, n_edges]
    unique_keys, inverse, counts = np.unique(
        keys.ravel(), return_inverse=True, return_counts=True)
    edge_ids = inverse.reshape(keys.shape)   # [NE, n_edges]
    if cell_type == "triangle":
        boundary_edge = counts == 1          # 2D: edges ARE the facets
    else:
        bkeys = _boundary_edge_keys_3d(conn, num_nodes)
        boundary_edge = np.isin(unique_keys, bkeys, assume_unique=True)
    edge_nodes = np.stack(
        [unique_keys // num_nodes, unique_keys % num_nodes], axis=1)
    return edge_ids, edge_nodes, boundary_edge


@dataclasses.dataclass
class FunctionSpace:
    """Scalar (or, via subclass, vector) Lagrange space on a mesh."""

    mesh: Mesh
    family: str = "Lagrange"
    degree: int = 1
    num_components: int = 1

    def __post_init__(self):
        if self.family not in ("Lagrange", "P", "CG"):
            raise NotImplementedError(f"family {self.family!r}")
        self.element: ReferenceElement = element_for_cell(
            self.mesh.cell_type, self.degree)
        self._build_dofs()

    # -- DOF construction ---------------------------------------------------

    def _build_dofs(self):
        mesh = self.mesh
        if self.degree == 1:
            self.scalar_dof_conn = mesh.conn.copy()
            self.num_scalar_dofs = mesh.num_nodes
            self.scalar_dof_flags = (mesh.node_flags != 0)
            # DOF coordinates = node coordinates (used for BC values / RHS).
            self.scalar_dof_coords = mesh.coords.copy()
        elif self.degree == 2:
            edge_ids, edge_nodes, boundary_edge = _unique_edges(
                mesh.conn, mesh.cell_type, mesh.num_nodes)
            self.scalar_dof_conn = np.concatenate(
                [mesh.conn, mesh.num_nodes + edge_ids], axis=1
            ).astype(np.int32)
            self.num_scalar_dofs = mesh.num_nodes + edge_nodes.shape[0]
            flags = np.concatenate(
                [mesh.node_flags != 0, boundary_edge])
            self.scalar_dof_flags = flags
            mid = 0.5 * (mesh.coords[edge_nodes[:, 0]]
                         + mesh.coords[edge_nodes[:, 1]])
            self.scalar_dof_coords = np.concatenate([mesh.coords, mid], axis=0)
        else:
            raise NotImplementedError(f"degree {self.degree}")

        nc = self.num_components
        if nc == 1:
            self.dof_conn = self.scalar_dof_conn
            self.num_dofs = self.num_scalar_dofs
            self.dof_flags = self.scalar_dof_flags
        else:
            # node-major, component-minor expansion
            base = self.scalar_dof_conn.astype(np.int64) * nc
            self.dof_conn = (
                base[:, :, None] + np.arange(nc, dtype=np.int64)
            ).reshape(base.shape[0], -1).astype(np.int32)
            self.num_dofs = self.num_scalar_dofs * nc
            self.dof_flags = np.repeat(self.scalar_dof_flags, nc)

    # -- queries --------------------------------------------------------------

    @property
    def local_dofs(self) -> int:
        return self.element.num_nodes * self.num_components

    def default_quadrature(self, extra_degree: int = 0) -> QuadratureRule:
        """Rule exact for the stiffness form of this space's degree.

        The reference always uses its degree-5 7-point rule
        (/root/reference/fea_test.cu:28-31) even though P1 stiffness needs
        only degree 0; we default to (2*degree) to stay exact for mass /
        loaded forms, and callers can pass the 7-point rule for parity.
        """
        deg = max(1, 2 * self.degree + extra_degree)
        if self.mesh.cell_type == "triangle":
            deg = max(deg, 2)
        return rule_for_cell(self.mesh.cell_type, min(deg, 5)
                             if self.mesh.cell_type == "triangle"
                             else min(deg, 3))

    def boundary_dofs(self) -> np.ndarray:
        return np.nonzero(self.dof_flags)[0].astype(np.int32)


def VectorFunctionSpace(mesh: Mesh, family: str = "Lagrange", degree: int = 1,
                        num_components: int | None = None) -> FunctionSpace:
    """Vector-valued Lagrange space (default: one component per space dim)."""
    nc = mesh.dim if num_components is None else num_components
    return FunctionSpace(mesh, family=family, degree=degree, num_components=nc)
