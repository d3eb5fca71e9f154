"""Mesh data model: structure-of-arrays, TPU-first.

The CUDA reference keeps pointer-based AoS meshes (`Node{x,y,z,flag,index}`,
`Element{nodes}`, see /root/reference/fea_test.cu:34-68) and re-packs them into
flat X/Y/gIdx arrays before every kernel launch
(/root/reference/fea_test.cu:276-288).  Here the SoA layout *is* the mesh:

  * ``coords``      -- float64 [num_nodes, dim] node coordinates
  * ``conn``        -- int32   [num_elements, nodes_per_element] connectivity
  * ``node_flags``  -- int32   [num_nodes] boundary flag (1 = on boundary),
                       same convention as the reference (fea_test.cu:100-103)

Host-side arrays are numpy; device code receives jnp views.  All adjacency /
sparsity-pattern precomputation lives in :mod:`tpufem.mesh.adjacency`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = ["Mesh", "StructuredInfo"]


@dataclasses.dataclass(frozen=True)
class StructuredInfo:
    """Regular-grid metadata attached to structured meshes.

    Enables shift-invariant (index-free) assembly and stencil operators:
    elements are enumerated cell-major with ``num_types`` elements per grid
    cell (interleaved), and every element type's nodes sit at fixed grid
    offsets from the cell's base node.

    node_grid / cell_grid: grid shapes, slowest axis first (matches the node
    numbering strides of the generators).
    type_node_offsets: [T, npe, ndim_grid] int64 node offsets per type.
    """

    node_grid: tuple
    cell_grid: tuple
    type_node_offsets: "np.ndarray"

    @property
    def num_types(self) -> int:
        return self.type_node_offsets.shape[0]


@dataclasses.dataclass
class Mesh:
    """An unstructured mesh in SoA layout.

    ``cell_type`` is "triangle" (3 nodes), "tetrahedron" (4 nodes),
    "quad" (4 nodes) or "hexahedron" (8 nodes).  ``structured`` carries
    optional regular-grid metadata (set by the rectangle/box generators)
    unlocking index-free assembly fast paths.
    """

    coords: np.ndarray        # [NN, dim] float64
    conn: np.ndarray          # [NE, npe] int32
    node_flags: np.ndarray    # [NN] int32, 1 = boundary
    cell_type: str = "triangle"
    structured: Optional[StructuredInfo] = None

    def __post_init__(self):
        self.coords = np.ascontiguousarray(self.coords, dtype=np.float64)
        self.conn = np.ascontiguousarray(self.conn, dtype=np.int32)
        self.node_flags = np.ascontiguousarray(self.node_flags, dtype=np.int32)
        if self.coords.ndim != 2:
            raise ValueError(f"coords must be [NN, dim], got {self.coords.shape}")
        if self.conn.ndim != 2:
            raise ValueError(f"conn must be [NE, npe], got {self.conn.shape}")
        expected_npe = {"triangle": 3, "tetrahedron": 4,
                        "quad": 4, "hexahedron": 8}[self.cell_type]
        if self.conn.shape[1] != expected_npe:
            raise ValueError(
                f"{self.cell_type} mesh needs {expected_npe} nodes/element, "
                f"got {self.conn.shape[1]}"
            )
        if self.conn.size and (self.conn.min() < 0 or self.conn.max() >= self.num_nodes):
            raise ValueError("connectivity index out of range")

    # -- basic queries -----------------------------------------------------

    @property
    def dim(self) -> int:
        return self.coords.shape[1]

    @property
    def num_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def num_elements(self) -> int:
        return self.conn.shape[0]

    @property
    def nodes_per_element(self) -> int:
        return self.conn.shape[1]

    def element_coords(self) -> np.ndarray:
        """[NE, npe, dim] coordinates gathered per element.

        This is the SoA packing the reference does by hand in every variant
        (/root/reference/fea_test.cu:276-288: X/Y per-element arrays).
        """
        return self.coords[self.conn]

    def boundary_nodes(self) -> np.ndarray:
        """Indices of boundary-flagged nodes."""
        return np.nonzero(self.node_flags != 0)[0].astype(np.int32)

    def interior_nodes(self) -> np.ndarray:
        return np.nonzero(self.node_flags == 0)[0].astype(np.int32)

    # -- parity helpers ----------------------------------------------------

    def print_mesh(self, file=None) -> None:
        """Print nodes and elements (parity: Mesh::printMesh,
        /root/reference/fea_test.cu:53-67)."""
        import sys

        out = file or sys.stdout
        print(f"number of nodes = {self.num_nodes}", file=out)
        for i in range(self.num_nodes):
            c = self.coords[i]
            xs = " ".join(repr(float(v)) for v in c)
            print(f"{i} {xs} {int(self.node_flags[i])}", file=out)
        print(f"number of elements = {self.num_elements}", file=out)
        for e in range(self.num_elements):
            print(" ".join(str(int(n)) for n in self.conn[e]), file=out)

    def neighbor_nodes_list(
        self, max_length: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-node sorted neighbor-node lists (including self), ELL-padded.

        Parity with Mesh::getNeighborNodesList
        (/root/reference/fea_test_sm_sym_sparse2.cu:72-100): for every node,
        the sorted set of nodes sharing an element with it (self included),
        written into a fixed-width [NN, max_length] table plus a length array.

        Unlike the reference (which leaves trailing slots uninitialized), the
        padding slots hold the node's own index so gathers stay in-bounds.

        Returns (lengths [NN] int32, indices [NN, max_length] int32).
        """
        from tpufem.mesh.adjacency import node_adjacency

        lengths, indices = node_adjacency(self.conn, self.num_nodes, max_length)
        return lengths, indices
