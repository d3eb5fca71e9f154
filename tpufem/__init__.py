"""tpufem — a TPU-native finite-element framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of the CUDA reference
(yuemingl/cuda-fem; structural analysis in SURVEY.md), redesigned TPU-first:
batched einsum element kernels on the MXU/VPU, deterministic sort/segment-sum
assembly instead of atomicAdd scatter, fixed-width ELL/BCSR sparse formats,
jax.jit-traced weak forms instead of NVRTC string codegen, and shard_map/pjit
multi-chip scaling — plus the solver layers the reference lacked (Dirichlet
BCs, preconditioned CG, matrix-free operators).
"""
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import rectangle_mesh, unit_square_mesh, RectangleMesh, UnitSquareMesh
from tpufem.mesh.box import box_mesh, unit_cube_mesh, BoxMesh, UnitCubeMesh
from tpufem.mesh.adjacency import ell_pattern, node_adjacency, greedy_element_coloring
from tpufem.fem.space import FunctionSpace, VectorFunctionSpace
from tpufem.fem.quadrature import triangle_rule, tetrahedron_rule, rule_for_cell
from tpufem.solve.cg import cg, CGResult
from tpufem.sparse.ell import ELLMatrix

__version__ = "0.1.0"
