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
from tpufem.mesh.rectangle import (rectangle_mesh, unit_square_mesh,
                                   RectangleMesh, UnitSquareMesh,
                                   rectangle_quad_mesh)
from tpufem.mesh.box import box_mesh, unit_cube_mesh, BoxMesh, UnitCubeMesh, box_hex_mesh
from tpufem.mesh.adjacency import ell_pattern, node_adjacency, greedy_element_coloring
from tpufem.fem.space import FunctionSpace, VectorFunctionSpace
from tpufem.fem.quadrature import triangle_rule, tetrahedron_rule, rule_for_cell
from tpufem.solve.cg import cg, CGResult
from tpufem.sparse.ell import ELLMatrix
from tpufem.sparse.stencil import StencilMatrix

__version__ = "0.1.0"


def __getattr__(name):
    # heavier entry points resolved lazily to keep `import tpufem` light
    if name == "WeakForm":
        from tpufem.forms.weakform import WeakForm
        return WeakForm
    if name == "solve_poisson_fast":
        from tpufem.solve.structured_fast import solve_poisson_fast
        return solve_poisson_fast
    if name == "build_poisson_multigrid":
        from tpufem.solve.multigrid import build_poisson_multigrid
        return build_poisson_multigrid
    if name == "solve_elasticity":
        from tpufem.solve.elasticity import solve_elasticity
        return solve_elasticity
    if name == "solve_poisson_ell":
        from tpufem.solve.poisson import solve_poisson_ell
        return solve_poisson_ell
    if name == "build_amg":
        from tpufem.solve.amg import build_amg
        return build_amg
    if name == "build_dist_amg":
        from tpufem.dist.amg import build_dist_amg
        return build_dist_amg
    if name == "build_block_amg":
        from tpufem.solve.amg_block import build_block_amg
        return build_block_amg
    if name == "newton_krylov":
        from tpufem.solve.newton import newton_krylov
        return newton_krylov
    if name == "smallest_eigenpairs":
        from tpufem.solve.eigen import smallest_eigenpairs
        return smallest_eigenpairs
    if name == "leapfrog_wave":
        from tpufem.solve.dynamics import leapfrog_wave
        return leapfrog_wave
    if name == "solve_stokes":
        from tpufem.solve.stokes import solve_stokes
        return solve_stokes
    if name == "minres":
        from tpufem.solve.minres import minres
        return minres
    raise AttributeError(f"module 'tpufem' has no attribute {name!r}")
