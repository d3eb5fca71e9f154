"""High-level fast path: the benchmark pipeline as a library API.

One call gives users the full production configuration measured in bench.py
(fused Pallas system build + geometric-MG-preconditioned CG with the Pallas
stencil SpMV) for 3D Poisson problems on structured box meshes:

    from tpufem.solve.structured_fast import solve_poisson_fast
    sol = solve_poisson_fast((-3, 3), n_cells=96, f_planes=f, tol=1e-5)

6.2 ms device time at 913k DOFs on one v5e (assemble 1.6 ms + 10 MG-PCG
iterations); scales to >11M DOFs on a single chip (examples/poisson_10m.py).
"""
from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.mesh.box import box_mesh
from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                            node_coords_embedded)
from tpufem.ops.stencil_pallas import stencil_matvec_embedded
from tpufem.solve.cg import CGResult, cg
from tpufem.solve.multigrid import build_poisson_multigrid, mg_preconditioner

__all__ = ["FastSolution", "solve_poisson_fast"]


class FastSolution(NamedTuple):
    u: jax.Array               # node-ordered solution [NN]
    cg: CGResult
    num_dofs: int
    phases_s: dict


def solve_poisson_fast(domain, n_cells: int, f_planes: Callable, *,
                       tol: float = 1e-5, maxiter: int = 60,
                       dtype=jnp.float32, quadrature_degree: int = 3,
                       use_multigrid: bool = True,
                       levels: Optional[int] = None) -> FastSolution:
    """Assemble + solve -Δu = f, u|∂Ω = 0 on (domain)³ with n_cells³ cells.

    ``f_planes(x, y, z)`` takes coordinate planes and returns one plane (the
    batch-trailing RHS form).  ``n_cells`` should halve down to <= 8 for the
    full multigrid hierarchy (e.g. 32/48/64/96/128/192/224).
    """
    phases = {}
    t0 = time.perf_counter()
    mesh = box_mesh(domain[0], domain[1], domain[0], domain[1],
                    domain[0], domain[1], n_cells, n_cells, n_cells)
    if use_multigrid:
        mg_levels = build_poisson_multigrid(domain, n_cells, 3, dtype=dtype,
                                            levels=levels)
        plan = mg_levels[0].plan
        M = mg_preconditioner(mg_levels, nu1=1, nu2=1)
        top = mg_levels[0]
        data = top.data
        bc_mask = top.bc_mask
        block_lead = top.block_lead
    else:
        from tpufem.assemble.structured import structured_plan
        from tpufem.ops.stencil_pallas import pick_block_lead

        plan = structured_plan(mesh, embed=True)
        bc_mask = plan.embed_field(jnp.asarray(mesh.node_flags != 0),
                                   fill=False)
        block_lead = pick_block_lead(plan.store_grid, plan.width)
        data = None
        M = None
    phases["setup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    C = jax.device_put(jnp.asarray(node_coords_embedded(mesh, plan,
                                                        np.dtype(dtype).type)))
    rule = tetrahedron_rule(quadrature_degree)

    @jax.jit
    def build(C):
        A, b = build_poisson_system_pallas(
            plan, C, jnp.asarray(bc_mask, dtype), f_planes, rule,
            block_lead=1)
        return A.data, b

    data_built, b = build(C)
    b.block_until_ready()
    phases["assemble_wall"] = time.perf_counter() - t0
    if data is None:
        data = data_built
        d = data[plan.offsets.index(0)]
        inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
        M = lambda r: r * inv_d

    def mv(v):
        return stencil_matvec_embedded(data_built, v, plan,
                                       block_lead=block_lead)

    t0 = time.perf_counter()
    res = jax.jit(lambda b: cg(mv, b, tol=tol, maxiter=maxiter, M=M))(b)
    res.x.block_until_ready()
    phases["solve_wall"] = time.perf_counter() - t0

    u = plan.extract_field(res.x)
    return FastSolution(u=u, cg=res, num_dofs=mesh.num_nodes,
                        phases_s=phases)
