"""Sharded fused assembly (general geometry) == single-chip fused build,
and the full sharded assemble->solve pipeline converges.

This is the multi-chip story for non-uniform geometry: the analytic paths
(dist.multigrid) cover uniform boxes; here every node carries its own
coordinates (jittered interior), so assembly must read real geometry.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpufem.assemble.structured import structured_plan
from tpufem.dist.assembly import (build_poisson_system_sharded,
                                  solve_poisson_dist_general)
from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                            node_coords_embedded_from_grid)
from tpufem.solve.multigrid import _light_grid
from tpufem.solve.poisson import model_problem_3d_planes


def _perturbed_setup(n, seed=0, jitter=0.15):
    info, coords_grid, bc_grid = _light_grid((-3.0, 3.0), n, 3)
    plan = structured_plan(info, embed=True)
    rng = np.random.default_rng(seed)
    h = 6.0 / n
    pert = rng.uniform(-jitter * h, jitter * h,
                       size=coords_grid.shape)
    interior = ~np.broadcast_to(bc_grid, coords_grid.shape)
    coords = coords_grid + np.where(interior, pert, 0.0)
    C = node_coords_embedded_from_grid(coords, plan, np.float32)
    return plan, coords, C


def test_sharded_build_matches_single_chip(cpu_devices):
    mesh = Mesh(np.array(cpu_devices[:8]), ("z",))
    n = 30                    # store z = 32 -> 4 planes/shard
    plan, _, C = _perturbed_setup(n)
    rule = tetrahedron_rule(2)
    f = model_problem_3d_planes()

    data_s, b_s = build_poisson_system_sharded(plan, C, mesh, f, rule,
                                               interpret=True)
    A_ref, b_ref = build_poisson_system_pallas(
        plan, jnp.asarray(C), None, f, rule, interpret=True)
    err_d = float(jnp.abs(jnp.asarray(data_s) - A_ref.data).max())
    err_b = float(jnp.abs(jnp.asarray(b_s) - b_ref).max())
    scale = float(jnp.abs(A_ref.data).max())
    assert err_d / scale < 1e-6, err_d
    assert err_b < 1e-5 * float(jnp.abs(b_ref).max()), err_b


def test_sharded_assemble_solve_pipeline(cpu_devices):
    """Sharded assembly feeding the sharded halo-CG solver end to end."""
    mesh = Mesh(np.array(cpu_devices[:8]), ("z",))
    n = 30
    plan, coords, C = _perturbed_setup(n)
    rule = tetrahedron_rule(2)
    f = model_problem_3d_planes()

    u, res = solve_poisson_dist_general(plan, C, mesh, f, rule, tol=1e-6,
                                        maxiter=4000, interpret=True)
    assert bool(res.converged), (float(res.residual_norm),
                                 int(res.iterations))

    # single-device reference on the same (perturbed) system
    from tpufem.solve.cg import cg
    from tpufem.sparse.stencil import stencil_matvec

    A_ref, b_ref = build_poisson_system_pallas(
        plan, jnp.asarray(C), None, f, rule, interpret=True)
    d = A_ref.data[plan.offsets.index(0)]
    inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
    ref = cg(lambda v: stencil_matvec(A_ref.data, plan.offsets, v), b_ref,
             tol=1e-6, maxiter=4000, M=lambda r: r * inv_d)
    u_ref = np.asarray(plan.extract_field(ref.x))
    err = np.linalg.norm(u - u_ref) / max(np.linalg.norm(u_ref), 1e-30)
    assert err < 1e-4, err
