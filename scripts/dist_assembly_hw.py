"""Compile-and-run the sharded general-geometry assembly on real hardware.

VERDICT.md r2 item 7: the dist/assembly.py Pallas kernel had only ever
executed in interpret mode (the 8-way CPU mesh in tests and dryrun stage 3).
This script lowers it for the actual TPU on a 1-device ("z",) mesh —
shard_map + ppermute + the SMEM zbase scalar all present, interpret=False —
runs the full sharded assemble -> halo-CG pipeline on perturbed geometry,
and cross-checks the assembled stripes against the single-chip fused build.

    python scripts/dist_assembly_hw.py [--n 62]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=62,
                    help="cells per axis (store z = n+2 must divide by the "
                         "kernel z-block)")
    args = ap.parse_args(argv)
    n = args.n

    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]), ("z",))
    print(f"# device: {dev}, 1-device ('z',) mesh, interpret=False",
          file=sys.stderr)

    info, coords_grid, bc_grid = _light_grid((-3.0, 3.0), n, 3)
    plan = structured_plan(info, embed=True)
    rng = np.random.default_rng(0)
    h = 6.0 / n
    pert = rng.uniform(-0.15 * h, 0.15 * h, size=coords_grid.shape)
    interior = ~np.broadcast_to(bc_grid, coords_grid.shape)
    coords = coords_grid + np.where(interior, pert, 0.0)
    C = node_coords_embedded_from_grid(coords, plan, np.float32)
    rule = tetrahedron_rule(2)
    f = model_problem_3d_planes()

    # --- sharded fused build, compiled for the chip ---
    t0 = time.perf_counter()
    data_s, b_s = build_poisson_system_sharded(plan, C, mesh, f, rule,
                                               interpret=False)
    jax.block_until_ready((data_s, b_s))
    t_build_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    data_s2, b_s2 = build_poisson_system_sharded(plan, C, mesh, f, rule,
                                                 interpret=False)
    jax.block_until_ready((data_s2, b_s2))
    t_build = time.perf_counter() - t0

    # --- cross-check vs the single-chip fused build ---
    A_ref, b_ref = build_poisson_system_pallas(
        plan, jnp.asarray(C), None, f, rule, interpret=False)
    err_d = float(jnp.abs(jnp.asarray(data_s) - A_ref.data).max())
    err_b = float(jnp.abs(jnp.asarray(b_s) - b_ref).max())
    scale = float(jnp.abs(A_ref.data).max())

    # --- full sharded pipeline: assemble -> halo CG ---
    t0 = time.perf_counter()
    u, res = solve_poisson_dist_general(plan, C, mesh, f, rule, tol=1e-6,
                                        maxiter=4000, interpret=False)
    t_pipeline = time.perf_counter() - t0

    out = {
        "metric": "dist_assembly_compiled_on_tpu",
        "n": n,
        "num_dofs": int(np.prod(info.node_grid)),
        "mesh": "1-device ('z',)",
        "build_wall_cold_s": round(t_build_cold, 2),
        "build_wall_warm_s": round(t_build, 3),
        "max_rel_err_data_vs_single_chip": err_d / scale,
        "max_abs_err_rhs": err_b,
        "cg_converged": bool(res.converged),
        "cg_iters": int(res.iterations),
        "cg_relres": float(res.residual_norm),
        "pipeline_wall_s": round(t_pipeline, 2),
    }
    print(json.dumps(out))
    assert err_d / scale < 1e-6, err_d
    assert err_b < 1e-5 * float(jnp.abs(b_ref).max()), err_b
    assert bool(res.converged)


if __name__ == "__main__":
    main()
