"""Micro-breakdown of the MG-PCG iteration on the TPU chip.

Times each component of the benchmark's per-iteration cost separately
(rep-difference, same methodology as bench.py):

  * stencil matvec_dot on the general fused-assembled data (the CG A p);
  * one V-cycle of each preconditioner variant (const / bf16 / fp32);
  * a bare fine-level smooth of each variant (the V-cycle's hot pass);
  * the CG vector algebra (axpys) alone.

Usage:  python scripts/profile_iteration.py [n]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpufem.assemble.structured import structured_plan
from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                            node_coords_embedded_from_grid)
from tpufem.ops.stencil_pallas import (const_smooth_embedded,
                                       pick_block_lead,
                                       stencil_matvec_dot_embedded,
                                       stencil_smooth_embedded)
from tpufem.solve.multigrid import (_embed_grid_numpy, _light_grid,
                                    build_poisson_multigrid, cast_hierarchy,
                                    mg_preconditioner)
from tpufem.solve.poisson import model_problem_3d_planes
from tpufem.utils.timing import device_seconds_per_rep


def _timed(fn, x, reps_hi=200):
    @jax.jit
    def reps(x, r):
        def body(i, carry):
            return fn(carry * (1.0 + 1e-30))
        return jax.lax.fori_loop(0, r, body, x)

    return device_seconds_per_rep(lambda r: reps(x, jnp.int32(r)),
                                  reps_low=5, reps_high=reps_hi)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    dtype = jnp.float32
    info, coords_grid, bc_grid = _light_grid((-3.0, 3.0), n, 3)
    plan = structured_plan(info, embed=True)
    block_lead = pick_block_lead(plan.store_grid, plan.width)
    bc_mask = jax.device_put(jnp.asarray(_embed_grid_numpy(
        bc_grid, plan.store_grid, fill=False)))
    C = jax.device_put(jnp.asarray(node_coords_embedded_from_grid(
        coords_grid, plan, np.float32)))

    @jax.jit
    def build(C):
        A, b = build_poisson_system_pallas(plan, C, bc_mask,
                                           model_problem_3d_planes(),
                                           tetrahedron_rule(2))
        return A.data, b

    data, b = build(C)
    data.block_until_ready()
    ns = plan.num_store_rows
    print(f"# n={n} ns={ns} store_grid={plan.store_grid} "
          f"block_lead={block_lead}", file=sys.stderr)

    out = {}

    # CG matvec + fused dot (mode-independent)
    mvd = lambda v: stencil_matvec_dot_embedded(data, v, plan,
                                                block_lead=block_lead)[0]
    out["matvec_dot_ms"] = _timed(mvd, b) * 1e3

    # hierarchies
    hier = {
        "const": build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=dtype,
                                         coarse_max=8, operator="const"),
    }
    gen = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=dtype,
                                  coarse_max=8, top=(data, bc_mask))
    hier["fp32"] = gen
    hier["bf16"] = cast_hierarchy(gen, jnp.bfloat16)

    for name, levels in hier.items():
        M = mg_preconditioner(levels, nu1=1, nu2=1)
        out[f"vcycle_{name}_ms"] = _timed(M, b) * 1e3
        L = levels[0]
        if name == "const":
            sm = lambda v: const_smooth_embedded(
                L.weights, L.code, b, v, L.plan, block_lead=L.block_lead)
        else:
            sm = lambda v: stencil_smooth_embedded(
                L.data, b, v, L.inv_diag, L.plan, block_lead=L.block_lead)
        out[f"smooth_fine_{name}_ms"] = _timed(sm, b) * 1e3

    # CG vector algebra alone: 3 fused axpy-ish passes per iteration
    @jax.jit
    def axpys(x):
        p = x * 1.0001 + b
        r = x - 0.5 * p
        return r + 0.3 * p

    out["cg_vector_ms"] = _timed(axpys, b) * 1e3

    plane_mb = ns * 4 / 1e6
    out = {k: round(v, 4) for k, v in out.items()}
    out["plane_mb"] = round(plane_mb, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
