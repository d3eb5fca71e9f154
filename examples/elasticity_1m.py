"""3D elasticity at ~1M DOFs on one TPU chip (BASELINE config 4 at scale).

Clamped box, manufactured polynomial displacement, analytic block-stencil
assembly (no element arrays), block-Jacobi PCG on the shift-based block
SpMV.  Prints one JSON line with DOFs/s, iterations, and the relative L2
error vs the manufactured solution.

    python examples/elasticity_1m.py --n 69     # 70^3 * 3 = 1,029,000 DOFs
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=69)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--precond", choices=("jacobi", "mg"), default="jacobi",
                    help="mg needs n to halve down to <= 8-ish (e.g. 72)")
    args = ap.parse_args()

    from tpufem.solve.cg import cg_fixed
    from tpufem.solve.elasticity_structured import (
        block_stencil_matvec, manufactured_elasticity_3d,
        solve_elasticity_box)
    from tpufem.solve.multigrid import _light_grid
    from tpufem.utils.timing import device_seconds_per_rep

    lam, mu = 1.2, 0.8
    u_exact, f = manufactured_elasticity_3d(lam, mu)

    t0 = time.perf_counter()
    sol = solve_elasticity_box((-3.0, 3.0), args.n, lam=lam, mu=mu,
                               body_force=f, dtype=jnp.float32,
                               tol=args.tol, maxiter=4000,
                               precond=args.precond)
    wall = time.perf_counter() - t0

    info, coords_grid, _ = _light_grid((-3.0, 3.0), args.n, 3)
    ue = u_exact(coords_grid[0], coords_grid[1],
                 coords_grid[2]).reshape(3, -1)
    err = float(np.linalg.norm(sol.u - ue) / np.linalg.norm(ue))
    iters = int(sol.cg.iterations)

    # honest per-iteration device time: rep-difference over the fixed
    # -iteration PCG on the same operator (timing methodology of bench.py)
    from tpufem.assemble.structured import structured_plan
    from tpufem.solve.elasticity_structured import (
        _apply_bc_blocks, elasticity_stencil_data, uniform_cell_matrices)
    from tpufem.solve.multigrid import _embed_grid_numpy

    plan = structured_plan(info, embed=True)
    Ke1, _ = uniform_cell_matrices((-3.0, 3.0), args.n, lam, mu)
    data_np = elasticity_stencil_data(plan, Ke1, np.float32)
    mask_np = _embed_grid_numpy(
        _light_grid((-3.0, 3.0), args.n, 3)[2], plan.store_grid, fill=False)
    data_np = _apply_bc_blocks(data_np, plan.offsets, mask_np)
    diag_k = plan.offsets.index(0)
    D = np.moveaxis(data_np[diag_k], -1, 0)
    Dinv = np.linalg.inv(D + np.where(
        np.abs(np.linalg.det(D)) < 1e-30, 1.0, 0.0)[:, None, None]
        * np.eye(3))
    Dinv = np.moveaxis(Dinv, 0, -1).astype(np.float32)
    data = jax.device_put(jnp.asarray(data_np))
    Minv = jax.device_put(jnp.asarray(Dinv))
    b = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (3, plan.num_store_rows)).astype(np.float32)))

    offsets = plan.offsets

    if args.precond == "mg":
        from tpufem.solve.elasticity_structured import (
            build_elasticity_multigrid, elastic_mg_preconditioner)
        levels = build_elasticity_multigrid((-3.0, 3.0), args.n, lam=lam,
                                            mu=mu, dtype=jnp.float32)

        @jax.jit
        def pcg_reps(data, Minv, b, iters, levels=None):
            M = elastic_mg_preconditioner(levels, nu1=1, nu2=1)
            x, r = cg_fixed(lambda v: block_stencil_matvec(data, v, offsets),
                            b, iters, M=M)
            return x
        pcg_reps = functools.partial(pcg_reps, levels=levels)
    else:
        @jax.jit
        def pcg_reps(data, Minv, b, iters):
            x, r = cg_fixed(lambda v: block_stencil_matvec(data, v, offsets),
                            b, iters,
                            M=lambda r: (Minv * r[None]).sum(axis=1))
            return x

    t_iter = device_seconds_per_rep(
        lambda r: pcg_reps(data, Minv, b, jnp.int32(r)),
        reps_low=10, reps_high=60)

    ndofs = sol.num_dofs
    total_s = iters * t_iter
    out = {
        "metric": "3d_elasticity_1M_block_stencil_pcg",
        "num_dofs": ndofs,
        "pcg_iters": iters,
        "pcg_relres": float(sol.cg.residual_norm),
        "pcg_iter_ms": round(t_iter * 1e3, 4),
        "solve_ms": round(total_s * 1e3, 2),
        "dofs_per_sec": round(ndofs / total_s, 1),
        "precond": args.precond,
        "rel_l2_error_vs_exact": err,
        "wall_s_incl_compile": round(wall, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
