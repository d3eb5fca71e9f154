"""Unstructured elasticity at scale: BCSR + banded block SpMV + block-AMG.

BASELINE config 4, unstructured variant.  The reference has no vector
problems and no solver (SURVEY.md §0); the structured-box elasticity
headline (examples/elasticity_1m.py) uses the analytic stencil operator.
This example is the general-geometry path: perturbed triangle mesh ->
RCM -> BCSR assembly (2x2 node blocks) -> PCG on the banded block Pallas
SpMV, preconditioned by block-Jacobi (iterations grow with the mesh) or
the rigid-body-mode block-SA AMG (solve/amg_block.py — mesh-robust).

    python examples/elasticity_unstructured.py [--n 700] [--precond amg]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def body_force(x):
    return np.stack([0 * x[..., 0] + 1.0, 0 * x[..., 1] - 0.5], axis=-1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=700,
                    help="mesh lines per side (700 -> 982,802 DOFs)")
    ap.add_argument("--lam", type=float, default=1.0)
    ap.add_argument("--mu", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--precond", choices=["amg", "jacobi"], default="amg")
    ap.add_argument("--matvec", choices=["pallas", "gather"],
                    default="pallas")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    ap.add_argument("--no-aot", action="store_true",
                    help="skip the executable cache (utils/aot.py); the "
                    "cold Mosaic compile of the banded block programs "
                    "costs minutes at 1M DOFs")
    args = ap.parse_args(argv)
    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tpufem.mesh.rectangle import perturbed_rectangle_mesh
    from tpufem.solve.elasticity import solve_elasticity

    t0 = time.perf_counter()
    mesh = perturbed_rectangle_mesh(-1.0, 1.0, -1.0, 1.0, args.n, args.n,
                                    jitter=0.2, seed=0)
    t_mesh = time.perf_counter() - t0

    t0 = time.perf_counter()
    sol = solve_elasticity(
        mesh, lam=args.lam, mu=args.mu, body_force=body_force,
        dtype=jnp.float32, tol=args.tol, maxiter=3000,
        matvec=args.matvec, precond=args.precond,
        interpret=args.interpret, aot=not args.no_aot)
    t_total = time.perf_counter() - t0

    out = {
        "metric": "unstructured_elasticity_bcsr_pcg",
        "dofs": sol.space.num_dofs,
        "elements": mesh.num_elements,
        "precond": args.precond,
        "matvec": args.matvec,
        "lam_over_mu": args.lam / args.mu,
        "pcg_iters": int(sol.cg.iterations),
        "relres": float(sol.cg.residual_norm),
        "converged": bool(sol.cg.converged),
        "solve_ms": round(sol.walls.get("solve", 0.0) * 1e3, 2),
        "dofs_per_sec": round(sol.space.num_dofs
                              / max(sol.walls.get("solve", 0.0), 1e-9), 1),
        "walls_s": {"mesh": round(t_mesh, 2),
                    "total": round(t_total, 2),
                    **{k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in sol.walls.items()}},
    }
    print(json.dumps(out))
    if not bool(sol.cg.converged):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
