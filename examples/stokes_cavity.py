"""Stokes lid-driven cavity: Taylor-Hood P2-P1 + block-preconditioned MINRES.

A model family beyond the reference (one space, one trial/test pair,
no solver — SURVEY.md §0): the saddle-point system [[A, B^T], [B, 0]] is
applied matrix-free (gather -> per-element contraction -> scatter) and
solved by MINRES with the diag(A)/pressure-mass block preconditioner
(solve/stokes.py, solve/minres.py).

    python examples/stokes_cavity.py [--n 96] [--tol 1e-8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def lid(X):
    """Regularized lid: u_x = 16 x^2 (1-x)^2 on the top edge (corners 0)."""
    on_top = (np.abs(X[..., 1] - 1.0) < 1e-12).astype(float)
    profile = 16.0 * (X[..., 0] * (1 - X[..., 0])) ** 2
    return np.stack([on_top * profile, 0.0 * X[..., 0]], axis=-1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96,
                    help="cells per side (96 -> ~75k velocity DOFs; "
                    "512 -> ~2.1M)")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--viscosity", type=float, default=1.0)
    ap.add_argument("--f64", action="store_true",
                    help="solve in float64 (default float32 — fp64 is "
                    "emulated and slow on TPU)")
    ap.add_argument("--vprecond", choices=["amg", "jacobi"],
                    default="amg",
                    help="velocity-block preconditioner: amg = one "
                    "scalar-AMG V-cycle per component (mesh-robust "
                    "MINRES iterations); jacobi = diag(A)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.solve.stokes import solve_stokes

    t0 = time.perf_counter()
    mesh = rectangle_mesh(0.0, 1.0, 0.0, 1.0, args.n, args.n)
    t_mesh = time.perf_counter() - t0

    sol = solve_stokes(mesh, bc_velocity=lid, viscosity=args.viscosity,
                       dtype=jnp.float64 if args.f64 else jnp.float32,
                       tol=args.tol, maxiter=50_000,
                       velocity_precond=args.vprecond)

    u = np.asarray(sol.u).reshape(-1, 2)
    X = sol.V.scalar_dof_coords
    # centerline u_x minimum — the classic cavity diagnostic
    center = np.abs(X[:, 0] - 0.5) < 1e-9
    ux_min = float(u[center, 0].min())

    out = {
        "metric": "stokes_cavity_taylor_hood_minres",
        "dtype": "float64" if args.f64 else "float32",
        "vprecond": args.vprecond,
        "velocity_dofs": sol.V.num_dofs,
        "pressure_dofs": sol.Q.num_scalar_dofs,
        "minres_iters": int(sol.res.iterations),
        "relres": float(sol.res.residual_norm),
        "converged": bool(sol.res.converged),
        "centerline_ux_min": ux_min,
        "walls_s": {"mesh": round(t_mesh, 2),
                    **{k: ({kk: round(vv, 2) for kk, vv in v.items()}
                           if isinstance(v, dict) else round(v, 2))
                       for k, v in sol.walls.items()}},
    }
    print(json.dumps(out))
    if not bool(sol.res.converged):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
