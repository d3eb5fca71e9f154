"""Semilinear Poisson via matrix-free Newton-Krylov.

    -Δu + u³ = f   on (-3,3)²,  u = 0 on the boundary,

manufactured so the exact solution is the reference's u* = (9-x²)(9-y²)
(/root/reference/fea_symbolic.cu:494-498).  The Jacobian is never
assembled: the inner CG consumes ``jax.jvp`` of the assembled residual —
the functional-transform answer to the reference's GiNaC symbolic
differentiation (SURVEY.md §2.2 "symbolic shape functions"), extended to
a problem class (nonlinear PDE) the reference cannot express.

    python examples/nonlinear_poisson.py [--n 512] [--tol 1e-8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512,
                    help="mesh lines per side (512 -> 263,169 DOFs)")
    ap.add_argument("--tol", type=float, default=1e-6,
                help="relative residual (fp32 pipeline: ~1e-7 is the floor)")
    ap.add_argument("--precond", choices=["jacobi", "amg"],
                    default="jacobi",
                    help="inner-CG preconditioner.  'amg' freezes an "
                    "interval-W hierarchy of the LINEAR part — wins when "
                    "diffusion dominates, but on this manufactured "
                    "problem the reaction term 3u^2 (u ~ 81) swamps the "
                    "Laplacian near the solution and Jacobi measured "
                    "FEWER total inner iterations (176 vs 304 at n=64); "
                    "kept for problems in the diffusion-dominated regime")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    args = ap.parse_args(argv)
    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tpufem.assemble.dense import assemble_vector
    from tpufem.assemble.ell import assemble_ell
    from tpufem.assemble.local import (element_load,
                                       element_nonlinear_load,
                                       p1_stiffness)
    from tpufem.fem.elements import P1Triangle
    from tpufem.fem.quadrature import triangle_rule
    from tpufem.mesh.adjacency import ell_pattern
    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.solve.newton import newton_krylov

    t0 = time.perf_counter()
    mesh = rectangle_mesh(-3.0, 3.0, -3.0, 3.0, args.n, args.n)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8,
                      with_sort_plan=False)
    t_host = time.perf_counter() - t0

    element = P1Triangle()
    rule = triangle_rule(5)
    ec = jnp.asarray(mesh.element_coords(), jnp.float32)
    conn = jnp.asarray(mesh.conn)
    nn = mesh.num_nodes
    A = assemble_ell(pat, p1_stiffness(ec, element))

    def exact(x):
        return (9.0 - x[..., 0] ** 2) * (9.0 - x[..., 1] ** 2)

    def f(x):
        return (36.0 - 2.0 * (x[..., 0] ** 2 + x[..., 1] ** 2)
                + exact(x) ** 3)

    b = assemble_vector(conn, element_load(ec, element, rule, f), nn)
    bc = jnp.asarray(mesh.node_flags != 0)
    d = A.diagonal()
    inv_d = jnp.where(bc, 1.0, jnp.where(d != 0, 1.0 / d, 1.0))
    if args.precond == "amg":
        # frozen interval-W AMG of the BC-applied LINEAR operator: the
        # Jacobian is A_int + 3u^2 M_int, so this preconditions every
        # Newton step well without per-step setup (rectangle numbering
        # is already banded — no RCM needed)
        from tpufem.solve.amg import build_amg
        from tpufem.solve.bc import apply_dirichlet_ell
        A_bc, _ = apply_dirichlet_ell(A, b, bc)
        hier = build_amg(A_bc, aggregation="interval", cycle="W")
        M = hier.apply
    else:
        M = lambda r: r * inv_d

    def residual(u):
        ui = jnp.where(bc, 0.0, u)
        nl = assemble_vector(
            conn, element_nonlinear_load(ec, element, rule, ui[conn],
                                         lambda w: w ** 3), nn)
        r = A.matvec(ui) + nl - b
        return jnp.where(bc, u, r)

    run = jax.jit(lambda u0: newton_krylov(
        residual, u0, tol=args.tol, maxiter=40, M=M))

    t0 = time.perf_counter()
    res = run(jnp.zeros(nn, jnp.float32))
    res.x.block_until_ready()
    t_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(jnp.zeros(nn, jnp.float32))
    res.x.block_until_ready()
    t_solve = time.perf_counter() - t0

    u = np.asarray(res.x)
    ue = exact(mesh.coords)
    err = float(np.sqrt(np.mean((u - ue) ** 2))
                / np.sqrt(np.mean(ue ** 2)))
    out = {
        "metric": "semilinear_poisson_newton_krylov",
        "dofs": nn,
        "precond": args.precond,
        "newton_iters": int(res.iterations),
        "inner_cg_iters_total": int(res.inner_iterations),
        "relres": float(res.residual_norm),
        "converged": bool(res.converged),
        "solve_s": round(t_solve, 3),
        "rel_l2_error_vs_exact": err,
        "walls_s": {"host": round(t_host, 2),
                    "compile": round(t_wall, 2)},
    }
    print(json.dumps(out))
    if not bool(res.converged):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
