"""Unstructured 1M-row end-to-end headline: assemble + Chebyshev-PCG solve.

BASELINE config 2 at the reference's ELL scale: the reference's most complete
variant assembles a 1000x100 ELL system and stops
(/root/reference/fea_test_sm_sym_sparse2.cu:16-17 and :273-282 — no solver
exists).  This example takes the *million-row* version of that system all the
way to a solved PDE on one TPU chip:

  1. perturbed + randomly-renumbered triangle mesh (no stencil structure);
  2. host RCM renumbering (native C++ path) -> bandwidth ~ one mesh line;
  3. generic scatter assembly on device (assemble/ell.py — the reference's
     search+atomicAdd kernel, re-done as precomputed-slot scatter-add);
  4. PCG where every SpMV is the banded Pallas kernel (auto-dispatched by
     ELLMatrix.matvec), preconditioned by Chebyshev-Jacobi (default) or
     the smoothed-aggregation AMG V-cycle (--precond amg, solve/amg.py) —
     the mesh-independent preconditioning VERDICT.md r2 item 5 asked for.

    python examples/unstructured_1m.py [--n 1000] [--precond amg]
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

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.precond import (chebyshev, estimate_lambda_max, jacobi,
                                  lambda_max_bound)


def rcm_renumber(mesh: Mesh, pad_to: int = 8):
    """Renumber mesh nodes with RCM so the assembled matrix is banded.

    RCM needs only the adjacency cols, not the full scatter plan — the
    native neighbor-list builder supplies them in one C++ pass instead
    of the throwaway full ell_pattern this used to build."""
    try:
        from tpufem import native
        if native.available():
            _, cols = native.node_adjacency(mesh.conn, mesh.num_nodes)
        else:
            raise RuntimeError
    except Exception:
        cols = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=pad_to,
                           with_sort_plan=False).cols
    perm = reverse_cuthill_mckee(cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    return Mesh(coords=np.ascontiguousarray(mesh.coords[perm]),
                conn=inv[mesh.conn].astype(mesh.conn.dtype),
                node_flags=np.ascontiguousarray(mesh.node_flags[perm]),
                cell_type=mesh.cell_type)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000,
                    help="mesh lines per side (default 1000 -> 1,002,001 "
                    "rows, 2M elements)")
    ap.add_argument("--degree", type=int, default=14,
                    help="Chebyshev polynomial degree")
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--precond", choices=["amg", "chebyshev", "jacobi"],
                    default="chebyshev",
                    help="amg = smoothed-aggregation V-cycle (solve/amg.py):"
                    " the measured solve-time winner at 1M rows (221 ms /"
                    " 26 iters, round-5 A/B) but pays a ~55 s hierarchy"
                    " setup; chebyshev = polynomial Jacobi (549 ms / 244"
                    " iters, ~zero setup — the single-shot e2e winner and"
                    " so this example's default); jacobi = diagonal")
    ap.add_argument("--agg", choices=["interval", "greedy"],
                    default="greedy",
                    help="AMG aggregation: greedy = classical Vanek with "
                    "banded-embedded transfers (measured winner at 1M "
                    "rows); interval = stride-window aggregation, "
                    "transfers fold into the smoother (also gather-free)")
    ap.add_argument("--strength", type=float, default=0.08,
                    help="SA strength-of-connection threshold for greedy "
                    "aggregation (0 = off; 0.08 classical)")
    ap.add_argument("--cycle", choices=["W", "V"], default="V",
                    help="AMG cycle: V is the measured 1M-row winner "
                    "(W's recursive coarse revisits cost 9.4x per cycle "
                    "on-chip); W bounds the iteration growth of "
                    "interval's 1D semicoarsening")
    ap.add_argument("--lmax", choices=["bound", "power"], default="bound",
                    help="lmax for the Chebyshev interval: 'bound' = "
                    "Gershgorin row sums (guaranteed safe); 'power' = "
                    "power iteration (underestimates at 1M rows and "
                    "DIVERGES — kept for the record, BENCH_NOTES r3)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    args = ap.parse_args(argv)
    if args.interpret:
        # must precede the first device use; Pallas kernels then run
        # interpreted automatically (ELLMatrix.matvec checks the backend)
        jax.config.update("jax_platforms", "cpu")
    n = args.n

    t0 = time.perf_counter()
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25, seed=0)
    mesh = rcm_renumber(mesh)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8,
                      with_sort_plan=False)
    t_host = time.perf_counter() - t0
    nn = mesh.num_nodes
    bw = int(np.abs(pat.cols.astype(np.int64)
                    - np.arange(nn)[:, None]).max())
    print(f"# {nn} rows, {mesh.num_elements} elements, RCM bandwidth {bw}, "
          f"host setup {t_host:.2f}s", file=sys.stderr)

    element = P1Triangle()
    rule = triangle_rule(5)
    f, exact = model_problem_2d()
    ec = jax.device_put(jnp.asarray(mesh.element_coords(), jnp.float32))
    conn = jnp.asarray(mesh.conn)
    bc = jnp.asarray(mesh.node_flags != 0)

    # All large arrays enter the jitted programs as ARGUMENTS, never by
    # closure: a captured array is baked into the lowered HLO as a literal
    # constant — at this scale that meant ~300 MB modules, 415 s lowering,
    # and HTTP 413 from the axon compile relay (BENCH_NOTES r4).  As
    # parameters they add only shapes to the module.
    slots = jnp.asarray(pat.slots.reshape(-1))
    width = pat.cols.shape[1]

    def build_fn(ec, conn, slots):
        from tpufem.assemble.ell import ell_values_scatter
        Ke = p1_stiffness(ec, element)
        data = ell_values_scatter(slots, Ke, nn, width)
        be = element_load(ec, element, rule, f)
        b = assemble_vector(conn, be, nn)
        return data, b

    # persist the compiled executables across runs: the server-side Mosaic
    # compile of the big programs costs up to ~470 s cold (BENCH_NOTES r3);
    # a warm cache turns that into a ~seconds deserialize (utils/aot.py)
    from tpufem.utils.aot import CompiledCache
    aot = CompiledCache()
    t0 = time.perf_counter()
    build = aot.get(build_fn, (ec, conn, slots), tag="unstr_build")
    data, b = build(ec, conn, slots)
    data.block_until_ready()
    t_build_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    data, b = build(ec, conn, slots)
    data.block_until_ready()
    t_build = time.perf_counter() - t0

    from tpufem.sparse.ell import ELLMatrix
    A = ELLMatrix(data, jnp.asarray(pat.cols),
                  diag_pos=jnp.asarray(pat.diag_pos))
    A, b = apply_dirichlet_ell(A, b, bc)
    # resolve the banded Pallas plan NOW: A crosses the jit boundary as an
    # argument below, where lazy resolution is no longer possible
    A.resolve_band()

    t0 = time.perf_counter()
    setup_detail = {}
    if args.precond == "amg":
        from tpufem.solve.amg import build_amg
        hier = build_amg(A, aggregation=args.agg, cycle=args.cycle,
                         strength=args.strength, walls_out=setup_detail)
        print(f"# AMG: levels {[lv.A.shape[0] for lv in hier.levels]}"
              f" + coarse {hier.coarse_inv.shape[0]}, operator complexity"
              f" {hier.operator_complexity:.2f}, {args.cycle}-cycle",
              file=sys.stderr)

        def solve_fn(b, op):
            A_, h = op
            return cg(A_.matvec, b, tol=args.tol, maxiter=3000,
                      M=h.apply, check_every=2)

        # levels[0].A IS this A (same device buffers), so passing both
        # costs no extra HBM; the pair keeps tiny meshes (zero levels,
        # coarse-only hierarchies) working too
        op = (A, hier)
    elif args.precond == "chebyshev":
        if args.lmax == "bound":
            lmax = lambda_max_bound(A)
        else:
            lmax = estimate_lambda_max(A.matvec, A.diagonal(), nn,
                                       dtype=A.dtype)

        def solve_fn(b, A_):
            M = chebyshev(A_.matvec, A_.diagonal(), degree=args.degree,
                          lmax=lmax)
            return cg(A_.matvec, b, tol=args.tol, maxiter=3000, M=M,
                      check_every=2)

        op = A
    else:
        def solve_fn(b, A_):
            return cg(A_.matvec, b, tol=args.tol, maxiter=3000,
                      M=jacobi(A_), check_every=2)

        op = A
    t_precond = time.perf_counter() - t0

    t0 = time.perf_counter()
    solve = aot.get(solve_fn, (b, op), tag="unstr_solve")
    res = solve(b, op)
    res.x.block_until_ready()
    t_solve_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solve(b, op)
    res.x.block_until_ready()
    t_solve = time.perf_counter() - t0

    ue = exact(mesh.coords)
    u = np.asarray(res.x)
    err = float(np.sqrt(np.mean((u - ue) ** 2))
                / np.sqrt(np.mean(ue ** 2)))
    out = {
        "metric": "unstructured_1m_assemble_chebpcg",
        "rows": nn,
        "elements": mesh.num_elements,
        "rcm_bandwidth": bw,
        "precond": args.precond,
        "cheb_degree": args.degree if args.precond == "chebyshev" else 0,
        "lmax_mode": args.lmax if args.precond == "chebyshev" else None,
        "amg_agg": args.agg if args.precond == "amg" else None,
        "amg_cycle": args.cycle if args.precond == "amg" else None,
        "amg_strength": args.strength if args.precond == "amg" else None,
        "pcg_iters": int(res.iterations),
        "relres": float(res.residual_norm),
        "converged": bool(res.converged),
        "assemble_ms": round(t_build * 1e3, 2),
        "solve_ms": round(t_solve * 1e3, 2),
        "total_ms": round((t_build + t_solve) * 1e3, 2),
        "dofs_per_sec": round(nn / (t_build + t_solve), 1),
        "rel_l2_error_vs_exact": err,
        "walls_s": {"host": round(t_host, 2),
                    "build_compile": round(t_build_wall, 2),
                    "precond_setup": round(t_precond, 2),
                    "precond_setup_detail": {
                        k: round(v, 2) for k, v in setup_detail.items()},
                    "solve_compile": round(t_solve_wall, 2),
                    "aot_cache": aot.stats},
    }
    print(json.dumps(out))
    if not bool(res.converged):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
