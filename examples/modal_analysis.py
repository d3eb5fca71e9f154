"""Modal analysis at scale: smallest-k eigenpairs of the FEM Laplacian.

A capability the reference cannot express at all (no solver exists,
SURVEY.md §0; /root/reference/fea_symbolic.cu stops at the assembled
system).  This example runs block inverse subspace iteration
(tpufem.solve.eigen) on an UNSTRUCTURED perturbed mesh at up to ~1M DOFs
on one TPU chip:

  1. perturbed triangle mesh, RCM-renumbered (native C++ path);
  2. stiffness ELL + lumped mass assembled on device;
  3. batched inner solves: the q = k+buffer CG chains run in LOCKSTEP
     (solve.cg.cg_fixed_block) over the multi-RHS banded Pallas SpMV
     (ELLMatrix.matvec_multi — matrix planes stream once per row-block
     for all q RHS), replacing round-4's column-serial Python loop
     (VERDICT r4 item 7), preconditioned by a greedy-SA AMG V-cycle via
     the multi-RHS cycle (AMGHierarchy.apply_multi) — the only inner
     preconditioner whose solve accuracy is mesh-independent (Jacobi and
     Chebyshev floor the outer Rayleigh-Ritz at 17% / 6.6% eigenvalue
     error by 491k DOFs; BENCH_NOTES r5 phases B5/D1);
  4. golden check: Dirichlet eigenvalues of the (-3,3)^2 square are
     pi^2 (i^2+j^2)/36 — computed modes must match to O(h^2).

    python examples/modal_analysis.py [--n 700] [--k 5] [--serial]
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
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_mass, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.precond import jacobi


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=700,
                    help="mesh lines per side (700 -> 491,401 DOFs; "
                    "1000 -> 1,002,001)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--buffer", type=int, default=3)
    ap.add_argument("--inner", type=int, default=None,
                    help="CG iterations per inverse application "
                    "(default: 20 for amg, 60 otherwise)")
    ap.add_argument("--outer", type=int, default=25)
    ap.add_argument("--inner-precond", choices=["amg", "chebyshev",
                                                "jacobi"],
                    default="amg",
                    help="inner-CG preconditioner.  amg (default): "
                    "greedy-SA V-cycle via the multi-RHS cycle "
                    "(hier.apply_multi) — the only one whose inverse "
                    "application stays accurate as cond(A)~1/h^2 grows "
                    "(Jacobi left 17%% eigenvalue error and chebyshev "
                    "6.6%% at 491k DOFs: 60 inner iters bottom out at "
                    "~6e-2 solve accuracy, which floors the outer "
                    "Rayleigh-Ritz — BENCH_NOTES r5 phases B5/D1); "
                    "chebyshev/jacobi kept for the A/B record")
    ap.add_argument("--serial", action="store_true",
                    help="column-serial inner solves (the round-4 path) "
                    "for the A/B against the batched default")
    ap.add_argument("--jitter", type=float, default=0.25)
    ap.add_argument("--no-mixed", action="store_true",
                    help="disable mixed precision (pure fp32): the "
                    "fp32 SpMV floor eps32*cond(A) ~ 1/h^2 makes the "
                    "eigenvalues WRONG past ~100k DOFs regardless of "
                    "inner solver (+0.14 uniform inflation, O(1) "
                    "residuals at 491k — BENCH_NOTES r5 phase E3); "
                    "kept for the A/B record")
    ap.add_argument("--outer-chunk", type=int, default=None,
                    help="run the outer loop host-side, this many "
                    "subspace steps per compiled execution (0 = one "
                    "fused program; default 5 at >= 800k DOFs, else 0). "
                    "One fused 25-step program at 1M DOFs is a "
                    "minutes-long single device execution, which trips "
                    "relay execution limits (UNAVAILABLE fault, "
                    "BENCH_NOTES r5 phase F3) even though every "
                    "ingredient passes individually; chunked steps stay "
                    "seconds-long at O(ms) dispatch cost")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    args = ap.parse_args(argv)
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    mixed = not args.no_mixed
    if mixed:
        # fp64 residual/Gram accumulation (XLA emulates f64 on TPU);
        # the inner solves stay on the fp32 Pallas path
        jax.config.update("jax_enable_x64", True)
    n = args.n

    from examples.unstructured_1m import rcm_renumber

    t0 = time.perf_counter()
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n,
                                    jitter=args.jitter, seed=0)
    mesh = rcm_renumber(mesh)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    t_host = time.perf_counter() - t0
    nn = mesh.num_nodes
    print(f"# {nn} DOFs, {mesh.num_elements} elements, host {t_host:.2f}s",
          file=sys.stderr)

    element = P1Triangle()
    rule = triangle_rule(5)
    # mixed: assemble ONCE in fp64 (XLA-emulated on TPU, one-time) so the
    # fp64 residual operator is the exact discretization, then cast down
    # for the fp32 Pallas fast path — same split as solve.refine
    asm_dtype = jnp.float64 if mixed else jnp.float32
    ec = jnp.asarray(mesh.element_coords(), asm_dtype)
    conn = jnp.asarray(mesh.conn)
    bc = jnp.asarray(mesh.node_flags != 0)

    t0 = time.perf_counter()
    A = assemble_ell(pat, p1_stiffness(ec, element))
    A, _ = apply_dirichlet_ell(A, jnp.zeros(nn, ec.dtype), bc)
    Me = element_mass(ec, element, rule)
    mL = assemble_vector(conn, Me.sum(-1), nn)
    # constrained rows carry A=I; give them unit mass so they sit at
    # lambda=1, far above the smallest interior modes (~pi^2/18)
    mL = jnp.where(bc, 1.0, mL)
    if mixed:
        from tpufem.sparse.ell import ELLMatrix
        data64 = A.data
        A = ELLMatrix(A.data.astype(jnp.float32), A.cols,
                      A.row_lengths, A.diag_pos)
    else:
        data64 = None
    A.resolve_band()
    jax.block_until_ready(A.data)
    t_asm = time.perf_counter() - t0

    # A/mL/bc (and the AMG hierarchy — a registered pytree) enter the
    # jitted program as ARGUMENTS, never by closure — a captured operator
    # is baked into the lowered HLO as constants (~100s of MB at this
    # scale, minutes of lowering; BENCH_NOTES r4).
    # Gershgorin lmax on the CONCRETE matrix (a host float closes over the
    # jit safely; device arrays must enter as arguments instead)
    inner = args.inner
    hier, t_psetup, setup_walls = None, 0.0, {}
    if args.inner_precond == "amg":
        from tpufem.solve.amg import build_amg
        inner = 20 if inner is None else inner
        t0 = time.perf_counter()
        hier = build_amg(A, strength=0.08, walls_out=setup_walls)
        t_psetup = time.perf_counter() - t0
    elif args.inner_precond == "chebyshev":
        from tpufem.solve.precond import chebyshev, lambda_max_bound
        lmax = float(lambda_max_bound(A))
    inner = 60 if inner is None else inner

    def make_kit(A, mL, bc, hier, data64):
        """(X0, step, finish) with the operators closing over whatever
        A/hier/... currently are — concrete pytrees when called eagerly,
        tracer arguments inside a jit (which is what keeps the matrices
        out of the lowered HLO)."""
        if args.inner_precond == "amg":
            M1, Mq = hier.apply, hier.apply_multi
        elif args.inner_precond == "chebyshev":
            M1 = chebyshev(A.matvec, A.diagonal(), degree=10, lmax=lmax)
            Mq = chebyshev(A.matvec_multi, A.diagonal(), degree=10,
                           lmax=lmax)
        else:
            M1, Mq = jacobi(A), None
        kw = dict(lumped_mass=mL, M=M1, bc_mask=bc,
                  inner_iters=inner, outer_iters=args.outer,
                  buffer=args.buffer, dtype=jnp.float32)
        if not args.serial:
            kw["matvec_multi"] = A.matvec_multi
            kw["M_multi"] = Mq
        if data64 is not None:
            from tpufem.sparse.ell import ell_matvec_multi
            kw["matvec_hi_multi"] = (
                lambda X: ell_matvec_multi(data64, A.cols, X))
        from tpufem.solve.eigen import subspace_stepper
        return subspace_stepper(A.matvec, nn, args.k, **kw)

    chunk = args.outer_chunk
    if chunk is None:
        chunk = 5 if nn >= 800_000 else 0

    if chunk == 0:
        def run_fn(A, mL, bc, hier, data64):
            X0, step, finish = make_kit(A, mL, bc, hier, data64)
            return finish(jax.lax.fori_loop(
                0, args.outer, lambda i, X: step(X), X0))

        run = jax.jit(run_fn)
        t0 = time.perf_counter()
        res = run(A, mL, bc, hier, data64)
        jax.block_until_ready(res.eigenvalues)
        t_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run(A, mL, bc, hier, data64)
        jax.block_until_ready(res.eigenvalues)
        t_solve = time.perf_counter() - t0
    else:
        # whole chunks only (a remainder program would be a second
        # full compile); round the outer count up and report it
        n_calls = -(-args.outer // chunk)
        args.outer = n_calls * chunk

        def step_c(A, mL, bc, hier, data64, X):
            _, step, _ = make_kit(A, mL, bc, hier, data64)
            return jax.lax.fori_loop(0, chunk, lambda i, Y: step(Y), X)

        def finish_j(A, mL, bc, hier, data64, X):
            _, _, finish = make_kit(A, mL, bc, hier, data64)
            return finish(X)

        step_j = jax.jit(step_c, donate_argnums=5)
        fin_j = jax.jit(finish_j)
        X0, _, _ = make_kit(A, mL, bc, hier, data64)   # eager init
        jax.block_until_ready(X0)

        def full_pass():
            X = jnp.copy(X0)        # step_j donates its X argument
            for _ in range(n_calls):
                X = step_j(A, mL, bc, hier, data64, X)
            res = fin_j(A, mL, bc, hier, data64, X)
            jax.block_until_ready(res.eigenvalues)
            return res

        t0 = time.perf_counter()
        res = full_pass()                               # compile + run
        t_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = full_pass()                               # warm, timed
        t_solve = time.perf_counter() - t0

    lam = np.asarray(res.eigenvalues, np.float64)
    exact = np.array(sorted(np.pi ** 2 / 36 * (i * i + j * j)
                            for i in range(1, 6)
                            for j in range(1, 6)))[:args.k]
    lam_err = float(np.abs(lam - exact).max() / exact.max())
    out = {
        "metric": "modal_smallest_k_unstructured",
        "dofs": nn,
        "k": args.k,
        "mode": "serial" if args.serial else "batched",
        "outer_chunk": chunk,
        "precision": "mixed" if mixed else "fp32",
        "inner_precond": args.inner_precond,
        "inner_iters": inner,
        "outer_iters": args.outer,
        "eigenvalues": [round(float(v), 8) for v in lam],
        "exact": [round(float(v), 8) for v in exact],
        "rel_eig_err_vs_analytic": lam_err,
        "max_residual": float(np.max(np.asarray(res.residual_norms))),
        "solve_ms": round(t_solve * 1e3, 2),
        "walls_s": {"host": round(t_host, 2),
                    "assemble": round(t_asm, 2),
                    "precond_setup": round(t_psetup, 2),
                    "precond_setup_detail": {
                        k: round(v, 2) for k, v in setup_walls.items()},
                    "solve_compile": round(t_wall, 2)},
    }
    print(json.dumps(out))
    # O(h^2) discretization + fp32 floor: fail loudly if modes are wrong.
    # Written as `not (ok)` so a NaN eigenvalue FAILS (NaN > x is False —
    # the naive comparison silently passed an all-NaN run).
    if not (lam_err <= 5e-3 + 40.0 / (n * n)):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
