"""tpufem benchmark: 3D Poisson at ~1M DOFs on one TPU chip.

The BASELINE.md north-star config: assemble + Jacobi-PCG-solve a 1M-DOF 3D P1
Poisson problem (structured tet mesh of (-3,3)^3, the 3D extension of the
reference's model problem).  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no numbers (README is a bare title,
BASELINE.md) and contains no solver at all, so the baseline is an estimated
speed-of-light time for an equivalent CUDA pipeline on an A100-40GB
(1555 GB/s HBM): assembly traffic (~460 MB at fp32: element coords in, ELL
values out, one pass) + ~130 Jacobi-PCG iterations of a 15-diagonal SpMV +
vector work (~100 MB/iter) => ~13.4 GB => ~8.6 ms, i.e. ~1.2e8 DOFs/s
end-to-end.  vs_baseline = measured_dofs_per_sec / 1.2e8.  This denominator
is an estimate with real error bars — see BENCH_NOTES.md "vs_baseline
error bars" for the sensitivity analysis (0.9-1.9e8 under Jacobi-PCG
assumptions; ~6e8 for a counterfactual A100 running our MG algorithm).

Pipeline specifics (all TPU-native design, see SURVEY.md §7):
  * batch-trailing element kernels (tpufem.assemble.planar) — large minor
    dims so the VPU streams at full HBM bandwidth;
  * shift-invariant structured assembly (tpufem.assemble.structured) —
    96 static slice-adds, zero index arrays, zero scatter;
  * 15-offset stencil SpMV (tpufem.sparse.stencil) — zero gathers.

Timing methodology: rep-difference with in-jit loops and forced host
transfer (see tpufem/utils/timing.py) — calibrated to 98% of v5e matmul peak
and 94% of HBM peak; the remote-relay dispatch latency (~30 ms/call) cancels.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

# fp64 is needed for the time-to-1e-8 refinement metric (all fp32 paths keep
# explicit dtypes, so enabling x64 changes nothing else — the test suite
# always runs with x64 on)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpufem.assemble.structured import structured_plan
from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                            node_coords_embedded_from_grid)
from tpufem.ops.stencil_pallas import (pick_block_lead,
                                       stencil_matvec_dot_embedded,
                                       stencil_matvec_embedded)
from tpufem.solve.cg import cg, cg_fixed
from tpufem.solve.multigrid import (_apply_bc_numpy, _embed_grid_numpy,
                                    _light_grid, _uniform_cell_stiffness,
                                    _uniform_stencil_data,
                                    build_poisson_multigrid, cast_hierarchy,
                                    mg_preconditioner)
from tpufem.solve.poisson import model_problem_3d, model_problem_3d_planes
from tpufem.solve.refine import refined_stencil_solve
from tpufem.utils.aot import CompiledCache
from tpufem.utils.timing import PhaseTimer, device_seconds_per_rep

BASELINE_DOFS_PER_SEC = 1.2e8   # estimated A100 CUDA pipeline (see docstring)


def _device_watchdog(timeout_s: float = 300.0):
    """Fail fast if backend init hangs (wedged axon relay, 2026-08-17:
    jax.devices() blocked in the client's connect-retry loop for 7+ h).
    Legitimate init takes seconds; past ``timeout_s`` we print a clear
    diagnostic and hard-exit instead of letting the caller's capture
    time out with no explanation."""
    import threading

    done = threading.Event()

    def trip():
        if not done.wait(timeout_s):
            print(f"bench.py: backend init did not complete within "
                  f"{timeout_s:.0f}s — TPU relay unreachable (see "
                  f"BENCH_NOTES.md 'tunnel outage'); aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=trip, daemon=True).start()
    jax.devices()          # blocks here if the relay is wedged
    done.set()


def main():
    _device_watchdog()
    # default 96: ~0.91M DOFs and dyadically refinable (96->48->24->12->6)
    # so the multigrid hierarchy bottoms out on a tiny dense-inverse level
    n = int(os.environ.get("TPUFEM_BENCH_N", "96"))
    solver = os.environ.get("TPUFEM_BENCH_SOLVER", "mg")   # mg | jacobi
    # interpret=1: run the Pallas kernels in interpret mode (CPU smoke tests
    # of the bench plumbing; timings are meaningless)
    interp = os.environ.get("TPUFEM_BENCH_INTERPRET", "0") == "1"
    dtype = jnp.float32
    timer = PhaseTimer()

    with timer("host_mesh_and_plan"):
        # mesh-free setup: the structured pipeline needs only the node
        # coordinate grid + boundary mask, never element arrays
        # (VERDICT.md item 3a)
        info, coords_grid, bc_grid = _light_grid((-3.0, 3.0), n, 3)
        plan = structured_plan(info, embed=True)
        Ch = node_coords_embedded_from_grid(coords_grid, plan, np.float32)
    nn = int(np.prod(info.node_grid))
    ns = plan.num_store_rows
    offsets = plan.offsets
    block_lead = pick_block_lead(plan.store_grid, plan.width)
    rule = tetrahedron_rule(2)
    f_planes = model_problem_3d_planes()
    _, exact = model_problem_3d()
    bc_mask = jax.device_put(jnp.asarray(_embed_grid_numpy(
        bc_grid, plan.store_grid, fill=False)))

    with timer("h2d"):
        X = jax.device_put(jnp.asarray(Ch))
        X.block_until_ready()

    # ---- single-pass fused system build (Pallas): stiffness + RHS + BC ----
    diag_k = plan.offsets.index(0)

    # Every top-level program goes through the AOT executable cache
    # (tpufem/utils/aot.py): under the axon relay the server-side XLA
    # compile of these Pallas programs fluctuates 40-310 s each
    # (BENCH_r02 build_system_wall); a cache hit deserializes the compiled
    # executable in seconds.  Traceable fns stay plain so the rep-loop
    # programs can inline them.
    aot = CompiledCache()

    def build_system(C):
        A, b = build_poisson_system_pallas(plan, C, bc_mask, f_planes,
                                           rule, interpret=interp)
        d = A.data[diag_k]
        inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
        return A.data, b, inv_d

    # The one-time wall, DECOMPOSED (VERDICT r4 item 3): _load = trace +
    # client-side cache load (or compile on miss); _first_exec = first
    # execution, where the axon server pays its deferred load/compile of
    # the executable (458.9 s on a 0.1 s HIT in BENCH_r04 — invisible to
    # every client-side stat until now); _warm = steady-state call.  The
    # total equals the old build_system_wall.
    with timer("build_system_load"):
        build_system_x = aot.get(build_system, (X,), tag="build_system")
    with timer("build_system_first_exec"):
        data, b, inv_d = build_system_x(X)
        _ = float(b[0])
    with timer("build_system_warm"):
        data, b, inv_d = build_system_x(X)
        _ = float(b[0])

    # Preconditioner variants (CG always iterates on the fused-assembled
    # system; the preconditioner is a free SPD choice):
    #   const (default): analytic uniform-box ConstMGLevels — the V-cycle's
    #     K coefficient planes become compile-time constants, leaving only
    #     vector traffic in every smoother pass (measured ~25% faster
    #     per PCG iteration than bf16, ~35% than fp32 at n=96);
    #   bf16: general hierarchy with bfloat16 coefficient planes — the
    #     right mode for non-uniform geometry;
    #   fp32: the round-1 general hierarchy.
    pmode = os.environ.get("TPUFEM_BENCH_PRECOND", "const")
    if pmode not in ("const", "bf16", "fp32"):
        raise SystemExit(f"TPUFEM_BENCH_PRECOND={pmode!r}: expected "
                         "const | bf16 | fp32")
    with timer("build_mg_hierarchy"):
        if solver == "mg":
            if pmode == "const":
                levels = build_poisson_multigrid((-3.0, 3.0), n, 3,
                                                 dtype=dtype, coarse_max=8,
                                                 use_pallas=True,
                                                 operator="const")
            else:
                # finest level reuses the fused on-device build (top=...);
                # coarse levels assemble analytically from one cell
                levels = build_poisson_multigrid((-3.0, 3.0), n, 3,
                                                 dtype=dtype, coarse_max=8,
                                                 use_pallas=True,
                                                 top=(data, bc_mask))
                if pmode == "bf16":
                    levels = cast_hierarchy(levels, jnp.bfloat16)
            precond = mg_preconditioner(levels, nu1=1, nu2=1,
                                        use_pallas=not interp)
            precond_dot = mg_preconditioner(levels, nu1=1, nu2=1,
                                            use_pallas=not interp,
                                            with_dot=True)
        else:
            precond = lambda r: r * inv_d
            precond_dot = None

    # ---- timed: full assembly (stiffness + RHS + BC), rep-difference ----
    def asm_reps(X, reps):
        def body(i, carry):
            eps = carry[0, 0] * 1e-30   # loop-carried dependence
            d, _, _ = build_system(X + eps)
            return d
        return jax.lax.fori_loop(
            0, reps, body, jnp.zeros((len(offsets), ns), dtype))

    with timer("compile_asm_reps"):
        asm_reps_x = aot.get(asm_reps, (X, jnp.int32(2)), tag="asm_reps")

    def measure_asm():
        return device_seconds_per_rep(
            lambda r: asm_reps_x(X, jnp.int32(r)), reps_low=2, reps_high=22)

    t_asm = measure_asm()

    # ---- one jitted PCG used for both timing and convergence ----
    # The operator is reshaped to its [K, *store_grid] kernel layout ONCE
    # per program, outside the iteration loop: a [K, NS] jit *argument*
    # reshaped inside the loop body costs a full 83 MB relayout copy every
    # iteration that XLA does not hoist — measured 0.50 vs 0.23 ms/iter at
    # n=96 (closure-baked constants and pre-shaped arguments are equally
    # fast; the 2D argument is not).
    def as_grid(data):
        return data.reshape((len(offsets),) + tuple(plan.store_grid))

    def mv_of(data):
        return lambda v: stencil_matvec_embedded(
            data, v, plan, block_lead=block_lead, interpret=interp)

    def mvd_of(data):
        return lambda v: stencil_matvec_dot_embedded(
            data, v, plan, block_lead=block_lead, interpret=interp)

    def pcg_run_fn(data, b, iters):
        dg = as_grid(data)
        x, r = cg_fixed(mv_of(dg), b, iters, M=precond,
                        matvec_dot=mvd_of(dg), M_dot=precond_dot)
        return x, jnp.linalg.norm(r) / jnp.linalg.norm(b)

    # The solve-family programs are NOT AOT-cached: their serialized
    # executables are ~100 MB and deserialize_and_load under the axon relay
    # measured 31-119 s — worse than their 8-11 s compiles.  The cache only
    # wins for the small build/assembly programs (0.7 s loads).
    with timer("compile_pcg"):
        pcg_run = jax.jit(pcg_run_fn)
        pcg_run(data, b, jnp.int32(4))[1].block_until_ready()

    reps_hi = 60 if solver == "mg" else 210

    def measure_iter():
        return device_seconds_per_rep(
            lambda r: pcg_run(data, b, jnp.int32(r)),
            reps_low=5, reps_high=reps_hi)

    # Iteration stream bound: the physical floor for one PCG iteration
    # (operator planes + vector passes at HBM peak).  Used below as the
    # capture self-check (VERDICT r2 item 2): a sample far above it is a
    # multi-tenant slow window, not the program.
    iter_bytes = (len(offsets) * ns + 7 * ns) * 4   # data + ~7 vector passes
    iter_floor_s = iter_bytes / 819.0e9

    iter_samples = [measure_iter()]

    # ---- convergence: iterations to 1e-5 relative residual (fp32) ----
    if solver == "mg":
        schedule = [4, 6, 8, 10, 12, 16, 24, 32, 48, 64]
    else:
        schedule = [50, 100, 150, 200, 300, 400, 800, 1600, 3200]
    relres = 1.0
    for iters in schedule:
        x, rr = pcg_run(data, b, jnp.int32(iters))
        relres = float(rr)
        if relres < 1e-5:
            break

    # ---- guarded product-API cg() to the same tolerance (VERDICT item 10:
    # the convergence-checked while_loop the user actually calls) ----
    def cg_guarded_run_fn(data, b, eps):
        dg = as_grid(data)
        res = cg(mv_of(dg), b + eps, tol=1e-5, maxiter=iters + 4,
                 M=precond, check_every=4, matvec_dot=mvd_of(dg),
                 M_dot=precond_dot)
        return res.x, res.residual_norm, res.iterations

    def guarded_reps(data, b, reps):
        def body(i, carry):
            x, _, _ = cg_guarded_run_fn(data, b, carry[0] * 1e-30)
            return x
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(b))

    with timer("compile_guarded"):
        eps0 = jnp.zeros((), dtype)
        cg_guarded_run = jax.jit(cg_guarded_run_fn)
        guarded_reps_x = jax.jit(guarded_reps)
        guarded_reps_x(data, b, jnp.int32(1)).block_until_ready()

    t_guard = device_seconds_per_rep(
        lambda r: guarded_reps_x(data, b, jnp.int32(r)), reps_low=1,
        reps_high=6)
    _, relres_g, iters_g = cg_guarded_run(data, b, eps0)
    iters_g, relres_g = int(iters_g), float(relres_g)

    iter_samples.append(measure_iter())     # 2nd spaced sample

    # ---- time-to-1e-8: mixed-precision refinement (VERDICT item 5) ----
    # fp64 residual operator: analytic assembly is exact on the uniform box
    raw64 = _uniform_stencil_data(plan, _uniform_cell_stiffness(
        (-3.0, 3.0), n, 3, np.float64), np.float64)
    mask_np = _embed_grid_numpy(bc_grid, plan.store_grid, fill=False)
    raw64 = _apply_bc_numpy(raw64, offsets, mask_np)
    data64 = jax.device_put(jnp.asarray(raw64))
    del raw64

    def refined_run_fn(data, data64, b):
        dg = as_grid(data)
        return refined_stencil_solve(
            data, data64, offsets, b.astype(jnp.float64), precond,
            tol=1e-8, inner_iters=12, max_outer=6,
            matvec32=mv_of(dg), matvec_dot32=mvd_of(dg),
            M_dot=precond_dot)

    def refined_reps(data, data64, b, reps):
        def body(i, carry):
            res = refined_run_fn(data, data64, b + carry[0].astype(dtype)
                                 * 1e-30)
            return res.x
        return jax.lax.fori_loop(
            0, reps, body, jnp.zeros_like(b, jnp.float64))

    with timer("compile_refined"):
        refined_run = jax.jit(refined_run_fn)
        refined_reps_x = jax.jit(refined_reps)
        refined_reps_x(data, data64, b, jnp.int32(1)).block_until_ready()

    t_refined = device_seconds_per_rep(
        lambda r: refined_reps_x(data, data64, b, jnp.int32(r)), reps_low=1,
        reps_high=5)
    res8 = refined_run(data, data64, b)
    relres8 = float(res8.residual_norm)
    outers8 = int(res8.outer_iterations)

    # Capture hardening (VERDICT r2 item 2): the shared chip's throughput
    # drifts in sustained multi-tenant windows (BENCH_NOTES "Timing on a
    # multi-tenant chip"), so the headline timings take the MIN over >=3
    # samples spaced minutes apart across the run — and if the min still
    # sits far above the physical stream floor, the whole run landed in a
    # slow window: keep re-sampling (bounded) until it drops or attempts
    # run out, and report the spread.
    t_asm = min(t_asm, measure_asm())
    iter_samples.append(measure_iter())     # 3rd spaced sample
    for _ in range(4):
        if min(iter_samples) <= 2.5 * iter_floor_s:
            break
        time.sleep(10.0)                    # escape the slow window
        iter_samples.append(measure_iter())
    t_iter = min(iter_samples)

    # solution quality vs exact manufactured solution
    coords = coords_grid.reshape(3, -1).T          # [NN, 3], x fastest
    ue = exact(coords).astype(np.float32)
    u = np.asarray(plan.extract_field(x))
    err = float(np.sqrt(np.mean((u - ue) ** 2))
                / np.sqrt(np.mean(ue ** 2)))

    t_total = t_asm + iters * t_iter
    dofs_per_sec = nn / t_total

    # HBM speed-of-light fractions (node coords in, system out)
    asm_bytes = (3 * X.size + (len(offsets) + 2) * ns) * 4
    asm_sol = asm_bytes / t_asm / 1e9 / 819.0
    iter_sol = iter_bytes / t_iter / 1e9 / 819.0

    report = {
        "metric": "3d_p1_poisson_1M_assemble_pcg_dofs_per_sec",
        "value": round(dofs_per_sec, 1),
        "unit": "dofs/s",
        "vs_baseline": round(dofs_per_sec / BASELINE_DOFS_PER_SEC, 3),
    }
    detail = {
        "num_dofs": nn,
        "assemble_ms": round(t_asm * 1e3, 3),
        "assemble_hbm_sol_fraction": round(asm_sol, 3),
        "pcg_iter_ms": round(t_iter * 1e3, 4),
        "pcg_iter_hbm_sol_fraction": round(iter_sol, 3),
        "solver": solver,
        "precond": pmode if solver == "mg" else "jacobi",
        "pcg_iters_to_1e-5": iters,
        "pcg_relres": relres,
        "solve_ms": round(iters * t_iter * 1e3, 2),
        "total_ms": round(t_total * 1e3, 2),
        "solve_guarded_ms": round(t_guard * 1e3, 2),
        "guarded_iters": iters_g,
        "guarded_relres": relres_g,
        "time_to_1e-8_ms": round(t_refined * 1e3, 2),
        "refined_relres": relres8,
        "refined_outer_iters": outers8,
        "refined_inner_iters_total": outers8 * 12,
        "rel_l2_error_vs_exact": err,
        "pcg_iter_samples_ms": [round(s * 1e3, 4) for s in iter_samples],
        "pcg_iter_floor_ms": round(iter_floor_s * 1e3, 4),
        "phases_s": {k: round(v, 3) for k, v in timer.report().items()},
        "aot_cache": aot.stats,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report))
    print("# detail:", json.dumps(detail), file=sys.stderr)


if __name__ == "__main__":
    main()
