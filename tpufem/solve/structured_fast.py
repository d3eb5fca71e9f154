"""High-level fast path: the benchmark pipeline as a library API.

One call gives users the full production configuration measured in bench.py
(fused Pallas system build + geometric-MG-preconditioned CG with the Pallas
stencil SpMV) for 3D Poisson problems on structured box meshes:

    from tpufem.solve.structured_fast import solve_poisson_fast
    sol = solve_poisson_fast((-3, 3), n_cells=96, f_planes=f, tol=1e-5)

~4.5 ms device time at 913k DOFs on one v5e (assemble ~1.2 ms + 10-12
MG-PCG iterations at ~0.30 ms with the default constant-coefficient
preconditioner and batched convergence checks); scales past 11M DOFs on a
single chip (hierarchy setup is fully analytic, and with
``precond="general"`` the finest level reuses the fused on-device build,
so setup never materializes element arrays on the host).
"""
from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.structured import structured_plan
from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.ops.fused_system_pallas import (
    build_poisson_system_pallas, node_coords_embedded_from_grid)
from tpufem.ops.stencil_pallas import (pick_block_lead,
                                       stencil_matvec_dot_embedded,
                                       stencil_matvec_embedded)
from tpufem.solve.cg import CGResult, cg
from tpufem.solve.multigrid import build_poisson_multigrid, mg_preconditioner

__all__ = ["FastSolution", "solve_poisson_fast"]


class FastSolution(NamedTuple):
    u: jax.Array               # node-ordered solution [NN]
    cg: CGResult
    num_dofs: int
    phases_s: dict


def solve_poisson_fast(domain, n_cells: int, f_planes: Callable, *,
                       dim: int = 3,
                       tol: float = 1e-5, maxiter: int = 60,
                       dtype=jnp.float32, quadrature_degree: int = 2,
                       use_multigrid: bool = True,
                       levels: Optional[int] = None,
                       use_fused: bool = True,
                       g: Optional[Callable] = None,
                       rhs_mode: str = "quadrature",
                       precond: str = "const",
                       check_every: int = 4,
                       interpret: bool = False,
                       aot_cache: Optional[bool] = None) -> FastSolution:
    """Assemble + solve -Δu = f on (domain)^dim with n_cells^dim cells.

    ``f_planes(x, y[, z])`` takes coordinate planes and returns one plane
    (the batch-trailing RHS form).  ``n_cells`` should halve down to <= 8
    for the full multigrid hierarchy (e.g. 32/48/64/96/128/192/224).

    ``g``: Dirichlet boundary data as ``g(x, y[, z]) -> plane`` (nonzero
    BC: the fused kernel emits the raw system and elimination happens in
    one vectorized XLA pass); default None = zero BC inside the kernel.

    ``precond``: "const" (default) preconditions with the analytic
    constant-coefficient hierarchy — valid for ANY Dirichlet data on the
    uniform box this function assembles (elimination moves g to the RHS;
    the matrix is the same), and ~25-40% faster per iteration than the
    general hierarchy; "general" uses the assembled finest level
    (``top=``), the right choice if you edit the operator afterwards.

    ``check_every``: CG convergence-check batching (solve.cg) — the
    default recovers fixed-iteration pipelining within ~5%.

    ``aot_cache``: persist compiled executables across processes
    (tpufem.utils.aot) — on the axon relay the server-side compile of the
    fused build + solve programs costs 40-310 s per novel shape; a warm
    cache loads them in seconds.  Default None = on for TPU, off for CPU
    (local compiles are already fast).
    """
    phases = {}
    if aot_cache is None:
        aot_cache = jax.devices()[0].platform != "cpu"
    aot = None
    if aot_cache:
        from tpufem.utils.aot import CompiledCache
        aot = CompiledCache()

    def _program(fn, example_args, tag, **jit_kw):
        if aot is not None:
            return aot.get(fn, example_args, tag=tag, **jit_kw)
        return jax.jit(fn, **jit_kw)

    t0 = time.perf_counter()
    from tpufem.solve.multigrid import _light_grid

    from tpufem.solve.multigrid import _embed_grid_numpy

    info, coords_grid, bc_grid = _light_grid(domain, n_cells, dim)
    plan = structured_plan(info, embed=True)
    # embeds happen in numpy + one device_put: an eager device op at a novel
    # 10M+ shape costs a fresh remote compile (seconds-minutes on axon)
    bc_mask = jax.device_put(jnp.asarray(
        _embed_grid_numpy(bc_grid, plan.store_grid, fill=False)))
    block_lead = pick_block_lead(plan.store_grid, plan.width)
    C = jax.device_put(jnp.asarray(node_coords_embedded_from_grid(
        coords_grid, plan, np.dtype(dtype).type)))
    g_emb = None
    if g is not None:
        g_nodes = np.asarray(g(*[coords_grid[d] for d in range(dim)]),
                             np.dtype(dtype).type)
        g_emb = jax.device_put(jnp.asarray(_embed_grid_numpy(
            g_nodes.reshape(bc_grid.shape), plan.store_grid)))
    phases["host_setup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if dim == 3:
        rule = tetrahedron_rule(quadrature_degree)
    else:
        from tpufem.fem.quadrature import triangle_rule
        rule = triangle_rule(max(quadrature_degree, 2))

    # The blocked fused kernel handles any grid size; the CPU views build
    # below remains as an escape hatch (use_fused=False).
    if use_fused or interpret:
        from tpufem.solve.bc import apply_dirichlet_stencil
        from tpufem.sparse.stencil import StencilMatrix

        def build(C, g_emb):
            A, b = build_poisson_system_pallas(
                plan, C, bc_mask, f_planes, rule,
                apply_bc=g_emb is None, rhs_mode=rhs_mode,
                interpret=interpret)
            if g_emb is not None:
                A, b = apply_dirichlet_stencil(A, b, bc_mask, g_emb)
            return A.data, b

        build = _program(build, (C, g_emb), "fast_build")
        data, b = build(C, g_emb)
        b.block_until_ready()
        # release the coordinate planes (3 store-grid arrays — ~1 GB at
        # 56M DOFs): nothing downstream reads them, and at the largest
        # single-chip sizes they are the difference between fitting and
        # RESOURCE_EXHAUSTED during the solve
        C = None
        g_emb = None
    else:
        from tpufem.assemble.planar import (element_coord_views,
                                            element_load_views,
                                            p1_stiffness_views)
        from tpufem.assemble.structured import (
            assemble_stencil_structured_bt, assemble_vector_structured_bt)
        from tpufem.solve.bc import apply_dirichlet_stencil

        cpu = jax.devices("cpu")[0]
        default = jax.devices()[0]
        cell = "tetrahedron" if dim == 3 else "triangle"
        with jax.default_device(cpu):
            Xv = element_coord_views(
                coords_grid.astype(np.dtype(dtype).type), info)
            A = assemble_stencil_structured_bt(
                plan, p1_stiffness_views(Xv, cell))
            bcpu = assemble_vector_structured_bt(
                plan, element_load_views(Xv, cell, rule, f_planes))
            A, bcpu = apply_dirichlet_stencil(
                A, bcpu, jax.device_put(bc_mask, cpu),
                None if g_emb is None else jax.device_put(g_emb, cpu))
        data = jax.device_put(A.data, default)
        b = jax.device_put(bcpu, default)
    phases["assemble_wall"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mg_levels = None
    if use_multigrid:
        if precond == "const":
            mg_levels = build_poisson_multigrid(
                domain, n_cells, dim, dtype=dtype, levels=levels,
                operator="const")
        else:
            mg_levels = build_poisson_multigrid(
                domain, n_cells, dim, dtype=dtype, levels=levels,
                top=(data, bc_mask))
    phases["hierarchy"] = time.perf_counter() - t0

    # all arrays enter the jitted solve as ARGUMENTS (a closure would bake
    # them into the HLO as constants and overflow the remote compiler's
    # request-size limit at 10M+ DOFs); b is DONATED — nothing reads it
    # after the solve, and its buffer is exactly the margin between
    # fitting and HBM exhaustion at the 57M-DOF single-chip ceiling
    def solve(b, data, lv):
        if lv is not None:
            M = mg_preconditioner(lv, nu1=1, nu2=1,
                                  use_pallas=not interpret)
            M_dot = mg_preconditioner(lv, nu1=1, nu2=1,
                                      use_pallas=not interpret,
                                      with_dot=True)
        else:
            diag_k = plan.offsets.index(0)
            d = data[diag_k]
            inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
            M = lambda r: r * inv_d
            M_dot = None

        # reshape the operator to its [K, *store_grid] kernel layout ONCE,
        # outside the CG loop: a [K, NS] argument reshaped inside the loop
        # body costs a full relayout copy every iteration that XLA does not
        # hoist (measured 0.50 vs 0.23 ms/iter at n=96)
        dg = data.reshape((data.shape[0],) + tuple(plan.store_grid))

        def mvd(v):
            return stencil_matvec_dot_embedded(dg, v, plan,
                                               block_lead=block_lead,
                                               interpret=interpret)

        def mv(v):
            return stencil_matvec_embedded(dg, v, plan,
                                           block_lead=block_lead,
                                           interpret=interpret)

        return cg(mv, b, tol=tol, maxiter=maxiter, M=M,
                  check_every=check_every, matvec_dot=mvd, M_dot=M_dot)

    # b AND data are donated: nothing reads either after the solve, and the
    # solve's first op relayouts data into its 4D kernel layout — without
    # donation that copy would double the operator's HBM footprint (3.7 GB
    # at the 57M-DOF ceiling).  EXCEPT on the precond="general" path, where
    # mg_levels' finest level aliases the SAME device buffer as `data`
    # (build_poisson_multigrid stores top=(data, bc_mask) via a no-op
    # device_put): donating it there would let XLA reuse memory the
    # non-donated lv pytree still reads.
    donate = (0, 1) if (mg_levels is None or precond == "const") else (0,)
    t0 = time.perf_counter()
    solve = _program(solve, (b, data, mg_levels), "fast_solve",
                     donate_argnums=donate)
    res = solve(b, data, mg_levels)
    res.x.block_until_ready()
    phases["solve_wall"] = time.perf_counter() - t0

    u = plan.extract_field(res.x)
    phases = {k: round(v, 3) for k, v in phases.items()}
    if aot is not None:
        phases["aot_cache"] = aot.stats
    return FastSolution(u=u, cg=res,
                        num_dofs=int(np.prod(plan.info.node_grid)),
                        phases_s=phases)
