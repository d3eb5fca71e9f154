"""Linear elasticity driver: vector elements + BCSR + block-Jacobi PCG.

BASELINE.md config 4.  The weak form is the standard small-strain one,

    a(u, v) = ∫ sigma(u) : eps(v),   sigma = lam tr(eps) I + 2 mu eps,

stated through the same lambda frontend as Poisson; assembly lands in the
BCSR block format (one dense (dim x dim) block per node pair), whose SpMV
and block-Jacobi preconditioner are batched small matmuls on the MXU.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.fem.space import FunctionSpace, VectorFunctionSpace
from tpufem.forms.language import (Coefficient, Identity, dot, grad, inner,
                                   sym, tr)
from tpufem.forms.weakform import WeakForm
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.core import Mesh
from tpufem.solve.cg import CGResult, cg
from tpufem.solve.precond import block_jacobi
from tpufem.sparse.bcsr import BCSRMatrix, apply_dirichlet_bcsr

__all__ = ["ElasticitySolution", "elasticity_forms", "solve_elasticity"]


class ElasticitySolution(NamedTuple):
    u: jax.Array               # [num_dofs] displacement (node-major)
    cg: CGResult
    space: FunctionSpace
    A: BCSRMatrix
    # None default (not {}): NamedTuple defaults are shared across every
    # instance, so a mutable {} here would alias all externally-built
    # solutions' walls onto one dict
    walls: Optional[dict] = None   # phase walls (seconds), set by the driver


def elasticity_forms(V: FunctionSpace, lam: float, mu: float,
                     body_force: Optional[Callable] = None) -> WeakForm:
    """WeakForm for -div(sigma(u)) = f with Lamé parameters (lam, mu)."""
    d = V.mesh.dim

    def sigma(u):
        eps = sym(grad(u))
        return lam * tr(eps) * Identity(d) + 2.0 * mu * eps

    wf = WeakForm(V)
    rhs = None
    if body_force is not None:
        f = Coefficient(body_force, rank=1)
        rhs = lambda v: dot(f, v)
    wf.build(lambda u, v: inner(sigma(u), sym(grad(v))), rhs)
    return wf


def solve_elasticity(mesh: Mesh, *, lam: float = 1.0, mu: float = 1.0,
                     body_force: Optional[Callable] = None,
                     bc_values=None, dtype=jnp.float64,
                     tol: float = 1e-10, maxiter: int = 20_000,
                     matvec: str = "gather", block_rows: int = 1024,
                     precond: Optional[str] = None,
                     interpret: bool = False,
                     aot: bool = False) -> ElasticitySolution:
    """Assemble + solve the elasticity system with preconditioned CG.

    ``body_force``: callable x[..., dim] -> f[..., dim] (or None for f = 0).
    ``bc_values``:  Dirichlet displacement per DOF (or None for clamped 0).
    ``matvec="pallas"``: RCM-reorder the node pattern and run CG on the
    banded block Pallas SpMV (sparse.ell_pallas.bcsr_matvec_pallas — 28x
    the XLA gather at 1M DOFs on a v5e); solution returned in original
    DOF order.
    ``precond``: None/"jacobi" = block-Jacobi (iterations grow with the
    mesh); "amg" = rigid-body-mode block smoothed aggregation with
    banded-embedded transfers (solve.amg_block — mesh-robust iteration
    counts; round-5 hardware at 982k DOFs: 26 vs 2923 iterations).
    block-Jacobi stays the default for single-shot solves: its setup is
    the band plan alone, while the AMG hierarchy build is minutes-class
    at 1M DOFs (BENCH_NOTES r5 phases B2/C1) — choose "amg" when the
    operator is solved repeatedly or block-Jacobi stalls.

    The CG program receives the operator (banded-plan arrays / BCSR
    hierarchy) THROUGH the jit boundary as pytree arguments — closure
    capture bakes the arrays into the lowered HLO as literal constants
    (~100s of MB at 1M DOFs, minutes of lowering; BENCH_NOTES r4).
    ``aot=True`` routes the solve through the executable cache
    (utils.aot.CompiledCache).  Phase walls land in ``solution.walls``.
    """
    import time

    walls: dict = {}
    t0 = time.perf_counter()
    V = VectorFunctionSpace(mesh, degree=1)
    wf = elasticity_forms(V, lam, mu, body_force)
    wf.dtype = dtype

    pattern = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs,
                          pad_to=8 if mesh.dim == 2 else 16)
    walls["host_pattern"] = time.perf_counter() - t0

    # one jitted build program: element matrices -> BCSR scatter -> rhs ->
    # Dirichlet elimination.  Eager op-by-op dispatch of the same chain
    # measured 227-241 s at 980k elements over the device relay
    # (BENCH_NOTES r4b phase 6b/7b); the pattern/connectivity arrays cross
    # the jit boundary as ARGUMENTS so they don't bake into the HLO.
    t0 = time.perf_counter()
    ecoords = jnp.asarray(mesh.element_coords(), dtype)
    slots_d = jnp.asarray(pattern.slots.reshape(-1))
    cols_d = jnp.asarray(pattern.cols)
    diag_d = jnp.asarray(pattern.diag_pos)
    conn_d = jnp.asarray(V.dof_conn) if wf.rhs_expr is not None else None
    mask = jnp.asarray(V.dof_flags)
    bcv = (None if bc_values is None
           else jnp.broadcast_to(jnp.asarray(bc_values, dtype),
                                 (V.num_dofs,)))
    num_dofs, nbv = V.num_dofs, V.num_components

    def build_fn(ecoords, slots, cols, diag_pos, conn, mask, bcv, be):
        from tpufem.sparse.bcsr import assemble_bcsr_arrays
        Ke = wf.element_matrices(ecoords)
        A = assemble_bcsr_arrays(slots, cols, diag_pos, Ke, nbv)
        if conn is not None:
            from tpufem.assemble.dense import assemble_vector
            bev = wf.element_vectors(ecoords) if be is None else be
            b = assemble_vector(conn, bev, num_dofs)
        else:
            b = jnp.zeros(num_dofs, ecoords.dtype)
        A2, b2 = apply_dirichlet_bcsr(A, b, mask, bcv)
        return A2.data, b2

    def _compile_build(args):
        if aot:
            from tpufem.utils.aot import CompiledCache
            cache = CompiledCache()
            compiled = cache.get(build_fn, args, tag="elast_build")
            walls["aot_cache_build"] = cache.stats.get("elast_build")
            return compiled
        return jax.jit(build_fn).lower(*args).compile()

    build_args = (ecoords, slots_d, cols_d, diag_d, conn_d, mask, bcv, None)
    try:
        build_c = _compile_build(build_args)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError, TypeError):
        # body_force written against numpy (np.stack etc.) can't trace:
        # evaluate the rhs element vectors eagerly, pass them as an arg
        be_eager = wf.element_vectors(ecoords)
        build_args = (ecoords, slots_d, cols_d, diag_d, conn_d, mask, bcv,
                      be_eager)
        build_c = _compile_build(build_args)
    walls["assemble_compile"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    data2, b2 = build_c(*build_args)
    A2 = BCSRMatrix(data2, cols_d, diag_d)
    jax.block_until_ready(A2.data)
    walls["assemble"] = time.perf_counter() - t0

    def _timed_solve(solve_fn, args, tag):
        """Compile (AOT cache optional), then run; record both walls."""
        t0 = time.perf_counter()
        if aot:
            from tpufem.utils.aot import CompiledCache
            cache = CompiledCache()
            compiled = cache.get(solve_fn, args, tag=tag)
            walls["aot_cache"] = cache.stats.get(tag)
        else:
            compiled = jax.jit(solve_fn).lower(*args).compile()
        walls["solve_compile"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = compiled(*args)
        jax.block_until_ready(res.x)
        walls["solve"] = time.perf_counter() - t0
        return res

    if matvec == "pallas":
        import numpy as np

        from tpufem.mesh.adjacency import reverse_cuthill_mckee
        from tpufem.sparse.ell_pallas import (bcsr_band_plan,
                                              bcsr_matvec_pallas)

        t0 = time.perf_counter()
        nb = V.num_components
        cols_np = np.asarray(A2.cols)
        perm = reverse_cuthill_mckee(cols_np)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        data_p = np.asarray(A2.data)[perm]
        cols_p = inv[cols_np[perm]].astype(cols_np.dtype)
        plan, data_t = bcsr_band_plan(data_p, cols_p,
                                      block_rows=block_rows)
        d_dev = jnp.asarray(data_t)
        r_dev = jnp.asarray(plan.rel)
        # component-major permuted rhs / solution layout
        b_nm = np.asarray(b2).reshape(-1, nb)[perm]          # node-major
        b_cm = jnp.asarray(np.ascontiguousarray(b_nm.T))     # [b, NR]
        diagb = data_p[np.arange(len(perm)),
                       np.argmax(cols_p == np.arange(len(perm))[:, None],
                                 axis=1)]                    # [NR, b, b]
        inv_blocks = jnp.asarray(np.moveaxis(
            np.linalg.inv(diagb), 0, -1))                    # [b, b, NR]
        walls["band_plan"] = time.perf_counter() - t0

        if precond == "amg":
            # hierarchy over the RCM-permuted system (min-index-numbered
            # aggregates then keep every coarse block operator banded);
            # the cycle works in node-major layout, the banded CG in
            # component-major — two cheap relayouts per application
            from tpufem.solve.amg_block import build_block_amg
            t0 = time.perf_counter()
            pw = {}
            hier = build_block_amg(
                BCSRMatrix(jnp.asarray(data_p), jnp.asarray(cols_p)),
                coords=np.asarray(mesh.coords)[perm], walls_out=pw)
            walls["precond_setup"] = time.perf_counter() - t0
            walls["precond_setup_detail"] = {
                k: round(v, 2) for k, v in pw.items()}

            def solve_fn(b_cm, op):
                dd, rd, h = op

                def mv(x):
                    return bcsr_matvec_pallas(plan, dd, rd, x,
                                              interpret=interpret)

                def M(r_cm):
                    z = h.apply(r_cm.T.reshape(-1))
                    return z.reshape(-1, nb).T

                return cg(mv, b_cm, tol=tol, maxiter=maxiter, M=M)

            op = (d_dev, r_dev, hier)
        elif precond in (None, "jacobi"):
            def solve_fn(b_cm, op):
                dd, rd, invb = op

                def mv(x):
                    return bcsr_matvec_pallas(plan, dd, rd, x,
                                              interpret=interpret)

                def M(r):
                    return (invb * r[None]).sum(axis=1)

                return cg(mv, b_cm, tol=tol, maxiter=maxiter, M=M)

            op = (d_dev, r_dev, inv_blocks)
        else:
            raise ValueError(f"unknown precond {precond!r}")

        res = _timed_solve(solve_fn, (b_cm, op),
                           f"elast_{precond or 'jacobi'}_pallas")
        u_nm = np.asarray(res.x).T[inv].reshape(-1)          # original order
        return ElasticitySolution(u=jnp.asarray(u_nm), cg=res, space=V,
                                  A=A2, walls=walls)

    if precond == "amg":
        import numpy as np

        from tpufem.solve.amg_block import build_block_amg
        t0 = time.perf_counter()
        pw = {}
        hier = build_block_amg(A2, coords=np.asarray(mesh.coords),
                               walls_out=pw)
        walls["precond_setup"] = time.perf_counter() - t0
        walls["precond_setup_detail"] = {
            k: round(v, 2) for k, v in pw.items()}

        def solve_fn(b2, op):
            A_, h = op
            return cg(A_.matvec, b2, tol=tol, maxiter=maxiter, M=h.apply)

        op = (A2, hier)
    elif precond in (None, "jacobi"):
        def solve_fn(b2, A_):
            return cg(A_.matvec, b2, tol=tol, maxiter=maxiter,
                      M=block_jacobi(A_.diagonal_blocks()))

        op = A2
    else:
        raise ValueError(f"unknown precond {precond!r}")
    res = _timed_solve(solve_fn, (b2, op),
                       f"elast_{precond or 'jacobi'}_gather")
    return ElasticitySolution(u=res.x, cg=res, space=V, A=A2, walls=walls)
