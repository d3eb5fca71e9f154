"""High-level Poisson drivers — the framework's flagship problem.

The reference's implied model problem (SURVEY.md §0):
    -Δu = 36 - 2(x² + y²)   on (-3, 3)²,   u = 0 on the boundary,
with manufactured solution u = (9 - x²)(9 - y²)
(/root/reference/fea_symbolic.cu:494-498).  The 3D extension used for the
1M-DOF benchmark (BASELINE.md config 3) is the analogous separable problem on
(-3, 3)³.

These drivers run the full pipeline the reference never finished: element
stiffness -> global assembly (dense or ELL) -> Dirichlet BC -> (P)CG solve.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.dense import assemble_dense, assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.quadrature import rule_for_cell
from tpufem.fem.space import FunctionSpace
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.core import Mesh
from tpufem.solve.bc import apply_dirichlet_dense, apply_dirichlet_ell
from tpufem.solve.cg import CGResult, cg
from tpufem.solve.precond import jacobi

__all__ = [
    "model_problem_2d", "model_problem_3d", "PoissonSolution",
    "solve_poisson_dense", "solve_poisson_ell",
]


class PoissonSolution(NamedTuple):
    u: jax.Array
    cg: CGResult
    num_dofs: int


# -- the reference model problem --------------------------------------------

def model_problem_2d():
    """(f, exact) for -Δu = f on (-3,3)², u = 0 on the boundary."""

    def f(x):
        return 36.0 - 2.0 * (x[..., 0] ** 2 + x[..., 1] ** 2)

    def exact(x):
        return (9.0 - x[..., 0] ** 2) * (9.0 - x[..., 1] ** 2)

    return f, exact


def model_problem_3d():
    """Separable 3D analogue on (-3,3)³: u = Π(9 - x_d²)."""

    def exact(x):
        return ((9.0 - x[..., 0] ** 2) * (9.0 - x[..., 1] ** 2)
                * (9.0 - x[..., 2] ** 2))

    def f(x):
        x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
        return 2.0 * ((9.0 - x1 ** 2) * (9.0 - x2 ** 2)
                      + (9.0 - x0 ** 2) * (9.0 - x2 ** 2)
                      + (9.0 - x0 ** 2) * (9.0 - x1 ** 2))

    return f, exact


def model_problem_2d_planes():
    """Batch-trailing form of the 2D RHS (separate coordinate planes)."""

    def f(x, y):
        return 36.0 - 2.0 * (x * x + y * y)

    return f


def model_problem_3d_planes():
    def f(x, y, z):
        return 2.0 * ((9.0 - y * y) * (9.0 - z * z)
                      + (9.0 - x * x) * (9.0 - z * z)
                      + (9.0 - x * x) * (9.0 - y * y))

    return f


# -- drivers -----------------------------------------------------------------

def _poisson_local(space: FunctionSpace, ecoords, f: Callable, rule, dtype):
    """(Ke [NE,n,n], be [NE,n]) of the Poisson form on any cell type.

    Affine simplices take the closed-form P1 kernel; tensor-product cells
    (quad/hex) route through the isoparametric WeakForm kernels, whose
    geometry is evaluated per quadrature point (forms.weakform._geometry).
    """
    from tpufem.fem.elements import is_affine_cell

    if is_affine_cell(space.mesh.cell_type):
        Ke = p1_stiffness(ecoords, space.element)
        be = element_load(ecoords, space.element, rule, f)
        return Ke, be
    from tpufem.forms.language import Coefficient, dot, grad
    from tpufem.forms.weakform import WeakForm

    wf = WeakForm(space, quadrature=rule, dtype=dtype).build(
        lambda u, v: dot(grad(u), grad(v)),
        lambda v: Coefficient(f) * v)
    return wf.element_matrices(ecoords), wf.element_vectors(ecoords)


def _rhs_and_bc(space: FunctionSpace, be):
    b = assemble_vector(space.dof_conn, be, space.num_dofs)
    bc_mask = jnp.asarray(space.dof_flags)
    return b, bc_mask


def solve_poisson_dense(mesh: Mesh, f: Optional[Callable] = None, *,
                        dtype=jnp.float64, tol: float = 1e-10,
                        maxiter: int = 10_000) -> PoissonSolution:
    """Dense-path solve (small meshes / golden tests; BASELINE config 1)."""
    if f is None:
        f = model_problem_2d()[0] if mesh.dim == 2 else model_problem_3d()[0]
    space = FunctionSpace(mesh, degree=1)
    rule = rule_for_cell(mesh.cell_type, 5 if mesh.dim == 2 else 3)
    ecoords = jnp.asarray(mesh.element_coords(), dtype)

    Ke, be = _poisson_local(space, ecoords, f, rule, dtype)
    A = assemble_dense(space.dof_conn, Ke, space.num_dofs)
    b, bc_mask = _rhs_and_bc(space, be)
    A, b = apply_dirichlet_dense(A, b, bc_mask)
    res = cg(lambda x: A @ x, b, tol=tol, maxiter=maxiter)
    return PoissonSolution(u=res.x, cg=res, num_dofs=space.num_dofs)


def solve_poisson_ell(mesh: Mesh, f: Optional[Callable] = None, *,
                      dtype=jnp.float64, tol: float = 1e-8,
                      maxiter: int = 10_000, precondition: bool = True,
                      precond: Optional[str] = None,
                      assembly_method: str = "scatter",
                      pad_to: Optional[int] = None,
                      matvec: str = "gather",
                      block_rows: Optional[int] = None,
                      interpret: bool = False) -> PoissonSolution:
    """ELL-path solve: the scalable single-chip pipeline (configs 2-3).

    matvec="pallas" RCM-reorders the system (mesh.adjacency.
    reverse_cuthill_mckee) and runs CG on the banded Pallas SpMV
    (sparse.ell_pallas) — measured ~500x the XLA gather matvec at 1M rows
    on a v5e; the solution is returned in original node order.

    ``precond``: "jacobi" | "chebyshev" (degree-14 polynomial Jacobi,
    Gershgorin lmax) | "amg" (strength-filtered greedy SA V-cycle with
    banded-embedded transfers, solve.amg — mesh-robust iteration
    counts).  Defaults to the legacy ``precondition`` bool (Jacobi).
    For solve time at ~1M rows on a v5e, "amg" is the measured winner
    (round-5 hardware A/B, BENCH_NOTES.md): 221 ms / 26 iterations vs
    "chebyshev" 549 ms / 244 — the round-4 verdict inverted once every
    hierarchy level's SpMV actually rode the banded kernel (VMEM-limit
    fix).  "chebyshev" still wins single-shot end-to-end (its setup is
    ~0 s vs AMG's ~55 s hierarchy build at 1M rows) and remains the
    right choice when the operator is solved once.  "amg" implies the RCM-reordered
    path (its interval aggregation requires band ordering), regardless
    of ``matvec``.  With "amg"/"chebyshev" the pallas path iterates on
    an ELLMatrix whose banded plan is primed explicitly (honoring
    ``block_rows``, covering any bandwidth), so every SpMV in both CG
    and the AMG cycle rides the banded kernel; ``interpret`` is then
    implied by running on a non-TPU backend rather than the flag.  On
    non-TPU backends the banded kernel is interpreted (a correctness
    path, ~30x slower than the gather there) — set
    ``TPUFEM_BAND_DISPATCH=0`` to run the same solve on the gather
    matvec throughout (see tpufem.sparse.ell).
    """
    if f is None:
        f = model_problem_2d()[0] if mesh.dim == 2 else model_problem_3d()[0]
    space = FunctionSpace(mesh, degree=1)
    rule = rule_for_cell(mesh.cell_type, 5 if mesh.dim == 2 else 3)
    ecoords = jnp.asarray(mesh.element_coords(), dtype)
    if pad_to is None:
        pad_to = 8 if mesh.dim == 2 else 16
    pattern = ell_pattern(space.dof_conn, space.num_dofs, pad_to=pad_to,
                          with_sort_plan=(assembly_method == "sort"))

    Ke, be = _poisson_local(space, ecoords, f, rule, dtype)
    A = assemble_ell(pattern, Ke, method=assembly_method)
    b, bc_mask = _rhs_and_bc(space, be)
    A, b = apply_dirichlet_ell(A, b, bc_mask)

    if precond is not None and precond not in ("jacobi", "chebyshev", "amg"):
        raise ValueError(f"unknown precond {precond!r}")
    if precond == "amg":
        # interval aggregation's stride-s windows are only meaningful on a
        # band-ordered system — route through the RCM-reordered path
        matvec = "pallas"

    def _build_M(Ap):
        if precond == "amg":
            # Measured default (round-5 hardware A/B, BENCH_NOTES): greedy
            # strength-filtered SA with banded-embedded transfers — converges
            # mesh-independently (26 iters / 221 ms solve at 1M rows, 2.5x
            # Chebyshev).  interval V/W also runs clean at 1M since the
            # round-5 VMEM-limit fix but is slower there (1.31 s / 12.3 s);
            # it remains opt-in via build_amg directly.
            from tpufem.solve.amg import build_amg
            return build_amg(Ap, aggregation="greedy", strength=0.08,
                             cycle="V").apply
        if precond == "chebyshev":
            from tpufem.solve.precond import chebyshev, lambda_max_bound
            return chebyshev(Ap.matvec, Ap.diagonal(), degree=14,
                             lmax=lambda_max_bound(Ap))
        if precond == "jacobi" or precondition:
            return jacobi(Ap)
        return None

    if matvec == "pallas":
        import numpy as np

        from tpufem.mesh.adjacency import reverse_cuthill_mckee
        from tpufem.sparse.ell import ELLMatrix, reorder_ell
        from tpufem.sparse.ell_pallas import ell_band_plan, ell_matvec_pallas

        cols_np = np.asarray(A.cols)
        perm = reverse_cuthill_mckee(cols_np)
        data_p, cols_p = reorder_ell(np.asarray(A.data), cols_np, perm)
        b_p = jnp.asarray(np.asarray(b)[perm])
        if precond is not None:
            # prime the banded plan explicitly: covers ANY bandwidth and
            # honors block_rows (the automatic dispatch declines past
            # _AUTO_BAND_MAX and would silently fall back to the ~500x
            # slower gather); the AMG / Chebyshev machinery consumes the
            # same matrix object.  TPUFEM_BAND_DISPATCH=0 skips priming,
            # so the whole solve (CG + cycle) rides the gather instead.
            import os
            A_p = ELLMatrix(jnp.asarray(data_p), jnp.asarray(cols_p))
            if os.environ.get("TPUFEM_BAND_DISPATCH", "1") != "0":
                A_p.prime_band_plan(block_rows)
            mv = A_p.matvec
            M = _build_M(A_p)
        else:
            plan = ell_band_plan(data_p, cols_p, block_rows=block_rows)
            d_t = jnp.asarray(plan.data_t)
            r_t = jnp.asarray(plan.rel)
            if precondition:
                diag = np.take_along_axis(
                    data_p, np.argmax(cols_p == np.arange(
                        len(perm))[:, None], axis=1)[:, None], axis=1)[:, 0]
                inv_d = jnp.asarray(
                    np.where(diag != 0, 1.0 / diag, 1.0), b_p.dtype)
                M = lambda r: r * inv_d
            else:
                M = None
            mv = lambda v: ell_matvec_pallas(plan, d_t, r_t, v,
                                             interpret=interpret)
        res = cg(mv, b_p, tol=tol, maxiter=maxiter, M=M)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        u = res.x[jnp.asarray(inv)]
        return PoissonSolution(u=u, cg=res, num_dofs=space.num_dofs)

    M = _build_M(A)
    res = cg(A.matvec, b, tol=tol, maxiter=maxiter, M=M)
    return PoissonSolution(u=res.x, cg=res, num_dofs=space.num_dofs)
