"""Genuinely unstructured meshes (BASELINE config 2): random node numbering
and jittered geometry — no stencil structure — through the index-based
pipeline (ELL pattern + sorted-COO/segment-sum assembly + ELL SpMV + PCG)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.assemble.coo import assemble_coo
from tpufem.assemble.dense import assemble_dense, assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.precond import jacobi
from tpufem.sparse.stencil import stencil_pattern
from tpufem.utils.debug import check_assembly_agreement, validate_ell_pattern


def unstructured_mesh(n=16, seed=0, jitter=0.25):
    from tpufem.mesh.rectangle import perturbed_rectangle_mesh

    return perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=jitter,
                                    seed=seed)


def test_mesh_is_actually_unstructured():
    mesh = unstructured_mesh()
    with pytest.raises(ValueError, match="not stencil-structured"):
        stencil_pattern(mesh.conn, mesh.num_nodes, max_offsets=64)


def test_unstructured_assembly_agreement():
    mesh = unstructured_mesh()
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    assert validate_ell_pattern(pat, mesh.conn, mesh.num_nodes)
    assert check_assembly_agreement(pat, Ke)

    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    A_ell = assemble_ell(pat, Ke)
    np.testing.assert_allclose(np.asarray(A_ell.to_dense()), A_dense,
                               rtol=1e-12, atol=1e-13)
    vals = np.asarray(assemble_coo(mesh.conn, Ke, pat.unique_keys,
                                   mesh.num_nodes))
    rows = pat.unique_keys // mesh.num_nodes
    cols = pat.unique_keys % mesh.num_nodes
    A_coo = np.zeros_like(A_dense)
    A_coo[rows, cols] = vals
    np.testing.assert_allclose(A_coo, A_dense, rtol=1e-12, atol=1e-13)


def test_unstructured_solve_matches_structured_physics():
    """Jittered mesh solves the model problem: right answer, O(h²) accuracy
    (the solution is mesh-independent up to discretization error)."""
    f, exact = model_problem_2d()
    mesh = unstructured_mesh(n=24, jitter=0.2)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    A = assemble_ell(pat, Ke)
    be = element_load(ec, P1Triangle(), triangle_rule(5), f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
    res = cg(A.matvec, b, tol=1e-11, maxiter=4000, M=jacobi(A))
    assert bool(res.converged)
    ue = exact(mesh.coords)
    err = np.sqrt(np.mean((np.asarray(res.x) - ue) ** 2))
    rel = err / np.sqrt(np.mean(ue ** 2))
    assert rel < 0.01, f"rel err {rel}"


def test_unstructured_100k_dofs():
    """BASELINE config 2 scale: ~100k-DOF unstructured solve end-to-end."""
    f, exact = model_problem_2d()
    mesh = unstructured_mesh(n=316, jitter=0.15)   # 100,489 nodes
    assert mesh.num_nodes > 100_000
    ec = jnp.asarray(mesh.element_coords(), jnp.float64)
    Ke = p1_stiffness(ec, P1Triangle())
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    A = assemble_ell(pat, Ke, method="sort")
    be = element_load(ec, P1Triangle(), triangle_rule(5), f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
    res = cg(A.matvec, b, tol=1e-8, maxiter=3000, M=jacobi(A))
    assert bool(res.converged)
    ue = exact(mesh.coords)
    rel = (np.sqrt(np.mean((np.asarray(res.x) - ue) ** 2))
           / np.sqrt(np.mean(ue ** 2)))
    assert rel < 1e-3, f"rel err {rel}"


def test_solve_poisson_ell_amg_one_call():
    """The one-call API: unstructured mesh -> RCM -> banded-SpMV CG with
    the default AMG preconditioner (solve.poisson precond="amg" =
    strength-filtered greedy SA V-cycle, the round-4 measured config)."""
    from tpufem.solve.poisson import solve_poisson_ell

    f, exact = model_problem_2d()
    mesh = unstructured_mesh(n=48, jitter=0.2)
    sol = solve_poisson_ell(mesh, f, tol=1e-9, maxiter=60,
                            precond="amg", matvec="pallas", interpret=True)
    assert bool(sol.cg.converged)
    assert int(sol.cg.iterations) <= 40       # mesh-robust cycle, not Jacobi
    ue = exact(mesh.coords)
    rel = (np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
           / np.sqrt(np.mean(ue ** 2)))
    assert rel < 0.005, f"rel err {rel}"


def test_solve_poisson_ell_chebyshev_gather_path():
    from tpufem.solve.poisson import solve_poisson_ell

    f, exact = model_problem_2d()
    mesh = unstructured_mesh(n=24, jitter=0.2)
    sol = solve_poisson_ell(mesh, f, tol=1e-9, maxiter=500,
                            precond="chebyshev")
    assert bool(sol.cg.converged)
    ue = exact(mesh.coords)
    rel = (np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
           / np.sqrt(np.mean(ue ** 2)))
    assert rel < 0.01, f"rel err {rel}"
