"""Sparse formats: stencil / BCSR / matrix-free agree with dense assembly."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.assemble.dense import assemble_dense
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import p1_stiffness
from tpufem.assemble.stencil import assemble_stencil
from tpufem.fem.elements import P1Tetrahedron, P1Triangle
from tpufem.fem.space import VectorFunctionSpace
from tpufem.forms.language import Identity, grad, inner, sym, tr
from tpufem.forms.weakform import WeakForm
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import (apply_dirichlet_dense, apply_dirichlet_ell,
                             apply_dirichlet_stencil, constrained_operator,
                             constrain_rhs)
from tpufem.sparse.bcsr import (apply_dirichlet_bcsr, assemble_bcsr)
from tpufem.sparse.matfree import element_operator, poisson_operator
from tpufem.sparse.stencil import stencil_pattern


def test_stencil_pattern_structured_2d():
    mesh = rectangle_mesh(0, 1, 0, 1, 4, 6)
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    nc1 = 7
    assert list(pat.offsets) == [-nc1, -nc1 + 1, -1, 0, 1, nc1 - 1, nc1]
    assert pat.offsets[pat.diag_k] == 0


def test_stencil_pattern_structured_3d():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 2, 3, 4)
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    assert pat.width == 15  # Kuhn 15-point stencil


def test_stencil_matches_dense_2d():
    mesh = rectangle_mesh(-3, 3, -3, 3, 5, 7)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    for method in ("scatter", "sort"):
        A = assemble_stencil(pat, Ke, method=method)
        np.testing.assert_allclose(np.asarray(A.to_dense()), A_dense,
                                   rtol=1e-12, atol=1e-14)
    A = assemble_stencil(pat, Ke)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.num_nodes))
    np.testing.assert_allclose(np.asarray(A.matvec(x)), A_dense @ np.asarray(x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.diagonal()), np.diag(A_dense),
                               rtol=1e-12)


def test_stencil_matches_dense_3d():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 2, 2, 3)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Tetrahedron())
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A = assemble_stencil(pat, Ke)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(mesh.num_nodes))
    np.testing.assert_allclose(np.asarray(A.matvec(x)), A_dense @ np.asarray(x),
                               rtol=1e-11, atol=1e-12)


def test_stencil_rejects_unstructured():
    # Permuting node numbering destroys the fixed-offset property.
    mesh = rectangle_mesh(0, 1, 0, 1, 4, 4)
    rng = np.random.default_rng(2)
    perm = rng.permutation(mesh.num_nodes)
    conn = perm[mesh.conn]
    with pytest.raises(ValueError, match="not stencil-structured"):
        stencil_pattern(conn, mesh.num_nodes, max_offsets=16)


def test_stencil_bc_matches_dense_bc():
    mesh = rectangle_mesh(-3, 3, -3, 3, 6, 6)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    b = jnp.asarray(np.random.default_rng(3).standard_normal(mesh.num_nodes))
    mask = jnp.asarray(mesh.node_flags != 0)
    g = jnp.asarray(mesh.coords[:, 0])

    A_d = assemble_dense(mesh.conn, Ke, mesh.num_nodes)
    Ad2, bd2 = apply_dirichlet_dense(A_d, b, mask, g)

    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A_s = assemble_stencil(pat, Ke)
    As2, bs2 = apply_dirichlet_stencil(A_s, b, mask, g)
    np.testing.assert_allclose(np.asarray(As2.to_dense()), np.asarray(Ad2),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(bs2), np.asarray(bd2), rtol=1e-12)


def test_matfree_operators_match():
    mesh = box_mesh(-1, 1, -1, 1, -1, 1, 3, 3, 3)
    ec = jnp.asarray(mesh.element_coords())
    el = P1Tetrahedron()
    Ke = p1_stiffness(ec, el)
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    x = jnp.asarray(np.random.default_rng(4).standard_normal(mesh.num_nodes))
    y_ref = A_dense @ np.asarray(x)

    mv1 = element_operator(mesh.conn, Ke, mesh.num_nodes)
    np.testing.assert_allclose(np.asarray(mv1(x)), y_ref, rtol=1e-11,
                               atol=1e-12)
    mv2 = poisson_operator(ec, mesh.conn, mesh.num_nodes, el)
    np.testing.assert_allclose(np.asarray(mv2(x)), y_ref, rtol=1e-11,
                               atol=1e-12)
    mv3 = poisson_operator(ec, mesh.conn, mesh.num_nodes, el,
                           on_the_fly=True)
    np.testing.assert_allclose(np.asarray(mv3(x)), y_ref, rtol=1e-11,
                               atol=1e-12)


def test_matfree_constrained_solve():
    """Matrix-free CG with BC wrapper == assembled ELL solve."""
    from tpufem.solve.cg import cg
    from tpufem.solve.poisson import solve_poisson_ell

    mesh = rectangle_mesh(-3, 3, -3, 3, 10, 10)
    ec = jnp.asarray(mesh.element_coords())
    el = P1Triangle()
    mv = poisson_operator(ec, mesh.conn, mesh.num_nodes, el)
    mask = jnp.asarray(mesh.node_flags != 0)

    from tpufem.assemble.local import element_load
    from tpufem.assemble.dense import assemble_vector
    from tpufem.fem.quadrature import triangle_rule
    from tpufem.solve.poisson import model_problem_2d
    f, _ = model_problem_2d()
    be = element_load(ec, el, triangle_rule(5), f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    b2, _ = constrain_rhs(mv, b, mask)
    res = cg(constrained_operator(mv, mask), b2, tol=1e-12, maxiter=2000)
    assert bool(res.converged)
    ref = solve_poisson_ell(mesh, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.u),
                               rtol=1e-8, atol=1e-9)


def _elasticity_system(mesh, lam=1.0, mu=1.0):
    V = VectorFunctionSpace(mesh, degree=1)

    def sigma(u):
        eps = sym(grad(u))
        return lam * tr(eps) * Identity(mesh.dim) + 2 * mu * eps

    wf = WeakForm(V).build(lambda u, v: inner(sigma(u), sym(grad(v))))
    Ke = wf.element_matrices(jnp.asarray(mesh.element_coords()))
    return V, Ke


def test_bcsr_matches_dense():
    mesh = rectangle_mesh(0, 1, 0, 1, 3, 4)
    V, Ke = _elasticity_system(mesh)
    A_dense = np.asarray(assemble_dense(V.dof_conn, Ke, V.num_dofs))
    pat = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs, pad_to=8)
    A = assemble_bcsr(pat, Ke, block_size=2)
    np.testing.assert_allclose(np.asarray(A.to_dense()), A_dense,
                               rtol=1e-12, atol=1e-13)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(V.num_dofs))
    np.testing.assert_allclose(np.asarray(A.matvec(x)),
                               A_dense @ np.asarray(x), rtol=1e-11,
                               atol=1e-12)


def test_bcsr_bc_matches_dense_bc():
    mesh = rectangle_mesh(0, 1, 0, 1, 3, 3)
    V, Ke = _elasticity_system(mesh, lam=2.0, mu=0.5)
    b = jnp.asarray(np.random.default_rng(6).standard_normal(V.num_dofs))
    mask = jnp.asarray(V.dof_flags)
    g = jnp.asarray(np.random.default_rng(7).standard_normal(V.num_dofs))

    A_dense = assemble_dense(V.dof_conn, Ke, V.num_dofs)
    Ad2, bd2 = apply_dirichlet_dense(A_dense, b, mask, g)

    pat = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs)
    A = assemble_bcsr(pat, Ke, block_size=2)
    Ab2, bb2 = apply_dirichlet_bcsr(A, b, mask, g)
    np.testing.assert_allclose(np.asarray(Ab2.to_dense()), np.asarray(Ad2),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(bb2), np.asarray(bd2), rtol=1e-11)


def test_block_jacobi_elasticity_solve():
    """Full elasticity pipeline: BCSR + block-Jacobi PCG vs dense solve."""
    from tpufem.solve.cg import cg
    from tpufem.solve.precond import block_jacobi

    mesh = rectangle_mesh(0, 1, 0, 1, 6, 6)
    V, Ke = _elasticity_system(mesh, lam=1.5, mu=0.7)
    rng = np.random.default_rng(8)
    b = jnp.asarray(rng.standard_normal(V.num_dofs))
    mask = jnp.asarray(V.dof_flags)

    pat = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs)
    A = assemble_bcsr(pat, Ke, block_size=2)
    A2, b2 = apply_dirichlet_bcsr(A, b, mask)
    M = block_jacobi(A2.diagonal_blocks())
    res = cg(A2.matvec, b2, tol=1e-12, maxiter=4000, M=M)
    assert bool(res.converged)

    Ad = assemble_dense(V.dof_conn, Ke, V.num_dofs)
    Ad2, bd2 = apply_dirichlet_dense(Ad, b, mask)
    x_ref = np.linalg.solve(np.asarray(Ad2), np.asarray(bd2))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7,
                               atol=1e-9)
