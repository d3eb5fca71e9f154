"""Isoparametric Q1 quadrilateral / hexahedral elements.

An element family beyond the reference (P1 triangles only,
/root/reference/fea_test.cu): the multilinear coordinate map's Jacobian
varies within each cell, so assembly evaluates geometry per quadrature
point (forms.weakform._geometry, non-affine branch).  Tests:

* golden single-element stiffness/mass matrices (quad: classic closed
  forms; hex: an independent tensor-product construction),
* patch tests on jitter-distorted meshes — isoparametric Q1 must
  reproduce linear fields EXACTLY, the standard consistency check for
  non-affine geometry,
* manufactured-solution convergence at O(h^2) through the one-call
  ELL driver,
* quad boundary facets: an exact Neumann-flux solve.
"""
import numpy as np
import jax.numpy as jnp

from tpufem.fem.elements import Q1Hex, Q1Quad, element_for_cell
from tpufem.fem.quadrature import hexahedron_rule, quad_rule
from tpufem.fem.space import FunctionSpace
from tpufem.forms.language import Coefficient, dot, grad
from tpufem.forms.weakform import WeakForm, integrate
from tpufem.mesh.box import box_hex_mesh
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_quad_mesh, rectangle_quad_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import (model_problem_2d, model_problem_3d,
                                  solve_poisson_dense, solve_poisson_ell)

# -- reference elements -------------------------------------------------------


def test_q1_quad_shape_functions():
    el = Q1Quad()
    corners = el._CORNERS.astype(np.float64)
    vals = el.shape_values(corners)
    np.testing.assert_allclose(vals, np.eye(4), atol=1e-14)
    pts = np.random.default_rng(0).uniform(0, 1, (11, 2))
    np.testing.assert_allclose(el.shape_values(pts).sum(1), 1.0, atol=1e-14)
    np.testing.assert_allclose(el.shape_grads(pts).sum(1), 0.0, atol=1e-14)


def test_q1_hex_shape_functions():
    el = Q1Hex()
    corners = el._CORNERS.astype(np.float64)
    np.testing.assert_allclose(el.shape_values(corners), np.eye(8),
                               atol=1e-14)
    pts = np.random.default_rng(1).uniform(0, 1, (13, 3))
    np.testing.assert_allclose(el.shape_values(pts).sum(1), 1.0, atol=1e-14)
    np.testing.assert_allclose(el.shape_grads(pts).sum(1), 0.0, atol=1e-14)
    # finite-difference check of the gradients
    eps = 1e-6
    for m in range(3):
        dp = np.zeros(3)
        dp[m] = eps
        fd = (el.shape_values(pts + dp) - el.shape_values(pts - dp)) / (2 * eps)
        np.testing.assert_allclose(el.shape_grads(pts)[..., m], fd, atol=1e-8)


def test_quad_rule_exactness():
    r = quad_rule(3)
    assert r.num_points == 4
    np.testing.assert_allclose(r.weights.sum(), 1.0, atol=1e-14)
    # exact per-axis up to degree 3: integral of r^3 s^2 = 1/4 * 1/3
    val = (r.weights * r.points[:, 0] ** 3 * r.points[:, 1] ** 2).sum()
    np.testing.assert_allclose(val, 1.0 / 12.0, atol=1e-14)


def test_hexahedron_rule_exactness():
    r = hexahedron_rule(3)
    assert r.num_points == 8
    np.testing.assert_allclose(r.weights.sum(), 1.0, atol=1e-14)
    val = (r.weights * r.points[:, 0] ** 3 * r.points[:, 1]
           * r.points[:, 2] ** 2).sum()
    np.testing.assert_allclose(val, (1 / 4) * (1 / 2) * (1 / 3), atol=1e-14)


# -- golden single-element matrices ------------------------------------------


def _single_quad_wf(coords):
    mesh = Mesh(coords=np.asarray(coords, np.float64),
                conn=np.array([[0, 1, 2, 3]], np.int32),
                node_flags=np.ones(4, np.int32), cell_type="quad")
    V = FunctionSpace(mesh, degree=1)
    return mesh, V


def test_q1_quad_unit_stiffness_golden():
    """Unit square Q1 Laplace stiffness: diag 2/3, adjacent -1/6,
    opposite -1/3 (classic closed form, CCW node order)."""
    mesh, V = _single_quad_wf([[0, 0], [1, 0], [1, 1], [0, 1]])
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    Ke = np.asarray(wf.element_matrices(jnp.asarray(mesh.element_coords())))
    golden = (1 / 6) * np.array([
        [4, -1, -2, -1], [-1, 4, -1, -2], [-2, -1, 4, -1], [-1, -2, -1, 4]],
        np.float64)
    np.testing.assert_allclose(Ke[0], golden, atol=1e-13)


def test_q1_quad_unit_mass_golden():
    mesh, V = _single_quad_wf([[0, 0], [1, 0], [1, 1], [0, 1]])
    wf = WeakForm(V).build(lambda u, v: u * v)
    Me = np.asarray(wf.element_matrices(jnp.asarray(mesh.element_coords())))
    golden = (1 / 36) * np.array([
        [4, 2, 1, 2], [2, 4, 2, 1], [1, 2, 4, 2], [2, 1, 2, 4]], np.float64)
    np.testing.assert_allclose(Me[0], golden, atol=1e-13)


def test_q1_hex_stiffness_tensor_golden():
    """Unit cube Q1 stiffness vs an INDEPENDENT tensor-product
    construction: K = Mz(x)My(x)Kx + Mz(x)Ky(x)Mx + Kz(x)My(x)Mx with the
    1-D hat stiffness/mass on [0, 1], permuted from lexicographic to the
    VTK node order."""
    K1 = np.array([[1.0, -1.0], [-1.0, 1.0]])
    M1 = np.array([[1 / 3, 1 / 6], [1 / 6, 1 / 3]])
    K_lex = (np.kron(M1, np.kron(M1, K1))
             + np.kron(M1, np.kron(K1, M1))
             + np.kron(K1, np.kron(M1, M1)))
    # lex index = a_z*4 + a_y*2 + a_x; VTK order -> lex indices:
    perm = [0, 1, 3, 2, 4, 5, 7, 6]
    golden = K_lex[np.ix_(perm, perm)]

    mesh = box_hex_mesh(0, 1, 0, 1, 0, 1, 1, 1, 1)
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    Ke = np.asarray(wf.element_matrices(jnp.asarray(mesh.element_coords())))
    np.testing.assert_allclose(Ke[0], golden, atol=1e-13)


# -- isoparametric patch tests ------------------------------------------------


def test_quad_patch_test():
    """Distorted quads: Laplace with Dirichlet data from a linear field
    must reproduce it exactly — isoparametric Q1 contains linears on ANY
    (convex) quad mesh because the coordinate map itself is in the span."""
    mesh = perturbed_quad_mesh(0, 2, 0, 1, 5, 7, jitter=0.25, seed=3)
    lin = lambda c: 0.75 + 1.5 * c[..., 0] - 2.25 * c[..., 1]
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    A, _ = wf.assemble(format="ell")
    b = jnp.zeros(V.num_dofs, jnp.float64)
    mask = jnp.asarray(V.dof_flags)
    g = jnp.asarray(lin(mesh.coords))
    A, b = apply_dirichlet_ell(A, b, mask, bc_values=g)
    res = cg(A.matvec, b, tol=1e-13, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g), atol=1e-9)


def test_hex_patch_test():
    base = box_hex_mesh(0, 1, 0, 1, 0, 1, 3, 3, 3)
    rng = np.random.default_rng(7)
    coords = base.coords.copy()
    interior = base.node_flags == 0
    coords[interior] += rng.uniform(-0.08, 0.08, (int(interior.sum()), 3))
    mesh = Mesh(coords=coords, conn=base.conn, node_flags=base.node_flags,
                cell_type="hexahedron")
    lin = lambda c: 1.0 - 2.0 * c[..., 0] + 3.0 * c[..., 1] + 0.5 * c[..., 2]
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    A, _ = wf.assemble(format="ell")
    b = jnp.zeros(V.num_dofs, jnp.float64)
    g = jnp.asarray(lin(mesh.coords))
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags), bc_values=g)
    res = cg(A.matvec, b, tol=1e-13, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g), atol=1e-9)


def test_quad_integrate_area_distorted():
    """Sum of per-qp |det J| integrates the EXACT area of the distorted
    mesh (the quads tile the rectangle, so total area is invariant under
    interior jitter)."""
    mesh = perturbed_quad_mesh(-3, 3, -3, 3, 6, 6, jitter=0.3, seed=11)
    V = FunctionSpace(mesh, degree=1)
    one = Coefficient(lambda x: jnp.ones(x.shape[:-1], x.dtype))
    area = float(integrate(V, one))
    np.testing.assert_allclose(area, 36.0, rtol=1e-12)


# -- solves -------------------------------------------------------------------


def test_quad_poisson_matches_dense_and_exact():
    f, exact = model_problem_2d()
    mesh = rectangle_quad_mesh(-3, 3, -3, 3, 12, 12)
    d = solve_poisson_dense(mesh, f, tol=1e-12)
    e = solve_poisson_ell(mesh, f, tol=1e-12)
    assert bool(d.cg.converged) and bool(e.cg.converged)
    np.testing.assert_allclose(np.asarray(e.u), np.asarray(d.u),
                               rtol=1e-8, atol=1e-9)
    err = np.sqrt(np.mean((np.asarray(e.u) - exact(mesh.coords)) ** 2))
    assert err < 0.3  # coarse-mesh discretization error only (12x12)


def test_quad_poisson_convergence_order():
    f, exact = model_problem_2d()
    errs = []
    for n in (8, 16, 32):
        mesh = rectangle_quad_mesh(-3, 3, -3, 3, n, n)
        sol = solve_poisson_ell(mesh, f, tol=1e-12)
        assert bool(sol.cg.converged)
        errs.append(np.sqrt(np.mean(
            (np.asarray(sol.u) - exact(mesh.coords)) ** 2)))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate1 > 1.7, f"rates {rate1:.2f}, {rate2:.2f}, errors {errs}"
    assert rate2 > 1.8, f"rates {rate1:.2f}, {rate2:.2f}, errors {errs}"


def test_quad_poisson_distorted_mesh():
    """The isoparametric path on genuinely non-parallelogram cells."""
    f, exact = model_problem_2d()
    mesh = perturbed_quad_mesh(-3, 3, -3, 3, 24, 24, jitter=0.25, seed=5)
    sol = solve_poisson_ell(mesh, f, tol=1e-12)
    assert bool(sol.cg.converged)
    err = np.sqrt(np.mean((np.asarray(sol.u) - exact(mesh.coords)) ** 2))
    assert err < 0.08


def test_hex_poisson_solves():
    f, exact = model_problem_3d()
    mesh = box_hex_mesh(-3, 3, -3, 3, -3, 3, 6, 6, 6)
    sol = solve_poisson_ell(mesh, f, tol=1e-10)
    assert bool(sol.cg.converged)
    err = np.sqrt(np.mean((np.asarray(sol.u) - exact(mesh.coords)) ** 2))
    ref = np.sqrt(np.mean(exact(mesh.coords) ** 2))
    assert err / ref < 0.05, (err, ref)


def test_hex_poisson_convergence_order():
    f, exact = model_problem_3d()
    errs = []
    for n in (4, 8):
        mesh = box_hex_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
        sol = solve_poisson_ell(mesh, f, tol=1e-11)
        assert bool(sol.cg.converged)
        errs.append(np.sqrt(np.mean(
            (np.asarray(sol.u) - exact(mesh.coords)) ** 2)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.6, f"rate {rate:.2f}, errors {errs}"


# -- quad boundary facets ------------------------------------------------------


def test_quad_neumann_exact_flux():
    """-Δu = 0 with u = x on [0,1]^2: u = 0 on x=0 (Dirichlet),
    du/dn = 1 on x=1 (Neumann via build_boundary), natural zero-flux on
    y = 0, 1.  The solve must reproduce u = x exactly — boundary facet
    extraction, outward orientation and the segment quadrature on quad
    meshes all have to be right at once."""
    mesh = perturbed_quad_mesh(0, 1, 0, 1, 6, 6, jitter=0.2, seed=2,
                               renumber=False)
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    wf.build_boundary(rhs=lambda v: 1.0 * v,
                      where=lambda c: c[:, 0] > 1.0 - 1e-9)
    A, b = wf.assemble(format="ell")
    mask = jnp.asarray(mesh.coords[:, 0] < 1e-12)
    A, b = apply_dirichlet_ell(A, b, mask)
    res = cg(A.matvec, b, tol=1e-13, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), mesh.coords[:, 0],
                               atol=1e-9)
