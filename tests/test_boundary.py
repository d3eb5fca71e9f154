"""Boundary (facet) integrals: Neumann/Robin terms, normals, tractions.

The reference has no boundary handling at all (no BC application anywhere,
SURVEY.md §0) — this subsystem is framework-original.  Physics checks use
the reference's manufactured solution u = (9-x²)(9-y²)(·(9-z²) in 3D),
whose normal derivative supplies exact Neumann/Robin data.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.fem.space import FunctionSpace, VectorFunctionSpace
from tpufem.forms.language import (Coefficient, Constant, FacetNormal, dot,
                                   grad, SpatialCoordinate)
from tpufem.forms.weakform import WeakForm, integrate_boundary
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d, model_problem_3d
from tpufem.sparse.ell import ell_matvec


def _solve_ell(A, b, tol=1e-12, maxiter=8000):
    return cg(lambda v: ell_matvec(A.data, A.cols, v), b, tol=tol,
              maxiter=maxiter)


def _rel_l2(u, ue):
    u, ue = np.asarray(u), np.asarray(ue)
    return float(np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2)))


def test_boundary_measures_exact():
    V = FunctionSpace(rectangle_mesh(-3, 3, -3, 3, 8, 8), degree=1)
    assert abs(float(integrate_boundary(V, Constant(1.0))) - 24.0) < 1e-12
    right = integrate_boundary(V, Constant(1.0),
                               where=lambda c: c[:, 0] > 3 - 1e-9)
    assert abs(float(right) - 6.0) < 1e-12
    x = SpatialCoordinate(V)
    # edges x=±3 give 9*6 each; edges y=±3 give ∫x² = 18 each
    assert abs(float(integrate_boundary(V, x[0] * x[0])) - 144.0) < 1e-10
    V3 = FunctionSpace(box_mesh(-3, 3, -3, 3, -3, 3, 4, 4, 4), degree=1)
    assert abs(float(integrate_boundary(V3, Constant(1.0))) - 216.0) < 1e-10


def test_facet_normal_divergence_theorem():
    """∫_Γ n·F ds == ∫_Ω div F dx for F = (x, y): 2·|Ω| = 72."""
    V = FunctionSpace(rectangle_mesh(-3, 3, -3, 3, 8, 8), degree=1)
    n = FacetNormal(V)
    x = SpatialCoordinate(V)
    assert abs(float(integrate_boundary(V, dot(n, x))) - 72.0) < 1e-10


@pytest.mark.parametrize("degree,sizes,rate_min", [(1, (16, 32), 3.4),
                                                   (2, (8, 16), 7.0)])
def test_neumann_poisson_convergence(degree, sizes, rate_min):
    """Mixed Dirichlet(x=±3)/Neumann(y=±3) with manufactured data:
    O(h^{p+1}) L2 convergence."""
    f, exact = model_problem_2d()
    errs = []
    for N in sizes:
        mesh = rectangle_mesh(-3, 3, -3, 3, N, N)
        V = FunctionSpace(mesh, degree=degree)
        wf = WeakForm(V)
        wf.build(lambda u, v: dot(grad(u), grad(v)),
                 lambda v: Coefficient(f) * v)
        # n·∇u on y=±3 is -6(9-x²) (u = (9-x²)(9-y²))
        g = Coefficient(lambda xq: -6.0 * (9.0 - xq[..., 0] ** 2))
        wf.build_boundary(rhs=lambda v: g * v,
                          where=lambda c: np.abs(c[:, 1]) > 3 - 1e-9)
        A, b = wf.assemble(format="ell")
        bc = jnp.asarray(np.abs(V.scalar_dof_coords[:, 0]) > 3 - 1e-9)
        A, b = apply_dirichlet_ell(A, b, bc)
        res = _solve_ell(A, b, tol=1e-13)
        assert bool(res.converged)
        errs.append(_rel_l2(res.x, exact(V.scalar_dof_coords)))
    assert errs[0] / errs[1] > rate_min, errs


def test_robin_poisson_no_dirichlet():
    """Pure Robin problem (∂u/∂n + u = g on all of Γ): well-posed without
    any Dirichlet row, solution matches the manufactured u."""
    f, exact = model_problem_2d()
    mesh = rectangle_mesh(-3, 3, -3, 3, 24, 24)
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V)
    wf.build(lambda u, v: dot(grad(u), grad(v)),
             lambda v: Coefficient(f) * v)

    def gfun(xq):
        xx, yy = xq[..., 0], xq[..., 1]
        return jnp.where(jnp.abs(xx) > 3 - 1e-9, -6 * (9 - yy ** 2),
                         -6 * (9 - xx ** 2))

    wf.build_boundary(lhs=lambda u, v: u * v,
                      rhs=lambda v: Coefficient(gfun) * v)
    A, b = wf.assemble(format="ell")
    res = _solve_ell(A, b)
    assert bool(res.converged)
    assert _rel_l2(res.x, exact(mesh.coords)) < 3e-3


def test_boundary_formats_agree():
    """dense / ell / stencil assembly of a Robin form are identical."""
    f, _ = model_problem_2d()
    V = FunctionSpace(rectangle_mesh(-3, 3, -3, 3, 12, 12), degree=1)

    def build(fmt):
        wf = WeakForm(V)
        wf.build(lambda u, v: dot(grad(u), grad(v)),
                 lambda v: Coefficient(f) * v)
        wf.build_boundary(lhs=lambda u, v: 2.5 * u * v,
                          rhs=lambda v: Constant(1.0) * v)
        return wf.assemble(format=fmt)

    Ad, bd = build("dense")
    Ae, be = build("ell")
    As, bs = build("stencil")
    np.testing.assert_array_equal(np.asarray(Ad), np.asarray(Ae.to_dense()))
    np.testing.assert_array_equal(np.asarray(Ad), np.asarray(As.to_dense()))
    np.testing.assert_array_equal(np.asarray(bd), np.asarray(be))


def test_neumann_poisson_3d():
    f3, exact3 = model_problem_3d()
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, 8, 8, 8)
    V = FunctionSpace(mesh, degree=1)
    wf = WeakForm(V)
    wf.build(lambda u, v: dot(grad(u), grad(v)),
             lambda v: Coefficient(f3) * v)
    g3 = Coefficient(
        lambda xq: -6.0 * (9 - xq[..., 0] ** 2) * (9 - xq[..., 1] ** 2))
    wf.build_boundary(rhs=lambda v: g3 * v,
                      where=lambda c: np.abs(c[:, 2]) > 3 - 1e-9)
    A, b = wf.assemble(format="ell")
    bc = jnp.asarray((np.abs(mesh.coords[:, 0]) > 3 - 1e-9)
                     | (np.abs(mesh.coords[:, 1]) > 3 - 1e-9))
    A, b = apply_dirichlet_ell(A, b, bc)
    res = _solve_ell(A, b, tol=1e-12, maxiter=4000)
    assert bool(res.converged)
    assert _rel_l2(res.x, exact3(mesh.coords)) < 5e-2


def test_traction_resultant_vector_space():
    """∑ b_bnd over each component equals traction × loaded length."""
    from tpufem.assemble.dense import assemble_vector

    Vv = VectorFunctionSpace(rectangle_mesh(0, 2, 0, 1, 8, 4), degree=1)
    wfv = WeakForm(Vv)
    t = Constant(np.array([0.5, -1.25]))
    wfv.build_boundary(rhs=lambda v: dot(t, v),
                       where=lambda c: c[:, 1] > 1 - 1e-9)
    setup = wfv._facet_setup()
    bf = wfv.boundary_element_vectors(setup)
    fde = wfv._expanded_facet_dofs(setup[1])
    bv = assemble_vector(fde, bf, Vv.num_dofs)
    resultant = np.asarray(bv).reshape(-1, 2).sum(0)
    np.testing.assert_allclose(resultant, [1.0, -2.5], rtol=1e-12)
