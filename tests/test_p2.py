"""P2 elements: cubic-order L2 convergence and BC handling on edge DOFs."""
import numpy as np
import jax.numpy as jnp

from tpufem.fem.space import FunctionSpace
from tpufem.forms.language import SpatialCoordinate, dot, grad
from tpufem.forms.weakform import Function, WeakForm, integrate
from tpufem.forms.language import Coefficient
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d


def _solve_p2(n):
    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    V = FunctionSpace(mesh, degree=2)
    X = SpatialCoordinate(V)
    f = 36 - 2 * (X[0] ** 2 + X[1] ** 2)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: f * v)
    A, b = wf.assemble(format="ell")
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))
    res = cg(A.matvec, b, tol=1e-13, maxiter=8000)
    assert bool(res.converged)
    return mesh, V, res.x


def test_p2_l2_convergence_order():
    """P2 L2 error must shrink ~O(h^3)."""
    _, exact = model_problem_2d()
    errs = []
    for n in (4, 8, 16):
        mesh, V, u = _solve_p2(n)
        uf = Function(V, u)
        ue = Coefficient(lambda p: (9 - p[..., 0] ** 2) * (9 - p[..., 1] ** 2))
        err2 = integrate(V, (uf - ue) ** 2)
        errs.append(float(err2) ** 0.5)
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r1 > 2.6, f"rates {r1:.2f}, {r2:.2f}; errors {errs}"
    assert r2 > 2.7, f"rates {r1:.2f}, {r2:.2f}; errors {errs}"


def test_p2_quadratic_exact():
    """u = x^2 (f = -2) lies in the P2 space: reproduced to solver tol."""
    mesh = rectangle_mesh(0, 1, 0, 1, 4, 4)
    V = FunctionSpace(mesh, degree=2)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: -2.0 * v)
    A, b = wf.assemble(format="ell")
    g = jnp.asarray(V.scalar_dof_coords[:, 0] ** 2)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags), g)
    res = cg(A.matvec, b, tol=1e-14, maxiter=5000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g),
                               rtol=1e-8, atol=1e-10)


def test_p2_edge_boundary_flags():
    """Edge DOFs on the boundary get flagged; corner-cell diagonals do not."""
    mesh = rectangle_mesh(0, 1, 0, 1, 2, 2)
    V = FunctionSpace(mesh, degree=2)
    # boundary edges of a 2x2 mesh: 8 exterior edges; interior edges include
    # the corner-cell diagonals connecting two boundary nodes
    n_bd_edges = int(V.dof_flags[mesh.num_nodes:].sum())
    assert n_bd_edges == 8
    mid = V.scalar_dof_coords[mesh.num_nodes:]
    flags = V.dof_flags[mesh.num_nodes:]
    on_rim = ((mid[:, 0] == 0) | (mid[:, 0] == 1)
              | (mid[:, 1] == 0) | (mid[:, 1] == 1))
    np.testing.assert_array_equal(np.asarray(flags), on_rim)
