"""Elasticity driver: exact reproduction of affine displacement fields and
ops/reduction microbenchmark golden checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.ops.reduction import (pallas_block_reduce, reduce_sum,
                                  reduction_check, segment_reduce)
from tpufem.solve.elasticity import solve_elasticity


@pytest.mark.parametrize("make_mesh", [
    lambda: rectangle_mesh(0, 1, 0, 2, 5, 4),
    lambda: box_mesh(0, 1, 0, 1, 0, 1, 3, 3, 3),
], ids=["2d", "3d"])
def test_affine_displacement_exact(make_mesh):
    """f = 0 with affine Dirichlet data: P1 elasticity reproduces u = A x + c
    exactly (constant strain, zero divergence of sigma)."""
    mesh = make_mesh()
    d = mesh.dim
    rng = np.random.default_rng(0)
    Amat = rng.standard_normal((d, d)) * 0.1
    c = rng.standard_normal(d)
    u_exact = mesh.coords @ Amat.T + c          # [NN, d]
    g = jnp.asarray(u_exact.reshape(-1))

    sol = solve_elasticity(mesh, lam=1.3, mu=0.6, bc_values=g, tol=1e-12)
    assert bool(sol.cg.converged)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(g),
                               rtol=1e-8, atol=1e-9)


def test_elasticity_with_body_force_consistency():
    """Body-force solve agrees with dense linear algebra."""
    from tpufem.assemble.dense import assemble_dense, assemble_vector
    from tpufem.solve.bc import apply_dirichlet_dense
    from tpufem.solve.elasticity import elasticity_forms
    from tpufem.fem.space import VectorFunctionSpace

    mesh = rectangle_mesh(0, 1, 0, 1, 4, 4)
    f = lambda x: jnp.stack([0 * x[..., 0] + 1.0, x[..., 1]], axis=-1)
    sol = solve_elasticity(mesh, lam=1.0, mu=1.0, body_force=f, tol=1e-12)
    assert bool(sol.cg.converged)

    V = VectorFunctionSpace(mesh, degree=1)
    wf = elasticity_forms(V, 1.0, 1.0, f)
    ec = jnp.asarray(mesh.element_coords())
    Ke = wf.element_matrices(ec)
    be = wf.element_vectors(ec)
    A = assemble_dense(V.dof_conn, Ke, V.num_dofs)
    b = assemble_vector(V.dof_conn, be, V.num_dofs)
    A2, b2 = apply_dirichlet_dense(A, b, jnp.asarray(V.dof_flags))
    x_ref = np.linalg.solve(np.asarray(A2), np.asarray(b2))
    np.testing.assert_allclose(np.asarray(sol.u), x_ref, rtol=1e-7,
                               atol=1e-9)


def test_reductions_golden():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(1 << 16), jnp.float64)
    assert reduction_check(x, reduce_sum(x))["match"]
    assert reduction_check(x, pallas_block_reduce(x, block=4096,
                                                  interpret=True))["match"]
    ids = jnp.asarray(rng.integers(0, 100, 1 << 16), jnp.int32)
    seg = segment_reduce(x, ids, 100)
    assert reduction_check(x, seg.sum())["match"]
    # per-segment values match numpy bincount
    ref = np.bincount(np.asarray(ids), weights=np.asarray(x), minlength=100)
    np.testing.assert_allclose(np.asarray(seg), ref, rtol=1e-12)
