"""Distributed paths on the 8-device virtual CPU mesh (SURVEY.md §4e)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.stencil import assemble_stencil
from tpufem.dist.cg import distributed_stencil_solve, stencil_cg_sharded
from tpufem.dist.partition import pad_rows
from tpufem.fem.elements import P1Tetrahedron, P1Triangle
from tpufem.fem.quadrature import tetrahedron_rule, triangle_rule
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_stencil
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d, model_problem_3d
from tpufem.sparse.stencil import stencil_pattern


def _mesh8(cpu_devices):
    return Mesh(np.array(cpu_devices[:8]), ("rows",))


def _poisson_stencil_system(n=20):
    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    ec = jnp.asarray(mesh.element_coords())
    el = P1Triangle()
    Ke = p1_stiffness(ec, el)
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A = assemble_stencil(pat, Ke)
    f, _ = model_problem_2d()
    be = element_load(ec, el, triangle_rule(5), f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    A, b = apply_dirichlet_stencil(A, b, jnp.asarray(mesh.node_flags != 0))
    return mesh, A, b


def test_distributed_cg_matches_single_device(cpu_devices):
    mesh2d, A, b = _poisson_stencil_system(20)
    ref = cg(A.matvec, b, tol=1e-11, maxiter=3000)
    assert bool(ref.converged)

    dmesh = _mesh8(cpu_devices)
    x, res = distributed_stencil_solve(A, b, dmesh, tol=1e-11, maxiter=3000)
    assert bool(res.converged)
    assert not bool(res.diverged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-9)


def test_distributed_cg_3d(cpu_devices):
    # 13x13x13 nodes = 2197 rows -> 275 rows/shard > halo (13*13+13+1 = 183)
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, 12, 12, 12)
    ec = jnp.asarray(mesh.element_coords())
    el = P1Tetrahedron()
    Ke = p1_stiffness(ec, el)
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A = assemble_stencil(pat, Ke)
    f, _ = model_problem_3d()
    be = element_load(ec, el, tetrahedron_rule(3), f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    A, b = apply_dirichlet_stencil(A, b, jnp.asarray(mesh.node_flags != 0))

    ref = cg(A.matvec, b, tol=1e-10, maxiter=2000)
    dmesh = _mesh8(cpu_devices)
    x, res = distributed_stencil_solve(A, b, dmesh, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-8)


def test_halo_wider_than_stripe_raises(cpu_devices):
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 6, 6, 6)  # 343 nodes, halo 57 > 43
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Tetrahedron())
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A = assemble_stencil(pat, Ke)
    b = jnp.ones(mesh.num_nodes)
    import pytest
    with pytest.raises(ValueError, match="thinner than the stencil halo"):
        distributed_stencil_solve(A, b, _mesh8(cpu_devices))


def test_pad_rows_identity_padding(cpu_devices):
    _, A, b = _poisson_stencil_system(9)   # 100 rows -> pads to 104
    diag_k = A.offsets.index(0)
    data_p, b_p, n = pad_rows(A.data, b, A.offsets, 8, diag_k)
    assert data_p.shape[1] % 8 == 0
    assert n == b.shape[0]
    # padding rows are identity with zero rhs
    assert np.asarray(data_p[diag_k, n:] == 1).all()
    assert np.asarray(b_p[n:] == 0).all()


def test_sharded_matvec_matches_local(cpu_devices):
    _, A, b = _poisson_stencil_system(15)   # 256 rows = 8 * 32
    assert b.shape[0] % 8 == 0
    dmesh = _mesh8(cpu_devices)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(b.shape[0]))

    import functools
    @functools.partial(jax.shard_map, mesh=dmesh,
                       in_specs=(P(None, "rows"), P("rows")),
                       out_specs=P("rows"))
    def mv(data_l, x_l):
        from tpufem.dist.stencil import sharded_stencil_matvec
        return sharded_stencil_matvec(data_l, x_l, A.offsets, "rows")

    y_dist = mv(jax.device_put(A.data, NamedSharding(dmesh, P(None, "rows"))),
                jax.device_put(x, NamedSharding(dmesh, P("rows"))))
    np.testing.assert_allclose(np.asarray(y_dist), np.asarray(A.matvec(x)),
                               rtol=1e-11, atol=1e-12)


def test_auto_sharding_pjit_path(cpu_devices):
    """The zero-custom-code path: shard inputs with NamedSharding, jit the
    plain single-chip CG, let XLA insert collectives."""
    _, A, b = _poisson_stencil_system(15)
    dmesh = _mesh8(cpu_devices)
    from tpufem.sparse.stencil import StencilMatrix

    data_s = jax.device_put(A.data, NamedSharding(dmesh, P(None, "rows")))
    b_s = jax.device_put(b, NamedSharding(dmesh, P("rows")))
    A_s = StencilMatrix(data_s, A.offsets)

    @jax.jit
    def solve(A_, b_):
        return cg(A_.matvec, b_, tol=1e-11, maxiter=3000)

    res = solve(A_s, b_s)
    ref = cg(A.matvec, b, tol=1e-11, maxiter=3000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-9)


# -- distributed unstructured (banded ELL) ------------------------------------

def test_sharded_ell_matvec_matches_local(cpu_devices):
    """Partitioned halo matvec == the single-device ELL gather matvec."""
    from tpufem.dist.ell import ell_partition, sharded_ell_matvec
    from tpufem.sparse.ell import ell_matvec
    import functools

    rng = np.random.default_rng(3)
    n, k, band = 1000, 8, 60
    cols = np.clip(np.arange(n)[:, None]
                   + rng.integers(-band, band + 1, size=(n, k)),
                   0, n - 1).astype(np.int32)
    data = rng.standard_normal((n, k))
    x = rng.standard_normal(n)
    mesh = Mesh(np.array(cpu_devices[:8]), ("rows",))
    part = ell_partition(data, cols, 8)
    xp = jnp.asarray(np.pad(x, (0, part.data.shape[0] - n)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("rows", None), P("rows", None), P("rows")),
        out_specs=P("rows"))
    def mv(d, r, v):
        return sharded_ell_matvec(d, r, v, part.halo, "rows")

    y = np.asarray(mv(jnp.asarray(part.data), jnp.asarray(part.rel), xp))[:n]
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols),
                                jnp.asarray(x)))
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12)


def test_distributed_ell_solve_unstructured(cpu_devices):
    """Full pipeline: perturbed mesh -> ELL assembly -> BC -> RCM ->
    8-shard halo CG == single-device CG (SURVEY §2.4 realized for the
    unstructured format)."""
    from tpufem.assemble.ell import assemble_ell
    from tpufem.dist.ell import distributed_ell_solve
    from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
    from tpufem.mesh.rectangle import perturbed_rectangle_mesh
    from tpufem.solve.bc import apply_dirichlet_ell
    from tpufem.sparse.ell import ell_matvec, reorder_ell

    mesh2 = perturbed_rectangle_mesh(-3, 3, -3, 3, 24, 24, jitter=0.2,
                                     seed=1)
    pat = ell_pattern(mesh2.conn, mesh2.num_nodes, pad_to=8)
    ecoords = jnp.asarray(mesh2.element_coords())
    Ke = p1_stiffness(ecoords, P1Triangle())
    A = assemble_ell(pat, Ke)
    f, _ = model_problem_2d()
    be = element_load(ecoords, P1Triangle(), triangle_rule(5), f)
    b = assemble_vector(mesh2.conn, be, mesh2.num_nodes)
    bc = jnp.asarray(mesh2.node_flags != 0)
    A, b = apply_dirichlet_ell(A, b, bc)

    perm = reverse_cuthill_mckee(np.asarray(A.cols))
    data_p, cols_p = reorder_ell(np.asarray(A.data), np.asarray(A.cols),
                                 perm)
    b_p = np.asarray(b)[perm]

    dmesh = Mesh(np.array(cpu_devices[:8]), ("rows",))
    x_p, res = distributed_ell_solve(data_p, cols_p, b_p, dmesh,
                                     tol=1e-10, maxiter=3000)
    assert bool(res.converged)

    ref = cg(lambda v: ell_matvec(A.data, A.cols, v), b, tol=1e-10,
             maxiter=3000)
    x = np.empty(mesh2.num_nodes)
    x[perm] = np.asarray(x_p)
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=0, atol=1e-7)


def test_distributed_bcsr_solve_elasticity(cpu_devices):
    """2D elasticity BCSR system sharded over 8 devices == single-device
    block-Jacobi PCG (the vector-block counterpart of the ELL test)."""
    from tpufem.dist.ell import distributed_bcsr_solve
    from tpufem.fem.space import VectorFunctionSpace
    from tpufem.mesh.adjacency import ell_pattern
    from tpufem.solve.bc import apply_dirichlet_stencil  # noqa: F401
    from tpufem.solve.elasticity import elasticity_forms
    from tpufem.solve.precond import block_jacobi
    from tpufem.sparse.bcsr import apply_dirichlet_bcsr, assemble_bcsr
    from tpufem.assemble.dense import assemble_vector

    mesh2 = rectangle_mesh(0.0, 1.0, 0.0, 1.0, 12, 12)
    V = VectorFunctionSpace(mesh2, degree=1)
    f = lambda x: jnp.stack([jnp.sin(x[..., 0]), x[..., 1] ** 2], axis=-1)
    wf = elasticity_forms(V, 1.2, 0.7, f)
    ecoords = jnp.asarray(mesh2.element_coords())
    Ke = wf.element_matrices(ecoords)
    pattern = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs, pad_to=8)
    A = assemble_bcsr(pattern, Ke, block_size=2)
    b = assemble_vector(V.dof_conn, wf.element_vectors(ecoords), V.num_dofs)
    A, b = apply_dirichlet_bcsr(A, b, jnp.asarray(V.dof_flags))

    dmesh = Mesh(np.array(cpu_devices[:8]), ("rows",))
    x, res = distributed_bcsr_solve(A, b, dmesh, tol=1e-11, maxiter=4000)
    assert bool(res.converged)

    ref = cg(A.matvec, b, tol=1e-11, maxiter=4000,
             M=block_jacobi(A.diagonal_blocks()))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=0, atol=1e-8)


def test_sharded_leapfrog_matches_single_device(cpu_devices):
    """dist.dynamics.leapfrog_wave_sharded == solve.dynamics.leapfrog_wave
    trajectory on the same stencil system (8-way row stripes), and the
    discrete-energy invariant survives the distribution."""
    from tpufem.dist.dynamics import leapfrog_wave_sharded
    from tpufem.solve.dynamics import leapfrog_wave
    from tpufem.sparse.stencil import stencil_matvec

    mesh, A, _ = _poisson_stencil_system(n=24)
    nn = mesh.num_nodes
    bc = jnp.asarray(mesh.node_flags != 0)
    c = mesh.coords
    u0 = jnp.asarray(np.sin(np.pi * (c[:, 0] + 3) / 6)
                     * np.sin(np.pi * (c[:, 1] + 3) / 6))
    u0 = jnp.where(bc, 0.0, u0)
    mL = jnp.ones(nn, u0.dtype) * 0.5
    dt, steps = 1e-3, 25

    ref = leapfrog_wave(lambda u: stencil_matvec(A.data, A.offsets, u),
                        mL, u0, jnp.zeros(nn), dt, steps, bc_mask=bc)

    dmesh = _mesh8(cpu_devices)
    diag_k = A.offsets.index(0)
    data_p, u0_p, n_orig = pad_rows(A.data, u0, A.offsets, 8, diag_k)
    npad = u0_p.shape[0]
    mL_p = jnp.concatenate([mL, jnp.ones(npad - nn, mL.dtype)])
    bc_p = jnp.concatenate([bc, jnp.ones(npad - nn, bool)])
    res = leapfrog_wave_sharded(data_p, A.offsets, mL_p, u0_p,
                                jnp.zeros(npad), dt, steps, dmesh,
                                bc_mask=bc_p)
    u_s = np.asarray(res.u)[:n_orig]
    du = np.abs(u_s - np.asarray(ref.u)).max()
    scale = max(np.abs(np.asarray(ref.u)).max(), 1e-30)
    assert du / scale < 1e-10, du / scale
    e = np.asarray(res.energy)
    e_ref = np.asarray(ref.energy)
    assert np.abs(e - e_ref).max() / abs(e_ref[0]) < 1e-9
    drift = np.abs(e - e[0]).max() / abs(e[0])
    assert drift < 1e-9, drift
