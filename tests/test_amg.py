"""Smoothed-aggregation AMG (VERDICT.md r2 item 5, the "ambitious" option).

Checks: (a) native/numpy aggregation parity and partition sanity; (b) the
Galerkin coarse operator equals the dense P^T A P; (c) the V-cycle is a
symmetric positive definite operator (hard PCG requirement); (d) PCG
iteration counts are (near) mesh-independent — the property Chebyshev-
Jacobi lacks; (e) coarse levels inherit the band so every level's SpMV
stays on the banded Pallas fast path.
"""
import numpy as np

import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.amg import build_amg, greedy_aggregate


def _system(n, seed=0):
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25,
                                    seed=seed)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    perm = reverse_cuthill_mckee(pat.cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    mesh = Mesh(coords=np.ascontiguousarray(mesh.coords[perm]),
                conn=inv[mesh.conn].astype(mesh.conn.dtype),
                node_flags=np.ascontiguousarray(mesh.node_flags[perm]),
                cell_type=mesh.cell_type)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    ec = jnp.asarray(mesh.element_coords())
    element = P1Triangle()
    A = assemble_ell(pat, p1_stiffness(ec, element))
    f, exact = model_problem_2d()
    b = assemble_vector(jnp.asarray(mesh.conn),
                        element_load(ec, element, triangle_rule(5), f),
                        mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
    return mesh, A, b, exact


def test_greedy_aggregate_native_matches_numpy():
    _, A, _, _ = _system(30)
    cols = np.asarray(A.cols)
    a_py, na_py = greedy_aggregate(cols, use_native=False)
    a_nat, na_nat = greedy_aggregate(cols, use_native=True)
    assert na_py == na_nat
    assert (a_py == a_nat).all()
    # valid partition: every node assigned, ids dense, sane sizes
    assert a_py.min() == 0 and a_py.max() == na_py - 1
    sizes = np.bincount(a_py)
    assert sizes.min() >= 1 and sizes.max() <= 16
    # renumbered by first member: first-occurrence order is 0, 1, 2, ...
    firsts = a_py[np.sort(np.unique(a_py, return_index=True)[1])]
    assert (firsts == np.arange(na_py)).all()


def test_galerkin_matches_dense_triple_product():
    _, A, _, _ = _system(16)
    hier = build_amg(A, coarse_n=20, max_levels=1)
    lv = hier.levels[0]
    n = A.shape[0]
    Ad = np.asarray(A.to_dense(), np.float64)
    nc = int(np.asarray(lv.p_cols).max()) + 1
    P = np.zeros((n, nc))
    np.add.at(P, (np.repeat(np.arange(n), lv.p_data.shape[1]),
                  np.asarray(lv.p_cols).ravel()),
              np.asarray(lv.p_data, np.float64).ravel())
    ref = P.T @ Ad @ P
    # coarse operator is the coarsest here: invert the stored inverse
    got = np.linalg.inv(np.asarray(hier.coarse_inv, np.float64))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    # restriction is exactly P^T
    R = np.zeros((nc, n))
    np.add.at(R, (np.repeat(np.arange(nc), lv.r_data.shape[1]),
                  np.asarray(lv.r_cols).ravel()),
              np.asarray(lv.r_data, np.float64).ravel())
    assert np.abs(R - P.T).max() < 1e-12


def test_vcycle_is_spd():
    _, A, _, _ = _system(12)
    hier = build_amg(A, coarse_n=30)
    n = A.shape[0]
    cols = [np.asarray(hier.apply(jnp.zeros(n, A.dtype).at[i].set(1.0)))
            for i in range(n)]
    M = np.stack(cols, axis=1)
    assert np.abs(M - M.T).max() < 1e-6 * np.abs(M).max()
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"V-cycle not PD: min eig {w.min()}"


def test_amg_pcg_mesh_independent_iterations():
    iters = {}
    for n in (40, 160):
        mesh, A, b, exact = _system(n)
        hier = build_amg(A, coarse_n=300)
        res = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hier.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
        u = np.asarray(res.x)
        ue = exact(mesh.coords)
        err = float(np.sqrt(np.mean((u - ue) ** 2))
                    / np.sqrt(np.mean(ue ** 2)))
        assert err < 20.0 / (n * n)      # O(h^2) discretization error
    # 16x the unknowns may cost at most ~60% more iterations
    assert iters[160] <= 1.6 * iters[40], iters
    assert iters[160] <= 25, iters
    # setup stays lean: low operator complexity, banded coarse levels
    hier = build_amg(A, coarse_n=300)
    assert hier.operator_complexity < 1.5
    for lv in hier.levels:
        c = np.asarray(lv.A.cols).astype(np.int64)
        bw = int(np.abs(c - np.arange(c.shape[0])[:, None]).max())
        assert bw <= 4096   # every level qualifies for the banded kernel
