"""Global assembly: golden 4x4 matrix vs independent numpy computation, and
cross-agreement of all storage formats (dense / COO / ELL, scatter / sort).

This replaces the reference's eyeballed 25x25 matrix dump
(/root/reference/fea_test.cu:319-324) with automated 1e-12 checks.
"""
import numpy as np
import jax.numpy as jnp

from tpufem.assemble.coo import assemble_coo, coo_triplets
from tpufem.assemble.dense import assemble_dense, assemble_vector
from tpufem.assemble.ell import assemble_ell, ell_values
from tpufem.assemble.local import p1_stiffness
from tpufem.fem.elements import P1Tetrahedron, P1Triangle
from tpufem.mesh.adjacency import ell_pattern, greedy_element_coloring
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh


def _independent_dense_assembly(mesh):
    """Pure-numpy loop assembly (the CPU cross-check the reference sketched
    but never ran, /root/reference/fea_kernal.cu:193-214)."""
    nn = mesh.num_nodes
    A = np.zeros((nn, nn))
    for e in range(mesh.num_elements):
        idx = mesh.conn[e]
        xy = mesh.coords[idx]
        x1, x2, x3 = xy[:, 0]
        y1, y2, y3 = xy[:, 1]
        jac = (x1 - x3) * (y2 - y3) - (x2 - x3) * (y1 - y3)
        rx, ry = (y2 - y3) / jac, -(x2 - x3) / jac
        sx, sy = -(y1 - y3) / jac, (x1 - x3) / jac
        g = np.array([[rx, ry], [sx, sy], [-rx - sx, -ry - sy]])
        Ke = (g @ g.T) * abs(jac) * 0.5
        for i in range(3):
            for j in range(3):
                A[idx[i], idx[j]] += Ke[i, j]
    return A


def test_golden_4x4_dense():
    """The reference's 4x4 demo mesh (fea_test.cu:15-16): dense assembly must
    match an independent computation to 1e-12 relative."""
    mesh = rectangle_mesh(-3.0, 3.0, -3.0, 3.0, 4, 4)
    Ke = p1_stiffness(jnp.asarray(mesh.element_coords()), P1Triangle())
    A = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    A_ref = _independent_dense_assembly(mesh)
    np.testing.assert_allclose(A, A_ref, rtol=1e-12, atol=1e-14)
    # Structural facts for the uniform right-triangle mesh: interior rows are
    # the 5-point stencil (4, -1, -1, -1, -1) scaled by 1 (h_x = h_y).
    n = 12  # interior center node
    np.testing.assert_allclose(A[n, n], 4.0, rtol=1e-12)
    for nb in (n - 1, n + 1, n - 5, n + 5):
        np.testing.assert_allclose(A[n, nb], -1.0, rtol=1e-12)
    for nb in (n - 4, n + 4):  # diagonal couplings vanish on this split
        np.testing.assert_allclose(A[n, nb], 0.0, atol=1e-13)
    # Symmetry
    np.testing.assert_allclose(A, A.T, atol=1e-13)


def test_formats_agree_2d():
    mesh = rectangle_mesh(-1.0, 2.0, 0.0, 1.0, 5, 7)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))

    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    for method in ("scatter", "sort"):
        A_ell = assemble_ell(pat, Ke, method=method)
        np.testing.assert_allclose(np.asarray(A_ell.to_dense()), A_dense,
                                   rtol=1e-12, atol=1e-14,
                                   err_msg=f"ELL method={method}")

    # COO dedup path
    vals = np.asarray(assemble_coo(mesh.conn, Ke, pat.unique_keys,
                                   mesh.num_nodes))
    A_coo = np.zeros_like(A_dense)
    rows = pat.unique_keys // mesh.num_nodes
    cols = pat.unique_keys % mesh.num_nodes
    A_coo[rows, cols] = vals
    np.testing.assert_allclose(A_coo, A_dense, rtol=1e-12, atol=1e-14)


def test_formats_agree_3d():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 2, 3, 2)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Tetrahedron())
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke, mesh.num_nodes))
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=16)
    A_ell = assemble_ell(pat, Ke, method="sort")
    np.testing.assert_allclose(np.asarray(A_ell.to_dense()), A_dense,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(A_dense.sum(axis=1), 0.0, atol=1e-12)


def test_coo_triplets_parity_layout():
    """Raw triplets keep the reference's (e, i, j) flat order
    (/root/reference/fea_test_sm_sym_sparse.cu:244-254)."""
    mesh = rectangle_mesh(0, 1, 0, 1, 1, 1)
    Ke = p1_stiffness(jnp.asarray(mesh.element_coords()), P1Triangle())
    rows, cols, vals = coo_triplets(mesh.conn, Ke)
    assert rows.shape == (mesh.num_elements * 9,)
    e, i, j = 1, 2, 0
    flat = e * 9 + i * 3 + j
    assert int(rows[flat]) == mesh.conn[e, i]
    assert int(cols[flat]) == mesh.conn[e, j]
    np.testing.assert_allclose(vals[flat], Ke[e, i, j])


def test_colored_assembly_agrees():
    """Color-partitioned accumulation (the atomics-free variant) matches."""
    mesh = rectangle_mesh(0, 1, 0, 1, 4, 4)
    ec = jnp.asarray(mesh.element_coords())
    Ke = np.asarray(p1_stiffness(ec, P1Triangle()))
    colors = greedy_element_coloring(mesh.conn, mesh.num_nodes)
    nn = mesh.num_nodes
    A = np.zeros((nn, nn))
    for c in range(colors.max() + 1):
        sel = colors == c
        conn_c = mesh.conn[sel]
        # within a color, target slots are unique -> direct (non-add) scatter
        rows = np.repeat(conn_c, 3, axis=1).ravel()
        cols = np.tile(conn_c, (1, 3)).ravel()
        flat_idx = rows.astype(np.int64) * nn + cols
        assert len(np.unique(flat_idx)) == len(flat_idx)
        A[rows, cols] += Ke[sel].ravel()
    Ke_j = jnp.asarray(Ke)
    A_dense = np.asarray(assemble_dense(mesh.conn, Ke_j, nn))
    np.testing.assert_allclose(A, A_dense, rtol=1e-12, atol=1e-14)


def test_assemble_vector():
    mesh = rectangle_mesh(0, 1, 0, 1, 2, 2)
    be = jnp.ones((mesh.num_elements, 3))
    b = np.asarray(assemble_vector(mesh.conn, be, mesh.num_nodes))
    # each node receives one contribution per incident element
    counts = np.bincount(mesh.conn.ravel(), minlength=mesh.num_nodes)
    np.testing.assert_allclose(b, counts.astype(float))
