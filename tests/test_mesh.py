"""Mesh generation parity with the reference RectangleMesh semantics
(/root/reference/fea_test.cu:86-132) + 3D box mesh sanity."""
import numpy as np

from tpufem.mesh.adjacency import (ell_pattern, greedy_element_coloring,
                                   node_adjacency)
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh, unit_square_mesh


def test_rectangle_mesh_4x4_nodes():
    # The reference's 4x4 demo mesh on (-3,3)^2 (fea_test.cu:15-16,266).
    mesh = rectangle_mesh(-3.0, 3.0, -3.0, 3.0, 4, 4)
    assert mesh.num_nodes == 25
    assert mesh.num_elements == 32
    # node (i, j) -> index i*(nCol+1)+j, coords (x0+j*dx, y0+i*dy)
    for i in range(5):
        for j in range(5):
            idx = i * 5 + j
            assert mesh.coords[idx, 0] == -3.0 + 1.5 * j
            assert mesh.coords[idx, 1] == -3.0 + 1.5 * i
            on_bd = i in (0, 4) or j in (0, 4)
            assert mesh.node_flags[idx] == (1 if on_bd else 0)


def test_rectangle_mesh_element_split():
    # Exact two-triangle split per cell (fea_test.cu:113-129):
    # lower (n, n+1, n+nc1), upper (n+1, n+nc1+1, n+nc1), interleaved.
    mesh = rectangle_mesh(0.0, 1.0, 0.0, 1.0, 2, 3)
    nc1 = 4
    k = 0
    for i in range(2):
        for j in range(3):
            n = i * nc1 + j
            assert list(mesh.conn[k]) == [n, n + 1, n + nc1]
            assert list(mesh.conn[k + 1]) == [n + 1, n + nc1 + 1, n + nc1]
            k += 2


def test_unit_square_mesh():
    mesh = unit_square_mesh(3, 3)
    assert mesh.coords.min() == 0.0 and mesh.coords.max() == 1.0


def test_neighbor_nodes_list_reference_semantics():
    # Max width is 2*NNODE+1 = 7 on the structured triangle mesh
    # (fea_test_sm_sym_sparse2.cu:28); lists are sorted and include self.
    mesh = rectangle_mesh(0.0, 1.0, 0.0, 1.0, 4, 4)
    lengths, indices = mesh.neighbor_nodes_list()
    assert indices.shape[1] == 7
    assert lengths.max() == 7
    # Interior node 12 (center of the 5x5 grid): neighbors via the diagonal
    # split are {n-6? no: n-5, n-4, n-1, n, n+1, n+4, n+5}.
    n = 12
    expected = sorted([n - 5, n - 4, n - 1, n, n + 1, n + 4, n + 5])
    assert list(indices[n][: lengths[n]]) == expected
    # Corner node 0 belongs to cells (0,0) only: neighbors {0, 1, 5}.
    assert lengths[0] == 3
    assert list(indices[0][:3]) == [0, 1, 5]
    # Padding keeps gathers in range.
    assert indices.max() < mesh.num_nodes
    assert indices.min() >= 0


def test_ell_pattern_slots_consistency():
    mesh = rectangle_mesh(-1.0, 1.0, -1.0, 1.0, 3, 5)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    assert pat.width == 8
    # Each slot's column must equal the (e, i, j) entry's gj.
    ne, npe = mesh.conn.shape
    for e in range(0, ne, 7):
        for i in range(npe):
            for j in range(npe):
                s = int(pat.slots[e, i, j])
                row, k = divmod(s, pat.width)
                assert row == mesh.conn[e, i]
                assert pat.cols[row, k] == mesh.conn[e, j]
    # Diagonal slots point at the row itself.
    rows = np.arange(mesh.num_nodes)
    assert (pat.cols[rows, pat.diag_pos] == rows).all()
    # nnz matches the scipy-style unique pair count.
    npairs = len({(int(a), int(b)) for tri in mesh.conn
                  for a in tri for b in tri})
    assert pat.nnz == npairs


def test_box_mesh_kuhn():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 2, 3, 4)
    assert mesh.num_nodes == 3 * 4 * 5
    assert mesh.num_elements == 6 * 2 * 3 * 4
    # All tets have positive volume measure (nondegenerate).
    ec = mesh.element_coords()
    v = np.abs(np.linalg.det(ec[:, :3] - ec[:, 3:4])) / 6.0
    assert (v > 1e-12).all()
    # Total volume equals the box volume.
    np.testing.assert_allclose(v.sum(), 1.0, rtol=1e-12)
    # Boundary flags: exactly the outer shell.
    interior = (3 - 2) * (4 - 2) * (5 - 2)
    assert (mesh.node_flags == 0).sum() == interior


def test_element_coloring():
    mesh = rectangle_mesh(0, 1, 0, 1, 6, 6)
    colors = greedy_element_coloring(mesh.conn, mesh.num_nodes)
    assert (colors >= 0).all()
    # No two elements of one color share a node.
    for c in range(colors.max() + 1):
        nodes = mesh.conn[colors == c].ravel()
        assert len(nodes) == len(set(nodes.tolist()))


def test_node_adjacency_matches_pattern():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 2, 2, 2)
    lengths, indices = node_adjacency(mesh.conn, mesh.num_nodes)
    pat = ell_pattern(mesh.conn, mesh.num_nodes)
    assert (lengths == pat.row_lengths).all()
    # Interior nodes of a Kuhn mesh see the 15-point stencil (self + 14).
    assert lengths.max() == 15
