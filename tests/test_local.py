"""Element-kernel correctness: geometry, stiffness, mass, load."""
import numpy as np
import jax.numpy as jnp

from tpufem.assemble.local import (affine_geometry, element_load,
                                   element_mass, map_points, p1_stiffness)
from tpufem.fem.elements import P1Tetrahedron, P1Triangle
from tpufem.fem.quadrature import tetrahedron_rule, triangle_rule
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh


def _reference_tri_stiffness(xy):
    """Independent loop computation of the P1 stiffness on one triangle,
    following the reference's hand-coded gradient formulas
    (/root/reference/fea_test.cu:156-171) with |jac| (SURVEY.md §2.5.4)."""
    x1, x2, x3 = xy[:, 0]
    y1, y2, y3 = xy[:, 1]
    xr, xs = x1 - x3, x2 - x3
    yr, ys = y1 - y3, y2 - y3
    jac = xr * ys - xs * yr
    rx, ry = ys / jac, -xs / jac
    sx, sy = -yr / jac, xr / jac
    tx, ty = -rx - sx, -ry - sy
    g = np.array([[rx, ry], [sx, sy], [tx, ty]])
    return (g @ g.T) * abs(jac) * 0.5


def test_p1_triangle_geometry_matches_reference_formulas():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-2, 2, size=(5, 3, 2))
    G, adet = affine_geometry(jnp.asarray(xy), P1Triangle())
    for e in range(5):
        x1, x2, x3 = xy[e, :, 0]
        y1, y2, y3 = xy[e, :, 1]
        jac = (x1 - x3) * (y2 - y3) - (x2 - x3) * (y1 - y3)
        np.testing.assert_allclose(adet[e], abs(jac), rtol=1e-12)
        # rx = ys/jac, ry = -xs/jac (fea_test.cu:166-171)
        np.testing.assert_allclose(G[e, 0, 0], (y2 - y3) / jac, rtol=1e-12)
        np.testing.assert_allclose(G[e, 0, 1], -(x2 - x3) / jac, rtol=1e-12)
        np.testing.assert_allclose(G[e, 1, 0], -(y1 - y3) / jac, rtol=1e-12)
        np.testing.assert_allclose(G[e, 1, 1], (x1 - x3) / jac, rtol=1e-12)


def test_p1_stiffness_vs_independent():
    rng = np.random.default_rng(1)
    xy = rng.uniform(-3, 3, size=(20, 3, 2))
    K = np.asarray(p1_stiffness(jnp.asarray(xy), P1Triangle()))
    for e in range(20):
        np.testing.assert_allclose(
            K[e], _reference_tri_stiffness(xy[e]), rtol=1e-11, atol=1e-13)


def test_p1_stiffness_properties():
    mesh = rectangle_mesh(-3, 3, -3, 3, 4, 4)
    K = np.asarray(p1_stiffness(jnp.asarray(mesh.element_coords()),
                                P1Triangle()))
    # Symmetric, rows sum to zero (constants in the kernel of grad).
    np.testing.assert_allclose(K, K.transpose(0, 2, 1), atol=1e-14)
    np.testing.assert_allclose(K.sum(axis=2), 0.0, atol=1e-12)
    # PSD: eigenvalues >= 0
    w = np.linalg.eigvalsh(K)
    assert (w > -1e-12).all()


def test_p1_tet_stiffness_unit_tet():
    # Unit right tet: vertices e1, e2, e3, origin (matching phi order r,s,t,u).
    xyz = np.array([[[1., 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]]])
    K = np.asarray(p1_stiffness(jnp.asarray(xyz), P1Tetrahedron()))[0]
    # grads: e1, e2, e3, -(1,1,1); volume 1/6
    g = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]], dtype=float)
    expected = (g @ g.T) / 6.0
    np.testing.assert_allclose(K, expected, rtol=1e-12)
    np.testing.assert_allclose(K.sum(axis=1), 0.0, atol=1e-13)


def test_element_mass_total():
    # Mass matrix entries integrate phi_i phi_j; total sum = element area.
    mesh = rectangle_mesh(0, 2, 0, 1, 2, 2)
    rule = triangle_rule(5)
    Me = np.asarray(element_mass(jnp.asarray(mesh.element_coords()),
                                 P1Triangle(), rule))
    np.testing.assert_allclose(Me.sum(), 2.0, rtol=1e-12)  # domain area
    # single element: area/12 off-diag, area/6 diag
    areas = Me.sum(axis=(1, 2))
    np.testing.assert_allclose(Me[:, 0, 0], areas / 6, rtol=1e-12)
    np.testing.assert_allclose(Me[:, 0, 1], areas / 12, rtol=1e-12)


def test_element_load_constant_f():
    # For f = 1, the load integrates phi_i -> area/3 per node.
    mesh = rectangle_mesh(0, 1, 0, 1, 3, 3)
    rule = triangle_rule(5)
    be = np.asarray(element_load(jnp.asarray(mesh.element_coords()),
                                 P1Triangle(), rule, lambda x: 1.0 + 0 * x[..., 0]))
    ec = mesh.element_coords()
    v1 = ec[:, 1] - ec[:, 0]
    v2 = ec[:, 2] - ec[:, 0]
    area = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    np.testing.assert_allclose(be, np.repeat(area[:, None] / 3, 3, axis=1),
                               rtol=1e-12)


def test_map_points_affine():
    mesh = box_mesh(0, 1, 0, 1, 0, 1, 1, 1, 1)
    rule = tetrahedron_rule(2)
    xq = np.asarray(map_points(jnp.asarray(mesh.element_coords()),
                               P1Tetrahedron(), rule))
    # All mapped points inside the unit cube.
    assert (xq >= -1e-12).all() and (xq <= 1 + 1e-12).all()
