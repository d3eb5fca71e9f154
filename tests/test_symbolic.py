"""SymPy reproduction of the reference's GiNaC pipeline + runtime codegen.

Verifies (a) the symbolic chain-rule path produces the same local matrices as
the closed-form/traced kernels, (b) the generated Python kernel (the NVRTC
string-template analogue) compiles and agrees, (c) the signed-jac semantics
match the reference's generated expressions (SURVEY.md §2.5.4).
"""
import numpy as np
import jax.numpy as jnp
import sympy as sp

from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.forms.symbolic import (SymbolicFunctionSpace, SymbolicWeakForm,
                                   sym_dot, sym_grad)
from tpufem.mesh.rectangle import rectangle_mesh


def _build_poisson():
    fs = SymbolicFunctionSpace()
    x, y = fs.x, fs.y
    f = -2 * (x * x + y * y) + 36   # the reference RHS (fea_symbolic.cu:498)
    wf = SymbolicWeakForm(fs)
    wf.build(lambda u, v: sym_dot(sym_grad(u, x, y), sym_grad(v, x, y)),
             lambda v: f * v)
    return fs, wf


def _mesh_xy(mesh):
    ec = mesh.element_coords()
    return ec[:, :, 0], ec[:, :, 1]


def test_chain_rule_derivatives():
    """sfR/sfS derivatives match the reference formulas
    (/root/reference/fea_symbolic.cu:38-71)."""
    fs = SymbolicFunctionSpace()
    jac = (fs.x1 - fs.x3) * (fs.y2 - fs.y3) - (fs.y1 - fs.y3) * (fs.x2 - fs.x3)
    assert sp.simplify(sp.diff(fs.sfr, fs.x) - (fs.y2 - fs.y3) / jac) == 0
    assert sp.simplify(sp.diff(fs.sfr, fs.y) - (fs.x3 - fs.x2) / jac) == 0
    assert sp.simplify(sp.diff(fs.sfs, fs.x) - (fs.y3 - fs.y1) / jac) == 0
    assert sp.simplify(sp.diff(fs.sfs, fs.y) - (fs.x1 - fs.x3) / jac) == 0


def test_symbolic_jacobian():
    fs = SymbolicFunctionSpace()
    expected = ((fs.x1 - fs.x3) * (fs.y2 - fs.y3)
                - (fs.y1 - fs.y3) * (fs.x2 - fs.x3))
    assert sp.simplify(fs.jacobian() - expected) == 0


def test_symbolic_matches_closed_form_on_ccw_elements():
    """On the structured mesh both triangle types have jac > 0, so signed-jac
    reference semantics equal the |detJ| production semantics."""
    _, wf = _build_poisson()
    mesh = rectangle_mesh(-3, 3, -3, 3, 4, 4)
    X, Y = _mesh_xy(mesh)
    jac = (X[:, 0] - X[:, 2]) * (Y[:, 1] - Y[:, 2]) \
        - (Y[:, 0] - Y[:, 2]) * (X[:, 1] - X[:, 2])
    assert (jac > 0).all()
    rule = triangle_rule(5)
    Ke_sym = wf.element_matrices_signed(X, Y, rule)
    Ke = np.asarray(p1_stiffness(jnp.asarray(mesh.element_coords()),
                                 P1Triangle()))
    np.testing.assert_allclose(Ke_sym, Ke, rtol=1e-12, atol=1e-13)


def test_signed_vs_abs_on_clockwise_elements():
    """Flip an element's orientation: signed-jac kernel flips sign (the
    reference defect we document), |detJ| path stays correct."""
    _, wf = _build_poisson()
    mesh = rectangle_mesh(-3, 3, -3, 3, 2, 2)
    X, Y = _mesh_xy(mesh)
    Xf, Yf = X.copy(), Y.copy()
    Xf[0] = X[0, ::-1]
    Yf[0] = Y[0, ::-1]  # reverse node order of element 0 -> jac < 0
    rule = triangle_rule(5)
    K_signed = wf.element_matrices_signed(Xf, Yf, rule)
    K_abs = wf.element_matrices(Xf, Yf, rule)
    K_orig = wf.element_matrices_signed(X, Y, rule)
    # signed: element 0 is the negative of the reversed-permutation original
    perm = [2, 1, 0]
    np.testing.assert_allclose(K_signed[0], -K_orig[0][np.ix_(perm, perm)],
                               rtol=1e-12)
    np.testing.assert_allclose(K_abs[0], K_orig[0][np.ix_(perm, perm)],
                               rtol=1e-12)


def test_rhs_symbolic_matches_quadrature():
    _, wf = _build_poisson()
    mesh = rectangle_mesh(-3, 3, -3, 3, 4, 4)
    X, Y = _mesh_xy(mesh)
    rule = triangle_rule(5)
    be_sym = wf.element_vectors_signed(X, Y, rule)
    be = np.asarray(element_load(
        jnp.asarray(mesh.element_coords()), P1Triangle(), rule,
        lambda p: 36.0 - 2.0 * (p[..., 0] ** 2 + p[..., 1] ** 2)))
    np.testing.assert_allclose(be_sym, be, rtol=1e-12, atol=1e-13)


def test_generated_kernel_compiles_and_agrees():
    """The full runtime pipeline: symbolic build -> source template ->
    exec/jit compile -> launch (NVRTC parity, fea_symbolic_nvrtc.cpp §3.2)."""
    _, wf = _build_poisson()
    src = wf.get_code()
    assert "def fea_kernel" in src and "$INTEGRANDS$" not in src
    kernel = wf.compile()
    mesh = rectangle_mesh(-3, 3, -3, 3, 4, 4)
    X, Y = _mesh_xy(mesh)
    rule = triangle_rule(5)
    Ke, be = kernel(jnp.asarray(X), jnp.asarray(Y),
                    jnp.asarray(rule.points[:, 0]),
                    jnp.asarray(rule.points[:, 1]),
                    jnp.asarray(rule.weights))
    np.testing.assert_allclose(np.asarray(Ke),
                               wf.element_matrices_signed(X, Y, rule),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(be),
                               wf.element_vectors_signed(X, Y, rule),
                               rtol=1e-12, atol=1e-13)


def test_c_code_emission():
    """get_c_code keeps the reference's printed-source capability
    (fea_symbolic.cu:306-315)."""
    _, wf = _build_poisson()
    code = wf.get_c_code()
    assert "x1" in code and "y3" in code
    assert len(code.splitlines()) == 12  # 9 lhs + 3 rhs


def test_traced_frontend_matches_symbolic():
    """End-to-end parity: numerically-traced WeakForm == symbolic pipeline."""
    from tpufem.fem.space import FunctionSpace
    from tpufem.forms.language import SpatialCoordinate, dot, grad
    from tpufem.forms.weakform import WeakForm

    mesh = rectangle_mesh(-3, 3, -3, 3, 6, 6)
    V = FunctionSpace(mesh, degree=1)
    Xc = SpatialCoordinate(V)
    f = 36 - 2 * (Xc[0] ** 2 + Xc[1] ** 2)
    wf_traced = WeakForm(V, quadrature=triangle_rule(5)).build(
        lambda u, v: dot(grad(u), grad(v)), lambda v: f * v)
    ec = jnp.asarray(mesh.element_coords())
    Ke_traced = np.asarray(wf_traced.element_matrices(ec))
    be_traced = np.asarray(wf_traced.element_vectors(ec))

    _, wf_sym = _build_poisson()
    X, Y = _mesh_xy(mesh)
    rule = triangle_rule(5)
    np.testing.assert_allclose(Ke_traced,
                               wf_sym.element_matrices(X, Y, rule),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(be_traced,
                               wf_sym.element_vectors_signed(X, Y, rule),
                               rtol=1e-12, atol=1e-12)
