"""Batched element kernels: geometry, local stiffness, local load.

This replaces the reference's per-thread ``integrand(funIdx, params)`` device
function (/root/reference/fea_test.cu:143-197) and its
(7 qp x 9 entries x 16 elements) thread-block quadrature reduction via shared
-memory atomicAdd (/root/reference/fea_test.cu:22-26,211-233).  On TPU the
whole element batch is one dense einsum pipeline: geometry factors are
computed for all elements at once on the VPU, and the quadrature contraction
is an MXU-friendly einsum over the Q axis — no atomics, no thread geometry.

Sign convention: the reference mixes signed Jacobians with compensating signs
in generated code and double-counts the 1/2 area factor in its hand-coded
dense variant (SURVEY.md §2.5.4).  Here |det J| is used explicitly and
quadrature weights carry the reference-cell measure, which yields the
mathematically correct (GiNaC-path) values for both element orientations.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.fem.elements import ReferenceElement
from tpufem.fem.quadrature import QuadratureRule

# Two TPU-specific rules shape every contraction in this module:
#  1. fp32 einsums default to bf16 MXU inputs — geometry differences
#     (x1 - x3 ~ h) and quadrature sums would lose all significance (and
#     1/det -> inf on fine meshes), so nothing here may hit the MXU in bf16;
#  2. tiny batched dot_generals (contraction dims 2-7 over millions of
#     elements) at HIGHEST precision trigger pathological XLA TPU compile
#     times (~3 min per shape, measured).
# Both are solved the same way: express the small contractions as explicit
# broadcast-multiply-reduce, which stays on the VPU in full fp32, compiles in
# seconds, and is bandwidth-bound (the roofline for this op class anyway).
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "affine_geometry", "p1_stiffness", "element_mass", "element_load",
    "map_points",
]

_REF_VOLUME = {"triangle": 0.5, "tetrahedron": 1.0 / 6.0}


def _inv_and_det(J):
    """Adjugate-based inverse + determinant for [..., d, d], d in {2, 3}."""
    d = J.shape[-1]
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        det = a * e - b * c
        inv = jnp.stack([
            jnp.stack([e, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2) / det[..., None, None]
        return inv, det
    if d == 3:
        m = J
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02)
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        adjT = jnp.stack([
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ], axis=-2)
        return adjT / det[..., None, None], det
    raise NotImplementedError(f"dim {d}")


def affine_geometry(ecoords, element: ReferenceElement):
    """Affine element geometry for P1 simplices.

    ecoords: [NE, npe, dim] element node coordinates (jnp array).
    Returns (phys_grads [NE, npe, dim], abs_det [NE]).

    The 2x2 case reproduces the reference's inverse-Jacobian gradients
    rx = ys/jac, ry = -xs/jac, ... (/root/reference/fea_test.cu:156-171) but
    with |det J| so clockwise elements (SURVEY.md §2.5.4) need no sign fixup.
    """
    if element.cell_type not in _REF_VOLUME:
        raise NotImplementedError(
            f"affine geometry is undefined for {element.cell_type!r} "
            "(multilinear map, non-constant Jacobian) — use the "
            "isoparametric WeakForm path (forms.weakform)")
    # For P1 simplices dN is (I; -1...-1), so J is pure coordinate
    # differences: J[e, d, m] = x[e, m, d] - x[e, last, d] — exactly the
    # reference's xr = x1-x3, ... (fea_test.cu:158-161), computed
    # elementwise (never through the MXU, which would round fp32
    # differences to bf16 and zero out fine-mesh Jacobians).
    last = ecoords[:, -1:, :]                       # [NE, 1, dim]
    E = ecoords[:, :-1, :] - last                   # [NE, dim(m), dim(d)]
    J = jnp.swapaxes(E, 1, 2)                       # [NE, d, m]
    invJ, det = _inv_and_det(J)
    # G[e, n, d] = dN[n, m] * invJ[e, m, d]; dN rows are the identity for
    # n < dim (so G row n = invJ row n) and all -1 for the last node:
    G_main = invJ                                   # [NE, dim, dim]
    G_last = -G_main.sum(axis=1, keepdims=True)     # last row: -sum
    G = jnp.concatenate([G_main, G_last], axis=1)   # [NE, npe, dim]
    return G, jnp.abs(det)


def p1_stiffness(ecoords, element: ReferenceElement):
    """Closed-form P1 Poisson local stiffness: K_e = (G G^T) * |detJ| * |ref|.

    [NE, npe, npe].  Exact (integrand is constant on each affine element), so
    no quadrature loop — the TPU path skips the reference's 7-point sum over
    a constant (/root/reference/fea_test.cu:229-233) entirely.
    """
    G, adet = affine_geometry(ecoords, element)
    vol = adet * _REF_VOLUME[element.cell_type]
    # K[e,i,j] = sum_d G[e,i,d] G[e,j,d] — broadcast-reduce, not dot_general
    K = (G[:, :, None, :] * G[:, None, :, :]).sum(-1)
    return K * vol[:, None, None]


def element_mass(ecoords, element: ReferenceElement, rule: QuadratureRule,
                 dtype=None):
    """Local mass matrices via quadrature: M_e[i,j] = sum_q w_q phi_i phi_j |detJ|."""
    dtype = dtype or ecoords.dtype
    phi = jnp.asarray(element.shape_values(rule.points), dtype)  # [Q, n]
    w = jnp.asarray(rule.weights, dtype)
    _, adet = affine_geometry(ecoords, element)
    mref = jnp.einsum("q,qi,qj->ij", w, phi, phi, precision=_HI)
    return mref[None] * adet[:, None, None]


def map_points(ecoords, element: ReferenceElement, rule: QuadratureRule):
    """Physical coordinates of quadrature points: [NE, Q, dim].

    The affine map x = x1*r + x2*s + x3*(1-r-s)
    (/root/reference/fea_symbolic.cu:229-231) generalized via shape values.
    """
    phi = jnp.asarray(element.shape_values(rule.points), ecoords.dtype)
    # xq[e,q,d] = sum_n phi[q,n] x[e,n,d]
    return (phi[None, :, :, None] * ecoords[:, None, :, :]).sum(2)


def element_nonlinear_load(ecoords, element: ReferenceElement,
                           rule: QuadratureRule, u_local, g):
    """State-dependent load: b_e[i] = sum_q w_q phi_i(q) g(u(x_q)) |detJ|.

    The element vector of a semilinear term ``∫ g(u) v`` — evaluated by
    interpolating the local DOFs ``u_local [NE, n]`` to the quadrature
    points through the shape values.  Differentiable in ``u_local``, so
    ``jax.jvp`` of an assembly built on this yields the exact Gateaux
    derivative ∫ g'(u) w v — the Jacobian term Newton needs — with no
    symbolic differentiation (tpufem.solve.newton; contrast the
    reference's GiNaC engine, /root/reference/fea_symbolic.cu:20-71).
    """
    phi = jnp.asarray(element.shape_values(rule.points), ecoords.dtype)
    w = jnp.asarray(rule.weights, ecoords.dtype)
    _, adet = affine_geometry(ecoords, element)
    uq = (phi[None, :, :] * u_local[:, None, :]).sum(-1)   # [NE, Q]
    gq = g(uq)
    wphi = w[:, None] * phi                                # [Q, n]
    be = (gq[:, :, None] * wphi[None, :, :]).sum(1)        # [NE, n]
    return be * adet[:, None]


def element_load(ecoords, element: ReferenceElement, rule: QuadratureRule, f):
    """Local load vectors b_e[i] = sum_q w_q phi_i(q) f(x_q) |detJ|.

    ``f`` is a callable taking [..., dim] physical coordinates -> [...] values
    (traced by jax).  This finishes the RHS assembly the reference generated
    code for but never executed (SURVEY.md §2.5.5;
    /root/reference/fea_kernal.cu:193-214 TODO).
    """
    phi = jnp.asarray(element.shape_values(rule.points), ecoords.dtype)
    w = jnp.asarray(rule.weights, ecoords.dtype)
    _, adet = affine_geometry(ecoords, element)
    xq = map_points(ecoords, element, rule)          # [NE, Q, dim]
    fq = f(xq)                                       # [NE, Q]
    wphi = w[:, None] * phi                          # [Q, n]
    be = (fq[:, :, None] * wphi[None, :, :]).sum(1)  # [NE, n]
    return be * adet[:, None]
