"""WeakForm: user lambdas -> jit-traced element kernels -> assembled systems.

API parity with the reference (/root/reference/fea_symbolic.cu:503-506):

    V  = FunctionSpace(mesh, degree=1)
    x, y = SpatialCoordinate(V), ...   # components via indexing
    wf = WeakForm(V)
    wf.build(lambda u, v: dot(grad(u), grad(v)),
             lambda v: f * v)
    A, b = wf.assemble(format="ell")

The reference realizes ``build`` by symbolic differentiation, substitution of
the affine map, C-source emission into a $integrandIJ$ template, and NVRTC
compilation (/root/reference/fea_symbolic_nvrtc.cpp:307-356,501-543).  Here
``build`` stores the expression trees and evaluation happens inside
``jax.jit``: all (trial, test) basis pairs are evaluated *simultaneously* by
broadcasting over leading axes [A(trial), B(test), NE, Q], then contracted
against quadrature weights and |det J| in one einsum — the entire "runtime
codegen + JIT" pipeline collapses into one XLA trace (SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.assemble.dense import assemble_dense, assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import _inv_and_det
from tpufem.fem.quadrature import QuadratureRule, rule_for_cell
from tpufem.fem.space import FunctionSpace
from tpufem.forms.language import Expr, TestFunction, TrialFunction

__all__ = ["WeakForm", "EvalContext", "Function", "integrate",
           "integrate_boundary"]


class EvalContext:
    """Numeric bindings for expression evaluation.

    All arrays broadcast against leading axes [A, B, NE, Q] plus the value
    shape; degenerate axes are kept size-1 so XLA fuses the broadcasts.
    """

    def __init__(self, *, xq, dtype, phi=None, gphys=None, dof_conn=None,
                 trial_value=None, trial_grad=None,
                 test_value=None, test_grad=None, normal=None):
        self.xq = xq                    # [NE, Q, d]
        self.dtype = dtype
        self.phi = phi                  # [Q, ns] scalar shape values
        self.gphys = gphys              # [NE, Qg, ns, d] physical gradients
        self.dof_conn = dof_conn        # [NE, ns] scalar dof connectivity
        self.normal = normal            # boundary ctx: broadcastable [..., d]
        self._trial_value = trial_value
        self._trial_grad = trial_grad
        self._test_value = test_value
        self._test_grad = test_grad

    def _get(self, v, what):
        if v is None:
            raise ValueError(
                f"{what} function used in a form that does not bind one "
                "(e.g. trial function inside a linear form)")
        return v

    @property
    def trial_value(self):
        return self._get(self._trial_value, "trial")

    @property
    def trial_grad(self):
        return self._get(self._trial_grad, "trial")

    @property
    def test_value(self):
        return self._get(self._test_value, "test")

    @property
    def test_grad(self):
        return self._get(self._test_grad, "test")


class Function(Expr):
    """A discrete FEM function (nodal DOF values) usable inside forms.

    Enables energy functionals / residuals the reference has no counterpart
    for.  ``values`` is the global DOF vector.
    """

    def __init__(self, space: FunctionSpace, values):
        self.space = space
        self.values = values
        self.rank = 0 if space.num_components == 1 else 1

    def evaluate(self, ctx: EvalContext):
        nc = self.space.num_components
        vals = jnp.asarray(self.values, ctx.dtype)
        if nc == 1:
            ue = vals[ctx.dof_conn]                      # [NE, ns]
            # u(q) = sum_n phi[q,n] ue[e,n]
            return (ctx.phi[None] * ue[:, None, :]).sum(2)  # [NE, Q]
        ue = vals.reshape(-1, nc)[ctx.dof_conn]          # [NE, ns, nc]
        return (ctx.phi[None, :, :, None] * ue[:, None, :, :]).sum(2)

    def gradient(self, ctx: EvalContext):
        nc = self.space.num_components
        vals = jnp.asarray(self.values, ctx.dtype)
        if nc == 1:
            ue = vals[ctx.dof_conn]
            return (ctx.gphys * ue[:, None, :, None]).sum(2)
        ue = vals.reshape(-1, nc)[ctx.dof_conn]
        return (ctx.gphys[:, :, :, None, :]
                * ue[:, None, :, :, None]).sum(2)


# ---------------------------------------------------------------------------

def _basis_tables(space: FunctionSpace, rule: QuadratureRule, dtype):
    """phi [Q, ns], dN [Q, ns, dim] as static jnp constants."""
    el = space.element
    phi = jnp.asarray(el.shape_values(rule.points), dtype)
    dN = jnp.asarray(el.shape_grads(rule.points), dtype)
    return phi, dN


def _geometry(ecoords, dN, space: FunctionSpace, rule, dtype):
    """gphys [NE, Q, ns, d], |detJ| [NE, Q], xq [NE, Q, d].

    Two regimes, dispatched on the cell type:

    * affine simplices — the P1 vertex map has a CONSTANT Jacobian per
      element, even when the *basis* is higher order (P2+, whose
      gradients vary with q only through dN).  One inverse per element;
      |detJ| broadcasts over Q for a uniform downstream contraction.
    * tensor-product cells (quad/hex) — the multilinear isoparametric
      map's Jacobian varies across the cell, so J, its inverse and
      |detJ| are evaluated at every quadrature point.

    All tiny contractions are broadcast-multiply-reduce: fp32-exact on
    TPU and free of the pathological XLA small-dot compile times
    (assemble.local).
    """
    from tpufem.fem.elements import element_for_cell, is_affine_cell

    geo = element_for_cell(space.mesh.cell_type, 1)
    phi_geo = jnp.asarray(geo.shape_values(rule.points), dtype)   # [Q, npe]
    nq = rule.points.shape[0]
    if is_affine_cell(space.mesh.cell_type):
        dN_geo = jnp.asarray(
            geo.shape_grads(rule.points)[0], dtype)               # [npe, dim]
        # J[e,d,m] = sum_n x[e,n,d] dN_geo[n,m]
        J = (ecoords[:, :, :, None] * dN_geo[None, :, None, :]).sum(1)
        invJ, det = _inv_and_det(J)
        # gphys[e,q,n,d] = sum_m dN[q,n,m] invJ[e,m,d]
        gphys = (dN[None, :, :, :, None] * invJ[:, None, None, :, :]).sum(3)
        adet = jnp.broadcast_to(jnp.abs(det)[:, None],
                                (ecoords.shape[0], nq))
    else:
        dN_geo = jnp.asarray(geo.shape_grads(rule.points), dtype)  # [Q,npe,m]
        # J[e,q,d,m] = sum_n x[e,n,d] dN_geo[q,n,m]
        J = (ecoords[:, None, :, :, None]
             * dN_geo[None, :, :, None, :]).sum(2)
        invJ, det = _inv_and_det(J)                    # [NE, Q, d, d]
        # gphys[e,q,n,d] = sum_m dN[q,n,m] invJ[e,q,m,d]
        gphys = (dN[None, :, :, :, None] * invJ[:, :, None, :, :]).sum(3)
        adet = jnp.abs(det)
    # xq[e,q,d] = sum_n phi_geo[q,n] x[e,n,d]
    xq = (phi_geo[None, :, :, None] * ecoords[:, None, :, :]).sum(2)
    return gphys, adet, xq


def _expand_vector_basis(phi, gphys, nc):
    """Scalar basis tables -> vector basis tables (node-major, comp-minor).

    values:  [Q, ns] -> [Q, ns*nc, nc]      (phi_n * e_c)
    grads:   [NE, Q, ns, d] -> [NE, Q, ns*nc, nc, d]
    """
    ns = phi.shape[1]
    eye = jnp.eye(nc, dtype=phi.dtype)
    vphi = (phi[:, :, None, None] * eye[None, None]).reshape(
        phi.shape[0], ns * nc, nc)
    vg = gphys[:, :, :, None, None, :] * eye[None, None, None, :, :, None]
    vg = vg.reshape(gphys.shape[0], gphys.shape[1], ns * nc, nc, gphys.shape[3])
    return vphi, vg


@dataclasses.dataclass
class WeakForm:
    """A variational problem a(u, v) = L(v) on a function space."""

    space: FunctionSpace
    quadrature: Optional[QuadratureRule] = None
    dtype: object = jnp.float64

    def __post_init__(self):
        if self.quadrature is None:
            cell = self.space.mesh.cell_type
            deg = 5 if cell == "triangle" else 3
            self.quadrature = rule_for_cell(cell, deg)
        self.lhs_expr: Optional[Expr] = None
        self.rhs_expr: Optional[Expr] = None
        self.bnd_lhs_expr: Optional[Expr] = None
        self.bnd_rhs_expr: Optional[Expr] = None
        self.bnd_quadrature: Optional[QuadratureRule] = None
        self.bnd_mask = None

    # -- user API (parity: WeakForm::build, fea_symbolic.cu:275-317) --------

    def build(self, lhs: Optional[Callable] = None,
              rhs: Optional[Callable] = None) -> "WeakForm":
        u = TrialFunction(self.space)
        v = TestFunction(self.space)
        if lhs is not None:
            self.lhs_expr = lhs(u, v)
        if rhs is not None:
            self.rhs_expr = rhs(v)
        return self

    def build_boundary(self, lhs: Optional[Callable] = None,
                       rhs: Optional[Callable] = None, *,
                       where: Optional[Callable] = None) -> "WeakForm":
        """Add boundary (ds) terms: ``lhs(u, v)`` Robin-type bilinear terms,
        ``rhs(v)`` Neumann loads / tractions — the surface integrals the
        reference has no counterpart for (it applies no BCs at all).

        ``where``: optional facet filter, callable on facet-center
        coordinates [NF, d] -> bool mask, restricting the integral to part
        of the boundary (e.g. ``lambda x: x[:, 0] > 1 - 1e-9``).
        Gradients of trial/test functions are not available on facets
        (FacetNormal, values, and spatial coefficients are).
        """
        u = TrialFunction(self.space)
        v = TestFunction(self.space)
        if lhs is not None:
            self.bnd_lhs_expr = lhs(u, v)
        if rhs is not None:
            self.bnd_rhs_expr = rhs(v)
        self.bnd_mask = where
        return self

    # -- element kernels (the NVRTC-compiled kernel analogues) --------------

    def _context(self, ecoords, *, bind_trial, bind_test):
        space = self.space
        rule = self.quadrature
        phi, dN = _basis_tables(space, rule, self.dtype)
        gphys, adet, xq = _geometry(ecoords, dN, space, rule, self.dtype)
        nc = space.num_components

        if nc == 1:
            bphi, bg = phi, gphys          # [Q, ns], [NE, Q, ns, d]
        else:
            bphi, bg = _expand_vector_basis(phi, gphys, nc)

        nd = space.local_dofs
        kw = {}
        # Leading layout [A(trial), B(test), NE, Q] + value shape; degenerate
        # axes stay size-1 and broadcast (linear forms simply leave A = 1).
        if bind_trial:
            kw["trial_value"] = jnp.moveaxis(bphi, 1, 0)[:, None, None]
            kw["trial_grad"] = jnp.moveaxis(bg, 2, 0)[:, None]
        if bind_test:
            kw["test_value"] = jnp.moveaxis(bphi, 1, 0)[None, :, None]
            kw["test_grad"] = jnp.moveaxis(bg, 2, 0)[None]
        ctx = EvalContext(
            xq=xq, dtype=self.dtype, phi=phi, gphys=gphys,
            dof_conn=jnp.asarray(space.scalar_dof_conn), **kw)
        return ctx, adet, nd

    def element_matrices(self, ecoords):
        """Ke [NE, nd, nd] with Ke[e, i(test), j(trial)] = a(phi_j, phi_i).

        The broadcast-evaluate-contract here subsumes the reference's 9
        integrand dispatch branches (/root/reference/fea_test.cu:178-195) and
        its shared-memory quadrature reduction (fea_test.cu:233).
        """
        if self.lhs_expr is None:
            raise ValueError("build() a lhs first")
        ecoords = jnp.asarray(ecoords, self.dtype)
        ctx, adet, nd = self._context(ecoords, bind_trial=True, bind_test=True)
        w = jnp.asarray(self.quadrature.weights, self.dtype)
        res = self.lhs_expr.evaluate(ctx)
        ne, q = ecoords.shape[0], w.shape[0]
        res = jnp.broadcast_to(res, (nd, nd, ne, q))
        # Ke[e,i(test)=b,j(trial)=a] = sum_q res[a,b,e,q] w[q] |detJ|[e,q]
        Ke = (res * (w[None, :] * adet)[None, None]).sum(-1)   # [A, B, NE]
        return Ke.transpose(2, 1, 0)

    def element_vectors(self, ecoords):
        """be [NE, nd] with be[e, i] = L(phi_i) — the RHS assembly the
        reference generated code for but never ran (SURVEY.md §2.5.5)."""
        if self.rhs_expr is None:
            raise ValueError("build() a rhs first")
        ecoords = jnp.asarray(ecoords, self.dtype)
        ctx, adet, nd = self._context(ecoords, bind_trial=False, bind_test=True)
        w = jnp.asarray(self.quadrature.weights, self.dtype)
        res = self.rhs_expr.evaluate(ctx)
        ne, q = ecoords.shape[0], w.shape[0]
        res = jnp.broadcast_to(res, (1, nd, ne, q))[0]
        be = (res * (w[None, :] * adet)[None]).sum(-1)   # [B, NE]
        return be.T

    # -- boundary (facet) kernels --------------------------------------------

    def _facet_setup(self):
        """Host precompute: facets, scalar facet DOFs, geometry, basis."""
        import numpy as np

        from tpufem.fem.facets import (BoundaryFacets, boundary_facets,
                                       facet_dof_conn, facet_geometry)

        space = self.space
        mesh = space.mesh
        facets = boundary_facets(mesh)
        if self.bnd_mask is not None:
            centers = np.asarray(mesh.coords)[facets.conn].mean(axis=1)
            keep = np.asarray(self.bnd_mask(centers), bool)
            facets = BoundaryFacets(facets.conn[keep],
                                    facets.opposite[keep], facets.cell_type)
        rule = self.bnd_quadrature
        if rule is None:
            rule = rule_for_cell(facets.cell_type,
                                 min(2 * space.degree + 1, 5))
        fdofs = facet_dof_conn(space, facets)            # [NF, nfd]
        xq, detS, normal = facet_geometry(mesh.coords, facets, rule)
        from tpufem.fem.elements import element_for_cell
        fel = element_for_cell(facets.cell_type, space.degree)
        phi_f = fel.shape_values(rule.points)            # [Q, nfd]
        return facets, fdofs, rule, xq, detS, normal, phi_f

    def _facet_context(self, setup, *, bind_trial, bind_test):
        _, fdofs, rule, xq, detS, normal, phi_f = setup
        dt = self.dtype
        phi = jnp.asarray(phi_f, dt)
        nc = self.space.num_components
        if nc == 1:
            bphi = phi
        else:
            ns = phi.shape[1]
            eye = jnp.eye(nc, dtype=dt)
            bphi = (phi[:, :, None, None] * eye[None, None]).reshape(
                phi.shape[0], ns * nc, nc)
        kw = {}
        if bind_trial:
            kw["trial_value"] = jnp.moveaxis(bphi, 1, 0)[:, None, None]
        if bind_test:
            kw["test_value"] = jnp.moveaxis(bphi, 1, 0)[None, :, None]
        ctx = EvalContext(
            xq=jnp.asarray(xq, dt), dtype=dt, phi=phi,
            dof_conn=jnp.asarray(fdofs),
            normal=jnp.asarray(normal, dt)[None, None, :, None, :], **kw)
        nfd = phi.shape[1] * nc
        w = jnp.asarray(rule.weights, dt)
        return ctx, jnp.asarray(detS, dt), w, nfd

    def boundary_element_matrices(self, setup=None):
        """Kf [NF, nfd, nfd] of the boundary bilinear term (Robin etc.)."""
        if self.bnd_lhs_expr is None:
            raise ValueError("build_boundary() a lhs first")
        setup = setup or self._facet_setup()
        ctx, detS, w, nfd = self._facet_context(setup, bind_trial=True,
                                                bind_test=True)
        res = self.bnd_lhs_expr.evaluate(ctx)
        nf, q = detS.shape[0], w.shape[0]
        res = jnp.broadcast_to(res, (nfd, nfd, nf, q))
        Kf = (res * w[None, None, None, :]).sum(-1)
        return (Kf * detS[None, None, :]).transpose(2, 1, 0)

    def boundary_element_vectors(self, setup=None):
        """bf [NF, nfd] of the boundary load (Neumann flux / traction)."""
        if self.bnd_rhs_expr is None:
            raise ValueError("build_boundary() a rhs first")
        setup = setup or self._facet_setup()
        ctx, detS, w, nfd = self._facet_context(setup, bind_trial=False,
                                                bind_test=True)
        res = self.bnd_rhs_expr.evaluate(ctx)
        nf, q = detS.shape[0], w.shape[0]
        res = jnp.broadcast_to(res, (1, nfd, nf, q))[0]
        bf = (res * w[None, None, :]).sum(-1)
        return (bf * detS[None, :]).T

    def _expanded_facet_dofs(self, fdofs):
        import numpy as np
        nc = self.space.num_components
        if nc == 1:
            return fdofs
        base = fdofs.astype(np.int64) * nc
        return (base[:, :, None] + np.arange(nc, dtype=np.int64)
                ).reshape(base.shape[0], -1).astype(np.int32)

    # -- assembly ------------------------------------------------------------

    def assemble(self, format: str = "ell", pattern=None, pad_to=None):
        """Assemble (A, b). format in {"dense", "ell", "stencil"}.

        "stencil" (P1 scalar on structured meshes) routes the weak form to
        the shift-invariant zero-scatter path — the same storage the fused
        kernels and geometric multigrid consume (solve.bc
        .apply_dirichlet_stencil applies BCs)."""
        import numpy as np

        space = self.space
        ecoords = jnp.asarray(space.mesh.element_coords(), self.dtype)
        Ke = self.element_matrices(ecoords)
        b = None
        if self.rhs_expr is not None:
            be = self.element_vectors(ecoords)
            b = assemble_vector(space.dof_conn, be, space.num_dofs)

        setup = None
        fdofs_exp = None
        if self.bnd_rhs_expr is not None or self.bnd_lhs_expr is not None:
            setup = self._facet_setup()
            fdofs_exp = self._expanded_facet_dofs(setup[1])
        if self.bnd_rhs_expr is not None:
            bf = self.boundary_element_vectors(setup)
            b_bnd = assemble_vector(fdofs_exp, bf, space.num_dofs)
            b = b_bnd if b is None else b + b_bnd

        if format == "dense":
            A = assemble_dense(space.dof_conn, Ke, space.num_dofs)
            if self.bnd_lhs_expr is not None:
                Kf = self.boundary_element_matrices(setup)
                A = A + assemble_dense(fdofs_exp, Kf, space.num_dofs)
        elif format == "ell":
            if pattern is None:
                from tpufem.mesh.adjacency import ell_pattern
                if pad_to is None:
                    pad_to = 8 if space.mesh.dim == 2 else 16
                pattern = ell_pattern(space.dof_conn, space.num_dofs,
                                      pad_to=pad_to)
            A = assemble_ell(pattern, Ke)
            if self.bnd_lhs_expr is not None:
                from tpufem.mesh.adjacency import slots_for_conn
                Kf = self.boundary_element_matrices(setup)
                from tpufem.sparse.ell import ELLMatrix
                slots = jnp.asarray(
                    slots_for_conn(pattern, fdofs_exp).reshape(-1))
                data = A.data.reshape(-1).at[slots].add(Kf.reshape(-1))
                A = ELLMatrix(data=data.reshape(A.data.shape), cols=A.cols,
                              row_lengths=A.row_lengths,
                              diag_pos=A.diag_pos)
        elif format == "stencil":
            from tpufem.assemble.structured import (
                assemble_stencil_structured, structured_plan)
            if getattr(space.mesh, "structured", None) is None:
                raise ValueError(
                    "format='stencil' needs a structured mesh "
                    "(rectangle_mesh / box_mesh)")
            if space.degree != 1 or space.num_components != 1:
                raise ValueError("format='stencil' supports P1 scalar "
                                 "spaces; use 'ell' otherwise")
            plan = structured_plan(space.mesh)
            A = assemble_stencil_structured(plan, Ke)
            if self.bnd_lhs_expr is not None:
                Kf = self.boundary_element_matrices(setup)
                nn = space.num_dofs
                offsets = np.asarray(A.offsets, np.int64)
                rows = fdofs_exp[:, :, None].astype(np.int64)
                cols = fdofs_exp[:, None, :].astype(np.int64)
                k = np.searchsorted(offsets, (cols - rows).reshape(-1))
                if not np.array_equal(offsets[k],
                                      (cols - rows).reshape(-1)):
                    raise RuntimeError("boundary entry outside the stencil")
                row_flat = np.broadcast_to(
                    rows, np.broadcast_shapes(rows.shape, cols.shape)
                ).reshape(-1)
                slots = jnp.asarray(k * nn + row_flat)
                data = A.data.reshape(-1).at[slots].add(Kf.reshape(-1))
                from tpufem.sparse.stencil import StencilMatrix
                A = StencilMatrix(data.reshape(A.data.shape), A.offsets)
        else:
            raise ValueError(f"unknown format {format!r}")
        return A, b


def integrate(space: FunctionSpace, expr: Expr, *, quadrature=None,
              dtype=jnp.float64):
    """∫_Ω expr dx for an expression without trial/test functions
    (e.g. L2 error of a Function against an exact Coefficient)."""
    cell = space.mesh.cell_type
    rule = quadrature or rule_for_cell(cell, 5 if cell == "triangle" else 3)
    wf = WeakForm(space, quadrature=rule, dtype=dtype)
    ecoords = jnp.asarray(space.mesh.element_coords(), dtype)
    ctx, adet, _ = wf._context(ecoords, bind_trial=False, bind_test=False)
    w = jnp.asarray(rule.weights, dtype)
    res = expr.evaluate(ctx)
    ne, q = ecoords.shape[0], w.shape[0]
    res = jnp.broadcast_to(res, (ne, q))
    return (res * w[None, :] * adet).sum()


def integrate_boundary(space: FunctionSpace, expr: Expr, *, quadrature=None,
                       where=None, dtype=jnp.float64):
    """∫_Γ expr ds over the (optionally filtered) boundary — e.g. total
    flux ``integrate_boundary(V, dot(grad_of_exact, n))``, surface area,
    or traction resultants.  ``expr`` may use FacetNormal, Functions (by
    value), SpatialCoordinate, and Coefficients; not grad(u/v)."""
    wf = WeakForm(space, dtype=dtype)
    wf.bnd_quadrature = quadrature
    wf.bnd_mask = where
    setup = wf._facet_setup()
    ctx, detS, w, _ = wf._facet_context(setup, bind_trial=False,
                                        bind_test=False)
    res = expr.evaluate(ctx)
    nf, q = detS.shape[0], w.shape[0]
    res = jnp.broadcast_to(res, (1, 1, nf, q))[0, 0]
    return (((res * w[None, :]).sum(1)) * detS).sum()
