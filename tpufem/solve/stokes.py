"""Stokes flow: Taylor-Hood P2-P1 mixed elements + block-preconditioned MINRES.

A model family the reference cannot express: its frontend binds ONE space
and ONE (trial, test) pair (/root/reference/fea_symbolic.cu:196-260,503-506).
Incompressible Stokes needs two coupled spaces,

    -nu div(grad u) + grad p = f        u in [P2]^d  (velocity)
                       div u = 0        p in  P1     (pressure),

whose discrete system is symmetric INDEFINITE:

    [ A   B^T ] [u]   [f]
    [ B   0   ] [p] = [0],   A = nu * vector-P2 Laplacian,
                             B = -int q div(v)  (pressure x velocity).

TPU-first design decisions:

  * both blocks are applied MATRIX-FREE: gather element DOFs, contract
    against precomputed per-element matrices (one broadcast-reduce, VPU,
    full fp32), scatter-add — the sparse matrix never exists, so there is
    no saddle-point sparsity pattern to build or reorder;
  * the solver is MINRES (solve/minres.py) — CG is invalid on indefinite
    systems — preconditioned by the standard SPD block diagonal
    diag(diag(A)^-1, nu * M_p^-1) with the lumped P1 pressure mass M_p;
  * velocity Dirichlet BCs by symmetric projection (S K S + (I-S), rhs
    lifted), the constant-pressure nullspace by mean projection Pi on the
    pressure block — both preserve symmetry, and MINRES on the projected
    (singular but consistent) system keeps p mean-zero automatically.

Taylor-Hood is inf-sup stable, so no pressure stabilization terms are
needed and the velocity error converges at O(h^3) in L2 (verified in
tests/test_stokes.py against a manufactured solution).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.local import affine_geometry
from tpufem.fem.quadrature import rule_for_cell
from tpufem.fem.space import FunctionSpace, VectorFunctionSpace
from tpufem.forms.language import grad, inner
from tpufem.forms.weakform import WeakForm
from tpufem.mesh.core import Mesh
from tpufem.solve.minres import MinresResult, minres

__all__ = ["StokesSolution", "StokesOperator", "build_stokes",
           "build_velocity_amg", "solve_stokes"]


class StokesSolution(NamedTuple):
    u: jax.Array               # [NV] velocity DOFs (node-major, comp-minor)
    p: jax.Array               # [NQ] pressure DOFs (mean-zero)
    res: MinresResult
    V: FunctionSpace           # velocity space ([P2]^d)
    Q: FunctionSpace           # pressure space (P1)
    walls: dict


@dataclasses.dataclass
class StokesOperator:
    """Matrix-free saddle-point operator + its block-diagonal preconditioner.

    All arrays are device-resident jnp; `matvec`/`precond` close over them
    for interactive use, while `solve_stokes` feeds them through the jit
    boundary as pytree arguments (closure capture bakes arrays into the
    lowered HLO as constants — BENCH_NOTES r4).  Deliberately holds ONLY
    arrays — the FunctionSpaces travel alongside, outside the pytree, so
    the (empty) aux_data stays hashable for the jit trace cache.
    """

    Ke: jax.Array              # [NE, nlv, nlv] viscous block element matrices
    Be: jax.Array              # [NE, nlq, nlv] divergence element matrices
    conn_v: jax.Array          # [NE, nlv] velocity DOF connectivity
    conn_q: jax.Array          # [NE, nlq] pressure DOF connectivity
    free_v: jax.Array          # [NV] bool: velocity DOF not Dirichlet
    diag_a: jax.Array          # [NV] diag of A (BC rows = 1)
    mp_lumped: jax.Array       # [NQ] lumped pressure mass / nu

    @property
    def nv(self) -> int:
        return int(self.free_v.shape[0])

    @property
    def nq(self) -> int:
        return int(self.mp_lumped.shape[0])

    # -- block applications --------------------------------------------------

    def apply_a(self, u):
        ue = u[self.conn_v]                               # [NE, nlv]
        ye = (self.Ke * ue[:, None, :]).sum(2)
        return jnp.zeros_like(u).at[self.conn_v].add(ye)

    def apply_b(self, u):
        ue = u[self.conn_v]                               # [NE, nlv]
        ye = (self.Be * ue[:, None, :]).sum(2)            # [NE, nlq]
        return jnp.zeros(self.nq, u.dtype).at[self.conn_q].add(ye)

    def apply_bt(self, p):
        pe = p[self.conn_q]                               # [NE, nlq]
        ye = (self.Be * pe[:, :, None]).sum(1)            # [NE, nlv]
        return jnp.zeros(self.nv, p.dtype).at[self.conn_v].add(ye)

    # -- saddle-point system (BC-projected, pressure mean-projected) ---------

    def _proj_p(self, p):
        return p - jnp.mean(p)

    def matvec(self, x):
        """K_tilde x for x = [u; p]: S K S + (I - S) on velocity,
        Pi B S / S B^T Pi coupling — symmetric by construction."""
        u, p = x[:self.nv], x[self.nv:]
        uf = jnp.where(self.free_v, u, 0)
        pp = self._proj_p(p)
        yu = self.apply_a(uf) + self.apply_bt(pp)
        yu = jnp.where(self.free_v, yu, u)
        yp = self._proj_p(self.apply_b(uf))
        return jnp.concatenate([yu, yp])

    def rhs(self, f_v, u_bc):
        """Lifted rhs [S(f - K u_bc) + u_bc; Pi(-B u_bc)]."""
        bu = jnp.where(self.free_v, f_v - self.apply_a(u_bc), u_bc)
        bp = self._proj_p(-self.apply_b(u_bc))
        return jnp.concatenate([bu, bp])

    def precond(self, r):
        """SPD block-diagonal: diag(A)^-1 on velocity, nu M_p^-1 on
        pressure (mp_lumped already carries the 1/nu)."""
        ru, rp = r[:self.nv], r[self.nv:]
        zu = ru / self.diag_a
        zp = self._proj_p(rp / self.mp_lumped)
        return jnp.concatenate([zu, zp])


def _pytree_flatten(op: StokesOperator):
    children = (op.Ke, op.Be, op.conn_v, op.conn_q, op.free_v,
                op.diag_a, op.mp_lumped)
    return children, None


def _pytree_unflatten(aux, ch):
    return StokesOperator(Ke=ch[0], Be=ch[1], conn_v=ch[2], conn_q=ch[3],
                          free_v=ch[4], diag_a=ch[5], mp_lumped=ch[6])


jax.tree_util.register_pytree_node(StokesOperator, _pytree_flatten,
                                   _pytree_unflatten)


def build_stokes(mesh: Mesh, *, viscosity: float = 1.0, dtype=jnp.float64):
    """Matrix-free Taylor-Hood operator blocks for a mesh.

    Returns ``(op, V, Q)``: the array-only :class:`StokesOperator` plus
    the velocity/pressure spaces (host-side objects, kept out of the
    pytree)."""
    V = VectorFunctionSpace(mesh, degree=2)
    Q = FunctionSpace(mesh, degree=1)
    d = mesh.dim

    # A = nu * vector Laplacian through the standard weak-form frontend
    wf = WeakForm(V)
    wf.build(lambda u, v: float(viscosity) * inner(grad(u), grad(v)))
    wf.dtype = dtype
    ecoords = jnp.asarray(mesh.element_coords(), dtype)
    Ke = wf.element_matrices(ecoords)                     # [NE, nlv, nlv]

    # B = -int q div(v): P1 value x P2 physical gradient at quadrature
    # points of a rule exact for the (degree 1)*(degree 1) integrand.
    rule = rule_for_cell(mesh.cell_type, 3)
    pts = np.asarray(rule.points)
    w = jnp.asarray(rule.weights, dtype)                  # sums to |ref cell|
    phi_q = jnp.asarray(Q.element.shape_values(pts), dtype)   # [Qp, nlq]
    gref_v = jnp.asarray(V.element.shape_grads(pts), dtype)   # [Qp, nlvs, d]
    G, adet = affine_geometry(ecoords, Q.element)         # P1 corner geometry
    invJ = G[:, :d, :]                                    # [NE, m, d]
    # gphys[e,q,n,c] = gref[q,n,m] invJ[e,m,c]
    gphys = (gref_v[None, :, :, :, None]
             * invJ[:, None, None, :, :]).sum(3)          # [NE, Qp, nlvs, d]
    # Be4[e,i,n,c] = -sum_q w_q phi[q,i] gphys[e,q,n,c] * |detJ|
    Be4 = -(w[None, :, None, None, None] * phi_q[None, :, :, None, None]
            * gphys[:, :, None, :, :]).sum(1)             # [NE, nlq, nlvs, d]
    Be4 = Be4 * adet[:, None, None, None]
    nlq = phi_q.shape[1]
    # flatten velocity (scalar dof, component) -> component-minor to match
    # the vector-space DOF expansion (fem/space.py)
    Be = Be4.reshape(Be4.shape[0], nlq, -1)

    conn_v = jnp.asarray(V.dof_conn)
    conn_q = jnp.asarray(Q.dof_conn)
    free_v = jnp.asarray(~V.dof_flags)

    # diag(A) with unit BC rows (the projected system is identity there)
    diag_ke = jnp.diagonal(Ke, axis1=1, axis2=2)          # [NE, nlv]
    diag_a = jnp.zeros(V.num_dofs, dtype).at[conn_v].add(diag_ke)
    diag_a = jnp.where(free_v, diag_a, 1.0)

    # lumped pressure mass (row sums = int psi_i), scaled by 1/nu so the
    # preconditioner is nu * M_p^-1
    mass_rows = (w[None, :, None] * phi_q[None]
                 * adet[:, None, None]).sum(1)            # [NE, nlq]
    mp = jnp.zeros(Q.num_scalar_dofs, dtype).at[conn_q].add(mass_rows)
    mp = mp / float(viscosity)

    op = StokesOperator(Ke=Ke, Be=Be, conn_v=conn_v, conn_q=conn_q,
                        free_v=free_v, diag_a=diag_a, mp_lumped=mp)
    return op, V, Q


def build_velocity_amg(mesh: Mesh, V: FunctionSpace, *,
                       viscosity: float = 1.0, dtype=jnp.float64,
                       walls_out: Optional[dict] = None, **amg_kw):
    """Scalar-AMG preconditioner pieces for the velocity block.

    The velocity block A is nu x the VECTOR P2 Laplacian with independent
    components, so one smoothed-aggregation hierarchy on the SCALAR P2
    Laplacian (same viscosity, same Dirichlet rows) preconditions every
    component: diag(A)^-1 keeps MINRES iterations growing ~1/h with
    refinement, one V-cycle per component keeps them flat (VERDICT r4
    item 6).  The scalar DOFs are RCM-renumbered first so the hierarchy's
    SpMVs ride the banded Pallas kernel; the permutation is conjugated
    into the preconditioner (z = P^T V-cycle(P r) — symmetry preserved).

    Returns ``(hier, perm, inv)`` — all jit-argument-safe pytrees/arrays.
    """
    import time

    from tpufem.assemble.ell import ell_values_scatter
    from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
    from tpufem.solve.amg import build_amg
    from tpufem.solve.bc import apply_dirichlet_ell
    from tpufem.sparse.ell import ELLMatrix

    t0 = time.perf_counter()
    Vs = FunctionSpace(mesh, degree=V.element.degree)   # scalar twin:
    # identical scalar DOF numbering to V's (same construction path)
    wf = WeakForm(Vs)
    wf.build(lambda u, v: float(viscosity) * inner(grad(u), grad(v)))
    wf.dtype = dtype
    ec = jnp.asarray(mesh.element_coords(), dtype)

    cols0 = ell_pattern(Vs.scalar_dof_conn, Vs.num_scalar_dofs,
                        with_sort_plan=False).cols
    perm = reverse_cuthill_mckee(cols0)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    conn_p = inv[Vs.scalar_dof_conn].astype(Vs.scalar_dof_conn.dtype)
    pat = ell_pattern(conn_p, Vs.num_scalar_dofs, pad_to=8)
    nrows, width = pat.cols.shape

    # element matrices -> ELL scatter -> Dirichlet rows, as ONE jitted
    # program with the scatter plan as arguments: the former eager
    # op-by-op chain cost 153.5 s at 131k scalar P2 rows over the device
    # relay (BENCH_NOTES r5 phase E2) — the same round-trip disease the
    # elasticity build fixed in round 5 (227-241 s -> one compile)
    def scalar_build(ec, slots, cols, diag_pos, flags):
        Ke_s = wf.element_matrices(ec)                  # [NE, nls, nls]
        data = ell_values_scatter(slots, Ke_s, nrows, width)
        A = ELLMatrix(data, cols, diag_pos=diag_pos)
        A2, _ = apply_dirichlet_ell(A, jnp.zeros(nrows, ec.dtype), flags)
        return A2.data

    flags_p = jnp.asarray(Vs.scalar_dof_flags[perm])
    data = jax.jit(scalar_build)(ec, jnp.asarray(pat.slots.reshape(-1)),
                                 jnp.asarray(pat.cols),
                                 jnp.asarray(pat.diag_pos), flags_p)
    A_s = ELLMatrix(jax.block_until_ready(data), jnp.asarray(pat.cols),
                    row_lengths=jnp.asarray(pat.row_lengths),
                    diag_pos=jnp.asarray(pat.diag_pos))
    A_s.resolve_band()
    if walls_out is not None:
        walls_out["scalar_system"] = time.perf_counter() - t0
    hier = build_amg(A_s, walls_out=walls_out, **amg_kw)
    return hier, jnp.asarray(perm), jnp.asarray(inv)


def velocity_amg_precond(op: StokesOperator, hier, perm, inv, d: int):
    """SPD block preconditioner: scalar V-cycle per velocity component
    (conjugated by the RCM permutation), lumped mass on pressure."""
    def M(r):
        ru, rp = r[:op.nv], r[op.nv:]
        rs = ru.reshape(-1, d)                           # [nsd, d]
        zs = jnp.stack([hier.apply(rs[:, c][perm])[inv]
                        for c in range(d)], axis=-1)
        zp = op._proj_p(rp / op.mp_lumped)
        return jnp.concatenate([zs.reshape(-1), zp])
    return M


def solve_stokes(mesh: Mesh, *, body_force: Optional[Callable] = None,
                 bc_velocity: Optional[Callable] = None,
                 viscosity: float = 1.0, dtype=jnp.float64,
                 tol: float = 1e-8, maxiter: int = 20_000,
                 check_every: int = 4,
                 velocity_precond: str = "jacobi",
                 amg_kw: Optional[dict] = None) -> StokesSolution:
    """Assemble + solve Stokes with block-preconditioned MINRES.

    ``body_force``: callable x[..., d] -> f[..., d] (None = 0).
    ``bc_velocity``: callable x[..., d] -> u[..., d] evaluated at boundary
    velocity DOF coordinates (None = no-slip everywhere).  Taylor-Hood
    places velocity DOFs at vertices AND edge midpoints, so the callable
    sees both.
    ``velocity_precond``: "jacobi" = diag(A)^-1 (iterations grow ~1/h);
    "amg" = one scalar-AMG V-cycle per velocity component
    (mesh-robust iteration counts; build_velocity_amg).
    """
    import time

    walls: dict = {}
    t0 = time.perf_counter()
    op, V, Q = build_stokes(mesh, viscosity=viscosity, dtype=dtype)

    # velocity rhs: f against the vector P2 test functions
    if body_force is not None:
        wf = WeakForm(V)
        from tpufem.forms.language import Coefficient, dot
        f = Coefficient(body_force, rank=1)
        wf.build(None, lambda v: dot(f, v))
        wf.dtype = dtype
        ecoords = jnp.asarray(mesh.element_coords(), dtype)
        be = wf.element_vectors(ecoords)
        from tpufem.assemble.dense import assemble_vector
        f_v = assemble_vector(V.dof_conn, be, V.num_dofs)
    else:
        f_v = jnp.zeros(V.num_dofs, dtype)

    # boundary velocity values at DOF coordinates
    if bc_velocity is not None:
        vals = np.asarray(bc_velocity(V.scalar_dof_coords))  # [nsd, d]
        u_bc_np = vals.reshape(-1)
        u_bc_np = np.where(np.asarray(V.dof_flags), u_bc_np, 0.0)
        u_bc = jnp.asarray(u_bc_np, dtype)
    else:
        u_bc = jnp.zeros(V.num_dofs, dtype)
    walls["build"] = time.perf_counter() - t0

    d = mesh.dim
    if velocity_precond == "amg":
        t0 = time.perf_counter()
        pw: dict = {}
        hier, perm, inv = build_velocity_amg(
            mesh, V, viscosity=viscosity, dtype=dtype, walls_out=pw,
            **(amg_kw or {}))
        walls["precond_setup"] = time.perf_counter() - t0
        walls["precond_setup_detail"] = {
            k: round(v, 2) for k, v in pw.items()}

        def solve_fn(f_v, u_bc, op, hp):
            b = op.rhs(f_v, u_bc)
            M = velocity_amg_precond(op, *hp, d)
            return minres(op.matvec, b, tol=tol, maxiter=maxiter,
                          M=M, check_every=check_every)

        args = (f_v, u_bc, op, (hier, perm, inv))
    else:
        def solve_fn(f_v, u_bc, op):
            b = op.rhs(f_v, u_bc)
            return minres(op.matvec, b, tol=tol, maxiter=maxiter,
                          M=op.precond, check_every=check_every)

        args = (f_v, u_bc, op)

    t0 = time.perf_counter()
    compiled = jax.jit(solve_fn).lower(*args).compile()
    walls["solve_compile"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = compiled(*args)
    jax.block_until_ready(res.x)
    walls["solve"] = time.perf_counter() - t0

    nv = V.num_dofs
    u = res.x[:nv]
    p = res.x[nv:]
    p = p - jnp.mean(p)
    return StokesSolution(u=u, p=p, res=res, V=V, Q=Q, walls=walls)
