"""Matrix-free Newton-Krylov (tpufem.solve.newton).

Semilinear model problem  -Δu + u³ = f  on (-3,3)², u = 0 on the
boundary, manufactured so the exact solution is the reference's
u* = (9-x²)(9-y²): f = (36 - 2(x²+y²)) + u*³.  Checks: (a) Newton
converges with the expected handful of outer steps and the discrete
solution carries O(h²) error; (b) the jvp-Jacobian matches a finite
difference of the residual; (c) quadratic convergence of the outer
residuals; (d) the preconditioned inner solve changes iteration counts,
not the answer.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import (element_load, element_nonlinear_load,
                                   p1_stiffness)
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.newton import newton_krylov


def _semilinear(n):
    """Residual closure for -Δu + u³ = f with symmetric BC projection."""
    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    element = P1Triangle()
    rule = triangle_rule(5)
    ec = jnp.asarray(mesh.element_coords())
    conn = jnp.asarray(mesh.conn)
    nn = mesh.num_nodes
    A = assemble_ell(pat, p1_stiffness(ec, element))   # unconstrained

    def exact(x):
        return (9.0 - x[..., 0] ** 2) * (9.0 - x[..., 1] ** 2)

    def f(x):
        return (36.0 - 2.0 * (x[..., 0] ** 2 + x[..., 1] ** 2)
                + exact(x) ** 3)

    b = assemble_vector(conn, element_load(ec, element, rule, f), nn)
    bc = jnp.asarray(mesh.node_flags != 0)

    def residual(u):
        # project to the interior subspace, assemble, project back; the
        # Jacobian is then identity ⊕ (interior J) — symmetric, CG-safe
        ui = jnp.where(bc, 0.0, u)
        nl = assemble_vector(
            conn, element_nonlinear_load(ec, element, rule, ui[conn],
                                         lambda w: w ** 3), nn)
        r = A.matvec(ui) + nl - b
        return jnp.where(bc, u, r)

    return mesh, residual, exact, A, bc


def test_newton_semilinear_converges_with_correct_physics():
    mesh, residual, exact, A, bc = _semilinear(48)
    res = newton_krylov(residual, jnp.zeros(mesh.num_nodes), tol=1e-10,
                        maxiter=20)
    assert bool(res.converged), float(res.residual_norm)
    assert int(res.iterations) <= 10, int(res.iterations)
    u = np.asarray(res.x)
    ue = exact(mesh.coords)
    err = float(np.sqrt(np.mean((u - ue) ** 2))
                / np.sqrt(np.mean(ue ** 2)))
    assert err < 30.0 / (48 * 48), err                 # O(h^2)


def test_jvp_jacobian_matches_finite_difference():
    mesh, residual, _, _, _ = _semilinear(10)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(mesh.num_nodes))
    v = jnp.asarray(rng.standard_normal(mesh.num_nodes))
    jv = np.asarray(jax.jvp(residual, (u,), (v,))[1])
    eps = 1e-6
    fd = (np.asarray(residual(u + eps * v))
          - np.asarray(residual(u - eps * v))) / (2 * eps)
    denom = max(1.0, np.abs(jv).max())
    assert np.abs(jv - fd).max() < 1e-6 * denom


def test_newton_quadratic_convergence():
    """Exact-Jacobian signature: with TIGHT inner solves, once in the
    basin each Newton step squares the residual norm (a wrong jvp
    degrades this to a fixed linear rate).  Steps taken manually so the
    inner tolerance stays at 1e-12 instead of the adaptive forcing."""
    from tpufem.solve.cg import cg as _cg

    mesh, residual, _, _, _ = _semilinear(24)
    u = jnp.zeros(mesh.num_nodes)
    norms = [float(jnp.linalg.norm(residual(u)))]
    for _ in range(12):
        r = residual(u)
        jmv = lambda v, u=u: jax.jvp(residual, (u,), (v,))[1]
        s = _cg(jmv, -r, tol=1e-12, maxiter=3000).x
        # damped outside the basin exactly like the production solver
        lam = 1.0
        for _ in range(40):
            rn_try = float(jnp.linalg.norm(residual(u + lam * s)))
            if np.isfinite(rn_try) and rn_try < norms[-1]:
                break
            lam *= 0.5
        u = u + lam * s
        norms.append(float(jnp.linalg.norm(residual(u))) + 1e-300)
        if norms[-1] < 1e-11 * norms[0]:
            break
    # quadratic tail: the final accepted full step must contract at
    # least ~quadratically relative to its predecessor
    drops = [norms[i + 1] / norms[i] for i in range(len(norms) - 1)]
    assert min(drops) < 1e-4, (norms, drops)
    assert norms[-1] < 1e-10 * norms[0], norms


def test_preconditioner_changes_iterations_not_answer():
    mesh, residual, _, A, bc = _semilinear(32)
    d = A.diagonal()
    inv_d = jnp.where(bc, 1.0, jnp.where(d != 0, 1.0 / d, 1.0))
    M = lambda r: r * inv_d
    r1 = newton_krylov(residual, jnp.zeros(mesh.num_nodes), tol=1e-10)
    r2 = newton_krylov(residual, jnp.zeros(mesh.num_nodes), tol=1e-10,
                       M=M)
    assert bool(r1.converged) and bool(r2.converged)
    # the preconditioner may shift the (inexact) Newton trajectory and
    # hence the exact inner counts — what it must NOT change is the
    # answer both converge to
    scale = float(np.abs(np.asarray(r1.x)).max())
    assert np.abs(np.asarray(r1.x)
                  - np.asarray(r2.x)).max() < 1e-7 * scale
