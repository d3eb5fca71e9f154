"""Explicit leapfrog dynamics (solve.dynamics).

The sharp invariant: central differences conserve the discrete energy
E_{n+1/2} = 1/2 v^T M v + 1/2 u_n^T K u_{n+1} EXACTLY for the undamped
linear problem — so its drift over hundreds of steps must sit at
float64 roundoff, validating mass lumping, the SpMV, BC masking and the
scan body all at once.  Accuracy is pinned against the separable
standing wave u = sin(pi x) sin(pi y) cos(sqrt(2) pi t) on the unit
square.
"""
import numpy as np
import jax.numpy as jnp

from tpufem.fem.space import FunctionSpace
from tpufem.forms.language import dot, grad
from tpufem.forms.weakform import WeakForm
from tpufem.mesh.rectangle import (perturbed_rectangle_mesh,
                                   rectangle_quad_mesh, unit_square_mesh)
from tpufem.solve.dynamics import leapfrog_wave, lumped_mass, stable_dt


def _setup(mesh):
    V = FunctionSpace(mesh, degree=1)
    K, _ = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v))).assemble(
        format="ell")
    mL = lumped_mass(V)
    mask = jnp.asarray(V.dof_flags)
    return V, K, mL, mask


def test_lumped_mass_preserves_volume():
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, 10, 10, jitter=0.2, seed=4)
    V = FunctionSpace(mesh, degree=1)
    np.testing.assert_allclose(float(lumped_mass(V).sum()), 36.0, rtol=1e-12)
    qmesh = rectangle_quad_mesh(0, 2, 0, 1, 5, 5)
    Vq = FunctionSpace(qmesh, degree=1)
    np.testing.assert_allclose(float(lumped_mass(Vq).sum()), 2.0, rtol=1e-12)


def test_energy_conservation_triangles():
    mesh = perturbed_rectangle_mesh(0, 1, 0, 1, 12, 12, jitter=0.2, seed=9)
    V, K, mL, mask = _setup(mesh)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(V.num_dofs))
    dt = stable_dt(K.matvec, mL)
    res = leapfrog_wave(K.matvec, mL, u0, jnp.zeros(V.num_dofs), dt,
                        steps=300, bc_mask=mask)
    e = np.asarray(res.energy)
    assert np.all(np.isfinite(e))
    drift = np.abs(e - e[0]).max() / abs(e[0])
    assert drift < 1e-10, f"energy drift {drift:.2e}"


def test_energy_conservation_quads():
    mesh = rectangle_quad_mesh(0, 1, 0, 1, 10, 10)
    V, K, mL, mask = _setup(mesh)
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.standard_normal(V.num_dofs))
    dt = stable_dt(K.matvec, mL)
    res = leapfrog_wave(K.matvec, mL, u0, jnp.zeros(V.num_dofs), dt,
                        steps=300, bc_mask=mask)
    e = np.asarray(res.energy)
    drift = np.abs(e - e[0]).max() / abs(e[0])
    assert drift < 1e-10, f"energy drift {drift:.2e}"


def test_standing_wave_accuracy():
    """One full period of the (1,1) mode: the returned state must line up
    with the initial condition to discretization error."""
    n = 24
    mesh = unit_square_mesh(n, n)
    V, K, mL, mask = _setup(mesh)
    c = mesh.coords
    u0 = jnp.asarray(np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))
    u0 = jnp.where(mask, 0.0, u0)
    omega = np.sqrt(2.0) * np.pi
    period = 2 * np.pi / omega
    dt_cap = stable_dt(K.matvec, mL)
    steps = int(np.ceil(period / min(dt_cap, period / 400)))
    dt = period / steps
    res = leapfrog_wave(K.matvec, mL, u0, jnp.zeros(V.num_dofs), dt,
                        steps=steps, bc_mask=mask)
    u = np.asarray(res.u)
    rel = np.linalg.norm(u - np.asarray(u0)) / np.linalg.norm(np.asarray(u0))
    # lumped-mass P1 dispersion at h = 1/24 — a few percent over a period
    assert rel < 0.05, f"period-return error {rel:.3f}"


def test_forcing_oscillates_around_static_solution():
    """Constant forcing from rest: the solution oscillates about the
    static solution K u = f, staying (in the K energy norm, where the
    shifted system conserves energy and kinetic energy is nonnegative)
    within the initial offset ||u_stat||_K of it — a rigorous bound the
    2-norm does not give."""
    mesh = unit_square_mesh(12, 12)
    V, K, mL, mask = _setup(mesh)
    f = jnp.where(mask, 0.0, jnp.ones(V.num_dofs))
    dt = stable_dt(K.matvec, mL)
    res = leapfrog_wave(K.matvec, mL, jnp.zeros(V.num_dofs),
                        jnp.zeros(V.num_dofs), dt, steps=2000,
                        bc_mask=mask, forcing=lambda t: f)
    from tpufem.solve.bc import apply_dirichlet_ell
    from tpufem.solve.cg import cg
    A, b = apply_dirichlet_ell(K, f, mask)
    stat = cg(A.matvec, b, tol=1e-12, maxiter=2000)
    u_stat = np.asarray(stat.x)

    def k_norm(w):
        wj = jnp.asarray(w)
        return float(jnp.vdot(wj, K.matvec(wj))) ** 0.5

    offset = k_norm(np.asarray(res.u) - u_stat)
    # small slack: the leapfrog-conserved quantity is the DISCRETE
    # energy, which differs from the continuous one at O(dt^2)
    assert offset <= 1.02 * k_norm(u_stat) + 1e-12, (offset, k_norm(u_stat))
    # and the motion is genuinely nontrivial (not stuck at zero)
    assert offset > 0.1 * k_norm(u_stat)
