"""Explicit structural dynamics: leapfrog (central-difference) stepping.

The TPU-idiomatic transient path: with a LUMPED mass matrix the explicit
update has no linear solve at all — each step is one SpMV plus
elementwise updates, and the whole time loop compiles into a single
``lax.scan`` program (zero host round-trips, in contrast to
examples/heat_equation.py's implicit host loop, and to the reference,
which has no time integration of any kind — static assembly only,
SURVEY.md §0).

Central differences conserve a DISCRETE energy exactly in exact
arithmetic (for the undamped linear problem with time-independent BCs):

    E_{n+1/2} = 1/2 v_{n+1/2}^T M v_{n+1/2} + 1/2 u_n^T K u_{n+1}

with v_{n+1/2} = (u_{n+1} - u_n)/dt.  ``leapfrog_wave`` returns this
trace, and tests/test_dynamics.py pins its drift at ~1e-12 — a whole-
pipeline invariant (mass lumping, SpMV, BC masking, scan) far stronger
than eyeballing waveforms.

Stability: dt < 2/sqrt(lambda_max(M^-1 K)); ``stable_dt`` estimates the
bound by power iteration.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["lumped_mass", "stable_dt", "leapfrog_wave", "WaveResult"]


def lumped_mass(space, dtype=jnp.float64):
    """Row-sum lumped mass vector [num_dofs] for any cell family.

    Row-sum lumping preserves total mass (sum = domain volume) and is
    the standard explicit-dynamics choice for P1/Q1 elements.  Routed
    through the WeakForm mass kernel, so it is correct on isoparametric
    quad/hex meshes too (per-quadrature-point |det J|).
    """
    from tpufem.assemble.dense import assemble_vector
    from tpufem.forms.weakform import WeakForm

    wf = WeakForm(space, dtype=dtype).build(lambda u, v: u * v)
    ecoords = jnp.asarray(space.mesh.element_coords(), dtype)
    Me = wf.element_matrices(ecoords)               # [NE, nd, nd]
    return assemble_vector(space.dof_conn, Me.sum(axis=2), space.num_dofs)


def stable_dt(matvec_K: Callable, m_lumped, *, iters: int = 50,
              safety: float = 0.9, seed: int = 0) -> float:
    """Safe explicit step: safety * 2 / sqrt(lambda_max(M_L^-1 K)).

    Power iteration on the symmetrized generalized problem; ``safety``
    absorbs the estimate's slack (power iteration approaches lambda_max
    from below, so keep safety < 1).
    """
    n = m_lumped.shape[0]
    inv_sqrt_m = 1.0 / jnp.sqrt(m_lumped)
    x = jax.random.normal(jax.random.PRNGKey(seed), (n,), m_lumped.dtype)

    def body(x, _):
        y = inv_sqrt_m * matvec_K(inv_sqrt_m * x)
        lam = jnp.vdot(x, y) / jnp.vdot(x, x)
        return y / jnp.linalg.norm(y), lam

    _, lams = jax.lax.scan(body, x / jnp.linalg.norm(x), None, length=iters)
    lam_max = float(lams[-1])
    return float(safety * 2.0 / jnp.sqrt(lam_max))


class WaveResult(NamedTuple):
    u: jax.Array          # displacement at t = steps*dt
    v: jax.Array          # midpoint velocity (u_N - u_{N-1})/dt
    energy: jax.Array     # [steps-1] discrete energy trace E_{n+1/2}


def leapfrog_wave(matvec_K: Callable, m_lumped, u0, v0, dt: float,
                  steps: int, *, bc_mask=None,
                  forcing: Optional[Callable] = None) -> WaveResult:
    """Integrate M u'' + K u = f with central differences, one lax.scan.

    ``matvec_K``: the stiffness operator (ELLMatrix.matvec, a stencil
    operator, or any matrix-free callable).  ``m_lumped``: lumped mass
    vector.  ``bc_mask``: True at homogeneous-Dirichlet DOFs (kept at
    zero).  ``forcing``: optional ``f(t) -> [n]`` load vector, traced
    into the scan body.

    Jit this whole function (it is jittable end to end) or call it
    inside a jitted driver; the scan unrolls to ONE compiled program of
    ``steps`` SpMVs — the time loop never touches the host.
    """
    dtype = m_lumped.dtype
    u0 = jnp.asarray(u0, dtype)
    v0 = jnp.asarray(v0, dtype)
    inv_m = 1.0 / m_lumped
    if bc_mask is not None:
        mask = jnp.asarray(bc_mask, bool)
        zero = jnp.zeros((), dtype)
        u0 = jnp.where(mask, zero, u0)
        v0 = jnp.where(mask, zero, v0)

    def accel_from(Ku, t):
        f = forcing(t) if forcing is not None else 0.0
        a = inv_m * (f - Ku)
        if bc_mask is not None:
            a = jnp.where(mask, jnp.zeros((), dtype), a)
        return a

    # Taylor start-up: u_1 = u_0 + dt v_0 + dt^2/2 a_0 keeps the scheme
    # second order from the first step.
    u1 = u0 + dt * v0 + 0.5 * dt * dt * accel_from(matvec_K(u0), 0.0)
    if bc_mask is not None:
        u1 = jnp.where(mask, jnp.zeros((), dtype), u1)

    # K u_n rides the carry: the energy trace's K u_{n+1} is exactly the
    # next step's stiffness term, so the transient loop pays ONE SpMV per
    # step (plus one start-up SpMV for K u_1), not two.
    Ku1 = matvec_K(u1)

    def step(carry, n):
        u_prev, u, Ku = carry
        t = n.astype(dtype) * dt
        u_next = 2.0 * u - u_prev + dt * dt * accel_from(Ku, t)
        if bc_mask is not None:
            u_next = jnp.where(mask, jnp.zeros((), dtype), u_next)
        Ku_next = matvec_K(u_next)
        v_half = (u_next - u) / dt
        energy = 0.5 * jnp.vdot(v_half, m_lumped * v_half) \
            + 0.5 * jnp.vdot(u, Ku_next)
        return (u, u_next, Ku_next), energy

    # start-up already produced u_1 (one dt increment); steps - 1 scan
    # iterations take the state to u_N with T = steps * dt.
    (u_prev_final, u_final, _), energy = jax.lax.scan(
        step, (u0, u1, Ku1), jnp.arange(1, steps))
    v_final = (u_final - u_prev_final) / dt
    return WaveResult(u=u_final, v=v_final, energy=energy)
