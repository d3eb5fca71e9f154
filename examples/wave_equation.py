"""Explicit wave equation: lumped-mass leapfrog, the whole time loop on-device.

    python examples/wave_equation.py --cells 64 --periods 2

One jitted lax.scan program integrates M u'' + K u = 0 for hundreds of
steps with zero host round-trips — each step is one ELL SpMV plus
elementwise updates (solve.dynamics).  Prints the discrete-energy drift
(should be ~1e-12: central differences conserve it exactly) and the
period-return error of the (1,1) standing mode.

The reference has no time integration (static assembly only,
/root/reference: SURVEY.md §0); this is a capability layer above it.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpufem import FunctionSpace, unit_square_mesh
from tpufem.forms.language import dot, grad
from tpufem.forms.weakform import WeakForm
from tpufem.solve.dynamics import leapfrog_wave, lumped_mass, stable_dt


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cells", type=int, default=64)
    parser.add_argument("--periods", type=float, default=1.0)
    parser.add_argument("--steps-per-period", type=int, default=0,
                        help="0 = as many as CFL requires")
    args = parser.parse_args(argv)

    mesh = unit_square_mesh(args.cells, args.cells)
    V = FunctionSpace(mesh, degree=1)
    K, _ = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v))).assemble(
        format="ell")
    mL = lumped_mass(V)
    mask = jnp.asarray(V.dof_flags)

    c = mesh.coords
    u0 = jnp.asarray(np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1]))
    u0 = jnp.where(mask, 0.0, u0)

    omega = np.sqrt(2.0) * np.pi
    period = 2 * np.pi / omega
    dt_cap = stable_dt(K.matvec, mL)
    spp = args.steps_per_period or int(np.ceil(period / dt_cap))
    steps = int(round(spp * args.periods))
    dt = args.periods * period / steps

    # K/mL/mask ride the jit boundary as ARGUMENTS — a closure-captured
    # ELLMatrix is baked into the lowered HLO as constants (~50 MB at
    # 1M DOFs, minutes of lowering; BENCH_NOTES r4)
    run = jax.jit(lambda K, mL, mask, u: leapfrog_wave(
        K.matvec, mL, u, jnp.zeros(V.num_dofs), dt, steps=steps,
        bc_mask=mask))
    res = run(K, mL, mask, u0)          # compile + run
    res.u.block_until_ready()
    t0 = time.perf_counter()
    res = run(K, mL, mask, u0)
    res.u.block_until_ready()
    wall = time.perf_counter() - t0

    e = np.asarray(res.energy)
    drift = float(np.abs(e - e[0]).max() / abs(e[0]))
    rel = float(np.linalg.norm(np.asarray(res.u) - np.asarray(u0))
                / np.linalg.norm(np.asarray(u0)))
    print(f"dofs={V.num_dofs} steps={steps} dt={dt:.3e} "
          f"energy_drift={drift:.2e} period_return_err={rel:.4f} "
          f"wall={wall:.3f}s ({steps / wall:.0f} steps/s)")
    return res


if __name__ == "__main__":
    main()
