"""BASELINE config 5 scale demo: 10M-57M-DOF 3D Poisson on one chip.

The global matrix is never formed as an indexed sparse structure — the
stencil representation (60 B/row) plus the constant-coefficient multigrid
hierarchy (no coefficient planes at any level) keep solves up to 57M DOFs
resident on a single v5e; the finest-level operator is built on-device by
the fused Pallas kernel so setup never materializes element arrays, past
~300^3 the stencil kernels switch to their (Bz, By)-blocked variants
(ops.stencil_pallas `_needs_2d`) because a full minor plane no longer fits
VMEM, and the solve donates the RHS buffer (solve_poisson_fast) — at the
ceiling that one plane is the margin against HBM exhaustion:

    python examples/poisson_10m.py            # n=224 -> 11,390,625 DOFs
    python examples/poisson_10m.py --n 320    # -> 33,076,161 DOFs
    python examples/poisson_10m.py --n 384    # -> 57,066,625 DOFs
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import jax.numpy as jnp

from tpufem.solve.multigrid import _light_grid
from tpufem.solve.poisson import model_problem_3d, model_problem_3d_planes
from tpufem.solve.structured_fast import solve_poisson_fast


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=224)
    parser.add_argument("--tol", type=float, default=1e-5)
    args = parser.parse_args(argv)

    sol = solve_poisson_fast((-3.0, 3.0), args.n,
                             model_problem_3d_planes(), tol=args.tol)

    _, exact = model_problem_3d()
    _, coords_grid, _ = _light_grid((-3.0, 3.0), args.n, 3)
    coords = np.moveaxis(coords_grid, 0, -1).reshape(-1, 3)
    ue = exact(coords).astype(np.float32)
    u = np.asarray(sol.u)
    rel = float(np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2)))
    print(f"dofs={sol.num_dofs} iters={int(sol.cg.iterations)} "
          f"converged={bool(sol.cg.converged)} rel_l2_err={rel:.3e} "
          f"phases={sol.phases_s}")


if __name__ == "__main__":
    main()
