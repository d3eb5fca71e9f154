"""BASELINE config 5 scale demo: >10M-DOF 3D Poisson on one chip.

The global matrix is never formed as an indexed sparse structure — the
stencil representation (60 B/row) plus the multigrid hierarchy keep the
whole 11.4M-DOF solve resident on a single v5e:

    python examples/poisson_10m.py            # n=224 -> 11,390,625 DOFs

Also demonstrates the strictly matrix-free operator (element-loop gather/
scatter, tpufem.sparse.matfree) on the same problem for capability parity,
at reduced size (gather-based paths are not the TPU fast path).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

import jax.numpy as jnp

from tpufem.assemble.planar import element_coords_bt, element_load_bt
from tpufem.assemble.structured import assemble_vector_structured_bt
from tpufem.fem.quadrature import tetrahedron_rule
from tpufem.mesh.box import box_mesh
from tpufem.ops.stencil_pallas import stencil_matvec_embedded
from tpufem.solve.cg import cg
from tpufem.solve.multigrid import build_poisson_multigrid, mg_preconditioner
from tpufem.solve.poisson import model_problem_3d, model_problem_3d_planes
from tpufem.utils.logging import RunLogger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=224)
    parser.add_argument("--tol", type=float, default=1e-6)
    args = parser.parse_args(argv)
    n = args.n
    log = RunLogger(stream=sys.stderr)

    t0 = time.perf_counter()
    levels = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float32)
    top = levels[0]
    log.log("hierarchy", levels=len(levels), dofs=(n + 1) ** 3,
            seconds=round(time.perf_counter() - t0, 1))

    mesh = box_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
    X = jnp.asarray(element_coords_bt(mesh, np.float32))
    be = element_load_bt(X, "tetrahedron", tetrahedron_rule(1),
                         model_problem_3d_planes())
    b = assemble_vector_structured_bt(top.plan, be)
    b = jnp.where(top.bc_mask, 0, b)
    del X, be

    mv = lambda v: stencil_matvec_embedded(top.data, v, top.plan,
                                           block_lead=top.block_lead)
    M = mg_preconditioner(levels, nu1=1, nu2=1)
    t0 = time.perf_counter()
    res = cg(mv, b, tol=args.tol, maxiter=60, M=M)
    res.x.block_until_ready()
    solve_s = time.perf_counter() - t0
    log.solve(res, seconds=round(solve_s, 3))

    _, exact = model_problem_3d()
    u = np.asarray(top.plan.extract_field(res.x))
    ue = exact(mesh.coords).astype(np.float32)
    rel = float(np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2)))
    print(f"dofs={mesh.num_nodes} levels={len(levels)} "
          f"iters={int(res.iterations)} converged={bool(res.converged)} "
          f"rel_l2_err={rel:.3e} solve_wall_s={solve_s:.2f}")


if __name__ == "__main__":
    main()
