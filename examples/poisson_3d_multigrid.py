"""3D Poisson at scale with the MG-PCG fast path (BASELINE config 3+).

    python examples/poisson_3d_multigrid.py --n 64
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
    parser.add_argument("--n", type=int, default=32,
                        help="cells per side (dyadic-friendly, e.g. 32/64/96)")
    parser.add_argument("--tol", type=float, default=1e-6)
    parser.add_argument("--no-pallas", action="store_true")
    args = parser.parse_args(argv)
    log = RunLogger(stream=sys.stderr)
    use_pallas = not args.no_pallas

    n = args.n
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
    log.mesh_stats(mesh)

    t0 = time.perf_counter()
    levels = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float32,
                                     use_pallas=use_pallas)
    top = levels[0]
    log.log("hierarchy", levels=len(levels),
            seconds=time.perf_counter() - t0)

    X = jnp.asarray(element_coords_bt(mesh, np.float32))
    be = element_load_bt(X, "tetrahedron", tetrahedron_rule(3),
                         model_problem_3d_planes())
    b = assemble_vector_structured_bt(top.plan, be)
    b = jnp.where(top.bc_mask, 0, b)

    if use_pallas:
        mv = lambda v: stencil_matvec_embedded(
            top.data, v, top.plan, block_lead=top.block_lead)
    else:
        from tpufem.sparse.stencil import stencil_matvec
        mv = lambda v: stencil_matvec(top.data, top.plan.offsets, v)

    M = mg_preconditioner(levels, nu1=1, nu2=1, use_pallas=use_pallas)
    t0 = time.perf_counter()
    res = cg(mv, b, tol=args.tol, maxiter=100, M=M)
    res.x.block_until_ready()
    log.solve(res, seconds=time.perf_counter() - t0)

    _, exact = model_problem_3d()
    u = np.asarray(top.plan.extract_field(res.x))
    ue = exact(mesh.coords)
    rel = float(np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2)))
    print(f"dofs={mesh.num_nodes} mg_levels={len(levels)} "
          f"iters={int(res.iterations)} converged={bool(res.converged)} "
          f"rel_l2_err={rel:.3e}")
    return res


if __name__ == "__main__":
    main()
