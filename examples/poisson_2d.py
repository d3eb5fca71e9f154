"""2D Poisson via the weak-form frontend — the reference's user program,
TPU-native (parity: /root/reference/fea_symbolic.cu:484-507 main()).

    python examples/poisson_2d.py --cells 64 --format stencil
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpufem import FunctionSpace, RectangleMesh
from tpufem.config import add_cli_args, from_cli
from tpufem.forms.language import SpatialCoordinate, dot, grad
from tpufem.forms.weakform import WeakForm
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.precond import jacobi
from tpufem.utils.logging import RunLogger


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_cli_args(parser)
    args = parser.parse_args(argv)
    prob, solcfg = from_cli(args)
    log = RunLogger(stream=sys.stderr)

    n = prob.cells[0]
    mesh = RectangleMesh(-3.0, 3.0, -3.0, 3.0, n, n)
    log.mesh_stats(mesh)

    # user weak form — same shape as the reference's GiNaC lambdas
    V = FunctionSpace(mesh, "Lagrange", prob.degree)
    X = SpatialCoordinate(V)
    f = -2 * (X[0] * X[0] + X[1] * X[1]) + 36
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: f * v)

    t0 = time.perf_counter()
    A, b = wf.assemble(format="ell")
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))
    log.assembly(num_dofs=V.num_dofs, seconds=time.perf_counter() - t0,
                 format="ell")

    M = jacobi(A) if solcfg.preconditioner == "jacobi" else None
    t0 = time.perf_counter()
    res = cg(A.matvec, b, tol=solcfg.tol, maxiter=solcfg.maxiter, M=M)
    res.x.block_until_ready()
    log.solve(res, seconds=time.perf_counter() - t0)

    _, exact = model_problem_2d()
    if prob.degree == 1:
        ue = exact(mesh.coords)
        err = float(np.sqrt(np.mean((np.asarray(res.x) - ue) ** 2)))
        print(f"dofs={V.num_dofs} iters={int(res.iterations)} "
              f"converged={bool(res.converged)} nodal_rms_err={err:.3e}")
    return res


if __name__ == "__main__":
    main()
