"""Transient heat equation: mass + stiffness forms, implicit Euler stepping.

Demonstrates capabilities beyond the reference's static assembly: mass
matrices from the same weak-form frontend, repeated solves with CG
warm-starting from the previous step, and checkpoint/resume.

    python examples/heat_equation.py --cells 32 --steps 20
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpufem import FunctionSpace, RectangleMesh
from tpufem.forms.language import SpatialCoordinate, dot, grad
from tpufem.forms.weakform import WeakForm
from tpufem.io.checkpoint import save_solution
from tpufem.mesh.adjacency import ell_pattern
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.precond import jacobi
from tpufem.sparse.ell import ELLMatrix


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cells", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--checkpoint", default="")
    args = parser.parse_args(argv)

    mesh = RectangleMesh(-3.0, 3.0, -3.0, 3.0, args.cells, args.cells)
    V = FunctionSpace(mesh, "Lagrange", 1)
    pattern = ell_pattern(V.dof_conn, V.num_dofs, pad_to=8)

    # stiffness K and mass M from the same frontend
    wf_k = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)))
    wf_m = WeakForm(V).build(lambda u, v: u * v)
    Kmat, _ = wf_k.assemble(format="ell", pattern=pattern)
    Mmat, _ = wf_m.assemble(format="ell", pattern=pattern)

    # system matrix A = M + dt K (same sparsity pattern -> data add)
    A = ELLMatrix(Mmat.data + args.dt * Kmat.data, Kmat.cols,
                  Kmat.row_lengths, Kmat.diag_pos)
    mask = jnp.asarray(V.dof_flags)
    b0 = jnp.zeros(V.num_dofs)
    A_bc, _ = apply_dirichlet_ell(A, b0, mask)
    M_pre = jacobi(A_bc)

    # initial condition: hot blob
    c = mesh.coords
    u = jnp.asarray(np.exp(-((c[:, 0]) ** 2 + (c[:, 1]) ** 2)))
    u = jnp.where(mask, 0.0, u)

    @jax.jit
    def step(u):
        rhs = Mmat.matvec(u)
        rhs = jnp.where(mask, 0.0, rhs)
        res = cg(A_bc.matvec, rhs, x0=u, tol=1e-10, maxiter=2000, M=M_pre)
        return res.x, res.iterations, res.residual_norm

    energy0 = float(Mmat.matvec(u) @ u)
    t0 = time.perf_counter()
    total_iters = 0
    for s in range(args.steps):
        u, iters, rn = step(u)
        total_iters += int(iters)
    u.block_until_ready()
    energy = float(Mmat.matvec(u) @ u)
    print(f"dofs={V.num_dofs} steps={args.steps} dt={args.dt} "
          f"cg_iters_total={total_iters} "
          f"L2^2 {energy0:.4f} -> {energy:.4f} (decaying: "
          f"{energy < energy0}) wall={time.perf_counter() - t0:.2f}s")

    if args.checkpoint:
        save_solution(args.checkpoint, u, iterations=args.steps,
                      residual_norm=float(rn))
        print(f"checkpointed final state to {args.checkpoint}")
    return u


if __name__ == "__main__":
    main()
