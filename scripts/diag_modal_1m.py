"""Bisect the modal-1M runtime device fault (BENCH_NOTES r5 phase F3).

The full subspace-iteration program faults with `UNAVAILABLE: TPU device
error` at 1,002,001 DOFs but passes at 491,401.  Every ingredient is run
here as its own jitted program, in increasing-complexity order, so the
first stage to fault names the kernel.  Stages:

  A  fine-level banded multi-RHS SpMV        (ell_matvec_pallas_multi, q=8)
  B  AMG multi-RHS V-cycle                   (hier.apply_multi)
  C  fp64 gather multi-RHS SpMV              (ell_matvec_multi on f64 data)
  D  batched inner CG, 20 iters              (cg_fixed_block + B as M_multi)
  E  fp64 Gram + fp32 Cholesky/eigh ritz     (the dense-small tail)
  F  one full outer iteration                (smallest_eigenpairs outer=1)

Usage: python scripts/diag_modal_1m.py [--n 1000] [--stages ABCDEF]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--stages", default="ABCDEF")
    ap.add_argument("--q", type=int, default=8)
    args = ap.parse_args()
    jax.config.update("jax_enable_x64", True)

    from examples.unstructured_1m import rcm_renumber
    from tpufem.assemble.dense import assemble_vector
    from tpufem.assemble.ell import assemble_ell
    from tpufem.assemble.local import element_mass, p1_stiffness
    from tpufem.fem.elements import P1Triangle
    from tpufem.fem.quadrature import triangle_rule
    from tpufem.mesh.adjacency import ell_pattern
    from tpufem.mesh.rectangle import perturbed_rectangle_mesh
    from tpufem.solve.bc import apply_dirichlet_ell
    from tpufem.sparse.ell import ELLMatrix, ell_matvec_multi

    n, q = args.n, args.q
    t0 = time.perf_counter()
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25, seed=0)
    mesh = rcm_renumber(mesh)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    nn = mesh.num_nodes
    log(f"# {nn} DOFs, host {time.perf_counter()-t0:.1f}s")

    element = P1Triangle()
    rule = triangle_rule(5)
    ec = jnp.asarray(mesh.element_coords(), jnp.float64)
    conn = jnp.asarray(mesh.conn)
    bc = jnp.asarray(mesh.node_flags != 0)
    A = assemble_ell(pat, p1_stiffness(ec, element))
    A, _ = apply_dirichlet_ell(A, jnp.zeros(nn, ec.dtype), bc)
    Me = element_mass(ec, element, rule)
    mL = jnp.where(bc, 1.0, assemble_vector(conn, Me.sum(-1), nn))
    data64 = A.data
    A = ELLMatrix(A.data.astype(jnp.float32), A.cols,
                  A.row_lengths, A.diag_pos)
    A.resolve_band()
    jax.block_until_ready(A.data)
    log(f"# assembled, band resolved, total {time.perf_counter()-t0:.1f}s")

    rng = jax.random.PRNGKey(0)
    X32 = jax.random.normal(rng, (nn, q), jnp.float32)
    X64 = X32.astype(jnp.float64)

    def stage(name, fn, *a):
        t = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn)(*a))
        leaf = jax.tree_util.tree_leaves(out)[0]
        log(f"stage {name}: OK {time.perf_counter()-t:.1f}s "
            f"|out|={float(jnp.abs(leaf).max()):.3e}")

    if "A" in args.stages:
        stage("A matvec_multi fp32 banded", lambda A, X: A.matvec_multi(X),
              A, X32)

    hier = None
    if set("BDF") & set(args.stages):
        from tpufem.solve.amg import build_amg
        t = time.perf_counter()
        hier = build_amg(A, strength=0.08)
        log(f"# AMG levels {[lv.A.data.shape[0] for lv in hier.levels]} "
            f"setup {time.perf_counter()-t:.1f}s")
    if "B" in args.stages:
        stage("B apply_multi V-cycle", lambda h, X: h.apply_multi(X),
              hier, X32)
    if "C" in args.stages:
        stage("C fp64 gather multi", ell_matvec_multi, data64, A.cols, X64)
    if "D" in args.stages:
        from tpufem.solve.cg import cg_fixed_block
        stage("D cg_fixed_block 20it",
              lambda A, h, X: cg_fixed_block(
                  A.matvec_multi, X, 20, M_multi=h.apply_multi)[0],
              A, hier, X32)
    if "E" in args.stages:
        def ritz_tail(Y, AY, mL):
            Ah = (Y.T @ AY).astype(jnp.float32)
            Mh = (Y.T @ (mL[:, None] * Y)).astype(jnp.float32)
            eps = jnp.finfo(jnp.float32).eps
            L = jnp.linalg.cholesky(
                0.5 * (Mh + Mh.T)
                + 100.0 * eps * jnp.trace(Mh) * jnp.eye(q, dtype=jnp.float32))
            Li = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(q, dtype=jnp.float32), lower=True)
            w, V = jnp.linalg.eigh(Li @ (0.5 * (Ah + Ah.T)) @ Li.T)
            return w, Y @ (Li.T @ V).astype(Y.dtype)
        AY64 = jax.jit(ell_matvec_multi)(data64, A.cols, X64)
        stage("E fp64 gram + fp32 ritz", ritz_tail, X64, AY64,
              mL.astype(jnp.float64))
    if "F" in args.stages:
        from tpufem.solve.eigen import smallest_eigenpairs
        stage("F one outer iteration",
              lambda A, mLa, bca, h, d64: smallest_eigenpairs(
                  A.matvec, nn, 5, lumped_mass=mLa, M=h.apply, bc_mask=bca,
                  inner_iters=20, outer_iters=1, buffer=3,
                  dtype=jnp.float32, matvec_multi=A.matvec_multi,
                  M_multi=h.apply_multi,
                  matvec_hi_multi=lambda X: ell_matvec_multi(
                      d64, A.cols, X)),
              A, mL, bc, hier, data64)
    log("ALL REQUESTED STAGES DONE")


if __name__ == "__main__":
    main()
