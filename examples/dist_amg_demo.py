"""Distributed unstructured AMG demo: 8-way sharded W-cycle PCG.

Runs the full unstructured multi-chip pipeline on a virtual CPU mesh
(no TPU pod needed — the same code runs unchanged on real chips, where
the halo exchanges ride the ICI ring):

  1. perturbed, randomly-numbered triangle mesh (no stencil structure);
  2. host RCM renumbering -> banded system;
  3. generic ELL scatter assembly + Dirichlet BCs;
  4. build_dist_amg: interval-aggregation hierarchy, sharded so every
     transfer is shard-local (stripe heights are multiples of the
     aggregate stride);
  5. dist_amg_pcg: W-cycle-preconditioned CG fully inside shard_map —
     ppermute halos for every SpMV, psum dot products, one all_gather
     for the tiny dense coarsest solve.

    python examples/dist_amg_demo.py [--n 96] [--devices 8]

Reference anchor: the CUDA reference is single-GPU and stops at
assembling its unstructured ELL matrix
(/root/reference/fea_test_sm_sym_sparse2.cu:273-282) — no solver, no
multi-device path exists there.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96, help="mesh lines per side")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="virtual CPU mesh (default; --no-cpu runs on "
                    "the ambient TPU devices of a real pod)")
    args = ap.parse_args(argv)

    if args.cpu:
        # the flag is read once at backend init: make sure it requests at
        # least --devices virtual devices (replace a smaller preexisting
        # value, as __graft_entry__ does)
        import re
        xf = os.environ.get("XLA_FLAGS", "")
        m = re.search(r"--xla_force_host_platform_device_count=(\d+)", xf)
        if m is None or int(m.group(1)) < args.devices:
            xf = re.sub(r"--xla_force_host_platform_device_count=\d+",
                        "", xf)
            os.environ["XLA_FLAGS"] = (
                xf + f" --xla_force_host_platform_device_count="
                f"{args.devices}").strip()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < args.devices:
        raise SystemExit(f"need {args.devices} devices, have "
                         f"{len(jax.devices())}")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpufem.assemble.dense import assemble_vector
    from tpufem.assemble.ell import assemble_ell
    from tpufem.assemble.local import element_load, p1_stiffness
    from tpufem.dist.amg import build_dist_amg, dist_amg_pcg
    from tpufem.fem.elements import P1Triangle
    from tpufem.fem.quadrature import triangle_rule
    from tpufem.mesh.adjacency import ell_pattern
    from tpufem.mesh.rectangle import perturbed_rectangle_mesh
    from tpufem.solve.bc import apply_dirichlet_ell
    from tpufem.solve.poisson import model_problem_2d

    from examples.unstructured_1m import rcm_renumber

    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, args.n, args.n,
                                    jitter=0.25, seed=0)
    mesh = rcm_renumber(mesh)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    ec = jnp.asarray(mesh.element_coords())
    element = P1Triangle()
    A = assemble_ell(pat, p1_stiffness(ec, element))
    f, exact = model_problem_2d()
    b = assemble_vector(jnp.asarray(mesh.conn),
                        element_load(ec, element, triangle_rule(5), f),
                        mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))

    h = build_dist_amg(np.asarray(A.data), np.asarray(A.cols),
                       args.devices, coarse_n=max(300, args.n))
    print(f"# levels {[st.local_rows * args.devices for st in h.static]}"
          f" + coarse {h.coarse_inv.shape[0]}, halos"
          f" {[st.halo for st in h.static]}", file=sys.stderr)

    dmesh = Mesh(np.array(jax.devices()[:args.devices]), ("rows",))
    x, res = dist_amg_pcg(h, np.asarray(b), dmesh, tol=args.tol,
                          maxiter=100)

    u = np.asarray(x)
    ue = exact(mesh.coords)
    err = float(np.sqrt(np.mean((u - ue) ** 2))
                / np.sqrt(np.mean(ue ** 2)))
    print(json.dumps({
        "metric": "dist_amg_wcycle_pcg",
        "rows": mesh.num_nodes,
        "devices": args.devices,
        "pcg_iters": int(res.iterations),
        "relres": float(res.residual_norm),
        "converged": bool(res.converged),
        "rel_l2_error_vs_exact": err,
    }))
    if not bool(res.converged):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
