"""Generic (indexed-sparse) assembly at the reference's largest scale.

The reference's COO variant assembles 20M triangle elements over a
10,011,001-node 10000x1000 rectangle and stops — its triplets are never
even reduced (/root/reference/fea_test_sm_sym_sparse.cu:14-19,244-254).
This example runs the *deduplicating* generic scatter path
(tpufem.assemble.ell, precomputed-slot scatter-add — the TPU answer to
that kernel's atomicAdd) at the same scale on one chip, streaming the
element batch through device-side chunks so peak HBM stays bounded
(VERDICT.md r2 item 6: "bucketing/streaming rather than OOM").

Golden check: the assembled operator has exact zero row sums before BC
application (pure-Neumann stiffness annihilates constants) — the
numerically-checked analogue of the reference's CPU-vs-GPU reduction
compare (/root/reference/atomicadd.cu:53-56).

    python examples/generic_assembly_20m.py [--nx 10000 --ny 1000]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.local import p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import rectangle_mesh


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=10000)
    ap.add_argument("--ny", type=int, default=1000)
    ap.add_argument("--chunks", type=int, default=8,
                    help="element-batch streaming chunks")
    ap.add_argument("--method", choices=["scatter", "sort", "both"],
                    default="both",
                    help="scatter = flat .at[].add; sort = plan-time "
                    "chunk-local slot sort + device gather + sorted "
                    "segment_sum (amortizes the sort into the host plan)")
    args = ap.parse_args(argv)

    t0 = time.perf_counter()
    mesh = rectangle_mesh(-3.0, 3.0, -3.0, 3.0, args.ny, args.nx)
    t_mesh = time.perf_counter() - t0
    ne, nn = mesh.num_elements, mesh.num_nodes
    print(f"# mesh: {ne} elements, {nn} nodes ({t_mesh:.1f}s)",
          file=sys.stderr)

    t0 = time.perf_counter()
    pat = ell_pattern(mesh.conn, nn, pad_to=8, with_sort_plan=False)
    t_pat = time.perf_counter() - t0
    K = pat.cols.shape[1]
    print(f"# pattern: width {K}, nnz {pat.nnz} ({t_pat:.1f}s)",
          file=sys.stderr)

    element = P1Triangle()
    ecoords = mesh.element_coords()                    # [NE, 3, 2] host
    slots = pat.slots.reshape(ne, 9)

    nc = args.chunks
    csz = -(-ne // nc)
    pad = nc * csz - ne
    if pad:
        # pad with repeats of the last element, slots redirected to a
        # dummy tail slot so duplicates cancel nowhere real
        ecoords = np.concatenate([ecoords, np.repeat(
            ecoords[-1:], pad, axis=0)])
        slots = np.concatenate(
            [slots, np.full((pad, 9), nn * K, np.int32)])
    flat_size = nn * K + 1                              # +1 dummy slot

    @functools.partial(jax.jit, donate_argnums=0)
    def add_chunk(flat, ec, sl):
        Ke = p1_stiffness(ec, element)                  # [C, 3, 3]
        return flat.at[sl.reshape(-1)].add(Ke.reshape(-1))

    # slot-sorted variant: the chunk's 9C entries are sorted by target slot
    # ON THE HOST at plan time (amortized across assemblies); the device
    # then does one take-along-axis gather + a sorted segment_sum — the
    # canonical deterministic TPU reduction, no scatter op at all.
    @functools.partial(jax.jit, donate_argnums=0)
    def add_chunk_sorted(flat, ec, perm, seg):
        Ke = p1_stiffness(ec, element).reshape(-1)
        contrib = jax.ops.segment_sum(Ke[perm], seg,
                                      num_segments=flat_size,
                                      indices_are_sorted=True)
        return flat + contrib

    t0 = time.perf_counter()
    plans = []
    if args.method in ("sort", "both"):
        for c in range(nc):
            sl = slots[c * csz:(c + 1) * csz].reshape(-1)
            p = np.argsort(sl, kind="stable")
            plans.append((p.astype(np.int32), sl[p]))
    t_plan = time.perf_counter() - t0

    def assemble_once(method):
        flat = jnp.zeros(flat_size, jnp.float32)
        for c in range(nc):
            ec = jnp.asarray(ecoords[c * csz:(c + 1) * csz], jnp.float32)
            if method == "sort":
                pm, sg = plans[c]
                flat = add_chunk_sorted(flat, ec, jnp.asarray(pm),
                                        jnp.asarray(sg))
            else:
                sl = jnp.asarray(slots[c * csz:(c + 1) * csz])
                flat = add_chunk(flat, ec, sl)
        flat.block_until_ready()
        return flat

    prim = "sort" if args.method == "sort" else "scatter"
    t0 = time.perf_counter()
    flat = assemble_once(prim)                          # compile + H2D
    t_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    flat = assemble_once(prim)                          # steady state
    t_asm = time.perf_counter() - t0

    t_sort = None
    if args.method == "both":
        flat_s = assemble_once("sort")                  # compile + H2D
        # golden: both reductions assemble the same operator
        dmax = float(jnp.abs(flat_s - flat).max())
        assert dmax <= 1e-4 * float(jnp.abs(flat).max()), dmax
        t0 = time.perf_counter()
        assemble_once("sort")
        t_sort = time.perf_counter() - t0

    # Reference-parity phase: the CUDA kernel at this scale only COMPUTES
    # the 9 values per element and stores raw triplets — the duplicate
    # reduction is "deferred" to a host step that does not exist
    # (/root/reference/fea_test_sm_sym_sparse.cu:244-254).  Time that exact
    # work separately: element kernels + streaming the 180M values out.
    @jax.jit
    def emit_chunk(ec):
        return p1_stiffness(ec, element)

    ecs = [jnp.asarray(ecoords[c * csz:(c + 1) * csz], jnp.float32)
           for c in range(nc)]
    for ec in ecs:
        ec.block_until_ready()

    def emit_once():
        outs = [emit_chunk(ec) for ec in ecs]
        for o in outs:
            o.block_until_ready()
        return outs

    emit_once()                                         # compile
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        emit_once()
        samples.append(time.perf_counter() - t0)
    t_emit = min(samples)
    emit_bytes = ne * (6 + 9) * 4                       # coords in, Ke out
    # sanity: a reading under the HBM stream floor is a timing artifact
    emit_floor = emit_bytes / 819e9
    emit_valid = t_emit >= emit_floor

    data = flat[:-1].reshape(nn, K)
    # golden: stiffness row sums are exactly 0 (constants in the kernel)
    row_sum = jnp.abs(data.sum(axis=1)).max()
    scale = jnp.abs(data).max()
    rel = float(row_sum) / float(scale)

    # HBM traffic estimate: coords in + slots in + values scattered
    bytes_moved = ne * (6 * 4 + 9 * 4 + 9 * 4)
    out = {
        "metric": "generic_scatter_assembly_20m",
        "elements": ne,
        "rows": nn,
        "ell_width": K,
        "chunks": nc,
        "assemble_s": round(t_asm, 3),
        "elements_per_sec": round(ne / t_asm, 0),
        "effective_gbs": round(bytes_moved / t_asm / 1e9, 1),
        "hbm_sol_fraction": round(bytes_moved / t_asm / 1e9 / 819.0, 3),
        # slot-sorted segment-sum A/B (plan-time host sort, device gather +
        # sorted segment_sum).  Roofline bound for this shape on v5e: the
        # device must move >= 9*NE*(4 vals + 4 perm + 4 gathered) bytes +
        # 2*4*rows*K segment writes/reads ~ 2.8 GB -> >= 3.4 ms at 819
        # GB/s, i.e. <= ~5.9e9 elem/s — anything past that needs fusing
        # the element kernel into the reduction (the structured path).
        "sort_assemble_s": round(t_sort, 3) if t_sort is not None else None,
        "sort_elements_per_sec": (round(ne / t_sort, 0)
                                  if t_sort is not None else None),
        # reference-parity phase: element kernels + raw values out, NO
        # duplicate reduction — exactly what the CUDA kernel at this scale
        # does (/root/reference/fea_test_sm_sym_sparse.cu:244-254)
        "emit_only_s": round(t_emit, 3),
        "emit_samples_s": [round(s, 3) for s in samples],
        "emit_valid": emit_valid,
        "emit_elements_per_sec": round(ne / t_emit, 0),
        "emit_hbm_sol_fraction": round(
            emit_bytes / t_emit / 1e9 / 819.0, 3),
        "max_rel_row_sum": rel,
        "walls_s": {"mesh": round(t_mesh, 1), "pattern": round(t_pat, 1),
                    "sort_plan": round(t_plan, 1),
                    "first_pass": round(t_wall, 1)},
        "peak_device_bytes_est": int(flat_size * 4 + csz * (6 + 9 + 9) * 4),
    }
    print(json.dumps(out))
    assert rel < 1e-5, f"row-sum golden check failed: {rel}"


if __name__ == "__main__":
    main()
