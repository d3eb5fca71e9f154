"""Measure the build_amg setup wall at 1M rows on the host (VERDICT r4 #6).

Builds the same RCM-ordered 1M-row unstructured P1 system as
examples/unstructured_1m.py (CPU backend), then times build_amg for the
interval-W and greedy-banded(+strength) hierarchies.  Writes one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("TPUFEM_BAND_DISPATCH", "0")   # CPU probing: gather SpMV

import numpy as np
import jax.numpy as jnp

from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.amg import build_amg
from tpufem.solve.bc import apply_dirichlet_ell
from examples.unstructured_1m import rcm_renumber

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
t0 = time.perf_counter()
mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25, seed=0)
mesh = rcm_renumber(mesh)
pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8, with_sort_plan=False)
t_host = time.perf_counter() - t0

t0 = time.perf_counter()
ec = jnp.asarray(mesh.element_coords(), jnp.float32)
A = assemble_ell(pat, p1_stiffness(ec, P1Triangle()))
b = jnp.zeros(mesh.num_nodes, jnp.float32)
A, _ = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
jax.block_until_ready(A.data)
t_asm = time.perf_counter() - t0

out = {"metric": "amg_setup_wall", "rows": mesh.num_nodes,
       "host_setup_s": round(t_host, 1), "cpu_assemble_s": round(t_asm, 1)}
for label, kw in [("interval_W", dict(aggregation="interval", cycle="W")),
                  ("greedy_banded_s08",
                   dict(aggregation="greedy", strength=0.08))]:
    t0 = time.perf_counter()
    h = build_amg(A, **kw)
    out[label + "_setup_s"] = round(time.perf_counter() - t0, 1)
    out[label + "_levels"] = [int(lv.A.data.shape[0]) for lv in h.levels]
    out[label + "_opc"] = round(float(h.operator_complexity), 2)
    del h
print(json.dumps(out))
