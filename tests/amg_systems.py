"""Shared AMG test systems, built once per pytest process.

The same (kind, n) system is assembled by several tests across
``test_amg.py`` and ``test_amg_scaling.py``; assembly + RCM reordering at
n=160 costs CPU-seconds each, so the builders are ``lru_cache``d.  All
returned arrays are used strictly read-only by the tests (the Dirichlet
projection is applied inside the builder, never mutated after).

Not a test module (no ``test_`` prefix) — pytest does not collect it.
"""
from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.poisson import model_problem_2d


@lru_cache(maxsize=None)
def p1_system(n, seed=0):
    """RCM-reordered perturbed P1 Poisson ELL system on an n x n square.

    Returns (mesh, A, b, exact) — the model problem every AMG test
    preconditions.
    """
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25,
                                    seed=seed)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    perm = reverse_cuthill_mckee(pat.cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    mesh = Mesh(coords=np.ascontiguousarray(mesh.coords[perm]),
                conn=inv[mesh.conn].astype(mesh.conn.dtype),
                node_flags=np.ascontiguousarray(mesh.node_flags[perm]),
                cell_type=mesh.cell_type)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    ec = jnp.asarray(mesh.element_coords())
    element = P1Triangle()
    A = assemble_ell(pat, p1_stiffness(ec, element))
    f, exact = model_problem_2d()
    b = assemble_vector(jnp.asarray(mesh.conn),
                        element_load(ec, element, triangle_rule(5), f),
                        mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
    return mesh, A, b, exact


@lru_cache(maxsize=None)
def p2_system(n):
    """RCM-reordered P2 Poisson ELL system on an n x n rectangle."""
    from tpufem.fem.space import FunctionSpace
    from tpufem.forms.language import SpatialCoordinate, dot, grad
    from tpufem.forms.weakform import WeakForm
    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.sparse.ell import ELLMatrix, reorder_ell

    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    V = FunctionSpace(mesh, degree=2)
    X = SpatialCoordinate(V)
    f = 36 - 2 * (X[0] ** 2 + X[1] ** 2)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: f * v)
    A, b = wf.assemble(format="ell")
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))
    perm = reverse_cuthill_mckee(np.asarray(A.cols))
    data_p, cols_p = reorder_ell(np.asarray(A.data), np.asarray(A.cols),
                                 perm)
    return (ELLMatrix(jnp.asarray(data_p), jnp.asarray(cols_p)),
            jnp.asarray(np.asarray(b)[perm]))
