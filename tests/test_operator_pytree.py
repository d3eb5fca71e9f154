"""Operators THROUGH the jit boundary: no baked constants, fast path kept.

Round-4 regression for the HLO-size failure class (BENCH_NOTES r4): a
closure-captured ELLMatrix / AMG hierarchy bakes its arrays into the
lowered module as literal constants — at 1M rows that meant ~300 MB
modules, 415 s lowering, and HTTP 413 from the axon compile relay.  The
fix is the pytree protocol of sparse/ell.py (banded-plan arrays as
children, static plan as aux_data) plus the custom AMGLevel/AMGHierarchy
registration in solve/amg.py.  These tests pin:

  * a band-resolved ELLMatrix keeps its Pallas plan across the boundary,
    the jaxpr carries ZERO constant bytes, and results are bit-identical
    to the closure path;
  * an AMGHierarchy passes through jit as an argument with static scalar
    config, its W-cycle agreeing exactly with the closure application;
  * flatten/unflatten roundtrips preserve the band state.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpufem.assemble.ell import assemble_ell, ell_values_scatter
from tpufem.assemble.local import p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.sparse.ell import ELLMatrix


def _banded_system(n=24, seed=0):
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.2,
                                    seed=seed)
    cols = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8,
                       with_sort_plan=False).cols
    perm = reverse_cuthill_mckee(cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    mesh = Mesh(coords=np.ascontiguousarray(mesh.coords[perm]),
                conn=inv[mesh.conn].astype(mesh.conn.dtype),
                node_flags=np.ascontiguousarray(mesh.node_flags[perm]),
                cell_type=mesh.cell_type)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8,
                      with_sort_plan=False)
    ec = jnp.asarray(mesh.element_coords(), jnp.float32)
    Ke = p1_stiffness(ec, P1Triangle())
    A = assemble_ell(pat, Ke)
    # make it SPD-ish for AMG (shift the pure-Neumann stiffness)
    rows = jnp.arange(A.data.shape[0])
    data = A.data.at[rows, A.diag_pos].add(1.0)
    A = ELLMatrix(data.astype(jnp.float32), A.cols, A.row_lengths,
                  A.diag_pos)
    return A, pat


def _consts_bytes(traced_jaxpr):
    return sum(np.asarray(c).nbytes for c in traced_jaxpr.consts)


def test_ellmatrix_band_through_jit_zero_consts():
    A, _ = _banded_system()
    A.resolve_band()
    assert isinstance(A._band, tuple)
    x = jnp.linspace(0.0, 1.0, A.shape[0], dtype=jnp.float32)
    y_closure = A.matvec(x)

    def f(x, A):
        return A.matvec(x)

    traced = jax.jit(f).trace(x, A)
    assert _consts_bytes(traced.jaxpr) < 4096
    # the banded Pallas kernel survived the boundary (no silent gather)
    assert "pallas" in str(traced.jaxpr)
    y_arg = jax.jit(f)(x, A)
    np.testing.assert_array_equal(np.asarray(y_arg), np.asarray(y_closure))


def test_ellmatrix_closure_bakes_consts_argument_does_not():
    """The failure mode itself: closure capture costs O(matrix) constants."""
    A, _ = _banded_system()
    A.resolve_band()
    x = jnp.zeros((A.shape[0],), jnp.float32)
    closure = jax.jit(lambda v: A.matvec(v)).trace(x)
    through = jax.jit(lambda v, M: M.matvec(v)).trace(x, A)
    assert _consts_bytes(closure.jaxpr) > A.data.nbytes       # data+rel+...
    assert _consts_bytes(through.jaxpr) < 4096


def test_ellmatrix_flatten_roundtrip_preserves_band():
    A, _ = _banded_system()
    A.resolve_band()
    leaves, treedef = jax.tree_util.tree_flatten(A)
    B = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(B._band, tuple)
    assert B._band[0].block_rows == A._band[0].block_rows
    assert B._band[0].d_lists == A._band[0].d_lists
    x = jnp.ones((A.shape[0],), jnp.float32)
    np.testing.assert_array_equal(np.asarray(A.matvec(x)),
                                  np.asarray(B.matvec(x)))


def test_ellmatrix_unresolved_flatten_roundtrip():
    A, _ = _banded_system()
    leaves, treedef = jax.tree_util.tree_flatten(A)
    B = jax.tree_util.tree_unflatten(treedef, leaves)
    assert B._band == "unresolved"
    A._band = None
    leaves, treedef = jax.tree_util.tree_flatten(A)
    C = jax.tree_util.tree_unflatten(treedef, leaves)
    assert C._band is None


@pytest.mark.parametrize("cycle", ["V", "W"])
def test_amg_hierarchy_through_jit(cycle):
    from tpufem.solve.amg import build_amg

    A, _ = _banded_system(n=30)
    A.resolve_band()
    hier = build_amg(A, aggregation="interval", cycle=cycle, coarse_n=120)
    assert len(hier.levels) >= 1
    r = jnp.sin(jnp.arange(A.shape[0], dtype=jnp.float32))
    z_closure = jax.jit(lambda r: hier.apply(r))(r)

    def f(r, h):
        return h.apply(r)

    traced = jax.jit(f).trace(r, hier)
    # coarse_inv (~120^2 fp32) is a child, not a const; nothing big bakes
    assert _consts_bytes(traced.jaxpr) < 4096
    z_arg = jax.jit(f)(r, hier)
    # NOT bit-exact: with the arrays as constants XLA folds scalar*const
    # vector chains (e.g. the Chebyshev (2 rho/delta) * inv_d product) at
    # compile time, reassociating the rounding; as parameters it cannot.
    np.testing.assert_allclose(np.asarray(z_arg), np.asarray(z_closure),
                               rtol=2e-5, atol=2e-5 * float(
                                   np.max(np.abs(np.asarray(z_closure)))))


def test_amg_pcg_through_jit_matches_closure():
    from tpufem.solve.amg import build_amg
    from tpufem.solve.cg import cg

    A, _ = _banded_system(n=30)
    A.resolve_band()
    hier = build_amg(A, aggregation="interval", cycle="W", coarse_n=120)
    b = jnp.cos(jnp.arange(A.shape[0], dtype=jnp.float32))

    res_closure = jax.jit(
        lambda b: cg(A.matvec, b, tol=1e-6, maxiter=200, M=hier.apply))(b)

    def solve_fn(b, op):
        A_, h = op
        return cg(A_.matvec, b, tol=1e-6, maxiter=200, M=h.apply)

    res_arg = jax.jit(solve_fn)(b, (A, hier))
    assert bool(res_arg.converged) and bool(res_closure.converged)
    # constant-folding reassociation (see above) can shift the rounding,
    # and with it the iteration count by a step or two
    assert abs(int(res_arg.iterations) - int(res_closure.iterations)) <= 2
    scale = float(np.max(np.abs(np.asarray(res_closure.x))))
    np.testing.assert_allclose(np.asarray(res_arg.x),
                               np.asarray(res_closure.x),
                               rtol=1e-4, atol=1e-4 * scale)


def test_ell_values_scatter_matches_pattern_path():
    A, pat = _banded_system(n=16)
    mesh_vals = jnp.asarray(
        np.random.default_rng(3).normal(size=pat.slots.shape), jnp.float32)
    ref = (jnp.zeros(pat.cols.shape[0] * pat.cols.shape[1], jnp.float32)
           .at[jnp.asarray(pat.slots.reshape(-1))]
           .add(mesh_vals.reshape(-1))
           .reshape(pat.cols.shape))
    out = ell_values_scatter(jnp.asarray(pat.slots.reshape(-1)), mesh_vals,
                             pat.cols.shape[0], pat.cols.shape[1])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
