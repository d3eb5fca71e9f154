"""Auxiliary subsystems: checkpoint/resume, config, logging, timing,
planar kernels, embedded fields (SURVEY.md §5 parity-plus)."""
import io
import json

import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.assemble.local import p1_stiffness
from tpufem.assemble.planar import (element_coords_bt, element_load_bt,
                                    p1_stiffness_bt)
from tpufem.assemble.stencil import assemble_stencil
from tpufem.assemble.structured import structured_plan
from tpufem.assemble.ell import assemble_ell
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.io.checkpoint import (load_solution, load_system, save_solution,
                                  save_system)
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.cg import cg
from tpufem.sparse.stencil import stencil_pattern
from tpufem.utils.logging import RunLogger
from tpufem.utils.timing import PhaseTimer


def _system():
    mesh = rectangle_mesh(-3, 3, -3, 3, 8, 8)
    Ke = p1_stiffness(jnp.asarray(mesh.element_coords()), P1Triangle())
    return mesh, Ke


def test_checkpoint_ell_roundtrip(tmp_path):
    mesh, Ke = _system()
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    A = assemble_ell(pat, Ke)
    b = jnp.arange(mesh.num_nodes, dtype=jnp.float64)
    path = str(tmp_path / "sys.npz")
    save_system(path, A, b, mesh_n=8)
    A2, b2, extras = load_system(path)
    np.testing.assert_array_equal(np.asarray(A2.data), np.asarray(A.data))
    np.testing.assert_array_equal(np.asarray(A2.cols), np.asarray(A.cols))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))
    assert int(extras["mesh_n"]) == 8


def test_checkpoint_stencil_roundtrip(tmp_path):
    mesh, Ke = _system()
    pat = stencil_pattern(mesh.conn, mesh.num_nodes)
    A = assemble_stencil(pat, Ke)
    path = str(tmp_path / "sys.npz")
    save_system(path, A)
    A2, b2, _ = load_system(path)
    assert b2 is None
    assert A2.offsets == A.offsets
    np.testing.assert_array_equal(np.asarray(A2.data), np.asarray(A.data))


def test_cg_warm_restart(tmp_path):
    """Interrupted solve -> checkpoint -> resume matches direct solve."""
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((30, 30))
    A = jnp.asarray(Q @ Q.T + 30 * np.eye(30))
    b = jnp.asarray(rng.standard_normal(30))
    partial = cg(lambda x: A @ x, b, tol=1e-30, maxiter=5)
    path = str(tmp_path / "ckpt.npz")
    save_solution(path, partial.x, iterations=int(partial.iterations),
                  residual_norm=float(partial.residual_norm))
    x0, info = load_solution(path)
    assert info["iterations"] == 5
    resumed = cg(lambda x: A @ x, b, x0=x0, tol=1e-12, maxiter=500)
    assert bool(resumed.converged)
    direct = cg(lambda x: A @ x, b, tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(direct.x),
                               rtol=1e-8, atol=1e-10)


def test_run_logger():
    mesh, _ = _system()
    buf = io.StringIO()
    log = RunLogger(stream=buf)
    log.mesh_stats(mesh)
    log.assembly(num_dofs=81, nnz=497, seconds=0.001, format="ell")
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "mesh"
    assert lines[0]["num_nodes"] == 81
    assert lines[1]["dofs_per_sec"] == pytest.approx(81_000)


def test_phase_timer():
    t = PhaseTimer()
    with t("phase_a"):
        sum(range(1000))
    assert "phase_a" in t.report()
    assert t.report()["phase_a"] >= 0


def test_config_round_trip():
    import argparse

    from tpufem.config import add_cli_args, from_cli

    parser = argparse.ArgumentParser()
    add_cli_args(parser)
    args = parser.parse_args(["--dim", "3", "--cells", "4", "--format",
                              "stencil", "--tol", "1e-9"])
    prob, sol = from_cli(args)
    mesh = prob.make_mesh()
    assert mesh.cell_type == "tetrahedron"
    assert mesh.num_elements == 6 * 4 ** 3
    assert sol.tol == 1e-9


def test_planar_rhs_matches_generic():
    mesh = rectangle_mesh(-3, 3, -3, 3, 6, 6)
    X = jnp.asarray(element_coords_bt(mesh, np.float64))
    be_bt = element_load_bt(X, "triangle", triangle_rule(5),
                            lambda x, y: x + 2 * y)
    from tpufem.assemble.local import element_load
    be = element_load(jnp.asarray(mesh.element_coords()), P1Triangle(),
                      triangle_rule(5), lambda p: p[..., 0] + 2 * p[..., 1])
    info = mesh.structured
    beT = np.asarray(be).reshape(*info.cell_grid, 2, 3)
    np.testing.assert_allclose(
        np.asarray(be_bt), np.transpose(beT, (2, 3, 0, 1)), rtol=1e-12)


def test_embed_extract_roundtrip():
    mesh = rectangle_mesh(0, 1, 0, 1, 6, 6)
    plan = structured_plan(mesh, embed=True)
    v = jnp.arange(mesh.num_nodes, dtype=jnp.float64)
    emb = plan.embed_field(v)
    assert emb.shape[0] == plan.num_store_rows
    np.testing.assert_array_equal(np.asarray(plan.extract_field(emb)),
                                  np.asarray(v))
    # borders are the fill value
    grid = np.asarray(emb).reshape(plan.store_grid)
    assert (grid[:, 0] == 0).all() and (grid[0, :] == 0).all()


def test_debug_validators():
    from tpufem.utils.debug import (check_assembly_agreement,
                                    check_operator_invariants,
                                    validate_ell_pattern)

    mesh, Ke = _system()
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    assert validate_ell_pattern(pat, mesh.conn, mesh.num_nodes)
    assert check_assembly_agreement(pat, Ke)
    A = assemble_ell(pat, Ke)
    assert check_operator_invariants(A, symmetric=True, zero_row_sums=True)

    # corrupt the plan -> validator must catch it
    import dataclasses
    bad_slots = pat.slots.copy()
    bad_slots[0, 0, 0] = pat.slots[0, 0, 0] + 1
    bad = dataclasses.replace(pat, slots=bad_slots)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        validate_ell_pattern(bad, mesh.conn, mesh.num_nodes)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from tpufem.io.checkpoint import orbax_restore, orbax_save

    tree = {"x": jnp.arange(16.0), "meta": jnp.asarray([3])}
    path = str(tmp_path / "orbax_ckpt")
    orbax_save(path, tree)
    back = orbax_restore(path, tree)
    np.testing.assert_array_equal(np.asarray(back["x"]),
                                  np.asarray(tree["x"]))
    assert int(back["meta"][0]) == 3
