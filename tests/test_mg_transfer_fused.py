"""Fused V-cycle transfer kernels (VERDICT.md r2 item 4): interpret-mode
exactness of residual+restrict and prolong+add+smooth against the unfused
composition (the XLA const-operator path of solve/multigrid.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpufem.ops.mg_transfer_pallas import (
    const_prolong_add_smooth_embedded, const_residual_restrict_embedded,
    transfer_block)
from tpufem.solve.multigrid import (_const_matvec_xla, _grid, _smooth,
                                    _store, build_poisson_multigrid,
                                    prolong, restrict, v_cycle)


@pytest.fixture(scope="module", params=[8, 12])
def hier(request):
    return build_poisson_multigrid((-3.0, 3.0), request.param, 3,
                                   dtype=jnp.float32, coarse_max=4,
                                   use_pallas=False, operator="const")


def _rand(level, seed):
    rng = np.random.default_rng(seed)
    ns = level.plan.num_store_rows
    v = rng.standard_normal(ns).astype(np.float32)
    # embedded vectors are zero at border/padding positions
    code = np.asarray(level.code)
    return jnp.asarray(np.where(code != 0.0, v, 0.0))


def test_residual_restrict_matches_composition(hier):
    lf, lc = hier[0], hier[1]
    r = _rand(lf, 0)
    e = _rand(lf, 1)
    # unfused: residual (XLA const), extract, W+sample, embed, bc-zero
    resid = r - _const_matvec_xla(lf.weights, lf.code, lf.plan.offsets, e)
    rc_grid = restrict(_grid(lf, resid), 3)
    rc_ref = _store(lc, rc_grid)
    rc_ref = jnp.where(lc.bc_mask, 0, rc_ref)

    rc = const_residual_restrict_embedded(lf.weights, lf.code, lc.code,
                                          r, e, lf.plan, lc.plan,
                                          interpret=True)
    err = np.abs(np.asarray(rc) - np.asarray(rc_ref)).max()
    scale = np.abs(np.asarray(rc_ref)).max()
    assert err <= 1e-5 * max(scale, 1.0), (err, scale)


def test_prolong_add_smooth_matches_composition(hier):
    lf, lc = hier[0], hier[1]
    r = _rand(lf, 2)
    e = _rand(lf, 3)
    ec = _rand(lc, 4)
    omega = 0.8
    ef_grid = prolong(_grid(lc, ec), 3)
    e_ref = e + _store(lf, ef_grid)
    e_ref = _smooth(lf, r, e_ref, omega, use_pallas=False)

    e_new = const_prolong_add_smooth_embedded(
        lf.weights, lf.code, ec, r, e, lf.plan, lc.plan, omega=omega,
        interpret=True)
    err = np.abs(np.asarray(e_new) - np.asarray(e_ref)).max()
    scale = np.abs(np.asarray(e_ref)).max()
    assert err <= 1e-5 * max(scale, 1.0), (err, scale)


def test_prolong_add_smooth_dot(hier):
    lf, lc = hier[0], hier[1]
    r = _rand(lf, 5)
    e = _rand(lf, 6)
    ec = _rand(lc, 7)
    y0 = const_prolong_add_smooth_embedded(
        lf.weights, lf.code, ec, r, e, lf.plan, lc.plan, interpret=True)
    y1, d = const_prolong_add_smooth_embedded(
        lf.weights, lf.code, ec, r, e, lf.plan, lc.plan, with_dot=True,
        interpret=True)
    assert np.allclose(np.asarray(y0), np.asarray(y1))
    ref = float(jnp.vdot(r, y0))
    assert abs(float(d) - ref) <= 1e-4 * max(abs(ref), 1.0)


def test_transfer_block_divides():
    for fz, cz in [(104, 56), (32, 16), (16, 16), (48, 24), (24, 16)]:
        b = transfer_block((fz, 1, 1), (cz, 1, 1))
        assert cz % b == 0 and (fz // 2) % b == 0


def test_full_vcycle_fused_matches_unfused(hier):
    """End-to-end: the fused-transfer V-cycle (interpret path via the
    kernels' own interpret flag is not plumbed through v_cycle, so compare
    a hand-rolled fused cycle) equals the XLA-composed v_cycle."""
    lf, lc = hier[0], hier[1]
    levels = hier
    r = _rand(lf, 8)
    ref = v_cycle(levels, r, nu1=1, nu2=1, use_pallas=False)

    # hand-rolled fused top level around the unfused deeper recursion
    omega = 0.8
    e = omega * lf.inv_diag * r
    rc = const_residual_restrict_embedded(lf.weights, lf.code, lc.code,
                                          r, e, lf.plan, lc.plan,
                                          interpret=True)
    ec = v_cycle(levels, rc, li=1, nu1=1, nu2=1, use_pallas=False)
    out = const_prolong_add_smooth_embedded(
        lf.weights, lf.code, ec, r, e, lf.plan, lc.plan, omega=omega,
        interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err <= 1e-5 * max(scale, 1.0), (err, scale)
