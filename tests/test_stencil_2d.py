"""2D-blocked stencil driver (huge-grid path): exactness vs the 1D driver.

The (Bz, By)-blocked kernels exist because past ~300^3 the 1D layout's
VMEM live set (K data planes x a full minor plane) exceeds the 16 MB
limit (tpufem/ops/stencil_pallas.py `_needs_2d`).  Forcing the dispatch
threshold to zero runs every kernel through the 2D path on small grids,
where it must agree with the 1D path bit-for-bit in interpret mode.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import tpufem.ops.stencil_pallas as sp
from tpufem.solve.multigrid import build_poisson_multigrid


@pytest.fixture
def level():
    lv = build_poisson_multigrid((-3.0, 3.0), 16, 3, dtype=jnp.float32,
                                 coarse_max=8, use_pallas=False)[0]
    rng = np.random.default_rng(23)
    ns = lv.plan.num_store_rows
    x = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    r = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    return lv, x, r


def test_2d_driver_matches_1d(level, monkeypatch):
    lv, x, r = level

    y1 = sp.stencil_matvec_embedded(lv.data, x, lv.plan, interpret=True)
    r1 = sp.stencil_residual_embedded(lv.data, r, x, lv.plan, interpret=True)
    s1 = sp.stencil_smooth_embedded(lv.data, r, x, lv.inv_diag, lv.plan,
                                    interpret=True)
    ym1, d1 = sp.stencil_matvec_dot_embedded(lv.data, x, lv.plan,
                                             interpret=True)
    ys1, rz1 = sp.stencil_smooth_dot_embedded(lv.data, r, x, lv.inv_diag,
                                              lv.plan, interpret=True)

    monkeypatch.setattr(sp, "_VMEM_1D_LIMIT", 0)
    y2 = sp.stencil_matvec_embedded(lv.data, x, lv.plan, interpret=True)
    r2 = sp.stencil_residual_embedded(lv.data, r, x, lv.plan, interpret=True)
    s2 = sp.stencil_smooth_embedded(lv.data, r, x, lv.inv_diag, lv.plan,
                                    interpret=True)
    ym2, d2 = sp.stencil_matvec_dot_embedded(lv.data, x, lv.plan,
                                             interpret=True)
    ys2, rz2 = sp.stencil_smooth_dot_embedded(lv.data, r, x, lv.inv_diag,
                                              lv.plan, interpret=True)

    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(ym2), np.asarray(ym1))
    np.testing.assert_array_equal(np.asarray(ys2), np.asarray(ys1))
    np.testing.assert_allclose(float(d2), float(d1), rtol=1e-6)
    np.testing.assert_allclose(float(rz2), float(rz1), rtol=1e-6)


def test_2d_block_picker_legal():
    from tpufem.assemble.structured import structured_plan
    from tpufem.solve.multigrid import _light_grid
    for n in (16, 32):
        info, _, _ = _light_grid((-3.0, 3.0), n, 3)
        plan = structured_plan(info, embed=True)
        Bz, By = sp._pick_blocks2(plan.store_grid, 15, 2, 4)
        assert plan.store_grid[0] % Bz == 0
        assert plan.store_grid[1] % By == 0
        assert By % 8 == 0 or By == plan.store_grid[1]


def test_2d_const_driver_matches_1d(monkeypatch):
    con = build_poisson_multigrid((-3.0, 3.0), 16, 3, dtype=jnp.float32,
                                  coarse_max=8, use_pallas=False,
                                  operator="const")
    L = con[0]
    rng = np.random.default_rng(31)
    ns = L.plan.num_store_rows
    x = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    r = jnp.asarray(rng.standard_normal(ns), jnp.float32)

    y1 = sp.const_matvec_embedded(L.weights, L.code, x, L.plan,
                                  interpret=True)
    r1 = sp.const_residual_embedded(L.weights, L.code, r, x, L.plan,
                                    interpret=True)
    s1 = sp.const_smooth_embedded(L.weights, L.code, r, x, L.plan,
                                  interpret=True)
    ys1, rz1 = sp.const_smooth_dot_embedded(L.weights, L.code, r, x,
                                            L.plan, interpret=True)

    monkeypatch.setattr(sp, "_VMEM_1D_LIMIT", 0)
    y2 = sp.const_matvec_embedded(L.weights, L.code, x, L.plan,
                                  interpret=True)
    r2 = sp.const_residual_embedded(L.weights, L.code, r, x, L.plan,
                                    interpret=True)
    s2 = sp.const_smooth_embedded(L.weights, L.code, r, x, L.plan,
                                  interpret=True)
    ys2, rz2 = sp.const_smooth_dot_embedded(L.weights, L.code, r, x,
                                            L.plan, interpret=True)

    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(ys2), np.asarray(ys1))
    np.testing.assert_allclose(float(rz2), float(rz1), rtol=1e-6)
