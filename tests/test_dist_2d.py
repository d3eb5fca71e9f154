"""2D pod-shaped ("z","y") decomposition of the structured stencil path
(VERDICT.md r2 item 10): matvec and full CG on a 4x2 device mesh must match
the single-device computation to 1e-7.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpufem.dist.multigrid import _analytic_level
from tpufem.dist.stencil2d import solve_grid_cg_2d, grid_stencil_matvec_2d


def _reference_matvec(data, x, offsets_grid):
    """Plain numpy shifted-sum with zero boundary."""
    ng = x.shape
    xp = np.pad(x, 1)
    y = np.zeros_like(x)
    for k, (dz, dy, dx) in enumerate(offsets_grid):
        y += data[k] * xp[1 + dz:1 + dz + ng[0],
                          1 + dy:1 + dy + ng[1],
                          1 + dx:1 + dx + ng[2]]
    return y


@pytest.fixture(scope="module")
def system():
    # s=15 -> 16^3 node grid: 16 divisible by both 4 (z-shards) and
    # 2 (y-shards)
    data, mask, offsets_grid = _analytic_level((-3.0, 3.0), 15, 3,
                                               np.float64)
    return np.asarray(data), np.asarray(mask), offsets_grid


def _mesh42(cpu_devices):
    return Mesh(np.array(cpu_devices[:8]).reshape(4, 2), ("z", "y"))


def test_matvec_2d_matches_single_device(cpu_devices, system):
    data, mask, offsets_grid = system
    rng = np.random.default_rng(0)
    x = rng.standard_normal(data.shape[1:])
    ref = _reference_matvec(data, x, offsets_grid)

    mesh = _mesh42(cpu_devices)
    from jax.sharding import NamedSharding, PartitionSpec as P
    import functools

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, "z", "y", None), P("z", "y", None)),
                       out_specs=P("z", "y", None))
    def mv(d, v):
        return grid_stencil_matvec_2d(d, v, offsets_grid, "z", "y")

    d_sh = jax.device_put(jnp.asarray(data),
                          NamedSharding(mesh, P(None, "z", "y", None)))
    x_sh = jax.device_put(jnp.asarray(x),
                          NamedSharding(mesh, P("z", "y", None)))
    y = np.asarray(mv(d_sh, x_sh))
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err


def test_cg_2d_solves_to_single_device_solution(cpu_devices, system):
    data, mask, offsets_grid = system
    rng = np.random.default_rng(1)
    x_true = np.where(mask, 0.0, rng.standard_normal(data.shape[1:]))
    b = _reference_matvec(data, x_true, offsets_grid)

    mesh = _mesh42(cpu_devices)
    res = solve_grid_cg_2d(data, offsets_grid, b, mesh, tol=1e-10,
                           maxiter=2000)
    assert bool(res.converged), float(res.residual_norm)
    x = np.asarray(res.x)
    err = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert err < 1e-7, err


def test_cg_2d_matches_1d_stripes(cpu_devices, system):
    """Same solve on an 8x1 mesh (degenerate 2D = 1D stripes) agrees with
    the 4x2 result — decomposition shape must not change the answer."""
    data, mask, offsets_grid = system
    rng = np.random.default_rng(2)
    x_true = np.where(mask, 0.0, rng.standard_normal(data.shape[1:]))
    b = _reference_matvec(data, x_true, offsets_grid)

    mesh42 = _mesh42(cpu_devices)
    mesh81 = Mesh(np.array(cpu_devices[:8]).reshape(8, 1), ("z", "y"))
    r42 = solve_grid_cg_2d(data, offsets_grid, b, mesh42, tol=1e-10,
                           maxiter=2000)
    r81 = solve_grid_cg_2d(data, offsets_grid, b, mesh81, tol=1e-10,
                           maxiter=2000)
    assert bool(r42.converged) and bool(r81.converged)
    d = np.linalg.norm(np.asarray(r42.x) - np.asarray(r81.x))
    assert d / np.linalg.norm(np.asarray(r42.x)) < 1e-9
