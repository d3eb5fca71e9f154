"""Distributed ELL CG: unstructured meshes sharded across the device mesh.

Completes the distributed-format matrix: the stencil path (tpufem.dist.cg)
covers structured grids; this covers general banded ELL systems — the
storage the reference's most complete variant assembles
(/root/reference/fea_test_sm_sym_sparse2.cu:273-282), renumbered with
reverse Cuthill-McKee so the coupling is local.

Partitioning: contiguous row stripes (after RCM the stripes are physical
mesh bands).  A matvec needs x values at most ``halo`` rows beyond the
stripe on each side, where halo = max over entries of the distance a column
reaches past its row's stripe — bounded by the RCM bandwidth, independent
of problem size, so one ``ppermute`` per direction per matvec is the whole
communication (the SURVEY §2.4 halo-exchange design, same as the stencil
path).  Column indices are rewritten shard-locally at partition time; the
in-shard matvec is the plain ELL gather-multiply (on real chips the banded
Pallas kernel of tpufem.sparse.ell_pallas is the single-shard analogue).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.dist.stencil import halo_exchange
from tpufem.solve.cg import CGResult

__all__ = ["ELLPartition", "ell_partition", "sharded_ell_matvec",
           "ell_cg_sharded", "distributed_ell_solve",
           "BCSRPartition", "bcsr_partition", "sharded_bcsr_matvec",
           "bcsr_cg_sharded", "distributed_bcsr_solve"]


def pad_identity_rows(data, cols, np_rows):
    """Pad ELL arrays with decoupled identity rows (diag 1 in slot 0,
    remaining slots self-pointing with value 0) up to ``np_rows``.  The CG
    trajectory of the original system is preserved exactly."""
    n, K = data.shape
    if np_rows == n:
        return data, cols
    pad = np_rows - n
    data = np.concatenate([data, np.zeros((pad, K), data.dtype)])
    data[n:, 0] = 1.0
    self_cols = np.arange(n, np_rows, dtype=cols.dtype)[:, None]
    cols = np.concatenate(
        [cols, np.broadcast_to(self_cols, (pad, K)).astype(cols.dtype)])
    return data, cols


def sharded_pcg_loop(matvec, prec, b_l, axis_name: str, tol: float,
                     maxiter: int):
    """Guarded PCG while_loop on shard-local state (call INSIDE shard_map).

    ``matvec``/``prec`` are shard-local closures (halo exchange inside);
    dot products are local-dot + psum.  Returns (x, iters, relres,
    converged, bad) with the scalars replicated.  Shared by the ELL, BCSR
    and distributed-AMG solvers so the breakdown/convergence logic lives
    in exactly one place.
    """
    def pdot(a, c):
        return jax.lax.psum(jnp.vdot(a, c), axis_name)

    b_norm2 = pdot(b_l, b_l)
    safe_b = jnp.where(b_norm2 > 0, b_norm2, 1.0)
    atol2 = (tol ** 2) * safe_b

    r0 = b_l
    z0 = prec(r0)
    rz0 = pdot(r0, z0)

    def not_done(state):
        _, _, _, _, rz, rr, k, bad = state
        return (rr > atol2) & (k < maxiter) & (~bad)

    def step(state):
        x, r, z, p, rz, rr, k, bad = state
        Ap = matvec(p)
        pAp = pdot(p, Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = pdot(r, z)
        rr_new = pdot(r, r)
        p = z + (rz_new / rz) * p
        bad = (~jnp.isfinite(rz_new)) | (~jnp.isfinite(pAp)) | (pAp <= 0)
        return (x, r, z, p, rz_new, rr_new, k + 1, bad)

    init = (jnp.zeros_like(b_l), r0, z0, z0, rz0, b_norm2,
            jnp.int32(0), jnp.asarray(False))
    x, r, _, _, _, rr, k, bad = jax.lax.while_loop(not_done, step, init)
    relres = jnp.sqrt(rr / safe_b)
    converged = (rr <= atol2) & (~bad)
    return x, k, relres, converged, bad


class ELLPartition(NamedTuple):
    """Row-stripe partition of an ELL matrix for ``num_shards`` devices."""
    data: np.ndarray        # [NP, K] values (identity padding rows)
    rel: np.ndarray         # [NP, K] int32 halo-local column indices
    inv_diag: np.ndarray    # [NP] 1/diag (1.0 on padding rows)
    halo: int               # rows exchanged per side per matvec
    n: int                  # original rows
    local_rows: int         # NP / num_shards
    num_shards: int


def ell_partition(data, cols, num_shards: int, *,
                  min_halo: int = 1) -> ELLPartition:
    """Partition an ELL matrix (data [N, K], cols [N, K]) into row stripes.

    Pads to a multiple of ``num_shards`` with identity rows (diag 1 — CG
    trajectory of the original system is preserved exactly), computes the
    halo each stripe needs, and rewrites every column index relative to
    (stripe_start - halo), i.e. into the local haloed vector.

    Raises if the halo exceeds the stripe height (single-hop neighbor
    exchange could not cover the coupling — renumber with
    tpufem.mesh.adjacency.reverse_cuthill_mckee or use fewer shards).
    """
    data = np.asarray(data)
    cols = np.asarray(cols, np.int64)
    n, K = data.shape
    L = -(-n // num_shards)
    np_rows = L * num_shards
    data, cols = pad_identity_rows(data, cols, np_rows)

    rows = np.arange(np_rows)
    stripe_start = (rows // L) * L
    reach_left = np.maximum(stripe_start[:, None] - cols, 0).max()
    reach_right = np.maximum(cols - (stripe_start[:, None] + L - 1), 0).max()
    halo = max(int(max(reach_left, reach_right)), int(min_halo))
    if halo > L:
        raise ValueError(
            f"halo {halo} exceeds stripe height {L}: single-hop neighbor "
            "exchange cannot cover the coupling — renumber the mesh "
            "(reverse_cuthill_mckee) or use fewer shards")

    rel = (cols - (stripe_start[:, None] - halo)).astype(np.int32)

    diag = np.where(cols == rows[:, None], data, 0.0).sum(1)
    with np.errstate(divide="ignore"):
        inv_diag = np.where(diag != 0, 1.0 / diag, 1.0).astype(data.dtype)

    return ELLPartition(data=data, rel=rel, inv_diag=inv_diag, halo=halo,
                        n=n, local_rows=L, num_shards=num_shards)


def sharded_ell_matvec(data_l, rel_l, x_local, halo: int, axis_name: str):
    """Local stripe of y = A x.  data_l/rel_l [L, K], x_local [L]."""
    left, right = halo_exchange(x_local, halo, axis_name)
    xp = jnp.concatenate([left, x_local, right])
    return (data_l * xp[rel_l]).sum(axis=1)


def ell_cg_sharded(part: ELLPartition, b, mesh: Mesh, *,
                   axis_name: str = "rows", tol: float = 1e-8,
                   maxiter: int = 1000,
                   diag_precondition: bool = True) -> CGResult:
    """Jacobi-PCG on the partitioned ELL system, fully inside shard_map.

    ``b`` [NP] (padded, sharded or replicated — device_put with a
    P(axis_name) sharding first for zero relayout).  Every inner product is
    a local dot + psum; state stays sharded for the whole solve.
    """
    halo = part.halo
    tol = float(tol)
    data = jnp.asarray(part.data)
    rel = jnp.asarray(part.rel)
    invd = jnp.asarray(part.inv_diag)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name),
                  P(axis_name)),
        out_specs=(P(axis_name), P(), P(), P(), P()))
    def run(data_l, rel_l, invd_l, b_l):
        def matvec(v):
            return sharded_ell_matvec(data_l, rel_l, v, halo, axis_name)

        prec = (lambda r: r * invd_l) if diag_precondition else (lambda r: r)
        return sharded_pcg_loop(matvec, prec, b_l, axis_name, tol, maxiter)

    x, k, relres, converged, bad = run(data, rel, invd, b)
    return CGResult(x=x, iterations=k, residual_norm=relres,
                    converged=converged, diverged=bad)


def distributed_ell_solve(data, cols, b, mesh: Mesh, *,
                          axis_name: str = "rows", tol: float = 1e-8,
                          maxiter: int = 1000):
    """Convenience wrapper: partition an (assembled, BC-applied) ELL system
    over ``mesh``, shard it, CG-solve.  Returns (x [original rows], result).
    """
    num = mesh.shape[axis_name]
    part = ell_partition(np.asarray(data), np.asarray(cols), num)
    shard = NamedSharding(mesh, P(axis_name))
    b_p = np.pad(np.asarray(b), (0, part.data.shape[0] - part.n))
    b_dev = jax.device_put(jnp.asarray(b_p), shard)
    res = ell_cg_sharded(part, b_dev, mesh, axis_name=axis_name, tol=tol,
                         maxiter=maxiter)
    return res.x[:part.n], res


# -- BCSR (vector-block) variant ----------------------------------------------

class BCSRPartition(NamedTuple):
    """Node-row-stripe partition of a BCSR matrix (elasticity etc.)."""
    data: np.ndarray          # [NP, K, b, b] (identity-block padding rows)
    rel: np.ndarray           # [NP, K] int32 halo-local node indices
    inv_diag: np.ndarray      # [NP, b, b] inverted diagonal blocks
    halo: int
    n: int                    # original node rows
    local_rows: int
    num_shards: int
    block_size: int


def bcsr_partition(data, cols, num_shards: int, *,
                   min_halo: int = 1) -> BCSRPartition:
    """Partition a BCSR matrix (data [N, K, b, b], cols [N, K]) into node
    -row stripes; see :func:`ell_partition` — same halo/column rewrite on
    the node pattern, block-Jacobi diagonal inverted at partition time."""
    data = np.asarray(data)
    cols = np.asarray(cols, np.int64)
    n, K, bs, _ = data.shape
    L = -(-n // num_shards)
    np_rows = L * num_shards
    if np_rows != n:
        pad = np_rows - n
        data = np.pad(data, ((0, pad), (0, 0), (0, 0), (0, 0)))
        data[n:, 0] = np.eye(bs, dtype=data.dtype)
        self_cols = np.arange(n, np_rows, dtype=cols.dtype)[:, None]
        cols = np.concatenate(
            [cols, np.broadcast_to(self_cols, (pad, K)).copy()])

    rows = np.arange(np_rows)
    stripe_start = (rows // L) * L
    reach_left = np.maximum(stripe_start[:, None] - cols, 0).max()
    reach_right = np.maximum(cols - (stripe_start[:, None] + L - 1), 0).max()
    halo = max(int(max(reach_left, reach_right)), int(min_halo))
    if halo > L:
        raise ValueError(
            f"halo {halo} exceeds stripe height {L}: renumber the mesh "
            "(reverse_cuthill_mckee) or use fewer shards")
    rel = (cols - (stripe_start[:, None] - halo)).astype(np.int32)

    diag = np.where((cols == rows[:, None])[:, :, None, None],
                    data, 0.0).sum(1)                       # [NP, b, b]
    # guard all-zero diagonals (shouldn't occur after BC application)
    sing = np.abs(np.linalg.det(diag)) < 1e-300
    diag[sing] = np.eye(bs, dtype=data.dtype)
    inv_diag = np.linalg.inv(diag).astype(data.dtype)

    return BCSRPartition(data=data, rel=rel, inv_diag=inv_diag, halo=halo,
                         n=n, local_rows=L, num_shards=num_shards,
                         block_size=bs)


def sharded_bcsr_matvec(data_l, rel_l, x_local, halo: int, axis_name: str):
    """Local stripe of y = A x.  data_l [L, K, b, b], x_local [L*b]
    (node-major, component-minor)."""
    L, _, bs, _ = data_l.shape
    xb = x_local.reshape(L, bs)
    left, right = halo_exchange(xb, halo, axis_name)
    xp = jnp.concatenate([left, xb, right], axis=0)
    gathered = xp[rel_l]                                   # [L, K, b]
    y = (data_l * gathered[:, :, None, :]).sum(axis=(1, 3))
    return y.reshape(-1)


def bcsr_cg_sharded(part: BCSRPartition, b, mesh: Mesh, *,
                    axis_name: str = "rows", tol: float = 1e-8,
                    maxiter: int = 1000) -> CGResult:
    """Block-Jacobi PCG on the partitioned BCSR system inside shard_map.

    ``b`` [NP*b] (padded, node-major comp-minor)."""
    halo = part.halo
    bs = part.block_size
    tol = float(tol)
    data = jnp.asarray(part.data)
    rel = jnp.asarray(part.rel)
    invd = jnp.asarray(part.inv_diag)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis_name, None, None, None), P(axis_name, None),
                  P(axis_name, None, None), P(axis_name)),
        out_specs=(P(axis_name), P(), P(), P(), P()))
    def run(data_l, rel_l, invd_l, b_l):
        def matvec(v):
            return sharded_bcsr_matvec(data_l, rel_l, v, halo, axis_name)

        def prec(r):
            rb = r.reshape(-1, bs)
            return jnp.einsum("nij,nj->ni", invd_l, rb).reshape(-1)

        return sharded_pcg_loop(matvec, prec, b_l, axis_name, tol, maxiter)

    x, k, relres, converged, bad = run(data, rel, invd, b)
    return CGResult(x=x, iterations=k, residual_norm=relres,
                    converged=converged, diverged=bad)


def distributed_bcsr_solve(A, b, mesh: Mesh, *, axis_name: str = "rows",
                           tol: float = 1e-8, maxiter: int = 1000):
    """Partition a (BC-applied) BCSRMatrix system over ``mesh`` and solve.

    Returns (x [original dofs], CGResult).  RCM-order the node numbering
    first for narrow halos (tpufem.mesh.adjacency.reverse_cuthill_mckee).
    """
    num = mesh.shape[axis_name]
    part = bcsr_partition(np.asarray(A.data), np.asarray(A.cols), num)
    bs = part.block_size
    b_p = np.pad(np.asarray(b), (0, (part.data.shape[0] - part.n) * bs))
    b_dev = jax.device_put(
        jnp.asarray(b_p), NamedSharding(mesh, P(axis_name)))
    res = bcsr_cg_sharded(part, b_dev, mesh, axis_name=axis_name, tol=tol,
                          maxiter=maxiter)
    return res.x[:part.n * bs], res
