"""BCSR (block-ELL) sparse matrix for vector-valued problems.

Vector elements (e.g. 2D/3D elasticity) couple nodes through dense b x b
blocks (b = components).  Storing one block per scalar-pattern slot —
``data [ns, K, b, b]`` over the *node* adjacency — keeps the index arrays b²
times smaller than scalar ELL and turns SpMV into a batched small-matmul
einsum that XLA maps onto the MXU (BASELINE.md config 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.mesh.adjacency import ELLPattern

__all__ = ["BCSRMatrix", "assemble_bcsr", "assemble_bcsr_arrays",
           "apply_dirichlet_bcsr"]


@jax.tree_util.register_pytree_node_class
class BCSRMatrix:
    """data [ns, K, b, b]; cols [ns, K] (scalar/node pattern);
    DOF layout is node-major, component-minor (tpufem.fem.space)."""

    def __init__(self, data, cols, diag_pos=None):
        self.data = data
        self.cols = cols
        self.diag_pos = diag_pos
        # banded fast-path cache, mirroring ELLMatrix: (plan, data_t, rel)
        # once resolved, None = gather, "unresolved" until first use.
        self._band = "unresolved"

    # The banded plan splits across the pytree protocol exactly like
    # ELLMatrix: device arrays (data_t, rel) are children, static plan
    # metadata rides aux_data — so a BCSR matrix passed THROUGH a jit
    # boundary as an argument (the block-AMG hierarchy) keeps its Pallas
    # fast path.  An unresolved matrix inside a trace cannot measure its
    # bandwidth (tracer cols) and rides the gather — resolve at setup.
    def tree_flatten(self):
        band = self._band
        if isinstance(band, tuple):
            plan, data_dev, rel_dev = band
            static_plan = plan._replace(rel=None, data_t=None, dtab=None)
            return ((self.data, self.cols, self.diag_pos,
                     (data_dev, rel_dev)), static_plan)
        return (self.data, self.cols, self.diag_pos, None), band

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols, diag_pos, band_arrays = children
        obj = cls(data, cols, diag_pos)
        if isinstance(aux, tuple) and hasattr(aux, "block_rows"):
            obj._band = (aux, band_arrays[0], band_arrays[1])
        else:
            obj._band = aux               # None | "unresolved"
        return obj

    @property
    def block_size(self):
        return self.data.shape[-1]

    @property
    def shape(self):
        n = self.data.shape[0] * self.block_size
        return (n, n)

    def _resolve_band(self):
        """Build + cache the banded block plan if this matrix qualifies
        (concrete arrays, node-pattern bandwidth <= the scalar auto cap,
        dispatch enabled, TPU backend — interpret mode would be slower
        than the gather it replaces)."""
        if self._band != "unresolved":
            return self._band
        if (isinstance(self.data, jax.core.Tracer)
                or isinstance(self.cols, jax.core.Tracer)):
            return "unresolved"   # retry on a later (concrete) call
        self._band = None
        import os
        if os.environ.get("TPUFEM_BAND_DISPATCH", "1") == "0":
            return None
        if jax.default_backend() != "tpu":
            return None
        try:
            import numpy as np

            from tpufem.sparse.ell import _AUTO_BAND_MAX
            cols = np.asarray(self.cols)
            nr = cols.shape[0]
            bw = int(np.abs(cols.astype(np.int64)
                            - np.arange(nr)[:, None]).max()) if nr else 0
            if bw <= _AUTO_BAND_MAX:
                self.prime_band_plan()
        except Exception as exc:
            # name the failure before pinning the gather fallback (the
            # round-4 silent-gather disease class, BENCH_NOTES r4b 5b)
            import warnings
            warnings.warn(
                f"BCSRMatrix band-plan build failed ({type(exc).__name__}: "
                f"{exc}); falling back to gather SpMV (~500x slower at "
                "scale)", RuntimeWarning, stacklevel=2)
            self._band = None
        return self._band

    def resolve_band(self):
        """Resolve the banded fast path NOW (see ELLMatrix.resolve_band):
        call before passing the matrix through a jit boundary."""
        self._resolve_band()
        return self

    def prime_band_plan(self, block_rows=None, segment: bool = True,
                        cap_k: bool = False):
        """Build + cache the banded block plan unconditionally (any
        bandwidth — the plan picks a covering block size).

        ``segment=False``: single-global-kernel plan (one Pallas payload
        per matvec — see ELLMatrix.prime_band_plan).  ``cap_k``: apply
        the K*sub VMEM-stack cap with the block's K*b*b effective plane
        count — for fat-K Galerkin coarse levels; the FINE elasticity
        matrix measured best uncapped (K*b*b = 56 planes at R = 8192,
        0.42 ms/iter, hw r5 phase 4)."""
        import numpy as np

        from tpufem.sparse.ell_pallas import (auto_block_rows,
                                              bcsr_band_plan)
        cols = np.asarray(self.cols)
        if block_rows is None:
            nr = cols.shape[0]
            bw = int(np.abs(cols.astype(np.int64)
                            - np.arange(nr)[:, None]).max()) if nr else 0
            b = int(np.asarray(self.data).shape[2])
            block_rows = auto_block_rows(
                bw, nr, cols.shape[1] * b * b if cap_k else None)
        plan, data_t = bcsr_band_plan(np.asarray(self.data), cols,
                                      block_rows=block_rows,
                                      segment=segment)
        with jax.ensure_compile_time_eval():
            self._band = (plan, jnp.asarray(data_t), jnp.asarray(plan.rel))
        return self

    def matvec(self, x):
        ns, k, b, _ = self.data.shape
        band = self._resolve_band()
        if band not in (None, "unresolved"):
            from tpufem.sparse.ell_pallas import bcsr_matvec_pallas
            plan, data_dev, rel_dev = band
            xc = x.reshape(ns, b).T                    # component-major
            y = bcsr_matvec_pallas(plan, data_dev, rel_dev, xc,
                                   interpret=jax.default_backend() != "tpu")
            return y.T.reshape(-1)
        xb = x.reshape(ns, b)
        gathered = xb[self.cols]                       # [ns, K, b]
        y = (self.data * gathered[:, :, None, :]).sum(axis=(1, 3))
        return y.reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal_blocks(self):
        rows = jnp.arange(self.data.shape[0])
        return self.data[rows, self.diag_pos]          # [ns, b, b]

    def to_dense(self):
        ns, k, b, _ = self.data.shape
        n = ns * b
        A = jnp.zeros((n, n), self.data.dtype)
        for kk in range(k):
            rows = jnp.repeat(jnp.arange(ns) * b, b * b)
            cols = jnp.repeat(self.cols[:, kk] * b, b * b)
            ri = jnp.tile(jnp.repeat(jnp.arange(b), b), ns)
            ci = jnp.tile(jnp.tile(jnp.arange(b), b), ns)
            A = A.at[rows + ri, cols + ci].add(self.data[:, kk].reshape(-1))
        return A


def assemble_bcsr_arrays(slots, cols, diag_pos, element_matrices,
                         block_size: int) -> BCSRMatrix:
    """Array-argument variant of :func:`assemble_bcsr` — jit-friendly.

    ``slots`` is the flat [NE*nl*nl] scatter plan, ``cols``/``diag_pos``
    the device pattern arrays.  Pass these THROUGH the jit boundary as
    arguments: calling the pattern-object variant inside a trace would
    bake the ~100 MB plan into the lowered HLO as constants
    (BENCH_NOTES r4 — the 241 s eager / 415 s lowering walls)."""
    ns, K = cols.shape
    ne = element_matrices.shape[0]
    b = block_size
    nl = element_matrices.shape[1] // b
    Ke = element_matrices.reshape(ne, nl, b, nl, b)
    blocks = jnp.transpose(Ke, (0, 1, 3, 2, 4)).reshape(-1, b, b)
    flat = jnp.zeros((ns * K, b, b), blocks.dtype).at[slots].add(blocks)
    return BCSRMatrix(data=flat.reshape(ns, K, b, b), cols=cols,
                      diag_pos=diag_pos)


def assemble_bcsr(pattern: ELLPattern, element_matrices, block_size: int
                  ) -> BCSRMatrix:
    """Local matrices [NE, nl*b, nl*b] (node-major-comp-minor DOF order) ->
    BCSR on the scalar node pattern.

    ``pattern`` must be built over the scalar DOF connectivity.
    """
    return assemble_bcsr_arrays(jnp.asarray(pattern.slots.reshape(-1)),
                                jnp.asarray(pattern.cols),
                                jnp.asarray(pattern.diag_pos),
                                element_matrices, block_size)


def apply_dirichlet_bcsr(A: BCSRMatrix, b_vec, bc_mask, bc_values=None):
    """Symmetric DOF-level Dirichlet elimination on a BCSR system."""
    mask = jnp.asarray(bc_mask)
    if bc_values is None:
        g = jnp.zeros_like(b_vec)
    else:
        g = jnp.broadcast_to(jnp.asarray(bc_values, b_vec.dtype), b_vec.shape)
    g = jnp.where(mask, g, 0)
    b_vec = b_vec - A.matvec(g)
    b_vec = jnp.where(mask, g, b_vec)

    ns, K, bs, _ = A.data.shape
    mask_b = mask.reshape(ns, bs)
    row_keep = (~mask_b).astype(A.data.dtype)          # [ns, b]
    col_keep = (~mask_b[A.cols]).astype(A.data.dtype)  # [ns, K, b]
    data = A.data * row_keep[:, None, :, None] * col_keep[:, :, None, :]
    # identity on constrained diagonal entries
    rows = jnp.arange(ns)
    diag = data[rows, A.diag_pos]
    diag = diag + mask_b[:, :, None] * jnp.eye(bs, dtype=data.dtype)
    data = data.at[rows, A.diag_pos].set(diag)
    return BCSRMatrix(data, A.cols, A.diag_pos), b_vec
