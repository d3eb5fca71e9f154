"""Fixed-width (ELL) sparse matrix container + SpMV.

The reference stores its sparse matrix as a row-major [M, MAX_NEIGHBOR] value
array indexed by per-row neighbor lists
(/root/reference/fea_test_sm_sym_sparse2.cu:273-282).  That fixed-width layout
is already the TPU-friendly one: here it becomes a pytree of
``data [NN, K]`` + ``cols [NN, K]`` whose SpMV is a single gather + weighted
row reduction — fully vectorized, no per-entry search, no atomics.  Padding
slots point at their own row with value 0, so no masking is needed in matvec.

``matvec`` auto-dispatches: when the matrix is banded (bandwidth small
enough for the sliding-window kernel — true for RCM-ordered meshes), a
:func:`tpufem.sparse.ell_pallas.ell_band_plan` is built once, cached on the
instance, and the ~500x-faster Pallas kernel is used (0.11 ms vs 57.8 ms
at 1M rows on a v5e); otherwise it falls back to the XLA gather.  The fast
path must not be opt-in expert knowledge (VERDICT.md r2 item 8).  On
non-TPU backends the kernel runs in (slow) interpret mode — right for
correctness tests, wrong for CPU benchmarking; set
``TPUFEM_BAND_DISPATCH=0`` to force the gather path.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["ELLMatrix", "ell_matvec", "ell_matvec_multi"]

# bandwidth above this is not auto-planned (window = 3R values in VMEM;
# R=4096 -> 48 KB window at fp32, still tiny — the real cost of a large R
# is more delta rounds per slot, which scales with bandwidth not R)
_AUTO_BAND_MAX = 4096


@jax.tree_util.register_pytree_node_class
class ELLMatrix:
    """ELL sparse matrix: data [NN, K], cols [NN, K] (int32)."""

    def __init__(self, data, cols, row_lengths=None, diag_pos=None):
        self.data = data
        self.cols = cols
        self.row_lengths = row_lengths
        self.diag_pos = diag_pos
        # banded fast-path cache: (plan, data_dev, rel_dev) | None once
        # resolved; "unresolved" until first matvec.
        self._band = "unresolved"

    # -- pytree protocol ---------------------------------------------------
    # The banded plan splits across the pytree protocol: its DEVICE ARRAYS
    # (data_t, rel) are children — so an ELLMatrix passed as a jit ARGUMENT
    # keeps the Pallas fast path with the arrays arriving as runtime
    # parameters — while the static metadata (block size, delta lists,
    # segmentation) rides aux_data, which jit hashes into its dispatch key.
    # This is what keeps big operators OUT of the lowered HLO: a
    # closure-captured ELLMatrix bakes ~100 MB of constants into the
    # module (415 s lowering / HTTP 413 over the compile relay at 1M rows,
    # BENCH_NOTES r4); the same matrix as an argument adds ~nothing.
    def tree_flatten(self):
        band = self._band
        if isinstance(band, tuple):
            plan, data_dev, rel_dev = band
            static_plan = plan._replace(rel=None, data_t=None, dtab=None)
            children = (self.data, self.cols, self.row_lengths,
                        self.diag_pos, (data_dev, rel_dev))
            return children, static_plan
        children = (self.data, self.cols, self.row_lengths, self.diag_pos,
                    None)
        return children, band                 # None | "unresolved"

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols, row_lengths, diag_pos, band_arrays = children
        obj = cls(data, cols, row_lengths, diag_pos)
        if isinstance(aux, tuple) and hasattr(aux, "block_rows"):
            obj._band = (aux, band_arrays[0], band_arrays[1])
        else:
            obj._band = aux                   # None | "unresolved"
        return obj

    # -- shapes ---------------------------------------------------------------
    @property
    def shape(self):
        n = self.data.shape[0]
        return (n, n)

    @property
    def width(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    # -- ops -------------------------------------------------------------------
    def _resolve_band(self):
        """Build + cache the banded Pallas plan if this matrix qualifies.

        Qualifies = data/cols are concrete (not tracers) and the bandwidth
        is <= _AUTO_BAND_MAX.  The plan's device arrays are created on the
        default device once and reused across matvecs/traces.
        """
        if self._band != "unresolved":
            return self._band
        if (isinstance(self.data, jax.core.Tracer)
                or isinstance(self.cols, jax.core.Tracer)):
            return "unresolved"   # retry on a later (concrete) call
        self._band = None
        if os.environ.get("TPUFEM_BAND_DISPATCH", "1") == "0":
            return None
        try:
            cols = np.asarray(self.cols)
            n = cols.shape[0]
            bw = int(np.abs(cols.astype(np.int64)
                            - np.arange(n)[:, None]).max())
            if bw <= _AUTO_BAND_MAX:
                from tpufem.sparse.ell_pallas import auto_block_rows
                # bw already scanned here — pass the derived block size so
                # ell_band_plan doesn't rescan (same policy, one source)
                self.prime_band_plan(
                    auto_block_rows(bw, n, cols.shape[1]))
        except Exception as exc:
            # name the failure before pinning the gather fallback — a
            # silent swallow here is exactly the round-4 472 ms/V-cycle
            # pathology class (BENCH_NOTES r4b phase 5b)
            import warnings
            warnings.warn(
                f"ELLMatrix band-plan build failed ({type(exc).__name__}: "
                f"{exc}); falling back to gather SpMV (~500x slower at "
                "scale)", RuntimeWarning, stacklevel=2)
            self._band = None
        return self._band

    def resolve_band(self):
        """Resolve the banded fast path NOW under the automatic policy
        (builds the plan iff bandwidth <= _AUTO_BAND_MAX and dispatch is
        enabled).  Call before passing the matrix THROUGH a jit boundary:
        inside the trace the arrays are tracers and lazy resolution can no
        longer happen, so an unresolved matrix would ride the gather."""
        self._resolve_band()
        return self

    def prime_band_plan(self, block_rows=None, segment: bool = True):
        """Build + cache the banded Pallas plan UNCONDITIONALLY.

        Unlike the automatic dispatch (which declines when the bandwidth
        exceeds ``_AUTO_BAND_MAX``), this covers any bandwidth — the plan
        just picks a block size >= the bandwidth.  Use for very-wide-band
        systems (e.g. 3D unstructured at ~1M DOFs, RCM bandwidth ~ n^(2/3))
        where the silent gather fallback would cost ~500x.  Raises on
        failure instead of falling back.

        ``segment=False`` builds the single-global-kernel plan: one Pallas
        payload per matvec instead of up to 16.  Right for matrices whose
        matvecs are emitted MANY times into one program (AMG coarse
        levels inside an unrolled V/W-cycle: the interval-V hierarchy at
        501k rows serialized to a 262 MB executable / 358 s server
        compile, hw r5 phase 5) at a small per-step round cost.
        """
        from tpufem.sparse.ell_pallas import ell_band_plan
        plan = ell_band_plan(np.asarray(self.data), np.asarray(self.cols),
                             block_rows=block_rows, segment=segment)
        # resolution may happen while tracing (matvec called on a
        # tracer x with concrete A captured by closure): force the
        # cached device arrays to stay concrete, not trace-staged
        with jax.ensure_compile_time_eval():
            self._band = (plan, jnp.asarray(plan.data_t),
                          jnp.asarray(plan.rel))
        return self

    def matvec(self, x):
        band = self._resolve_band()
        if band not in (None, "unresolved"):
            from tpufem.sparse.ell_pallas import ell_matvec_pallas
            plan, data_dev, rel_dev = band
            interp = jax.default_backend() != "tpu"

            # pallas_call has no autodiff rule; the matvec is linear in x,
            # so declare the (exact) JVP explicitly — this is what lets
            # jax.jvp differentiate residuals built on the banded kernel
            # (matrix-free Newton-Krylov, tpufem.solve.newton)
            @jax.custom_jvp
            def mv(v):
                return ell_matvec_pallas(plan, data_dev, rel_dev, v,
                                         interpret=interp)

            @mv.defjvp
            def _mv_jvp(primals, tangents):
                (v,), (dv,) = primals, tangents
                return mv(v), mv(dv)

            return mv(x)
        return ell_matvec(self.data, self.cols, x)

    def __matmul__(self, x):
        return self.matvec(x)

    def matvec_multi(self, X):
        """Y = A X for X [n, q] — one matrix read for all q RHS.

        Banded fast path: ell_matvec_pallas_multi streams the matrix
        planes once per row-block across the q grid steps (the matrix is
        the dominant HBM traffic at K~8-14 slots, so this approaches a
        q-fold win over q single matvecs).  Feeds cg_fixed_block /
        eigen's batched inner solves."""
        band = self._resolve_band()
        if band not in (None, "unresolved"):
            from tpufem.sparse.ell_pallas import ell_matvec_pallas_multi
            plan, data_dev, rel_dev = band
            interp = jax.default_backend() != "tpu"

            @jax.custom_jvp
            def mvm(V):
                return ell_matvec_pallas_multi(plan, data_dev, rel_dev, V,
                                               interpret=interp)

            @mvm.defjvp
            def _mvm_jvp(primals, tangents):
                (V,), (dV,) = primals, tangents
                return mvm(V), mvm(dV)

            return mvm(X)
        return ell_matvec_multi(self.data, self.cols, X)

    def diagonal(self):
        """Diagonal extraction for Jacobi preconditioning."""
        if self.diag_pos is not None:
            return jnp.take_along_axis(
                self.data, self.diag_pos[:, None].astype(jnp.int32), axis=1
            )[:, 0]
        n = self.data.shape[0]
        rows = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        is_diag = self.cols == rows
        # Padding slots also satisfy cols == row but hold 0, and the real
        # diagonal appears exactly once, so a masked row-sum is exact.
        return jnp.where(is_diag, self.data, 0).sum(axis=1)

    def to_dense(self):
        n, k = self.data.shape
        rows = jnp.repeat(jnp.arange(n), k)
        return (jnp.zeros((n, n), self.data.dtype)
                .at[rows, self.cols.reshape(-1)].add(self.data.reshape(-1)))

    def transpose_matvec(self, x):
        """A^T @ x via scatter-add (A is symmetric for all our operators,
        so this is mostly for verification)."""
        n, k = self.data.shape
        contrib = self.data * x[:, None]
        return (jnp.zeros_like(x).at[self.cols.reshape(-1)]
                .add(contrib.reshape(-1)))


def ell_matvec(data, cols, x):
    """y[i] = sum_k data[i, k] * x[cols[i, k]] — gather + row reduction."""
    return (data * x[cols]).sum(axis=1)


def ell_matvec_multi(data, cols, X):
    """Y[i, :] = sum_k data[i, k] * X[cols[i, k], :] — multi-RHS gather."""
    return (data[..., None] * X[cols]).sum(axis=1)


def reorder_ell(data, cols, perm):
    """Symmetric permutation A' = P A P^T of an ELL matrix (host setup).

    ``perm``: new index i holds old row perm[i] (e.g. from
    mesh.adjacency.reverse_cuthill_mckee).  Solves of A' y' = (P b) relate by
    y = y'[inv], x' = x[perm].  Returns (data', cols') numpy arrays.
    """
    import numpy as np

    data = np.asarray(data)
    cols = np.asarray(cols)
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return data[perm], inv[cols[perm]].astype(cols.dtype)
