"""Matrix-free operators: apply A without materializing it.

BASELINE.md config 5: at 10M DOFs the global matrix never exists; each CG
iteration gathers local DOFs per element, applies the local operator, and
scatter-adds back.  Two flavours:

  * ``element_operator``      — stored local matrices Ke [NE, n, n]
                                (partial assembly: n² floats per element);
  * ``poisson_operator``      — P1 Poisson factored form y_e = G (G^T x_e) v
                                (n*d + 1 floats per element: ~2.7x less
                                memory than Ke in 2D, ~3.2x in 3D), or fully
                                on-the-fly from coordinates (zero stored
                                state beyond the mesh).

All variants are closures over jnp arrays, jit-able and shardable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.assemble.local import affine_geometry
from tpufem.fem.elements import ReferenceElement

__all__ = ["element_operator", "poisson_operator"]

_REF_VOLUME = {"triangle": 0.5, "tetrahedron": 1.0 / 6.0}


def element_operator(dof_conn, Ke, num_dofs: int):
    """matvec from stored local matrices: gather -> batched matmul -> scatter."""
    conn = jnp.asarray(dof_conn)

    def matvec(x):
        xe = x[conn]                                   # [NE, n]
        ye = (Ke * xe[:, None, :]).sum(2)
        return jnp.zeros(num_dofs, x.dtype).at[conn].add(ye)

    return matvec


def poisson_operator(ecoords, dof_conn, num_dofs: int,
                     element: ReferenceElement, *, on_the_fly: bool = False):
    """P1 Poisson matrix-free matvec.

    Factored application y_e = G_e (G_e^T x_e) * vol_e never forms Ke; with
    ``on_the_fly=True`` even G is recomputed from coordinates inside each
    matvec (trading ~2x flops for minimal memory traffic — usually the right
    trade on TPU where assembly is bandwidth-bound, SURVEY.md §7).
    """
    conn = jnp.asarray(dof_conn)
    refvol = _REF_VOLUME[element.cell_type]

    if on_the_fly:
        ecoords = jnp.asarray(ecoords)

        def matvec(x):
            G, adet = affine_geometry(ecoords, element)
            vol = adet * refvol
            xe = x[conn]
            t = (G * xe[:, :, None]).sum(1) * vol[:, None]
            ye = (G * t[:, None, :]).sum(2)
            return jnp.zeros(num_dofs, x.dtype).at[conn].add(ye)

        return matvec

    G, adet = affine_geometry(jnp.asarray(ecoords), element)
    # fold the volume into G once: K_e = (G sqrt(v)) (G sqrt(v))^T
    Gs = G * jnp.sqrt(adet * refvol)[:, None, None]

    def matvec(x):
        xe = x[conn]
        t = (Gs * xe[:, :, None]).sum(1)
        ye = (Gs * t[:, None, :]).sum(2)
        return jnp.zeros(num_dofs, x.dtype).at[conn].add(ye)

    return matvec
