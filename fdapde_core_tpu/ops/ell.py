"""Scatter-free matrix-free SpMV via ELL dof adjacency.

The matrix-free FEM SpMV has three stages:

    gather   xe = x[dofs]                  (C, nb)
    contract ye = A_loc @ xe               (C, nb)   batched 3x3/6x6 matvecs
    combine  y[d] = sum of ye over all (cell, slot) incident to dof d

The reference does stage 3 with Eigen's scatter (setFromTriplets semantics);
the straightforward XLA form is `segment_sum` — a scatter-add, which TPUs
execute serially per-duplicate. Here stage 3 is re-expressed as a GATHER:
a precomputed ELL table `adj[d, k]` lists the flat (cell*nb + slot) incident
positions of dof d (padded to the max vertex degree), so

    y = (ye.flat[adj] * mask).sum(axis=1)

is a dense gather + reduction over a tiny axis — fully vectorizable on the
VPU. The adjacency build itself is one device `argsort` + `searchsorted`,
so the whole pipeline (build + iterate) runs on-chip with no host transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["build_ell_adjacency", "ell_spmv", "local_matvec"]


def build_ell_adjacency(dofs, n_dofs: int, max_degree: int):
    """ELL incidence table of a dof table.

    dofs: (C, nb) int32. Returns (adj (n_dofs, max_degree) int32 flat indices
    into the flattened (C*nb,) element-local vector, mask (n_dofs,
    max_degree) dtype-bool, overflowed: scalar bool — true if any dof has
    degree > max_degree (caller should rebuild with a larger bound).
    """
    flat = dofs.reshape(-1)
    order = jnp.argsort(flat, stable=True).astype(jnp.int32)
    sorted_d = flat[order]
    ids = jnp.arange(n_dofs, dtype=dofs.dtype)
    starts = jnp.searchsorted(sorted_d, ids)
    ends = jnp.searchsorted(sorted_d, ids + 1)
    counts = ends - starts
    k = jnp.arange(max_degree, dtype=jnp.int32)
    idx = starts[:, None] + k[None, :]
    mask = k[None, :] < counts[:, None]
    adj = order[jnp.clip(idx, 0, flat.shape[0] - 1)]
    return adj, mask, jnp.any(counts > max_degree)


def local_matvec(A_loc, dofs, x):
    """Stages 1+2: per-element products ye = A_loc @ x[dofs], (C, nb)."""
    xe = x[dofs]
    return jnp.einsum("cij,cj->ci", A_loc, xe)


def ell_spmv(A_loc, dofs, adj, mask, x):
    """Full scatter-free SpMV: y = A @ x with A given element-locally."""
    ye = local_matvec(A_loc, dofs, x).reshape(-1)
    gathered = ye[adj] * mask.astype(ye.dtype)
    return gathered.sum(axis=1)
