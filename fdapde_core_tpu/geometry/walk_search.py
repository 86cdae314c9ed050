"""Barycentric walk point location for convex planar meshes.

Counterpart of /root/reference/fdaPDE/geometry/walk_search.h:27-62: starting
from a (random) cell, hop to the neighbor opposite the most-negative
barycentric coordinate until the point is contained; falls back to -1 after
visiting too many cells (non-convex domains can trap the walk — the
reference uses a visited set; the grid locator in point_location.py is the
robust default).
"""

from __future__ import annotations

import numpy as np

from .affine import affine_maps_np

__all__ = ["walk_search"]


def walk_search(mesh, points: np.ndarray, start: int | None = None, max_hops: int | None = None) -> np.ndarray:
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    _, invJ, _ = affine_maps_np(mesh.nodes, mesh.cells)
    v0 = mesh.nodes[mesh.cells[:, 0]]
    neighbors = mesh.neighbors
    M = mesh.local_dim
    if max_hops is None:
        max_hops = 4 * int(np.sqrt(mesh.n_cells)) + 50
    rng = np.random.default_rng(0)
    out = np.full(points.shape[0], -1, dtype=np.int32)
    eps = 10 * np.finfo(np.float64).eps
    for k, p in enumerate(points):
        c = start if start is not None else int(rng.integers(mesh.n_cells))
        visited = set()
        for _ in range(max_hops):
            if c in visited:
                break
            visited.add(c)
            z = invJ[c] @ (p - v0[c])
            bary = np.concatenate([[1.0 - z.sum()], z])
            j = int(np.argmin(bary))
            if bary[j] >= -eps:  # contained
                out[k] = c
                break
            # hop across the facet opposite the most negative coordinate:
            # neighbors[c, v] is the cell opposite vertex v (walk_search.h:44-52)
            nxt = neighbors[c, j]
            if nxt < 0:
                break
            c = int(nxt)
    return out
