"""Point location: which cell contains each query point.

Replaces the reference's pointer-chasing ADT search
(/root/reference/fdaPDE/geometry/tree_search.h) and barycentric walk
(walk_search.h) with a uniform-grid candidate filter + exact vectorized
barycentric `contains` test (semantics of simplex.h:115-127, including the
manifold supporting-plane distance check). The grid maps directly onto TPU
gather patterns for a future device implementation; here it runs host-side as
mesh preprocessing.
"""

from __future__ import annotations

import numpy as np

MACHINE_EPSILON = 10 * np.finfo(np.float64).eps  # utils/symbols.h:164

__all__ = ["CellLocator", "contains"]


def contains(mesh, cell_ids: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Exact containment test of points[i] in cell cell_ids[i] (vectorized).

    Mirrors Simplex::contains (simplex.h:115-127): barycentric coordinates
    must all be >= -machine_epsilon; on manifolds the point must additionally
    lie on the supporting plane (distance <= machine_epsilon).
    """
    from .affine import affine_maps_np

    J, invJ, _ = affine_maps_np(mesh.nodes, mesh.cells)
    p0 = mesh.nodes[mesh.cells[cell_ids, 0]]  # (k, N)
    d = points - p0
    z = np.einsum("kmn,kn->km", invJ[cell_ids], d)  # (k, M)
    z0 = 1.0 - z.sum(axis=1)
    inside = (z >= -MACHINE_EPSILON).all(axis=1) & (z0 >= -MACHINE_EPSILON)
    if mesh.is_manifold:
        # distance from supporting plane: || p - (p0 + J z) ||
        proj = p0 + np.einsum("knm,km->kn", J[cell_ids], z)
        dist = np.linalg.norm(points - proj, axis=1)
        inside &= dist <= MACHINE_EPSILON
    return inside


class CellLocator:
    """Uniform-grid spatial index over cell bounding boxes."""

    def __init__(self, mesh, resolution: int | None = None):
        self.mesh = mesh
        coords = mesh.cell_coords  # (C, M+1, N)
        self.lo = coords.min(axis=1)  # (C, N)
        self.hi = coords.max(axis=1)
        self.gmin = mesh.range[0]
        self.gmax = mesh.range[1]
        N = mesh.embed_dim
        if resolution is None:
            resolution = max(1, int(np.ceil(mesh.n_cells ** (1.0 / N))))
        self.res = resolution
        span = np.where(self.gmax > self.gmin, self.gmax - self.gmin, 1.0)
        self.scale = self.res / span
        # bin ranges per cell; register each cell in all bins its bbox
        # overlaps — fully vectorized (ragged expansion over the span grid)
        lo_bin = self._bin(self.lo)  # (C, N)
        hi_bin = self._bin(self.hi)
        spans = hi_bin - lo_bin + 1
        counts = spans.prod(axis=1)
        total = int(counts.sum())
        cell_ids = np.repeat(np.arange(mesh.n_cells, dtype=np.int32), counts)
        resets = np.repeat(np.cumsum(counts) - counts, counts)
        local = np.arange(total, dtype=np.int64) - resets  # rank within cell
        spans_rep = spans[cell_ids]
        lo_rep = lo_bin[cell_ids]
        # decode row-major local rank into per-axis offsets
        bin_ids = np.zeros(total, dtype=np.int64)
        divisor = np.ones(total, dtype=np.int64)
        for d in range(N - 1, -1, -1):
            off = (local // divisor) % spans_rep[:, d]
            bin_ids += (lo_rep[:, d] + off) * self.res ** (N - 1 - d)
            divisor *= spans_rep[:, d]
        order = np.argsort(bin_ids, kind="stable")
        self.bin_cells = cell_ids[order]
        counts = np.bincount(bin_ids, minlength=self.res**N)
        self.bin_offsets = np.zeros(self.res**N + 1, dtype=np.int64)
        np.cumsum(counts, out=self.bin_offsets[1:])

    def _bin(self, pts):
        b = np.floor((pts - self.gmin) * self.scale).astype(np.int64)
        return np.clip(b, 0, self.res - 1)

    def locate(self, points: np.ndarray) -> np.ndarray:
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        n = points.shape[0]
        out = np.full(n, -1, dtype=np.int32)
        inside_box = np.logical_and(
            (points >= self.gmin - MACHINE_EPSILON).all(axis=1),
            (points <= self.gmax + MACHINE_EPSILON).all(axis=1),
        )
        bins = np.ravel_multi_index(
            self._bin(points).T, (self.res,) * self.mesh.embed_dim
        )
        # expand (point, candidate cell) pairs, then one vectorized contains()
        starts = self.bin_offsets[bins]
        ends = self.bin_offsets[bins + 1]
        counts = (ends - starts) * inside_box
        pt_idx = np.repeat(np.arange(n), counts)
        if pt_idx.size:
            # ragged arange: flat candidate positions without a Python loop
            total = int(counts.sum())
            resets = np.repeat(np.cumsum(counts) - counts, counts)
            pos = np.arange(total) - resets + np.repeat(starts, counts)
            cand = self.bin_cells[pos]
            hit = contains(self.mesh, cand, points[pt_idx])
            # keep first hit per point
            hp, hc = pt_idx[hit], cand[hit]
            # reverse so earlier candidates win after assignment
            out[hp[::-1]] = hc[::-1]
        return out
