"""Point-to-mesh projection.

Counterpart of /root/reference/fdaPDE/geometry/project.h: find, for each
query point, its best approximation on the mesh. `exact` scans every cell's
nearest-point (project.h Exact policy); the default approximate policy finds
the nearest mesh node via KD-tree and searches only its cell patch
(project.h:34-69 NotExact).
"""

from __future__ import annotations

import numpy as np

from .kd_tree import KDTree

__all__ = ["project", "nearest_on_simplex"]


def nearest_on_simplex(coords: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Nearest point to `p` on the simplex with vertex rows `coords`.

    Recursive descent to the nearest boundary sub-simplex, mirroring
    Simplex::nearest (simplex.h:157-181).
    """
    coords = np.asarray(coords, dtype=np.float64)
    k = coords.shape[0]  # number of vertices = local_dim + 1
    # solve least squares for barycentric coordinates
    D = (coords[1:] - coords[0]).T
    z, *_ = np.linalg.lstsq(D, p - coords[0], rcond=None)
    bary = np.concatenate([[1.0 - z.sum()], z])
    eps = 10 * np.finfo(np.float64).eps
    proj = coords[0] + D @ z
    if (bary >= -eps).all():
        return proj
    if k == 2:
        return coords[1] if bary[0] < 0 else coords[0]
    # recurse on the facet excluding the farthest vertex (simplex.h:171-179)
    dst = np.linalg.norm(coords - p, axis=1)
    keep = np.argsort(dst, kind="stable")[:-1]
    return nearest_on_simplex(coords[np.sort(keep)], p)


def project(mesh, points: np.ndarray, exact: bool = False) -> np.ndarray:
    """Project each point onto the mesh surface/volume."""
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    out = np.empty_like(points)
    if exact:
        for i, p in enumerate(points):
            best, bd = None, np.inf
            for c in range(mesh.n_cells):
                q = nearest_on_simplex(mesh.cell_coords[c], p)
                d = np.linalg.norm(q - p)
                if d < bd:
                    best, bd = q, d
            out[i] = best
        return out
    tree = KDTree(mesh.nodes)
    for i, p in enumerate(points):
        nid = tree.nn_search(p)
        best, bd = mesh.nodes[nid], np.linalg.norm(mesh.nodes[nid] - p)
        for c in mesh.node_patch(nid):
            q = nearest_on_simplex(mesh.cell_coords[c], p)
            d = np.linalg.norm(q - p)
            if d < bd:
                best, bd = q, d
        out[i] = best
    return out
