"""Structured mesh generators (benchmarks, examples, sharding tests).

The reference ships static CSV meshes only; large-scale benchmarking needs
generated meshes. `unit_square_mesh(n)` reproduces the classic two-triangle
split of an n x n grid (same family as the reference's unit_square_{16..128}
fixtures).
"""

from __future__ import annotations

import numpy as np

from .triangulation import Triangulation

__all__ = ["unit_square_mesh", "unit_interval_mesh"]


def unit_square_mesh(n: int) -> Triangulation:
    """Uniform triangulation of [0,1]^2 with (n+1)^2 nodes, 2*n^2 cells."""
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    nodes = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    a = (i * (n + 1) + j).reshape(-1)  # lower-left node of each quad
    b = a + (n + 1)  # lower-right (next row in x)
    lower = np.stack([a, b, a + 1], axis=1)
    upper = np.stack([b, b + 1, a + 1], axis=1)
    cells = np.concatenate([lower, upper], axis=0).astype(np.int32)
    boundary = (
        (nodes[:, 0] == 0.0)
        | (nodes[:, 0] == 1.0)
        | (nodes[:, 1] == 0.0)
        | (nodes[:, 1] == 1.0)
    )
    return Triangulation(nodes, cells, boundary)


def unit_interval_mesh(n: int):
    from .interval import Interval

    return Interval(0.0, 1.0, n)
