"""Checkpointing of preprocessed mesh/discretization artifacts.

The reference rebuilds all state per run (SURVEY.md §5.4); at 10M+ dofs the
host-side preprocessing (topology extraction, dof tables, scatter maps,
partition layouts) is expensive enough to persist. Plain .npz format — the
artifacts are all dense integer/float arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_space", "load_space", "save_arrays", "load_arrays"]


def save_arrays(path: str, **arrays) -> None:
    np.savez_compressed(path, **arrays)


def load_arrays(path: str) -> dict:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def save_space(path: str, space) -> None:
    """Persist a FEMSpace (mesh + dof tables + scatter structure)."""
    rows, cols, inv = space.scatter
    save_arrays(
        path,
        nodes=space.mesh.nodes,
        cells=space.mesh.cells,
        boundary=space.mesh.boundary_node_markers(),
        order=np.asarray(space.order),
        dofs=space.dofs,
        boundary_dofs=space.boundary_dofs,
        scatter_rows=rows,
        scatter_cols=cols,
        scatter_inv=inv,
    )


def load_space(path: str):
    """Rebuild a FEMSpace from a checkpoint, reusing the stored scatter maps."""
    from ..fem.space import FEMSpace
    from ..geometry.triangulation import Triangulation

    data = load_arrays(path)
    mesh = Triangulation(data["nodes"], data["cells"], data["boundary"])
    space = FEMSpace(mesh, int(data["order"]))
    # seed the cached properties with the persisted artifacts
    space.__dict__["scatter"] = (
        data["scatter_rows"],
        data["scatter_cols"],
        data["scatter_inv"],
    )
    if not np.array_equal(space.dofs, data["dofs"]):
        raise ValueError(f"checkpoint {path} does not match the rebuilt dof table")
    return space
