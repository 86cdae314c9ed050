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


def save_amg(path: str, mg) -> None:
    """Persist an SA-AMG hierarchy (linear_algebra/amg.py).

    The setup (strength graph, aggregation, Galerkin products) is host-side
    and the expensive part at scale; the apply-side pytree round-trips
    losslessly through npz.
    """
    arrays = {
        "meta": np.asarray(
            [mg.omega, float(mg.nu), mg.cheby_lower,
             1.0 if mg.smoother == "chebyshev" else 0.0]
        ),
        "rhos": np.asarray(mg.rhos),
        "coarse_inv": np.asarray(mg.coarse_inv),
        "n_levels": np.asarray(len(mg.As)),
    }
    for i, (A, P, R, d) in enumerate(zip(mg.As, mg.Ps, mg.Rs, mg.dinvs)):
        for name, M in (("A", A), ("P", P), ("R", R)):
            arrays[f"{name}{i}_rows"] = np.asarray(M.rows)
            arrays[f"{name}{i}_cols"] = np.asarray(M.cols)
            arrays[f"{name}{i}_vals"] = np.asarray(M.vals)
            arrays[f"{name}{i}_shape"] = np.asarray(M.shape)
        arrays[f"dinv{i}"] = np.asarray(d)
    save_arrays(path, **arrays)


def load_amg(path: str):
    """Rebuild an AMG hierarchy saved by save_amg."""
    import jax.numpy as jnp

    from ..linear_algebra.amg import AMG
    from ..linear_algebra.sparse import SparseMatrix

    data = load_arrays(path)
    n_levels = int(data["n_levels"])

    def sp(name, i):
        return SparseMatrix(
            jnp.asarray(data[f"{name}{i}_rows"]),
            jnp.asarray(data[f"{name}{i}_cols"]),
            jnp.asarray(data[f"{name}{i}_vals"]),
            tuple(int(v) for v in data[f"{name}{i}_shape"]),
        )

    As = [sp("A", i) for i in range(n_levels)]
    Ps = [sp("P", i) for i in range(n_levels)]
    Rs = [sp("R", i) for i in range(n_levels)]
    dinvs = [jnp.asarray(data[f"dinv{i}"]) for i in range(n_levels)]
    omega, nu, cheby_lower, is_cheby = data["meta"]
    return AMG(
        As, Ps, Rs, dinvs, jnp.asarray(data["coarse_inv"]),
        float(omega), int(nu), [float(r) for r in data["rhos"]],
        "chebyshev" if is_cheby == 1.0 else "jacobi", float(cheby_lower),
    )
