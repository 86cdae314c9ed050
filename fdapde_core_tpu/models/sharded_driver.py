"""High-level multi-chip elliptic driver.

Bridges the PDE-level API to the distributed executors: assemble on the
device mesh, reduce boundary data, pick the communication strategy:

- small (col-row) offset set (structured / strongly banded dof numbering):
  DIA storage + halo-exchange CG (`parallel/halo.py`, two ppermute strips
  per iteration),
- otherwise: element-sharded matrix-free CG with a full-vector psum per
  iteration (`parallel/sharded.py`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.assembler import assemble_forcing, assemble_matrix
from ..fem.solvers import DirichletSystem
from ..fem.space import FEMSpace
from ..linear_algebra.dia import dia_from_coo, unique_offsets
from ..parallel.halo import HaloDIASolver
from ..parallel.sharded import ShardedPoisson, make_device_mesh

__all__ = ["solve_elliptic_sharded"]


def solve_elliptic_sharded(
    mesh,
    operator,
    forcing,
    dirichlet,
    order: int = 1,
    device_mesh=None,
    rtol: float = 1e-10,
    maxiter: int = 2000,
    max_dia_offsets: int = 64,
):
    """Assemble + solve a (symmetric) elliptic problem over a device mesh.

    Returns (solution, info dict with strategy/iterations/residual).
    """
    device_mesh = device_mesh or make_device_mesh()
    space = FEMSpace(mesh, order)
    g = jnp.asarray(dirichlet)
    offsets = unique_offsets(space.dofs)

    if len(offsets) <= max_dia_offsets:
        A = assemble_matrix(space, operator)
        F = assemble_forcing(space, forcing)
        mask = jnp.asarray(space.boundary_dofs)
        D = dia_from_coo(A.rows, A.cols, A.vals, space.n_dofs, offsets)
        b_mod = DirichletSystem(A, mask).rhs(F, g)
        solver = HaloDIASolver(D, device_mesh)
        x, res, k = solver.solve(
            b_mod, (~mask).astype(D.data.dtype), rtol=rtol, maxiter=maxiter
        )
        info = {"strategy": "halo_dia", "n_offsets": len(offsets)}
    else:
        sp = ShardedPoisson(mesh, order, device_mesh, operator=operator)
        F = assemble_forcing(space, forcing)
        x, res, k = sp.solve(F, g, rtol=rtol, maxiter=maxiter)
        info = {"strategy": "replicated_psum"}
    info.update(
        {"iterations": int(k), "residual": float(res), "n_dofs": space.n_dofs}
    )
    return x, info
