"""FEMSpace: degrees of freedom, basis tabulations, and scatter structure.

Counterpart of the reference's `LagrangianBasis` dof handler
(/root/reference/fdaPDE/finite_elements/basis/lagrangian_basis.h:94-183) plus
the sparsity preprocessing that replaces Eigen `setFromTriplets`.

Dof numbering parity with the reference (so that P1/P2 golden matrices match):
- order 1: dof i == mesh node i (lagrangian_basis.h:96-99),
- order 2: dofs are mesh nodes followed by one dof per edge, numbered
  n_nodes + edge_id with the first-encounter edge numbering of the
  triangulation (lagrangian_basis.h:100-134); the dof sits in cell slot
  (M+1) + local_edge_index (lex edge order),
- a P2 edge dof is on the boundary iff its edge is (lagrangian_basis.h:124).
"""

from __future__ import annotations

from functools import cached_property

import numpy as np

from ..utils.combinatorics import combinations
from .basis import LagrangeBasis, tabulate_basis

__all__ = ["FEMSpace"]


class FEMSpace:
    """Lagrange finite-element space of order R over a triangulation."""

    def __init__(self, mesh, order: int = 1):
        if order not in (1, 2):
            raise NotImplementedError("FEM orders 1 and 2 are supported (as upstream: lagrangian_basis.h:94)")
        self.mesh = mesh
        self.order = order
        M = mesh.local_dim
        self.ref_basis = LagrangeBasis(M, order)
        self.quad, self.phi_tab, self.grad_tab = tabulate_basis(M, order)
        self.n_basis_per_cell = self.ref_basis.n_basis

        if order == 1:
            self.dofs = mesh.cells
            self.n_dofs = mesh.n_nodes
            self.boundary_dofs = mesh.boundary_node_markers().copy()
        else:
            edge_dofs = mesh.n_nodes + mesh.cell_to_edges  # (C, n_edges_per_cell)
            self.dofs = np.concatenate([mesh.cells, edge_dofs], axis=1).astype(
                np.int32
            )
            self.n_dofs = mesh.n_nodes + mesh.n_edges
            self.boundary_dofs = np.concatenate(
                [mesh.boundary_node_markers(), mesh.boundary_edges]
            )

    # -- coordinates ---------------------------------------------------------
    @cached_property
    def dof_coords(self) -> np.ndarray:
        """Physical coordinates of each dof (lagrangian_basis.h:159-183)."""
        if self.order == 1:
            return self.mesh.nodes
        mids = self.mesh.nodes[self.mesh.edges].mean(axis=1)  # edge midpoints
        return np.concatenate([self.mesh.nodes, mids], axis=0)

    @cached_property
    def quadrature_nodes(self) -> np.ndarray:
        """Physical quadrature nodes, row `nq * cell + q` (integrator.h:109-121)."""
        coords = self.mesh.cell_coords  # (C, M+1, N)
        qn = self.quad.nodes  # (nq, M)
        # x = v0 + J @ q ; J columns = v_{j+1} - v_0
        J = np.swapaxes(coords[:, 1:, :] - coords[:, :1, :], 1, 2)  # (C,N,M)
        phys = coords[:, None, 0, :] + np.einsum("cnm,qm->cqn", J, qn)
        return phys.reshape(-1, self.mesh.embed_dim)

    @property
    def n_quad(self) -> int:
        return self.quad.num_nodes

    # -- scatter structure (setFromTriplets equivalent) -----------------------
    @cached_property
    def scatter(self):
        """(rows, cols, inverse) for scatter-add assembly.

        rows/cols: (nnz,) sorted unique (row, col) pairs of the stiffness
        pattern; inverse: (C*nb*nb,) mapping the flattened local matrices
        (cell-major, i-row-major) to their global slot. Host-side, computed
        once per space; the device-side assembly is then a single
        `segment_sum` (the scatter-add semantics of fem_assembler.h:99-112).
        """
        from ..linear_algebra.sparse import coo_sum_duplicates

        nb = self.n_basis_per_cell
        rows = np.repeat(self.dofs, nb, axis=1).reshape(-1)
        cols = np.tile(self.dofs, (1, nb)).reshape(-1)
        r, c, inv = coo_sum_duplicates(rows, cols, self.n_dofs, self.n_dofs)
        return r, c, inv

    def __repr__(self):
        return (
            f"FEMSpace(order={self.order}, n_dofs={self.n_dofs}, "
            f"mesh={self.mesh!r})"
        )
