"""SplineSpace: the spline discretization over an Interval mesh.

Counterpart of the basis/solver-state bookkeeping in
/root/reference/fdaPDE/splines/solvers/spline_solver_base.h:33-89: the basis
is built on the domain's own knot vector (the interval nodes,
spline_assembler.h:36), quadrature is 3-point Gauss-Legendre per knot span
(integrator.h:126-142).
"""

from __future__ import annotations

from functools import cached_property

import numpy as np

from ..utils.quadrature import gauss_legendre_1d
from .basis import SplineBasis

__all__ = ["SplineSpace"]


class SplineSpace:
    """Order-R spline space over a 1D Interval triangulation."""

    def __init__(self, mesh, order: int = 3, n_quad: int = 3):
        self.mesh = mesh
        self.order = order
        knots = np.asarray(mesh.nodes).reshape(-1)
        self.basis = SplineBasis(knots, order)
        self.n_dofs = self.basis.n_basis
        self.n_quad = n_quad
        # Gauss-Legendre points per (padded) knot span; degenerate spans get
        # zero weight (the reference integrates them to 0 trivially,
        # spline_assembler.h:64-66)
        gl_x, gl_w = gauss_legendre_1d(n_quad)
        u = self.basis.padded
        a, b = u[:-1], u[1:]
        self._span_mid = 0.5 * (a + b)
        self._span_half = 0.5 * (b - a)
        pts = self._span_mid[:, None] + self._span_half[:, None] * gl_x[None, :]
        self.quad_points = pts.reshape(-1)  # (n_spans * n_quad,)
        self.quad_weights = (
            self._span_half[:, None] * gl_w[None, :]
        ).reshape(-1)

    @cached_property
    def boundary_dofs(self) -> np.ndarray:
        """First/last basis functions interpolate the interval endpoints
        (clamped knots): natural Dirichlet dofs. The reference leaves spline
        BCs unimplemented (spline_solver_base.h:79 TODO)."""
        mask = np.zeros(self.n_dofs, dtype=bool)
        mask[0] = mask[-1] = True
        return mask

    @cached_property
    def dof_coords(self) -> np.ndarray:
        """Greville abscissae (natural interpolation points of the basis)."""
        return self.basis.greville()[:, None]

    @property
    def quadrature_nodes(self) -> np.ndarray:
        return self.quad_points[:, None]

    def eval(self, locs, policy: str = "pointwise"):
        """Phi matrix of basis evaluations (spline_basis.h:80-102)."""
        from ..linear_algebra.sparse import SparseMatrix

        locs = np.asarray(locs, dtype=np.float64).reshape(-1)
        if policy != "pointwise":
            raise NotImplementedError(
                "areal spline evaluation is a TODO upstream too (spline_basis.h:105-113)"
            )
        dense = self.basis.eval(locs)
        return SparseMatrix.from_dense(dense), np.ones(locs.size)
