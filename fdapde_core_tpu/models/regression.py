"""Spatial regression with PDE regularization (smoothing).

The downstream use of fdaPDE-core: estimate a smooth field f from scattered
noisy observations y_i = f(p_i) + eps by minimizing

    ||y - Psi c||^2 + lam * c^T P c

with Psi the basis-evaluation matrix at the data locations
(fem/evaluation.py) and P a differential penalty (e.g. the stiffness of
-laplacian). The normal equations (Psi^T Psi + lam P) c = Psi^T y are SPD
and solved matrix-free with CG; lambda can be selected by grid search over
a validation criterion (the reference provides the optimizer layer for
exactly this, optimization/grid.h + smw.h for the downstream GCV linear
algebra).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.assembler import assemble_matrix
from ..fem.evaluation import eval_basis_pointwise
from ..fem.space import FEMSpace
from ..linear_algebra.solvers import cg, jacobi_preconditioner

__all__ = ["SmoothingRegression"]


class SmoothingRegression:
    """Penalized least-squares field estimation over a FEM space."""

    def __init__(self, mesh, penalty_op, order: int = 1):
        self.space = FEMSpace(mesh, order)
        self.P = assemble_matrix(self.space, penalty_op)

    def fit(self, locs, y, lam: float, rtol: float = 1e-10, maxiter=2000):
        """Solve (Psi^T Psi + lam P) c = Psi^T y; returns coefficients c."""
        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        y = jnp.asarray(y, self.P.dtype)

        def op(c):
            return Psi.rmatvec(Psi @ c) + lam * (self.P @ c)

        rhs = Psi.rmatvec(y)
        diag_psi = jnp.zeros(self.space.n_dofs).at[Psi.cols].add(Psi.vals**2)
        pre = jacobi_preconditioner(diag_psi + lam * self.P.diagonal())
        c, info = cg(op, rhs, M_inv=pre, rtol=rtol, maxiter=maxiter)
        self.coefficients_ = c
        self.solve_info_ = info
        return c

    def predict(self, locs):
        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        return Psi @ self.coefficients_

    def select_lambda(self, locs, y, lambdas, val_fraction=0.25, seed=0):
        """Pick lambda by held-out validation error over a grid
        (the reference's Grid optimizer workflow, optimization/grid.h)."""
        rng = np.random.default_rng(seed)
        n = len(y)
        idx = rng.permutation(n)
        n_val = int(val_fraction * n)
        val, train = idx[:n_val], idx[n_val:]
        locs = np.asarray(locs)
        y = np.asarray(y)
        errs = []
        for lam in lambdas:
            self.fit(locs[train], y[train], float(lam))
            pred = np.asarray(self.predict(locs[val]))
            errs.append(float(((pred - y[val]) ** 2).mean()))
        best = int(np.argmin(errs))
        self.fit(locs, y, float(lambdas[best]))
        return float(lambdas[best]), errs
