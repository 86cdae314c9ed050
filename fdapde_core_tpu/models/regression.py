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

import jax

from ..fem.assembler import assemble_matrix
from ..fem.evaluation import eval_basis_pointwise
from ..fem.space import FEMSpace
from ..linear_algebra.solvers import cg, dense_solve, jacobi_preconditioner

__all__ = ["SmoothingRegression"]


class SmoothingRegression:
    """Penalized least-squares field estimation over a FEM space."""

    def __init__(self, mesh, penalty_op, order: int = 1):
        self.space = FEMSpace(mesh, order)
        self.P = assemble_matrix(self.space, penalty_op)

    def fit(self, locs, y, lam: float, rtol: float = 1e-10, maxiter=2000):
        """Solve (Psi^T Psi + lam P) c = Psi^T y; returns coefficients c."""
        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        return self._fit_psi(Psi, y, lam, rtol=rtol, maxiter=maxiter)

    def _fit_psi(self, Psi, y, lam: float, rtol: float = 1e-10, maxiter=2000):
        y = jnp.asarray(y, self.P.dtype)
        op, pre = self._normal_op(Psi, lam)
        rhs = Psi.rmatvec(y)
        c, info = cg(op, rhs, M_inv=pre, rtol=rtol, maxiter=maxiter)
        self.coefficients_ = c
        self.solve_info_ = info
        return c

    def _normal_op(self, Psi, lam: float):
        """(matvec, preconditioner) of A(lam) = Psi^T Psi + lam P."""

        def op(c):
            return Psi.rmatvec(Psi @ c) + lam * (self.P @ c)

        diag_psi = jnp.zeros(self.space.n_dofs).at[Psi.cols].add(Psi.vals**2)
        pre = jacobi_preconditioner(diag_psi + lam * self.P.diagonal())
        return op, pre

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

    # -- GCV ------------------------------------------------------------
    #
    # GCV(lam) = n ||y - S(lam) y||^2 / (n - tr S(lam))^2 with smoother
    # S = Psi (Psi^T Psi + lam P)^{-1} Psi^T — the criterion the downstream
    # fdaPDE models minimize over the reference's Grid optimizer
    # (optimization/grid.h) with SMW-based linear algebra
    # (linear_algebra/smw.h). Here the smoother is never formed: tr S is
    # either exact via a dense solve (small problems) or a Hutchinson
    # estimate (k Rademacher probes, one CG solve each, vmapped).

    def gcv(
        self,
        locs,
        y,
        lam: float,
        n_probes: int = 16,
        seed: int = 0,
        exact: bool = False,
        rtol: float = 1e-10,
        maxiter: int = 2000,
    ) -> float:
        """Generalized cross-validation score at one lambda."""
        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        return self._gcv_psi(
            Psi, y, lam, n_probes=n_probes, seed=seed, exact=exact,
            rtol=rtol, maxiter=maxiter,
        )

    def _gcv_psi(self, Psi, y, lam, n_probes, seed, exact, rtol, maxiter):
        y = jnp.asarray(y, self.P.dtype)
        n = y.shape[0]
        c = self._fit_psi(Psi, y, lam, rtol=rtol, maxiter=maxiter)
        rss = float(jnp.sum((y - Psi @ c) ** 2))
        if exact:
            tr = self._trace_smoother_exact(Psi, lam)
        else:
            tr = self._trace_smoother_hutchinson(
                Psi, lam, n_probes, seed, rtol, maxiter
            )
        denom = max(n - tr, 1e-12)
        return n * rss / denom**2

    def _trace_smoother_exact(self, Psi, lam: float) -> float:
        """tr S = tr(A^{-1} Psi^T Psi) via one dense multi-rhs solve.

        O(n_dofs^3); validation-scale only (mirrors the dense smoother
        algebra the reference's downstream GCV uses via smw.h)."""
        nd = self.space.n_dofs
        Pd = np.zeros((nd, nd))
        np.add.at(
            Pd,
            (np.asarray(self.P.rows), np.asarray(self.P.cols)),
            np.asarray(self.P.vals),
        )
        Psid = np.zeros(Psi.shape)
        np.add.at(
            Psid,
            (np.asarray(Psi.rows), np.asarray(Psi.cols)),
            np.asarray(Psi.vals),
        )
        B = Psid.T @ Psid
        X = dense_solve(jnp.asarray(B + lam * Pd), jnp.asarray(B))
        return float(jnp.trace(X))

    def _trace_smoother_hutchinson(
        self, Psi, lam, n_probes, seed, rtol, maxiter
    ) -> float:
        """tr S ~ mean_j v_j^T S v_j, v Rademacher: v^T S v = u^T A^{-1} u
        with u = Psi^T v (S symmetric PSD => nonnegative estimates)."""
        op, pre = self._normal_op(Psi, lam)
        rng = np.random.default_rng(seed)
        V = jnp.asarray(
            rng.choice([-1.0, 1.0], size=(n_probes, Psi.shape[0])),
            self.P.dtype,
        )
        U = jax.vmap(Psi.rmatvec)(V)

        def probe(u):
            w, _ = cg(op, u, M_inv=pre, rtol=rtol, maxiter=maxiter)
            return jnp.dot(u, w)

        return float(jnp.mean(jax.vmap(probe)(U)))

    def select_lambda_gcv(self, locs, y, lambdas, **gcv_kwargs):
        """Minimize GCV over a lambda grid; refits at the argmin.

        Mirrors the reference workflow: Grid optimizer (optimization/grid.h)
        over the GCV functional. Psi is built once for the whole sweep.
        Returns (best_lambda, scores)."""
        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        kw = dict(n_probes=16, seed=0, exact=False, rtol=1e-10, maxiter=2000)
        kw.update(gcv_kwargs)
        scores = [
            self._gcv_psi(Psi, y, float(lam), **kw) for lam in lambdas
        ]
        best = int(np.argmin(scores))
        self._fit_psi(Psi, y, float(lambdas[best]))
        return float(lambdas[best]), scores
