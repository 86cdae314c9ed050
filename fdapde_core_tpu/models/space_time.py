"""Separable space-time operators: sums of Kronecker products, matrix-free.

The reference provides the Kronecker building block
(linear_algebra/kronecker_product.h) that downstream fdaPDE space-time
models combine into penalties like  R = T1 (x) S0 + T0 (x) S1  (spline
penalty in time, FEM matrices in space). Materializing n_t*n_s square
matrices is hostile to accelerators; here the operator stays a sum of
Kronecker factors and every matvec is two batched matmuls per term
(vec identity: (A (x) B) vec(X) = vec(B X A^T)) — MXU-shaped.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..linear_algebra.kron import kron_matvec
from ..linear_algebra.solvers import bicgstab, cg
from ..linear_algebra.sparse import SparseMatrix

__all__ = ["SeparableOperator", "solve_space_time"]


class SeparableOperator:
    """sum_k  T_k (x) S_k  as a matrix-free linear operator.

    T_k act on the time index (n_t x n_t), S_k on space (n_s x n_s); the
    operator acts on vec(u) with u of shape (n_t, n_s) row-major.
    """

    def __init__(self, terms):
        self.terms = list(terms)  # [(T, S), ...]
        T0, S0 = self.terms[0]
        self.n_t = T0.shape[0]
        self.n_s = S0.shape[0]
        self.shape = (self.n_t * self.n_s, self.n_t * self.n_s)

    def __call__(self, x):
        out = None
        for T, S in self.terms:
            y = kron_matvec(T, S, x)
            out = y if out is None else out + y
        return out

    __matmul__ = __call__

    def diagonal(self):
        """Diagonal of the operator (for Jacobi preconditioning)."""
        d = None
        for T, S in self.terms:
            dT = T.diagonal() if isinstance(T, SparseMatrix) else jnp.diagonal(T)
            dS = S.diagonal() if isinstance(S, SparseMatrix) else jnp.diagonal(S)
            term = jnp.kron(dT, dS)
            d = term if d is None else d + term
        return d


def solve_space_time(op: SeparableOperator, b, symmetric=True, rtol=1e-10, maxiter=None):
    """Solve (sum_k T_k (x) S_k) x = b matrix-free with Jacobi-CG/BiCGStab."""
    d = op.diagonal()
    inv = 1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0)
    solver = cg if symmetric else bicgstab
    x, info = solver(op, jnp.asarray(b), M_inv=lambda r: inv * r, rtol=rtol, maxiter=maxiter)
    return x, info
