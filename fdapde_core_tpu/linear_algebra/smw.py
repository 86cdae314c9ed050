"""Sherman–Morrison–Woodbury solver.

Counterpart of /root/reference/fdaPDE/linear_algebra/smw.h:40-59: solve
(A + U*C^{-1}*V) x = b given a solver for A (callable b -> A^{-1} b, e.g. a
preconditioned CG closure) and the small dense inverse invC, via

    M^{-1} b = y - A^{-1} U (C^{-1} + V A^{-1} U)^{-1} V y,   y = A^{-1} b.
"""

from __future__ import annotations

import jax.numpy as jnp

from .solvers import dense_solve

__all__ = ["smw_solve"]


def smw_solve(solve_A, U, invC, V, b):
    """Solve (A + U D V) x = b where `invC` = D^{-1}.

    Exactly the reference's contract (smw.h:45-58: the capacitance matrix is
    G = invC + V A^{-1} U, hence the supplied `invC` is the *inverse* of the
    middle factor; the reference docstring writes the middle factor as
    "C^{-1}" and asks for its precomputed inverse).

    solve_A: callable returning A^{-1} r for a vector or (n,k) matrix r.
    U: (n,q), invC: (q,q), V: (q,n), b: (n,) or (n,k).
    """
    U = jnp.asarray(U)
    V = jnp.asarray(V)
    invC = jnp.asarray(invC)
    y = solve_A(b)  # y = A^{-1} b            (smw.h:48)
    Y = solve_A(U)  # Y = A^{-1} U            (smw.h:50)
    G = invC + V @ Y  # G = C^{-1} + V A^{-1} U (smw.h:52)
    t = dense_solve(G, V @ y)  # (smw.h:55)
    v = solve_A(U @ t)  # (smw.h:57)
    return y - v
