"""Nonlinear unconstrained optimizers.

Counterpart of `fdaPDE/optimization/`: Grid / GradientDescent / Newton / BFGS
(grid.h, gradient_descent.h, newton.h, bfgs.h) with backtracking and Wolfe
line searches (callbacks/*.h). Implemented as jit-compiled
`lax.while_loop` iterations with `jax.grad`/`jax.hessian` replacing the
reference's finite differences (a FD mode is available through
`ScalarField.derive(mode="fd")`).
"""

from .optimizers import (
    OptimizeResult,
    bfgs,
    gradient_descent,
    grid_search,
    newton,
)

__all__ = [
    "OptimizeResult",
    "grid_search",
    "gradient_descent",
    "newton",
    "bfgs",
]
