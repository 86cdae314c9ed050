"""Differential-operator algebra and PDE problem descriptors.

Counterpart of `fdaPDE/pde/`: the C++ expression-template operator calculus
(differential_expressions.h, differential_operators.h) becomes a small Python
expression tree flattened to scaled operator terms; `PDE` mirrors the
reference problem descriptor (pde/pde.h:40-114) and drives the FEM / SPLINE
solvers.
"""

from .operators import (
    Advection,
    BiLaplacian,
    DifferentialOp,
    Diffusion,
    Dt,
    Laplacian,
    Reaction,
    advection,
    bilaplacian,
    diffusion,
    dt,
    laplacian,
    reaction,
)
from .pde import PDE

__all__ = [
    "PDE",
    "DifferentialOp",
    "laplacian",
    "diffusion",
    "advection",
    "reaction",
    "dt",
    "bilaplacian",
    "Laplacian",
    "Diffusion",
    "Advection",
    "Reaction",
    "Dt",
    "BiLaplacian",
]
