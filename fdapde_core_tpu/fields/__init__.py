"""Scalar/vector/matrix fields with automatic or numeric differentiation.

Counterpart of `fdaPDE/fields/`: the C++ expression-template layer
(scalar_expressions.h, vector_expressions.h, matrix_expressions.h) is
replaced by Python operator overloading over JAX-traceable callables — the
"expression template" is the jaxpr. Derivatives use `jax.grad`/`jax.hessian`
when the callable is traceable, with the reference's central finite
differences (field_derivatives.h:35-111, default step 1e-3) as fallback and
as an explicitly requestable mode.
"""

from .fields import (  # noqa: F401
    cos,
    exp,
    log,
    sin,
    sqrt,
    tan,
    DifferentiableScalarField,
    DiscretizedField,
    MatrixField,
    ScalarField,
    TwiceDifferentiableScalarField,
    VectorField,
)

__all__ = [
    "ScalarField",
    "VectorField",
    "MatrixField",
    "DifferentiableScalarField",
    "TwiceDifferentiableScalarField",
    "DiscretizedField",
]
