"""Support utilities: combinatorics, quadrature tables, IO, data structures.

TPU-native counterpart of the reference `fdaPDE/utils/` layer
(/root/reference/fdaPDE/utils.h). Compile-time C++ machinery (traits, type
erasure, expression nesting) has no analogue here — Python duck typing and JAX
tracing provide the same extension points.
"""

from . import combinatorics, io, quadrature
from .combinatorics import binomial, combinations, factorial
from .quadrature import (
    SimplexQuadrature,
    gauss_legendre_1d,
    simplex_quadrature,
    standard_fem_quadrature,
)

DOUBLE_TOLERANCE = 50 * 2.220446049250313e-16  # utils/symbols.h:163
MACHINE_EPSILON = 10 * 2.220446049250313e-16  # utils/symbols.h:164
