"""Pallas TPU kernel: fused P1 local stiffness assembly (2D).

The general assembly path (fem/assembler.py) is an XLA einsum chain; for the
P1/2D hot case the local stiffness has a closed form

    A = (b b^T + c c^T) / (4 area),   b = (y2-y3, y3-y1, y1-y2),
                                      c = (x3-x2, x1-x3, x2-x1)

(the reference evaluates the same bilinear form by quadrature,
fem_assembler.h:79-110; for P1 the integrand is constant per cell). This
kernel computes it in one fused pass over a struct-of-arrays layout:
coordinates as (6, C) and output as (9, C), so the *cell* axis sits on the
128-wide TPU lanes — every op is an elementwise VPU op on (rows, TILE)
blocks, with no layout changes or reductions.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["p1_stiffness_2d"]

TILE = 64 * 1024  # large tiles amortize per-block overhead (1.8x vs 512, measured)


def _kernel(xy_ref, out_ref):
    x1, y1 = xy_ref[0, :], xy_ref[1, :]
    x2, y2 = xy_ref[2, :], xy_ref[3, :]
    x3, y3 = xy_ref[4, :], xy_ref[5, :]
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = 1.0 / (2.0 * jnp.abs(det))
    out_ref[0, :] = (b1 * b1 + c1 * c1) * inv
    out_ref[1, :] = (b1 * b2 + c1 * c2) * inv
    out_ref[2, :] = (b1 * b3 + c1 * c3) * inv
    out_ref[3, :] = out_ref[1, :]
    out_ref[4, :] = (b2 * b2 + c2 * c2) * inv
    out_ref[5, :] = (b2 * b3 + c2 * c3) * inv
    out_ref[6, :] = out_ref[2, :]
    out_ref[7, :] = out_ref[5, :]
    out_ref[8, :] = (b3 * b3 + c3 * c3) * inv


def p1_stiffness_2d(coords_t: jnp.ndarray, interpret: bool | None = None):
    """Local stiffness of the (positive) Dirichlet form int grad.grad.

    coords_t: (6, C) cell vertex coordinates (x1,y1,x2,y2,x3,y3 rows), C a
    multiple of TILE (pad with any nondegenerate triangle). Returns (9, C):
    rows are the row-major entries of the 3x3 local matrices.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = coords_t.shape[1]
    assert C % TILE == 0, f"pad the cell axis to a multiple of {TILE}"
    return pl.pallas_call(
        _kernel,
        grid=(C // TILE,),
        in_specs=[pl.BlockSpec((6, TILE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((9, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((9, C), coords_t.dtype),
        interpret=interpret,
    )(coords_t)
