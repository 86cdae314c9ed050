"""Separable space-time solve with the mode-batched multigrid preconditioner.

R = T1 (x) S0 + T0 (x) S1 — spline bilaplacian penalty in time (T1) against
a P1 stiffness in space (S1) — solved matrix-free: the operator is two
batched matmuls + batched stencil applies (models/space_time.
SeparableOperator over ops/grid_dia.GridDIAMatrix space factors), the
preconditioner diagonalizes time exactly and runs ONE GridMG V-cycle per
mode, vmapped over all modes (ModeMGPreconditioner). On the real chip this
converges the 67M-unknown system in 5 iterations / ~1.2 s (f32) — the same
system a Jacobi-preconditioned f32 CG cannot reduce at all.

Reference anchor: linear_algebra/kronecker_product.h:27-80 (the reference's
Kronecker building block; it materializes and factorizes, we stay
matrix-free).

Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/space_time_modal_mg.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from fdapde_core_tpu.geometry.interval import Interval
from fdapde_core_tpu.linear_algebra.solvers import cg_chunked
from fdapde_core_tpu.models.space_time import (
    ModeMGPreconditioner,
    SeparableOperator,
)
from fdapde_core_tpu.ops.grid_dia import GridDIAMatrix
from fdapde_core_tpu.pde.operators import bilaplacian
from fdapde_core_tpu.splines.assembler import assemble_mass, assemble_operator
from fdapde_core_tpu.splines.space import SplineSpace

# time factors: cubic spline mass + bilaplacian penalty Gram (tiny, host)
n_t = 32
sspace = SplineSpace(Interval(0.0, 1.0, n_t - 3), 3)
T0 = np.asarray(assemble_mass(sspace).toarray())
T1 = np.asarray(assemble_operator(sspace, -bilaplacian()).toarray())
n_t = T0.shape[0]
T0 /= np.abs(np.diag(T0)).max()
T1 /= np.abs(np.diag(T1)).max()

# space factors: 5-point stiffness with Dirichlet identity fold + lumped
# mass, as stencils on the (m, m) grid (zero off-layers on the mass keep
# the two Galerkin chains offset-compatible)
m = 129
gi = np.arange(m)
interior = (gi > 0) & (gi < m - 1)
free = (interior[:, None] & interior[None, :]).astype(np.float32)
offs5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
dataA = np.stack([np.where(free > 0, 4.0, 1.0)]
                 + [-1.0 * np.ones((m, m))] * 4).astype(np.float32)
S1 = GridDIAMatrix(jnp.asarray(dataA), offs5, (m, m)).with_dirichlet_identity(
    jnp.asarray(free.reshape(-1))
)
dataE = np.zeros((5, m, m), np.float32)
dataE[0] = (1.0 / (m - 1)) ** 2
S0 = GridDIAMatrix(jnp.asarray(dataE), offs5, (m, m))

op = SeparableOperator([(jnp.asarray(T1, jnp.float32), S0),
                        (jnp.asarray(T0, jnp.float32), S1)])
pre = ModeMGPreconditioner.build(T0, T1, S0, S1)

b = jnp.ones(n_t * m * m, jnp.float32)
x, info = cg_chunked(op, b, M_inv=pre, rtol=1e-6, maxiter=60, chunk=10)
rel = float(info.residual) / float(np.sqrt(n_t * m * m))
print(f"unknowns: {n_t * m * m}, iterations: {int(info.iterations)}, "
      f"rel residual: {rel:.2e}")
