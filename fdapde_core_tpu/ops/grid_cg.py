"""Padded-state Jacobi-preconditioned CG on 2D grid stencils (the fast path).

Measured design (benchmarks/micro_cg.py, TPU v5e, 10M dofs, f32):

- the search direction p lives in an (mx+2H, my+2H) zero-border frame, so
  the per-iteration SpMV is pure STATIC slices (no jnp.pad materialization,
  no dynamic_slice): 842 -> 1113 iters/s,
- exact-zero stencil layers are pruned beforehand
  (ops/grid_dia.prune_zero_offsets_grid): 7 -> 5 layers on right-triangle
  P1 meshes, 1113 -> 1238 iters/s,
- optional reduced-precision stencil storage (``data_dtype=jnp.bfloat16``,
  f32 vector arithmetic): 1238 -> 1520 iters/s. On uniform structured
  meshes the P1 stencil entries are small exact binary fractions, so bf16
  storage is LOSSLESS there; on general meshes it perturbs the operator by
  ~4e-3 relative — use inside an iterative-refinement outer loop
  (linear_algebra.solvers mixed-precision) or keep f32.

The operator must already carry the boundary treatment:
``G.with_dirichlet_identity(free)`` folds F A F + (I-F) into the stencil
data, so the CG body touches no masks at all.

Reference anchor: replaces Eigen SparseLU (fem_linear_elliptic_solver.h:34-50)
at the 10M-dof scale where factorization fill-in is hostile to accelerators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_dia import GridDIAMatrix

__all__ = ["grid_cg", "stencil_matvec_padded"]


def stencil_matvec_padded(data, offsets2d, x_pad, H: int):
    """y = A x from a zero-border padded operand; static slices only.

    data: (K, mx, my) stencil layers (any float dtype; accumulation happens
    in the x_pad dtype). x_pad: (mx + 2H, my + 2H) with zero borders.
    """
    mx, my = data.shape[1], data.shape[2]
    acc = None
    for k, (di, dj) in enumerate(offsets2d):
        term = data[k].astype(x_pad.dtype) * jax.lax.slice(
            x_pad, (H + di, H + dj), (H + di + mx, H + dj + my)
        )
        acc = term if acc is None else acc + term
    return acc


def grid_cg(
    G: GridDIAMatrix,
    b,
    n_iter: int,
    inv_diag=None,
    data_dtype=None,
):
    """Run `n_iter` Jacobi-CG iterations; returns (x, |r|).

    G: stencil operator, boundary treatment folded in
       (with_dirichlet_identity). b: (mx, my) or flat rhs (bc values on
       pinned entries). inv_diag: optional (mx, my) Jacobi preconditioner
       (defaults to 1/diag(G)). data_dtype: optional storage dtype for the
       stencil layers (see module docstring).
    """
    mx, my = G.shape2d
    H = max((max(abs(a), abs(b_)) for a, b_ in G.offsets2d), default=1)
    data = G.data if data_dtype is None else G.data.astype(data_dtype)
    b = jnp.asarray(b).reshape(mx, my)
    if inv_diag is None:
        inv_diag = 1.0 / G.diagonal().reshape(mx, my)
    else:
        inv_diag = jnp.asarray(inv_diag).reshape(mx, my)

    def body(_, state):
        # guarded divisions: after exact convergence (rz = pAp = 0) the
        # fixed-iteration loop must idle at the solution, not produce NaN
        x, r, p_pad, rz = state
        Ap = stencil_matvec_padded(data, G.offsets2d, p_pad, H)
        p_c = jax.lax.slice(p_pad, (H, H), (H + mx, H + my))
        pAp = jnp.sum(p_c * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha * p_c
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p_pad = jnp.pad(z + beta * p_c, H)
        return (x, r, p_pad, rz_new)

    z0 = inv_diag * b
    state = (jnp.zeros_like(b), b, jnp.pad(z0, H), jnp.sum(b * z0))
    x, r, *_ = jax.lax.fori_loop(0, n_iter, body, state)
    return x.reshape(-1), jnp.linalg.norm(r)
