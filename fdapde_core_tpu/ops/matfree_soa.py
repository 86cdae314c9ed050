"""SoA (cell-axis-LAST) general gather pipeline: the device-scale layouts.

The AoS forms in ops/matfree.py ((C, 3, 3) local matrices, (C, 3) dof
tables, (n, K) adjacency) are correct everywhere but HBM-hostile on TPU at
scale: XLA tiles the two minor dims T(8, 128), so a minor axis of 3 pads
42x — a 20M-cell coordinate gather allocates 21 GB (measured: the full-size
bench compile failed with exactly that). This module re-expresses the same
pipeline with the large axis LAST everywhere (the BENCH_NOTES.md layout
rule): per-corner (C,) gathers, symmetric rank-deficient stencil storage
(s01, s02, s12; diagonals from the zero row sums), (D, n) adjacency tables
and (K, n) assembled ELL — every array tiles exactly.

Same math as ops/matfree.py / ops/ell.py; parity-tested against them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "p1_offdiag_soa",
    "build_adjacency_soa",
    "MatrixFreeSoA",
    "ELLSoA",
]


def p1_offdiag_soa(x, y, c0, c1, c2, kappa=None):
    """Off-diagonal P1 stiffness entries (s01, s02, s12), each (C,).

    x, y: (N,) node coordinate arrays; c0, c1, c2: (C,) corner indices.
    The symmetric local matrix is fully determined: a_ii = -(s_ij + s_ik)
    (zero row sums of the pure-diffusion stiffness). Same closed form as
    ops/matfree.p1_local_stiffness (simplex.h:184-195 adjugate gradients;
    +grad.grad sign per operators/laplacian.h:37-44).
    """
    x0, x1, x2 = x[c0], x[c1], x[c2]
    y0, y1, y2 = y[c0], y[c1], y[c2]
    e0x, e0y = x1 - x0, y1 - y0
    e1x, e1y = x2 - x0, y2 - y0
    det = e0x * e1y - e0y * e1x
    scale = 0.5 * jnp.sign(det) / det  # area / det^2
    if kappa is not None:
        scale = scale * kappa
    # g1 = (e1y, -e1x)/det, g2 = (-e0y, e0x)/det, g0 = -(g1 + g2)
    g12 = -(e1y * e0y + e1x * e0x)  # det^2 * (g1 . g2)
    g11 = e1y * e1y + e1x * e1x
    g22 = e0y * e0y + e0x * e0x
    s12 = scale * g12
    s01 = scale * (-(g11 + g12))  # g0 . g1 = -(g1.g1 + g2.g1)
    s02 = scale * (-(g12 + g22))
    return s01, s02, s12


def build_adjacency_soa(flat, n_dofs: int, max_degree: int):
    """(D, n) ELL incidence table of a flat slot-major position array.

    flat: (P,) dof id of each element-local position (P = nb * C,
    position p = slot * C + cell). Returns adj (D, n) int32 indices into
    (P,), mask (D, n) bool, overflowed (traced bool).
    """
    order = jnp.argsort(flat, stable=True).astype(jnp.int32)
    sorted_d = flat[order]
    ids = jnp.arange(n_dofs, dtype=flat.dtype)
    starts = jnp.searchsorted(sorted_d, ids)
    ends = jnp.searchsorted(sorted_d, ids + 1)
    counts = ends - starts
    k = jnp.arange(max_degree, dtype=jnp.int32)[:, None]
    idx = starts[None, :] + k
    mask = k < counts[None, :]
    adj = order[jnp.clip(idx, 0, flat.shape[0] - 1)]
    return adj, mask, jnp.any(counts > max_degree)


@jax.tree_util.register_pytree_node_class
class MatrixFreeSoA:
    """Matrix-free P1 diffusion operator in SoA layout.

    s: (3, C) off-diagonals (s01, s02, s12); c: (3, C) corner indices;
    adj/adj_mask: (D, n) slot-major incidence table. Operator protocol
    (@, diagonal) compatible with fem/solvers.DirichletSystem.
    """

    def __init__(self, s, c, adj, adj_mask, n_dofs: int):
        self.s = s
        self.c = c
        self.adj = adj
        self.adj_mask = adj_mask
        self.n_dofs = n_dofs

    def tree_flatten(self):
        return (self.s, self.c, self.adj, self.adj_mask), (self.n_dofs,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def build(cls, x, y, c0, c1, c2, n_dofs: int, max_degree: int,
              kappa=None):
        s01, s02, s12 = p1_offdiag_soa(x, y, c0, c1, c2, kappa)
        s = jnp.stack([s01, s02, s12])
        c = jnp.stack([c0, c1, c2])
        flat = c.reshape(-1)  # slot-major: position = slot * C + cell
        adj, mask, over = build_adjacency_soa(flat, n_dofs, max_degree)
        return cls(s, c, adj, mask, n_dofs), over

    @property
    def shape(self):
        return (self.n_dofs, self.n_dofs)

    def _entries(self):
        """The 9 local-matrix entry arrays, (3, 3) of (C,)."""
        s01, s02, s12 = self.s[0], self.s[1], self.s[2]
        a00 = -(s01 + s02)
        a11 = -(s01 + s12)
        a22 = -(s02 + s12)
        return ((a00, s01, s02), (s01, a11, s12), (s02, s12, a22))

    def __matmul__(self, v):
        xe = [v[self.c[j]] for j in range(3)]  # three (C,) gathers
        A = self._entries()
        ye = [
            A[i][0] * xe[0] + A[i][1] * xe[1] + A[i][2] * xe[2]
            for i in range(3)
        ]
        flat = jnp.concatenate(ye)  # slot-major (3C,)
        gat = flat[self.adj] * self.adj_mask.astype(flat.dtype)
        return gat.sum(axis=0)

    def diagonal(self):
        A = self._entries()
        dloc = jnp.concatenate([A[i][i] for i in range(3)])
        gat = dloc[self.adj] * self.adj_mask.astype(dloc.dtype)
        return gat.sum(axis=0)

    def astype(self, dtype):
        return MatrixFreeSoA(self.s.astype(dtype), self.c, self.adj,
                             self.adj_mask, self.n_dofs)

    def to_ell(self, max_cols: int):
        """Assembled (K, n) row-ELL (see ops/ell.ELLMatrix.from_local; same
        sorted-merge, SoA layout: every transient is (3D, n))."""
        D = self.adj.shape[0]
        n = self.n_dofs
        C = self.c.shape[1]
        cell = self.adj % C  # (D, n)
        slot = self.adj // C
        A = self._entries()
        aflat = jnp.concatenate(
            [A[i][j] for i in range(3) for j in range(3)]
        )  # (9C,) entry (i, j) at offset (3 i + j) C
        cols_b, vals_b = [], []
        for j in range(3):
            cols_b.append(jnp.where(self.adj_mask, self.c[j][cell], n))
            vals_b.append(
                jnp.where(
                    self.adj_mask,
                    aflat[(slot * 3 + j) * C + cell],
                    0.0,
                )
            )
        cols_all = jnp.concatenate(cols_b, axis=0)  # (3D, n)
        vals_all = jnp.concatenate(vals_b, axis=0)
        order = jnp.argsort(cols_all, axis=0)
        cols_s = jnp.take_along_axis(cols_all, order, axis=0)
        vals_s = jnp.take_along_axis(vals_all, order, axis=0)
        first = jnp.concatenate(
            [jnp.ones((1, n), bool), cols_s[1:] != cols_s[:-1]], axis=0
        )
        real = cols_s < n
        uidx = jnp.cumsum(first.astype(jnp.int32), axis=0) - 1
        K = max_cols
        overflowed = jnp.any(real & (uidx >= K))
        slotk = jnp.where(real & (uidx < K), uidx, K)
        col_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
        seg = (slotk * n + col_ids).reshape(-1)
        vals = jax.ops.segment_sum(
            vals_s.reshape(-1), seg, (K + 1) * n
        ).reshape(K + 1, n)[:K]
        cols = jax.ops.segment_max(
            jnp.where(slotk < K, cols_s, -1).reshape(-1), seg, (K + 1) * n
        ).reshape(K + 1, n)[:K]
        cols = jnp.where(cols < 0, col_ids, cols).astype(jnp.int32)
        return ELLSoA(vals, cols, (n, n)), overflowed


@jax.tree_util.register_pytree_node_class
class ELLSoA:
    """Assembled row-ELL in SoA layout: vals/cols (K, n), padded entries
    carry col = row id and val = 0 (no mask needed in the SpMV)."""

    def __init__(self, vals, cols, shape):
        self.vals = vals
        self.cols = cols
        self.shape = shape

    def tree_flatten(self):
        return (self.vals, self.cols), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    def __matmul__(self, v):
        acc = None
        for k in range(self.vals.shape[0]):  # K slices of 1-D gathers
            t = self.vals[k] * v[self.cols[k]]
            acc = t if acc is None else acc + t
        return acc

    def diagonal(self):
        rows = jnp.arange(self.shape[0], dtype=self.cols.dtype)[None, :]
        return jnp.where(self.cols == rows, self.vals, 0.0).sum(axis=0)

    def astype(self, dtype):
        return ELLSoA(self.vals.astype(dtype), self.cols, self.shape)
