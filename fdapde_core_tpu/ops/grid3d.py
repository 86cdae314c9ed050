"""3D grid stencils: scatter-free conversion + padded-state CG for the
Freudenthal structured tet mesh (the 3D counterpart of grid_assembly.py /
grid_dia.py / grid_cg.py).

Dofs live on an (m, m, m) node lattice (geometry/structured.unit_cube_mesh
numbering: node (i, j, k) -> i m^2 + j m + k); the P1 operator is a
15-point stencil (offsets in {-1,0,1}^3 along the Kuhn-path directions).
As in 2D, every (tet type, local row, local col) slot statically resolves
to one stencil layer and one contiguous (n, n, n) block, so conversion is
96 fused slice-adds instead of a 16 * 6 n^3-entry segment-sum.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .closed_form import SYM4_TO_FULL

__all__ = ["GridDIA3D", "p1_cube_stencil", "grid_cg3d",
           "prune_zero_offsets_grid3d"]


@jax.tree_util.register_pytree_node_class
@dataclass
class GridDIA3D:
    """Stencil matrix over an (mx, my, mz) dof lattice."""

    data: jnp.ndarray  # (K, mx, my, mz)
    offsets3d: tuple[tuple[int, int, int], ...]
    shape3d: tuple[int, int, int]

    def tree_flatten(self):
        return (self.data,), (self.offsets3d, self.shape3d)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)

    @property
    def n(self):
        mx, my, mz = self.shape3d
        return mx * my * mz

    def __matmul__(self, x):
        mx, my, mz = self.shape3d
        xg = jnp.asarray(x).reshape(mx, my, mz)
        xp = jnp.pad(xg, 1)
        acc = None
        for k, (di, dj, dk) in enumerate(self.offsets3d):
            t = self.data[k] * jax.lax.slice(
                xp, (1 + di, 1 + dj, 1 + dk),
                (1 + di + mx, 1 + dj + my, 1 + dk + mz),
            )
            acc = t if acc is None else acc + t
        return acc.reshape(-1)

    def diagonal(self):
        k = self.offsets3d.index((0, 0, 0))
        return self.data[k].reshape(-1)

    def with_dirichlet_identity(self, free_flat):
        """A' = F A F + (I - F) folded into the stencil data (cf. 2D)."""
        mx, my, mz = self.shape3d
        freeg = jnp.asarray(free_flat).reshape(mx, my, mz)
        fp = jnp.pad(freeg, 1)
        layers = []
        for k, (di, dj, dk) in enumerate(self.offsets3d):
            shifted = jax.lax.slice(
                fp, (1 + di, 1 + dj, 1 + dk),
                (1 + di + mx, 1 + dj + my, 1 + dk + mz),
            )
            lay = self.data[k] * freeg * shifted
            if (di, dj, dk) == (0, 0, 0):
                lay = lay + (1.0 - freeg)
            layers.append(lay)
        return GridDIA3D(jnp.stack(layers), self.offsets3d, self.shape3d)


def prune_zero_offsets_grid3d(G: GridDIA3D, tol: float = 0.0) -> GridDIA3D:
    """Drop all-zero stencil layers (host round-trip; cf. 2D pruning)."""
    import numpy as np

    absmax = np.asarray(jnp.max(jnp.abs(G.data), axis=(1, 2, 3)))
    keep = [k for k in range(len(G.offsets3d)) if absmax[k] > tol]
    if len(keep) == len(G.offsets3d):
        return G
    return GridDIA3D(
        G.data[jnp.asarray(keep)],
        tuple(G.offsets3d[k] for k in keep),
        G.shape3d,
    )


def _tet_positions():
    """Local-dof lattice offsets per tet type, matching unit_cube_mesh:
    type t = t-th permutation from itertools.permutations(range(3)); odd
    permutations store vertices as (v0, v2, v1, v3)."""
    evens = {(0, 1, 2), (1, 2, 0), (2, 0, 1)}
    out = []
    for perm in itertools.permutations(range(3)):
        e = [[0, 0, 0], [0, 0, 0], [0, 0, 0]]
        p0 = (0, 0, 0)
        p1 = list(p0)
        p1[perm[0]] += 1
        p2 = list(p1)
        p2[perm[1]] += 1
        p3 = (1, 1, 1)
        pos = [tuple(p0), tuple(p1), tuple(p2), tuple(p3)]
        if perm not in evens:
            pos = [pos[0], pos[2], pos[1], pos[3]]
        out.append(tuple(pos))
    return tuple(out)


_POSITIONS = _tet_positions()


def p1_cube_stencil(A10, n: int) -> GridDIA3D:
    """GridDIA3D of the P1 operator from packed local tet matrices.

    A10: (10, >= 6 n^3) packed-symmetric local matrices (SYM4_TO_FULL
    expansion), cell axis ordered in unit_cube_mesh's 6 permutation blocks
    of n^3 cubes each (extra cells beyond 6 n^3 ignored). Returns the
    (m, m, m) stencil, m = n + 1.
    """
    m = n + 1
    A = A10.reshape(10, -1)
    offsets = sorted(
        {
            tuple(q[d] - p[d] for d in range(3))
            for pos in _POSITIONS
            for p in pos
            for q in pos
        }
    )
    layers = {o: jnp.zeros((m, m, m), A10.dtype) for o in offsets}
    for t, pos in enumerate(_POSITIONS):
        vals = A[:, t * n ** 3 : (t + 1) * n ** 3].reshape(10, n, n, n)
        for p in range(4):
            for q in range(4):
                o = tuple(pos[q][d] - pos[p][d] for d in range(3))
                di, dj, dk = pos[p]
                layers[o] = layers[o].at[
                    di : di + n, dj : dj + n, dk : dk + n
                ].add(vals[SYM4_TO_FULL[4 * p + q]])
    data = jnp.stack([layers[o] for o in offsets])
    return GridDIA3D(data, tuple(offsets), (m, m, m))


def grid_cg3d(G: GridDIA3D, b, n_iter: int, inv_diag=None):
    """Padded-state Jacobi-CG on a 3D stencil; returns (x, |r|).

    Same design as ops/grid_cg.grid_cg: the search direction lives in a
    zero-border frame (static slices, no per-iteration pad of the operand),
    guarded divisions."""
    mx, my, mz = G.shape3d
    H = max(
        max(abs(a), abs(b_), abs(c)) for a, b_, c in G.offsets3d
    ) if G.offsets3d else 1
    data = G.data
    b = jnp.asarray(b).reshape(mx, my, mz)
    if inv_diag is None:
        inv_diag = 1.0 / G.diagonal().reshape(mx, my, mz)
    else:
        inv_diag = jnp.asarray(inv_diag).reshape(mx, my, mz)

    def stencil(p_pad):
        acc = None
        for k, (di, dj, dk) in enumerate(G.offsets3d):
            t = data[k] * jax.lax.slice(
                p_pad, (H + di, H + dj, H + dk),
                (H + di + mx, H + dj + my, H + dk + mz),
            )
            acc = t if acc is None else acc + t
        return acc

    def body(_, state):
        x, r, p_pad, rz = state
        Ap = stencil(p_pad)
        p_c = jax.lax.slice(p_pad, (H, H, H), (H + mx, H + my, H + mz))
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
