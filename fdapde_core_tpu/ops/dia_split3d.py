"""3D banded split: two-spacing offset structure -> static 3D stencil.

The 3D counterpart of ops/dia_split.py. A 3D quasi-structured operator
(Freudenthal/extruded tet meshes, possibly with jittered geometry — or any
dof order whose offset histogram concentrates on TWO spacings W1 | W2) has
flat offsets d = a*W2 + b*W1 + c with small (a, b, c): viewing x as an
(R, W2/W1, W1) lattice turns every such offset into a STATIC 3D shift —
exactly the GridDIA3D form (memory-bandwidth slices, zero gathers), with a
tiny ELL remainder for wrap entries. `BandedMGPreconditioner3D` then runs
GridMG3D Galerkin multigrid directly on the cube-embedded lattice: the
full converged solve of an arbitrary-index-array 3D operator without a
single gather in the hot loop.

Planning is purely algebraic (offset histogram coverage, as in 2D): the
split is attempted from the MATRIX alone and rejected for scattered bands.

Reference anchor: the same Eigen-SparseLU envelope
(fem_linear_elliptic_solver.h:38-47) on 3D meshes, at stencil speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .grid3d import GridDIA3D
from .matfree_soa import ELLSoA

__all__ = ["BandedSplit3D", "BandedMGPreconditioner3D", "plan_split_3d",
           "build_banded_split_3d"]


@jax.jit
def _bandwidth_jit(cols):
    n = cols.shape[1]
    rows = jnp.arange(n, dtype=cols.dtype)[None, :]
    return jnp.max(jnp.abs(cols - rows))


@functools.partial(jax.jit, static_argnums=(2,))
def _band_hist_jit(cols, vals, B):
    n = cols.shape[1]
    rows = jnp.arange(n, dtype=cols.dtype)[None, :]
    d = cols - rows
    dreal = jnp.where(vals != 0.0, d, B + 1 + B)
    return jnp.bincount(
        jnp.clip(dreal + B, 0, 2 * B + 1).reshape(-1), length=2 * B + 2
    )


def plan_split_3d(E: ELLSoA, cmax: int = 1, min_frac: float = 0.01,
                  max_hist: int = 1 << 24, min_cover: float = 0.98):
    """Choose the two reshape spacings (W1, W2), W1 | W2, from the offset
    histogram. Returns (W1, W2) or (None, None) when no dominant two-level
    band exists. Search: every dominant-offset pair (w1, w2) with
    w1 > cmax, w2 % w1 == 0, ranked by coverage of the
    {a*w2 + b*w1 + c : |a|,|b| <= 1, |c| <= cmax} window."""
    import numpy as np

    n = E.shape[0]
    B = int(_bandwidth_jit(E.cols))
    if B <= cmax or 2 * B + 1 > max_hist:
        return None, None
    hist = np.array(_band_hist_jit(E.cols, E.vals, B))[: 2 * B + 1]
    total = hist.sum()
    if total == 0:
        return None, None
    center = int(hist[B])
    pos = np.nonzero(hist >= max(1, int(min_frac * n)))[0] - B
    cands = sorted({int(abs(d)) for d in pos if abs(d) > cmax})
    if not cands:
        return None, None

    def cover(w1, w2):
        window = {
            a * w2 + b * w1 + c
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
            for c in range(-cmax, cmax + 1)
        }
        window.discard(0)
        return center + sum(
            int(hist[d + B]) for d in window if -B <= d <= B
        )

    best = (0.0, None, None)
    for w2 in cands:
        if w2 <= cands[0]:
            continue
        for w1 in cands:
            if w1 >= w2 or w2 % w1 != 0:
                continue
            c = cover(w1, w2) / total
            if c > best[0]:
                best = (c, w1, w2)
    if best[0] < min_cover:
        return None, None
    return best[1], best[2]


def build_banded_split_3d(E: ELLSoA, W1: int, W2: int, amax: int = 1,
                          bmax: int = 1, cmax: int = 1, max_rem: int = 2):
    """Split an assembled ELLSoA into GridDIA3D((R, W2/W1, W1)) + ELL
    remainder. Jittable for STATIC (W1, W2, amax, bmax, cmax, max_rem).
    Exact: DIA part + remainder == input (tests)."""
    K, n = E.vals.shape
    M = W2 // W1
    R = -(-n // W2)
    rows = jnp.arange(n, dtype=E.cols.dtype)[None, :]
    d = E.cols - rows
    j0 = rows % W1
    j1 = (rows // W1) % M
    offsets3d = tuple(
        (a, b, c)
        for a in range(-amax, amax + 1)
        for b in range(-bmax, bmax + 1)
        for c in range(-cmax, cmax + 1)
    )
    layers = []
    claimed = jnp.zeros_like(E.cols, dtype=bool)
    for (a, b, c) in offsets3d:
        delta = a * W2 + b * W1 + c
        m = ((d == delta)
             & (j0 + c >= 0) & (j0 + c < W1)
             & (j1 + b >= 0) & (j1 + b < M))
        layer = jnp.where(m, E.vals, 0.0).sum(axis=0)
        claimed = claimed | m
        layers.append(jnp.pad(layer, (0, R * W2 - n)).reshape(R, M, W1))
    G = GridDIA3D(jnp.stack(layers), offsets3d, (R, M, W1))

    drop = claimed | (E.vals == 0.0)
    rc = jnp.where(drop, n, E.cols)
    rv = jnp.where(drop, 0.0, E.vals)
    order = jnp.argsort(rc, axis=0)
    rc = jnp.take_along_axis(rc, order, axis=0)
    rv = jnp.take_along_axis(rv, order, axis=0)
    overflowed = (jnp.any(rc[max_rem:] < n) if max_rem < K
                  else jnp.array(False))
    rc = rc[:max_rem]
    rv = rv[:max_rem]
    rows1 = jnp.broadcast_to(rows.astype(jnp.int32), rc.shape)
    rem = ELLSoA(rv, jnp.where(rc == n, rows1, rc).astype(jnp.int32),
                 (n, n))
    return BandedSplit3D(G, rem, n), overflowed


@jax.tree_util.register_pytree_node_class
class BandedSplit3D:
    """y = (GridDIA3D over the (R, M, W1) reshape) x + (ELL remainder) x.

    Operator protocol (@, diagonal, astype, fold_dirichlet) as in the 2D
    BandedSplit; rem=None drops the remainder gathers (rem_nnz == 0)."""

    def __init__(self, G: GridDIA3D, rem: ELLSoA | None, n: int):
        self.G = G
        self.rem = rem
        self.n = n

    def tree_flatten(self):
        return (self.G, self.rem), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def shape(self):
        return (self.n, self.n)

    def drop_empty_remainder(self):
        return BandedSplit3D(self.G, None, self.n)

    def __matmul__(self, v):
        R, M, W1 = self.G.shape3d
        vg = jnp.pad(v, (0, R * M * W1 - self.n))
        y = (self.G @ vg)[: self.n]
        return y if self.rem is None else y + self.rem @ v

    def diagonal(self):
        k0 = self.G.offsets3d.index((0, 0, 0))
        dd = self.G.data[k0].reshape(-1)[: self.n]
        return dd if self.rem is None else dd + self.rem.diagonal()

    def astype(self, dtype):
        return BandedSplit3D(
            GridDIA3D(self.G.data.astype(dtype), self.G.offsets3d,
                      self.G.shape3d),
            None if self.rem is None else self.rem.astype(dtype), self.n,
        )

    def with_added_diagonal(self, d):
        """A + diag(d) (implicit-Euler shift): center layer only."""
        R, M, W1 = self.G.shape3d
        k0 = self.G.offsets3d.index((0, 0, 0))
        dg = jnp.pad(jnp.asarray(d, self.G.data.dtype),
                     (0, R * M * W1 - self.n)).reshape(R, M, W1)
        data = self.G.data.at[k0].add(dg)
        return BandedSplit3D(GridDIA3D(data, self.G.offsets3d,
                                       self.G.shape3d), self.rem, self.n)

    def fold_dirichlet(self, mask):
        R, M, W1 = self.G.shape3d
        free = jnp.pad((~mask).astype(self.G.data.dtype),
                       (0, R * M * W1 - self.n))
        Gm = self.G.with_dirichlet_identity(free)
        if self.rem is None:
            return BandedSplit3D(Gm, None, self.n)
        fr = free[: self.n]
        rv = self.rem.vals * fr[None, :] * fr[self.rem.cols]
        return BandedSplit3D(Gm, ELLSoA(rv, self.rem.cols, self.rem.shape),
                             self.n)


@jax.tree_util.register_pytree_node_class
class BandedMGPreconditioner3D:
    """GridMG3D Galerkin multigrid ON the (R, M, W1) banded lattice —
    3D counterpart of dia_split.BandedMGPreconditioner: the lattice is an
    approximate geometric embedding whenever the two-spacing plan covered
    the histogram, so bilinear coarsening on the cube embedding yields an
    SPD V-cycle with zero gathers at every level."""

    def __init__(self, mg, shape3d, n, m):
        self.mg = mg
        self.shape3d = shape3d
        self.n = n
        self.m = m

    def tree_flatten(self):
        return (self.mg,), (self.shape3d, self.n, self.m)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)

    @classmethod
    def build(cls, F: BandedSplit3D, dtype=jnp.float32, coarse_n: int = 8,
              omega: float = 0.8, nu: int = 2, coarse_iters: int = 64):
        """F: Dirichlet-folded BandedSplit3D. The (R, M, W1) lattice embeds
        into the next (m, m, m) cube with (m - 1) % 8 == 0 (identity on
        padding); ONE jitted program builds embed + the Galerkin chain."""
        from .grid_mg3d import GridMG3D, galerkin_coarsen3d
        import itertools

        if any(abs(a) > 1 or abs(b) > 1 or abs(c) > 1
               for a, b, c in F.G.offsets3d):
            return None
        R, M, W1 = F.G.shape3d
        m0 = max(R, M, W1)
        m = m0 + ((-(m0 - 1)) % 8)
        k0 = F.G.offsets3d.index((0, 0, 0))

        shapes = [m]
        offsets = [F.G.offsets3d]
        while True:
            nn = shapes[-1] - 1
            if nn % 2 != 0 or nn // 2 < coarse_n:
                break
            shapes.append(nn // 2 + 1)
            offsets.append(tuple(itertools.product((-1, 0, 1), repeat=3)))

        @jax.jit
        def embed_and_coarsen(data):
            K = data.shape[0]
            out = jnp.zeros((K, m, m, m), dtype)
            out = out.at[:, :R, :M, :W1].set(data.astype(dtype))
            ii = jnp.arange(m)
            padmask = ((ii[:, None, None] >= R)
                       | (ii[None, :, None] >= M)
                       | (ii[None, None, :] >= W1))
            out = out.at[k0].set(jnp.where(padmask, 1.0, out[k0]))
            levels = [out]
            lvl = GridDIA3D(out, F.G.offsets3d, (m, m, m))
            for _ in range(len(shapes) - 1):
                lvl = galerkin_coarsen3d(lvl)
                levels.append(lvl.data)
            return tuple(levels)

        datas = list(embed_and_coarsen(F.G.data))
        mg = GridMG3D(datas, tuple(offsets), tuple(shapes), omega, nu,
                      coarse_iters)
        return cls(mg, (R, M, W1), F.n, m)

    def __call__(self, r):
        R, M, W1 = self.shape3d
        m, n = self.m, self.n
        rp = jnp.pad(r, (0, R * M * W1 - n)).reshape(R, M, W1)
        rp = jnp.pad(rp, ((0, m - R), (0, m - M), (0, m - W1)))
        z = self.mg.v_cycle(rp.reshape(-1))
        return z.reshape(m, m, m)[:R, :M, :W1].reshape(-1)[:n]

    __matmul__ = __call__
