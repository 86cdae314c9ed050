"""Auxiliary structured-grid preconditioner for unstructured meshes.

TPU reality (measured, BENCH_NOTES.md round 2): generic gather/scatter SpMV
runs at ~64M nnz/s on v5e — every AMG V-cycle level pays that rate, so a
Chebyshev(3) V-cycle at 0.5M dofs costs ~0.5 s. The auxiliary-space method
(Xu 1996) sidesteps it: precondition the unstructured operator with

    B r = omega * D^{-1} r  +  P  G^{-1}  P^T r

where P is the BILINEAR interpolation from a uniform auxiliary grid over
the mesh's bounding box (4 nnz per mesh node — an order of magnitude fewer
gathers than one matrix SpMV) and G^{-1} is one V-cycle of the structured
stencil multigrid (ops/grid_mg.py — static slices at memory bandwidth,
no gathers at all). B is SPD (sum of SPD terms), so it drops into CG.

For shape-regular meshes on box-like domains this gives h-independent
iteration counts at a fraction of AMG's per-iteration cost; for wilder
domains pass a custom `grid_free` mask (grid nodes outside the domain get
identity rows) or fall back to linear_algebra/amg.py (topology-only,
always applicable).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .grid_dia import GridDIAMatrix
from .grid_mg import GridMG

__all__ = ["AuxGridPreconditioner", "AuxGridPreconditioner3D"]


@jax.tree_util.register_pytree_node_class
class AuxGridPreconditioner:
    """z = omega * dinv * r + P V(P^T r); jittable pytree."""

    def __init__(self, idx, w, dinv, mg, omega, n_grid):
        self.idx = idx  # (4, n) int32 auxiliary grid node ids (SoA)
        self.w = w  # (4, n) bilinear weights
        self.dinv = dinv  # (n,) inverse diagonal of the mesh operator
        self.mg = mg  # GridMG over the auxiliary stencil
        self.omega = omega
        self.n_grid = n_grid  # grid nodes per side (m = n_grid + 1)

    def tree_flatten(self):
        return (self.idx, self.w, self.dinv, self.mg), (self.omega, self.n_grid)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def build(cls, nodes, diag, grid_n: int | None = None, bbox=None,
              grid_free=None, omega: float = 0.5, coarse_n: int = 32,
              mg_nu: int = 2, dtype=None):
        """Host-side setup.

        nodes: (n, 2) mesh node coordinates; diag: (n,) diagonal of the
        (masked) mesh operator; grid_n: auxiliary cells per side (default
        ~sqrt(n), rounded to even for deep MG coarsening); grid_free:
        optional (m, m) bool of PDE-interior grid nodes (default: interior
        of the bounding box).
        """
        nodes = np.asarray(nodes, dtype=np.float64)
        n = nodes.shape[0]
        if dtype is None:
            dtype = jnp.asarray(diag).dtype
        if bbox is None:
            lo = nodes.min(axis=0)
            hi = nodes.max(axis=0)
        else:
            lo, hi = np.asarray(bbox[0], float), np.asarray(bbox[1], float)
        if grid_n is None:
            grid_n = int(2 * round(np.sqrt(n) / 2))
        m = grid_n + 1
        span = np.where(hi > lo, hi - lo, 1.0)
        u = (nodes - lo) / span * grid_n  # grid coordinates
        cell = np.clip(np.floor(u).astype(np.int64), 0, grid_n - 1)
        frac = u - cell
        i0, j0 = cell[:, 0], cell[:, 1]
        fx, fy = frac[:, 0], frac[:, 1]
        # SoA (4, n) layout: an (n, 4) device array lane-pads 4 -> 128
        # (32x HBM at 10M nodes; BENCH_NOTES.md layout rules)
        idx = np.stack(
            [
                i0 * m + j0,
                (i0 + 1) * m + j0,
                i0 * m + (j0 + 1),
                (i0 + 1) * m + (j0 + 1),
            ],
            axis=0,
        ).astype(np.int32)
        w = np.stack(
            [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
            axis=0,
        )

        # auxiliary operator: 5-point Laplacian stencil (FEM stiffness
        # scaling — entries O(1) in 2D, matching the mesh operator) with
        # Dirichlet identity outside `grid_free`
        if isinstance(grid_free, str) and grid_free == "auto":
            # non-box domains: free grid nodes are bbox-interior nodes
            # incident to a grid cell that actually contains mesh nodes —
            # the void outside the domain gets identity rows so the
            # auxiliary solve cannot spread corrections through it
            occ = np.zeros((grid_n, grid_n), dtype=bool)
            occ[i0, j0] = True
            node_free = np.zeros((m, m), dtype=bool)
            node_free[:-1, :-1] |= occ
            node_free[1:, :-1] |= occ
            node_free[:-1, 1:] |= occ
            node_free[1:, 1:] |= occ
            node_free[[0, -1], :] = False
            node_free[:, [0, -1]] = False
            grid_free = node_free
        elif grid_free is None:
            interior1d = np.zeros(m, dtype=bool)
            interior1d[1:-1] = True
            grid_free = interior1d[:, None] & interior1d[None, :]
        free = jnp.asarray(np.asarray(grid_free, dtype=np.float64)).astype(dtype)
        freep = jnp.pad(free, 1)
        offs5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
        layers = [jnp.where(free > 0, 4.0, 1.0).astype(free.dtype)]
        for di, dj in offs5[1:]:
            layers.append(
                -1.0
                * free
                * jax.lax.slice(
                    freep, (1 + di, 1 + dj), (1 + di + m, 1 + dj + m)
                )
            )
        G = GridDIAMatrix(jnp.stack(layers), offs5, (m, m))
        mg = GridMG.build(G, coarse_n=min(coarse_n, max(2, grid_n // 4)),
                          nu=mg_nu)

        d = np.asarray(diag, dtype=np.float64)
        dinv = jnp.asarray(
            np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
        ).astype(free.dtype)
        return cls(jnp.asarray(idx), jnp.asarray(w).astype(free.dtype), dinv,
                   mg, omega, grid_n)

    @classmethod
    def build_device(cls, nodes, diag, grid_n: int | None = None,
                     bbox=((0.0, 0.0), (1.0, 1.0)), omega: float = 0.5,
                     coarse_n: int = 32, mg_nu: int = 2, dtype=None):
        """Fully ON-DEVICE setup for meshes generated on device.

        The host `build` would pull the (n, 2) coordinates through the
        harness relay (O(minutes) at 10M nodes); here the interpolation
        table, diagonal and auxiliary stencil are computed in one jitted
        program and the Galerkin hierarchy by GridMG.build's own jit.
        Box domains only (grid_free = interior of the static `bbox` —
        pass the host `build` with grid_free="auto" for wilder domains).

        nodes: (n, 2) array, or a (x, y) tuple of 1-D coordinate arrays —
        REQUIRED at 10M+ scale, where an (n, 2) device layout lane-pads
        2 -> 128 (64x HBM; BENCH_NOTES.md layout rules).
        """
        import numpy as np_  # noqa: N813 — host scalars only

        soa = isinstance(nodes, (tuple, list))
        n = nodes[0].shape[0] if soa else nodes.shape[0]
        if dtype is None:
            dtype = jnp.float32
        if grid_n is None:
            grid_n = int(2 * round(np_.sqrt(n) / 2))
        m = grid_n + 1
        lo = tuple(float(v) for v in bbox[0])
        hi = tuple(float(v) for v in bbox[1])
        span = tuple(h - l if h > l else 1.0 for l, h in zip(lo, hi))
        offs5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))

        @jax.jit
        def setup(nodes, diag):
            xs = nodes[0] if soa else nodes[:, 0]
            ys = nodes[1] if soa else nodes[:, 1]
            u0 = (xs.astype(dtype) - lo[0]) / span[0] * grid_n
            u1 = (ys.astype(dtype) - lo[1]) / span[1] * grid_n
            i0 = jnp.clip(jnp.floor(u0).astype(jnp.int32), 0, grid_n - 1)
            j0 = jnp.clip(jnp.floor(u1).astype(jnp.int32), 0, grid_n - 1)
            # nodes outside the static bbox land on clipped cells; clamping
            # the fractions keeps the bilinear weights in [0,1] (P stays
            # well-formed — nearest-cell interpolation for outliers)
            fx = jnp.clip(u0 - i0.astype(dtype), 0.0, 1.0)
            fy = jnp.clip(u1 - j0.astype(dtype), 0.0, 1.0)
            idx = jnp.stack(
                [
                    i0 * m + j0,
                    (i0 + 1) * m + j0,
                    i0 * m + (j0 + 1),
                    (i0 + 1) * m + (j0 + 1),
                ],
                axis=0,
            )
            w = jnp.stack(
                [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
                axis=0,
            )
            gid = jnp.arange(m)
            int1d = (gid > 0) & (gid < grid_n)
            free = (int1d[:, None] & int1d[None, :]).astype(dtype)
            freep = jnp.pad(free, 1)
            layers = [jnp.where(free > 0, 4.0, 1.0).astype(dtype)]
            for di, dj in offs5[1:]:
                layers.append(
                    -1.0 * free * jax.lax.slice(
                        freep, (1 + di, 1 + dj), (1 + di + m, 1 + dj + m)
                    )
                )
            d = diag.astype(dtype)
            dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
            return idx, w, jnp.stack(layers), dinv

        idx, w, data, dinv = setup(nodes, diag)
        G = GridDIAMatrix(data, offs5, (m, m))
        mg = GridMG.build(G, coarse_n=min(coarse_n, max(2, grid_n // 4)),
                          nu=mg_nu)
        return cls(idx, w, dinv, mg, omega, grid_n)

    def __call__(self, r):
        m = self.n_grid + 1
        # P^T r: scatter the 4 bilinear weights per node onto the grid
        rc = jax.ops.segment_sum(
            (self.w * r[None, :]).reshape(-1),
            self.idx.reshape(-1),
            m * m,
        )
        z_g = self.mg.v_cycle(rc)
        # P z_g: gather back
        z = (z_g[self.idx] * self.w).sum(axis=0)
        return self.omega * self.dinv * r + z


@jax.tree_util.register_pytree_node_class
class AuxGridPreconditioner3D:
    """3D counterpart: trilinear interpolation (8 weights per node) onto a
    uniform (m, m, m) lattice + one GridMG3D V-cycle + damped Jacobi."""

    def __init__(self, idx, w, dinv, mg, omega, n_grid):
        self.idx = idx  # (8, n) int32 (SoA)
        self.w = w  # (8, n)
        self.dinv = dinv
        self.mg = mg  # GridMG3D
        self.omega = omega
        self.n_grid = n_grid

    def tree_flatten(self):
        return (self.idx, self.w, self.dinv, self.mg), (self.omega, self.n_grid)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def build(cls, nodes, diag, grid_n: int | None = None, bbox=None,
              grid_free=None, omega: float = 0.5, coarse_n: int = 8,
              mg_nu: int = 2, dtype=None):
        from .grid3d import GridDIA3D
        from .grid_mg3d import GridMG3D

        nodes = np.asarray(nodes, dtype=np.float64)
        n = nodes.shape[0]
        if dtype is None:
            dtype = jnp.asarray(diag).dtype
        if bbox is None:
            lo, hi = nodes.min(axis=0), nodes.max(axis=0)
        else:
            lo, hi = np.asarray(bbox[0], float), np.asarray(bbox[1], float)
        if grid_n is None:
            grid_n = max(4, int(2 * round(n ** (1.0 / 3.0) / 2)))
        m = grid_n + 1
        span = np.where(hi > lo, hi - lo, 1.0)
        u = (nodes - lo) / span * grid_n
        cell = np.clip(np.floor(u).astype(np.int64), 0, grid_n - 1)
        frac = u - cell
        corners = []
        weights = []
        for a in (0, 1):
            for b in (0, 1):
                for c in (0, 1):
                    corners.append(
                        (cell[:, 0] + a) * m * m
                        + (cell[:, 1] + b) * m
                        + (cell[:, 2] + c)
                    )
                    wa = frac[:, 0] if a else 1 - frac[:, 0]
                    wb = frac[:, 1] if b else 1 - frac[:, 1]
                    wc = frac[:, 2] if c else 1 - frac[:, 2]
                    weights.append(wa * wb * wc)
        idx = np.stack(corners, axis=0).astype(np.int32)  # SoA (8, n)
        w = np.stack(weights, axis=0)

        # 7-point Laplacian stencil; 3D FEM stiffness entries scale like h,
        # so the auxiliary operator is scaled by the grid spacing
        h = float(span.mean()) / grid_n
        if grid_free is None:
            int1d = np.zeros(m, dtype=bool)
            int1d[1:-1] = True
            grid_free = (
                int1d[:, None, None] & int1d[None, :, None] & int1d[None, None, :]
            )
        free = jnp.asarray(np.asarray(grid_free, np.float64)).astype(dtype)
        freep = jnp.pad(free, 1)
        offs7 = (
            (0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1),
        )
        layers = [jnp.where(free > 0, 6.0 * h, 1.0).astype(free.dtype)]
        for di, dj, dk in offs7[1:]:
            layers.append(
                -h
                * free
                * jax.lax.slice(
                    freep,
                    (1 + di, 1 + dj, 1 + dk),
                    (1 + di + m, 1 + dj + m, 1 + dk + m),
                )
            )
        G = GridDIA3D(jnp.stack(layers), offs7, (m, m, m))
        mg = GridMG3D.build(G, coarse_n=min(coarse_n, max(2, grid_n // 2)),
                            nu=mg_nu)

        d = np.asarray(diag, dtype=np.float64)
        dinv = jnp.asarray(
            np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
        ).astype(free.dtype)
        return cls(jnp.asarray(idx), jnp.asarray(w).astype(free.dtype), dinv,
                   mg, omega, grid_n)

    @classmethod
    def build_device(cls, nodes, diag, grid_n: int | None = None,
                     bbox=((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
                     omega: float = 0.5, coarse_n: int = 8, mg_nu: int = 2,
                     dtype=None):
        """Fully on-device 3D setup (see the 2D build_device). Box domains;
        the auxiliary 7-point stencil is scaled by the grid spacing h (3D
        FEM stiffness entries are O(h))."""
        import numpy as np_  # noqa: N813 — host scalars only

        from .grid3d import GridDIA3D
        from .grid_mg3d import GridMG3D

        n = nodes.shape[0]
        if dtype is None:
            dtype = jnp.float32
        if grid_n is None:
            grid_n = max(4, int(2 * round(n ** (1.0 / 3.0) / 2)))
        m = grid_n + 1
        lo = tuple(float(v) for v in bbox[0])
        hi = tuple(float(v) for v in bbox[1])
        span = tuple(h - l if h > l else 1.0 for l, h in zip(lo, hi))
        h = float(sum(span) / 3.0) / grid_n
        offs7 = (
            (0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1),
        )

        @jax.jit
        def setup(nodes, diag):
            cells = []
            fracs = []
            for ax in range(3):
                u = (nodes[:, ax].astype(dtype) - lo[ax]) / span[ax] * grid_n
                cax = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, grid_n - 1)
                cells.append(cax)
                # clamp: out-of-bbox nodes keep weights in [0,1] (see 2D)
                fracs.append(jnp.clip(u - cax.astype(dtype), 0.0, 1.0))
            corners, weights = [], []
            for a in (0, 1):
                for bb in (0, 1):
                    for cc in (0, 1):
                        corners.append(
                            (cells[0] + a) * m * m
                            + (cells[1] + bb) * m
                            + (cells[2] + cc)
                        )
                        wa = fracs[0] if a else 1 - fracs[0]
                        wb = fracs[1] if bb else 1 - fracs[1]
                        wc = fracs[2] if cc else 1 - fracs[2]
                        weights.append(wa * wb * wc)
            idx = jnp.stack(corners, axis=0)  # SoA (8, n)
            w = jnp.stack(weights, axis=0)
            gid = jnp.arange(m)
            int1d = (gid > 0) & (gid < grid_n)
            free = (
                int1d[:, None, None]
                & int1d[None, :, None]
                & int1d[None, None, :]
            ).astype(dtype)
            freep = jnp.pad(free, 1)
            layers = [jnp.where(free > 0, 6.0 * h, 1.0).astype(dtype)]
            for di, dj, dk in offs7[1:]:
                layers.append(
                    -h * free * jax.lax.slice(
                        freep,
                        (1 + di, 1 + dj, 1 + dk),
                        (1 + di + m, 1 + dj + m, 1 + dk + m),
                    )
                )
            d = diag.astype(dtype)
            dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
            return idx, w, jnp.stack(layers), dinv

        idx, w, data, dinv = setup(nodes, diag)
        G = GridDIA3D(data, offs7, (m, m, m))
        mg = GridMG3D.build(G, coarse_n=min(coarse_n, max(2, grid_n // 2)),
                            nu=mg_nu)
        return cls(idx, w, dinv, mg, omega, grid_n)

    def __call__(self, r):
        m = self.n_grid + 1
        rc = jax.ops.segment_sum(
            (self.w * r[None, :]).reshape(-1), self.idx.reshape(-1), m**3
        )
        z_g = self.mg.v_cycle(rc)
        z = (z_g.reshape(-1)[self.idx] * self.w).sum(axis=0)
        return self.omega * self.dinv * r + z
