"""Lane-routed aux-grid preconditioner application.

Round-5 measurement (BENCH_NOTES): converged lane solves are
AUX-APPLY-BOUND — the bilinear P / P^T interpolation stages run 4n
gathered + 4n scattered elements per apply at the flat XLA gather rate
(~0.13 G elem/s at 5-10M dofs: ~0.45 s of the 0.55 s per-iteration
cost), while the lane-routed operator SpMV itself takes ~14 ms.

This module routes BOTH interpolation stages through the same
lane-routed pallas kernel (ops/pallas_gather_spmv.py):

- P  (mesh rows x grid cols): already an ELL in SoA layout — the aux
  preconditioner stores (4, n) grid indices + weights. Under the
  strip-quantile mesh numbering (geometry/refine_device.strip_order:
  equal-population y-strips sorted by x) and a Y-MAJOR grid flat index,
  |grid_col - mesh_row| is O(strip population + m), far inside the
  kernel's 16384 static halo.
- P^T (grid rows x mesh cols): built by an on-device sort-based
  transpose (argsort + searchsorted ranking, the build_adjacency_soa
  idiom) into a (K_T, m^2) ELL whose band is the same O(pop + m).

The auxiliary V-cycle itself is x-major (GridMG over (m, m) arrays);
the y-major lane layout is bridged by two dense (m, m) transposes per
apply — XLA transposes run at memory bandwidth, ~0.1 ms at 5M nodes,
vs the ~0.45 s of flat gathers they replace.

Numberings that break the band assumption (block-scrambled controls,
P2 two-block dof layouts) overflow the routing window at BUILD time —
`from_aux` then raises and callers keep the plain XLA aux apply; an
optional internal strip `perm` trades two n-gathers per apply for
band-alignment on such numberings.

Reference anchor: this accelerates the preconditioner application of
the iterative replacement for Eigen SparseLU's converge-on-any-mesh
envelope (fem_linear_elliptic_solver.h:38-47).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .matfree_soa import ELLSoA
from .pallas_gather_spmv import (LaneRoutedELL, _chunk_loads,
                                 budgets_from_loads)

__all__ = ["LaneAuxGrid", "interp_transpose_ell", "lane_friendly_grid_n"]


def lane_friendly_grid_n(n: int) -> int:
    """Largest even grid_n with (grid_n + 1)^2 <= n mesh nodes.

    The routing window requires |grid_col - mesh_row| < 16384; with
    m^2 <= n the linear drift y * (m^2 - n) of the y-major grid index
    against a strip-quantile mesh numbering stays SMALL AND NEGATIVE
    (<= n - m^2 ~ 2 sqrt n), leaving the halo to the strip deviation.
    The default aux choice (2 * round(sqrt(n) / 2)) can land at
    m^2 - n ~ +2 sqrt n ~ 7.6k at 5M dofs — half the halo gone."""
    g = int(n ** 0.5) - 1
    g -= g % 2
    while g > 2 and (g + 1) * (g + 1) > n:
        g -= 2
    return max(2, g)


@functools.partial(jax.jit, static_argnums=(2,))
def _degree_max(idx, w, m2):
    """Max grid-node in-degree of the interpolation (one scatter-add)."""
    g = idx.reshape(-1)
    live = w.reshape(-1) != 0
    cnt = jnp.zeros((m2 + 1,), jnp.int32).at[
        jnp.where(live, g, m2)].add(1, mode="drop")
    return jnp.max(cnt[:m2])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _transpose_tables(idx, w, n, m2, K_T):
    """(K_T, m2) ELL of the interpolation transpose: grid row g gathers
    the mesh nodes whose bilinear stencil touches g. Sort-based ranking
    (argsort + searchsorted — one-time device cost at 4n elements).
    Padding entries carry val 0 and a BAND-LOCAL column (the clipped
    row id): window_bandwidth and the routing window must not see
    artificial full-length offsets.

    Rows with in-degree > K_T keep their first K_T entries in the ELL;
    the excess is compacted to the FRONT of a COO triple (rows, cols,
    vals) — schedule-build cost scales with K_T * m2, so capping K_T
    at ~2x the mean degree instead of the max keeps the whole build in
    ONE fused program (the ELL-padding tasks are dead but still flow
    through every full-size scheduler array op)."""
    K = idx.shape[0]
    g = idx.reshape(-1).astype(jnp.int32)
    i = jnp.tile(jnp.arange(n, dtype=jnp.int32), K)
    wv = w.reshape(-1)
    live = wv != 0
    gs = jnp.where(live, g, m2)  # dead weights sort past the end
    NT = gs.shape[0]
    order = jnp.argsort(gs, stable=True).astype(jnp.int32)
    sg = gs[order]
    ids = jnp.arange(m2, dtype=gs.dtype)
    starts = jnp.searchsorted(sg, ids)
    ends = jnp.searchsorted(sg, ids + 1)
    counts = (ends - starts).astype(jnp.int32)
    k = jnp.arange(K_T, dtype=jnp.int32)[:, None]
    pos = starts[None, :].astype(jnp.int32) + k
    mask = k < counts[None, :]
    src = order[jnp.clip(pos, 0, NT - 1)]
    pad_col = jnp.minimum(ids.astype(jnp.int32), n - 1)[None, :]
    cols = jnp.where(mask, i[src], pad_col)
    vals = jnp.where(mask, wv[src], 0.0)
    # overflow entries (within-row rank >= K_T), compacted to the front
    rank_sorted = (jnp.arange(NT, dtype=jnp.int32)
                   - starts[jnp.clip(sg, 0, m2 - 1)].astype(jnp.int32))
    ovf = (sg < m2) & (rank_sorted >= K_T)
    posc = jnp.cumsum(ovf.astype(jnp.int32)) - 1
    tgt = jnp.where(ovf, posc, NT)
    orow = jnp.zeros((NT + 1,), jnp.int32).at[tgt].set(
        sg.astype(jnp.int32), mode="drop")[:-1]
    ocol = jnp.zeros((NT + 1,), jnp.int32).at[tgt].set(
        i[order], mode="drop")[:-1]
    oval = jnp.zeros((NT + 1,), wv.dtype).at[tgt].set(
        wv[order], mode="drop")[:-1]
    # per-chunk loads of the transpose (piggybacked: saves the
    # _chunk_loads program + its compile-roulette spin)
    loads = _chunk_loads(cols, vals, m2)
    return cols, vals, orow, ocol, oval, jnp.sum(ovf), loads


@functools.partial(jax.jit, static_argnums=(3,))
def _ovf_slice(orow, ocol, oval, L):
    return orow[:L], ocol[:L], oval[:L]


def interp_transpose_ell(idx, w, n, m2, max_k: int = 30, k_cap: int = 8,
                         kmax: int | None = None):
    """Build the transpose interpolation ELL (grid rows). Returns
    (ELLSoA((m2, n)), overflow COO ((rows, cols, vals), count) or None,
    per-chunk loads). K is min(max degree, k_cap); the overflow rides
    the lane operator's COO remainder path. Pass `kmax` (the max grid
    in-degree) when already known to skip the _degree_max program."""
    if kmax is None:
        kmax = int(_degree_max(idx, w, m2))
    K_T = max(1, min(int(kmax), min(max_k, k_cap)))
    cols, vals, orow, ocol, oval, n_ovf, loads = _transpose_tables(
        idx, w, n, m2, K_T)
    nr = int(n_ovf)
    coo = None
    if nr:
        L = min(max(128, 1 << (nr - 1).bit_length()), orow.shape[0])
        coo = (_ovf_slice(orow, ocol, oval, L), nr)
    return ELLSoA(vals, cols, (m2, n)), coo, loads


@jax.tree_util.register_pytree_node_class
class _StagePT:
    """v = P^T r (lane kernel; optional internal strip permutation)."""

    def __init__(self, PT, order=None):
        self.PT = PT
        self.order = order

    def tree_flatten(self):
        return (self.PT, self.order), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    def __call__(self, v, r):
        if self.order is not None:
            r = r[self.order]
        return self.PT @ r


@jax.tree_util.register_pytree_node_class
class _StageV:
    """v = V(v): one x-major V-cycle bridged by (m, m) transposes."""

    def __init__(self, mg, m: int):
        self.mg = mg
        self.m = m

    def tree_flatten(self):
        return (self.mg,), (self.m,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux[0])

    def __call__(self, v, r):
        m = self.m
        rc = v.reshape(m, m).T.reshape(-1)  # y-major -> x-major
        z = self.mg.v_cycle(rc)
        return z.reshape(m, m).T.reshape(-1)


@jax.tree_util.register_pytree_node_class
class _StageP:
    """z = omega * dinv * r + P v (lane kernel + Jacobi term)."""

    def __init__(self, P, dinv, omega, rank=None):
        self.P = P
        self.dinv = dinv
        self.omega = omega
        self.rank = rank

    def tree_flatten(self):
        return (self.P, self.dinv, self.rank), (self.omega,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        P, dinv, rank = leaves
        return cls(P, dinv, aux[0], rank=rank)

    def __call__(self, v, r):
        z = self.P @ v
        if self.rank is not None:
            z = z[self.rank]
        return self.omega * self.dinv * r + z


@jax.tree_util.register_pytree_node_class
class LaneAuxGrid:
    """Aux-grid preconditioner with lane-routed P / P^T stages.

    Drop-in for AuxGridPreconditioner in CG (`__call__`), plus
    `split_stages` for cg_split_programs: each stage runs as its OWN
    device program — a fused pallas-kernel + deep-V-cycle program pays
    a pathological (~250 s) server-side compile on the TPU harness
    (CLAUDE.md round-5 facts), while the stages alone compile in
    seconds.
    """

    def __init__(self, P, PT, dinv, mg, omega, n_grid, order=None,
                 rank=None):
        self.P = P  # LaneRoutedELL (n, m^2), y-major grid cols
        self.PT = PT  # LaneRoutedELL (m^2, n)
        self.dinv = dinv
        self.mg = mg
        self.omega = omega
        self.n_grid = n_grid
        self.order = order  # internal strip permutation (None: identity)
        self.rank = rank

    def tree_flatten(self):
        return (self.P, self.PT, self.dinv, self.mg, self.order,
                self.rank), (self.omega, self.n_grid)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        P, PT, dinv, mg, order, rank = leaves
        return cls(P, PT, dinv, mg, aux[0], aux[1], order=order,
                   rank=rank)

    @property
    def split_stages(self):
        return (_StagePT(self.PT, self.order),
                _StageV(self.mg, self.n_grid + 1),
                _StageP(self.P, self.dinv, self.omega, self.rank))

    def __call__(self, r):
        v = r
        for stage in self.split_stages:
            v = stage(v, r)
        return v

    @classmethod
    def from_aux(cls, aux, rounds: int = 16, max_k: int = 30, perm=None,
                 k_cap: int = 8):
        """Build from a host/device AuxGridPreconditioner.

        The grid flat index is TRANSPOSED to y-major so the band aligns
        with strip-quantile mesh numberings (y-strips sorted by x);
        `perm = (order, rank)` optionally permutes the mesh side into
        strip order internally (two n-gathers per apply) for numberings
        with no spatial locality. Raises ValueError when the band
        exceeds the kernel's static halo or a transpose degree exceeds
        `max_k` — callers fall back to the XLA aux apply.
        """
        m = aux.n_grid + 1
        m2 = m * m
        n = aux.dinv.shape[0]
        order = rank = None
        if perm is not None:
            order, rank = perm
        idx_t, w, loads_p, kmax = _prep_tables(aux.idx, aux.w, m, order)
        P_ell = ELLSoA(w, idx_t, (n, m2))
        K = int(aux.idx.shape[0])
        P = LaneRoutedELL.from_ell(
            P_ell, p_max=budgets_from_loads(loads_p, K), rounds=rounds)
        PT_ell, ovf, loads_t = interp_transpose_ell(
            idx_t, w, n, m2, max_k=max_k, k_cap=k_cap, kmax=int(kmax))
        PT = LaneRoutedELL.from_ell(
            PT_ell, p_max=budgets_from_loads(loads_t,
                                             PT_ell.vals.shape[0]),
            rounds=rounds)
        if ovf is not None:
            PT = _merge_rem(PT, ovf)
        return cls(P, PT, aux.dinv, aux.mg, aux.omega, aux.n_grid,
                   order=order, rank=rank)


@jax.jit
def _cat_rem(rem, triple):
    rr, rc, rv = rem
    orow, ocol, oval = triple
    return (jnp.concatenate([rr, orow]),
            jnp.concatenate([rc, ocol]),
            jnp.concatenate([rv, oval.astype(rv.dtype)]))


def _merge_rem(op, coo):
    """Append a COO triple to a LaneRoutedELL's remainder (one tiny
    program): the transpose-cap overflow rides the same XLA scatter-add
    path as unrouted tasks."""
    triple, nr = coo
    out = LaneRoutedELL(op.L1, op.L2M, op.VALS, _cat_rem(op.rem, triple),
                        op._diag, op.n, op.p_max, n_src=op.n_src)
    out.n_remainder = op.n_remainder + nr
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def _prep_tables(idx, w, m, order):
    """Permute mesh side into strip order (optional) + transpose grid
    flat ids from x-major (i * m + j) to y-major (j * m + i) — one
    program (eager ops are unusable on the remote-TPU harness). Also
    piggybacks P's per-chunk loads and the grid in-degree max (saves
    two more program compile-roulette spins)."""
    if order is not None:
        idx = idx[:, order]
        w = w[:, order]
    idx_t = ((idx % m) * m + idx // m).astype(jnp.int32)
    n = w.shape[1]
    loads = _chunk_loads(idx_t, w, n)
    m2 = m * m
    g = idx_t.reshape(-1)
    live = w.reshape(-1) != 0
    cnt = jnp.zeros((m2 + 1,), jnp.int32).at[
        jnp.where(live, g, m2)].add(1, mode="drop")
    return idx_t, w, loads, jnp.max(cnt[:m2])
