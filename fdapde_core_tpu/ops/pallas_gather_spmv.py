"""Lane-routed pallas gather SpMV: scattered-banded matrices at VPU speed.

THE round-4 kernel (VERDICT r3 next #2). XLA's gather unit runs ~0.13 G
gathered elem/s at 10M rows regardless of index locality (measured,
benchmarks/micro_scatter_spmv.py) — the assembled-ELL SpMV for matrices
plan_split_width rejects (scattered RCM histograms: imported Delaunay
meshes, P2 numberings) is pinned to ~1.3 CG iters/s at 10.25M dofs. The
Mosaic lane-dim dynamic gather (jnp.take_along_axis(..., axis=1) inside a
pallas kernel, measured 0.5-16 T elem/s) is the only fast gather on this
hardware, but it only moves values WITHIN a 128-lane row.

This module composes an ARBITRARY banded gather out of lane gathers:

  out[a, m] = X[r2(a,m), c2(a,m)]            (X = (128, 128) window chunk)
            = T[a, L2[a, m]] with T = A^T,
              A = lane_gather(X, L1): A[r2, a] = X[r2, L1[r2, a]]

i.e. stage 1 parks the needed value of window row r2 at lane a, the
transpose turns window rows into lanes, and stage 2 picks the window row
per task. The catch is a ROUTING CONSTRAINT: stage 1's table L1 holds one
lane per (r2, a), so two tasks in the same output row a needing the same
window row r2 but different lanes c2 cannot share a pass. A vectorized
scheduler (one-time, jittable, runs on device) assigns every matrix entry
(task = (row, col, val)) to one of SP sub-passes such that within a pass

  (g, a, m)  is unique   (one task per output position), and
  (g, a, r2) is unique   (one stage-1 table cell per task),

with tasks falling out of P_MAX rounds compacted into a tiny ELL
remainder served by the (slow) XLA gather. Window chunking is free by
construction: with the halo padded to a full 16384-value tile, the
window of supertile g is EXACTLY the three adjacent tiles of the padded
x (BlockSpec index maps g, g+1, g+2 on the same array — no overlap, no
manual DMA). Bandwidth requirement: max |col - row| <= 16384 after RCM
(callers check; wider bands need a larger static halo).

Reference anchor: the assembled-operator SpMV feeding the iterative
solve that replaces Eigen SparseLU on ARBITRARY meshes
(fem_assembler.h:99-118, fem_linear_elliptic_solver.h:38-47) — this is
the TPU path for topologies the banded DIA split cannot serve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .matfree_soa import ELLSoA

__all__ = ["LaneRoutedELL", "schedule_lane_routed"]

TILE = 16384  # 128 sublanes x 128 lanes of f32
C_CHUNKS = 3  # window = [g-1, g, g+1] tiles; requires bandwidth <= TILE


# ---------------------------------------------------------------------------
# scheduler (device, one-time per operator)
# ---------------------------------------------------------------------------
#
# The build runs as FOUR bounded device programs (the round-4 build ran
# ~10 — on this harness EVERY program's first execution pays a 1-300 s
# remote-compile/queue roulette, which dominated the 176 s r04 setup):
#   phase 1: task prep + R1 full-size rounds + claim reassert + count
#   phase 2: compact unplaced subset + rounds + merge back + count
#            (called twice: the subset shrinks ~10x per call)
#   phase 3: final table scatters + remainder compaction + count
#   phase 4: remainder slice to a host-chosen static length
#
# Claim values are INT32 (the int64 scatter-max was the round-cost
# dominator at ~17 s/full-size round): within a round, two contenders on
# the same claim cell (g, sp, a, r2) always differ in their sublane
# position m — same (g, a, m) identifies the dof row, and same-row tasks
# in the same chunk carry distinct ranks, hence distinct sub-pass
# proposals when P_MAX > K (enforced) — so `placed<<13 | (t+1)<<7 | m`
# (14 bits) is unique among a cell's same-round contenders, dominates
# stale rounds via the (t+1) prefix, and placed claims dominate
# everything via bit 13. No task-id tiebreak, no int64 anywhere (the
# scheduler now runs identically with jax x64 disabled).

_MAX_ROUNDS = 62  # (t+1) must fit 6 bits in the int32 claim packing


def _pack_claim(placed, t, m):
    return ((placed.astype(jnp.int32) << 13)
            | ((t + jnp.int32(1)) << 7) | m)


def _pc_tuple(p_max):
    """Normalize a pass budget to per-chunk form: int -> (p, p, p)."""
    if isinstance(p_max, int):
        return (p_max,) * C_CHUNKS
    pc = tuple(int(v) for v in p_max)
    if len(pc) != C_CHUNKS:
        raise ValueError(f"p_max tuple must have {C_CHUNKS} entries")
    return pc


def _rounds_body(state9, placed, sp, tab, slots, P_MAX, R_PER, t0):
    """R_PER placement rounds (traced helper — callers fuse it into one
    bounded program; a 12-round full-size program ran past the ~60 s
    executor watchdog at 10.25M rows and took the worker down).

    Winner election per round: ONE int32 scatter-max claim table +
    gather-back compare — near-scalar but linear (an in-round 92M-element
    sort would cost minutes at this hardware's gather/scatter rates).

    - (sp, a, m) position uniqueness: within a round it is structural
      (per-group uniform strides, distinct ranks); ACROSS rounds each
      winner pins its slot bit in the per-(row, chunk) bitmask `slots`
      and proposals onto pinned bits are filtered out (each (group, p)
      bit is set at most once, so .add is an exact OR);
    - the claim table `tab` is allocated once and never cleared: values
      carry a (t+1) round prefix, so the current round's candidates
      always beat stale entries under max."""
    (ii, a, m, c, r2, rank, stride, live, gkey) = state9
    PC = _pc_tuple(P_MAX)  # per-chunk sub-pass budgets (round 5)
    SP = sum(PC)
    pm_c = jnp.array(PC, jnp.int32)[c]
    off_c = jnp.array((0, PC[0], PC[0] + PC[1]), jnp.int32)[c]
    # CAPACITY FILTER: a (row, chunk) group has pm_c distinct sub-
    # passes; tasks with rank >= pm_c never PROPOSE (they stay live —
    # the finish program compacts live & ~placed into the remainder,
    # so they ride the XLA path instead of silently vanishing or
    # double-booking a position)
    cap_ok = rank < pm_c
    NCELL = tab.shape[0] - 1
    NGRP = slots.shape[0] - 1
    key_base = (ii // TILE) * SP  # g * SP

    def one_round(k, st):
        placed, sp, tab, slots = st
        t = t0 + k
        p_prop = (rank + t * stride) % pm_c
        prop_sp = off_c + p_prop
        free_slot = (slots[gkey] >> p_prop) & 1 == 0
        trying = live & ~placed & free_slot & cap_ok
        spx = jnp.where(placed, sp, prop_sp)
        active = placed | trying
        packed = _pack_claim(placed, t, m)

        # cell ids fit int32 (NCELL < 2^31 at any supported size)
        cell = ((key_base + spx) * 128 + a) * 128 + r2
        idx = jnp.where(active, cell, NCELL)
        tab = tab.at[idx].max(packed, mode="drop")
        ok = tab[jnp.clip(cell, 0, NCELL - 1)] == packed
        newly = trying & ok
        sp = jnp.where(newly, prop_sp, sp)
        slots = slots.at[jnp.where(newly, gkey, NGRP)].add(
            jnp.int32(1) << p_prop, mode="drop")
        return placed | newly, sp, tab, slots

    return jax.lax.fori_loop(0, R_PER, one_round,
                             (placed, sp, tab, slots))


def _reassert_claims(tab, ii, a, m, r2, live, placed, sp, P_MAX):
    """Pin every placed task's cell with a dominant placed-bit value.

    A task that wins in the LAST round of a program never re-asserts its
    claim (re-assertion happens via participation in subsequent rounds),
    and the compacted phase-2 arrays exclude placed tasks entirely — a
    later round's (t+1)-prefixed candidate would override the stale
    trying-value and steal the cell. One scatter-max fixes the invariant
    for every placed task at once."""
    SP = sum(_pc_tuple(P_MAX))
    NCELL = tab.shape[0] - 1
    key_base = (ii // TILE) * SP
    cell = ((key_base + sp) * 128 + a) * 128 + r2
    idx = jnp.where(placed & live, cell, NCELL)
    return tab.at[idx].max((jnp.int32(1) << 13) | m, mode="drop")


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _sched_phase1(cols, vals, n, K, P_MAX, R1):
    """Task geometry + R1 full-size rounds + reassert + unplaced count,
    fused into ONE bounded program (~25-30 s at 10.25M rows)."""
    i = jnp.arange(n, dtype=jnp.int32)
    colsf = cols.reshape(-1)  # (K*n,) slot-major
    valsf = vals.reshape(-1)
    ii = jnp.tile(i, (K,))
    live = valsf != 0.0  # ELL padding: val 0 (col = row) — never routed

    g = ii // TILE
    # INTERLEAVED position map: tile row a draws its 128 tasks from rows
    # {a, a+128, ...} spread across the whole supertile, so their columns
    # cover the whole window — stage-1 cell contention stays ~K*16384 /
    # (16384 + 2B) even when 128 CONSECUTIVE rows share a column cluster
    # (block scrambles, RCM clusters). The kernel writes acc.T to restore
    # row-major output.
    a = ii % 128
    m = (ii // 128) % 128
    w = colsf - (g - 1) * TILE  # window-local position
    inwin = (w >= 0) & (w < C_CHUNKS * TILE)
    overflow = jnp.any(live & ~inwin)  # bandwidth > TILE: caller rejects
    live = live & inwin
    wc = jnp.clip(w, 0, C_CHUNKS * TILE - 1)
    c = (wc // TILE).astype(jnp.int32)
    r2 = ((wc // 128) % 128).astype(jnp.int32)
    c2 = (wc % 128).astype(jnp.int32)

    # rank among the row's same-chunk tasks -> initial pass proposal.
    # Computed slot-against-slot (K^2/2 masked compares over (n,)):
    # a 92M-element argsort here costs ~20 s on this hardware.
    c2d = c.reshape(K, n)
    live2d = live.reshape(K, n)
    rank2d = jnp.zeros((K, n), jnp.int32)
    for k in range(1, K):
        acc = jnp.zeros((n,), jnp.int32)
        for kp in range(k):
            acc = acc + ((c2d[kp] == c2d[k]) & live2d[kp]).astype(
                jnp.int32)
        rank2d = rank2d.at[k].set(acc)
    rank = rank2d.reshape(-1)
    # Proposing ranks lie in [0, pm_c) (the rounds' capacity filter
    # keeps rank >= pm_c tasks out — they fall to the remainder) and
    # are distinct mod pm_c for ANY uniform per-group stride: two tasks
    # of the same row can never propose the same sub-pass — (sp, a, m)
    # position uniqueness holds BY CONSTRUCTION and the rounds need
    # only the stage-1 (sp, a, r2) claim check. (A per-task stride
    # would need a second full-size claim table per round at 10M rows.)
    PC = _pc_tuple(P_MAX)
    SP = sum(PC)
    pm_c = jnp.array(PC, jnp.int32)[c]
    stride = 1 + (ii * 7919 + c * 104729) % jnp.maximum(pm_c - 1, 1)
    placed = jnp.zeros_like(live)
    sp = jnp.zeros_like(c)
    G = -(-n // TILE)
    ncell = G * SP * 128 * 128
    tab = jnp.full((ncell + 1,), jnp.int32(-1))
    slots = jnp.zeros((n * C_CHUNKS + 1,), jnp.int32)
    gkey = ii * C_CHUNKS + c

    # round 0 starts at t=1, not t=0: t=0 proposes the bare rank for
    # every group (zero per-group offset), which correlates collisions;
    # t>=1 offsets each (row, chunk) group by its own stride (measured
    # round-1 placement lever).
    placed, sp, tab, slots = _rounds_body(
        (ii, a, m, c, r2, rank, stride, live, gkey), placed, sp, tab,
        slots, P_MAX, R1, jnp.int32(1))
    tab = _reassert_claims(tab, ii, a, m, r2, live, placed, sp, P_MAX)
    n_left = jnp.sum(live & ~placed)
    return (ii, a, m, c, r2, c2, rank, stride, live, placed, sp,
            overflow, valsf, colsf, tab, slots, n_left)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 7),
                   donate_argnums=(1, 2))
def _sched_phase2(state11, tab, slots, n, P_MAX, R_PER, t0, L):
    """Compact the unplaced subset to length L, run R_PER rounds on it,
    merge placements back, reassert, count — ONE program. A round's
    scatter/gather cost is proportional to the subset size (~10% after
    phase 1, measured), so these rounds are ~10x cheaper than phase 1's.
    tab/slots are DONATED across phases (no full-size copies)."""
    (ii, a, m, c, r2, c2, rank, stride, live, placed, sp) = state11
    NT = live.shape[0]
    remt = live & ~placed
    pos = jnp.cumsum(remt.astype(jnp.int32)) - 1
    idx = jnp.where(remt & (pos < L), pos, L)

    def put(arr, fill):
        return jnp.full((L + 1,), fill, arr.dtype).at[idx].set(
            arr, mode="drop")[:-1]

    back = put(jnp.arange(NT, dtype=jnp.int32), NT)
    iic, ac, mc, cc, r2c = put(ii, 0), put(a, 0), put(m, 0), put(c, 0), \
        put(r2, 0)
    rankc, stridec, livec = put(rank, 0), put(stride, 1), put(remt, False)
    gkeyc = iic * C_CHUNKS + cc
    placed_c = jnp.zeros((L,), bool)
    sp_c = jnp.zeros((L,), jnp.int32)
    placed_c, sp_c, tab, slots = _rounds_body(
        (iic, ac, mc, cc, r2c, rankc, stridec, livec, gkeyc), placed_c,
        sp_c, tab, slots, P_MAX, R_PER, t0)
    # merge the subset's placements into the full arrays (non-placed
    # entries target index NT -> dropped out-of-bounds)
    midx = jnp.where(placed_c, back, NT)
    placed = placed.at[midx].set(True, mode="drop")
    sp = sp.at[midx].set(sp_c, mode="drop")
    tab = _reassert_claims(tab, iic, ac, mc, r2c, livec, placed_c, sp_c,
                           P_MAX)
    n_left = jnp.sum(live & ~placed)
    return placed, sp, tab, slots, n_left


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 8),
                   donate_argnums=(1, 2))
def _sched_finish(state11, tab, slots, valsf, n, P_MAX, R_REST, t0, L):
    """Compacted tail rounds + merge + FINAL TABLE SCATTERS fused into
    one program (the separate tables program alone cost ~68 s at 10.25M
    rows — mostly its own compile+queue round-trip). Remainder metadata
    is ONE task-id scatter (rtid); the (rows, cols, vals) triple is
    gathered from it at slice time over the small compact length.
    Cell indices are int32 throughout (an int64 variant OOM'd 16 GB)."""
    (ii, a, m, c, r2, c2, rank, stride, live, placed, sp) = state11
    NT = live.shape[0]
    if R_REST > 0:
        remt = live & ~placed
        pos = jnp.cumsum(remt.astype(jnp.int32)) - 1
        idx = jnp.where(remt & (pos < L), pos, L)

        def put(arr, fill):
            return jnp.full((L + 1,), fill, arr.dtype).at[idx].set(
                arr, mode="drop")[:-1]

        back = put(jnp.arange(NT, dtype=jnp.int32), NT)
        iic, ac, mc = put(ii, 0), put(a, 0), put(m, 0)
        cc, r2c = put(c, 0), put(r2, 0)
        rankc, stridec = put(rank, 0), put(stride, 1)
        livec = put(remt, False)
        gkeyc = iic * C_CHUNKS + cc
        placed_c = jnp.zeros((L,), bool)
        sp_c = jnp.zeros((L,), jnp.int32)
        placed_c, sp_c, tab, slots = _rounds_body(
            (iic, ac, mc, cc, r2c, rankc, stridec, livec, gkeyc),
            placed_c, sp_c, tab, slots, P_MAX, R_REST, t0)
        midx = jnp.where(placed_c, back, NT)
        placed = placed.at[midx].set(True, mode="drop")
        sp = sp.at[midx].set(sp_c, mode="drop")

    dtype_vals = valsf.dtype
    G = -(-n // TILE)
    SP = sum(_pc_tuple(P_MAX))
    NCELL = G * SP * 128 * 128
    routed = placed & live
    key_base = (ii // TILE) * SP

    # L1 is indexed [r2, a] (stage-1 reads A[r2, a] = Xc[r2, L1[r2, a]]);
    # unrouted writes go to a trap cell past the end; c2/r2 fit int8
    idx_tab = ((key_base + sp) * 128 + r2) * 128 + a
    L1 = jnp.full((NCELL + 1,), 0, jnp.int8).at[
        jnp.where(routed, idx_tab, NCELL)
    ].set(c2.astype(jnp.int8), mode="drop")[:-1]

    idx_pos = ((key_base + sp) * 128 + a) * 128 + m
    L2M = jnp.full((NCELL + 1,), -1, jnp.int8).at[
        jnp.where(routed, idx_pos, NCELL)
    ].set(r2.astype(jnp.int8), mode="drop")[:-1]
    VALS = jnp.zeros((NCELL + 1,), dtype_vals).at[
        jnp.where(routed, idx_pos, NCELL)
    ].set(valsf, mode="drop")[:-1]

    # remainder: unrouted live tasks compacted to the FRONT via a cumsum
    # position scatter of their TASK ID only (the r04 design scattered
    # the full (rows, cols, vals) triple: two extra 92M scatters)
    rem = live & ~placed
    pos = jnp.cumsum(rem.astype(jnp.int32)) - 1
    idx_c = jnp.where(rem, pos, NT)
    rtid = jnp.full((NT + 1,), NT, jnp.int32).at[idx_c].set(
        jnp.arange(NT, dtype=jnp.int32), mode="drop")[:-1]
    n_rem = jnp.sum(rem)
    # value-remap indices: a NEW operator sharing this sparsity (same
    # cols — e.g. a mass/reaction-augmented or re-coefficiented FEM
    # matrix) rebuilds VALS + the remainder with one scatter + one small
    # gather instead of a full reschedule (routing depends only on cols)
    vals_idx = jnp.where(routed, idx_pos, NCELL).astype(jnp.int32)
    return (L1.reshape(G, SP, 128, 128), L2M.reshape(G, SP, 128, 128),
            VALS.reshape(G, SP, 128, 128), rtid, n_rem, vals_idx)


def budgets_from_loads(loads, K: int):
    """Per-chunk pass budgets from mean per-(row, chunk) loads: 2x load
    + 4 slack, capped at K + 4 (a group never exceeds K tasks; the
    measured-good 10.25M config IS K + 4 = 13 at center load 6.8) and
    the 31-bit slot mask."""
    return tuple(min(31, K + 4, max(2, int(2.0 * float(v)) + 4))
                 for v in loads)


@functools.partial(jax.jit, static_argnums=(2,))
def _chunk_loads(cols, vals, n):
    """Mean live tasks per row per window chunk (three full reductions
    — one small program; used by the auto per-chunk budget picker)."""
    K = cols.shape[0]
    colsf = cols.reshape(-1)
    valsf = vals.reshape(-1)
    ii = jnp.tile(jnp.arange(n, dtype=jnp.int32), K)
    g = ii // TILE
    w = colsf - (g - 1) * TILE
    live = (valsf != 0.0) & (w >= 0) & (w < C_CHUNKS * TILE)
    c = jnp.clip(w, 0, C_CHUNKS * TILE - 1) // TILE
    return jnp.stack([
        jnp.sum((live & (c == cc)).astype(jnp.float32)) / n
        for cc in range(C_CHUNKS)
    ])


@functools.partial(jax.jit, static_argnums=(3, 4))
def _rem_slice(rtid, colsf, valsf, n, L):
    """Gather the compact COO remainder triple from the task ids —
    small-L gathers (ii[t] = t mod n by construction of the task
    layout); padding entries carry row 0 / val 0 (scatter-adds 0)."""
    NT = colsf.shape[0]
    t = jnp.minimum(rtid[:L], NT - 1)
    valid = rtid[:L] < NT
    rii = jnp.where(valid, t % n, 0).astype(jnp.int32)
    rcols = jnp.where(valid, colsf[t], 0).astype(jnp.int32)
    rvals = jnp.where(valid, valsf[t], 0.0)
    return rii, rcols, rvals


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _sched_fused(cols, vals, n, K, P_MAX, R1, R_REST):
    """Whole schedule build as ONE bounded program for small/mid task
    counts (NT <= ~40M): prep + R1 full-size rounds + a statically
    sized compacted tail + table scatters. On this harness EVERY
    program's first execution pays a 1-300 s compile/queue roulette —
    for the aux-grid P/P^T builds (K = 4 resp. ~10) one program per
    operator beats the three-program split that the 92M-task flagship
    build needs for watchdog safety (measured execution here is well
    under the ~60 s limit: rounds cost ~NT/5.4M s each).

    The compacted tail length is STATIC (NT/8 rounded to a power of
    two) instead of fetched: phase-1 placement below 87.5% degrades
    gracefully (excess tasks fall to the COO remainder), it does not
    corrupt."""
    out = _sched_phase1(cols, vals, n, K, P_MAX, R1)
    (ii, a, m, c, r2, c2, rank, stride, live, placed, sp, overflow,
     valsf, colsf, tab, slots, n_left) = out
    state11 = (ii, a, m, c, r2, c2, rank, stride, live, placed, sp)
    NT = K * n
    L = min(max(1 << 14, 1 << max(NT // 8 - 1, 1).bit_length()), NT)
    L1, L2M, VALS, rtid, n_rem, vals_idx = _sched_finish(
        state11, tab, slots, valsf, n, P_MAX, R_REST,
        jnp.int32(R1 + 1), L)
    return L1, L2M, VALS, rtid, n_rem, vals_idx, overflow


def schedule_lane_routed(E: ELLSoA, p_max: int, rounds: int = 16,
                         keep_remap: bool = False, fuse: bool | None = None):
    """Build LaneRoutedELL tables from an assembled ELLSoA: THREE
    bounded device programs (four when phase-1 placement is unusually
    poor) + two tiny host fetches; the remainder is compacted to a COO
    triple of host-chosen static length.

    p_max is an int (uniform per-chunk budget) or a 3-tuple of
    per-window-chunk budgets (round-5 packing: side chunks carry ~half
    the center's tasks, and table DMA is the kernel's cost — smaller
    side budgets cut it directly). Tasks whose within-(row, chunk) rank
    reaches the chunk budget are CAPACITY-FILTERED to the COO remainder
    before any round (safe for any budget >= 2); a uniform int p_max <=
    K is still rejected — it would silently push up to (K - p_max)/K of
    the matrix onto the slow XLA path."""
    K, n = E.vals.shape
    if isinstance(p_max, int) and p_max <= K:
        raise ValueError(
            f"p_max={p_max} must exceed the ELL width K={K}: ranks >= "
            "p_max are capacity-filtered to the XLA-path remainder — a "
            "uniform budget this small would shift an O(1) fraction of "
            "the matrix off the fast path (pass a per-chunk tuple to "
            "pack side chunks tighter deliberately)"
        )
    if any(p < 2 or p > 31 for p in _pc_tuple(p_max)):
        raise ValueError(
            f"per-chunk budgets must lie in [2, 31], got {p_max} "
            "(int32 slot-bitmask width)"
        )
    rounds = min(rounds, _MAX_ROUNDS)
    R1 = min(2, rounds)  # full-size rounds (~8-17 s each at 10.25M rows;
    # the ~60 s executor watchdog allows 2-3 per program)
    NT = K * n
    if fuse is None:
        fuse = NT <= 48_000_000  # watchdog headroom: fused execution
        # measured ~NT/1.5M s worst-case; the 92M flagship build stays
        # on the three-program split
    if fuse:
        L1, L2M, VALS, rtid, n_rem, vals_idx, over = _sched_fused(
            E.cols, E.vals, n, K, p_max, R1, rounds - R1)
        if bool(over):
            return None, None, None, None, True, -1, None
        valsf = E.vals.reshape(-1)
        colsf = E.cols.reshape(-1)
        nr = int(n_rem)
        Lr = max(128, 1 << (nr - 1).bit_length()) if nr else 128
        Lr = min(Lr, NT)
        rem = _rem_slice(rtid, colsf, valsf, n, Lr)
        remap = (vals_idx, rtid, Lr, nr) if keep_remap else None
        return L1, L2M, VALS, rem, False, nr, remap
    (ii, a, m, c, r2, c2, rank, stride, live, placed, sp, over, valsf,
     colsf, tab, slots, n_left) = _sched_phase1(
        E.cols, E.vals, n, K, p_max, R1)
    if bool(over):
        return None, None, None, None, True, -1, None
    NT = K * n
    state11 = (ii, a, m, c, r2, c2, rank, stride, live, placed, sp)
    t0 = R1 + 1  # phase-1 rounds ran t = 1..R1
    done = rounds - R1
    nl = int(n_left)
    if done > 4 and nl > NT // 8:
        # rare path (phase-1 placement < 87.5%): one intermediate
        # program so the fused finish stays inside the ~60 s watchdog
        L = min(max(1 << 14, 1 << max(nl - 1, 1).bit_length()), NT)
        placed, sp, tab, slots, n_left = _sched_phase2(
            state11, tab, slots, n, p_max, 4, jnp.int32(t0), L)
        state11 = state11[:9] + (placed, sp)
        t0 += 4
        done -= 4
        nl = int(n_left)
    R_REST = done if nl > 0 else 0
    L = min(max(1 << 14, 1 << max(nl - 1, 1).bit_length()), NT)
    L1, L2M, VALS, rtid, n_rem, vals_idx = _sched_finish(
        state11, tab, slots, valsf, n, p_max, R_REST, jnp.int32(t0), L)
    del tab, slots, c, rank, stride
    nr = int(n_rem)
    Lr = max(128, 1 << (nr - 1).bit_length()) if nr else 128
    Lr = min(Lr, NT)
    rem = _rem_slice(rtid, colsf, valsf, n, Lr)
    remap = (vals_idx, rtid, Lr, nr) if keep_remap else None
    return L1, L2M, VALS, rem, False, nr, remap


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _lane_gather(x, idx):
    """out[i, j] = x[i, idx[i, j]] with INT32 indices — the exact
    lax.gather form Mosaic lowers to tpu.dynamic_gather along lanes.
    (jnp.take_along_axis promotes indices to int64 under x64, which the
    TPU kernel lowering rejects.)"""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        x, idx[..., None].astype(jnp.int32), dnums, (1, 1),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _spmv_kernel(xm1_ref, x0_ref, xp1_ref, l1_ref, l2_ref, v_ref, o_ref,
                 *, SP, P_MAX):
    PC = _pc_tuple(P_MAX)
    OFF = (0, PC[0], PC[0] + PC[1])
    chunks = (xm1_ref[0], x0_ref[0], xp1_ref[0])
    acc = jnp.zeros((128, 128), o_ref.dtype)
    for c in range(C_CHUNKS):
        Xc = chunks[c]
        for p in range(PC[c]):
            sp = OFF[c] + p
            L1 = l1_ref[0, sp].astype(jnp.int32)
            A = _lane_gather(Xc, L1)  # A[r2, a]
            T = A.T  # T[a, r2]
            # invalid positions carry L2 = -1 AND VALS = 0: clamping the
            # index and multiplying suffices — no select needed (and
            # jnp.where's dtype promotion recurses inside pallas traces)
            L2 = jnp.maximum(l2_ref[0, sp].astype(jnp.int32), 0)
            B2 = _lane_gather(T, L2)
            # bf16-stored values upcast per pass: accumulation and the x
            # tiles stay f32 (bf16 storage halves the dominant HBM
            # stream — the tables — without bf16 accumulation error)
            acc = acc + v_ref[0, sp].astype(acc.dtype) * B2
    o_ref[0] = acc.T  # undo the interleaved (a, m) position map


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _spmv(x, L1, L2M, VALS, n, SP, P_MAX):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = L1.shape[0]
    dtype = VALS.dtype
    if dtype == jnp.bfloat16:
        dtype = jnp.float32  # accumulator / x-tile / output dtype
    # padded x tiles: x2[t] = x[(t-1)*TILE : t*TILE]. x may be a
    # RECTANGULAR operator's source vector (len(x) != n rows — e.g. the
    # aux-grid interpolation P: mesh rows x grid columns); the window
    # alignment is still row-tile-based, so near-square banded
    # rectangles (|col - row| + |len(x) - n| < TILE) route exactly.
    x2 = jnp.pad(x.astype(dtype),
                 (TILE, (G + 1) * TILE - x.shape[0])).reshape(
        G + 2, 128, 128)

    kern = functools.partial(_spmv_kernel, SP=SP, P_MAX=P_MAX)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            # z = g*0: an i32 zero derived from the grid index — literal
            # 0s trace as int64 under x64 and the server Mosaic rejects
            # mixed (i32, i64, i64) index-map returns
            pl.BlockSpec((1, 128, 128), lambda g: (g, g * 0, g * 0)),
            pl.BlockSpec((1, 128, 128), lambda g: (g + 1, g * 0, g * 0)),
            pl.BlockSpec((1, 128, 128), lambda g: (g + 2, g * 0, g * 0)),
            pl.BlockSpec((1, SP, 128, 128),
                         lambda g: (g, g * 0, g * 0, g * 0)),
            pl.BlockSpec((1, SP, 128, 128),
                         lambda g: (g, g * 0, g * 0, g * 0)),
            pl.BlockSpec((1, SP, 128, 128),
                         lambda g: (g, g * 0, g * 0, g * 0)),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda g: (g, g * 0, g * 0)),
        out_shape=jax.ShapeDtypeStruct((G, 128, 128), dtype),
        interpret=interpret,
    )(x2, x2, x2, L1, L2M, VALS)
    return out.reshape(-1)[:n]


@jax.tree_util.register_pytree_node_class
class LaneRoutedELL:
    """Operator protocol (@ / diagonal / astype / shape) over the
    lane-routed tables + a compact COO remainder (rows, cols, vals)
    served by the XLA gather/scatter path. Build via `from_ell`."""

    def __init__(self, L1, L2M, VALS, rem, diag, n: int, p_max: int,
                 n_src: int | None = None):
        self.L1 = L1
        self.L2M = L2M
        self.VALS = VALS
        self.rem = rem  # (rows, cols, vals) compact COO triple
        self._diag = diag
        self.n = n
        self.p_max = p_max
        # source-vector length: n for square operators; rectangular
        # near-square banded operators (aux-grid P/P^T) differ by O(m)
        self.n_src = n if n_src is None else n_src

    def tree_flatten(self):
        return (self.L1, self.L2M, self.VALS, self.rem, self._diag), (
            self.n, self.p_max, self.n_src)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def shape(self):
        return (self.n, self.n_src)

    @classmethod
    def from_ell(cls, E: ELLSoA, p_max: int | None = None,
                 rounds: int = 16, bandwidth: int | None = None,
                 keep_remap: bool = False, fuse: bool | None = None):
        """One-time schedule build (device). Raises on bandwidth > TILE
        after RCM (the static 3-tile window cannot reach wider columns)
        and on p_max outside (K, 31]. Tasks the scheduler cannot route
        within `rounds` rounds do NOT raise: they fall to a compact COO
        remainder served by the (slow) XLA gather path inside
        `__matmul__` — `n_remainder` reports how many.

        Capacity model (interleaved position map): tile row a draws its
        128 tasks from rows spread across the supertile, so their K*128
        targets spread over the whole (TILE + 2B)-value window —
        ~K*TILE/(TILE + 2B) tasks contend per stage-1 cell; the per-row
        rank bound (K tasks per (row, chunk)) dominates for wide bands."""
        if p_max is None:
            # PER-CHUNK budgets (round 5): pm_c = 2 * mean-tasks-per-
            # (row, chunk) + 4 slack. Slack +4 measured at 10.25M dofs /
            # K=9 / B=7970: global 11 -> 13 cut the unrouted remainder
            # 0.286% -> 0.0117% and the FULL SpMV 16.2 -> 8.7 ms (the
            # XLA-path remainder dominated; extra table sub-passes cost
            # only 1.2 ms) — benchmarks/micro_lane_spmv.py. Side chunks
            # carry far fewer tasks than the center, and table DMA is
            # the kernel's cost: pack them tighter.
            K = E.vals.shape[0]
            if bandwidth is not None:
                # analytic loads for cols ~ uniform in [row-B, row+B]
                # (no extra device program): P(center) = 1 - B/2T,
                # P(each side) = B/4T
                B = min(max(int(bandwidth), 1), TILE)
                side = K * B / (4.0 * TILE)
                loads = (side, K * (1.0 - B / (2.0 * TILE)), side)
            else:
                loads = _chunk_loads(E.cols, E.vals, E.shape[0])
            p_max = budgets_from_loads(loads, K)
        if max(_pc_tuple(p_max)) > 31:
            raise ValueError(
                f"p_max={p_max} exceeds the int32 slot-bitmask width "
                "(rows with > 30 entries: stay on the plain ELL path)"
            )
        n_rows, n_src = E.shape
        G = -(-n_rows // TILE)
        if n_src > (G + 1) * TILE:
            raise ValueError(
                f"rectangular operator source length {n_src} exceeds the "
                f"row-aligned window coverage {(G + 1) * TILE} — only "
                "near-square banded rectangles route"
            )
        L1, L2M, VALS, rem, over, n_rem, remap = schedule_lane_routed(
            E, p_max, rounds, keep_remap=keep_remap, fuse=fuse)
        if bool(over):
            raise ValueError(
                "lane-routed schedule overflow: bandwidth > 16384 after "
                "RCM — re-tile with a larger static halo or fall back to "
                "the plain ELL path"
            )
        diag = (E.diagonal() if n_src == n_rows
                else jnp.zeros((n_rows,), E.vals.dtype))
        op = cls(L1, L2M, VALS, rem, diag, n_rows, p_max, n_src=n_src)
        op.n_remainder = int(n_rem)
        op._remap = remap  # set iff keep_remap: enables with_vals
        return op

    def __matmul__(self, v):
        SP = sum(_pc_tuple(self.p_max))
        y = _spmv(v, self.L1, self.L2M, self.VALS, self.n, SP, self.p_max)
        rrows, rcols, rvals = self.rem
        return y.at[rrows].add(
            (rvals * v[rcols]).astype(y.dtype), mode="drop")

    def with_vals(self, E: ELLSoA):
        """New operator with THIS schedule and E's values — E must share
        the exact cols/shape this schedule was built from (same FEM
        sparsity: reaction/mass-augmented, re-coefficiented, or
        time-stepping system matrices). Requires from_ell(...,
        keep_remap=True); two scatters instead of a reschedule."""
        if getattr(self, "_remap", None) is None:
            raise ValueError(
                "schedule remap not retained: build the base operator "
                "with from_ell(..., keep_remap=True)"
            )
        vals_idx, rtid, L, nr = self._remap
        G, SP = self.VALS.shape[0], self.VALS.shape[1]
        n = self.n

        @jax.jit
        def rebuild(E, vals_idx, rtid):
            valsf = E.vals.reshape(-1)
            NT = valsf.shape[0]
            NCELL = G * SP * 128 * 128
            VALS = jnp.zeros((NCELL + 1,), valsf.dtype).at[vals_idx].set(
                valsf, mode="drop")[:-1].reshape(G, SP, 128, 128)
            t = jnp.minimum(rtid[:L], NT - 1)
            rvals = jnp.where(rtid[:L] < NT, valsf[t], 0.0)
            return VALS, rvals, E.diagonal()

        VALS, rvals, diag = rebuild(E, vals_idx, rtid)
        op = LaneRoutedELL(self.L1, self.L2M, VALS,
                           (self.rem[0], self.rem[1], rvals), diag, n,
                           self.p_max, n_src=self.n_src)
        op.n_remainder = self.n_remainder
        op._remap = self._remap
        return op

    def diagonal(self):
        return self._diag

    def astype(self, dtype):
        rrows, rcols, rvals = self.rem
        return LaneRoutedELL(self.L1, self.L2M, self.VALS.astype(dtype),
                             (rrows, rcols, rvals.astype(dtype)),
                             self._diag.astype(dtype), self.n, self.p_max,
                             n_src=self.n_src)
