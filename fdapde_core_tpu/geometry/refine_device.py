"""On-device uniform mesh refinement + bandwidth-bounded renumbering.

The harness relay moves ~100 MB in minutes, so a device-scale imported
mesh cannot be SHIPPED — but it can be GROWN: upload a small genuinely
unstructured base mesh (host Delaunay, ~1-3 MB) and refine it on device.
Uniform (red) refinement splits every triangle into four via edge
midpoints: vertex degrees of the BASE nodes are preserved verbatim and
every new interior node has degree 6, so the refined mesh keeps the
base's ragged degree histogram — the variable-degree topology class the
reference's assembler serves (fem_assembler.h:79-110 is topology-blind)
and a permuted-lattice control cannot represent.

All steps are jittable with STATIC shapes: for a simply-connected
planar triangulation Euler gives n_edges = n_nodes + n_cells - 1, so
every level's sizes are known at trace time; a runtime witness checks
the count. Edge identification is one multi-key `lax.sort` over the 3C
(min, max) vertex pairs + a cumsum of group starts (int32 throughout —
no x64 dependency).

`strip_order` renumbers nodes by equal-population y-rank strips, sorted
by x within each strip: a device-computed RCM-class ordering whose
bandwidth is O(nodes-per-strip) — pick ~6k/strip to stay inside the
lane kernel's 16384 static halo (ops/pallas_gather_spmv.py) without
shipping a host-computed permutation through the relay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["device_edges", "refine_once", "uniform_refine_device",
           "strip_order", "strip_order_binned"]


@functools.partial(jax.jit, static_argnums=(3, 4))
def device_edges(c0, c1, c2, n_nodes: int, n_edges: int):
    """First-occurrence-in-sorted-order edge numbering on device.

    Returns (e01, e02, e12, edge_boundary, n_edges_actual): per-cell
    edge ids for the three lexicographic sub-simplices (combinations
    order — the P2/refinement slot convention), a boolean per edge id
    marking boundary edges (incident to exactly one cell), and the
    actual distinct-pair count as a runtime witness for the static
    `n_edges` (= n_nodes + n_cells - 1 on simply-connected meshes).
    """
    C = c0.shape[0]
    pa = jnp.concatenate([jnp.minimum(c0, c1), jnp.minimum(c0, c2),
                          jnp.minimum(c1, c2)])
    pb = jnp.concatenate([jnp.maximum(c0, c1), jnp.maximum(c0, c2),
                          jnp.maximum(c1, c2)])
    pos = jnp.arange(3 * C, dtype=jnp.int32)
    smin, smax, spos = jax.lax.sort((pa, pb, pos), num_keys=2)
    newg = jnp.concatenate([
        jnp.ones((1,), bool),
        (smin[1:] != smin[:-1]) | (smax[1:] != smax[:-1]),
    ])
    gid_sorted = jnp.cumsum(newg.astype(jnp.int32)) - 1
    n_actual = gid_sorted[-1] + 1
    eid = jnp.zeros((3 * C,), jnp.int32).at[spos].set(
        jnp.minimum(gid_sorted, n_edges - 1))
    last = jnp.concatenate([newg[1:], jnp.ones((1,), bool)])
    count1 = newg & last  # singleton group = boundary edge
    edge_bnd = jnp.zeros((n_edges,), bool).at[
        jnp.minimum(gid_sorted, n_edges - 1)].set(count1)
    return eid[:C], eid[C:2 * C], eid[2 * C:], edge_bnd, n_actual


@jax.jit
def _refine_tables(x, y, c0, c1, c2, bnd, e01, e02, e12, edge_bnd):
    n = x.shape[0]
    m01 = n + e01
    m02 = n + e02
    m12 = n + e12
    n_edges = edge_bnd.shape[0]
    xm = jnp.zeros((n_edges,), x.dtype)
    ym = jnp.zeros((n_edges,), y.dtype)
    for (ea, ca, cb) in ((e01, c0, c1), (e02, c0, c2), (e12, c1, c2)):
        xm = xm.at[ea].set(0.5 * (x[ca] + x[cb]))
        ym = ym.at[ea].set(0.5 * (y[ca] + y[cb]))
    x2 = jnp.concatenate([x, xm])
    y2 = jnp.concatenate([y, ym])
    bnd2 = jnp.concatenate([bnd, edge_bnd])
    # four orientation-preserving children per parent
    c0_2 = jnp.concatenate([c0, m01, m02, m01])
    c1_2 = jnp.concatenate([m01, c1, m12, m12])
    c2_2 = jnp.concatenate([m02, m12, c2, m02])
    return x2, y2, c0_2, c1_2, c2_2, bnd2


def refine_once(x, y, c0, c1, c2, bnd):
    """One red-refinement level. Host-driven pair of jitted programs
    (sizes are level-static). Returns (x, y, c0, c1, c2, bnd, witness)
    — `witness` is the device edge-count scalar; callers at scale fetch
    it once per pipeline, not per level."""
    n, C = x.shape[0], c0.shape[0]
    n_edges = n + C - 1  # Euler: simply-connected planar triangulation
    e01, e02, e12, edge_bnd, n_act = device_edges(c0, c1, c2, n, n_edges)
    out = _refine_tables(x, y, c0, c1, c2, bnd, e01, e02, e12, edge_bnd)
    return (*out, n_act)


@functools.partial(jax.jit, static_argnums=(6,))
def _refine_fused(x, y, c0, c1, c2, bnd, levels: int):
    """All levels in ONE program: each distinct program's first
    execution pays the remote-harness compile roulette, so the
    per-level jits (6 programs for 3 levels) are inlined here."""
    wits = []
    for _ in range(levels):
        n, C = x.shape[0], c0.shape[0]
        n_edges = n + C - 1
        e01, e02, e12, edge_bnd, n_act = device_edges(
            c0, c1, c2, n, n_edges)
        x, y, c0, c1, c2, bnd = _refine_tables(
            x, y, c0, c1, c2, bnd, e01, e02, e12, edge_bnd)
        wits.append(n_act - n_edges)  # 0 iff Euler count holds
    return x, y, c0, c1, c2, bnd, jnp.stack(wits)


def uniform_refine_device(x, y, c0, c1, c2, bnd, levels: int):
    """`levels` red refinements on device (one fused program); asserts
    the Euler edge-count witness for every level."""
    x, y, c0, c1, c2, bnd, wits = _refine_fused(
        x, y, c0, c1, c2, bnd, levels)
    if int(jnp.max(jnp.abs(wits))) != 0:
        raise ValueError(
            "mesh is not simply connected: device edge counts deviate "
            f"from Euler's V+C-1 by {[int(w) for w in wits]} per level"
        )
    return x, y, c0, c1, c2, bnd


@functools.partial(jax.jit, static_argnums=(2,))
def strip_order(x, y, pop: int):
    """Equal-population strip renumbering: nodes sorted by (y-rank strip
    of size `pop`, x). Returns (order, rank): new id j holds old node
    order[j]; old node i becomes rank[i]. Resulting FEM-operator
    bandwidth is ~2.5 * pop for shape-regular planar meshes (neighbors
    live in the same or adjacent strips)."""
    n = x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, yi = jax.lax.sort((y, iota), num_keys=1)
    ranky = jnp.zeros((n,), jnp.int32).at[yi].set(iota)
    strip = ranky // pop
    _, _, order = jax.lax.sort((strip, x, iota), num_keys=2)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(iota)
    return order, rank


@functools.partial(jax.jit, static_argnums=(2,))
def strip_order_binned(x, y, pop: int):
    """Uniform-bin strip renumbering: ONE single-key sort instead of
    `strip_order`'s y-rank sort + 2-key sort (measured ~100 s at 5.13M
    nodes on the TPU harness — sorts dominate the renumbering stage).

    Strips are uniform y-intervals of expected population `pop` (exact
    equal population only for uniform node densities — the device-grown
    refined meshes); the composite key strip + x_normalized in [0, 1)
    orders by (strip, x) in one pass. Callers that need a bandwidth
    GUARANTEE on non-uniform densities use `strip_order`; either way
    the achieved operator bandwidth is measured downstream before any
    windowed kernel is built."""
    n = x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    S = max(1, n // pop)
    ylo, yhi = jnp.min(y), jnp.max(y)
    xlo, xhi = jnp.min(x), jnp.max(x)
    yn = (y - ylo) / jnp.maximum(yhi - ylo, 1e-300)
    strip = jnp.clip((yn * S).astype(jnp.int32), 0, S - 1)
    xn = jnp.clip((x - xlo) / jnp.maximum(xhi - xlo, 1e-300), 0.0,
                  1.0 - 1e-12)
    # int32 composite key (x quantized to 14 bits — ties within a
    # 1/16384 x-slice order arbitrarily, irrelevant to bandwidth);
    # requires S < 2^17, i.e. pop >= n / 131072
    key = strip * 16384 + (xn * 16384.0).astype(jnp.int32)
    _, order = jax.lax.sort((key, iota), num_keys=1)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(iota)
    return order, rank
