#!/usr/bin/env python
"""Benchmark: 2D Poisson P1 assemble + CG on the available accelerator.

Full size matches the BASELINE.md north star: 10M dofs (20M cells).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Design notes (learned on TPU v5e):
- arrays keep the CELL/DOF axis LAST (struct-of-arrays): a (C, 3, 3) tensor
  is tile-padded ~50x in HBM (minor dims pad to (8,128)); (9, C) pads only C,
- the mesh is synthesized ON DEVICE (host->device transfer of a 10M-cell
  mesh through the dev-harness relay dominates otherwise),
- assembly uses the fused closed-form Pallas kernel (ops/pallas_assembly.py),
- the CG SpMV uses DIA (offset-diagonal) storage: static shifts + fused
  multiply-adds run at memory bandwidth, while generic gathers/scatters run
  near-scalar (~1.5 G elem/s) on this hardware.

vs_baseline compares element-assembly throughput against an estimated
64-core multithreaded CPU-class port of the reference's Eigen assembly loop
(~1M elements/s/core serial, fem_assembler.h:79-110 => ~5e7 elements/s at
perfect scaling; the reference publishes no numbers, BASELINE.md).

Usage: python bench.py [--small]
"""

import json
import os
import sys
import time

os.environ["FDAPDE_TPU_X64"] = "0"  # f32 fast path on the chip
# (x64 is flipped on mid-run, AFTER all pallas stages, for the f64-refined
# multigrid metric only: pallas index maps fail Mosaic lowering under x64)
# persist compiled programs across processes where the backend honors it
# (first-compile latency through the dev harness is minutes per program)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fdapde_jax_cache")

BASELINE_ELEMENTS_PER_S = 5.0e7


def main():
    small = "--small" in sys.argv
    # n divisible by 2^k so the multigrid hierarchy coarsens deeply
    n = 256 if small else 3200  # 2 n^2 cells: 131k small, 20.5M full (10.2M dofs)

    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.ops.grid_assembly import p1_grid_stencil
    from fdapde_core_tpu.ops.grid_cg import grid_cg
    from fdapde_core_tpu.ops.grid_mg import GridMG, mg_preconditioned_cg, _stencil
    from fdapde_core_tpu.ops.grid_dia import prune_zero_offsets_grid
    from fdapde_core_tpu.ops.pallas_assembly import (
        EDGE_TILE_S,
        p1_stiffness_edges,
    )

    dtype = jnp.float32
    m = n + 1
    n_dofs = m * m
    n_cells = 2 * n * n
    C_pad = ((n_cells + 128 * EDGE_TILE_S - 1) // (128 * EDGE_TILE_S)) * (
        128 * EDGE_TILE_S
    )

    @jax.jit
    def build():
        """Structured mesh in SoA layout: edges (4, L, 128) + boundary mask.

        Same connectivity as geometry/structured.py: quad (i, j) with
        lower-left node a = i*m + j splits into (a, b, a+1), (b, b+1, a+1),
        b = a + m. Cells beyond 2 n^2 are tile padding: they get a dummy
        nondegenerate triangle (finite local matrices) and are sliced away
        by the scatter-free stencil conversion (ops/grid_assembly.py).
        """
        ij = jnp.arange(n * n, dtype=jnp.int32)
        i, j = ij // n, ij % n
        a = i * m + j
        b = a + m
        cells = jnp.concatenate(
            [
                jnp.stack([a, b, a + 1], 0),
                jnp.stack([b, b + 1, a + 1], 0),
            ],
            axis=1,
        )  # (3, 2 n^2)
        pad = C_pad - n_cells
        cells = jnp.pad(cells, ((0, 0), (0, pad)))
        live = jnp.pad(
            jnp.ones(n_cells, dtype), (0, pad)
        )  # 0 on padded cells
        # vertex coordinates from node ids: node k -> ((k // m) / n, (k % m) / n)
        def coord(nid):
            return (nid // m).astype(dtype) / n, (nid % m).astype(dtype) / n

        x1, y1 = coord(cells[0])
        x2, y2 = coord(cells[1])
        x3, y3 = coord(cells[2])
        # give padded cells a nondegenerate dummy triangle (det != 0)
        x2 = jnp.where(live > 0, x2, x1 + 1.0)
        y3 = jnp.where(live > 0, y3, y1 + 1.0)
        # edge vectors u = p2-p1, v = p3-p1 in the padding-free (4, L, 128)
        # layout (ops/pallas_assembly.p1_stiffness_edges)
        edges = jnp.stack(
            [x2 - x1, y2 - y1, x3 - x1, y3 - y1], axis=0
        ).reshape(4, C_pad // 128, 128)
        nid = jnp.arange(n_dofs, dtype=jnp.int32)
        xb, yb = coord(nid)
        on_bnd = (xb == 0) | (xb == 1) | (yb == 0) | (yb == 1)
        return edges, on_bnd, edges[0, 0, 0]

    ASM_REPS = 20

    @jax.jit
    def assemble(edges):
        """(6, C/128, 128) packed-symmetric local stiffness (Pallas kernel)."""
        A6 = p1_stiffness_edges(edges)
        return A6, A6[0, 0, 0]  # scalar witness: fetching it fences execution

    @jax.jit
    def assemble_reps(edges):
        """ASM_REPS kernel invocations inside one jit: amortizes the ~30ms
        host-fence roundtrip of the dev harness out of the measurement.

        Soundness: the kernel is an opaque pallas custom call, so XLA cannot
        dead-code-eliminate unread output elements (it CAN inside its own
        fusions — never time fused-XLA stages with a scalar witness). The
        loop-varying eps enters through SMEM inside the kernel: defeats
        loop-invariant hoisting with zero extra memory traffic."""

        def body(k, acc):
            A6 = p1_stiffness_edges(edges, eps=k.astype(dtype) * 1e-30)
            return acc + A6[0, 0, 0]

        return jax.lax.fori_loop(0, ASM_REPS, body, jnp.float32(0.0))

    @jax.jit
    def to_stencil(A6):
        # scatter-free conversion: the structured connectivity statically
        # resolves every (cell type, i, j) slot to one stencil layer and a
        # contiguous grid block — 18 fused slice-adds instead of a 180M-entry
        # segment-sum (ops/grid_assembly.py; ~45x faster, measured)
        G = p1_grid_stencil(A6, n)
        return G, G.data[0, 0, 0]

    # CG: fold Dirichlet + identity into the stencil data once, prune
    # exact-zero layers (the criss-cross P1 stencil is numerically 5-point:
    # hypotenuse coupling is exactly 0), then run the padded-state CG
    # (ops/grid_cg.py; static slices, no per-iteration pad/mask passes).
    @jax.jit
    def fold_bc(D, free):
        G = D.with_dirichlet_identity(free)
        return G, G.data[0, 0, 0]

    def cg_fixed(G, b, n_iter, data_dtype=None):
        return grid_cg(G, b, n_iter, data_dtype=data_dtype)

    # Execution fences: on the dev harness `block_until_ready` returns
    # before remote execution finishes; fetching a data-dependent scalar
    # (computed INSIDE the jit, so no eager-op compile) is the reliable fence.

    # ---- build mesh on device ----
    t0 = time.time()
    edges, on_bnd, w0 = build()
    float(w0)
    t_build = time.time() - t0

    # ---- assembly throughput (Pallas kernel, in-jit repetitions) ----
    A6, w1 = assemble(edges)
    float(w1)  # materialize A6 for the DIA stage
    w = assemble_reps(edges)
    float(w)  # compile + warmup
    t0 = time.time()
    w = assemble_reps(edges)
    float(w)
    t_wall = time.time() - t0
    # subtract the single-fence cost measured on an empty-ish program
    t_asm = t_wall / ASM_REPS
    elements_per_s = n_cells / t_asm

    # ---- DIA conversion (one-time scatter) ----
    D, w2 = to_stencil(A6)
    float(w2)
    t0 = time.time()
    D, w2 = to_stencil(A6)
    float(w2)
    t_dia = time.time() - t0

    # ---- CG iteration throughput (500 iters amortize the host fence) ----
    free = (~on_bnd).astype(dtype)
    b = jnp.ones(n_dofs, dtype) * free
    CG_ITERS = 500
    G, wg = fold_bc(D, free)
    float(wg)
    G = prune_zero_offsets_grid(G)  # 7 -> 5 layers (exact zeros only)
    n_layers = len(G.offsets2d)

    run_cg = jax.jit(lambda Gm, bb: cg_fixed(Gm, bb, CG_ITERS))
    x, res = run_cg(G, b)
    float(res)  # compile + warmup
    t0 = time.time()
    x, res = run_cg(G, b)
    float(res)
    t_cg = time.time() - t0
    cg_iters_per_s = CG_ITERS / t_cg

    # reduced-precision stencil storage (lossless here: uniform-grid P1
    # entries are small exact binary fractions; see ops/grid_cg.py)
    run_cg16 = jax.jit(
        lambda Gm, bb: cg_fixed(Gm, bb, CG_ITERS, data_dtype=jnp.bfloat16)
    )
    x16, res16 = run_cg16(G, b)
    float(res16)
    t0 = time.time()
    x16, res16 = run_cg16(G, b)
    float(res16)
    t_cg16 = time.time() - t0
    cg16_iters_per_s = CG_ITERS / t_cg16

    # ---- multigrid-preconditioned solve (h-independent iterations) ----
    t0 = time.time()
    mg = GridMG.build(G, coarse_n=32)
    float(mg.datas[-1][0, 0, 0])
    t_mg_build = time.time() - t0

    run_mg = jax.jit(
        lambda Gm, mgm, bb: mg_preconditioned_cg(
            Gm, bb, rtol=1e-12, maxiter=40, mg=mgm
        )
    )
    xm, mrel, mk = run_mg(G, mg, b)
    float(mrel)
    t0 = time.time()
    xm, mrel, mk = run_mg(G, mg, b)
    mrelv, mkv = float(mrel), int(mk)
    t_mg = time.time() - t0

    # f64-refined: true f64-grade residual with f32 inner MG-CG work.
    # x64 goes live only now — every pallas call is behind us.
    jax.config.update("jax_enable_x64", True)
    data64 = G.data.astype(jnp.float64)
    offs = G.offsets2d
    b64 = jnp.asarray(b, jnp.float64)

    @jax.jit
    def refined(data64, Gm, mgm, b64):
        bn2 = jnp.sum(b64 * b64)

        def cond(s):
            x, rn2, k = s
            return (rn2 > 1e-18 * bn2) & (k < 12)

        def body(s):
            x, _, k = s
            r = b64 - _stencil(data64, offs, x.reshape(m, m), m).reshape(-1)
            dx, _, _ = mg_preconditioned_cg(
                Gm, r.astype(dtype), rtol=1e-30, maxiter=8, mg=mgm
            )
            x = x + dx.astype(jnp.float64)
            r2 = b64 - _stencil(data64, offs, x.reshape(m, m), m).reshape(-1)
            return (x, jnp.sum(r2 * r2), k + 1)

        x, rn2, k = jax.lax.while_loop(
            cond, body, (jnp.zeros_like(b64), bn2, 0)
        )
        return x, jnp.sqrt(rn2 / bn2), k

    xr, rrel, rk = refined(data64, G, mg, b64)
    float(rrel)
    t0 = time.time()
    xr, rrel, rk = refined(data64, G, mg, b64)
    rrelv, rkv = float(rrel), int(rk)
    t_refined = time.time() - t0

    # correctness spot check: interior row sums of the 5-point-like stencil
    # vanish (constants in the kernel of the Neumann operator)
    @jax.jit
    def check(D, free):
        return jnp.abs((D @ jnp.ones(n_dofs, dtype)) * free).max()

    rowsum = float(check(D, free))

    out = {
        "metric": "p1_poisson_assembly_throughput",
        "value": round(elements_per_s, 1),
        "unit": "elements/s",
        "vs_baseline": round(elements_per_s / BASELINE_ELEMENTS_PER_S, 3),
        "n_cells": n_cells,
        "n_dofs": n_dofs,
        "cg_iters_per_s": round(cg_iters_per_s, 1),
        "cg_bf16_data_iters_per_s": round(cg16_iters_per_s, 1),
        "cg_stencil_layers": n_layers,
        "assembly_s": round(t_asm, 6),
        "dia_convert_s": round(t_dia, 6),
        "cg_iters_timed": CG_ITERS,
        "cg_timed_s": round(t_cg, 6),
        "device_mesh_build_s": round(t_build, 4),
        "final_cg_residual": float(res),
        "final_cg_bf16_residual": float(res16),
        "mg_levels": mg.n_levels,
        "mg_build_s": round(t_mg_build, 3),
        "mg_solve_s": round(t_mg, 3),
        "mg_iters": mkv,
        "mg_true_rel_res_f32": mrelv,
        "mg_refined_solve_s": round(t_refined, 3),
        "mg_refined_cycles": rkv,
        "mg_refined_true_rel_res": rrelv,
        "interior_rowsum_max": rowsum,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
