#!/usr/bin/env python
"""Benchmark: 2D Poisson P1 assemble + CG on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The headline metric is element-assembly throughput on a ~10M-cell (5M-dof)
2D Poisson problem (BASELINE.md north star), with CG iteration throughput as
an extra field. The structured benchmark mesh is generated ON DEVICE
(jnp iota arithmetic) — host->device transfer of a 10M-cell mesh through the
dev-harness relay dominates otherwise, and device-side mesh synthesis is the
production pattern for generated geometries anyway.

vs_baseline compares against an estimated 64-core multithreaded CPU-class
baseline of the reference's Eigen assembly loop: the reference assembles
serially at ~1M elements/s/core on modern x86 (O(n_cells * nb^2 * nq) scalar
inner loops, fem_assembler.h:79-110); a perfectly scaled 64-core port would
reach ~5e7 elements/s. The reference itself publishes no numbers
(BASELINE.md: "None exist").

Usage: python bench.py [--small]
"""

import json
import os
import sys
import time

os.environ["FDAPDE_TPU_X64"] = "0"  # f32 fast path on the chip

import numpy as np

BASELINE_ELEMENTS_PER_S = 5.0e7  # estimated 64-core CPU-class (see docstring)


def device_unit_square(n: int, dtype):
    """Structured triangulated [0,1]^2 built with on-device ops.

    Same connectivity as geometry/structured.py:unit_square_mesh: node
    (i, j) -> id i*(n+1)+j; each quad splits into (a, b, a+1), (b, b+1, a+1)
    with b = a + (n+1).
    """
    import jax.numpy as jnp

    m = n + 1
    idx = jnp.arange(m, dtype=jnp.float32)
    X = jnp.repeat(idx / n, m)
    Y = jnp.tile(idx / n, m)
    nodes = jnp.stack([X, Y], axis=1).astype(dtype)  # (m*m, 2)
    ij = jnp.arange(n * n, dtype=jnp.int32)
    i, j = ij // n, ij % n
    a = i * m + j
    b = a + m
    lower = jnp.stack([a, b, a + 1], axis=1)
    upper = jnp.stack([b, b + 1, a + 1], axis=1)
    cells = jnp.concatenate([lower, upper], axis=0)  # (2 n^2, 3)
    on_bnd = (X == 0) | (X == 1) | (Y == 0) | (Y == 1)
    return nodes, cells, on_bnd


def main():
    small = "--small" in sys.argv
    n = 256 if small else 2236  # 2 n^2 cells: 131k small, 10.0M full

    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.fem.basis import tabulate_basis
    from fdapde_core_tpu.geometry.affine import affine_maps

    dtype = jnp.float32
    quad, phi_tab, grad_tab = tabulate_basis(2, 1)
    phi = jnp.asarray(phi_tab, dtype)
    grad = jnp.asarray(grad_tab, dtype)
    w = jnp.asarray(quad.weights, dtype)
    n_dofs = (n + 1) * (n + 1)
    n_cells = 2 * n * n

    @jax.jit
    def build():
        return device_unit_square(n, dtype)

    @jax.jit
    def assemble(nodes, cells):
        """(C, 3, 3) local stiffness blocks of -laplacian."""
        J, invJ, measure = affine_maps(nodes, cells)
        pg = jnp.einsum("cmn,qim->cqin", invJ, grad)
        return jnp.einsum("cqin,cqjn,q->cij", pg, pg, w) * measure[:, None, None]

    @jax.jit
    def cg_fixed(A_loc, cells, free, b, n_iter=100):
        """Jacobi-CG, fixed iteration count (throughput measurement)."""
        seg = cells.reshape(-1)

        def Ax(x):
            xe = (x * free)[cells]
            ye = jnp.einsum("cij,cj->ci", A_loc, xe)
            y = jax.ops.segment_sum(ye.reshape(-1), seg, n_dofs)
            return y * free + x * (1 - free)

        diag = jax.ops.segment_sum(
            jnp.einsum("cii->ci", A_loc).reshape(-1), seg, n_dofs
        )
        inv_diag = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 1.0)

        r0 = b - 0.0
        z0 = inv_diag * r0

        def body(k, state):
            x, r, z, p, rz = state
            Ap = Ax(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv_diag * r
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        x, r, *_ = jax.lax.fori_loop(
            0, n_iter, body, (jnp.zeros_like(b), r0, z0, z0, jnp.vdot(r0, z0))
        )
        return x, jnp.linalg.norm(r)

    # ---- build mesh on device ----
    t0 = time.time()
    nodes, cells, on_bnd = build()
    nodes.block_until_ready()
    t_build = time.time() - t0

    # ---- assembly throughput ----
    A = assemble(nodes, cells)
    A.block_until_ready()  # compile + warmup
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        A = assemble(nodes, cells)
    A.block_until_ready()
    t_asm = (time.time() - t0) / reps
    elements_per_s = n_cells / t_asm

    # ---- convert to DIA (offset-diagonal) storage: one-time scatter ----
    # structured-grid stiffness touches exactly these (col - row) offsets
    m_nodes = n + 1
    OFFSETS = (-m_nodes, -(m_nodes - 1), -1, 0, 1, m_nodes - 1, m_nodes)
    from fdapde_core_tpu.linear_algebra.dia import dia_from_coo

    @jax.jit
    def to_dia(A_loc, cells):
        nb = 3
        rows = jnp.repeat(cells, nb, axis=1).reshape(-1)
        colsx = jnp.tile(cells, (1, nb)).reshape(-1)
        return dia_from_coo(rows, colsx, A_loc.reshape(-1), n_dofs, OFFSETS)

    D = to_dia(A, cells)
    D.data.block_until_ready()
    t0 = time.time()
    D = to_dia(A, cells)
    D.data.block_until_ready()
    t_dia = time.time() - t0

    # ---- CG iteration throughput with DIA SpMV (shift + fma, no gathers) ----
    free = (~on_bnd).astype(dtype)
    b = jnp.ones(n_dofs, dtype) * free

    @jax.jit
    def cg_fixed_dia(D, free, b, n_iter=100):
        def Ax(x):
            y = D @ (x * free)
            return y * free + x * (1 - free)

        diag = D.diagonal()
        inv_diag = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 1.0)
        r0 = b
        z0 = inv_diag * r0

        def body(k, state):
            x, r, z, p, rz = state
            Ap = Ax(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv_diag * r
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        x, r, *_ = jax.lax.fori_loop(
            0, n_iter, body, (jnp.zeros_like(b), r0, z0, z0, jnp.vdot(r0, z0))
        )
        return x, jnp.linalg.norm(r)

    x, res = cg_fixed_dia(D, free, b)
    x.block_until_ready()  # compile + warmup
    t0 = time.time()
    x, res = cg_fixed_dia(D, free, b)
    x.block_until_ready()
    t_cg = time.time() - t0
    # sanity: DIA solution must equal the gather/scatter CG solution
    xg, resg = cg_fixed(A, cells, free, b, 20)
    xd, _ = cg_fixed_dia(D, free, b, 20)
    cg_agree = float(jnp.abs(xg - xd).max())
    cg_iters_per_s = 100 / t_cg

    out = {
        "metric": "p1_poisson_assembly_throughput",
        "value": round(elements_per_s, 1),
        "unit": "elements/s",
        "vs_baseline": round(elements_per_s / BASELINE_ELEMENTS_PER_S, 3),
        "n_cells": n_cells,
        "n_dofs": n_dofs,
        "cg_iters_per_s": round(cg_iters_per_s, 1),
        "assembly_s": round(t_asm, 6),
        "dia_convert_s": round(t_dia, 6),
        "cg_100_iters_s": round(t_cg, 6),
        "device_mesh_build_s": round(t_build, 4),
        "final_cg_residual": float(res),
        "dia_vs_gather_cg_max_diff": cg_agree,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
