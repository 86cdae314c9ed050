#!/usr/bin/env python
"""Benchmark: 2D Poisson P1 assemble + CG on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The headline metric is element-assembly throughput on the ~10M-dof 2D Poisson
problem (BASELINE.md north star), with CG iteration throughput as an extra
field. vs_baseline compares against an estimated 64-core multithreaded
CPU-class baseline for the reference's Eigen assembly loop:
the reference assembles serially at ~1M elements/s/core on modern x86
(O(n_cells * nb^2 * nq) scalar loop, fem_assembler.h:79-110); a perfectly
scaled 64-core port would reach ~5e7 elements/s. The reference itself
publishes no numbers (BASELINE.md: "None exist").

Usage: python bench.py [--small]
"""

import json
import os
import sys
import time

os.environ["FDAPDE_TPU_X64"] = "0"  # f32 fast path on the chip

import numpy as np

BASELINE_ELEMENTS_PER_S = 5.0e7  # estimated 64-core CPU-class (see docstring)


def main():
    small = "--small" in sys.argv
    n = 256 if small else 2236  # cells = 2 n^2 -> 10m cells, 5m dofs (full)
    t0 = time.time()

    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.geometry.structured import unit_square_mesh
    from fdapde_core_tpu.parallel import ShardedPoisson
    from fdapde_core_tpu.parallel.sharded import make_device_mesh

    mesh = unit_square_mesh(n)
    host_prep = time.time() - t0

    sp = ShardedPoisson(mesh, order=1, device_mesh=make_device_mesh(1), dtype=jnp.float32)
    n_cells, n_dofs = mesh.n_cells, sp.n_dofs

    # ---- assembly throughput ----
    A = sp.assemble()
    A.block_until_ready()  # compile + warmup
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        A = sp.assemble()
    A.block_until_ready()
    t_asm = (time.time() - t0) / reps
    elements_per_s = n_cells / t_asm

    # ---- CG iteration throughput (fixed 100 iterations, rtol=0) ----
    b = jnp.ones(n_dofs, jnp.float32)
    g = jnp.zeros(n_dofs, jnp.float32)
    iters_fixed = 100
    x, res, k = sp.cg(A, b, g, rtol=0.0, maxiter=iters_fixed)
    x.block_until_ready()  # compile + warmup
    t0 = time.time()
    x, res, k = sp.cg(A, b, g, rtol=0.0, maxiter=iters_fixed)
    x.block_until_ready()
    t_cg = time.time() - t0
    cg_iters_per_s = int(k) / t_cg

    out = {
        "metric": "p1_poisson_assembly_throughput",
        "value": round(elements_per_s, 1),
        "unit": "elements/s",
        "vs_baseline": round(elements_per_s / BASELINE_ELEMENTS_PER_S, 3),
        "n_cells": n_cells,
        "n_dofs": n_dofs,
        "cg_iters_per_s": round(cg_iters_per_s, 1),
        "assembly_s": round(t_asm, 6),
        "cg_100_iters_s": round(t_cg, 6),
        "host_prep_s": round(host_prep, 3),
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
