#!/usr/bin/env python
"""Micro-benchmark: P1 local-assembly kernel layout variants (real TPU).

Timing per CLAUDE.md: in-jit fori_loop repetitions with a loop-carried data
dependency + scalar witness fetched via float() (block_until_ready does not
fence remote execution on this harness).

Variants:
  v0_rows9   : (6, C) -> (9, C)  [current kernel; sublane pads 6->8, 9->16]
  v1_3d9     : (6, C/128, 128) -> (9, C/128, 128)  [no tile padding]
  v2_3d6     : (6, C/128, 128) -> (6, C/128, 128)  [symmetric-unique entries]
  v3_xla6    : v2 computed by plain XLA (no pallas) on the 3D layout
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["FDAPDE_TPU_X64"] = "0"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fdapde_jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

REPS = 20
N_CELLS = 20_000_000


def timeit(fn, x):
    w = fn(x)
    float(w)  # compile + warm
    t0 = time.time()
    float(fn(x))
    dt = (time.time() - t0) / REPS
    return dt


def reps_loop(kernel_call, dtype):
    @jax.jit
    def run(coords):
        def body(k, acc):
            out = kernel_call(coords + k.astype(dtype) * 1e-30)
            return acc + out.reshape(-1)[0]

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return run


def stiffness_rows(x1, y1, x2, y2, x3, y3, sym: bool):
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = 1.0 / (2.0 * jnp.abs(det))
    a11 = (b1 * b1 + c1 * c1) * inv
    a12 = (b1 * b2 + c1 * c2) * inv
    a13 = (b1 * b3 + c1 * c3) * inv
    a22 = (b2 * b2 + c2 * c2) * inv
    a23 = (b2 * b3 + c2 * c3) * inv
    a33 = (b3 * b3 + c3 * c3) * inv
    if sym:
        return [a11, a12, a13, a22, a23, a33]
    return [a11, a12, a13, a12, a22, a23, a13, a23, a33]


def main():
    dtype = jnp.float32
    results = {}

    # ---- v0: current (6, C) -> (9, C) ----
    from fdapde_core_tpu.ops.pallas_assembly import TILE, p1_stiffness_2d

    C = ((N_CELLS + TILE - 1) // TILE) * TILE
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk2d():
        c = jax.random.uniform(key, (6, C), dtype)
        return c, c[0, 0]

    coords2d, w = mk2d()
    float(w)
    dt = timeit(reps_loop(p1_stiffness_2d, dtype), coords2d)
    results["v0_rows9"] = {"s": dt, "elem_per_s": N_CELLS / dt}

    # ---- 3D layout variants ----
    S = 512  # sublane block: (rows, S, 128) VMEM blocks
    L = C // 128

    def kernel3d(nrows, sym):
        def _kernel(xy_ref, out_ref):
            rows = stiffness_rows(
                xy_ref[0], xy_ref[1], xy_ref[2],
                xy_ref[3], xy_ref[4], xy_ref[5], sym=sym,
            )
            for r, val in enumerate(rows):
                out_ref[r] = val

        def call(coords3d):
            return pl.pallas_call(
                _kernel,
                grid=(L // S,),
                in_specs=[pl.BlockSpec((6, S, 128), lambda i: (0, i, 0))],
                out_specs=pl.BlockSpec((nrows, S, 128), lambda i: (0, i, 0)),
                out_shape=jax.ShapeDtypeStruct((nrows, L, 128), dtype),
                interpret=jax.default_backend() != "tpu",
            )(coords3d)

        return call

    @jax.jit
    def mk3d():
        c = jax.random.uniform(key, (6, L, 128), dtype)
        return c, c[0, 0, 0]

    coords3d, w = mk3d()
    float(w)

    dt = timeit(reps_loop(kernel3d(9, sym=False), dtype), coords3d)
    results["v1_3d9"] = {"s": dt, "elem_per_s": N_CELLS / dt}

    dt = timeit(reps_loop(kernel3d(6, sym=True), dtype), coords3d)
    results["v2_3d6"] = {"s": dt, "elem_per_s": N_CELLS / dt}

    # ---- v3: plain XLA on the 3D layout ----
    def xla6(c):
        rows = stiffness_rows(c[0], c[1], c[2], c[3], c[4], c[5], sym=True)
        return jnp.stack(rows)

    dt = timeit(reps_loop(xla6, dtype), coords3d)
    results["v3_xla6"] = {"s": dt, "elem_per_s": N_CELLS / dt}

    for k, v in results.items():
        print(json.dumps({"variant": k, "ms": round(v["s"] * 1e3, 3),
                          "G_elem_per_s": round(v["elem_per_s"] / 1e9, 3)}))


if __name__ == "__main__":
    main()
