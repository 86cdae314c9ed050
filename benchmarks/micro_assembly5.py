#!/usr/bin/env python
"""Assembly round 5: chain-fused pallas timing + lane-concatenated layout.

Chain-fused: the timing wrapper kernel emits c' = c + A(c)*1e-30 (same
shape as input), so the rep loop has ZERO harness traffic — measured cost =
production kernel cost + one fma.

Layouts:
  pA: (6, L, 128) — row-major planes; each block = 6 strided DMAs
  pB: (L, 768)    — 6 coord slots concatenated on lanes; 1 DMA per block
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
dtype = jnp.float32


def timeit(chain_call, x):
    @jax.jit
    def run(coords):
        return jax.lax.fori_loop(0, REPS, lambda k, c: chain_call(c), coords)

    w = run(x)
    float(w.reshape(-1)[0])
    t0 = time.time()
    float(run(x).reshape(-1)[0])
    return (time.time() - t0) / REPS


def stiff_rows(x1, y1, x2, y2, x3, y3):
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = 1.0 / (2.0 * jnp.abs(det))
    return [
        (b1 * b1 + c1 * c1) * inv, (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv, (b2 * b2 + c2 * c2) * inv,
        (b2 * b3 + c2 * c3) * inv, (b3 * b3 + c3 * c3) * inv,
    ]


def make_pA(L, S):
    def _kernel(c_ref, out_ref):
        rows = stiff_rows(c_ref[0], c_ref[1], c_ref[2],
                          c_ref[3], c_ref[4], c_ref[5])
        out_ref[:] = c_ref[:] + jnp.stack(rows) * 1e-30

    def call(c):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[pl.BlockSpec((6, S, 128), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
            interpret=jax.default_backend() != "tpu",
        )(c)

    return call


def make_pB(L, S):
    def _kernel(c_ref, out_ref):
        cols = [c_ref[:, 128 * k:128 * (k + 1)] for k in range(6)]
        rows = stiff_rows(*cols)
        out_ref[:] = c_ref[:] + jnp.concatenate(rows, axis=1) * 1e-30

    def call(c):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[pl.BlockSpec((S, 768), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((S, 768), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((L, 768), dtype),
            interpret=jax.default_backend() != "tpu",
        )(c)

    return call


def main():
    L = ((N_CELLS + 127) // 128) // 512 * 512
    C = L * 128
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mkA():
        c = jax.random.uniform(key, (6, L, 128), dtype) + 0.5
        return c, c[0, 0, 0]

    @jax.jit
    def mkB():
        c = jax.random.uniform(key, (L, 768), dtype) + 0.5
        return c, c[0, 0]

    xA, w = mkA()
    float(w)
    xB, w = mkB()
    float(w)

    cases = [
        ("pA_S256", make_pA(L, 256), xA),
        ("pA_S512", make_pA(L, 512), xA),
        ("pB_S256", make_pB(L, 256), xB),
        ("pB_S512", make_pB(L, 512), xB),
        ("pB_S1024", make_pB(L, 1024), xB),
        ("pB_S2048", make_pB(L, 2048), xB),
    ]
    for name, call, x in cases:
        try:
            dt = timeit(call, x)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "G_elem_per_s": round(C / dt / 1e9, 3),
                              "eff_GBps": round(48 * C / dt / 1e9, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
