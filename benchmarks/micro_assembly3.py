#!/usr/bin/env python
"""Assembly kernel round 3: fusion-safe timing harness.

The rep-loop perturbation is a SCALAR passed into the kernel (SMEM for
pallas, broadcast-add for XLA) so no full-array copy is materialized per
rep — pallas custom calls cannot fuse producer ops, so `coords + eps` in the
loop body costs a full extra read+write stream that XLA variants fuse away.
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
from jax.experimental.pallas import tpu as pltpu

REPS = 20
N_CELLS = 20_000_000
dtype = jnp.float32


def timeit(call, x):
    """call(coords, s) -> array; s is the loop-dependency scalar."""

    @jax.jit
    def run(coords):
        def body(k, acc):
            out = call(coords, k.astype(dtype) * 1e-30)
            return acc + out.reshape(-1)[0]

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(x))
    t0 = time.time()
    float(run(x))
    return (time.time() - t0) / REPS


def body_rows(x1, y1, x2, y2, x3, y3, recip):
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = recip(2.0 * jnp.abs(det))
    return [
        (b1 * b1 + c1 * c1) * inv, (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv, (b2 * b2 + c2 * c2) * inv,
        (b2 * b3 + c2 * c3) * inv, (b3 * b3 + c3 * c3) * inv,
    ]


def recip_exact(x):
    return 1.0 / x


def recip_newton(x):
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def make_pallas6(L, S, recip):
    def _kernel(s_ref, xy_ref, out_ref):
        s = s_ref[0]
        rows = body_rows(xy_ref[0] + s, xy_ref[1], xy_ref[2],
                         xy_ref[3], xy_ref[4], xy_ref[5], recip)
        for r, v in enumerate(rows):
            out_ref[r] = v

    def call(c, s):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
            interpret=jax.default_backend() != "tpu",
        )(jnp.reshape(s, (1,)), c)

    return call


def make_pallas_copy(L, S):
    """Pure stream copy through pallas: overhead floor."""

    def _kernel(s_ref, xy_ref, out_ref):
        out_ref[:] = xy_ref[:] * 2.0 + s_ref[0]

    def call(c, s):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
            interpret=jax.default_backend() != "tpu",
        )(jnp.reshape(s, (1,)), c)

    return call


def main():
    L = ((N_CELLS + 127) // 128) // 512 * 512
    C = L * 128
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk():
        c = jax.random.uniform(key, (6, L, 128), dtype) + 0.5
        return c, c[0, 0, 0]

    x, w = mk()
    float(w)

    def xla6(c, s):
        return jnp.stack(body_rows(c[0] + s, c[1], c[2], c[3], c[4], c[5],
                                   recip_exact))

    cases = [
        ("xla6_div", xla6),
        ("pallas_copy_S256", make_pallas_copy(L, 256)),
        ("pallas_copy_S512", make_pallas_copy(L, 512)),
        ("p_newton_S128", make_pallas6(L, 128, recip_newton)),
        ("p_newton_S256", make_pallas6(L, 256, recip_newton)),
        ("p_newton_S512", make_pallas6(L, 512, recip_newton)),
        ("p_exact_S256", make_pallas6(L, 256, recip_exact)),
    ]
    for name, call in cases:
        try:
            dt = timeit(call, x)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "G_elem_per_s": round(C / dt / 1e9, 3)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:160]}))

    # accuracy: newton vs exact reciprocal on matching shapes
    Ls = 512
    xs = x[:, :Ls]
    a = make_pallas6(Ls, 128, recip_newton)(xs, jnp.float32(0))
    b = make_pallas6(Ls, 128, recip_exact)(xs, jnp.float32(0))
    rel = float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1e-30)))
    print(json.dumps({"variant": "newton_vs_exact_relerr", "value": rel}))


if __name__ == "__main__":
    main()
