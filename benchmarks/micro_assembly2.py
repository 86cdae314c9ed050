#!/usr/bin/env python
"""Assembly kernel round 2: divide elimination + pallas write patterns."""

import functools
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


def timeit(call, x, dtype=jnp.float32):
    @jax.jit
    def run(coords):
        def body(k, acc):
            out = call(coords + k.astype(dtype) * 1e-30)
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
    # approx reciprocal + one Newton step: rel err ~ eps^2 of the approx
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def main():
    dtype = jnp.float32
    L = ((N_CELLS + 127) // 128) // 512 * 512
    C = L * 128
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk():
        c = jax.random.uniform(key, (6, L, 128), dtype) + 0.5
        return c, c[0, 0, 0]

    x, w = mk()
    float(w)

    def pallas6(S, recip, stack_write, semantics=None):
        def _kernel(xy_ref, out_ref):
            rows = body_rows(xy_ref[0], xy_ref[1], xy_ref[2],
                             xy_ref[3], xy_ref[4], xy_ref[5], recip)
            if stack_write:
                out_ref[:] = jnp.stack(rows)
            else:
                for r, v in enumerate(rows):
                    out_ref[r] = v

        params = {}
        if semantics:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=(semantics,))

        def call(c):
            return pl.pallas_call(
                _kernel,
                grid=(L // S,),
                in_specs=[pl.BlockSpec((6, S, 128), lambda i: (0, i, 0))],
                out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
                out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
                interpret=jax.default_backend() != "tpu",
                **params,
            )(c)

        return call

    cases = [
        ("p_newton_S128", pallas6(128, recip_newton, False)),
        ("p_newton_S256", pallas6(256, recip_newton, False)),
        ("p_newton_S512", pallas6(512, recip_newton, False)),
        ("p_newton_S256_stack", pallas6(256, recip_newton, True)),
        ("p_exact_S256", pallas6(256, recip_exact, False)),
        ("p_newton_S256_par", pallas6(256, recip_newton, False, "parallel")),
        ("p_newton_S256_arb", pallas6(256, recip_newton, False, "arbitrary")),
    ]
    for name, call in cases:
        try:
            dt = timeit(call, x)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "G_elem_per_s": round(C / dt / 1e9, 3)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:160]}))

    # accuracy of the newton reciprocal path vs exact (on a small slab)
    xs = x[:, :512]
    a = pallas6(128, recip_newton, False)(xs)
    b = pallas6(128, recip_exact, False)(xs)
    rel = float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1e-30)))
    print(json.dumps({"variant": "newton_vs_exact_relerr", "value": rel}))


if __name__ == "__main__":
    main()
