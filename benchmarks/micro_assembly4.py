#!/usr/bin/env python
"""Assembly kernel round 4: DCE-proof feed-forward timing.

Round-3 harness flaw: with `acc + out[0,0,0]` as the loop carry, XLA
dead-code-eliminates every output element not feeding the scalar — fused
XLA variants under-measure (pallas custom calls are opaque, so they don't).
Here the FULL output feeds the next input (c += f(c) * 1e-30): nothing can
be eliminated and the add fuses, so measured = honest stage cost with a
materialized output.
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
    """call(coords) -> (6, L, 128); timed via feed-forward chaining."""

    @jax.jit
    def run(coords):
        def body(k, c):
            return c + call(c) * 1e-30

        c = jax.lax.fori_loop(0, REPS, body, coords)
        return c[0, 0, 0]

    float(run(x))
    t0 = time.time()
    float(run(x))
    return (time.time() - t0) / REPS


def stiffness6(c, recip):
    x1, y1, x2, y2, x3, y3 = c[0], c[1], c[2], c[3], c[4], c[5]
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = recip(2.0 * jnp.abs(det))
    return jnp.stack([
        (b1 * b1 + c1 * c1) * inv, (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv, (b2 * b2 + c2 * c2) * inv,
        (b2 * b3 + c2 * c3) * inv, (b3 * b3 + c3 * c3) * inv,
    ])


def recip_exact(x):
    return 1.0 / x


def recip_newton(x):
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def make_pallas6(L, S, recip):
    def _kernel(xy_ref, out_ref):
        out_ref[:] = stiffness6(xy_ref, recip)

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

    cases = [
        ("xla6_div", lambda c: stiffness6(c, recip_exact)),
        ("p_newton_S256", make_pallas6(L, 256, recip_newton)),
        ("p_exact_S256", make_pallas6(L, 256, recip_exact)),
    ]
    for name, call in cases:
        try:
            dt = timeit(call, x)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "G_elem_per_s": round(C / dt / 1e9, 3)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:160]}))


if __name__ == "__main__":
    main()
