#!/usr/bin/env python
"""Assembly round 6: edge-vector inputs + newton reciprocal (chain-fused)."""

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

    float(run(x).reshape(-1)[0])
    t0 = time.time()
    float(run(x).reshape(-1)[0])
    return (time.time() - t0) / REPS


def recip_exact(x):
    return 1.0 / x


def recip_newton(x):
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def edge_rows(ux, uy, vx, vy, recip):
    """Stiffness from edge vectors u = p2-p1, v = p3-p1.

    b = (uy-vy, vy, -uy); c = (vx-ux, -vx, ux); det = ux*vy - vx*uy.
    """
    det = ux * vy - vx * uy
    inv = recip(2.0 * jnp.abs(det))
    b1, b2, b3 = uy - vy, vy, -uy
    c1, c2, c3 = vx - ux, -vx, ux
    return [
        (b1 * b1 + c1 * c1) * inv, (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv, (b2 * b2 + c2 * c2) * inv,
        (b2 * b3 + c2 * c3) * inv, (b3 * b3 + c3 * c3) * inv,
    ]


def make_pE(L, S, recip):
    """Edges (4, L, 128) -> chain output (4, L, 128): c' = c + pack4(A)*eps.

    For timing only, the 6 outputs are folded into 4 rows (pairs summed) so
    the chain shape matches the input; production writes (6, L, 128) — one
    extra 8B/cell of writes, added analytically below.
    """

    def _kernel(c_ref, out_ref):
        rows = edge_rows(c_ref[0], c_ref[1], c_ref[2], c_ref[3], recip)
        folded = jnp.stack(
            [rows[0] + rows[4], rows[1] + rows[5], rows[2], rows[3]]
        )
        out_ref[:] = c_ref[:] + folded * 1e-30

    def call(c):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[pl.BlockSpec((4, S, 128), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((4, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((4, L, 128), dtype),
            interpret=jax.default_backend() != "tpu",
        )(c)

    return call


def make_pE_prod(L, S, recip):
    """Production shape: edges (4, L, 128) -> A (6, L, 128); timed by
    summing chain over a slot of the input... (kernel emits full 6-row
    output AND we keep the loop alive by re-deriving edges from output).
    Simpler: alternate kernel emitting (6,...) whose first 4 rows feed
    back as edges.
    """

    def _kernel(c_ref, out_ref):
        rows = edge_rows(c_ref[0], c_ref[1], c_ref[2], c_ref[3], recip)
        for r in range(6):
            out_ref[r] = rows[r] * 1e-30 + (c_ref[r % 4] if r < 4 else 0.0)

    def call(c):
        out = pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[pl.BlockSpec((4, S, 128), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
            interpret=jax.default_backend() != "tpu",
        )(c)
        return out[:4]

    return call


def main():
    L = ((N_CELLS + 127) // 128) // 512 * 512
    C = L * 128
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk():
        c = jax.random.uniform(key, (4, L, 128), dtype) + 0.5
        return c, c[0, 0, 0]

    x, w = mk()
    float(w)

    cases = [
        ("pE4_exact_S512", make_pE(L, 512, recip_exact)),
        ("pE4_newton_S512", make_pE(L, 512, recip_newton)),
        ("pE4_newton_S1024", make_pE(L, 1024, recip_newton)),
        ("pE6_newton_S512", make_pE_prod(L, 512, recip_newton)),
        ("pE6_exact_S512", make_pE_prod(L, 512, recip_exact)),
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
