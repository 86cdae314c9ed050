#!/usr/bin/env python
"""Assembly round 7: chasing the ~300 GB/s pallas pipeline floor.

Production kernel (p1_stiffness_edges): (4, L, 128) edges -> (6, L, 128)
packed stiffness = 40 B/cell; at 20.48M cells the stream roofline
(630 GB/s measured XLA elementwise) is ~1.3 ms; round-1 kernel: 2.6 ms.

Hypotheses tested here (VERDICT r1 item 7):
  A. block DMA contiguity: a (4, S, 128) block of a (4, L, 128) array is 4
     strided transfers; splitting into 4 separate (L, 128) inputs (and 6
     separate outputs) makes every block DMA contiguous,
  B. auto-pipeline block size S (VMEM-resident working set vs per-block
     overhead),
  C. manual double buffering over HBM refs (explicit make_async_copy with 2
     slots, overlap in-DMA / compute / out-DMA),
  D. fewer outputs: pack the 6 result planes as (S, 768) lane-concatenated
     single output (1 contiguous DMA) vs 6 plane writes.

Timing: production semantics — the kernel is an opaque pallas call, reps
accumulate a scalar witness; the loop-varying eps enters via SMEM.
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
N_CELLS = 20_480_000
L_TOTAL = N_CELLS // 128  # 160000
dtype = jnp.float32
BYTES_PER_CELL = 40


def timeit(fn, *args):
    """fn(eps, *args) -> (6, ...) output; reps accumulate out[0,0,0]."""

    @jax.jit
    def run(*a):
        def body(k, acc):
            out = fn(k.astype(dtype) * 1e-30, *a)
            first = out[0] if isinstance(out, (tuple, list)) else out
            return acc + first.reshape(-1)[0]

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(*args))
    t0 = time.time()
    float(run(*args))
    return (time.time() - t0) / REPS


def compute_rows(ux, uy, vx, vy):
    det = ux * vy - vx * uy
    inv = 1.0 / (2.0 * jnp.abs(det))
    b1, b2, b3 = uy - vy, vy, -uy
    c1, c2, c3 = vx - ux, -vx, ux
    return (
        (b1 * b1 + c1 * c1) * inv,
        (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv,
        (b2 * b2 + c2 * c2) * inv,
        (b2 * b3 + c2 * c3) * inv,
        (b3 * b3 + c3 * c3) * inv,
    )


def make_baseline(L, S):
    """Round-1 production kernel shape: (4,L,128) -> (6,L,128)."""

    def _kernel(s_ref, e_ref, out_ref):
        s = s_ref[0]
        rows = compute_rows(e_ref[0] + s, e_ref[1], e_ref[2], e_ref[3])
        for k in range(6):
            out_ref[k] = rows[k]

    def call(eps, e):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((4, S, 128), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
        )(jnp.reshape(eps, (1,)), e)

    return call


def make_separate(L, S):
    """4 separate (L,128) inputs, 6 separate (L,128) outputs: every block
    transfer is contiguous."""

    def _kernel(s_ref, ux, uy, vx, vy, *outs):
        rows = compute_rows(ux[...] + s_ref[0], uy[...], vx[...], vy[...])
        for k in range(6):
            outs[k][...] = rows[k]

    def call(eps, ux, uy, vx, vy):
        bs = pl.BlockSpec((S, 128), lambda i: (i, 0))
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bs] * 4,
            out_specs=tuple([bs] * 6),
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, 128), dtype) for _ in range(6)
            ),
        )(jnp.reshape(eps, (1,)), ux, uy, vx, vy)

    return call


def make_lanecat(L, S):
    """Input (L, 512) lane-concatenated, output (L, 768) lane-concatenated:
    single contiguous DMA each way per block."""

    def _kernel(s_ref, e_ref, out_ref):
        e = e_ref[...]
        rows = compute_rows(
            e[:, 0:128] + s_ref[0], e[:, 128:256], e[:, 256:384], e[:, 384:512]
        )
        out_ref[...] = jnp.concatenate(rows, axis=1)

    def call(eps, e):
        return pl.pallas_call(
            _kernel,
            grid=(L // S,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((S, 512), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((S, 768), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((L, 768), dtype),
        )(jnp.reshape(eps, (1,)), e)

    return call


def make_manual_db(L, S, n_buf=2):
    """Manual double buffering: single program, explicit async copies."""
    n_chunks = L // S

    def _kernel(s_ref, e_hbm, out_hbm):
        def body(in_scr, out_scr, in_sem, out_sem):
            def in_dma(slot, k):
                return pltpu.make_async_copy(
                    e_hbm.at[:, pl.ds(k * S, S), :],
                    in_scr.at[slot],
                    in_sem.at[slot],
                )

            def out_dma(slot, k):
                return pltpu.make_async_copy(
                    out_scr.at[slot],
                    out_hbm.at[:, pl.ds(k * S, S), :],
                    out_sem.at[slot],
                )

            for w in range(min(n_buf - 1, n_chunks)):
                in_dma(w, w).start()

            def loop(k, _):
                cur = k % n_buf

                @pl.when(k + n_buf - 1 < n_chunks)
                def _():
                    in_dma((k + n_buf - 1) % n_buf, k + n_buf - 1).start()

                in_dma(cur, k).wait()

                @pl.when(k >= n_buf)
                def _():
                    out_dma(cur, k - n_buf).wait()

                e = in_scr[cur]
                rows = compute_rows(e[0] + s_ref[0], e[1], e[2], e[3])
                for r in range(6):
                    out_scr[cur, r] = rows[r]
                out_dma(cur, k).start()
                return _

            jax.lax.fori_loop(0, n_chunks, loop, None, unroll=False)
            for d in range(max(0, n_chunks - n_buf), n_chunks):
                out_dma(d % n_buf, d).wait()

        pl.run_scoped(
            body,
            in_scr=pltpu.VMEM((n_buf, 4, S, 128), dtype),
            out_scr=pltpu.VMEM((n_buf, 6, S, 128), dtype),
            in_sem=pltpu.SemaphoreType.DMA((n_buf,)),
            out_sem=pltpu.SemaphoreType.DMA((n_buf,)),
        )

    def call(eps, e):
        return pl.pallas_call(
            _kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((6, L, 128), dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.reshape(eps, (1,)), e)

    return call


def main():
    L = L_TOTAL
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk(z):
        base = (
            jax.random.uniform(key, (4, L, 128), dtype, 0.5, 1.5) + z
        )
        return base

    e3d = mk(jnp.float32(0.0))
    float(e3d[0, 0, 0])
    parts = [e3d[k] for k in range(4)]
    ecat = jnp.concatenate(parts, axis=1)  # (L, 512)

    variants = []
    for S in (512, 1024, 2048, 4096):
        variants.append((f"baseline_S{S}", make_baseline(L, S), (e3d,)))
    for S in (1024, 2048):
        variants.append((f"separate_S{S}", make_separate(L, S), tuple(parts)))
        variants.append((f"lanecat_S{S}", make_lanecat(L, S), (ecat,)))
    for S in (1000, 2000):
        for nb in (2, 3):
            variants.append(
                (f"manual_db{nb}_S{S}", make_manual_db(L, S, nb), (e3d,))
            )

    for name, call, args in variants:
        try:
            dt = timeit(call, *args)
            gbs = N_CELLS * BYTES_PER_CELL / dt / 1e9
            print(
                json.dumps(
                    {
                        "variant": name,
                        "ms": round(dt * 1e3, 3),
                        "G elem/s": round(N_CELLS / dt / 1e9, 2),
                        "GB/s": round(gbs, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
