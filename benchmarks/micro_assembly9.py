#!/usr/bin/env python
"""Assembly round 9: coordinate-plane inputs (grid-native assembly).

Round-8 finding: the kernel is exactly at the pallas DMA roofline and
INPUT bytes cost ~2.7x output bytes. The edge-vector inputs (4 planes over
CELLS, 328 MB) are redundant for a structured-topology mesh: the node
coordinate planes (2 planes over NODES, 85 MB) determine them. This round
feeds (m, m) coordinate planes and derives the per-cell edge vectors
in-kernel from static sublane slices + lane rolls; outputs stay
off-diagonal-only, now in quad-grid layout (6 planes (n, n): a12/a13/a23
for cell types A and B) which the stencil conversion consumes directly.

Traffic: 85 MB coords (+85 MB for the row-shifted copies in the BlockSpec
variant) + 246 MB out vs 574 MB for round 8 -> projected 15-23 G elem/s.
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
N = 3200  # quads per side; cells = 2 N^2 = 20.48M
M = N + 1
M_PAD = 3328  # lane-padded coordinate columns (26 * 128)
N_CELLS = 2 * N * N
dtype = jnp.float32


def timeit(fn, *args):
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


def offdiag_from_uv(ux, uy, vx, vy):
    det = ux * vy - vx * uy
    inv = 1.0 / (2.0 * jnp.abs(det))
    b1, b2, b3 = uy - vy, vy, -uy
    c1, c2, c3 = vx - ux, -vx, ux
    return (
        (b1 * b2 + c1 * c2) * inv,
        (b1 * b3 + c1 * c3) * inv,
        (b2 * b3 + c2 * c3) * inv,
    )


def _compute_planes(x0, y0, xs, ys):
    """From coord rows r (x0/y0) and rows r+1 (xs/ys): the 6 off-diagonal
    planes for cell types A and B on this slab. Lane j+1 access via roll
    (pltpu.roll wants a non-negative shift: -1 == size - 1)."""
    sh = x0.shape[1] - 1

    def lshift(a):  # a[:, j] <- a[:, j+1] (wraps at the padded tail)
        return pltpu.roll(a, sh, 1)

    rx = lshift(x0) - x0  # right edge at row r
    ry = lshift(y0) - y0
    dx = xs - x0  # down edge
    dy = ys - y0
    rxn = lshift(xs) - xs  # right edge at row r+1
    ryn = lshift(ys) - ys
    # type A (a, b, a+1): u = down, v = right
    a12, a13, a23 = offdiag_from_uv(dx, dy, rx, ry)
    # type B (b, b+1, a+1): u = right@(r+1), v = right - down
    b12, b13, b23 = offdiag_from_uv(rxn, ryn, rx - dx, ry - dy)
    return a12, a13, a23, b12, b13, b23


def make_coords_blockspec(R):
    n_lanes = N  # 3200 = 25*128

    def _kernel(s_ref, x0, y0, xs, ys, *outs):
        planes = _compute_planes(x0[...] + s_ref[0], y0[...], xs[...], ys[...])
        for k in range(6):
            outs[k][...] = planes[k][:, :n_lanes]

    def call(eps, X0, Y0, Xs, Ys):
        bs_in = pl.BlockSpec((R, M_PAD), lambda i: (i, 0))
        bs_out = pl.BlockSpec((R, n_lanes), lambda i: (i, 0))
        return pl.pallas_call(
            _kernel,
            grid=(N // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [bs_in] * 4,
            out_specs=tuple([bs_out] * 6),
            out_shape=tuple(
                jax.ShapeDtypeStruct((N, n_lanes), dtype) for _ in range(6)
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.reshape(eps, (1,)), X0, Y0, Xs, Ys)

    return call


def make_coords_manual(R, n_buf=2):
    """Overlapping-slab manual DMA: only X, Y coord planes as input."""
    n_chunks = N // R

    def _kernel(s_ref, x_hbm, y_hbm, *out_hbm):
        def body(xin, yin, oscr, in_sem, out_sem):
            def in_dma(slot, k):
                return (
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(k * R, R + 1), :],
                        xin.at[slot],
                        in_sem.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        y_hbm.at[pl.ds(k * R, R + 1), :],
                        yin.at[slot],
                        in_sem.at[slot, 1],
                    ),
                )

            def out_dma(slot, k, plane):
                return pltpu.make_async_copy(
                    oscr.at[slot, plane],
                    out_hbm[plane].at[pl.ds(k * R, R), :],
                    out_sem.at[slot, plane],
                )

            for d in in_dma(0, 0):
                d.start()

            def loop(k, _):
                cur = k % n_buf

                @pl.when(k + 1 < n_chunks)
                def _():
                    for d in in_dma((k + 1) % n_buf, k + 1):
                        d.start()

                for d in in_dma(cur, k):
                    d.wait()

                @pl.when(k >= n_buf)
                def _():
                    for p in range(6):
                        out_dma(cur, k - n_buf, p).wait()

                x = xin[cur]
                y = yin[cur]
                planes = _compute_planes(
                    x[0:R] + s_ref[0], y[0:R], x[1 : R + 1], y[1 : R + 1]
                )
                for p in range(6):
                    oscr[cur, p] = planes[p][:, :N]
                for p in range(6):
                    out_dma(cur, k, p).start()
                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)
            for d in range(max(0, n_chunks - n_buf), n_chunks):
                for p in range(6):
                    out_dma(d % n_buf, d, p).wait()

        pl.run_scoped(
            body,
            xin=pltpu.VMEM((n_buf, R + 1, M_PAD), dtype),
            yin=pltpu.VMEM((n_buf, R + 1, M_PAD), dtype),
            oscr=pltpu.VMEM((n_buf, 6, R, N), dtype),
            in_sem=pltpu.SemaphoreType.DMA((n_buf, 2)),
            out_sem=pltpu.SemaphoreType.DMA((n_buf, 6)),
        )

    def call(eps, X, Y):
        return pl.pallas_call(
            _kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.ANY)] * 6),
            out_shape=tuple(
                jax.ShapeDtypeStruct((N, N), dtype) for _ in range(6)
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(jnp.reshape(eps, (1,)), X, Y)

    return call


def main():
    amp = 0.2

    @jax.jit
    def mk(z):
        gi = jnp.arange(M, dtype=dtype)[:, None]
        gj = jnp.arange(M_PAD, dtype=dtype)[None, :]
        inte = ((gi > 0) & (gi < N) & (gj > 0) & (gj < N)).astype(dtype)
        hx = jnp.sin(gi * 12.9898 + gj * 78.233) * 43758.5453
        hy = jnp.sin(gi * 39.4250 + gj * 11.1350) * 27183.1415
        X = (gi + (hx - jnp.floor(hx) - 0.5) * amp * inte) / N + z
        Y = (gj + (hy - jnp.floor(hy) - 0.5) * amp * inte) / N + 0 * X
        return X, Y

    X, Y = mk(jnp.float32(0.0))
    float(X[0, 0])
    X0, Y0 = X[:N], Y[:N]
    Xs, Ys = X[1 : N + 1], Y[1 : N + 1]

    # correctness vs the edge-vector offdiag kernel (type-A plane a12)
    from fdapde_core_tpu.ops.pallas_assembly import (
        EDGE_TILE_S,
        p1_stiffness_edges_offdiag,
    )

    @jax.jit
    def ref_a12(X, Y):
        # edges of type-A cells, cell (i, j) flat i*N+j
        ux = X[1 : N + 1, :N] - X[:N, :N]
        uy = Y[1 : N + 1, :N] - Y[:N, :N]
        vx = X[:N, 1 : N + 1] - X[:N, :N]
        vy = Y[:N, 1 : N + 1] - Y[:N, :N]
        e = jnp.stack(
            [ux.reshape(-1), uy.reshape(-1), vx.reshape(-1), vy.reshape(-1)]
        )
        pad = (-N * N) % (128 * EDGE_TILE_S)
        fill = jnp.tile(jnp.array([[1.0], [0.0], [0.0], [1.0]], dtype), (1, pad))
        e = jnp.concatenate([e, fill], 1).reshape(4, -1, 128)
        out = p1_stiffness_edges_offdiag(e)
        return out[0].reshape(-1)[: N * N].reshape(N, N)

    want = ref_a12(X, Y)

    for name, call, args in [
        ("coords_blockspec_R32", make_coords_blockspec(32), (X0, Y0, Xs, Ys)),
        ("coords_blockspec_R64", make_coords_blockspec(64), (X0, Y0, Xs, Ys)),
        ("coords_blockspec_R128", make_coords_blockspec(128), (X0, Y0, Xs, Ys)),
        ("coords_manual_R64", make_coords_manual(64), (X, Y)),
        ("coords_manual_R128", make_coords_manual(128), (X, Y)),
    ]:
        try:
            outs = jax.jit(lambda *a: call(jnp.float32(0.0), *a))(*args)
            err = float(jnp.abs(outs[0] - want).max())
            dt = timeit(call, *args)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "ms": round(dt * 1e3, 3),
                        "G elem/s": round(N_CELLS / dt / 1e9, 2),
                        "max_err_vs_edges": err,
                    }
                ),
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(ex)[:200]}), flush=True)


if __name__ == "__main__":
    main()
