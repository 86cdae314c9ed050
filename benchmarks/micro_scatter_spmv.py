#!/usr/bin/env python
"""Micro-benchmark: SpMV formulations for SCATTERED-banded topologies.

The round-3 hole (VERDICT missing #1): meshes whose RCM histogram is
spread across the band are rejected by plan_split_width and fall back to
raw ELL gathers — 1.31 CG iters/s at 10.25M dofs (~121M gathered elem/s).
This probes, on the real chip, every plausible route to a faster gather:

  A. ell_flat    one (K, n) gather + weighted sum (current ELLSoA path,
                 single fused program)
  B. ell_slots   K separate 1-D gathers (the exact ELLSoA.__matmul__)
  C. windowed    static row blocks (R rows), window = x[i*R - B : .. + B]
                 stacked (nb, Wwin) + ONE batched take_along_axis —
                 XLA sees gathers bounded inside a 350 KB window
  D. sorted      rate probe: globally sorted indices (locality best-case,
                 not a valid SpMV)
  E. random      rate probe: uniform random indices (locality worst-case)
  F. pallas dynamic_gather probe: is tpu.dynamic_gather available via
     jnp.take_along_axis inside a kernel, and at what rate (operand
     (S, 128) f32, same-shape indices, axis 0 then axis 1)

Synthetic scattered-banded matrix at n = 3201^2 = 10.25M, K = 9:
cols[k, i] = clip(i + delta, 0, n-1), delta = hash(k, i) in [-B, B],
B = 12288 — a maximally scattered histogram (every offset populated),
exactly the class plan_split_width rejects.

Usage: python benchmarks/micro_scatter_spmv.py [--small]
"""

import sys
import time

import jax
import jax.numpy as jnp

SMALL = "--small" in sys.argv
N_SIDE = 256 if SMALL else 3201
N = N_SIDE * N_SIDE
K = 9
B = 2048 if SMALL else 12288
R_BLK = 16384 if SMALL else 65536
REPS = 8


def fence():
    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(1.0)))
    t0 = time.time()
    for _ in range(3):
        float(f(jnp.float32(1.0)))
    return (time.time() - t0) / 3


@jax.jit
def build(seed):
    i = jnp.arange(N, dtype=jnp.int32)
    ks = jnp.arange(K, dtype=jnp.int32)[:, None]
    h = jnp.sin(i[None, :] * 12.9898 + ks * 78.233 + seed) * 43758.5453
    u = h - jnp.floor(h)  # U(0,1) hash
    delta = ((u * (2 * B + 1)).astype(jnp.int32) - B)
    cols = jnp.clip(i[None, :] + delta, 0, N - 1)
    h2 = jnp.sin(i[None, :] * 39.425 + ks * 11.135 + seed) * 27183.1415
    vals = (h2 - jnp.floor(h2)).astype(jnp.float32) + 0.1
    x = (jnp.sin(i * 0.001) * 0.5 + 0.5).astype(jnp.float32)
    return cols, vals, x, cols[0, 0] + jnp.sum(x).astype(jnp.int32)


def timed(fn, *args):
    """REPS sequential executions inside one jit; returns s/rep."""

    @jax.jit
    def run(eps, *a):
        def body(k, carry):
            acc, _ = carry
            y = fn(eps * k.astype(jnp.float32), *a)
            return (acc + jnp.sum(y), y[0])
        acc, w = jax.lax.fori_loop(0, REPS, body,
                                   (jnp.float32(0.0), jnp.float32(0.0)))
        return acc + w

    float(run(jnp.float32(1e-30), *args))  # compile + warm
    t0 = time.time()
    float(run(jnp.float32(1e-30), *args))
    return (time.time() - t0) / REPS


def main():
    fence_s = fence()
    print(f"fence_s={fence_s:.4f}", flush=True)
    cols, vals, x, w = build(jnp.float32(0.0))
    int(w)
    print(f"n={N} K={K} B={B} built", flush=True)
    results = {}

    # A: one (K, n) gather
    def ell_flat(eps, cols, vals, x):
        xe = x + eps
        return jnp.sum(vals * xe[cols], axis=0)

    results["A_ell_flat"] = timed(ell_flat, cols, vals, x)

    # B: K slot gathers (ELLSoA.__matmul__ form)
    def ell_slots(eps, cols, vals, x):
        xe = x + eps
        acc = None
        for k in range(K):
            t = vals[k] * xe[cols[k]]
            acc = t if acc is None else acc + t
        return acc

    results["B_ell_slots"] = timed(ell_slots, cols, vals, x)

    # C: windowed batched gather
    NB = -(-N // R_BLK)
    WWIN = R_BLK + 2 * B
    PADL = B
    NPAD = NB * R_BLK + 2 * B

    @jax.jit
    def localize(cols, vals):
        # (NB, K, R) block layouts: pad n up to NB*R first
        padn = NB * R_BLK - N
        colsp = jnp.pad(cols, ((0, 0), (0, padn)))
        valsp = jnp.pad(vals, ((0, 0), (0, padn)))
        colsb = colsp.reshape(K, NB, R_BLK).transpose(1, 0, 2)
        valsb = valsp.reshape(K, NB, R_BLK).transpose(1, 0, 2)
        base = (jnp.arange(NB, dtype=jnp.int32) * R_BLK - PADL)
        loc = colsb - base[:, None, None]  # in [0, WWIN) for REAL rows;
        # rows padded beyond n carry col 0 (val 0) -> clamp into range
        loc = jnp.clip(loc, 0, WWIN - 1)
        return loc.reshape(NB, K * R_BLK), valsb, loc[0, 0, 0]

    idxl, valsb, wl = localize(cols, vals)
    int(wl)

    def windowed(eps, idxl, valsb, x):
        xp = jnp.pad(x + eps, (PADL, NPAD - N - PADL))
        wins = jnp.stack([
            jax.lax.slice(xp, (i * R_BLK,), (i * R_BLK + WWIN,))
            for i in range(NB)
        ])
        g = jnp.take_along_axis(wins, idxl, axis=1)  # (NB, K*R)
        y = jnp.sum(valsb * g.reshape(NB, K, R_BLK), axis=1)
        return y.reshape(-1)[:N]

    # parity: windowed == ell_flat (one fetch of the max abs diff)
    perr = float(jax.jit(
        lambda idxl, valsb, cols, vals, x: jnp.max(jnp.abs(
            windowed(jnp.float32(0.0), idxl, valsb, x)
            - ell_flat(jnp.float32(0.0), cols, vals, x)))
    )(idxl, valsb, cols, vals, x))
    print(f"C_windowed parity max|diff| = {perr:.3e}", flush=True)
    results["C_windowed"] = timed(windowed, idxl, valsb, x)

    # D/E: locality probes (not valid SpMVs)
    @jax.jit
    def presort(cols):
        cs = jnp.sort(cols.reshape(-1)).reshape(K, N)
        return cs, cs[0, 0]

    cs, ws = presort(cols)
    int(ws)

    def sorted_gather(eps, cs, vals, x):
        xe = x + eps
        return jnp.sum(vals * xe[cs], axis=0)

    results["D_sorted"] = timed(sorted_gather, cs, vals, x)

    @jax.jit
    def randidx(cols):
        i = jnp.arange(N, dtype=jnp.int32)
        ks = jnp.arange(K, dtype=jnp.int32)[:, None]
        h = jnp.sin(i[None, :] * 7.13 + ks * 3.7) * 15731.743
        u = h - jnp.floor(h)
        cr = (u * N).astype(jnp.int32) % N
        return cr, cr[0, 0]

    cr, wr = randidx(cols)
    int(wr)
    results["E_random"] = timed(sorted_gather, cr, vals, x)

    for name, t in results.items():
        gel = K * N / t / 1e9
        print(f"{name}: {t*1e3:8.2f} ms/SpMV  {gel:7.2f} G gathered elem/s",
              flush=True)

    # F: pallas dynamic_gather availability + rate
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S = 512
        PR = 64  # gather reps inside the kernel

        def kern0(x_ref, idx_ref, o_ref):
            g = x_ref[:]
            for _ in range(PR):
                g = jnp.take_along_axis(g, idx_ref[:], axis=0)
            o_ref[:] = g

        def kern1(x_ref, idx_ref, o_ref):
            g = x_ref[:]
            for _ in range(PR):
                g = jnp.take_along_axis(g, idx_ref[:], axis=1)
            o_ref[:] = g

        xt = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
        for axis, kern in ((0, kern0), (1, kern1)):
            bound = S if axis == 0 else 128
            it = (jnp.arange(S * 128, dtype=jnp.int32).reshape(S, 128)
                  * 7919 % bound).astype(jnp.int32)
            try:
                f = jax.jit(lambda x_, i_: pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x_, i_))
                r = f(xt, it)
                # correctness single-step
                def kern_once(x_ref, idx_ref, o_ref, *, ax=axis):
                    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:],
                                                   axis=ax)
                f1 = jax.jit(lambda x_, i_: pl.pallas_call(
                    kern_once,
                    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x_, i_))
                import numpy as np
                got = np.asarray(f1(xt, it))
                ref = np.asarray(jnp.take_along_axis(xt, it, axis=axis))
                okc = bool((got == ref).all())
                float(jnp.sum(f(xt, it)))
                t0 = time.time()
                for _ in range(4):
                    float(jnp.sum(f(xt, it)))
                dt = (time.time() - t0) / 4 - fence_s
                rate = PR * S * 128 / max(dt, 1e-6) / 1e9
                print(f"F_pallas_axis{axis}: OK correct={okc} "
                      f"{rate:.2f} G elem/s (S={S}, {PR} chained)",
                      flush=True)
            except Exception as e:
                print(f"F_pallas_axis{axis}: UNSUPPORTED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        # F2: realistic-shape probes for the two-stage gather design:
        #   (a) chained lane-gathers on a (4096, 128) tile (HBM-resident
        #       block pipeling not included: pure VPU rate)
        #   (b) lane-gather + transpose + lane-gather round trip
        #   (c) lane-gather with operand lane-width 256 (is >128 legal?)
        S2 = 4096
        xt2 = jnp.arange(S2 * 128, dtype=jnp.float32).reshape(S2, 128)
        it2 = (jnp.arange(S2 * 128, dtype=jnp.int32).reshape(S2, 128)
               * 7919 % 128)
        PR2 = 32

        def kern_a(x_ref, idx_ref, o_ref):
            g = x_ref[:]
            for _ in range(PR2):
                g = jnp.take_along_axis(g, idx_ref[:], axis=1)
            o_ref[:] = g

        try:
            fa = jax.jit(lambda x_, i_: pl.pallas_call(
                kern_a,
                out_shape=jax.ShapeDtypeStruct((S2, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x_, i_))
            float(jnp.sum(fa(xt2, it2)))
            t0 = time.time()
            for _ in range(4):
                float(jnp.sum(fa(xt2, it2)))
            dt = (time.time() - t0) / 4 - fence_s
            print(f"F2a_lane_gather_4096x128: "
                  f"{PR2 * S2 * 128 / max(dt, 1e-6) / 1e9:.2f} G elem/s",
                  flush=True)
        except Exception as e:
            print(f"F2a: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

        # (b) the full 2-stage primitive on a (128, 128) tile:
        #     lane-gather -> transpose -> lane-gather -> transpose
        #     (= one arbitrary 2D gather, conflict-free schedule assumed)
        def kern_b(x_ref, i1_ref, i2_ref, o_ref):
            g = x_ref[:]
            for _ in range(PR2):
                a = jnp.take_along_axis(g, i1_ref[:], axis=1)
                t = a.T
                bq = jnp.take_along_axis(t, i2_ref[:], axis=1)
                g = bq.T
            o_ref[:] = g

        try:
            x1 = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
            i1 = (jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
                  * 7919 % 128)
            i2 = (jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
                  * 104729 % 128)
            fb = jax.jit(lambda x_, a_, b_: pl.pallas_call(
                kern_b,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x_, a_, b_))
            float(jnp.sum(fb(x1, i1, i2)))
            t0 = time.time()
            for _ in range(8):
                float(jnp.sum(fb(x1, i1, i2)))
            dt = (time.time() - t0) / 8 - fence_s
            print(f"F2b_2stage_128tile: "
                  f"{PR2 * 128 * 128 / max(dt, 1e-6) / 1e9:.2f} "
                  f"G 2d-gathered elem/s", flush=True)
        except Exception as e:
            print(f"F2b: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

        # (c) lane width 256 operand
        try:
            xw = jnp.arange(512 * 256, dtype=jnp.float32).reshape(512, 256)
            iw = (jnp.arange(512 * 256, dtype=jnp.int32).reshape(512, 256)
                  * 7919 % 256)

            def kern_c(x_ref, idx_ref, o_ref):
                o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

            fc = jax.jit(lambda x_, i_: pl.pallas_call(
                kern_c,
                out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x_, i_))
            import numpy as np
            got = np.asarray(fc(xw, iw))
            ref = np.asarray(jnp.take_along_axis(xw, iw, axis=1))
            print(f"F2c_lane256: OK correct={bool((got == ref).all())}",
                  flush=True)
        except Exception as e:
            print(f"F2c_lane256: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

        # (d) MXU one-hot sublane-select rate: Q (128, 448) one-hot rows
        #     built in-kernel from an int row-index vector, times W
        #     (448, 128) -> (128, 128) selected rows
        try:
            SW = 448

            def kern_d(w_ref, q_ref, o_ref):
                acc = jnp.zeros((128, 128), jnp.float32)
                for _ in range(8):
                    qi = q_ref[:]  # (128, 128) int32, use col 0 semantics
                    sel = (qi[:, :1] ==
                           jax.lax.broadcasted_iota(
                               jnp.int32, (128, SW), 1)).astype(jnp.float32)
                    acc = acc + jnp.dot(
                        sel, w_ref[:],
                        preferred_element_type=jnp.float32)
                o_ref[:] = acc

            wv = jnp.arange(SW * 128, dtype=jnp.float32).reshape(SW, 128)
            qv = (jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
                  * 7919 % SW)
            fd = jax.jit(lambda w_, q_: pl.pallas_call(
                kern_d,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(w_, q_))
            float(jnp.sum(fd(wv, qv)))
            t0 = time.time()
            for _ in range(4):
                float(jnp.sum(fd(wv, qv)))
            dt = (time.time() - t0) / 4 - fence_s
            # 8 selects of 128 rows each = 1024 row-selections of 128 vals
            print(f"F2d_mxu_onehot_select: "
                  f"{8 * 128 * 128 / max(dt, 1e-6) / 1e9:.3f} "
                  f"G selected elem/s", flush=True)
        except Exception as e:
            print(f"F2d: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    except Exception as e:
        print(f"F_pallas: import failed {e}", flush=True)


if __name__ == "__main__":
    main()
