"""Per-phase profile of the lane-routed scheduler at 10.25M dofs (TPU).

Builds the genscat scattered control operator (f32) and times each
scheduler phase with host fences between — isolates exec time from the
per-program compile roulette so the optimization target is visible.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.ops.matfree_soa import (
    ELLSoA,
    MatrixFreeSoA,
    build_adjacency_soa,
    ell_from_op_blocked,
    p1_offdiag_soa,
)
from fdapde_core_tpu.ops import pallas_gather_spmv as pg

N = 3200
ND = (N + 1) ** 2
K = 9
S, G = 4096, 1361
GI = pow(G, -1, S)
P_MAX = 11


def log(msg, t0):
    print(f"{msg}: {time.time() - t0:.2f} s", flush=True)


def main():
    t0 = time.time()

    @jax.jit
    def build(amp):
        x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
            N, amp, dtype=jnp.float64)
        s01, s02, s12 = p1_offdiag_soa(x, y, c0, c1, c2)
        s = jnp.stack([s01, s02, s12]).astype(jnp.float32)
        c = jnp.stack([c0, c1, c2])
        adj, mask, over = build_adjacency_soa(c.reshape(-1), ND, 8)
        return s, c, adj, mask, bnd, over.astype(jnp.int32)

    s_, c_, adj, mask8, bnd, over = build(jnp.float64(0.2))
    int(over)
    log("build (cold)", t0)
    op32 = MatrixFreeSoA(s_, c_, adj, mask8, ND)
    t0 = time.time()
    E32, overe = ell_from_op_blocked(op32, K, blocks=8)
    int(overe)
    log("ell conversion (cold)", t0)
    del op32, s_, c_, adj, mask8

    nfull = (ND // S) * S

    @jax.jit
    def permute(E):
        def p(i):
            return jnp.where(i < nfull, (i // S) * S + (G * (i % S)) % S, i)

        def pinv(i):
            return jnp.where(i < nfull,
                             (i // S) * S + (GI * (i % S)) % S, i)

        i = jnp.arange(ND, dtype=jnp.int32)
        src = pinv(i)
        return E.vals[:, src], p(E.cols[:, src])

    t0 = time.time()
    vals_s, cols_s = permute(E32)
    vals_s.block_until_ready()
    log("permute (cold)", t0)
    E_sc = ELLSoA(vals_s, cols_s, (ND, ND))
    del E32

    # ---- phase-by-phase ---------------------------------------------------
    t0 = time.time()
    out1 = pg._sched_phase1(E_sc.cols, E_sc.vals, ND, K, P_MAX, 2)
    n_left = int(out1[-1])
    log(f"phase1 (prep + 2 rounds + reassert; n_left={n_left})", t0)
    (ii, a, m, c, r2, c2, rank, stride, live, placed, sp, over_, valsf,
     colsf, tab, slots, _) = out1
    print("  overflow:", bool(over_), flush=True)

    NT = K * ND
    state11 = (ii, a, m, c, r2, c2, rank, stride, live, placed, sp)
    t0v = 3
    done = 14
    if n_left > NT // 8:
        L = min(max(1 << 14, 1 << max(n_left - 1, 1).bit_length()), NT)
        t0 = time.time()
        placed, sp, tab, slots, n_left_d = pg._sched_phase2(
            state11, tab, slots, ND, P_MAX, 4, jnp.int32(t0v), L)
        n_left = int(n_left_d)
        log(f"phase2 rare path (L={L}; n_left={n_left})", t0)
        state11 = state11[:9] + (placed, sp)
        t0v += 4
        done -= 4

    L = min(max(1 << 14, 1 << max(n_left - 1, 1).bit_length()), NT)
    t0 = time.time()
    L1, L2M, VALS, rtid, n_rem, vals_idx = pg._sched_finish(
        state11, tab, slots, valsf, ND, P_MAX, done, jnp.int32(t0v), L)
    nr = int(n_rem)
    log(f"finish (rounds+merge+tables; n_rem={nr}, "
        f"frac={nr / NT:.4f})", t0)

    t0 = time.time()
    Lr = min(max(128, 1 << (nr - 1).bit_length()) if nr else 128, NT)
    rem = pg._rem_slice(rtid, colsf, valsf, ND, Lr)
    rem[0].block_until_ready()
    log("rem slice", t0)


if __name__ == "__main__":
    main()
