"""Lane-routed SpMV component costs at 10.25M dofs (TPU).

Separates: pure pallas kernel (no remainder), the COO remainder path,
and p_max variants — identifies whether the 46 iters/s CG rate is
table-DMA-bound, VPU-bound (passes), or remainder-bound.
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
from fdapde_core_tpu.ops.pallas_gather_spmv import (
    C_CHUNKS,
    LaneRoutedELL,
    _pc_tuple,
    _spmv,
)

N = 3200
ND = (N + 1) ** 2
K = 9
S, G = 4096, 1361
GI = pow(G, -1, S)
REPS = 30


def timed(fn, label):
    fn()  # warm
    t0 = time.time()
    fn()
    dt = time.time() - t0
    print(f"{label}: {dt * 1e3 / REPS:.2f} ms/rep", flush=True)
    return dt / REPS


def main():
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
    op32 = MatrixFreeSoA(s_, c_, adj, mask8, ND)
    E32, _ = ell_from_op_blocked(op32, K, blocks=8)
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

    vals_s, cols_s = permute(E32)
    E_sc = ELLSoA(vals_s, cols_s, (ND, ND))
    del E32
    v = jnp.ones(ND, jnp.float32)

    for p_max in (13, None):
        t0 = time.time()
        lane = LaneRoutedELL.from_ell(E_sc, p_max=p_max, bandwidth=7970)
        p_max = lane.p_max  # auto: per-chunk tuple (round 5)
        print(f"p_max={p_max}: setup {time.time() - t0:.1f} s, "
              f"rem={lane.n_remainder} "
              f"({lane.n_remainder / (K * ND):.4%})", flush=True)
        SP = sum(_pc_tuple(p_max))

        @jax.jit
        def kern_only(v, ln, eps):
            def body(k, acc):
                y = _spmv(v + eps * k.astype(jnp.float32), ln.L1, ln.L2M,
                          ln.VALS, ND, SP, p_max)
                return acc + y[0] * 1e-30 + jax.lax.index_in_dim(
                    y, 12345, keepdims=False) * 1e-30
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        # NOTE: the fori body's output feeds the next iteration only via
        # the tiny accumulator — XLA cannot DCE the pallas call (opaque,
        # side-effecting custom call), and eps*k defeats CSE/hoisting.
        timed(lambda: float(kern_only(v, lane, jnp.float32(1e-30))),
              f"  kernel only (SP={SP})")

        rr, rc, rv = lane.rem

        @jax.jit
        def rem_only(v, rr, rc, rv, eps):
            def body(k, acc):
                y = jnp.zeros(ND, jnp.float32).at[rr].add(
                    rv * (v[rc] + eps * k.astype(jnp.float32)),
                    mode="drop")
                return acc + y[12345] * 1e-30 + jnp.sum(y) * 1e-30
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        timed(lambda: float(rem_only(v, rr, rc, rv, jnp.float32(1e-30))),
              f"  remainder only (L={rr.shape[0]})")

        @jax.jit
        def full_op(v, ln, eps):
            def body(k, acc):
                y = ln @ (v + eps * k.astype(jnp.float32))
                return acc + y[12345] * 1e-30
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        timed(lambda: float(full_op(v, lane, jnp.float32(1e-30))),
              "  full operator")
        del lane


if __name__ == "__main__":
    main()
