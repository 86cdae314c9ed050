"""Isolate the _lane_refined_solve stall at scale (TPU).

Quarter-size genscat pipeline (n=1600, 2.56M dofs) with per-component
timers: f64 ELL residual program, aux build, inner chunked CG, outer
loop. Identifies which program eats the converged-stage budget.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fdapde_core_tpu.fem.solvers import DirichletSystem
from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.linear_algebra.solvers import cg_chunked
from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner
from fdapde_core_tpu.ops.matfree_soa import (
    ELLSoA,
    MatrixFreeSoA,
    build_adjacency_soa,
    ell_from_op_blocked,
    p1_offdiag_soa,
)
from fdapde_core_tpu.ops.pallas_gather_spmv import LaneRoutedELL

N = 1600
ND = (N + 1) ** 2
K = 9
S, G = 4096, 1361
GI = pow(G, -1, S)


def log(msg, t0):
    print(f"{msg}: {time.time() - t0:.2f} s", flush=True)


def main():
    t0 = time.time()

    @jax.jit
    def build(amp):
        x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
            N, amp, dtype=jnp.float64)
        s01, s02, s12 = p1_offdiag_soa(x, y, c0, c1, c2)
        s = jnp.stack([s01, s02, s12])
        c = jnp.stack([c0, c1, c2])
        adj, mask, over = build_adjacency_soa(c.reshape(-1), ND, 8)
        return x, y, s, c, adj, mask, bnd, over.astype(jnp.int32)

    x, y, s_, c_, adj, mask8, bnd, over = build(jnp.float64(0.2))
    int(over)
    log("build f64", t0)
    op64 = MatrixFreeSoA(s_, c_, adj, mask8, ND)
    t0 = time.time()
    E64, _ = ell_from_op_blocked(op64, K, blocks=4)
    log("ell f64", t0)
    del op64, s_, c_, adj, mask8
    nfull = (ND // S) * S

    @jax.jit
    def permute(E, x, y, bnd):
        def p(i):
            return jnp.where(i < nfull, (i // S) * S + (G * (i % S)) % S, i)

        def pinv(i):
            return jnp.where(i < nfull,
                             (i // S) * S + (GI * (i % S)) % S, i)

        i = jnp.arange(ND, dtype=jnp.int32)
        src = pinv(i)
        return (E.vals[:, src], p(E.cols[:, src]), bnd[src], x[src],
                y[src])

    t0 = time.time()
    vals_s, cols_s, bnd_s, x_s, y_s = permute(E64, x, y, bnd)
    vals_s.block_until_ready()
    log("permute", t0)
    E64_sc = ELLSoA(vals_s, cols_s, (ND, ND))
    E_sc = jax.jit(lambda E: E.astype(jnp.float32))(E64_sc)
    del E64

    t0 = time.time()
    lane = LaneRoutedELL.from_ell(E_sc, bandwidth=7970)
    log(f"lane setup (rem {lane.n_remainder})", t0)

    t0 = time.time()
    diag32 = jax.jit(
        lambda E_, b_: DirichletSystem(E_, b_).diagonal())(E_sc, bnd_s)
    aux = AuxGridPreconditioner.build_device((x_s, y_s), diag32)
    float(aux.dinv[0])
    log("aux build", t0)

    rhs64 = jax.jit(
        lambda b_: jnp.where(b_, 0.0, 1.0).astype(jnp.float64) / (N * N)
    )(bnd_s)
    g0 = jnp.zeros(ND, jnp.float64)
    bnd_j = bnd_s

    # --- refined solve, instrumented -----------------------------------
    sys_ref = DirichletSystem(E64_sc, bnd_j)
    lane_sys = DirichletSystem(lane, bnd_j)

    @jax.jit
    def prep(op_ref, bnd, b, g):
        sysr = DirichletSystem(op_ref, bnd)
        b_mod = sysr.rhs(b, g)
        x0 = jnp.where(bnd, g, 0.0)
        r = b_mod - sysr(x0)
        bn = jnp.sqrt(jnp.sum(b_mod * b_mod))
        return b_mod, x0, r, bn, jnp.sqrt(jnp.sum(r * r))

    @jax.jit
    def update(op_ref, bnd, x, dx, b_mod):
        sysr = DirichletSystem(op_ref, bnd)
        x = x + dx.astype(x.dtype)
        r = b_mod - sysr(x)
        return x, r, jnp.sqrt(jnp.sum(r * r))

    def pre(z):
        return aux(z.astype(jnp.float32)).astype(z.dtype)

    t0 = time.time()
    b_mod, xx, r, bn, rn = prep(E64_sc, bnd_j, rhs64, g0)
    float(rn)
    log("prep (f64 ELL SpMV program)", t0)
    bnf = float(bn)
    rel = float(rn) / bnf
    total = 0
    for outer in range(8):
        if rel <= 1e-8:
            break
        t0 = time.time()
        dx, info = cg_chunked(lane_sys, r.astype(jnp.float32), M_inv=pre,
                              rtol=1e-6, maxiter=100, chunk=16)
        ii = int(info.iterations)
        total += ii
        log(f"  inner CG outer={outer} iters={ii}", t0)
        t0 = time.time()
        xx, r, rn = update(E64_sc, bnd_j, xx, dx, b_mod)
        rel = float(rn) / bnf
        log(f"  update outer={outer} rel={rel:.3e}", t0)
    print(f"TOTAL inner iters {total}, final rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
