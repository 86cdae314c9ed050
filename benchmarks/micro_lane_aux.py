"""Lane-routed aux-grid stages at gendel scale (5.13M dofs, TPU).

Round-5 question: converged lane solves are AUX-APPLY-BOUND (~0.5 s/iter
of P/P^T XLA gathers). This probe builds the gendel pipeline, swaps the
aux application onto the lane kernel (ops/lane_aux.py) and measures:
build cost of the P / P^T schedules, a single aux apply (XLA vs lane),
and the cold/warm converged refined solve.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from scipy.spatial import Delaunay

import jax
import jax.numpy as jnp

from fdapde_core_tpu.fem.solvers import DirichletSystem
from fdapde_core_tpu.geometry.refine_device import (
    strip_order,
    uniform_refine_device,
)
from fdapde_core_tpu.models.matfree import _lane_refined_solve
from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner
from fdapde_core_tpu.ops.lane_aux import LaneAuxGrid
from fdapde_core_tpu.ops.matfree_soa import (
    MatrixFreeSoA,
    ell_from_op_blocked,
)
from fdapde_core_tpu.ops.pallas_gather_spmv import LaneRoutedELL


def main():
    nx, LEVELS, POP = 283, 3, 5000
    rng = np.random.default_rng(11)
    ii, jj = np.meshgrid(np.arange(nx + 1), np.arange(nx + 1),
                         indexing="ij")
    pts = np.stack([ii, jj], axis=-1).reshape(-1, 2).astype(np.float64)
    interior = ((pts[:, 0] > 0) & (pts[:, 0] < nx)
                & (pts[:, 1] > 0) & (pts[:, 1] < nx))
    pts[interior] += rng.uniform(-0.35, 0.35, size=(interior.sum(), 2))
    pts /= nx
    cells = Delaunay(pts).simplices.astype(np.int32)

    x = jnp.asarray(pts[:, 0]); y = jnp.asarray(pts[:, 1])
    c0 = jnp.asarray(cells[:, 0]); c1 = jnp.asarray(cells[:, 1])
    c2 = jnp.asarray(cells[:, 2]); bnd = jnp.asarray(~interior)
    t0 = time.time()
    x, y, c0, c1, c2, bnd = uniform_refine_device(x, y, c0, c1, c2, bnd,
                                                  LEVELS)
    nd = x.shape[0]
    order, rank = strip_order(x, y, POP)
    x, y, bnd = x[order], y[order], bnd[order]
    c0, c1, c2 = rank[c0], rank[c1], rank[c2]
    jax.block_until_ready(c2)
    print(f"mesh: {nd} dofs, {time.time()-t0:.1f} s", flush=True)

    MAXDEG, MAXC = 24, 14
    t0 = time.time()
    op64, over = jax.jit(
        lambda *a: MatrixFreeSoA.build(*a, nd, MAXDEG)
    )(x, y, c0, c1, c2)
    E64, overe = ell_from_op_blocked(op64, MAXC, blocks=8)
    assert not bool(overe)
    del op64
    E32 = jax.jit(lambda E_: E_.astype(jnp.float32))(E64)
    i_r = jnp.arange(nd, dtype=jnp.int32)
    bw = int(jax.jit(
        lambda c_: jnp.max(jnp.abs(c_ - i_r[None, :])))(E32.cols))
    print(f"ell: {time.time()-t0:.1f} s, bw={bw}", flush=True)

    t0 = time.time()
    lane = LaneRoutedELL.from_ell(E32, bandwidth=bw)
    print(f"lane setup {time.time()-t0:.1f} s p_max={lane.p_max} "
          f"rem={lane.n_remainder} ({lane.n_remainder/(MAXC*nd):.4%})",
          flush=True)

    rhs32 = jax.jit(lambda b_: jnp.where(b_, 0.0, 1.0)
                    .astype(jnp.float32) / nd)(bnd)
    from fdapde_core_tpu.linear_algebra.solvers import cg_chunked
    sys_l = DirichletSystem(lane, bnd)
    ITERS = 20
    cg_chunked(sys_l, rhs32, rtol=0.0, maxiter=ITERS, chunk=10)
    t0 = time.time()
    cg_chunked(sys_l, rhs32, rtol=0.0, maxiter=ITERS, chunk=10)
    print(f"lane CG {ITERS/(time.time()-t0):.1f} iters/s", flush=True)

    t0 = time.time()
    diag32 = jax.jit(
        lambda E_, b_: DirichletSystem(E_, b_).diagonal()
    )(E32, bnd)
    from fdapde_core_tpu.ops.lane_aux import lane_friendly_grid_n

    aux = AuxGridPreconditioner.build_device(
        (x, y), diag32, grid_n=lane_friendly_grid_n(nd))
    float(aux.dinv[0])
    print(f"aux build {time.time()-t0:.1f} s grid_n={aux.n_grid}",
          flush=True)

    t0 = time.time()
    la = LaneAuxGrid.from_aux(aux)
    print(f"lane-aux build {time.time()-t0:.1f} s  "
          f"P: p_max={la.P.p_max} rem={la.P.n_remainder}  "
          f"PT: p_max={la.PT.p_max} rem={la.PT.n_remainder}", flush=True)

    # single-apply comparison (10 reps each, scalar-witness timing)
    r32 = rhs32

    @jax.jit
    def xla_apply(aux, r, eps):
        def body(k, acc):
            z = aux(r + eps * k.astype(jnp.float32))
            return acc + z[12345] * 1e-30
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    float(xla_apply(aux, r32, jnp.float32(1e-30)))
    t0 = time.time()
    float(xla_apply(aux, r32, jnp.float32(1e-30)))
    print(f"XLA aux apply {(time.time()-t0)*100:.1f} ms", flush=True)

    stages = la.split_stages
    progs = [jax.jit(lambda S, v, r: S(v, r)) for _ in range(3)]

    def lane_apply(r):
        v = r
        for S, pr in zip(stages, progs):
            v = pr(S, v, r)
        return v

    z = lane_apply(r32); float(z[0])
    t0 = time.time()
    for _ in range(10):
        z = lane_apply(r32)
    float(z[0])
    print(f"lane aux apply {(time.time()-t0)*100:.1f} ms", flush=True)

    rhs64 = jax.jit(lambda b_: jnp.where(b_, 0.0, 1.0)
                    .astype(jnp.float64) / nd)(bnd)
    for tag in ("cold", "warm"):
        t0 = time.time()
        xs, its, rel = _lane_refined_solve(
            E64, lane, bnd, la, rhs64, None, 1e-8, 400, 16)
        print(f"lane-aux converged ({tag}): {time.time()-t0:.1f} s "
              f"iters={int(its)} rel={float(rel):.2e}", flush=True)


if __name__ == "__main__":
    main()
