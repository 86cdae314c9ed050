"""Distributed scattered-topology CG: per-shard lane-routed SpMV.

`HaloELLSolver` (halo_ell.py) shards the general assembled-ELL path, but
its per-shard SpMV is K XLA gathers — ~0.13 G gathered elem/s per chip
regardless of locality (BENCH_NOTES round 4), i.e. the exact rate the
lane-routed pallas kernel (ops/pallas_gather_spmv.py) was built to
replace. This solver fuses the two designs:

- dof rows are split into contiguous blocks (one per device) with
  H-wide ppermute halo strips, exactly like HaloELLSolver;
- each shard's local (block, block + 2H) operator is EMBEDDED as a
  square operator of size n_loc = block + 2H whose rows [H, H + block)
  carry the shard's entries at halo-local column indices — its
  bandwidth is exactly the global bandwidth H, so the lane kernel's
  static 3-tile window applies per shard unchanged;
- one routing schedule is built per shard (same shapes for every shard:
  one compile, P executions), tables are stacked on a leading shard
  axis and fed to the in-shard pallas SpMV through `shard_map`;
- the preconditioner is either per-shard Jacobi or a DISTRIBUTED
  aux-grid apply (ops/auxgrid.py): each shard restricts its local
  residual onto the replicated auxiliary grid, one `psum` assembles the
  full grid residual, the structured V-cycle runs replicated (static
  slices — no gathers), and each shard prolongates back its local rows.
  One grid-sized all-reduce per CG iteration, h-independent counts.

Reference anchor: the multi-chip replacement for Eigen SparseLU on
ARBITRARY (scattered-numbering) meshes — fem_linear_elliptic_solver.h:
38-47; the reference has no distributed story (SURVEY §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matfree_soa import ELLSoA
from ..ops.pallas_gather_spmv import (TILE, C_CHUNKS, LaneRoutedELL,
                                      _pc_tuple, _spmv)

__all__ = ["HaloLaneSolver"]


class HaloLaneSolver:
    """Distributed preconditioned CG over per-shard lane-routed tables.

    E: ops/matfree_soa.ELLSoA (vals/cols (K, n); padded entries carry
    col = row, val = 0), bandwidth H <= min(block, TILE) after RCM.
    aux: optional AuxGridPreconditioner built for THIS dof numbering
    (ops/auxgrid.py) — applied distributed via one psum per iteration;
    None = per-shard Jacobi. Dirichlet dofs are pinned by masking
    (free_mask), the fem.solvers.DirichletSystem convention.
    """

    def __init__(self, E: ELLSoA, device_mesh: Mesh, aux=None,
                 p_max: int | None = None, rounds: int = 16):
        self.device_mesh = device_mesh
        self.P = device_mesh.devices.size
        K, n = E.vals.shape
        self.n = n
        self.K = K
        self.block = block = -(-n // self.P)
        self.n_pad = self.block * self.P
        self.dtype = E.vals.dtype
        self.aux = aux

        H = int(
            jax.jit(
                lambda cols: jnp.max(
                    jnp.abs(cols - jnp.arange(n, dtype=cols.dtype)[None, :])
                )
            )(E.cols)
        )
        self.H = H = max(int(H), 1)
        if H > block:
            raise ValueError(
                f"bandwidth {H} exceeds block size {block}; RCM-reorder "
                "(parallel/reorder.py) or use fewer devices"
            )
        if H > TILE:
            raise ValueError(
                f"bandwidth {H} exceeds the lane kernel's {TILE} static "
                "halo — re-order the dofs or use HaloELLSolver"
            )
        n_loc = block + 2 * H
        pad = self.n_pad - n

        @jax.jit
        def pad_global(vals, cols):
            rows_pad = jnp.arange(n, n + pad, dtype=cols.dtype)
            vals_p = jnp.pad(vals, ((0, 0), (0, pad)))
            cols_p = jnp.concatenate(
                [cols, jnp.broadcast_to(rows_pad, (K, pad))], axis=1
            )
            rows = jnp.arange(n + pad, dtype=cols.dtype)[None, :]
            diag = jnp.where(cols_p == rows, vals_p, 0.0).sum(axis=0)
            return vals_p, cols_p, diag

        vals_p, cols_p, diag = pad_global(E.vals, E.cols)

        @jax.jit
        def shard_square_ell(vals_p, cols_p, p):
            """Square halo-local embedding of shard p's row block."""
            start = p * block
            z = jnp.zeros((), start.dtype)
            v = jax.lax.dynamic_slice(vals_p, (z, start), (K, block))
            c = jax.lax.dynamic_slice(cols_p, (z, start), (K, block))
            c = (c - start + H).astype(jnp.int32)
            i_loc = jnp.arange(n_loc, dtype=jnp.int32)
            vals_sq = jnp.zeros((K, n_loc), vals_p.dtype)
            vals_sq = vals_sq.at[:, H:H + block].set(v)
            cols_sq = jnp.broadcast_to(i_loc, (K, n_loc))
            cols_sq = cols_sq.at[:, H:H + block].set(
                jnp.clip(c, 0, n_loc - 1))
            return vals_sq, cols_sq

        # one schedule per shard — identical shapes, so the scheduler's
        # four programs compile once and execute P times
        lanes = []
        for p in range(self.P):
            vs, cs = shard_square_ell(vals_p, cols_p, jnp.int32(p))
            lanes.append(LaneRoutedELL.from_ell(
                ELLSoA(vs, cs, (n_loc, n_loc)), p_max=p_max,
                rounds=rounds, bandwidth=H))
        self.p_max = lanes[0].p_max
        if any(ln.p_max != self.p_max for ln in lanes):
            # auto-derivation is bandwidth-driven (same H): cannot differ
            raise AssertionError("per-shard p_max mismatch")
        Lr = max(ln.rem[0].shape[0] for ln in lanes)
        self.n_remainder = sum(ln.n_remainder for ln in lanes)

        def pad_rem(ln):
            rr, rc, rv = ln.rem
            padr = Lr - rr.shape[0]
            # rem rows are SQUARE-embedding indices in [H, H + block):
            # rebase to local block rows; padding entries carry val 0 and
            # an out-of-bounds row (dropped by the scatter-add)
            return (jnp.pad(rr - H, (0, padr), constant_values=block),
                    jnp.pad(rc, (0, padr)),
                    jnp.pad(rv, (0, padr)))

        shard_t = NamedSharding(device_mesh, P("shard"))
        self.L1 = jax.device_put(
            jnp.stack([ln.L1 for ln in lanes]), shard_t)
        self.L2M = jax.device_put(
            jnp.stack([ln.L2M for ln in lanes]), shard_t)
        self.VALS = jax.device_put(
            jnp.stack([ln.VALS for ln in lanes]), shard_t)
        rems = [pad_rem(ln) for ln in lanes]
        self.rem = tuple(
            jax.device_put(jnp.stack([r[j] for r in rems]), shard_t)
            for j in range(3)
        )
        del lanes
        self.n_loc = n_loc
        shard1 = NamedSharding(device_mesh, P("shard"))
        self.diag = jax.device_put(diag, shard1)
        self.aux_parts = None
        if aux is not None:
            # pad the per-dof interpolation table to n_pad and shard it;
            # the grid hierarchy stays replicated (every shard runs the
            # same structured V-cycle)
            shard2 = NamedSharding(device_mesh, P(None, "shard"))
            self.aux_parts = (
                jax.device_put(jnp.pad(aux.idx, ((0, 0), (0, pad))),
                               shard2),
                jax.device_put(jnp.pad(aux.w, ((0, 0), (0, pad))),
                               shard2),
                jax.device_put(
                    jnp.pad(aux.dinv, (0, pad), constant_values=1.0),
                    shard1),
                aux.mg,
            )
            self._aux_omega = float(aux.omega)
            self._aux_mm = (aux.n_grid + 1) ** 2
        self._solve_jit = jax.jit(self._solve, static_argnames=("maxiter",))

    def _pad(self, v):
        return jnp.pad(jnp.asarray(v, self.dtype), (0, self.n_pad - self.n))

    def _solve(self, L1, L2M, VALS, rem, diag, aux, b, free, rtol,
               maxiter):
        mesh = self.device_mesh
        H, block, n_loc = self.H, self.block, self.n_loc
        nshards = self.P
        SP = sum(_pc_tuple(self.p_max))
        p_max = self.p_max
        fwd = [(i, i + 1) for i in range(nshards - 1)]
        bwd = [(i + 1, i) for i in range(nshards - 1)]
        has_aux = aux is not None

        def shard_fn(L1, L2M, VALS, rem, diag, aux, b, free):
            L1, L2M, VALS = L1[0], L2M[0], VALS[0]
            rrows, rcols, rvals = rem[0][0], rem[1][0], rem[2][0]

            def halo_extend(x):
                left = jax.lax.ppermute(x[-H:], "shard", perm=fwd)
                right = jax.lax.ppermute(x[:H], "shard", perm=bwd)
                return jnp.concatenate([left, x, right])

            def Ax(x):
                xf = x * free
                ext = halo_extend(xf)
                y = _spmv(ext, L1, L2M, VALS, n_loc, SP, p_max)[
                    H:H + block]
                y = y.at[rrows].add(
                    (rvals * ext[rcols]).astype(y.dtype), mode="drop")
                return y * free + x * (1 - free)

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), "shard")

            inv_diag = jnp.where(
                jnp.abs(diag) > 0, 1.0 / jnp.where(diag == 0, 1.0, diag),
                1.0,
            ) * free + (1 - free)

            if has_aux:
                idx_l, w_l, dinv_l, mg = aux
                mm = self._aux_mm
                omega = self._aux_omega

                def pre(r):
                    part = jax.ops.segment_sum(
                        (w_l * r[None, :].astype(w_l.dtype)).reshape(-1),
                        idx_l.reshape(-1), mm)
                    rc = jax.lax.psum(part, "shard")
                    z_g = mg.v_cycle(rc)
                    z = (z_g[idx_l] * w_l).sum(axis=0)
                    return (omega * dinv_l * r.astype(w_l.dtype)
                            + z).astype(r.dtype) * free
            else:

                def pre(r):
                    return inv_diag * r

            bnorm = jnp.sqrt(dot(b, b))
            tol = rtol * bnorm
            r0 = b  # x0 = 0
            z0 = pre(r0)
            rz0 = dot(r0, z0)

            def cond(state):
                x, r, z, p, rz, k = state
                rn = jnp.sqrt(dot(r, r))
                return (rn > tol) & (k < maxiter) & jnp.isfinite(rn)

            def body(state):
                x, r, z, p, rz, k = state
                Ap = Ax(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = pre(r)
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, k + 1)

            x, r, *_, k = jax.lax.while_loop(
                cond, body, (jnp.zeros_like(b), r0, z0, z0, rz0, 0)
            )
            return x, jnp.sqrt(dot(r, r)), k, bnorm

        aux_spec = None
        if has_aux:
            # idx/w/dinv are per-dof (sharded); the grid hierarchy is
            # replicated (its V-cycle is identical on every shard)
            aux_spec = (P(None, "shard"), P(None, "shard"), P("shard"),
                        jax.tree_util.tree_map(lambda _: P(), aux[3]))
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            # the in-shard pallas_call's out_shape carries no vma info:
            # disable the varying-mesh-axes check for this region
            check_vma=False,
            in_specs=(P("shard"), P("shard"), P("shard"),
                      (P("shard"), P("shard"), P("shard")),
                      P("shard"), aux_spec, P("shard"), P("shard")),
            out_specs=(P("shard"), P(), P(), P()),
        )(L1, L2M, VALS, rem, diag, aux, b, free)

    def solve(self, b, free_mask, rtol=1e-10, maxiter=1000):
        """Solve A x = b with Dirichlet dofs pinned where free_mask == 0.

        b must already carry boundary values at pinned dofs (see
        fem/solvers.py DirichletSystem.rhs). Returns (x[:n], ||r||, k).
        """
        b = self._pad(b)
        free = self._pad(jnp.asarray(free_mask, self.dtype))
        x, res, k, _ = self._solve_jit(
            self.L1, self.L2M, self.VALS, self.rem, self.diag,
            self.aux_parts, b, free, rtol, maxiter=maxiter)
        return x[: self.n], res, k
