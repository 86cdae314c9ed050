"""Halo-exchange distributed CG over assembled ELL (general-mesh) operators.

This shards the GENERAL gather path (ops/matfree_soa.ELLSoA — arbitrary
topology, opaque index arrays) the same way halo.py shards the structured
DIA path: dof rows are split into contiguous blocks, one per device. For a
BANDED matrix (any FEM matrix after RCM reordering, parallel/reorder.py)
every nonzero of a row owned by device p lies within H = bandwidth of the
row index, so each SpMV needs only the two H-wide edge strips of the
neighbouring blocks — exchanged with `jax.lax.ppermute` (ICI hops on real
hardware), never a full-vector collective. Columns are rebased to
halo-local indices at setup, so the inner loop is K gathers into the
halo-extended local block plus psum'd dot products.

This closes the round-2 gap "the flagship general path (matfree/ELL +
aux-grid) is single-chip only": the device-scale arbitrary-topology
operator now weak-scales with O(n/P + H) memory per device.

Reference anchor: the multi-chip replacement for Eigen SparseLU on
arbitrary meshes (fem_linear_elliptic_solver.h:38-47); the reference has
no distributed story (SURVEY §2.9 multithreading is dead upstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["HaloELLSolver"]


class HaloELLSolver:
    """Distributed Jacobi-CG for an ELLSoA operator over a 1D device mesh.

    E: ops/matfree_soa.ELLSoA (vals/cols (K, n); padded entries carry
    col = row, val = 0). The matrix must be banded with bandwidth
    H <= n/P — run parallel/reorder.rcm first for imported meshes.
    Dirichlet dofs are pinned by masking (free_mask), same convention as
    HaloDIASolver / fem.solvers.DirichletSystem.
    """

    def __init__(self, E, device_mesh: Mesh):
        self.device_mesh = device_mesh
        self.P = device_mesh.devices.size
        K, n = E.vals.shape
        self.n = n
        self.K = K
        self.block = -(-n // self.P)
        self.n_pad = self.block * self.P
        self.dtype = E.vals.dtype

        H = int(
            jax.jit(
                lambda cols: jnp.max(
                    jnp.abs(
                        cols.astype(jnp.int64)
                        - jnp.arange(n, dtype=jnp.int64)[None, :]
                    )
                )
            )(E.cols)
        )
        self.H = H = max(H, 1)
        if H > self.block:
            raise ValueError(
                f"bandwidth {H} exceeds block size {self.block}; RCM-"
                "reorder the dofs (parallel/reorder.py) or use fewer devices"
            )

        block = self.block
        pad = self.n_pad - n

        @jax.jit
        def prepare(vals, cols):
            # pad rows: identity convention (col = row, val = 0 off-diag)
            rows_pad = jnp.arange(n, n + pad, dtype=cols.dtype)
            vals_p = jnp.pad(vals, ((0, 0), (0, pad)))
            cols_p = jnp.concatenate(
                [cols, jnp.broadcast_to(rows_pad, (K, pad))], axis=1
            )
            rows = jnp.arange(n + pad, dtype=cols.dtype)[None, :]
            # halo-local column index within [0, block + 2H)
            lcols = cols_p - (rows // block) * block + H
            lcols = jnp.clip(lcols, 0, block + 2 * H - 1)
            # Jacobi diagonal (free-dof masking happens in the solve)
            diag = jnp.where(cols_p == rows, vals_p, 0.0).sum(axis=0)
            return vals_p, lcols.astype(jnp.int32), diag

        vals_p, lcols, diag = prepare(E.vals, E.cols)
        shard2 = NamedSharding(device_mesh, P(None, "shard"))
        shard1 = NamedSharding(device_mesh, P("shard"))
        self.vals = jax.device_put(vals_p, shard2)
        self.lcols = jax.device_put(lcols, shard2)
        self.diag = jax.device_put(diag, shard1)
        self._solve_jit = jax.jit(self._solve, static_argnames=("maxiter",))

    def _pad(self, v):
        return jnp.pad(jnp.asarray(v, self.dtype), (0, self.n_pad - self.n))

    def _solve(self, b, free, rtol, maxiter):
        mesh = self.device_mesh
        H = self.H
        K = self.K
        nshards = self.P
        fwd = [(i, i + 1) for i in range(nshards - 1)]
        bwd = [(i + 1, i) for i in range(nshards - 1)]

        def shard_fn(vals, lcols, diag, b, free):
            def halo_extend(x):
                left = jax.lax.ppermute(x[-H:], "shard", perm=fwd)
                right = jax.lax.ppermute(x[:H], "shard", perm=bwd)
                return jnp.concatenate([left, x, right])

            def Ax(x):
                xf = x * free
                ext = halo_extend(xf)
                y = jnp.zeros_like(x)
                for k in range(K):
                    y = y + vals[k] * ext[lcols[k]]
                return y * free + x * (1 - free)

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), "shard")

            inv_diag = jnp.where(
                jnp.abs(diag) > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 1.0
            ) * free + (1 - free)

            bnorm = jnp.sqrt(dot(b, b))
            tol = rtol * bnorm
            r0 = b  # x0 = 0
            z0 = inv_diag * r0
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
                z = inv_diag * r
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, k + 1)

            x, r, *_, k = jax.lax.while_loop(
                cond, body, (jnp.zeros_like(b), r0, z0, z0, rz0, 0)
            )
            return x, jnp.sqrt(dot(r, r)), k, bnorm

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(None, "shard"), P(None, "shard"), P("shard"),
                      P("shard"), P("shard")),
            out_specs=(P("shard"), P(), P(), P()),
        )(self.vals, self.lcols, self.diag, b, free)

    def solve(self, b, free_mask, rtol=1e-10, maxiter=1000, recovery=True):
        """Solve A x = b with Dirichlet dofs pinned where free_mask == 0.

        b must already carry boundary values at pinned dofs (see
        fem/solvers.py DirichletSystem.rhs). Returns (x[:n], ||r||, iters).
        Failure recovery: see parallel/halo._maybe_escalate (f32 -> f64
        recast, else 3x iteration budget; one retry).
        """
        from .halo import _maybe_escalate

        b = self._pad(b)
        free = self._pad(jnp.asarray(free_mask, self.dtype))
        x, res, k, bnorm = self._solve_jit(b, free, rtol, maxiter=maxiter)
        if recovery:
            x, res, k = _maybe_escalate(
                self, ("vals", "diag"), (b, free), x, res, k, bnorm, rtol,
                maxiter,
            )
        return x[: self.n], res, k
