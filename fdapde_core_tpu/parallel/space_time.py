"""Time-sharded separable space-time solves: sum_k T_k (x) S_k over a mesh.

SURVEY.md SS5.7: space-time tensor-product problems shard the TIME dimension
independently of space. The dof field u lives as a (n_t, n_s) matrix,
row-sharded over a 1D device mesh; per CG iteration each term T_k (x) S_k
applies as vec(T_k X S_k^T) (kron vec identity, kronecker_product.h:27-80):

- S_k^T along space is local to every shard (S_k replicated; its matvec is
  a batched sparse apply over the shard's own time rows),
- T_k along time is BANDED (spline Gram/penalty matrices have bandwidth
  <= spline order, splines/spline_assembler.h:56-69), so the sharded-axis
  apply needs only an H-row halo from each neighbor, H = max |band offset|
  over terms — two `ppermute` strips per iteration, riding ICI.

CG dot products are psums of shard-local partials. Communication per
iteration: 2 strips x (H * n_s) + 3 scalars — independent of n_t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..linear_algebra.sparse import SparseMatrix

__all__ = ["banded_offsets", "ShardedSpaceTime"]


def banded_offsets(T, tol: float = 0.0):
    """Nonzero (col - row) offsets of a dense/sparse time matrix."""
    Td = T.toarray() if isinstance(T, SparseMatrix) else np.asarray(T)
    n = Td.shape[0]
    offs = [
        d
        for d in range(-(n - 1), n)
        if np.any(np.abs(np.diagonal(Td, offset=d)) > tol)
    ]
    return tuple(offs)


def _to_time_dia(T, offsets, n_pad):
    """(K, n_pad) row-indexed band storage: data[k, i] = T[i, i + off_k]."""
    Td = T.toarray() if isinstance(T, SparseMatrix) else np.asarray(T)
    n = Td.shape[0]
    data = np.zeros((len(offsets), n_pad), dtype=Td.dtype)
    for k, d in enumerate(offsets):
        i0, i1 = max(0, -d), min(n, n - d)
        data[k, i0:i1] = Td[np.arange(i0, i1), np.arange(i0, i1) + d]
    return data


class ShardedSpaceTime:
    """Distributed Jacobi-CG for  sum_k T_k (x) S_k  (time-sharded).

    terms: [(T_k, S_k), ...] — T_k (n_t, n_t) numpy/SparseMatrix banded in
    time, S_k (n_s, n_s) SparseMatrix/dense, replicated on every device.
    Matches models/space_time.SeparableOperator semantics on one device.
    """

    def __init__(self, terms, device_mesh: Mesh):
        self.device_mesh = device_mesh
        self.Pn = device_mesh.devices.size
        T0, S0 = terms[0]
        self.n_t = T0.shape[0]
        self.n_s = S0.shape[0]
        self.block = -(-self.n_t // self.Pn)
        self.n_t_pad = self.block * self.Pn
        self.offsets = []
        datas = []
        self.spaces = []
        for T, S in terms:
            offs = banded_offsets(T)
            self.offsets.append(offs)
            datas.append(_to_time_dia(T, offs, self.n_t_pad))
            self.spaces.append(S)
        self.H = max(
            (max(abs(d) for d in offs) for offs in self.offsets if offs),
            default=1,
        )
        assert self.H <= self.block, (
            f"time band {self.H} exceeds block {self.block}; fewer devices"
        )
        sh = NamedSharding(device_mesh, P(None, "shard"))
        self.datas = [jax.device_put(jnp.asarray(d), sh) for d in datas]
        # diagonal of the full operator, sharded by time rows
        diag = np.zeros((self.n_t_pad, self.n_s))
        for (T, S), offs, data in zip(terms, self.offsets, datas):
            if 0 in offs:
                dT = data[offs.index(0)]
                dS = (
                    np.asarray(S.diagonal())
                    if isinstance(S, SparseMatrix)
                    else np.diagonal(np.asarray(S))
                )
                diag += dT[:, None] * dS[None, :]
        diag[self.n_t :, :] = 1.0  # padded time rows idle at identity
        self.diag = jax.device_put(
            jnp.asarray(diag), NamedSharding(device_mesh, P("shard", None))
        )
        self._solve_jit = jax.jit(self._solve, static_argnames=("maxiter",))

    # -- inner, runs inside shard_map ------------------------------------
    def _matvec(self, datas_loc, X_loc):
        H, block = self.H, self.block
        fwd = [(i, i + 1) for i in range(self.Pn - 1)]
        bwd = [(i + 1, i) for i in range(self.Pn - 1)]
        left = jax.lax.ppermute(X_loc[-H:], "shard", perm=fwd)
        right = jax.lax.ppermute(X_loc[:H], "shard", perm=bwd)
        ext = jnp.concatenate([left, X_loc, right])  # (block + 2H, n_s)
        out = jnp.zeros_like(X_loc)
        for data, offs, S in zip(datas_loc, self.offsets, self.spaces):
            V = (
                (S @ ext.T).T
                if isinstance(S, SparseMatrix)
                else ext @ jnp.asarray(S).T
            )
            for k, d in enumerate(offs):
                out = out + data[k][:, None] * jax.lax.dynamic_slice_in_dim(
                    V, H + d, block
                )
        return out

    def _solve(self, b, rtol, maxiter):
        mesh = self.device_mesh
        n_t, n_s = self.n_t, self.n_s
        b = jnp.asarray(b).reshape(n_t, n_s)
        b = jnp.pad(b, ((0, self.n_t_pad - n_t), (0, 0)))

        def shard_fn(b_loc, diag_loc, *datas_loc):
            inv_diag = 1.0 / diag_loc

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), "shard")

            z0 = inv_diag * b_loc
            rz0 = dot(b_loc, z0)
            tol2 = (rtol * rtol) * rz0

            def cond(s):
                x, r, p, rz, k = s
                return (rz > tol2) & (k < maxiter) & jnp.isfinite(rz)

            def body(s):
                x, r, p, rz, k = s
                Ap = self._matvec(datas_loc, p)
                pAp = dot(p, Ap)
                alpha = jnp.where(
                    pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0
                )
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_diag * r
                rz_new = dot(r, z)
                beta = jnp.where(
                    rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0
                )
                return (x, r, z + beta * p, rz_new, k + 1)

            s0 = (jnp.zeros_like(b_loc), b_loc, z0, rz0, 0)
            x, r, _, rz, k = jax.lax.while_loop(cond, body, s0)
            return x, jnp.sqrt(jnp.abs(rz)), k

        x, res, iters = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("shard", None), P("shard", None))
            + tuple(P(None, "shard") for _ in self.datas),
            out_specs=(P("shard", None), P(), P()),
        )(b, self.diag, *self.datas)
        return x[:n_t].reshape(-1), res, iters

    def solve(self, b, rtol: float = 1e-10, maxiter: int = 20000,
              recovery=True):
        """Returns (x, sqrt(final r.z), iterations).

        Failure recovery (SURVEY §5.3): a non-finite/budget-exhausted
        distributed iteration gets one retry with a 3x iteration budget
        (mirrors parallel/sharded.ShardedPoisson.solve)."""
        x, res, iters = self._solve_jit(b, rtol, maxiter)
        if recovery:
            import math
            import warnings

            resf = float(res)
            if not math.isfinite(resf) or int(iters) >= maxiter:
                warnings.warn(
                    "time-sharded space-time solve stalled "
                    f"(res = {resf:.2e}); escalating with a 3x iteration "
                    "budget",
                    stacklevel=2,
                )
                x, res, iters = self._solve_jit(b, rtol, 3 * maxiter)
        return x, res, iters
