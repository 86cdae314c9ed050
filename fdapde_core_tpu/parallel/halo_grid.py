"""Row-sharded halo CG over 2D-grid stencil (GridDIA) operators.

The distributed counterpart of the single-chip fast path (ops/grid_dia.py):
the (mx, my) dof grid is split into contiguous ROW blocks, one per device;
a stencil SpMV needs the neighbors' edge rows (halo height = max |di|,
typically 1), exchanged with `ppermute`; column shifts stay device-local.
Dirichlet handling uses the pre-masked operator (`GridDIAMatrix.with_dirichlet`),
so the CG body is stencil + axpys + psum'd dots only.

Per-iteration comm: two (H, my) row strips — the cheapest halo this problem
admits (vs the flat-DIA halo of width max-offset ~ my in parallel/halo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["HaloGridDIASolver"]


class HaloGridDIASolver:
    """Distributed Jacobi-CG for a (pre-masked) GridDIAMatrix."""

    def __init__(self, G, free_flat, device_mesh: Mesh):
        self.offsets2d = G.offsets2d
        self.H = max(abs(di) for di, _ in self.offsets2d)
        self.Hc = max(abs(dj) for _, dj in self.offsets2d)
        self.device_mesh = device_mesh
        self.nshards = device_mesh.devices.size
        mx, my = G.shape2d
        self.mx, self.my = mx, my
        self.rows_block = -(-mx // self.nshards)
        self.mx_pad = self.rows_block * self.nshards
        assert self.H <= self.rows_block, "halo rows exceed the row block"

        Gm = G.with_dirichlet(free_flat)
        pad_rows = self.mx_pad - mx
        data = jnp.pad(Gm.data, ((0, 0), (0, pad_rows), (0, 0)))
        freeg = jnp.pad(
            jnp.asarray(free_flat, data.dtype).reshape(mx, my),
            ((0, pad_rows), (0, 0)),
        )
        sh = NamedSharding(device_mesh, P(None, "shard", None))
        self.data = jax.device_put(data, sh)
        self.free = jax.device_put(
            freeg, NamedSharding(device_mesh, P("shard", None))
        )
        diag = data[self.offsets2d.index((0, 0))] * freeg + (1 - freeg)
        self.inv_diag = jax.device_put(
            jnp.where(jnp.abs(diag) > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 1.0),
            NamedSharding(device_mesh, P("shard", None)),
        )
        self._solve_jit = jax.jit(self._solve, static_argnames=("maxiter",))

    def _solve(self, b, rtol, maxiter):
        H, Hc = self.H, self.Hc
        Rb, my = self.rows_block, self.my
        offsets = self.offsets2d
        nsh = self.nshards
        fwd = [(i, i + 1) for i in range(nsh - 1)]
        bwd = [(i + 1, i) for i in range(nsh - 1)]

        def shard_fn(data, free, inv_diag, b):
            mask = 1 - free

            def Ax(x):
                # exchange halo rows, pad halo columns, accumulate stencil
                up = jax.lax.ppermute(x[-H:, :], "shard", perm=fwd)
                down = jax.lax.ppermute(x[:H, :], "shard", perm=bwd)
                ext = jnp.concatenate([up, x, down], axis=0)
                ext = jnp.pad(ext, ((0, 0), (Hc, Hc)))
                y = jnp.zeros_like(x)
                for k, (di, dj) in enumerate(offsets):
                    y = y + data[k] * jax.lax.dynamic_slice(
                        ext, (H + di, Hc + dj), (Rb, my)
                    )
                return y + x * mask

            def dot(a, c):
                return jax.lax.psum(jnp.vdot(a, c), "shard")

            r0 = b  # x0 = 0; b already reduced for boundary data
            z0 = inv_diag * r0
            tol = rtol * jnp.sqrt(dot(b, b))

            def cond(s):
                x, r, z, p, rz, k = s
                rn = jnp.sqrt(dot(r, r))
                return (rn > tol) & (k < maxiter) & jnp.isfinite(rn)

            def body(s):
                x, r, z, p, rz, k = s
                Ap = Ax(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_diag * r
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, k + 1)

            x, r, *_, k = jax.lax.while_loop(
                cond, body, (jnp.zeros_like(b), r0, z0, z0, dot(r0, z0), 0)
            )
            return x, jnp.sqrt(dot(r, r)), k

        return jax.shard_map(
            shard_fn,
            mesh=self.device_mesh,
            in_specs=(
                P(None, "shard", None),
                P("shard", None),
                P("shard", None),
                P("shard", None),
            ),
            out_specs=(P("shard", None), P(), P()),
        )(self.data, self.free, self.inv_diag, b)

    def solve(self, b_reduced, rtol=1e-10, maxiter=2000):
        """b_reduced: (n,) RHS with boundary data already moved to the RHS
        (DirichletSystem.rhs). Returns (x (n,), residual, iterations)."""
        b = jnp.pad(
            jnp.asarray(b_reduced, self.data.dtype).reshape(self.mx, self.my),
            ((0, self.mx_pad - self.mx), (0, 0)),
        )
        x, res, k = self._solve_jit(b, rtol, maxiter=maxiter)
        return x[: self.mx].reshape(-1), res, k
