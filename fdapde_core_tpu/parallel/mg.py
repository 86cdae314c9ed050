"""Distributed geometric multigrid: row-sharded V-cycle + halo CG.

The multi-chip counterpart of ops/grid_mg.py. The (m, m) dof grid is split
into contiguous row blocks over a 1D device mesh; every V-cycle ingredient
is communication-light:

- weighted-Jacobi smoothing has NO dot products: one (1, m) halo-row
  ppermute pair per stencil application,
- restriction/prolongation need the same single halo row,
- below `repl_rows` grid rows the hierarchy is REPLICATED: entered by one
  all-gather of the (small) transition-level residual per V-cycle, after
  which every device runs the identical coarse tail locally,
- the outer CG adds two psum'd scalars per iteration.

Row-block alignment across levels: device d owns coarse rows
[d B_{l+1}, (d+1) B_{l+1}) and fine rows [d B_l, (d+1) B_l) with
B_l = 2 B_{l+1} (B even), so coarse row I's fine parent 2I is always local
and the +-1 stencil/transfer rows are exactly the one-row halo. Levels are
padded to P * B_l rows with identity rows (diag 1, zero couplings, zero
rhs): padding is invisible to the real equations and keeps shapes static.

SURVEY.md §5.7-5.8, §7 phase 5: this is the "genuinely new" distributed
component — the reference is single-threaded (multithreading.h is dead
code); on hardware the halos ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.grid_dia import GridDIAMatrix
from ..ops.grid_mg import GridMG, _prolong, _restrict, _stencil

__all__ = ["ShardedGridMG"]

_W = {-1: 0.5, 0: 1.0, 1: 0.5}


def _even_ceil(a: int, b: int) -> int:
    c = -(-a // b)
    return c + (c % 2)


class ShardedGridMG:
    """MG-preconditioned CG for a (Dirichlet-folded) GridDIAMatrix over a
    1D device mesh ("shard" axis)."""

    def __init__(self, G: GridDIAMatrix, device_mesh: Mesh,
                 repl_rows: int = 256, coarse_n: int = 32,
                 omega: float = 0.8, nu: int = 2, coarse_iters: int = 64):
        self.device_mesh = device_mesh
        self.P = device_mesh.devices.size
        self.omega, self.nu = omega, nu
        mg = GridMG.build(G, coarse_n=coarse_n, omega=omega, nu=nu,
                          coarse_iters=coarse_iters)
        assert mg.n_levels >= 2, (
            "grid too small / coarse_n too large to build a hierarchy"
        )
        shapes = mg.shapes
        # transition level: first level small enough to replicate
        T = next((l for l, m in enumerate(shapes) if m <= repl_rows),
                 len(shapes))
        assert T < len(shapes) or shapes[-1] <= repl_rows, (
            "coarsest level larger than repl_rows; raise repl_rows"
        )
        T = min(T, len(shapes) - 1)
        if T == 0:
            T = 1  # keep at least the fine level sharded
        self.T = T
        # row blocks, aligned 2:1 between consecutive sharded levels
        B = [0] * T
        B[T - 1] = max(2, _even_ceil(shapes[T - 1], self.P))
        for l in range(T - 2, -1, -1):
            B[l] = 2 * B[l + 1]
        self.blocks = tuple(B)
        self.shapes = shapes
        self.offsets = mg.offsets
        self.tail = GridMG(mg.datas[T:], mg.offsets[T:], shapes[T:],
                           omega, nu, coarse_iters)

        # pad sharded levels' rows to P*B with identity rows and shard them
        sh3 = NamedSharding(device_mesh, P(None, "shard", None))
        self.datas = []
        for l in range(T):
            data, m = mg.datas[l], shapes[l]
            R = self.P * B[l]
            pad = R - m
            assert pad >= 0, "row block too small for the level"
            data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
            k0 = self.offsets[l].index((0, 0))
            if pad:
                data = data.at[k0, m:, :].set(1.0)
            self.datas.append(jax.device_put(data, sh3))
        # replicated tail data stays as-is (device_put replicated)
        shr = NamedSharding(device_mesh, P())
        self.tail_datas = [jax.device_put(d, shr) for d in self.tail.datas]
        self._solve_jit = jax.jit(self._solve, static_argnames=("maxiter",))

    # -- sharded-level primitives (run inside shard_map) --------------------

    def _halo(self, x, fwd, bwd):
        up = jax.lax.ppermute(x[-1:, :], "shard", perm=fwd)
        down = jax.lax.ppermute(x[:1, :], "shard", perm=bwd)
        return jnp.concatenate([up, x, down], axis=0)

    def _stencil_local(self, data, offs, ext, Bl, m):
        """y over the local (Bl, m) block from the halo-extended (Bl+2, m)."""
        extc = jnp.pad(ext, ((0, 0), (1, 1)))
        acc = None
        for k, (di, dj) in enumerate(offs):
            t = data[k] * jax.lax.slice(
                extc, (1 + di, 1 + dj), (1 + di + Bl, 1 + dj + m)
            )
            acc = t if acc is None else acc + t
        return acc

    def _smooth_local(self, l, x, b, fwd, bwd, datas):
        data, offs = datas[l], self.offsets[l]
        Bl, m = self.blocks[l], self.shapes[l]
        k0 = offs.index((0, 0))
        inv_diag = 1.0 / data[k0]
        for _ in range(self.nu):
            ext = self._halo(x, fwd, bwd)
            x = x + self.omega * inv_diag * (
                b - self._stencil_local(data, offs, ext, Bl, m)
            )
        return x

    def _restrict_local(self, l, r, fwd, bwd):
        """Sharded level l residual -> sharded level l+1 local block."""
        Bl, Bc = self.blocks[l], self.blocks[l + 1]
        mf, mc = self.shapes[l], self.shapes[l + 1]
        ext = jnp.pad(self._halo(r, fwd, bwd), ((0, 0), (1, 1)))
        acc = None
        for a in (-1, 0, 1):
            for bcol in (-1, 0, 1):
                t = _W[a] * _W[bcol] * jax.lax.slice(
                    ext,
                    (1 + a, 1 + bcol),
                    (1 + a + 2 * (Bc - 1) + 1, 1 + bcol + 2 * (mc - 1) + 1),
                    (2, 2),
                )
                acc = t if acc is None else acc + t
        return acc

    def _prolong_local(self, l, e_c, fwd, bwd):
        """Sharded level l+1 correction -> sharded level l local block.

        Upsampled frame u has nonzeros only at even global rows; the local
        frame needs u at global rows [d*Bl - 1, (d+1)*Bl]: row d*Bl - 1 is
        odd (Bl even) => zero; row (d+1)*Bl is the RIGHT neighbor's first
        coarse row — one halo row of e_c."""
        Bl, Bc = self.blocks[l], self.blocks[l + 1]
        mf, mc = self.shapes[l], self.shapes[l + 1]
        nxt = jax.lax.ppermute(e_c[:1, :], "shard", perm=bwd)
        # u_ext rows: 1 + local fine row; u_ext[1 + 2I] = e_c[I]
        u = jnp.zeros((Bl + 2, mc), e_c.dtype)
        u = u.at[1:2 * (Bc - 1) + 2:2, :].set(e_c)
        u = u.at[Bl + 1, :].set(nxt[0])
        # columns: upsample to fine width then 1D conv; rows already framed
        uc = jnp.zeros((Bl + 2, mf + 2), e_c.dtype)
        uc = uc.at[:, 1:2 * (mc - 1) + 2:2].set(u)
        acc = None
        for a in (-1, 0, 1):
            for bcol in (-1, 0, 1):
                t = _W[a] * _W[bcol] * jax.lax.slice(
                    uc, (1 + a, 1 + bcol), (1 + a + Bl, 1 + bcol + mf)
                )
                acc = t if acc is None else acc + t
        return acc

    # -- V-cycle (inside shard_map) -----------------------------------------

    def _v_sharded(self, l, b, fwd, bwd, datas, tail_datas):
        T = self.T
        data, offs = datas[l], self.offsets[l]
        Bl, m = self.blocks[l], self.shapes[l]
        x = self._smooth_local(l, jnp.zeros_like(b), b, fwd, bwd, datas)
        ext = self._halo(x, fwd, bwd)
        r = b - self._stencil_local(data, offs, ext, Bl, m)
        if l + 1 < T:
            rc = self._restrict_local(l, r, fwd, bwd)
            ec = self._v_sharded(l + 1, rc, fwd, bwd, datas, tail_datas)
            x = x + self._prolong_local(l, ec, fwd, bwd)
        else:
            # transition: gather the full fine residual, run the replicated
            # tail identically on every device, slice the local prolongation
            r_full = jax.lax.all_gather(r, "shard", axis=0, tiled=True)
            r_real = r_full[:m, :]
            tail = GridMG(list(tail_datas), self.tail.offsets,
                          self.tail.shapes, self.omega, self.nu,
                          self.tail.coarse_iters)
            e_T = tail._v(0, _restrict(r_real, self.shapes[T]))
            e_fine = _prolong(e_T, m)  # full (m, m) — small at this level
            e_pad = jnp.pad(e_fine, ((0, self.P * Bl - m), (0, 0)))
            d = jax.lax.axis_index("shard")
            x = x + jax.lax.dynamic_slice(
                e_pad, (d * Bl, jnp.zeros((), d.dtype)), (Bl, m)
            )
        return self._smooth_local(l, x, b, fwd, bwd, datas)

    # -- outer CG -------------------------------------------------------------

    def _solve(self, b, rtol, maxiter):
        nsh = self.P
        fwd = [(i, i + 1) for i in range(nsh - 1)]
        bwd = [(i + 1, i) for i in range(nsh - 1)]
        B0, m = self.blocks[0], self.shapes[0]
        offs0 = self.offsets[0]

        def shard_fn(b, *datas_all):
            datas = datas_all[: self.T]
            tail_datas = datas_all[self.T:]

            def Ax(x):
                ext = self._halo(x, fwd, bwd)
                return self._stencil_local(datas[0], offs0, ext, B0, m)

            def Minv(r):
                return self._v_sharded(0, r, fwd, bwd, datas, tail_datas)

            def dot(a, c):
                return jax.lax.psum(jnp.sum(a * c), "shard")

            bn2 = dot(b, b)
            tol2 = (rtol * rtol) * bn2
            z0 = Minv(b)
            rz0 = dot(b, z0)

            def cond(s):
                x, r, p, rz, rr, k = s
                return (rr > tol2) & (k < maxiter) & jnp.isfinite(rr)

            def body(s):
                x, r, p, rz, rr, k = s
                Ap = Ax(p)
                pAp = dot(p, Ap)
                alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = Minv(r)
                rz_new = dot(r, z)
                beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
                return (x, r, z + beta * p, rz_new, dot(r, r), k + 1)

            s = (jnp.zeros_like(b), b, z0, rz0, bn2, 0)
            x, r, p, rz, rr, k = jax.lax.while_loop(cond, body, s)
            return x, jnp.sqrt(rr / bn2), k

        in_specs = (P("shard", None),) + (P(None, "shard", None),) * self.T \
            + (P(),) * len(self.tail_datas)
        return jax.shard_map(
            shard_fn,
            mesh=self.device_mesh,
            in_specs=in_specs,
            out_specs=(P("shard", None), P(), P()),
        )(b, *self.datas, *self.tail_datas)

    def solve(self, b, rtol: float = 1e-8, maxiter: int = 60):
        """b: (n,) RHS (boundary values on pinned dofs / reduced rhs).
        Returns (x (n,), rel_residual_estimate, iterations)."""
        m = self.shapes[0]
        R = self.P * self.blocks[0]
        b2 = jnp.pad(
            jnp.asarray(b, self.datas[0].dtype).reshape(m, m),
            ((0, R - m), (0, 0)),
        )
        x, rel, k = self._solve_jit(b2, rtol, maxiter=maxiter)
        return x[:m].reshape(-1), rel, k
