"""Geometric multigrid on 2D grid stencils: Galerkin coarsening + V-cycle.

Why: Jacobi-CG iteration counts grow like sqrt(kappa) ~ O(1/h) — ~15k
iterations at 10M dofs (kappa ~ 4e6) — and f32's attainable true residual
is O(eps32 * kappa) ~ 0.2 relative. A multigrid V-cycle preconditioner makes
the preconditioned condition number O(1): tens of iterations at any size.
Every MG ingredient is static strided slices + elementwise — memory-bound
TPU-friendly work, with per-level cost falling 4x per level.

Components (all dtype-generic, jittable; level shapes are static):

- Galerkin coarse operators  A_c = P^T A_f P  computed directly on the
  stencil layers (no rediscretization callback, so variable coefficients
  and folded Dirichlet boundaries coarsen correctly automatically),
- bilinear prolongation P / full-weighting restriction P^T over the node
  grid (coarse node (I, J) = fine node (2I, 2J)),
- weighted-Jacobi smoothing (symmetric pre/post => the V-cycle is an SPD
  preconditioner, valid inside CG),
- fixed unpreconditioned CG at the coarsest level.

Requires m_fine = 2^k * m_coarse... more precisely each level needs an odd
node count m = n+1 with n even (cells halve); coarsening stops when n goes
odd or n <= coarse_n.

Reference anchor: replaces Eigen SparseLU (fem_linear_elliptic_solver.h:34-50)
as the *convergent* large-scale solve (see ops/grid_cg.py for the raw
iteration engine; BENCH_NOTES.md for measurements).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_dia import GridDIAMatrix

__all__ = ["GridMG", "mg_preconditioned_cg", "galerkin_coarsen"]

_W = {-1: 0.5, 0: 1.0, 1: 0.5}  # bilinear interpolation weights


def _sampled(layer_padded, a: int, b: int, mc: int):
    """layer_padded[(1+2I+a, 1+2J+b)] for coarse (I, J) in [0, mc)^2."""
    return jax.lax.slice(
        layer_padded, (1 + a, 1 + b), (1 + a + 2 * (mc - 1) + 1, 1 + b + 2 * (mc - 1) + 1),
        (2, 2),
    )


def galerkin_coarsen(G: GridDIAMatrix) -> GridDIAMatrix:
    """A_c = P^T A_f P on an (m, m) grid, m odd, coarse mc = (m+1)//2.

    Fine offsets must satisfy |di|, |dj| <= 1 (true for P1 tensor-product
    stencils and for their own Galerkin coarsenings, which stay 9-point).
    """
    m = G.shape2d[0]
    assert G.shape2d[0] == G.shape2d[1], "square grids only"
    assert m % 2 == 1, "node count must be odd (cell count even)"
    mc = (m + 1) // 2
    assert all(abs(a) <= 1 and abs(b) <= 1 for a, b in G.offsets2d)
    fine = {o: jnp.pad(G.data[k], 1) for k, o in enumerate(G.offsets2d)}
    dtype = G.data.dtype

    coarse_offsets = tuple(
        (dI, dJ) for dI in (-1, 0, 1) for dJ in (-1, 0, 1)
    )
    layers = {}
    for (dI, dJ) in coarse_offsets:
        acc = jnp.zeros((mc, mc), dtype)
        for a in (-1, 0, 1):
            for b in (-1, 0, 1):
                for (di, dj), lay in fine.items():
                    ap = a + di - 2 * dI
                    bp = b + dj - 2 * dJ
                    if ap in _W and bp in _W:
                        w = _W[a] * _W[b] * _W[ap] * _W[bp]
                        acc = acc + w * _sampled(lay, a, b, mc)
                        # fine row (2I+a, 2J+b) may fall outside the fine
                        # grid; the zero padding kills those terms
        layers[(dI, dJ)] = acc
    data = jnp.stack([layers[o] for o in coarse_offsets])
    return GridDIAMatrix(data, coarse_offsets, (mc, mc))


def _stencil(data, offsets2d, x, m):
    # data layers cast up to the vector dtype: with bf16 storage the
    # convert fuses into the multiply (measured free in ops/grid_cg.py)
    xp = jnp.pad(x, 1)
    acc = None
    for k, (di, dj) in enumerate(offsets2d):
        t = data[k].astype(x.dtype) * jax.lax.slice(
            xp, (1 + di, 1 + dj), (1 + di + m, 1 + dj + m)
        )
        acc = t if acc is None else acc + t
    return acc


def _restrict(r, mc):
    """Full weighting r_c = P^T r_f (coarse (I,J) <- fine (2I, 2J))."""
    rp = jnp.pad(r, 1)
    acc = None
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            t = _W[a] * _W[b] * _sampled(rp, a, b, mc)
            acc = t if acc is None else acc + t
    return acc


def _prolong(e, m):
    """Bilinear e_f = P e_c onto the (m, m) fine grid."""
    mc = e.shape[0]
    up = jnp.zeros((m + 2, m + 2), e.dtype)
    up = up.at[1:2 * (mc - 1) + 2:2, 1:2 * (mc - 1) + 2:2].set(e)
    acc = None
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            t = _W[a] * _W[b] * jax.lax.slice(
                up, (1 + a, 1 + b), (1 + a + m, 1 + b + m)
            )
            acc = t if acc is None else acc + t
    return acc


@jax.tree_util.register_pytree_node_class
class GridMG:
    """V-cycle hierarchy over a GridDIAMatrix (boundary treatment folded).

    Usage: mg = GridMG.build(G); z = mg.v_cycle(r)  — an SPD operation
    approximating A^{-1} r (use as CG preconditioner or stand-alone by
    iterating x += v_cycle(b - A x)).
    """

    def __init__(self, datas, offsets, shapes, omega, nu, coarse_iters):
        self.datas = datas  # list of (K_l, m_l, m_l)
        self.offsets = offsets  # tuple of offset tuples
        self.shapes = shapes  # tuple of m_l
        self.omega = omega
        self.nu = nu
        self.coarse_iters = coarse_iters

    def tree_flatten(self):
        return tuple(self.datas), (
            self.offsets, self.shapes, self.omega, self.nu, self.coarse_iters
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(list(leaves), *aux)

    @classmethod
    def build(cls, G: GridDIAMatrix, coarse_n: int = 32, omega: float = 0.8,
              nu: int = 2, coarse_iters: int = 64):
        """Coarsen while the cell count n = m-1 is even and > coarse_n.

        The whole hierarchy is computed inside ONE jitted program (eager
        per-op execution is unusable on the remote-compile TPU harness)."""
        # static level plan from shapes
        shapes = [G.shape2d[0]]
        offsets = [G.offsets2d]
        while True:
            n = shapes[-1] - 1
            if n % 2 != 0 or n // 2 < coarse_n:
                break
            shapes.append(n // 2 + 1)
            offsets.append(
                tuple((a, b) for a in (-1, 0, 1) for b in (-1, 0, 1))
            )

        @jax.jit
        def all_levels(data0):
            out = [data0]
            lvl = GridDIAMatrix(data0, G.offsets2d, G.shape2d)
            for _ in range(len(shapes) - 1):
                lvl = galerkin_coarsen(lvl)
                out.append(lvl.data)
            return tuple(out)

        datas = list(all_levels(G.data))
        return cls(
            datas, tuple(offsets), tuple(shapes), omega, nu, coarse_iters
        )

    @property
    def n_levels(self):
        return len(self.shapes)

    def astype(self, dtype):
        """Hierarchy with stencil data STORED in `dtype` (typically
        jnp.bfloat16: halves the stencil-layer HBM traffic of every smooth
        and residual in the V-cycle). Vector arithmetic keeps the caller's
        precision — layers are cast up inside each stencil apply, which
        fuses into the multiply for free.

        Sound because the V-cycle is only ever used as a PRECONDITIONER:
        rounding the operator entries to bf16 (~4e-3 relative; EXACT on
        uniform-grid P1 fine levels) perturbs, not breaks, the SPD
        approximation of A^{-1}. Full-bf16 vector arithmetic is NOT
        offered: it loses h-independence (measured: 7 -> 17 iterations
        from n=64 to n=128 vs flat 7 for f32 vectors)."""
        return GridMG(
            [d.astype(dtype) for d in self.datas],
            self.offsets, self.shapes, self.omega, self.nu,
            self.coarse_iters,
        )

    def _smooth(self, lvl, x, b):
        data, offs, m = self.datas[lvl], self.offsets[lvl], self.shapes[lvl]
        inv_diag = 1.0 / data[offs.index((0, 0))].astype(b.dtype)
        for _ in range(self.nu):
            x = x + self.omega * inv_diag * (b - _stencil(data, offs, x, m))
        return x

    def _coarse_solve(self, b):
        lvl = self.n_levels - 1
        data, offs, m = self.datas[lvl], self.offsets[lvl], self.shapes[lvl]
        # _stencil casts the (tiny) coarse data up to b's dtype per apply;
        # CG dot products below therefore run in the caller's precision

        def body(_, s):
            x, r, p, rr = s
            Ap = _stencil(data, offs, p, m)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(pAp > 0, rr / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.sum(r * r)
            beta = jnp.where(rr > 0, rr_new / jnp.where(rr == 0, 1.0, rr), 0.0)
            return (x, r, p * beta + r, rr_new)

        s = (jnp.zeros_like(b), b, b, jnp.sum(b * b))
        x, *_ = jax.lax.fori_loop(0, self.coarse_iters, body, s)
        return x

    def _v(self, lvl, b):
        if lvl == self.n_levels - 1:
            return self._coarse_solve(b)
        data, offs, m = self.datas[lvl], self.offsets[lvl], self.shapes[lvl]
        x = self._smooth(lvl, jnp.zeros_like(b), b)
        r = b - _stencil(data, offs, x, m)
        e = self._v(lvl + 1, _restrict(r, self.shapes[lvl + 1]))
        x = x + _prolong(e, m)
        return self._smooth(lvl, x, b)

    def v_cycle(self, r):
        """Apply one V-cycle to a (flat or (m, m)) residual; returns same
        shape/dtype as r (vector arithmetic in r's dtype; stencil layers
        stream in their storage dtype — see astype)."""
        m = self.shapes[0]
        flat = r.ndim == 1
        z = self._v(0, r.reshape(m, m))
        return z.reshape(-1) if flat else z


def mg_preconditioned_cg(G: GridDIAMatrix, b, rtol=1e-6, maxiter=100,
                         mg: GridMG | None = None, prec_dtype=None,
                         **build_kwargs):
    """CG on G with a V-cycle preconditioner; returns (x, rel_res, iters).

    G must carry its boundary treatment (with_dirichlet_identity). The
    rz-recurrence stop is backed by a true-residual evaluation at the end.

    prec_dtype: run the V-CYCLE in a lower precision than the CG vectors
    (typically f32 under f64). Measured at 10.2M dofs: identical iteration
    counts and final true residuals to the all-f64 solve, 8x faster (0.67 s
    vs 5.4 s) — the preconditioner's f32 rounding perturbs M, not the f64
    Krylov recurrence; this SUPERSEDES iterative refinement, whose f32
    inner solves floor at ~4e-3 on rough-coefficient operators. G.data may
    stay f32-stored regardless (stencil applies cast layers to the vector
    dtype).
    """
    if mg is None:
        mg = GridMG.build(G, **build_kwargs)
    m = G.shape2d[0]
    data, offs = G.data, G.offsets2d
    b = jnp.asarray(b).reshape(m, m)
    bn2 = jnp.sum(b * b)
    tol2 = (rtol * rtol) * bn2

    if prec_dtype is not None:
        vdt = b.dtype

        def prec(r):
            return mg.v_cycle(r.astype(prec_dtype)).astype(vdt)
    else:
        prec = mg.v_cycle

    z0 = prec(b)
    rz0 = jnp.sum(b * z0)

    def cond(s):
        x, r, p, rz, rr, k = s
        return (rr > tol2) & (k < maxiter) & jnp.isfinite(rr)

    def body(s):
        x, r, p, rz, rr, k = s
        Ap = _stencil(data, offs, p, m)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        return (x, r, z + beta * p, rz_new, jnp.sum(r * r), k + 1)

    s = (jnp.zeros_like(b), b, z0, rz0, bn2, 0)
    x, r, p, rz, rr, k = jax.lax.while_loop(cond, body, s)
    true_r = b - _stencil(data, offs, x, m)
    rel = jnp.sqrt(jnp.sum(true_r * true_r) / bn2)
    return x.reshape(-1), rel, k
