"""General-mesh Poisson at device scale: the matrix-free gather pipeline.

Counterpart of `StructuredPoisson` for meshes WITHOUT tensor-product
structure — the product-level form of the flagship general path:

  device mesh arrays (nodes, cells, boundary) -> batched local stiffness
  (ops/matfree.p1_local_stiffness) -> ELL incidence table (one device
  argsort; ops/ell.py) -> matrix-free gather SpMV CG with a device-built
  auxiliary-grid preconditioner (ops/auxgrid.py) -> mixed-precision
  converged solve (f64 CG vectors + f64 fine operator + f32 aux V-cycle).

Nothing here assumes anything about the topology: the solver sees opaque
index arrays. The mesh may come from `geometry.structured.
irregular_mesh_device` (generated on device — the only way to reach 10M+
dofs through this harness's host relay) or from any host Triangulation's
(nodes, cells, boundary) arrays at sizes where the transfer is affordable.

Reference anchor: PDE + FEMLinearEllipticSolver (pde/pde.h:40-114,
fem_linear_elliptic_solver.h:34-50) on arbitrary simplicial meshes; the
aux-grid + CG pair replaces Eigen SparseLU as the scalable solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fem.solvers import DirichletSystem
from ..linear_algebra.solvers import cg
from ..ops.auxgrid import AuxGridPreconditioner, AuxGridPreconditioner3D
from ..ops.matfree import (
    MatrixFreeLocal,
    p1_local_stiffness,
    p1_local_stiffness_3d,
)

__all__ = ["MatrixFreePoisson"]


class MatrixFreePoisson:
    """-Laplace u = f with Dirichlet data g, P1, arbitrary 2D triangulation
    or 3D tetrahedralization (dispatched on nodes.shape[1]).

    nodes (N, d), cells (C, d+1) int32, boundary (N,) bool — device arrays.
    max_degree bounds the per-node cell incidence (8 covers 2D quad-split
    meshes, 24 Freudenthal tet meshes; Delaunay may need more — a violated
    bound raises ValueError at construction). grid_n sets the auxiliary
    preconditioner grid (default ~N^(1/d)).
    """

    def __init__(self, nodes, cells, boundary, max_degree: int | None = None,
                 grid_n: int | None = None, bbox=None,
                 format: str = "ell", max_cols: int | None = None,
                 kappa=None):
        from ..ops.ell import ELLMatrix

        self.nodes = nodes
        self.cells = cells
        self.boundary = boundary
        self.n_dofs = nodes.shape[0]
        self.format = format
        self.dim = nodes.shape[1]
        if self.dim not in (2, 3):
            raise ValueError(f"2D/3D only, got embedding dim {self.dim}")
        stiffness = (
            p1_local_stiffness if self.dim == 2 else p1_local_stiffness_3d
        )
        if max_degree is None:
            max_degree = 8 if self.dim == 2 else 24
        if max_cols is None:
            # distinct columns per row: neighbors + self (15 = Freudenthal)
            max_cols = max_degree + 1 if self.dim == 2 else 15
        if bbox is None:
            bbox = ((0.0,) * self.dim, (1.0,) * self.dim)

        # kappa enters as a TRACED argument (a closed-over array would be
        # baked in as a compile-time constant, one compile per kappa)
        @functools.partial(jax.jit, static_argnums=(3,))
        def build(nodes, cells, kappa, has_kappa):
            A64 = stiffness(nodes, cells, kappa=kappa if has_kappa else None)
            op, over = MatrixFreeLocal.build(A64, cells, self.n_dofs,
                                             max_degree)
            return op, over

        kap = jnp.zeros((0,)) if kappa is None else kappa
        mf, over = build(nodes, cells, kap, kappa is not None)
        if bool(over):
            raise ValueError(
                f"a node exceeds max_degree={max_degree} cell incidences; "
                "rebuild with a larger bound"
            )
        # the load_vector combine rides the adjacency regardless of format
        self.adj, self.adj_mask = mf.adj, mf.adj_mask
        if format == "ell":
            # assembled row-ELL: ~1.6x fewer gathered elements per SpMV
            E, overc = jax.jit(
                lambda op: ELLMatrix.from_local(
                    op.A_loc, op.dofs, op.adj, op.adj_mask, max_cols
                )
            )(mf)
            if bool(overc):
                raise ValueError(
                    f"a row exceeds {max_cols} distinct columns; "
                    "rebuild with a larger max_cols"
                )
            self.op = E
        elif format == "matfree":
            self.op = mf
        else:
            raise ValueError(format)
        self.system = DirichletSystem(self.op, boundary)
        diag32 = jax.jit(
            lambda op, bnd: DirichletSystem(op, bnd)
            .diagonal().astype(jnp.float32)
        )(self.op, boundary)
        aux_cls = (
            AuxGridPreconditioner if self.dim == 2 else AuxGridPreconditioner3D
        )
        self.aux = aux_cls.build_device(nodes, diag32, grid_n=grid_n,
                                        bbox=bbox)

    def load_vector(self, f_cells):
        """P1 load b_i = sum_T |T|/(d+1) * f(centroid_T) over incident cells
        (1-point centroid quadrature — same order as the P1 interpolation;
        integrator.h:52-55 semantics). f_cells: (C,) forcing at centroids."""
        p = self.nodes[self.cells]
        if self.dim == 2:
            e0, e1 = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]
            meas = 0.5 * jnp.abs(e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0])
        else:
            b_, c_, d_ = (p[:, 1] - p[:, 0], p[:, 2] - p[:, 0],
                          p[:, 3] - p[:, 0])
            cxd = jnp.stack(
                [
                    c_[:, 1] * d_[:, 2] - c_[:, 2] * d_[:, 1],
                    c_[:, 2] * d_[:, 0] - c_[:, 0] * d_[:, 2],
                    c_[:, 0] * d_[:, 1] - c_[:, 1] * d_[:, 0],
                ],
                axis=1,
            )
            meas = jnp.abs((b_ * cxd).sum(axis=1)) / 6.0
        floc = jnp.broadcast_to(
            (meas * f_cells / (self.dim + 1.0))[:, None], self.cells.shape
        ).reshape(-1)
        gathered = floc[self.adj] * self.adj_mask.astype(floc.dtype)
        return gathered.sum(axis=1)

    def solve(self, b, g=None, rtol: float = 1e-9, maxiter: int = 100):
        """Mixed-precision converged solve; returns (x, iterations, true
        relative residual) — all device scalars (fetch to fence)."""
        if g is None:
            g = jnp.zeros_like(b)
        run = _solve_fn(float(rtol), int(maxiter))
        return run(self.op, self.boundary, self.aux, b, g)


@functools.lru_cache(maxsize=None)
def _solve_fn(rtol: float, maxiter: int):
    """Module-level jit cache: a fresh closure per solve() call would
    retrace/recompile every time (30-60 s each on the remote-TPU harness);
    op/aux are pytrees, so one compile serves all same-shaped solves."""

    @jax.jit
    def run(op, bnd, aux, b, g):
        sys = DirichletSystem(op, bnd)

        def pre(r):
            return aux(r.astype(jnp.float32)).astype(r.dtype)

        b_mod = sys.rhs(b, g)
        x0 = jnp.where(bnd, g, 0.0)
        x, info = cg(sys, b_mod, M_inv=pre, x0=x0, rtol=rtol,
                     maxiter=maxiter)
        res = b_mod - sys(x)
        rel = jnp.sqrt(jnp.sum(res * res) / jnp.sum(b_mod * b_mod))
        return x, info.iterations, rel

    return run
