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

import jax
import jax.numpy as jnp

from ..fem.solvers import DirichletSystem
from ..linear_algebra.solvers import cg
from ..ops.auxgrid import AuxGridPreconditioner
from ..ops.matfree import MatrixFreeLocal, p1_local_stiffness

__all__ = ["MatrixFreePoisson"]


class MatrixFreePoisson:
    """-Laplace u = f with Dirichlet data g, P1, arbitrary 2D triangulation.

    nodes (N, 2), cells (C, 3) int32, boundary (N,) bool — device arrays.
    max_degree bounds the per-node cell incidence (8 covers quad-split
    meshes; Delaunay meshes may need ~10-12 — `adjacency_overflowed` reports
    a violated bound). grid_n sets the auxiliary preconditioner grid
    (default ~sqrt(N)).
    """

    def __init__(self, nodes, cells, boundary, max_degree: int = 8,
                 grid_n: int | None = None, bbox=((0.0, 0.0), (1.0, 1.0)),
                 format: str = "ell"):
        from ..ops.ell import ELLMatrix

        self.nodes = nodes
        self.cells = cells
        self.boundary = boundary
        self.n_dofs = nodes.shape[0]
        self.format = format

        @jax.jit
        def build(nodes, cells):
            A64 = p1_local_stiffness(nodes, cells)
            op, over = MatrixFreeLocal.build(A64, cells, self.n_dofs,
                                             max_degree)
            return op, over

        mf, over = build(nodes, cells)
        self.adjacency_overflowed = bool(over)
        if self.adjacency_overflowed:
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
                    op.A_loc, op.dofs, op.adj, op.adj_mask, max_degree + 1
                )
            )(mf)
            if bool(overc):
                raise ValueError(
                    f"a row exceeds {max_degree + 1} distinct columns; "
                    "rebuild with a larger max_degree"
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
        self.aux = AuxGridPreconditioner.build_device(
            nodes, diag32, grid_n=grid_n, bbox=bbox
        )

    def load_vector(self, f_cells):
        """P1 load b_i = sum_T area_T/3 * f(centroid_T) over incident cells
        (1-point centroid quadrature — same order as the P1 interpolation;
        integrator.h:52-55 semantics). f_cells: (C,) forcing at centroids."""
        p = self.nodes[self.cells]
        e0 = p[:, 1] - p[:, 0]
        e1 = p[:, 2] - p[:, 0]
        area = 0.5 * jnp.abs(e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0])
        floc = jnp.broadcast_to(
            (area * f_cells / 3.0)[:, None], self.cells.shape
        ).reshape(-1)
        gathered = floc[self.adj] * self.adj_mask.astype(floc.dtype)
        return gathered.sum(axis=1)

    def solve(self, b, g=None, rtol: float = 1e-9, maxiter: int = 100):
        """Mixed-precision converged solve; returns (x, iterations, true
        relative residual) — all device scalars (fetch to fence)."""
        if g is None:
            g = jnp.zeros_like(b)

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

        return run(self.op, self.boundary, self.aux, b, g)
