"""Semilinear PDE solves via Newton iteration.

The reference core exposes the nonlinear hook (the active-coefficient gather
`f_` in the assembler, fem_assembler.h:44,84-85) and leaves the Newton outer
loop to downstream packages; here the full solver ships (SURVEY.md §7
phase 4):

    -div(K grad u) + h(u) = f  in Omega,   u = g on boundary

Newton: given u_k, solve  (A + M_{h'(u_k)}) delta = -(A u_k + B(u_k) - F)
on the free dofs (Dirichlet masking as in fem/solvers.py), u_{k+1} = u_k +
damping * delta, where

    B_i(u)  = int h(u) psi_i           (weighted forcing assembly)
    M_{w} = mass matrix weighted by w evaluated at quadrature points.

All assembly steps are the same batched einsum + segment-sum contractions as
the linear path, re-traced with updated quadrature values of u.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.affine import affine_maps
from ..linear_algebra.sparse import SparseMatrix
from ..linear_algebra.solvers import cg, jacobi_preconditioner
from .assembler import assemble_forcing, assemble_matrix
from .solvers import DirichletSystem

__all__ = ["solve_semilinear"]


def solve_semilinear(
    space,
    linear_op,
    h,
    dh,
    forcing,
    g,
    newton_tol: float = 1e-10,
    max_newton: int = 25,
    cg_rtol: float = 1e-12,
    damping: float = 1.0,
    bfgs_fallback: bool = False,
    H_potential=None,
):
    """Solve linear_op(u) + h(u) = forcing with Dirichlet data g.

    h, dh: elementwise JAX-traceable callables (the nonlinearity and its
    derivative). Returns (u, info dict).

    With `bfgs_fallback=True` (BASELINE config 4: "Newton iteration with
    BFGS fallback"), a non-converged Newton loop falls back to BFGS
    minimization of the discrete energy

        E(u) = 1/2 u^T A u + int H(u) - F^T u,    H' = h

    (`H_potential` — an antiderivative of h — defaults to a numeric
    potential via h(u)*u surrogate only if omitted; supply it for exact
    energies). Dense-BFGS memory is O(n^2): intended for moderate n.
    """
    A = assemble_matrix(space, linear_op)
    F = assemble_forcing(space, forcing)
    mask = jnp.asarray(space.boundary_dofs)
    g = jnp.asarray(g)

    nodes = jnp.asarray(space.mesh.nodes)
    cells = jnp.asarray(space.mesh.cells)
    phi = jnp.asarray(space.phi_tab)  # (nq, nb)
    w = jnp.asarray(space.quad.weights)
    _, _, measure = affine_maps(nodes, cells)
    dofs = jnp.asarray(space.dofs)
    seg = dofs.reshape(-1)
    rows, cols, inv = space.scatter
    nnz = rows.shape[0]

    def u_at_quad(u):
        return u[dofs] @ phi.T  # (C, nb) @ (nb, nq) -> (C, nq)

    def weighted_mass_vals(wq):
        """COO values of the mass matrix weighted by wq (C, nq)."""
        local = jnp.einsum("cq,qi,qj,q->cij", wq, phi, phi, w) * measure[:, None, None]
        return jax.ops.segment_sum(local.reshape(-1), jnp.asarray(inv), nnz)

    def weighted_load(wq):
        """int wq psi_i as a dof vector."""
        loc = jnp.einsum("cq,qi,q->ci", wq, phi, w) * measure[:, None]
        return jax.ops.segment_sum(loc.reshape(-1), seg, space.n_dofs)

    u = jnp.where(mask, g, 0.0)
    history = []
    for it in range(max_newton):
        uq = u_at_quad(u)
        R = A @ u + weighted_load(h(uq)) - F
        J = SparseMatrix(
            jnp.asarray(rows), jnp.asarray(cols),
            A.vals + weighted_mass_vals(dh(uq)),
            A.shape,
        )
        sys = DirichletSystem(J, mask)
        rhs = -R * (~mask)  # delta = 0 on the boundary (u already equals g)
        pre = jacobi_preconditioner(sys.diagonal())
        delta, info = cg(sys, rhs, M_inv=pre, rtol=cg_rtol)
        u = u + damping * delta
        res_norm = float(jnp.linalg.norm(rhs))
        history.append(res_norm)
        if res_norm < newton_tol:
            break

    converged = history[-1] < newton_tol if history else False
    info = {"newton_iterations": it + 1, "residuals": history, "method": "newton"}
    if not converged and bfgs_fallback:
        # minimize the discrete energy over the FREE dofs with BFGS
        from ..optimization import bfgs as _bfgs

        free_idx = jnp.asarray(np.nonzero(~space.boundary_dofs)[0])
        gv = jnp.where(mask, g, 0.0)
        Hpot = H_potential if H_potential is not None else (lambda v: h(v) * v)

        def energy(u_free):
            ufull = gv.at[free_idx].set(u_free)
            quad_u = u_at_quad(ufull)
            # int H(u): quadrature of the potential
            pot = jnp.einsum(
                "cq,q->c", Hpot(quad_u), jnp.asarray(space.quad.weights)
            ) @ measure
            return 0.5 * jnp.vdot(ufull, A @ ufull) + pot - jnp.vdot(F, ufull)

        res = _bfgs(
            energy, u[free_idx], tol=1e-8, max_iter=500, line_search="backtracking"
        )
        u = gv.at[free_idx].set(res.x)
        info = {
            "newton_iterations": it + 1,
            "residuals": history,
            "method": "bfgs_fallback",
            "bfgs_iterations": int(res.n_iter),
        }
    return u, info
