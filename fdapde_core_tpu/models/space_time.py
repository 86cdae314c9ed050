"""Separable space-time operators: sums of Kronecker products, matrix-free.

The reference provides the Kronecker building block
(linear_algebra/kronecker_product.h) that downstream fdaPDE space-time
models combine into penalties like  R = T1 (x) S0 + T0 (x) S1  (spline
penalty in time, FEM matrices in space). Materializing n_t*n_s square
matrices is hostile to accelerators; here the operator stays a sum of
Kronecker factors and every matvec is two batched matmuls per term
(vec identity: (A (x) B) vec(X) = vec(B X A^T)) — MXU-shaped.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..linear_algebra.kron import kron_matvec
from ..linear_algebra.solvers import bicgstab, cg
from ..linear_algebra.sparse import SparseMatrix

__all__ = ["SeparableOperator", "solve_space_time", "SpaceTimeSmoothing"]


class SeparableOperator:
    """sum_k  T_k (x) S_k  as a matrix-free linear operator.

    T_k act on the time index (n_t x n_t), S_k on space (n_s x n_s); the
    operator acts on vec(u) with u of shape (n_t, n_s) row-major.
    """

    def __init__(self, terms):
        self.terms = list(terms)  # [(T, S), ...]
        T0, S0 = self.terms[0]
        self.n_t = T0.shape[0]
        self.n_s = S0.shape[0]
        self.shape = (self.n_t * self.n_s, self.n_t * self.n_s)

    def __call__(self, x):
        out = None
        for T, S in self.terms:
            y = kron_matvec(T, S, x)
            out = y if out is None else out + y
        return out

    __matmul__ = __call__

    def diagonal(self):
        """Diagonal of the operator (for Jacobi preconditioning)."""
        d = None
        for T, S in self.terms:
            dT = T.diagonal() if isinstance(T, SparseMatrix) else jnp.diagonal(T)
            dS = S.diagonal() if isinstance(S, SparseMatrix) else jnp.diagonal(S)
            term = jnp.kron(dT, dS)
            d = term if d is None else d + term
        return d


def solve_space_time(op: SeparableOperator, b, symmetric=True, rtol=1e-10, maxiter=None):
    """Solve (sum_k T_k (x) S_k) x = b matrix-free with Jacobi-CG/BiCGStab."""
    d = op.diagonal()
    inv = 1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0)
    solver = cg if symmetric else bicgstab
    x, info = solver(op, jnp.asarray(b), M_inv=lambda r: inv * r, rtol=rtol, maxiter=maxiter)
    return x, info


class SpaceTimeSmoothing:
    """Separable space-time field estimation (spline-in-time x FEM-in-space).

    The downstream fdaPDE space-time model on a monitoring design (fixed
    spatial locations p_i observed at all instants t_j): estimate
    f(p, t) = sum_{uv} c_{uv} phi_u(t) psi_v(p) minimizing

        ||Y - Phi C Psi^T||_F^2 + lam_s * <(Mt (x) As) c, c>
                                 + lam_t * <(Pt (x) Ms) c, c>

    with As/Ms the FEM stiffness/mass on the spatial mesh, Mt/Pt the spline
    mass/bilaplacian penalty in time. On the grid design the normal
    equations are a SUM OF KRONECKER PRODUCTS —

        [(Phi^T Phi) (x) (Psi^T Psi) + lam_s Mt (x) As + lam_t Pt (x) Ms] c
            = vec(Phi^T Y Psi)

    — solved matrix-free (every matvec is a few small matmuls, MXU-shaped).
    """

    def __init__(self, mesh, time_interval, fem_order=1, spline_order=3):
        from ..fem.assembler import assemble_matrix
        from ..fem.space import FEMSpace
        from ..pde.operators import laplacian, reaction
        from ..splines.assembler import assemble_mass, assemble_operator
        from ..splines.space import SplineSpace
        from ..pde.operators import bilaplacian

        self.space = FEMSpace(mesh, fem_order)
        self.tspace = SplineSpace(time_interval, spline_order)
        self.As = assemble_matrix(self.space, -laplacian())
        self.Ms = assemble_matrix(self.space, reaction(1.0))
        self.Mt = assemble_mass(self.tspace)
        self.Pt = assemble_operator(self.tspace, -bilaplacian())

    def fit(self, locs, times, Y, lam_s, lam_t, rtol=1e-10, maxiter=20000):
        """locs (n_i, d) spatial points; times (n_j,); Y (n_i, n_j)."""
        from ..fem.evaluation import eval_basis_pointwise

        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        Phi, _ = self.tspace.eval(np.asarray(times))
        PsiTPsi = jnp.asarray(Psi.to_scipy().T @ Psi.to_scipy().toarray())
        PhiTPhi = jnp.asarray(Phi.to_scipy().T @ Phi.to_scipy().toarray())
        from ..linear_algebra.sparse import SparseMatrix

        op = SeparableOperator(
            [
                (SparseMatrix.from_dense(np.asarray(PhiTPhi)),
                 SparseMatrix.from_dense(np.asarray(PsiTPsi))),
                (lam_t * self.Pt, self.Ms),
                (lam_s * self.Mt, self.As),
            ]
        )
        Yj = jnp.asarray(Y, self.As.dtype)
        rhs_mat = Phi.rmatvec(Yj.T)  # (nt_basis, n_i)
        rhs = Psi.rmatvec(rhs_mat.T).T  # -> (nt_basis, ns)
        self._op = op
        c, info = solve_space_time(op, rhs.reshape(-1), rtol=rtol, maxiter=maxiter)
        self.coefficients_ = c.reshape(self.tspace.n_dofs, self.space.n_dofs)
        self.solve_info_ = info
        return self.coefficients_

    def predict(self, locs, times):
        """Field values at the (locs x times) grid: (n_i, n_j)."""
        from ..fem.evaluation import eval_basis_pointwise

        Psi, _ = eval_basis_pointwise(self.space, np.asarray(locs))
        Phi, _ = self.tspace.eval(np.asarray(times))
        tmp = Psi @ self.coefficients_.T  # (n_i, nt_basis)
        return (Phi @ tmp.T).T  # (n_i, n_j)


def solve_space_time_fdm(T0, T1, S0, S1, b, rtol: float = 1e-10,
                         maxiter: int = 2000, device_mesh=None):
    """Fast diagonalization (Lynch–Rice–Thomas) for the 2-term operator
    R = T1 (x) S0 + T0 (x) S1.

    Host-side generalized time eigenbasis T1 Z = T0 Z diag(lam) with
    Z^T T0 Z = I decouples the system into n_t INDEPENDENT space solves

        (S1 + lam_t S0) w_t = (Z^T (x) I) b,   x = (Z (x) I) w

    batched on device with a vmapped Jacobi-CG (one shared while_loop over
    all modes) — or, with `device_mesh`, MODE-PARALLEL across chips: the
    modes are embarrassingly parallel, so each device solves its shard of
    the (lam_t, rhs_t) pairs with ZERO per-iteration communication (the
    small time transforms run replicated). This is the scaling story the
    coupled Kronecker CG (parallel/space_time.ShardedSpaceTime) cannot
    match: no halo exchange at all. The transforms are two (n_t, n_t) matmuls — MXU work; the
    space solves are the same SpMV streams as the elliptic path, so the
    Kronecker structure costs NOTHING beyond n_t elliptic solves. TPU-native
    replacement of factorizing the materialized Kronecker sum (reference
    building block: kronecker_product.h:27-80).

    Requirements: T0 SPD, T1 symmetric PSD (numpy dense, n_t small);
    S0 SPD, S1 symmetric PSD with S1 + lam_min*S0 SPD (the usual
    mass/stiffness pairs qualify). Returns (x, SolveInfo) where iterations
    is the max over modes and converged the AND.
    """
    import jax
    import scipy.linalg as sla

    from ..linear_algebra.solvers import SolveInfo

    T0n = np.asarray(T0.toarray() if hasattr(T0, "toarray") else T0)
    T1n = np.asarray(T1.toarray() if hasattr(T1, "toarray") else T1)
    lam, Z = sla.eigh(T1n, T0n)  # Z^T T0 Z = I
    n_t = T0n.shape[0]
    n_s = S0.shape[0]
    B = jnp.asarray(b).reshape(n_t, n_s)
    Zj = jnp.asarray(Z, B.dtype)
    lamj = jnp.asarray(lam, B.dtype)
    Bt = Zj.T @ B  # (Z^T (x) I) b on the (t, s) row-major layout

    d0 = S0.diagonal()
    d1 = S1.diagonal()

    def solve_mode(lam_t, rhs):
        def op(v):
            return (S1 @ v) + lam_t * (S0 @ v)

        d = d1 + lam_t * d0
        dinv = 1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0)
        x, info = cg(op, rhs, M_inv=lambda r: dinv * r, rtol=rtol,
                     maxiter=maxiter)
        return x, info.iterations, info.converged

    if device_mesh is None:
        W, iters, conv = jax.vmap(solve_mode)(lamj, Bt)
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = device_mesh.devices.size
        pad = (-n_t) % n_dev
        lam_p = jnp.pad(lamj, (0, pad))
        Bt_p = jnp.pad(Bt, ((0, pad), (0, 0)))

        def shard_fn(lams, rhss):
            return jax.vmap(solve_mode)(lams, rhss)

        W, iters, conv = jax.shard_map(
            shard_fn,
            mesh=device_mesh,
            in_specs=(P("shard"), P("shard", None)),
            out_specs=(P("shard", None), P("shard"), P("shard")),
        )(lam_p, Bt_p)
        W, iters, conv = W[:n_t], iters[:n_t], conv[:n_t]
    X = Zj @ W
    return X.reshape(-1), SolveInfo(iters.max(), jnp.zeros(()), conv.all())
