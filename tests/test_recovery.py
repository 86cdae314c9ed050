"""Solver-failure recovery (SURVEY §5.3; VERDICT r1 item 5).

The reference only reports success=false on factorization failure
(fem_linear_elliptic_solver.h:42-45). Here a non-converged Krylov solve
escalates once: GMRES(50) warm-started from the best finite iterate, with an
FSPAI preconditioner replacing Jacobi for small symmetric systems.
"""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem.assembler import assemble_forcing, assemble_matrix
from fdapde_core_tpu.fem.solvers import masked_matrix, solve_elliptic
from fdapde_core_tpu.fem.space import FEMSpace
from fdapde_core_tpu.linear_algebra.sparse import SparseMatrix
from tests.conftest import load_mesh


def _coo(dense):
    return SparseMatrix.from_dense(np.asarray(dense, dtype=np.float64))


def test_bicgstab_breakdown_recovers_via_gmres():
    # rotation block: BiCGStab breaks down at step 1 (<rhat, A r0> = 0 =>
    # alpha = inf poisons the iterate); GMRES solves it exactly
    A = _coo([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    b = jnp.asarray([1.0, 0.5, 2.0])
    mask = jnp.zeros(3, dtype=bool)
    g = jnp.zeros(3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x, info = solve_elliptic(A, b, mask, g, symmetric=False, rtol=1e-12)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-10)


def test_no_recovery_reproduces_reference_failure_flag():
    A = _coo([[0.0, -1.0], [1.0, 0.0]])
    b = jnp.asarray([1.0, 0.5])
    mask = jnp.zeros(2, dtype=bool)
    x, info = solve_elliptic(
        A, b, mask, jnp.zeros(2), symmetric=False, rtol=1e-12, recovery=False
    )
    assert not bool(info.converged)


def test_symmetric_escalation_uses_fspai():
    # 1D Laplacian, maxiter too small for Jacobi-CG; FSPAI-GMRES(50) converges
    n = 200
    d = np.zeros((n, n))
    i = np.arange(n)
    d[i, i] = 2.0
    d[i[:-1], i[:-1] + 1] = -1.0
    d[i[:-1] + 1, i[:-1]] = -1.0
    A = _coo(d)
    b = jnp.ones(n)
    mask = jnp.zeros(n, dtype=bool)
    with pytest.warns(UserWarning, match="FSPAI"):
        x, info = solve_elliptic(
            A, b, mask, jnp.zeros(n), symmetric=True, rtol=1e-10, maxiter=60
        )
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(A @ x - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-9


def test_advection_dominated_pde_converges_through_recovery():
    """Product-level: BiCGStab stalls (true res ~5e-4 after 2000 iters on
    this Peclet ~1e3 problem), PDE.solve() still converges via escalation."""
    mesh = load_mesh("unit_square_32")
    L = -1e-3 * fdm.laplacian() + fdm.advection(np.array([2.0, 1.0]))
    pde = fdm.PDE(
        mesh, L, forcing=lambda x: 1.0, order=1,
        solver_rtol=1e-10, solver_maxiter=2000,
    )
    pde.set_dirichlet_bc(np.zeros(pde.n_dofs))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pde.solve()
    assert pde.success
    rep = pde.report()
    assert rep["solver_converged"]

    # the bare solver on the same system really does stall — the recovery
    # path is what made the difference
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, L)
    F = assemble_forcing(space, lambda x: 1.0)
    mask = jnp.asarray(space.boundary_dofs)
    _, info = solve_elliptic(
        A, F, mask, jnp.zeros(space.n_dofs), symmetric=False,
        rtol=1e-10, maxiter=2000, recovery=False,
    )
    assert not bool(info.converged)


def test_masked_matrix_matches_dirichlet_system():
    mesh = load_mesh("unit_square_16")
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    mask = jnp.asarray(space.boundary_dofs)
    from fdapde_core_tpu.fem.solvers import DirichletSystem

    sysm = DirichletSystem(A, mask)
    Am = masked_matrix(A, mask)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(space.n_dofs))
    np.testing.assert_allclose(
        np.asarray(Am @ v), np.asarray(sysm(v)), rtol=1e-13, atol=1e-13
    )


def test_parabolic_step_stall_recovers_via_gmres():
    """A per-step CG starved of iterations fails inside the scan (and
    poisons the trajectory); recovery re-runs with GMRES(50) and matches
    the healthy reference trajectory. SURVEY §5.3 beyond-elliptic scope."""
    import warnings

    import jax.numpy as jnp

    from fdapde_core_tpu.fem.solvers import solve_parabolic
    from fdapde_core_tpu.linear_algebra.sparse import SparseMatrix

    n, m = 40, 5
    h = 1.0 / (n - 1)
    main = np.full(n, 2.0 / h)
    main[0] = main[-1] = 1.0
    Ad = (np.diag(main) + np.diag(np.full(n - 1, -1.0 / h), 1)
          + np.diag(np.full(n - 1, -1.0 / h), -1))
    Ad[0, 1] = Ad[-1, -2] = 0.0
    Md = np.diag(np.full(n, h))
    A = SparseMatrix.from_dense(Ad)
    Mass = SparseMatrix.from_dense(Md)
    mask = np.zeros(n, bool)
    mask[0] = mask[-1] = True
    mask = jnp.asarray(mask)
    times = np.linspace(0.0, 0.1, m)
    F = jnp.zeros((n, m))
    g = jnp.zeros((n, m))
    u0 = jnp.asarray(np.sin(np.pi * np.linspace(0, 1, n)))

    ref = solve_parabolic(A, Mass, F, mask, g, u0, times, rtol=1e-12)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out, info = solve_parabolic(
            A, Mass, F, mask, g, u0, times, rtol=1e-12, maxiter=3,
            return_info=True,
        )
    assert info["escalated"]
    assert any("parabolic step" in str(x.message) for x in w)
    assert bool(np.all(np.asarray(info["converged"])))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-9)

    # starved run WITHOUT recovery visibly fails
    out2, info2 = solve_parabolic(
        A, Mass, F, mask, g, u0, times, rtol=1e-12, maxiter=3,
        recovery=False, return_info=True,
    )
    assert not bool(np.all(np.asarray(info2["converged"])))


def test_halo_dia_f32_failure_escalates_to_f64():
    """Distributed CG whose f32 arithmetic overflows (||b||^2 past the f32
    range — the range/precision failure class) goes non-finite; recovery
    recasts operator + vectors to f64 and converges."""
    import warnings

    import jax.numpy as jnp

    from fdapde_core_tpu.linear_algebra.dia import DIAMatrix
    from fdapde_core_tpu.parallel.halo import HaloDIASolver
    from fdapde_core_tpu.parallel.sharded import make_device_mesh

    n = 256
    data = np.stack([
        np.full(n, 2.0), np.full(n, -1.0), np.full(n, -1.0),
    ]).astype(np.float32)
    data[1, 0] = data[2, -1] = 0.0
    D = DIAMatrix(jnp.asarray(data), (0, -1, 1), n)
    solver = HaloDIASolver(D, make_device_mesh(4))
    free = jnp.ones(n, jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray((1e20 * rng.standard_normal(n)).astype(np.float32))

    # bare run: dot(b, b) overflows f32 -> non-finite residual
    x0, res0, k0 = solver.solve(b, free, rtol=1e-11, maxiter=4000,
                                recovery=False)
    assert not np.isfinite(float(res0))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        x, res, k = solver.solve(b, free, rtol=1e-11, maxiter=4000)
    assert any("escalating to an f64" in str(x_.message) for x_ in w)
    assert x.dtype == jnp.float64
    bn = float(np.linalg.norm(np.asarray(b, np.float64)))
    assert float(res) <= 1e-11 * bn * 1.01
    # escalated solution actually solves the (f64) system
    a = np.zeros((n, n))
    np.fill_diagonal(a, data[0])
    a[np.arange(1, n), np.arange(n - 1)] = data[1, 1:]
    a[np.arange(n - 1), np.arange(1, n)] = data[2, :-1]
    np.testing.assert_allclose(
        a @ np.asarray(x), np.asarray(b, np.float64), rtol=1e-9
    )


def test_space_time_stall_escalates_to_mode_diag():
    """Jacobi-CG stalls on a time pencil spanning 8 decades; recovery swaps
    in the mode-diagonal preconditioner and converges."""
    import warnings

    import jax.numpy as jnp

    from fdapde_core_tpu.models.space_time import (
        SeparableOperator,
        solve_space_time,
    )

    rng = np.random.default_rng(2)
    nt, ns = 8, 24
    # NON-diagonal time pencil spanning 8 decades (rotated spectrum —
    # invisible to Jacobi, exactly diagonalized by the mode transform)
    Q, _ = np.linalg.qr(rng.standard_normal((nt, nt)))
    T1 = Q @ np.diag(np.logspace(0, 8, nt)) @ Q.T
    T0 = np.eye(nt)
    S1 = (np.diag(np.full(ns, 2.0)) + np.diag(np.full(ns - 1, -1.0), 1)
          + np.diag(np.full(ns - 1, -1.0), -1))
    S0 = np.eye(ns) * 0.01
    op = SeparableOperator([(jnp.asarray(T1), jnp.asarray(S0)),
                            (jnp.asarray(T0), jnp.asarray(S1))])
    b = jnp.asarray(rng.standard_normal(nt * ns))

    x_bare, info_bare = solve_space_time(op, b, rtol=1e-12, maxiter=60,
                                         recovery=False)
    assert not bool(info_bare.converged)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        x, info = solve_space_time(op, b, rtol=1e-12, maxiter=60)
    assert any("mode-diagonal" in str(x_.message) for x_ in w)
    assert bool(info.converged)
    dense = np.kron(T1, S0) + np.kron(T0, S1)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(dense, np.asarray(b)),
                               atol=1e-7)
