"""Krylov solver variants (linear_algebra/solvers.py)."""

import jax.numpy as jnp


def test_cg_split_programs_matches_cg():
    """Host-driven two-program PCG == fused PCG (same math): solution
    parity on an SPD system with a Jacobi-like preconditioner, and
    post-convergence iterations must not produce NaNs."""
    import numpy as np

    from fdapde_core_tpu.linear_algebra.solvers import (
        cg,
        cg_split_programs,
        jacobi_preconditioner,
    )

    rng = np.random.default_rng(0)
    n = 120
    Q = rng.standard_normal((n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    M = jacobi_preconditioner(jnp.diagonal(A))
    x_ref, info_ref = cg(A, b, M_inv=M, rtol=1e-12, maxiter=500)
    assert bool(info_ref.converged)
    # check_every > convergence point: exercises the breakdown guard
    x, info = cg_split_programs(A, b, M, rtol=1e-12, maxiter=500,
                                check_every=50)
    assert bool(info.converged)
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-10)
