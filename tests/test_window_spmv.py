"""WindowedELL: scattered-banded SpMV parity vs the plain ELL gather.

The scattered-band class is exactly what plan_split_width REJECTS (a
spread RCM histogram); WindowedELL must reproduce ELLSoA @ x bit-for-bit
on it and serve the operator protocol (DirichletSystem + chunked CG).
Reference envelope anchor: fem_linear_elliptic_solver.h:38-47 (SparseLU
accepts any assembled topology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdapde_core_tpu.fem.solvers import DirichletSystem
from fdapde_core_tpu.linear_algebra.solvers import cg_chunked
from fdapde_core_tpu.ops.matfree_soa import ELLSoA
from fdapde_core_tpu.ops.window_spmv import WindowedELL


def _scattered_spd_ell(n, K=7, B=97, seed=3):
    """Synthetic scattered-banded SPD ELL: random distinct offsets per
    row drawn across the whole band (the histogram plan_split rejects),
    symmetrized by construction, diagonally dominant."""
    rng = np.random.default_rng(seed)
    rows = np.arange(n)
    # symmetric pattern: pair (i, j) entries from random upper offsets
    A = np.zeros((n, n))
    for i in range(n):
        offs = rng.choice(np.arange(1, B + 1), size=(K - 1) // 2,
                          replace=False)
        for d in offs:
            if i + d < n:
                v = rng.uniform(0.1, 1.0)
                A[i, i + d] -= v
                A[i + d, i] -= v
    A -= np.diag(A.sum(axis=1)) - np.diag(np.diag(A))
    A += np.eye(n) * 0.5
    # to ELL (row-major K_max slots)
    Kmax = int((A != 0).sum(axis=1).max())
    vals = np.zeros((Kmax, n))
    cols = np.tile(rows, (Kmax, 1))
    for i in range(n):
        nz = np.nonzero(A[i])[0]
        vals[: len(nz), i] = A[i, nz]
        cols[: len(nz), i] = nz
    return ELLSoA(jnp.asarray(vals), jnp.asarray(cols, jnp.int32),
                  (n, n)), A


def test_windowed_matvec_and_diagonal_parity():
    n = 700
    E, A = _scattered_spd_ell(n)
    Wop = WindowedELL.from_ell(E, block_rows=128)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    np.testing.assert_array_equal(np.asarray(Wop @ v), np.asarray(E @ v))
    np.testing.assert_array_equal(np.asarray(Wop.diagonal()),
                                  np.asarray(E.diagonal()))
    # jit-compiled path (pytree flatten/unflatten round trip); XLA fusion
    # may reassociate the K-sum — near-exact, not bitwise
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda W, x: W @ x)(Wop, v)), np.asarray(E @ v),
        rtol=1e-13, atol=1e-13,
    )


def test_windowed_cg_solve_scattered():
    n = 700
    E, A = _scattered_spd_ell(n)
    Wop = WindowedELL.from_ell(E, block_rows=128)
    bnd = jnp.zeros(n, bool).at[0].set(True).at[n - 1].set(True)
    sys_w = DirichletSystem(Wop, bnd)
    b = jnp.where(bnd, 0.0, 1.0)
    x, info = cg_chunked(sys_w, b, rtol=1e-12, maxiter=900, chunk=100)
    res = np.asarray(sys_w(x) - b)
    assert np.linalg.norm(res) / np.sqrt(n) < 1e-10
    # agreement with the dense solve
    An = np.asarray(A)
    free = ~np.asarray(bnd)
    xs = np.zeros(n)
    xs[free] = np.linalg.solve(An[np.ix_(free, free)], np.ones(free.sum()))
    np.testing.assert_allclose(np.asarray(x), xs, rtol=1e-8, atol=1e-9)


def test_windowed_rejects_nothing_but_matches_bandwidth():
    n = 300
    E, _ = _scattered_spd_ell(n, B=40)
    from fdapde_core_tpu.ops.window_spmv import window_bandwidth

    B = int(window_bandwidth(E.cols))
    assert 1 <= B <= 40
    Wop = WindowedELL.from_ell(E, block_rows=64)
    assert Wop.B % 128 == 0 and Wop.B >= B
    v = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    np.testing.assert_array_equal(np.asarray(Wop @ v), np.asarray(E @ v))


def test_windowed_astype_and_plan_rejects_scattered():
    """The scattered histogram really is the plan_split reject class."""
    from fdapde_core_tpu.ops.dia_split import plan_split_width

    n = 900
    E, _ = _scattered_spd_ell(n, B=120)
    W, amax = plan_split_width(E)
    assert W is None  # scattered: stays on the gather path
    Wop = WindowedELL.from_ell(E, block_rows=128)
    W32 = Wop.astype(jnp.float32)
    v = jnp.ones(n, jnp.float32)
    out = np.asarray(W32 @ v)
    ref = np.asarray(E.astype(jnp.float32) @ v)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
