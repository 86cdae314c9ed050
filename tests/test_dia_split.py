"""Banded-DIA + ELL-remainder split (ops/dia_split.py): exactness vs the
assembled ELL operator, auto width planning, Dirichlet fold, and the
padded-state CG driver."""

import jax.numpy as jnp
import pytest
import numpy as np

from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.ops.dia_split import (
    BandedSplit,
    banded_cg,
    build_banded_split,
    plan_split_width,
)
from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA


def _ell_operator(n=24):
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(n, 0.2)
    n_dofs = (n + 1) ** 2
    op, over = MatrixFreeSoA.build(x, y, c0, c1, c2, n_dofs, 8)
    assert not bool(over)
    E, overc = op.to_ell(9)
    assert not bool(overc)
    return E, bnd, n_dofs


@pytest.mark.slow
def test_plan_picks_band_width():
    E, _, n_dofs = _ell_operator(24)
    W, amax = plan_split_width(E)
    # node ids are i*(n+1)+j: the dominant off-lane offset is m = 25
    assert W == 25
    assert amax == 1


@pytest.mark.slow
def test_split_is_exact():
    E, _, n_dofs = _ell_operator(24)
    W, amax = plan_split_width(E)
    op, over = build_banded_split(E, W, amax=amax)
    assert not bool(over)  # quad-split mesh: stencil window captures all
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(n_dofs))
    np.testing.assert_allclose(
        np.asarray(op @ v), np.asarray(E @ v), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.diagonal()), np.asarray(E.diagonal()),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.slow
def test_split_remainder_on_narrow_window():
    """Force a too-small stencil window: the remainder must carry the rest
    and the split must still be exact."""
    E, _, n_dofs = _ell_operator(16)
    W, _ = plan_split_width(E)
    op, over = build_banded_split(E, W, amax=0, bmax=1, max_rem=6)
    assert not bool(over)
    assert bool(jnp.any(op.rem.vals != 0.0))  # off-band rows really remain
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal(n_dofs))
    np.testing.assert_allclose(
        np.asarray(op @ v), np.asarray(E @ v), rtol=1e-12, atol=1e-12
    )


@pytest.mark.slow
def test_fold_dirichlet_and_cg():
    from fdapde_core_tpu.fem.solvers import DirichletSystem

    E, bnd, n_dofs = _ell_operator(24)
    W, amax = plan_split_width(E)
    op, _ = build_banded_split(E, W, amax=amax)
    folded = op.fold_dirichlet(bnd)

    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(n_dofs))
    ref = DirichletSystem(E, bnd)
    np.testing.assert_allclose(
        np.asarray(folded @ v), np.asarray(ref(v)), rtol=1e-12, atol=1e-12
    )

    b = jnp.where(bnd, 0.0, 1.0) / (24.0 * 24.0)
    x, rnorm, ok = banded_cg(folded, b, 400)
    assert bool(ok)
    res = folded @ x - b
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    assert rel < 1e-8
    # boundary dofs pinned to the rhs values (here 0)
    assert float(jnp.max(jnp.abs(jnp.where(bnd, x, 0.0)))) == 0.0


@pytest.mark.slow
def test_bf16_storage_cg_tracks_f32():
    """bf16-STORED banded layers with f32 vectors (bench gen10m stage 5c):
    the stencil apply casts layers up, so the CG runs on the bf16-rounded
    operator (~4e-3 relative) — iterates must track the f32 solve to that
    order and boundary pinning must survive the cast."""
    import jax

    from fdapde_core_tpu.fem.solvers import DirichletSystem  # noqa: F401

    E, bnd, n_dofs = _ell_operator(16)
    W, amax = plan_split_width(E)
    op, _ = build_banded_split(E, W, amax=amax)
    F32 = jax.jit(lambda S, b_: S.astype(jnp.float32).fold_dirichlet(b_))(
        op, bnd)
    F16 = jax.jit(lambda S: S.astype(jnp.bfloat16))(F32)
    inv_d32 = 1.0 / F32.diagonal()

    b = (jnp.where(bnd, 0.0, 1.0) / (16.0 * 16.0)).astype(jnp.float32)
    x32, _, _ = banded_cg(F32, b, 200, inv_diag=inv_d32)
    x16, _, _ = banded_cg(F16, b, 200, inv_diag=inv_d32)
    assert x16.dtype == jnp.float32  # vectors stay f32 under bf16 layers
    rel = float(jnp.linalg.norm(x16 - x32) / jnp.linalg.norm(x32))
    assert rel < 2e-2
    assert float(jnp.max(jnp.abs(jnp.where(bnd, x16, 0.0)))) == 0.0


def test_drop_empty_remainder_exact():
    """When the band captures every entry (rem_nnz == 0) the band-only
    operator is exact — no gathers paid to multiply zeros."""
    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
    from fdapde_core_tpu.ops.dia_split import (
        banded_cg,
        build_banded_split,
        plan_split_width,
    )
    from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA

    n = 16
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(n, 0.2,
                                                      dtype=jnp.float64)
    nd = (n + 1) ** 2
    op, _ = MatrixFreeSoA.build(x, y, c0, c1, c2, nd, 8)
    E, _ = jax.jit(lambda o: o.to_ell(9))(op)
    W, amax = plan_split_width(E)
    S, over = jax.jit(lambda E_: build_banded_split(E_, W, amax=amax))(E)
    rem_nnz = int(jnp.sum(S.rem.vals != 0.0))
    assert rem_nnz == 0 and not bool(over)
    S0 = S.drop_empty_remainder()
    v = jnp.asarray(np.random.default_rng(0).standard_normal(nd))
    np.testing.assert_array_equal(np.asarray(S @ v), np.asarray(S0 @ v))
    np.testing.assert_array_equal(np.asarray(S.diagonal()),
                                  np.asarray(S0.diagonal()))
    F = S0.fold_dirichlet(bnd)
    b = jnp.where(bnd, 0.0, 1.0)
    xs, rn, _ = jax.jit(lambda F_, b_: banded_cg(F_, b_, 200))(F, b)
    assert float(rn) < 1e-10


@pytest.mark.slow
def test_banded_mg_preconditioner_h_independent():
    """BandedMGPreconditioner: zero-gather V-cycle on the (R, W) banded
    grid — PCG converges in O(10) iterations independent of h, and beats
    the aux-grid iteration count on the quasi-uniform mesh."""
    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
    from fdapde_core_tpu.linear_algebra.solvers import cg
    from fdapde_core_tpu.ops.dia_split import (
        BandedMGPreconditioner,
        build_banded_split,
        plan_split_width,
    )
    from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA

    iters = {}
    for n in (64, 128):
        x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
            n, 0.2, dtype=jnp.float64
        )
        nd = (n + 1) ** 2
        op, _ = MatrixFreeSoA.build(x, y, c0, c1, c2, nd, 8)
        E, _ = jax.jit(lambda o: o.to_ell(9))(op)
        W, amax = plan_split_width(E)
        assert W is not None
        S, _ = jax.jit(lambda E_: build_banded_split(E_, W, amax=amax))(E)
        F = S.fold_dirichlet(bnd).drop_empty_remainder()
        pre = BandedMGPreconditioner.build(F, dtype=jnp.float64, coarse_n=16)
        assert pre is not None
        b = jnp.where(bnd, 0.0, 1.0) / (n * n)
        xs, info = cg(F, b, M_inv=pre, rtol=1e-9, maxiter=100)
        assert bool(info.converged)
        res = b - F @ xs
        rel = float(jnp.sqrt(jnp.sum(res * res) / jnp.sum(b * b)))
        assert rel < 1e-8
        iters[n] = int(info.iterations)
    assert iters[128] <= iters[64] + 3, iters  # h-independence
    assert iters[128] <= 12, iters


def test_plan_rejects_scattered_band():
    """A genuinely scattered band (random sparse couplings) must be
    rejected by the coverage guard — no absurd many-layer windows."""
    import jax.numpy as jnp

    from fdapde_core_tpu.ops.dia_split import plan_split_width
    from fdapde_core_tpu.ops.matfree_soa import ELLSoA

    rng = np.random.default_rng(5)
    n, K = 4000, 9
    cols = np.minimum(
        n - 1,
        np.maximum(0, np.arange(n)[None, :] + rng.integers(-180, 181, (K, n))),
    ).astype(np.int32)
    vals = rng.standard_normal((K, n))
    E = ELLSoA(jnp.asarray(vals), jnp.asarray(cols), (n, n))
    W, amax = plan_split_width(E)
    assert W is None and amax == 0


@pytest.mark.slow
def test_3d_banded_split_and_mg():
    """3D two-spacing split: plan finds (W1, W2) = (m, m^2) from the
    histogram alone, the split is exact, and the 3D banded-MG PCG beats
    plain CG with zero gathers in the V-cycle."""
    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.fem.solvers import DirichletSystem
    from fdapde_core_tpu.geometry.structured import cube_mesh_device
    from fdapde_core_tpu.linear_algebra.solvers import cg
    from fdapde_core_tpu.ops.dia_split3d import (
        BandedMGPreconditioner3D,
        build_banded_split_3d,
        plan_split_3d,
    )
    from fdapde_core_tpu.ops.ell import ELLMatrix
    from fdapde_core_tpu.ops.matfree import (
        MatrixFreeLocal,
        p1_local_stiffness_3d,
    )
    from fdapde_core_tpu.ops.matfree_soa import ELLSoA

    n = 10
    nodes, cells, bnd = jax.jit(
        lambda a: cube_mesh_device(n, a, dtype=jnp.float64)
    )(0.2)
    nd = (n + 1) ** 3
    A_loc = p1_local_stiffness_3d(nodes, cells)
    mf, over = MatrixFreeLocal.build(A_loc, cells, nd, 24)
    assert not bool(over)
    E, overc = jax.jit(
        lambda op: ELLMatrix.from_local(op.A_loc, op.dofs, op.adj,
                                        op.adj_mask, 15)
    )(mf)
    assert not bool(overc)
    Es = jax.jit(lambda v, c: ELLSoA(v.T, c.T, E.shape))(E.vals, E.cols)

    W1, W2 = plan_split_3d(Es)
    assert (W1, W2) == (n + 1, (n + 1) ** 2)
    S, over2 = jax.jit(lambda E_: build_banded_split_3d(E_, W1, W2))(Es)
    assert not bool(over2)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(nd))
    np.testing.assert_array_equal(np.asarray(S @ v), np.asarray(Es @ v))
    assert int(jnp.sum(S.rem.vals != 0.0)) == 0
    S = S.drop_empty_remainder()

    F = jax.jit(lambda S_, b_: S_.astype(jnp.float64).fold_dirichlet(b_))(
        S, bnd
    )
    pre = BandedMGPreconditioner3D.build(F, dtype=jnp.float64, coarse_n=4)
    assert pre is not None
    b = jnp.where(bnd, 0.0, 1.0)
    sys_ = DirichletSystem(S, bnd)
    x1, i1 = cg(sys_, b, M_inv=pre, rtol=1e-10, maxiter=200)
    assert bool(i1.converged)
    x2, i2 = cg(sys_, b, rtol=1e-10, maxiter=2000)
    assert int(i1.iterations) * 3 < int(i2.iterations)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)


def test_3d_model_auto_banded():
    """MatrixFreePoisson on a 3D cube mesh auto-detects the two-spacing
    band and rides the 3D split + MG3D pair."""
    import jax
    import jax.numpy as jnp

    from fdapde_core_tpu.geometry.structured import cube_mesh_device
    from fdapde_core_tpu.models.matfree import MatrixFreePoisson

    n = 8
    nodes, cells, bnd = jax.jit(
        lambda a: cube_mesh_device(n, a, dtype=jnp.float64)
    )(0.2)
    m = MatrixFreePoisson(nodes, cells, bnd, grid_n=n)
    assert m.preconditioner == "banded_mg"
    g = nodes[:, 0] + 2 * nodes[:, 1] - nodes[:, 2]
    x, it, rel = m.solve(jnp.zeros(m.n_dofs), g=g, rtol=1e-11, maxiter=200)
    assert float(rel) < 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(g), atol=1e-8)


def test_banded_cg_breakdown_flag():
    """banded_cg must REPORT a breakdown (VERDICT r3 weak #6): on an
    indefinite/negative-definite operator pAp <= 0, the guarded loop
    freezes the iterate, and ok=False is the caller's only signal that
    the returned x is stale."""
    import jax

    from fdapde_core_tpu.fem.solvers import DirichletSystem  # noqa: F401
    from fdapde_core_tpu.ops.dia_split import BandedSplit
    from fdapde_core_tpu.ops.grid_dia import GridDIAMatrix

    E, bnd, n_dofs = _ell_operator(12)
    W, amax = plan_split_width(E)
    S, _ = build_banded_split(E, W, amax=amax)
    F = S.fold_dirichlet(bnd)
    neg = BandedSplit(
        GridDIAMatrix(-F.G.data, F.G.offsets2d, F.G.shape2d),
        None if F.rem is None else type(F.rem)(
            -F.rem.vals, F.rem.cols, F.rem.shape),
        F.n,
    )
    b = jnp.where(bnd, 0.0, 1.0)
    x, rn, ok = jax.jit(lambda A, b_: banded_cg(A, b_, 20))(neg, b)
    assert not bool(ok)
    # healthy SPD solve still reports ok
    x2, rn2, ok2 = jax.jit(lambda A, b_: banded_cg(A, b_, 20))(F, b)
    assert bool(ok2)
