"""LaneRoutedELL: the two-stage lane-gather SpMV for scattered bands.

Parity must be exact (f64) / float-exact (f32) against the plain ELL
gather on the class plan_split_width rejects — block-scrambled symmetric
permutations of FEM operators (the bench gen10m scattered control) and
random scattered bands. On CPU the pallas kernel runs in interpreter
mode; the scheduler is backend-independent jitted code.

Reference envelope anchor: fem_linear_elliptic_solver.h:38-47 (SparseLU
accepts any assembled topology at uniform cost)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.ops.matfree_soa import ELLSoA, MatrixFreeSoA
from fdapde_core_tpu.ops.pallas_gather_spmv import LaneRoutedELL


def _scrambled_fem_ell(n_side=96, S=512, G=397, dtype=jnp.float64):
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
        n_side, 0.2, dtype=jnp.float64)
    nd = (n_side + 1) ** 2
    op0, _ = MatrixFreeSoA.build(x, y, c0, c1, c2, nd, 8)
    E, _ = jax.jit(lambda o: o.to_ell(9))(op0)
    GI = pow(G, -1, S)
    nfull = (nd // S) * S
    i = jnp.arange(nd, dtype=jnp.int32)
    p = jnp.where(i < nfull, (i // S) * S + (G * (i % S)) % S, i)
    pinv = jnp.where(i < nfull, (i // S) * S + (GI * (i % S)) % S, i)
    E_sc = ELLSoA(E.vals[:, pinv].astype(dtype), p[E.cols[:, pinv]],
                  (nd, nd))
    return E_sc, bnd[pinv], nd


def test_lane_routed_parity_f64_scrambled_fem():
    E, bnd, nd = _scrambled_fem_ell()
    op = LaneRoutedELL.from_ell(E, p_max=12, rounds=12)
    # the schedule must route the overwhelming majority off the XLA path
    total = int((np.asarray(E.vals) != 0).sum())
    assert op.n_remainder < 0.1 * total, (op.n_remainder, total)
    rng = np.random.default_rng(0)
    for _ in range(2):
        v = jnp.asarray(rng.standard_normal(nd))
        np.testing.assert_allclose(
            np.asarray(op @ v), np.asarray(E @ v), rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(op.diagonal()), np.asarray(E.diagonal()),
        rtol=1e-14, atol=0)


def test_lane_routed_f32_and_astype():
    E, bnd, nd = _scrambled_fem_ell(n_side=64, S=256, G=89)
    E32 = E.astype(jnp.float32)
    op = LaneRoutedELL.from_ell(E32, p_max=12, rounds=12)
    v = jnp.asarray(
        np.random.default_rng(1).standard_normal(nd), jnp.float32)
    ref = np.asarray(E32 @ v)
    got = np.asarray(op @ v)
    assert np.abs(got - ref).max() <= 1e-5 * np.abs(ref).max()
    # astype down from an f64 build
    op64 = LaneRoutedELL.from_ell(E, p_max=12, rounds=12)
    got2 = np.asarray(op64.astype(jnp.float32) @ v)
    assert np.abs(got2 - ref).max() <= 1e-5 * np.abs(ref).max()


def test_lane_routed_through_dirichlet_cg():
    """Operator protocol end-to-end: DirichletSystem + chunked CG reach
    the same iterate as the plain ELL path (identical SpMV => identical
    Krylov trajectory up to float reassociation)."""
    from fdapde_core_tpu.fem.solvers import DirichletSystem
    from fdapde_core_tpu.linear_algebra.solvers import cg_chunked

    E, bnd, nd = _scrambled_fem_ell(n_side=64, S=256, G=89)
    op = LaneRoutedELL.from_ell(E, p_max=12, rounds=12)
    b = jnp.where(bnd, 0.0, 1.0) / nd
    sys_l = DirichletSystem(op, bnd)
    sys_r = DirichletSystem(E, bnd)
    xl, il = cg_chunked(sys_l, b, rtol=1e-10, maxiter=600, chunk=100)
    xr, ir = cg_chunked(sys_r, b, rtol=1e-10, maxiter=600, chunk=100)
    assert int(il.iterations) == int(ir.iterations)
    np.testing.assert_allclose(np.asarray(xl), np.asarray(xr),
                               rtol=1e-8, atol=1e-12)


def test_lane_routed_bandwidth_guard():
    n = 40000
    i = np.arange(n)
    cols = np.stack([i, np.clip(i + 20000, 0, n - 1)])  # band > 16384
    vals = np.ones((2, n))
    E = ELLSoA(jnp.asarray(vals), jnp.asarray(cols, jnp.int32), (n, n))
    with pytest.raises(ValueError, match="bandwidth"):
        LaneRoutedELL.from_ell(E, p_max=10, rounds=4)


def test_model_gather_kernel_lane():
    """Product-API opt-in: MatrixFreeElliptic(gather_kernel='lane') swaps
    the XLA gather SpMV for the lane-routed kernel when the split plan
    rejects the numbering; solutions match the default path."""
    from fdapde_core_tpu.models.matfree import MatrixFreeElliptic

    n_side = 48
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
        n_side, 0.2, dtype=jnp.float64)
    cells = jnp.stack([c0, c1, c2], axis=1)
    # force the gather path (skip the banded upgrade) to exercise lane
    m_ref = MatrixFreeElliptic((x, y), cells, bnd, K=1.0, c=0.5,
                               preconditioner="auxgrid")
    m_lane = MatrixFreeElliptic((x, y), cells, bnd, K=1.0, c=0.5,
                                preconditioner="auxgrid",
                                gather_kernel="lane")
    assert m_lane.preconditioner == "auxgrid+lane"
    b = m_ref.load_vector(jnp.ones(2 * n_side * n_side, jnp.float64))
    x1, i1, r1 = m_ref.solve(b, rtol=1e-10, maxiter=300)
    x2, i2, r2 = m_lane.solve(b, rtol=1e-10, maxiter=300)
    assert float(r1) < 1e-9 and float(r2) < 1e-9
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               rtol=1e-7, atol=1e-10)


def test_from_ell_rejects_p_max_leq_K():
    """Position uniqueness needs p_max > K (per-(row, chunk) ranks stay
    distinct mod p_max): smaller values silently double-booked output
    cells in round 4 — now a hard error."""
    E, bnd, nd = _scrambled_fem_ell(n_side=32, S=128, G=29)
    K = E.vals.shape[0]
    with pytest.raises(ValueError, match="p_max"):
        LaneRoutedELL.from_ell(E, p_max=K, rounds=4)
    with pytest.raises(ValueError, match="p_max"):
        LaneRoutedELL.from_ell(E, p_max=K - 3, rounds=4)


def test_lane_routed_bf16_storage():
    """bf16-stored tables: f32 accumulation, values rounded to bf16 —
    SpMV agrees with an explicitly bf16-rounded reference operator."""
    E, bnd, nd = _scrambled_fem_ell(n_side=64, S=256, G=89)
    op = LaneRoutedELL.from_ell(E, p_max=12, rounds=12)
    opb = op.astype(jnp.bfloat16)
    E_b = ELLSoA(E.vals.astype(jnp.bfloat16).astype(jnp.float32),
                 E.cols, E.shape)
    v = jnp.asarray(
        np.random.default_rng(3).standard_normal(nd), jnp.float32)
    ref = np.asarray(E_b @ v)
    got = np.asarray(opb @ v)
    assert got.dtype == np.float32
    assert np.abs(got - ref).max() <= 2e-2 * np.abs(ref).max()


def test_scheduler_runs_without_x64(tmp_path):
    """The int32 claim-table scheduler must produce correct tables with
    jax x64 DISABLED (the round-4 int64 packing silently overflowed
    int32 there)."""
    import subprocess
    import sys

    script = tmp_path / "lane_nox64.py"
    script.write_text(
        """
import numpy as np
import os

import jax
import jax.numpy as jnp
assert not jax.config.x64_enabled
from fdapde_core_tpu.ops.matfree_soa import ELLSoA
from fdapde_core_tpu.ops.pallas_gather_spmv import LaneRoutedELL

rng = np.random.default_rng(0)
n = 4096
K = 5
i = np.arange(n)
cols = np.stack([np.clip(i + d, 0, n - 1) for d in (-700, -3, 0, 5, 900)])
vals = rng.standard_normal((K, n)).astype(np.float32)
vals[cols == i[None, :]] = 4.0  # diagonal-ish, keep padding convention
E = ELLSoA(jnp.asarray(vals), jnp.asarray(cols, jnp.int32), (n, n))
op = LaneRoutedELL.from_ell(E, p_max=7, rounds=10)
v = jnp.asarray(rng.standard_normal(n), jnp.float32)
err = float(jnp.max(jnp.abs((op @ v) - (E @ v))))
ref = float(jnp.max(jnp.abs(E @ v)))
assert err <= 1e-4 * ref, (err, ref)
print("OK", err)
"""
    )
    env = dict(os.environ)
    env.update({
        "FDAPDE_TPU_X64": "0",
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_ENABLE_X64": "0",
        "PYTHONPATH": "/root/repo",
    })
    out = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True,
        text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_model_lane_tables_are_f32_with_f64_input():
    """ADVICE r4: f64 lane tables fail the TPU server-side compile; the
    model must cast tables to f32, keep the f64 ELL for refinement, and
    still converge to f64-class true residuals."""
    from fdapde_core_tpu.models.matfree import MatrixFreeElliptic

    n_side = 32
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
        n_side, 0.2, dtype=jnp.float64)
    cells = jnp.stack([c0, c1, c2], axis=1)
    m = MatrixFreeElliptic((x, y), cells, bnd, K=1.0, c=0.5,
                           preconditioner="auxgrid", gather_kernel="lane")
    assert m.op.VALS.dtype == jnp.float32
    assert m.op_ref.vals.dtype == jnp.float64
    b = m.load_vector(jnp.ones(2 * n_side * n_side, jnp.float64))
    xs, it, rel = m.solve(b, rtol=1e-11, maxiter=400, chunk=25)
    assert rel < 1e-11, rel  # beyond f32: proves refinement is real
    assert xs.dtype == jnp.float64


def test_with_vals_schedule_reuse():
    """Schedule reuse (round-5): a new operator sharing the cols (here a
    reaction/mass-augmented system matrix) rebuilds only the value
    tables — exact SpMV parity with a freshly scheduled operator."""
    E, bnd, nd = _scrambled_fem_ell(n_side=48, S=256, G=89)
    op = LaneRoutedELL.from_ell(E, p_max=12, rounds=12, keep_remap=True)
    d = jnp.asarray(np.random.default_rng(5).uniform(0.5, 2.0, nd))
    S_ell = E.with_added_diagonal(d)
    opS = op.with_vals(S_ell)
    assert opS.n_remainder == op.n_remainder
    v = jnp.asarray(np.random.default_rng(6).standard_normal(nd))
    np.testing.assert_allclose(np.asarray(opS @ v),
                               np.asarray(S_ell @ v),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(opS.diagonal()),
                               np.asarray(S_ell.diagonal()), rtol=1e-14)
    # base op must not require remap retention
    op2 = LaneRoutedELL.from_ell(E, p_max=12, rounds=12)
    with pytest.raises(ValueError, match="remap"):
        op2.with_vals(S_ell)


def test_lane_parabolic_implicit_euler_steps():
    """Scattered-topology parabolic stepping through the lane kernel:
    S = A + M_lump/dt via schedule reuse, warm-started chunked CG per
    implicit-Euler step — iterates match the plain ELL path."""
    from fdapde_core_tpu.fem.solvers import DirichletSystem
    from fdapde_core_tpu.linear_algebra.solvers import cg_chunked

    E, bnd, nd = _scrambled_fem_ell(n_side=32, S=128, G=29)
    dt = 1e-3
    ml = jnp.full((nd,), 1.0 / nd)  # lumped mass scale
    S_ell = E.with_added_diagonal(ml / dt)
    op = LaneRoutedELL.from_ell(E, p_max=12, rounds=12, keep_remap=True)
    opS = op.with_vals(S_ell)

    sys_lane = DirichletSystem(opS, bnd)
    sys_ell = DirichletSystem(S_ell, bnd)
    u_l = jnp.where(bnd, 0.0, 1.0)
    u_e = u_l
    f = jnp.ones(nd) / nd
    for _ in range(3):
        rhs_l = (ml / dt) * u_l + f
        rhs_e = (ml / dt) * u_e + f
        u_l, _ = cg_chunked(sys_lane, jnp.where(bnd, 0.0, rhs_l),
                            x0=u_l, rtol=1e-12, maxiter=400, chunk=50)
        u_e, _ = cg_chunked(sys_ell, jnp.where(bnd, 0.0, rhs_e),
                            x0=u_e, rtol=1e-12, maxiter=400, chunk=50)
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_e),
                               rtol=1e-9, atol=1e-12)
    assert bool(jnp.isfinite(u_l).all())


def test_fused_vs_split_schedule_parity():
    """The single-program fused build (round 5: one compile-roulette
    spin instead of three for small/mid task counts) routes to the same
    SpMV as the three-program split."""
    E, bnd, nd = _scrambled_fem_ell(n_side=64, S=256, G=89)
    op_f = LaneRoutedELL.from_ell(E, p_max=12, rounds=12, fuse=True)
    op_s = LaneRoutedELL.from_ell(E, p_max=12, rounds=12, fuse=False)
    v = jnp.asarray(np.random.default_rng(7).standard_normal(nd))
    ref = np.asarray(E @ v)
    np.testing.assert_allclose(np.asarray(op_f @ v), ref, rtol=1e-13,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(op_s @ v), ref, rtol=1e-13,
                               atol=1e-13)


def test_rectangular_near_square_operator():
    """Rectangular (n x n_src, n_src != n) banded operators route: the
    aux-grid interpolation P/P^T shape class (round 5)."""
    rng = np.random.default_rng(5)
    n, n_src, K = 3000, 3101, 4
    rows = np.arange(n)
    cols = np.clip(rows[None, :] + rng.integers(-40, 140, size=(K, n)),
                   0, n_src - 1).astype(np.int32)
    vals = rng.standard_normal((K, n))
    vals[0, 7] = 0.0  # dead entry: never routed
    E = ELLSoA(jnp.asarray(vals), jnp.asarray(cols), (n, n_src))
    op = LaneRoutedELL.from_ell(E)
    assert op.shape == (n, n_src)
    v = jnp.asarray(rng.standard_normal(n_src))
    np.testing.assert_allclose(np.asarray(op @ v), np.asarray(E @ v),
                               rtol=1e-13, atol=1e-13)


def test_per_chunk_budgets_parity_and_capacity_filter():
    """Per-chunk pass budgets (round 5): an explicit tuple routes to
    the same SpMV; a deliberately starved side budget stays EXACT via
    the capacity filter (excess ranks -> COO remainder, no silent
    double-booking)."""
    E, bnd, nd = _scrambled_fem_ell(n_side=64, S=256, G=89)
    v = jnp.asarray(np.random.default_rng(9).standard_normal(nd))
    ref = np.asarray(E @ v)
    op_t = LaneRoutedELL.from_ell(E, p_max=(6, 12, 6), rounds=12)
    np.testing.assert_allclose(np.asarray(op_t @ v), ref, rtol=1e-13,
                               atol=1e-13)
    # starved: budgets below the per-row chunk counts
    op_s = LaneRoutedELL.from_ell(E, p_max=(2, 3, 2), rounds=12)
    assert op_s.n_remainder > op_t.n_remainder
    np.testing.assert_allclose(np.asarray(op_s @ v), ref, rtol=1e-13,
                               atol=1e-13)
    with pytest.raises(ValueError, match=r"\[2, 31\]"):
        LaneRoutedELL.from_ell(E, p_max=(1, 12, 6))
