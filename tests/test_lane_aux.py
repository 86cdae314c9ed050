"""Lane-routed aux-grid application (ops/lane_aux.py).

The preconditioner application must be EXACTLY the AuxGridPreconditioner
result (same P, P^T, V-cycle, Jacobi term — only the gather engine and
the grid-flat numbering change), so PCG trajectories are float-identical
up to reassociation. On CPU the pallas stages run in interpreter mode.

Reference anchor: preconditioner application of the iterative
replacement for SparseLU (fem_linear_elliptic_solver.h:38-47).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.fem.solvers import DirichletSystem
from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner
from fdapde_core_tpu.ops.lane_aux import LaneAuxGrid, interp_transpose_ell
from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA


def _mesh_aux(n_side=48, dtype=jnp.float32):
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
        n_side, 0.2, dtype=jnp.float64)
    nd = (n_side + 1) ** 2
    op, _ = MatrixFreeSoA.build(x, y, c0, c1, c2, nd, 8)
    E, _ = jax.jit(lambda o: o.to_ell(9))(op)
    E32 = E.astype(dtype)
    diag = jax.jit(
        lambda E_, b_: DirichletSystem(E_, b_).diagonal().astype(dtype)
    )(E32, bnd)
    aux = AuxGridPreconditioner.build_device((x, y), diag, dtype=dtype)
    return E32, bnd, aux, nd


def test_transpose_ell_adjoint():
    """P^T built by the sort-based transpose IS the adjoint of P:
    <P z, r> == <z, P^T r> for random vectors."""
    _, _, aux, nd = _mesh_aux(n_side=24)
    m = aux.n_grid + 1
    PT, ovf, _loads = interp_transpose_ell(aux.idx, aux.w, nd, m * m)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(nd), jnp.float32)
    z = jnp.asarray(rng.standard_normal(m * m), jnp.float32)
    Pz = (z[aux.idx] * aux.w).sum(axis=0)  # reference P apply
    PTr = PT @ r
    if ovf is not None:  # capped rows: add the overflow COO
        (orow, ocol, oval), _nr = ovf
        PTr = PTr.at[orow].add(oval * r[ocol], mode="drop")
    np.testing.assert_allclose(
        float(jnp.vdot(Pz.astype(jnp.float64), r.astype(jnp.float64))),
        float(jnp.vdot(z.astype(jnp.float64), PTr.astype(jnp.float64))),
        rtol=1e-4)  # f32 products, f64 accumulation


def test_lane_aux_apply_parity():
    """LaneAuxGrid(r) == AuxGridPreconditioner(r) to float accuracy."""
    _, bnd, aux, nd = _mesh_aux()
    lane_aux = LaneAuxGrid.from_aux(aux)
    rng = np.random.default_rng(1)
    for _ in range(2):
        r = jnp.asarray(rng.standard_normal(nd), jnp.float32)
        ref = np.asarray(aux(r))
        got = np.asarray(jax.jit(lambda la, r_: la(r_))(lane_aux, r))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= 2e-5 * scale


def test_lane_aux_split_stages_cg():
    """cg_split_programs with the staged preconditioner reaches the
    same solution as with the plain aux (same math, staged programs)."""
    from fdapde_core_tpu.linear_algebra.solvers import cg_split_programs

    E32, bnd, aux, nd = _mesh_aux()
    lane_aux = LaneAuxGrid.from_aux(aux)
    sys32 = DirichletSystem(E32, bnd)
    b = jnp.where(bnd, 0.0, 1.0).astype(jnp.float32) / nd
    x_ref, info_ref = cg_split_programs(sys32, b, aux, rtol=1e-6,
                                        maxiter=200)
    x_lane, info_lane = cg_split_programs(sys32, b, lane_aux, rtol=1e-6,
                                          maxiter=200)
    assert bool(info_lane.converged)
    # identical preconditioner => nearly identical trajectory
    assert abs(int(info_lane.iterations) - int(info_ref.iterations)) <= 3
    np.testing.assert_allclose(np.asarray(x_lane), np.asarray(x_ref),
                               atol=5e-5 * float(jnp.abs(x_ref).max()))


def test_lane_aux_perm_matches_unpermuted():
    """The internal strip permutation variant is the same preconditioner
    (P Pi^T Pi = P): applies agree with the direct build."""
    from fdapde_core_tpu.geometry.refine_device import strip_order

    E32, bnd, aux, nd = _mesh_aux()
    # scramble has no effect here (small mesh, single window tile): we
    # only verify the perm plumbing is the identity transformation
    x = jnp.asarray(np.random.default_rng(2).standard_normal(nd))
    order, rank = strip_order(
        x, jnp.asarray(np.random.default_rng(3).standard_normal(nd)), 64)
    lane_aux = LaneAuxGrid.from_aux(aux, perm=(order, rank))
    r = jnp.asarray(np.random.default_rng(4).standard_normal(nd),
                    jnp.float32)
    ref = np.asarray(aux(r))
    got = np.asarray(jax.jit(lambda la, r_: la(r_))(lane_aux, r))
    assert np.abs(got - ref).max() <= 2e-5 * np.abs(ref).max()


def test_transpose_cap_overflow_exact():
    """Capping K_T below the max degree moves the excess to a COO
    overflow whose sum restores the exact adjoint (and the LaneAuxGrid
    built with a tiny cap still matches the reference apply)."""
    _, _, aux, nd = _mesh_aux(n_side=16)
    m = aux.n_grid + 1
    PT, ovf, _loads = interp_transpose_ell(aux.idx, aux.w, nd, m * m,
                                           k_cap=1)
    assert ovf is not None
    rng = np.random.default_rng(6)
    r = jnp.asarray(rng.standard_normal(nd), jnp.float32)
    z = jnp.asarray(rng.standard_normal(m * m), jnp.float32)
    Pz = (z[aux.idx] * aux.w).sum(axis=0)
    (orow, ocol, oval), _nr = ovf
    PTr = (PT @ r).at[orow].add(oval * r[ocol], mode="drop")
    np.testing.assert_allclose(
        float(jnp.vdot(Pz.astype(jnp.float64), r.astype(jnp.float64))),
        float(jnp.vdot(z.astype(jnp.float64), PTr.astype(jnp.float64))),
        rtol=1e-4)
    lane_aux = LaneAuxGrid.from_aux(aux, k_cap=1)
    ref = np.asarray(aux(r))
    got = np.asarray(jax.jit(lambda la, r_: la(r_))(lane_aux, r))
    assert np.abs(got - ref).max() <= 2e-5 * np.abs(ref).max()


def test_model_aux_kernel_lane_converges():
    """MatrixFreeElliptic(gather_kernel='lane', aux_kernel='lane')
    converges to the reference-path solution."""
    from fdapde_core_tpu.models.matfree import MatrixFreeElliptic

    n_side = 24
    x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(
        n_side, 0.2, dtype=jnp.float64)
    nodes = (x, y)
    cells = jnp.stack([c0, c1, c2], axis=1)
    m_ref = MatrixFreeElliptic(nodes, cells, bnd)
    # preconditioner="auxgrid": skip the banded upgrade (this lattice
    # numbering would otherwise take it) so the lane path engages
    m_lane = MatrixFreeElliptic(nodes, cells, bnd, gather_kernel="lane",
                                aux_kernel="lane",
                                preconditioner="auxgrid")
    from fdapde_core_tpu.ops.lane_aux import LaneAuxGrid as LAG

    assert isinstance(m_lane.aux, LAG)
    b = jnp.where(bnd, 0.0, 1.0) / ((n_side + 1) ** 2)
    x_ref, it_ref, rel_ref = m_ref.solve(b, rtol=1e-8)
    x_l, it_l, rel_l = m_lane.solve(b, rtol=1e-8)
    assert float(rel_l) <= 1e-8
    np.testing.assert_allclose(
        np.asarray(x_l), np.asarray(x_ref),
        atol=1e-7 * max(1e-30, float(jnp.abs(x_ref).max())))
