"""Geometric multigrid (ops/grid_mg.py): Galerkin coarsening, V-cycle
preconditioner SPD-ness, h-independent MG-CG convergence."""

import jax.numpy as jnp
import pytest
import numpy as np

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
from fdapde_core_tpu.fem.assembler import assemble_forcing
from fdapde_core_tpu.geometry.structured import unit_square_mesh
from fdapde_core_tpu.linear_algebra.dia import dia_from_coo, unique_offsets
from fdapde_core_tpu.ops.grid_dia import (
    GridDIAMatrix,
    prune_zero_offsets_grid,
)
from fdapde_core_tpu.ops.grid_mg import (
    GridMG,
    galerkin_coarsen,
    mg_preconditioned_cg,
)


def _poisson_grid(n):
    mesh = unit_square_mesh(n)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    offs = unique_offsets(space.dofs)
    D = dia_from_coo(A.rows, A.cols, A.vals, space.n_dofs, offs)
    free = jnp.asarray(~mesh.boundary_nodes, jnp.float64)
    G = prune_zero_offsets_grid(
        GridDIAMatrix.from_dia(D, (n + 1, n + 1)).with_dirichlet_identity(free)
    )
    b = jnp.asarray(assemble_forcing(space, lambda x: 1.0)).reshape(-1) * free
    return G, b


def _dense_from_grid(G):
    mx, my = G.shape2d
    n = mx * my
    M = np.zeros((n, n))
    data = np.asarray(G.data)
    for k, (di, dj) in enumerate(G.offsets2d):
        for i in range(mx):
            for j in range(my):
                ii, jj = i + di, j + dj
                if 0 <= ii < mx and 0 <= jj < my:
                    M[i * my + j, ii * my + jj] = data[k, i, j]
    return M


@pytest.mark.slow
def test_galerkin_coarsen_is_ptap():
    """A_c == P^T A P with the explicit dense bilinear prolongation."""
    n = 8
    G, _ = _poisson_grid(n)
    Gc = galerkin_coarsen(G)
    m, mc = n + 1, n // 2 + 1
    W = {-1: 0.5, 0: 1.0, 1: 0.5}
    P = np.zeros((m * m, mc * mc))
    for I in range(mc):
        for J in range(mc):
            for a in (-1, 0, 1):
                for b in (-1, 0, 1):
                    i, j = 2 * I + a, 2 * J + b
                    if 0 <= i < m and 0 <= j < m:
                        P[i * m + j, I * mc + J] = W[a] * W[b]
    Af = _dense_from_grid(G)
    Ac_ref = P.T @ Af @ P
    Ac = _dense_from_grid(Gc)
    np.testing.assert_allclose(Ac, Ac_ref, atol=1e-12)


@pytest.mark.slow
def test_v_cycle_is_spd_preconditioner():
    """<u, M v> == <M u, v> and <v, M v> > 0 (validity inside CG)."""
    G, _ = _poisson_grid(16)
    mg = GridMG.build(G, coarse_n=4)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=G.n))
    v = jnp.asarray(rng.normal(size=G.n))
    Mu = mg.v_cycle(u)
    Mv = mg.v_cycle(v)
    s1 = float(jnp.vdot(u, Mv))
    s2 = float(jnp.vdot(Mu, v))
    assert abs(s1 - s2) < 1e-10 * max(abs(s1), 1.0)
    assert float(jnp.vdot(v, Mv)) > 0


@pytest.mark.slow
def test_mgcg_h_independent_convergence():
    """Iteration count stays ~constant across mesh refinement, solution
    matches a long Jacobi-CG reference."""
    from fdapde_core_tpu.ops.grid_cg import grid_cg

    iters = {}
    for n in (16, 32, 64):
        G, b = _poisson_grid(n)
        x, rel, k = mg_preconditioned_cg(
            G, b, rtol=1e-10, maxiter=100, coarse_n=4
        )
        iters[n] = int(k)
        assert float(rel) < 1e-10
        xr, _ = grid_cg(G, b, 20000)
        err = np.abs(np.asarray(x) - np.asarray(xr)).max()
        assert err < 1e-9 * max(1.0, np.abs(np.asarray(xr)).max())
    assert max(iters.values()) <= 10, iters
    assert max(iters.values()) - min(iters.values()) <= 2, iters


@pytest.mark.slow
def test_structured_poisson_model_matches_general_path():
    """StructuredPoisson (fast pipeline incl. MG) == the general PDE path."""
    import fdapde_core_tpu as fdm
    from fdapde_core_tpu.models import StructuredPoisson

    n = 16
    model = StructuredPoisson(n, dtype=jnp.float64, coarse_n=4)

    # f = 1, homogeneous Dirichlet, vs the general assembler/solver
    x, rel, k = model.solve(rtol=1e-11, maxiter=60)
    assert float(rel) < 1e-11 and int(k) <= 12

    mesh = unit_square_mesh(n)
    pde = fdm.PDE(mesh, -fdm.laplacian(), order=1)
    pde.set_dirichlet_bc(np.zeros(pde.n_dofs))
    pde.set_forcing(np.ones((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    ref = np.asarray(pde.solution()).reshape(-1)
    assert np.abs(np.asarray(x) - ref).max() < 1e-10

    # harmonic reproduction: f = 0, g = x + y -> u == g
    g = mesh.nodes.sum(axis=1)
    b = model.rhs(0.0, g=jnp.asarray(g))
    xh, relh, kh = model.solve(b=b, rtol=1e-11, maxiter=60)
    assert np.abs(np.asarray(xh) - g).max() < 1e-10

    # f64 refinement wrapper converges too (x64 is on in the test env)
    xr, relr, kr = model.solve(refine=True, rtol=1e-11)
    assert float(relr) < 1e-11
    assert np.abs(np.asarray(xr) - ref).max() < 1e-10


@pytest.mark.slow
def test_mgcg_variable_coefficient_diffusion():
    """Galerkin coarsening needs no rediscretization: MG-CG converges fast
    for variable anisotropic diffusion (full 7-point stencil, no zero
    layers to prune)."""

    def K(x):
        return np.array(
            [[1.0 + 2.0 * x[0] ** 2, 0.3 * x[0] * x[1]],
             [0.3 * x[0] * x[1], 1.0 + x[1] ** 2]]
        )

    iters = {}
    for n in (16, 32):
        mesh = unit_square_mesh(n)
        space = FEMSpace(mesh, 1)
        A = assemble_matrix(space, -fdm.diffusion(K))
        offs = unique_offsets(space.dofs)
        D = dia_from_coo(A.rows, A.cols, A.vals, space.n_dofs, offs)
        free = jnp.asarray(~mesh.boundary_nodes, jnp.float64)
        G = prune_zero_offsets_grid(
            GridDIAMatrix.from_dia(D, (n + 1, n + 1)).with_dirichlet_identity(
                free
            )
        )
        assert len(G.offsets2d) == 7  # anisotropy keeps the hypotenuse layer
        b = (
            jnp.asarray(assemble_forcing(space, lambda x: 1.0)).reshape(-1)
            * free
        )
        x, rel, k = mg_preconditioned_cg(
            G, b, rtol=1e-10, maxiter=100, coarse_n=4
        )
        iters[n] = int(k)
        assert float(rel) < 1e-10
        from fdapde_core_tpu.ops.grid_cg import grid_cg

        xr, _ = grid_cg(G, b, 30000)
        err = np.abs(np.asarray(x) - np.asarray(xr)).max()
        assert err < 1e-9 * max(1.0, np.abs(np.asarray(xr)).max())
    assert max(iters.values()) <= 14, iters


@pytest.mark.slow
def test_3d_cube_stencil_fast_path():
    """Freudenthal cube mesh: closed-form tet assembly -> scatter-free 3D
    stencil == assembled sparse operator; pruned 7-point CG == general
    elliptic solve; harmonic reproduction."""
    from fdapde_core_tpu.fem.solvers import solve_elliptic
    from fdapde_core_tpu.geometry.structured import unit_cube_mesh
    from fdapde_core_tpu.ops.closed_form import p1_stiffness_3d_sym
    from fdapde_core_tpu.ops.grid3d import (
        grid_cg3d,
        p1_cube_stencil,
        prune_zero_offsets_grid3d,
    )

    n = 6
    mesh = unit_cube_mesh(n)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    p = mesh.nodes[mesh.cells]
    e = np.concatenate(
        [(p[:, 1] - p[:, 0]).T, (p[:, 2] - p[:, 0]).T, (p[:, 3] - p[:, 0]).T],
        axis=0,
    )
    A10 = p1_stiffness_3d_sym(jnp.asarray(e))
    G = p1_cube_stencil(A10, n)
    assert len(G.offsets3d) == 15

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=space.n_dofs))
    assert np.abs(np.asarray(G @ x) - np.asarray(A @ x)).max() < 1e-12

    free = jnp.asarray(~mesh.boundary_nodes, jnp.float64)
    Gm = prune_zero_offsets_grid3d(G.with_dirichlet_identity(free))
    assert len(Gm.offsets3d) == 7  # uniform Freudenthal == 7-point Laplacian

    F = assemble_forcing(space, lambda x: 1.0)
    mask = jnp.asarray(space.boundary_dofs)
    ref, _ = solve_elliptic(A, F, mask, jnp.zeros(space.n_dofs), rtol=1e-12)
    xs, res = grid_cg3d(Gm, jnp.asarray(F).reshape(-1) * free, 600)
    assert np.abs(np.asarray(xs) - np.asarray(ref)).max() < 1e-9

    # harmonic reproduction through the raw operator lifting
    g = jnp.asarray(mesh.nodes @ np.array([1.0, 2.0, -1.0]))
    glift = (1 - free) * g
    b = free * (0.0 - (G @ glift)) + glift
    xh, _ = grid_cg3d(Gm, b, 600)
    assert np.abs(np.asarray(xh) - np.asarray(g)).max() < 1e-9


def test_unit_cube_mesh_geometry():
    from fdapde_core_tpu.geometry.structured import unit_cube_mesh

    mesh = unit_cube_mesh(4)
    assert mesh.nodes.shape == (125, 3) and mesh.cells.shape == (384, 4)
    p = mesh.nodes[mesh.cells]
    u, v, w = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]
    vol = np.einsum("ij,ij->i", u, np.cross(v, w)) / 6
    assert (vol > 0).all()
    np.testing.assert_allclose(vol.sum(), 1.0, atol=1e-12)
    assert mesh.boundary_nodes.sum() == 125 - 27  # interior 3^3


def _poisson_cube(n):
    from fdapde_core_tpu.geometry.structured import unit_cube_mesh
    from fdapde_core_tpu.ops.closed_form import p1_stiffness_3d_sym
    from fdapde_core_tpu.ops.grid3d import (
        p1_cube_stencil,
        prune_zero_offsets_grid3d,
    )

    mesh = unit_cube_mesh(n)
    p = mesh.nodes[mesh.cells]
    e = np.concatenate(
        [(p[:, 1] - p[:, 0]).T, (p[:, 2] - p[:, 0]).T, (p[:, 3] - p[:, 0]).T],
        axis=0,
    )
    A10 = p1_stiffness_3d_sym(jnp.asarray(e))
    G = p1_cube_stencil(A10, n)
    free = jnp.asarray(~mesh.boundary_nodes, jnp.float64)
    Gm = prune_zero_offsets_grid3d(G.with_dirichlet_identity(free))
    b = free * (1.0 / n ** 3)
    return Gm, b


@pytest.mark.slow
def test_galerkin_coarsen3d_is_ptap():
    """3D A_c == P^T A P against the explicit trilinear prolongation,
    exercised matrix-free: for random coarse vectors u, v it must hold
    v^T A_c u == (P v)^T A (P u)."""
    from fdapde_core_tpu.ops.grid_mg3d import (
        _prolong3,
        galerkin_coarsen3d,
    )

    n = 6
    Gm, _ = _poisson_cube(n)
    Gc = galerkin_coarsen3d(Gm)
    m, mc = n + 1, n // 2 + 1
    assert Gc.shape3d == (mc, mc, mc) and len(Gc.offsets3d) == 27
    rng = np.random.default_rng(0)
    for _ in range(3):
        u = jnp.asarray(rng.normal(size=(mc, mc, mc)))
        v = jnp.asarray(rng.normal(size=(mc, mc, mc)))
        lhs = float(jnp.sum(v * (Gc @ u.reshape(-1)).reshape(mc, mc, mc)))
        Pu = _prolong3(u, m).reshape(-1)
        Pv = _prolong3(v, m).reshape(-1)
        rhs = float(jnp.sum(Pv * (Gm @ Pu)))
        assert abs(lhs - rhs) < 1e-12 * max(1.0, abs(rhs))


@pytest.mark.slow
def test_3d_multigrid_h_independent():
    """3D MG-CG: solution matches long Jacobi-CG; iteration count stays
    small and flat across refinements (h-independence)."""
    from fdapde_core_tpu.ops.grid3d import grid_cg3d
    from fdapde_core_tpu.ops.grid_mg3d import GridMG3D, mg_preconditioned_cg3d

    iters = {}
    for n in (8, 16):
        Gm, b = _poisson_cube(n)
        mg = GridMG3D.build(Gm, coarse_n=4)
        x, rel, k = mg_preconditioned_cg3d(
            Gm, b, rtol=1e-11, maxiter=60, mg=mg
        )
        iters[n] = int(k)
        assert float(rel) < 1e-10
        xr, _ = grid_cg3d(Gm, b, 4000)
        err = np.abs(np.asarray(x) - np.asarray(xr)).max()
        assert err < 1e-9 * max(1.0, np.abs(np.asarray(xr)).max())
    assert max(iters.values()) <= 14, iters


@pytest.mark.slow
def test_mg_bf16_storage_keeps_h_independence():
    """bf16 STENCIL STORAGE (f32/f64 vector arithmetic) must not degrade
    the V-cycle: same iteration count and residual as full-precision MG
    across refinements. (Full-bf16 V-cycle arithmetic is not offered — it
    measured 7 -> 17 iterations from n=64 to n=128.)"""
    import fdapde_core_tpu as fdm
    from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
    from fdapde_core_tpu.geometry.structured import unit_square_mesh
    from fdapde_core_tpu.linear_algebra.dia import dia_from_coo, unique_offsets
    from fdapde_core_tpu.ops.grid_dia import (
        GridDIAMatrix,
        prune_zero_offsets_grid,
    )
    from fdapde_core_tpu.ops.grid_mg import GridMG, mg_preconditioned_cg

    for n in (32, 64):
        mesh = unit_square_mesh(n)
        sp = FEMSpace(mesh, 1)
        A = assemble_matrix(sp, -fdm.laplacian())
        D = dia_from_coo(A.rows, A.cols, A.vals, sp.n_dofs, unique_offsets(sp.dofs))
        G = GridDIAMatrix.from_dia(D, (n + 1, n + 1))
        free = jnp.asarray(~mesh.boundary_nodes, jnp.float64)
        Gp = prune_zero_offsets_grid(G.with_dirichlet_identity(free))
        b = jnp.asarray(free)
        mg = GridMG.build(Gp, coarse_n=8)
        x_ref, rel_ref, k_ref = mg_preconditioned_cg(
            Gp, b, rtol=1e-10, maxiter=60, mg=mg
        )
        x16, rel16, k16 = mg_preconditioned_cg(
            Gp, b, rtol=1e-10, maxiter=60, mg=mg.astype(jnp.bfloat16)
        )
        assert int(k16) == int(k_ref)
        assert float(rel16) < 1e-10
        np.testing.assert_allclose(
            np.asarray(x16), np.asarray(x_ref), atol=1e-8
        )


@pytest.mark.slow
def test_3d_mg_bf16_storage():
    """3D bf16-storage hierarchy: same iterations + residual as full
    precision (vector arithmetic unchanged)."""
    from fdapde_core_tpu.ops.grid_mg3d import GridMG3D, mg_preconditioned_cg3d

    n = 16
    Gm, b = _poisson_cube(n)
    mg = GridMG3D.build(Gm, coarse_n=4)
    x, rel, k = mg_preconditioned_cg3d(Gm, b, rtol=1e-11, maxiter=60, mg=mg)
    x16, rel16, k16 = mg_preconditioned_cg3d(
        Gm, b, rtol=1e-11, maxiter=60, mg=mg.astype(jnp.bfloat16)
    )
    assert abs(int(k16) - int(k)) <= 1
    assert float(rel16) < 1e-10
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x), atol=1e-9)


@pytest.mark.slow
def test_mixed_precision_mg_cg_matches_f64():
    """mg_preconditioned_cg(prec_dtype=f32): same iteration count and
    final accuracy class as the all-f64 solve (the f32 V-cycle perturbs the
    preconditioner, not the f64 Krylov recurrence)."""
    from fdapde_core_tpu.ops.grid_assembly import stencil_from_coords
    from fdapde_core_tpu.ops.grid_dia import prune_zero_offsets_grid
    from fdapde_core_tpu.ops.grid_mg import GridMG, mg_preconditioned_cg

    n = 64
    m = n + 1
    W = 128
    rng = np.random.default_rng(2)
    gi, gj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    Xh = np.full((n + 8, W), 5.0)
    Yh = np.full((n + 8, W), 5.0)
    pert = rng.uniform(-0.1, 0.1, size=(m, m, 2))
    pert[[0, -1], :, :] = 0
    pert[:, [0, -1], :] = 0
    Xh[:m, :m] = (gi + pert[..., 0]) / n
    Yh[:m, :m] = (gj + pert[..., 1]) / n
    # f32 stencil (the production operator precision)
    D = stencil_from_coords(
        jnp.asarray(Xh, jnp.float32), jnp.asarray(Yh, jnp.float32), n
    )
    interior = np.zeros(m, bool)
    interior[1:-1] = True
    free = jnp.asarray(
        (interior[:, None] & interior[None, :]).astype(np.float32)
    )
    G = prune_zero_offsets_grid(D.with_dirichlet_identity(free.reshape(-1)))
    mg = GridMG.build(G, coarse_n=16)
    b = jnp.asarray(free.reshape(-1), jnp.float64)

    x64, rel64, k64 = mg_preconditioned_cg(G, b, rtol=1e-10, maxiter=60, mg=mg)
    xm, relm, km = mg_preconditioned_cg(
        G, b, rtol=1e-10, maxiter=60, mg=mg, prec_dtype=jnp.float32
    )
    assert float(relm) < 1e-10 and float(rel64) < 1e-10
    assert abs(int(km) - int(k64)) <= 2, (int(km), int(k64))
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x64), rtol=0, atol=1e-10)
