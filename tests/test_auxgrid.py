"""Auxiliary structured-grid preconditioner (ops/auxgrid.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem.assembler import assemble_forcing, assemble_matrix
from fdapde_core_tpu.fem.solvers import masked_matrix
from fdapde_core_tpu.fem.space import FEMSpace
from fdapde_core_tpu.linear_algebra.solvers import cg, jacobi_preconditioner
from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner


def _jittered_delaunay(nx, seed=0):
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    ii, jj = np.meshgrid(np.arange(nx + 1), np.arange(nx + 1), indexing="ij")
    pts = np.stack([ii, jj], -1).reshape(-1, 2).astype(np.float64)
    interior = (
        (pts[:, 0] > 0) & (pts[:, 0] < nx) & (pts[:, 1] > 0) & (pts[:, 1] < nx)
    )
    pts[interior] += rng.uniform(-0.35, 0.35, size=(interior.sum(), 2))
    pts /= nx
    return fdm.Triangulation(pts, Delaunay(pts).simplices.astype(np.int32))


def _problem(nx, seed=0):
    mesh = _jittered_delaunay(nx, seed)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    mask = jnp.asarray(space.boundary_dofs)
    Am = masked_matrix(A, mask)
    b = jnp.where(mask, 0.0, assemble_forcing(space, lambda x: 1.0))
    return mesh, Am, b


@pytest.mark.slow
def test_preconditioner_is_spd():
    mesh, Am, _ = _problem(16)
    pre = AuxGridPreconditioner.build(mesh.nodes, Am.diagonal())
    rng = np.random.default_rng(1)
    n = Am.shape[0]
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    gap = abs(float(x @ pre(z)) - float(z @ pre(x)))
    assert gap < 1e-12 * max(1.0, abs(float(x @ pre(z))))
    assert float(x @ pre(x)) > 0


@pytest.mark.slow
def test_aux_grid_pcg_converges_near_h_independently():
    iters = {}
    for nx in (16, 32, 64):
        mesh, Am, b = _problem(nx)
        pre = AuxGridPreconditioner.build(mesh.nodes, Am.diagonal())
        x, info = cg(Am, b, M_inv=pre, rtol=1e-10, maxiter=200)
        assert bool(info.converged), nx
        iters[nx] = int(info.iterations)
        res = float(jnp.linalg.norm(Am @ x - b) / jnp.linalg.norm(b))
        assert res < 1e-9
    counts = list(iters.values())
    assert max(counts) <= 60, iters
    # near-flat growth under refinement (the auxiliary-space property)
    assert counts[-1] <= 2 * counts[0] + 5, iters


@pytest.mark.slow
def test_aux_grid_beats_jacobi():
    mesh, Am, b = _problem(64)
    pre = AuxGridPreconditioner.build(mesh.nodes, Am.diagonal())
    _, i_aux = cg(Am, b, M_inv=pre, rtol=1e-10, maxiter=2000)
    _, i_jac = cg(Am, b, M_inv=jacobi_preconditioner(Am.diagonal()),
                  rtol=1e-10, maxiter=2000)
    assert int(i_aux.iterations) * 3 < int(i_jac.iterations)


@pytest.mark.slow
def test_pde_product_path_with_auxgrid():
    mesh = _jittered_delaunay(32, seed=3)
    pde = fdm.PDE(
        mesh, -fdm.laplacian(),
        forcing=lambda x: 2 * np.pi**2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]),
        order=1, solver_preconditioner="auxgrid", solver_maxiter=100,
    )
    pde.set_dirichlet_bc(np.zeros(pde.n_dofs))
    pde.solve()
    assert pde.success
    assert pde.report()["solver_iterations"] <= 40
    coords = pde.dof_coords()
    exact = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
    assert pde.l2_error(exact) < 1e-6


@pytest.mark.slow
def test_aux_grid_3d_on_tet_mesh():
    """3D trilinear auxiliary-grid preconditioner on the unit_sphere tet
    mesh (ball domain inside its bounding-box grid)."""
    from tests.conftest import load_mesh
    from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner3D
    from fdapde_core_tpu.linear_algebra.solvers import jacobi_preconditioner

    mesh = load_mesh("unit_sphere")
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    mask = jnp.asarray(space.boundary_dofs)
    Am = masked_matrix(A, mask)
    b = jnp.where(mask, 0.0, assemble_forcing(space, lambda x: 1.0))

    pre = AuxGridPreconditioner3D.build(mesh.nodes, Am.diagonal(), grid_n=8)
    # SPD
    rng = np.random.default_rng(2)
    n = Am.shape[0]
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    gap = abs(float(x @ pre(z)) - float(z @ pre(x)))
    assert gap < 1e-11 * max(1.0, abs(float(x @ pre(z))))

    xs, info = cg(Am, b, M_inv=pre, rtol=1e-10, maxiter=300)
    assert bool(info.converged)
    _, i_jac = cg(Am, b, M_inv=jacobi_preconditioner(Am.diagonal()),
                  rtol=1e-10, maxiter=2000)
    assert int(info.iterations) < int(i_jac.iterations)
    res = float(jnp.linalg.norm(Am @ xs - b) / jnp.linalg.norm(b))
    assert res < 1e-9


@pytest.mark.slow
def test_aux_grid_auto_mask_non_box_domain():
    """grid_free='auto' on the quasi_circle mesh: grid nodes in the void
    outside the (non-box) domain get identity rows; the preconditioner
    stays SPD and beats Jacobi."""
    from tests.conftest import load_mesh
    from fdapde_core_tpu.linear_algebra.solvers import jacobi_preconditioner

    mesh = load_mesh("quasi_circle")
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    mask = jnp.asarray(space.boundary_dofs)
    Am = masked_matrix(A, mask)
    b = jnp.where(mask, 0.0, assemble_forcing(space, lambda x: 1.0))

    pre = AuxGridPreconditioner.build(mesh.nodes, Am.diagonal(),
                                      grid_free="auto")
    rng = np.random.default_rng(5)
    n = Am.shape[0]
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    gap = abs(float(x @ pre(z)) - float(z @ pre(x)))
    assert gap < 1e-11 * max(1.0, abs(float(x @ pre(z))))

    xs, info = cg(Am, b, M_inv=pre, rtol=1e-10, maxiter=400)
    assert bool(info.converged)
    _, i_jac = cg(Am, b, M_inv=jacobi_preconditioner(Am.diagonal()),
                  rtol=1e-10, maxiter=4000)
    assert int(info.iterations) * 2 < int(i_jac.iterations), (
        int(info.iterations), int(i_jac.iterations))
    res = float(jnp.linalg.norm(Am @ xs - b) / jnp.linalg.norm(b))
    assert res < 1e-9


@pytest.mark.slow
def test_pde_auxgrid_3d():
    """PDE(solver_preconditioner='auxgrid') dispatches to the 3D class on
    tetrahedral meshes."""
    from tests.conftest import load_mesh

    mesh = load_mesh("unit_sphere")
    pde = fdm.PDE(mesh, -fdm.laplacian(), forcing=lambda x: -6.0, order=1,
                  solver_preconditioner="auxgrid", solver_maxiter=300)
    coords = pde.dof_coords()
    exact = (coords ** 2).sum(axis=1)
    pde.set_dirichlet_bc(exact)
    pde.solve()
    assert pde.success
    # quadratic u on a coarse P1 tet mesh: discretization-limited tolerance
    # (same as tests/test_manifold_3d.py); the solver itself converged
    assert pde.report()["solver_converged"]
    assert pde.l2_error(exact) < 5e-4
