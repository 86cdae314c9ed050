"""Semilinear Newton solver test with a manufactured solution."""

import jax.numpy as jnp
import pytest
import numpy as np

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem import FEMSpace
from fdapde_core_tpu.fem.nonlinear import solve_semilinear
from fdapde_core_tpu.geometry.structured import unit_square_mesh

PI = np.pi


def test_semilinear_cubic_reaction():
    """-Lap(u) + u^3 = f, u_ex = sin(pi x) sin(pi y)."""
    mesh = unit_square_mesh(32)
    space = FEMSpace(mesh, 1)

    def exact(x):
        return np.sin(PI * x[..., 0]) * np.sin(PI * x[..., 1])

    def forcing(x):
        u = exact(x)
        return 2 * PI * PI * u + u**3

    coords = space.dof_coords
    g = np.zeros(space.n_dofs)
    u, info = solve_semilinear(
        space,
        -fdm.laplacian(),
        h=lambda v: v**3,
        dh=lambda v: 3 * v**2,
        forcing=forcing,
        g=g,
    )
    err = np.abs(np.asarray(u) - exact(coords)).max()
    assert err < 5e-3  # P1 discretization error on a 32x32 mesh
    assert info["newton_iterations"] <= 8  # quadratic convergence
    # residuals decrease monotonically after the first correction
    r = info["residuals"]
    assert r[-1] < 1e-10


def test_semilinear_reduces_to_linear():
    """h = 0 must reproduce the linear solve exactly."""
    mesh = unit_square_mesh(16)
    space = FEMSpace(mesh, 1)
    pde = fdm.PDE(mesh, -fdm.laplacian(), forcing=lambda x: 4.0, order=1)
    coords = pde.dof_coords()
    g = 1 - coords[:, 0] ** 2 - coords[:, 1] ** 2
    pde.set_dirichlet_bc(g)
    pde.init()
    pde.solve()

    u, info = solve_semilinear(
        space,
        -fdm.laplacian(),
        h=lambda v: 0.0 * v,
        dh=lambda v: 0.0 * v,
        forcing=lambda x: 4.0,
        g=g,
    )
    assert np.abs(np.asarray(u) - np.asarray(pde.solution())).max() < 1e-9


@pytest.mark.slow
def test_bfgs_fallback_agrees_with_newton():
    """BASELINE config 4: Newton with BFGS fallback. Force the fallback by
    giving Newton zero iterations of slack and verify the energy minimizer
    reproduces the Newton solution."""
    mesh = unit_square_mesh(8)
    space = FEMSpace(mesh, 1)

    def exact(x):
        return np.sin(PI * x[..., 0]) * np.sin(PI * x[..., 1])

    def forcing(x):
        u = exact(x)
        return 2 * PI * PI * u + u**3

    g = np.zeros(space.n_dofs)
    u_newton, info_n = solve_semilinear(
        space, -fdm.laplacian(),
        h=lambda v: v**3, dh=lambda v: 3 * v**2,
        forcing=forcing, g=g,
    )
    assert info_n["method"] == "newton"
    u_bfgs, info_b = solve_semilinear(
        space, -fdm.laplacian(),
        h=lambda v: v**3, dh=lambda v: 3 * v**2,
        forcing=forcing, g=g,
        max_newton=1, newton_tol=1e-30,  # force non-convergence
        bfgs_fallback=True, H_potential=lambda v: v**4 / 4,
    )
    assert info_b["method"] == "bfgs_fallback"
    assert np.abs(np.asarray(u_bfgs) - np.asarray(u_newton)).max() < 1e-4
