"""1D FEM (interval meshes) and P2-on-manifold coverage."""

import numpy as np
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
from fdapde_core_tpu.geometry import Interval

PI = np.pi


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.slow
def test_1d_poisson(order):
    """-u'' = pi^2 sin(pi x), u(0) = u(1) = 0 -> u = sin(pi x)."""
    pde = fdm.PDE(
        Interval(0.0, 1.0, 64),
        -fdm.laplacian(),
        forcing=lambda x: PI * PI * np.sin(PI * x[0]),
        order=order,
        solver_rtol=1e-13,
    )
    coords = pde.dof_coords()
    pde.set_dirichlet_bc(np.zeros(pde.n_dofs))
    pde.init()
    pde.solve()
    exact = np.sin(PI * coords[:, 0])
    err = np.abs(np.asarray(pde.solution()) - exact).max()
    assert err < (5e-4 if order == 1 else 5e-7), (order, err)


@pytest.mark.slow
def test_1d_linear_exact():
    """u = x is in the P1 space: solver-tolerance accuracy."""
    pde = fdm.PDE(Interval(0.0, 2.0, 10), -fdm.laplacian(), order=1)
    coords = pde.dof_coords()
    g = coords[:, 0]
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-18


def test_p2_on_surface(surface):
    """P2 assembly on a 2.5D manifold: mass integrates to the area; the
    Laplace-Beltrami stiffness keeps constants in its kernel."""
    space = FEMSpace(surface, 2)
    assert space.n_dofs == surface.n_nodes + surface.n_edges
    M = assemble_matrix(space, fdm.reaction(1.0))
    A = assemble_matrix(space, -fdm.laplacian())
    assert float(np.asarray(M.vals).sum()) == pytest.approx(
        surface.measure(), rel=1e-12
    )
    ones = np.ones(space.n_dofs)
    assert np.abs(np.asarray(A @ ones)).max() < 1e-10


@pytest.mark.slow
def test_network_fem_solve():
    """FEM on a 1.5D network (Kirchhoff continuity at junctions comes for
    free from the conforming basis): constant Dirichlet data reproduces the
    constant; a heat-kernel-type solve stays within the data bounds
    (discrete maximum principle on acyclic-ish segments)."""
    from tests.conftest import load_mesh

    net = load_mesh("network")
    pde = fdm.PDE(net, -fdm.laplacian(), order=1)
    g = np.full(pde.n_dofs, 2.5)
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert np.abs(np.asarray(pde.solution()) - 2.5).max() < 1e-10

    # non-constant boundary data: solution bounded by the data range
    coords = pde.dof_coords()
    g2 = coords[:, 0] + coords[:, 1]
    pde2 = fdm.PDE(net, -fdm.laplacian(), order=1)
    pde2.set_dirichlet_bc(g2)
    pde2.set_forcing(np.zeros((pde2.quadrature_nodes().shape[0], 1)))
    pde2.init()
    pde2.solve()
    u = np.asarray(pde2.solution())
    bmask = np.asarray(pde2.space.boundary_dofs)
    lo, hi = g2[bmask].min(), g2[bmask].max()
    assert u.min() >= lo - 1e-8 and u.max() <= hi + 1e-8
