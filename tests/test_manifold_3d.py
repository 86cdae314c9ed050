"""FEM on 3D volumes and 2.5D manifold surfaces.

The reference supports Triangulation<3,3> and <2,3> through the same
assembler (pseudo-inverse invJ on manifolds, simplex.h:189-193); its test
suite exercises geometry but no manifold PDE solves. Here: a manufactured 3D
Poisson solve on the unit_sphere fixture and operator invariants on the
2.5D surface fixture.
"""

import numpy as np
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem import FEMSpace, assemble_matrix


@pytest.mark.slow
def test_3d_poisson_unit_sphere(unit_sphere):
    """-Lap(u) = -6 with exact u = x^2+y^2+z^2 (quadratic, P1 approx)."""
    pde = fdm.PDE(
        unit_sphere, -fdm.laplacian(), forcing=lambda x: -6.0, order=1
    )
    coords = pde.dof_coords()
    exact = (coords**2).sum(axis=1)
    pde.set_dirichlet_bc(exact)
    pde.init()
    pde.solve()
    assert pde.success
    # coarse tetrahedral mesh, P1: modest tolerance, but must beat the
    # trivial (boundary-only) solution by orders of magnitude
    assert pde.l2_error(exact) < 5e-4


def test_3d_harmonic_exact(unit_sphere):
    """u = x + y + z is in the P1 space and harmonic: error ~ solver tol."""
    pde = fdm.PDE(unit_sphere, -fdm.laplacian(), order=1)
    coords = pde.dof_coords()
    g = coords.sum(axis=1)
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-15


def test_surface_operator_invariants(surface):
    """Laplace-Beltrami stiffness on a 2.5D mesh: symmetric, PSD, constants
    in kernel; mass matrix sums to the surface area."""
    space = FEMSpace(surface, 1)
    A = assemble_matrix(space, -fdm.laplacian()).toarray()
    M = assemble_matrix(space, fdm.reaction(1.0)).toarray()
    assert np.abs(A - A.T).max() < 1e-12
    ones = np.ones(space.n_dofs)
    assert np.abs(A @ ones).max() < 1e-10  # constants are in the kernel
    assert M.sum() == pytest.approx(surface.measure(), rel=1e-12)
    evals = np.linalg.eigvalsh(A)
    assert evals.min() > -1e-10  # positive semi-definite


def test_surface_constant_solution(surface):
    """f = 0 with constant Dirichlet data reproduces the constant exactly."""
    pde = fdm.PDE(surface, -fdm.laplacian(), order=1)
    g = np.full(pde.n_dofs, 3.5)
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert np.abs(np.asarray(pde.solution()) - 3.5).max() < 1e-10


def test_network_mass_matrix():
    """1.5D network: mass matrix integrates to total edge length."""
    from tests.conftest import load_mesh

    net = load_mesh("network")
    space = FEMSpace(net, 1)
    M = assemble_matrix(space, fdm.reaction(1.0))
    assert float(np.asarray(M.vals).sum()) == pytest.approx(
        net.measure(), rel=1e-12
    )


@pytest.mark.slow
def test_3d_p2_harmonic(unit_sphere):
    """P2 on tets: 3D edge-dof enumeration + quadrature. u = x+y+z exact."""
    pde = fdm.PDE(unit_sphere, -fdm.laplacian(), order=2)
    coords = pde.dof_coords()
    assert pde.n_dofs == unit_sphere.n_nodes + unit_sphere.n_edges
    g = coords.sum(axis=1)
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-13


def test_3d_p2_quadratic(unit_sphere):
    """u = x^2+y^2+z^2 is in the P2 space: error at solver tolerance."""
    pde = fdm.PDE(
        unit_sphere, -fdm.laplacian(), forcing=lambda x: -6.0, order=2,
        solver_rtol=1e-13,
    )
    coords = pde.dof_coords()
    g = (coords**2).sum(axis=1)
    pde.set_dirichlet_bc(g)
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-12


def test_surface_extraction(unit_sphere):
    """Triangulation<3,3>::surface parity (triangulation.h:447-471)."""
    surf = unit_sphere.surface()
    assert surf.local_dim == 2 and surf.embed_dim == 3
    assert surf.n_cells == int(unit_sphere.boundary_facets.sum())
    # extracted surface is watertight: every edge shared by exactly 2 faces
    assert not surf.boundary_facets.any()
    # surface nodes sit on the volume boundary
    assert unit_sphere.boundary_node_markers()[surf.parent_nodes].all()
    # area close to the sphere's surface (coarse facets)
    assert abs(surf.measure() - 4 * np.pi) < 1.0


def test_face_to_edges(unit_sphere):
    f2e = unit_sphere.face_to_edges()
    assert f2e.shape == (unit_sphere.n_facets, 3)
    # each face's edges consist of its own vertex pairs
    faces = unit_sphere.facets
    edges = unit_sphere.edges
    for r in np.random.default_rng(0).integers(0, len(faces), 20):
        got = {tuple(edges[e]) for e in f2e[r]}
        want = {
            (min(faces[r][a], faces[r][b]), max(faces[r][a], faces[r][b]))
            for a, b in [(0, 1), (0, 2), (1, 2)]
        }
        assert got == want


@pytest.mark.slow
def test_laplace_beltrami_on_extracted_sphere(unit_sphere):
    """Solve (-Lap_S + 1) u = 3 z on the extracted sphere surface.

    z is a degree-1 spherical harmonic: -Lap_S z = 2 z on the unit sphere,
    so u = z exactly (up to facet geometry error). Closed manifold: no
    boundary conditions; reaction term keeps the system SPD."""
    surf = unit_sphere.surface()
    pde = fdm.PDE(
        surf,
        -fdm.laplacian() + fdm.reaction(1.0),
        forcing=lambda x: 3.0 * x[2] / np.linalg.norm(x),
        order=1,
        solver_rtol=1e-12,
    )
    pde.init()
    pde.solve()
    exact = surf.nodes[:, 2] / np.linalg.norm(surf.nodes, axis=1)
    err = np.abs(np.asarray(pde.solution()) - exact)
    assert err.max() < 0.05, err.max()  # faceted-geometry error only
