"""End-to-end PDE solves against manufactured solutions.

Mirrors /root/reference/test/src/fem_pde_test.cpp: same meshes, same exact
solutions, same L2 error functional `(mass @ (e*e)).sum()` and the same
tolerances (DOUBLE_TOLERANCE = 50*eps for exactly-representable solutions).
"""

import numpy as np
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.utils import DOUBLE_TOLERANCE

from tests.conftest import load_mesh

PI = np.pi


def test_laplacian_isotropic_order1(unit_square):
    """fem_pde_test.cpp:43-75: u = x + y harmonic, zero forcing, P1."""
    pde = fdm.PDE(unit_square, -fdm.laplacian(), order=1)
    coords = pde.dof_coords()
    g = coords[:, 0] + coords[:, 1]
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < DOUBLE_TOLERANCE


def test_laplacian_isotropic_order2_callable_force(unit_square):
    """fem_pde_test.cpp:78-107: u = 1 - x^2 - y^2, f = 4, P2."""
    pde = fdm.PDE(
        unit_square, -fdm.laplacian(), forcing=lambda x: 4.0, order=2
    )
    coords = pde.dof_coords()
    g = 1.0 - coords[:, 0] ** 2 - coords[:, 1] ** 2
    pde.set_dirichlet_bc(g)
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < DOUBLE_TOLERANCE


def _advection_diffusion_exact():
    alpha, gamma = 1.0, PI
    lam1 = -alpha / 2 - np.sqrt((alpha / 2) ** 2 + PI * PI)
    lam2 = -alpha / 2 + np.sqrt((alpha / 2) ** 2 + PI * PI)
    p = (1 - np.exp(lam2)) / (np.exp(lam1) - np.exp(lam2))

    def exact(x):
        return (
            -gamma
            / (PI * PI)
            * (p * np.exp(lam1 * x[..., 0]) + (1 - p) * np.exp(lam2 * x[..., 0]) - 1.0)
            * np.sin(PI * x[..., 1])
        )

    def forcing(x):
        return gamma * np.sin(PI * x[..., 1])

    beta = np.array([-alpha, 0.0])
    return exact, forcing, beta


def test_advection_diffusion_isotropic_order1(unit_square):
    """fem_pde_test.cpp:113-166: -Lap(u) + beta.grad(u) = gamma sin(pi y)."""
    exact, forcing, beta = _advection_diffusion_exact()
    L = -fdm.laplacian() + fdm.advection(beta)
    pde = fdm.PDE(unit_square, L, order=1)
    coords = pde.dof_coords()
    pde.set_dirichlet_bc(np.zeros(coords.shape[0]))
    qn = pde.quadrature_nodes()
    pde.set_forcing(forcing(qn).reshape(-1, 1))
    pde.init()
    pde.solve()
    assert pde.l2_error(exact(coords)) < 1e-5


def test_advection_diffusion_isotropic_order2(unit_square):
    """fem_pde_test.cpp:172-212: same problem, P2, tolerance 1e-7."""
    exact, forcing, beta = _advection_diffusion_exact()
    L = -fdm.laplacian() + fdm.advection(beta)
    pde = fdm.PDE(unit_square, L, forcing=lambda x: float(PI * np.sin(PI * x[1])), order=2)
    coords = pde.dof_coords()
    pde.set_dirichlet_bc(np.zeros(coords.shape[0]))
    pde.init()
    pde.solve()
    assert pde.l2_error(exact(coords)) < 1e-7


def _parabolic_problem(order, n_times, mesh):
    times = np.linspace(0.0, 1.0, n_times)

    def exact(x, t):
        return (
            np.sin(2 * PI * x[..., 0]) * np.sin(2 * PI * x[..., 1]) * np.exp(-t)
        )

    def forcing(x, t):
        return (8 * PI * PI - 1.0) * exact(x, t)

    L = fdm.dt() - fdm.laplacian()
    pde = fdm.PDE(mesh, L, times=times, order=order)
    coords = pde.dof_coords()
    g = exact(coords[:, None, :], times[None, :])
    pde.set_dirichlet_bc(g)
    pde.set_initial_condition(exact(coords, 0.0))
    qn = pde.quadrature_nodes()
    f = forcing(qn[:, None, :], times[None, :])
    pde.set_forcing(f)
    pde.init()
    pde.solve()
    return pde, g


@pytest.mark.slow
def test_parabolic_isotropic_order2(unit_square):
    """fem_pde_test.cpp:222-285: heat equation, P2, 101 steps, max-over-time
    L2 error < 1e-7."""
    pde, g = _parabolic_problem(2, 101, unit_square)
    assert pde.l2_error(g) < 1e-7


@pytest.mark.slow
def test_parabolic_isotropic_order1_convergence():
    """fem_pde_test.cpp:295-368: h-refinement convergence slope == 2."""
    errors = []
    for n in (16, 32, 64, 128):
        mesh = load_mesh(f"unit_square_{n}")
        pde, g = _parabolic_problem(1, 31, mesh)
        import jax.numpy as jnp

        e = jnp.asarray(g) - pde.solution()
        err_last = float(jnp.sqrt((pde.mass() @ (e * e))[:, -1].sum()))
        errors.append(err_last)
    for i in range(1, len(errors)):
        order = np.log2(errors[i - 1] / errors[i])
        assert np.floor(order) == 2, (errors, order)


def test_space_varying_coefficients_match_constant(unit_square):
    """Callable K(x)=I, b(x)=const, c(x)=const must reproduce the
    constant-coefficient matrices (the reference's space-varying operators
    via DiscretizedField forward protocol, operators/diffusion.h:32-55)."""
    from fdapde_core_tpu.fem import FEMSpace, assemble_matrix

    space = FEMSpace(unit_square, 1)
    A_const = assemble_matrix(
        unit_square and space, -fdm.laplacian() + fdm.advection(np.array([2.0, -1.0])) + fdm.reaction(3.0)
    )
    K = lambda x: np.eye(2)
    b = lambda x: np.array([2.0, -1.0])
    c = lambda x: 3.0
    A_vary = assemble_matrix(
        space, -fdm.diffusion(K) + fdm.advection(b) + fdm.reaction(c)
    )
    assert np.abs(A_const.toarray() - A_vary.toarray()).max() < 1e-12


def test_parabolic_lumped_mass(unit_square):
    """Mass lumping (lumping.h:30): lumped implicit Euler stays accurate."""
    pde, g = _parabolic_problem(1, 21, unit_square)
    err_consistent = pde.l2_error(g)

    times = np.linspace(0.0, 1.0, 21)
    L = fdm.dt() - fdm.laplacian()
    pde2 = fdm.PDE(unit_square, L, times=times, order=1, lumped_mass=True)
    coords = pde2.dof_coords()

    def exact(x, t):
        return np.sin(2 * PI * x[..., 0]) * np.sin(2 * PI * x[..., 1]) * np.exp(-t)

    g2 = exact(coords[:, None, :], times[None, :])
    pde2.set_dirichlet_bc(g2)
    pde2.set_initial_condition(exact(coords, 0.0))
    qn = pde2.quadrature_nodes()
    f = (8 * PI * PI - 1.0) * exact(qn[:, None, :], times[None, :])
    pde2.set_forcing(f)
    pde2.init()
    pde2.solve()
    err_lumped = pde2.l2_error(g2)
    # lumping is a consistent approximation: same order of magnitude
    assert err_lumped < 10 * max(err_consistent, 1e-6)


def test_variable_diffusion_mixed_bc():
    """BASELINE config 2: non-constant diffusion + mixed Dirichlet/Neumann.

    -div(K grad u) = f with K = (1+x^2) I, u_ex = sin(pi x) sin(pi y);
    Neumann on {x=1}: K grad(u).n = (1+1) pi cos(pi) sin(pi y).
    """
    import jax.numpy as jnp
    from fdapde_core_tpu.fem import FEMSpace
    from fdapde_core_tpu.fem.assembler import assemble_forcing, assemble_matrix
    from fdapde_core_tpu.fem.neumann import assemble_neumann, boundary_facet_selector
    from fdapde_core_tpu.fem.solvers import solve_elliptic
    from fdapde_core_tpu.geometry.structured import unit_square_mesh

    mesh = unit_square_mesh(32)
    space = FEMSpace(mesh, 2)

    def Kfun(x):
        return (1.0 + x[0] ** 2) * np.eye(2)

    def exact(x):
        return np.sin(PI * x[..., 0]) * np.sin(PI * x[..., 1])

    def forcing(x):
        sx, sy = np.sin(PI * x[0]), np.sin(PI * x[1])
        cx = np.cos(PI * x[0])
        # -div(K grad u) = -2x pi cx sy + (1+x^2) 2 pi^2 sx sy
        return -2 * x[0] * PI * cx * sy + (1 + x[0] ** 2) * 2 * PI * PI * sx * sy

    A = assemble_matrix(space, -fdm.diffusion(Kfun))
    F = assemble_forcing(space, forcing)
    nmask = boundary_facet_selector(mesh, lambda p: p[:, 0] > 1 - 1e-9)
    # K grad u . n at x=1: (1+x^2) pi cos(pi x) sin(pi y) = -2 pi sin(pi y)
    F = F + jnp.asarray(
        assemble_neumann(space, lambda p: -2 * PI * np.sin(PI * p[1]), nmask)
    )
    coords = space.dof_coords
    dmask = space.boundary_dofs.copy()
    on_n = coords[:, 0] > 1 - 1e-9
    corner = (coords[:, 1] < 1e-9) | (coords[:, 1] > 1 - 1e-9)
    dmask &= ~(on_n & ~corner)
    gex = exact(coords)
    x, info = solve_elliptic(
        A, F, jnp.asarray(dmask), jnp.asarray(gex), symmetric=True, rtol=1e-12
    )
    err = np.abs(np.asarray(x) - gex).max()
    assert err < 5e-5, err


@pytest.mark.slow
def test_p3_cubic_exact():
    """P3 elements (order-3 dof enumeration goes beyond the reference's
    order<=2 support, lagrangian_basis.h:94): cubic solutions are exact."""
    from fdapde_core_tpu.geometry.structured import unit_square_mesh

    mesh = unit_square_mesh(8)
    pde = fdm.PDE(
        mesh,
        -fdm.laplacian(),
        forcing=lambda x: -(6 * x[0] + 6 * x[1]),
        order=3,
        solver_rtol=1e-13,
    )
    coords = pde.dof_coords()
    assert pde.n_dofs == mesh.n_nodes + 2 * mesh.n_edges + mesh.n_cells
    g = coords[:, 0] ** 3 + coords[:, 1] ** 3
    pde.set_dirichlet_bc(g)
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-16


def test_p3_continuity_partition_of_unity(unit_square):
    """P3 basis: partition of unity at random points (checks the
    orientation-consistent edge-dof assignment on an unstructured mesh)."""
    from fdapde_core_tpu.fem import FEMSpace
    from fdapde_core_tpu.fem.evaluation import eval_basis_pointwise

    space = FEMSpace(unit_square, 3)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(50, 2))
    Psi, _ = eval_basis_pointwise(space, pts)
    np.testing.assert_allclose(
        np.asarray(Psi @ np.ones(space.n_dofs)), 1.0, atol=1e-10
    )
    # and a cubic function interpolated at dofs is reproduced pointwise
    coords = space.dof_coords
    c = coords[:, 0] ** 3 - 2 * coords[:, 1] ** 3 + coords[:, 0] * coords[:, 1]
    vals = np.asarray(Psi @ c)
    want = pts[:, 0] ** 3 - 2 * pts[:, 1] ** 3 + pts[:, 0] * pts[:, 1]
    np.testing.assert_allclose(vals, want, atol=1e-9)


@pytest.mark.slow
def test_parabolic_advection_diffusion():
    """Parabolic with a non-symmetric spatial operator (BiCGStab inner
    solves): dt(u) - Lap(u) + b.grad(u) = f with manufactured solution."""
    from fdapde_core_tpu.geometry.structured import unit_square_mesh

    mesh = unit_square_mesh(24)
    beta = np.array([1.0, 0.5])
    times = np.linspace(0.0, 0.5, 26)
    L = fdm.dt() - fdm.laplacian() + fdm.advection(beta)
    assert not L.is_symmetric

    def exact(x, t):
        return np.sin(PI * x[..., 0]) * np.sin(PI * x[..., 1]) * np.exp(-t)

    def forcing(x, t):
        u = exact(x, t)
        dux = PI * np.cos(PI * x[..., 0]) * np.sin(PI * x[..., 1]) * np.exp(-t)
        duy = PI * np.sin(PI * x[..., 0]) * np.cos(PI * x[..., 1]) * np.exp(-t)
        return -u + 2 * PI * PI * u + beta[0] * dux + beta[1] * duy

    pde = fdm.PDE(mesh, L, times=times, order=1)
    coords = pde.dof_coords()
    g = exact(coords[:, None, :], times[None, :])
    pde.set_dirichlet_bc(g)
    pde.set_initial_condition(exact(coords, 0.0))
    qn = pde.quadrature_nodes()
    pde.set_forcing(forcing(qn[:, None, :], times[None, :]))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 5e-4


def test_c_shaped_nonconvex_solve():
    """Poisson on the non-convex c_shaped reference mesh: harmonic linear
    solution exact; grid point location handles the concavity."""
    mesh = load_mesh("c_shaped")
    pde = fdm.PDE(mesh, -fdm.laplacian(), order=1)
    coords = pde.dof_coords()
    g = 2.0 * coords[:, 0] - coords[:, 1]
    pde.set_dirichlet_bc(g)
    pde.set_forcing(np.zeros((pde.quadrature_nodes().shape[0], 1)))
    pde.init()
    pde.solve()
    assert pde.l2_error(g) < 1e-14
    # a point in the concave notch must be reported outside
    inside = mesh.locate(mesh.cell_barycenters[:5])
    assert (inside == np.arange(5)).all()
