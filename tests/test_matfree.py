"""Matrix-free general operator + device irregular mesh + device aux-grid.

The flagship-scale general path (ops/matfree.py) must agree exactly with the
assembled sparse path on the same mesh; the device mesh generator must
produce a valid conforming triangulation with genuinely varying topology;
the device aux-grid setup must match the host setup bit-for-bit (same
formulas, same dtypes).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import fdapde_core_tpu as fdm
from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
from fdapde_core_tpu.fem.solvers import DirichletSystem, solve_elliptic
from fdapde_core_tpu.geometry.structured import irregular_mesh_device
from fdapde_core_tpu.geometry.triangulation import Triangulation
from fdapde_core_tpu.linear_algebra.solvers import cg
from fdapde_core_tpu.ops.matfree import MatrixFreeLocal, p1_local_stiffness


def _device_mesh(n, amp=0.2):
    nodes, cells, bnd = jax.jit(
        lambda a: irregular_mesh_device(n, a), static_argnums=()
    )(amp)
    return np.asarray(nodes), np.asarray(cells), np.asarray(bnd)


def test_irregular_mesh_is_valid_triangulation():
    nodes, cells, bnd = _device_mesh(9)
    # positive orientation everywhere, areas partition the unit square
    p = nodes[cells]
    e0, e1 = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]
    det = e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0]
    assert det.min() > 0
    assert abs(0.5 * det.sum() - 1.0) < 1e-12
    # conforming: Triangulation's first-encounter edge extraction counts
    # interior edges shared by exactly 2 cells, boundary edges by 1
    mesh = Triangulation(nodes, cells.astype(np.int32), bnd)
    counts = np.bincount(mesh.cell_to_edges.reshape(-1))
    assert set(counts.tolist()) <= {1, 2}
    # Euler: V - E + F(cells) = 1 for a disk
    assert mesh.n_nodes - mesh.n_edges + mesh.n_cells == 1


def test_irregular_mesh_topology_varies():
    nodes, cells, bnd = _device_mesh(16)
    deg = np.bincount(cells.reshape(-1), minlength=nodes.shape[0])
    interior = ~bnd
    # hash-chosen diagonals: interior cell-degrees must span 4..8, not the
    # uniform split's constant 6
    assert deg[interior].min() <= 5
    assert deg[interior].max() >= 7


@pytest.mark.slow
def test_matfree_matches_assembled_matrix():
    nodes, cells, bnd = _device_mesh(8)
    mesh = Triangulation(nodes, cells.astype(np.int32), bnd)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())

    A_loc = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    op, overflowed = MatrixFreeLocal.build(
        A_loc, jnp.asarray(cells), space.n_dofs, max_degree=8
    )
    assert not bool(overflowed)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(space.n_dofs))
    np.testing.assert_allclose(np.asarray(op @ x), np.asarray(A @ x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.diagonal()),
                               np.asarray(A.diagonal()), rtol=0, atol=1e-13)


@pytest.mark.slow
def test_matfree_solve_matches_explicit():
    nodes, cells, bnd = _device_mesh(10)
    mesh = Triangulation(nodes, cells.astype(np.int32), bnd)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    mask = jnp.asarray(space.boundary_dofs)
    b = jnp.ones(space.n_dofs)
    g = jnp.zeros(space.n_dofs)
    x_ref, _ = solve_elliptic(A, b, mask, g, rtol=1e-12)

    A_loc = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    op, _ = MatrixFreeLocal.build(A_loc, jnp.asarray(cells), space.n_dofs, 8)
    sys = DirichletSystem(op, mask)
    x, info = cg(sys, sys.rhs(b, g), x0=g, rtol=1e-12, maxiter=2000)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)


def test_local_stiffness_kappa_scaling():
    nodes, cells, bnd = _device_mesh(6)
    A1 = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    kap = jnp.full(cells.shape[0], 2.5)
    A2 = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells), kappa=kap)
    np.testing.assert_allclose(np.asarray(A2), 2.5 * np.asarray(A1),
                               rtol=1e-15, atol=0)


@pytest.mark.slow
def test_ell_matrix_from_local_matches_assembled():
    from fdapde_core_tpu.ops.ell import ELLMatrix

    nodes, cells, bnd = _device_mesh(9)
    mesh = Triangulation(nodes, cells.astype(np.int32), bnd)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())

    A_loc = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    op, _ = MatrixFreeLocal.build(A_loc, jnp.asarray(cells), space.n_dofs, 8)
    E, over = ELLMatrix.from_local(op.A_loc, op.dofs, op.adj, op.adj_mask, 9)
    assert not bool(over)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(space.n_dofs))
    np.testing.assert_allclose(np.asarray(E @ x), np.asarray(A @ x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.diagonal()),
                               np.asarray(A.diagonal()), rtol=0, atol=1e-13)

    # too-small column bound is detected, not silently wrong
    _, over_small = ELLMatrix.from_local(op.A_loc, op.dofs, op.adj,
                                         op.adj_mask, 4)
    assert bool(over_small)


@pytest.mark.slow
def test_matrixfree_poisson_model():
    """Product-level driver: harmonic manufactured solution is exact (up to
    solver tolerance) since u = x + y is in the P1 space; and a forcing
    solve converges to the analytic solution at O(h^2)."""
    import jax

    from fdapde_core_tpu.models import MatrixFreePoisson

    n = 24
    nodes, cells, bnd = jax.jit(lambda a: irregular_mesh_device(n, a))(0.2)
    model = MatrixFreePoisson(nodes, cells, bnd, max_degree=8, grid_n=n)

    # harmonic: -lap u = 0, u = x + y on the boundary => u exactly
    g = nodes[:, 0] + nodes[:, 1]
    x, it, rel = model.solve(jnp.zeros(model.n_dofs), g=g, rtol=1e-12)
    assert float(rel) < 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(g), atol=1e-9)

    # forcing: -lap u = 2 pi^2 sin(pi x) sin(pi y)
    cen = nodes[cells].mean(axis=1)
    f = 2 * np.pi**2 * jnp.sin(np.pi * cen[:, 0]) * jnp.sin(np.pi * cen[:, 1])
    b = model.load_vector(f)
    x, it, rel = model.solve(b, rtol=1e-10)
    exact = np.sin(np.pi * np.asarray(nodes[:, 0])) * np.sin(
        np.pi * np.asarray(nodes[:, 1])
    )
    err = np.abs(np.asarray(x) - exact).max()
    assert err < 0.02  # O(h^2) at h ~ 1/24 with centroid quadrature
    assert int(it) < 40  # aux-grid keeps iterations h-independent-small

    # the matrix-free format produces the same solution as assembled ELL
    model_mf = MatrixFreePoisson(nodes, cells, bnd, max_degree=8, grid_n=n,
                                 format="matfree")
    x_mf, _, _ = model_mf.solve(b, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x_mf), np.asarray(x), atol=1e-9)


@pytest.mark.slow
def test_matfree_3d_matches_assembled():
    """Tet local stiffness + matrix-free operator vs the assembled sparse
    path on a jittered device-generated Freudenthal mesh."""
    from fdapde_core_tpu.geometry.structured import cube_mesh_device

    n = 4
    nodes, cells, bnd = jax.jit(lambda a: cube_mesh_device(n, a))(0.2)
    nodes_np, cells_np = np.asarray(nodes), np.asarray(cells)
    mesh = Triangulation(nodes_np, cells_np.astype(np.int32), np.asarray(bnd))
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())

    from fdapde_core_tpu.ops.matfree import p1_local_stiffness_3d

    A_loc = p1_local_stiffness_3d(nodes, cells)
    op, over = MatrixFreeLocal.build(A_loc, cells, space.n_dofs, 24)
    assert not bool(over)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(space.n_dofs))
    np.testing.assert_allclose(np.asarray(op @ x), np.asarray(A @ x),
                               rtol=0, atol=1e-12)

    from fdapde_core_tpu.ops.ell import ELLMatrix

    E, overc = ELLMatrix.from_local(op.A_loc, op.dofs, op.adj, op.adj_mask, 15)
    assert not bool(overc)
    np.testing.assert_allclose(np.asarray(E @ x), np.asarray(A @ x),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_matrixfree_poisson_model_3d():
    """3D product driver: harmonic manufactured solution is exact."""
    from fdapde_core_tpu.geometry.structured import cube_mesh_device
    from fdapde_core_tpu.models import MatrixFreePoisson

    n = 6
    nodes, cells, bnd = jax.jit(lambda a: cube_mesh_device(n, a))(0.2)
    model = MatrixFreePoisson(nodes, cells, bnd, grid_n=n)
    g = nodes[:, 0] + 2 * nodes[:, 1] - nodes[:, 2]
    x, it, rel = model.solve(jnp.zeros(model.n_dofs), g=g, rtol=1e-12,
                             maxiter=200)
    assert float(rel) < 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(g), atol=1e-9)


@pytest.mark.slow
def test_soa_pipeline_matches_aos():
    """The SoA device-scale pipeline (ops/matfree_soa.py) is bit-equivalent
    to the AoS forms: mesh generator, matrix-free SpMV, diagonal, assembled
    ELL."""
    from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
    from fdapde_core_tpu.ops.ell import ELLMatrix
    from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA

    n = 11
    nodes, cells, bnd = _device_mesh(n)
    x, y, c0, c1, c2, bnd2 = jax.jit(
        lambda a: irregular_mesh_device_soa(n, a)
    )(0.2)
    np.testing.assert_array_equal(np.asarray(x), nodes[:, 0])
    np.testing.assert_array_equal(np.asarray(y), nodes[:, 1])
    np.testing.assert_array_equal(np.asarray(c0), cells[:, 0])
    np.testing.assert_array_equal(np.asarray(c1), cells[:, 1])
    np.testing.assert_array_equal(np.asarray(c2), cells[:, 2])
    np.testing.assert_array_equal(np.asarray(bnd2), bnd)

    n_dofs = nodes.shape[0]
    A_loc = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    aos, _ = MatrixFreeLocal.build(A_loc, jnp.asarray(cells), n_dofs, 8)
    soa, over = MatrixFreeSoA.build(x, y, c0, c1, c2, n_dofs, 8)
    assert not bool(over)

    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(n_dofs))
    np.testing.assert_allclose(np.asarray(soa @ v), np.asarray(aos @ v),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(soa.diagonal()),
                               np.asarray(aos.diagonal()), rtol=0, atol=1e-13)

    E_aos, _ = ELLMatrix.from_local(aos.A_loc, aos.dofs, aos.adj,
                                    aos.adj_mask, 9)
    E_soa, overc = soa.to_ell(9)
    assert not bool(overc)
    np.testing.assert_allclose(np.asarray(E_soa @ v), np.asarray(E_aos @ v),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E_soa.diagonal()),
                               np.asarray(E_aos.diagonal()),
                               rtol=0, atol=1e-13)

    # and kappa parity
    kap = jnp.asarray(rng.uniform(0.5, 2.0, cells.shape[0]))
    A_k = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells), kap)
    aos_k, _ = MatrixFreeLocal.build(A_k, jnp.asarray(cells), n_dofs, 8)
    soa_k, _ = MatrixFreeSoA.build(x, y, c0, c1, c2, n_dofs, 8, kappa=kap)
    np.testing.assert_allclose(np.asarray(soa_k @ v), np.asarray(aos_k @ v),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_auxgrid_build_device_matches_host():
    from fdapde_core_tpu.ops.auxgrid import AuxGridPreconditioner

    nodes, cells, bnd = _device_mesh(12)
    mesh = Triangulation(nodes, cells.astype(np.int32), bnd)
    space = FEMSpace(mesh, 1)
    A = assemble_matrix(space, -fdm.laplacian())
    sys = DirichletSystem(A, jnp.asarray(space.boundary_dofs))
    diag = sys.diagonal().astype(jnp.float32)

    host = AuxGridPreconditioner.build(nodes, diag, grid_n=8,
                                       bbox=((0, 0), (1, 1)))
    dev = AuxGridPreconditioner.build_device(jnp.asarray(nodes), diag,
                                             grid_n=8)
    np.testing.assert_array_equal(np.asarray(dev.idx), np.asarray(host.idx))
    # host computes weights in f64 then casts; device computes in f32
    np.testing.assert_allclose(np.asarray(dev.w), np.asarray(host.w),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev.dinv), np.asarray(host.dinv),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(dev.mg.datas[0]),
                               np.asarray(host.mg.datas[0]), rtol=0, atol=0)
    # and it preconditions: CG on the matrix-free operator with the device
    # aux-grid converges h-independently-fast
    A_loc = p1_local_stiffness(jnp.asarray(nodes), jnp.asarray(cells))
    op, _ = MatrixFreeLocal.build(A_loc, jnp.asarray(cells), space.n_dofs, 8)
    msys = DirichletSystem(op, jnp.asarray(space.boundary_dofs))
    b = jnp.ones(space.n_dofs) * ~jnp.asarray(space.boundary_dofs)
    pre = lambda r: dev(r.astype(jnp.float32)).astype(r.dtype)  # noqa: E731
    x, info = cg(msys, b, M_inv=pre, rtol=1e-10, maxiter=60)
    assert bool(info.converged)
    assert int(info.iterations) < 40


@pytest.mark.slow
def test_soa3d_matches_aos_and_dense():
    """MatrixFreeSoA3D (device-scale tet layouts) is equivalent to the AoS
    tet pipeline for pure diffusion, and its general advection-diffusion-
    reaction operator matches a dense scatter of its own local entries
    (closed forms exact for per-cell-constant coefficients)."""
    from fdapde_core_tpu.geometry.structured import cube_mesh_device
    from fdapde_core_tpu.ops.ell import ELLMatrix
    from fdapde_core_tpu.ops.matfree import p1_local_stiffness_3d
    from fdapde_core_tpu.ops.matfree_soa import MatrixFreeSoA3D

    n = 4
    nodes, cells, bnd = jax.jit(lambda a: cube_mesh_device(n, a))(0.2)
    nd = (n + 1) ** 3
    x, y, z = nodes[:, 0], nodes[:, 1], nodes[:, 2]
    c0, c1, c2, c3 = (cells[:, j] for j in range(4))

    # pure diffusion: parity vs the AoS tet path (same closed form)
    op, over = MatrixFreeSoA3D.build(x, y, z, c0, c1, c2, c3, nd, 24)
    assert not bool(over)
    A_loc = p1_local_stiffness_3d(nodes, cells)
    aos, _ = MatrixFreeLocal.build(A_loc, cells, nd, 24)
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(nd))
    np.testing.assert_allclose(np.asarray(op @ v), np.asarray(aos @ v),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.diagonal()),
                               np.asarray(aos.diagonal()),
                               rtol=0, atol=1e-12)
    E, overc = op.to_ell(15)
    assert not bool(overc)
    E_aos, _ = ELLMatrix.from_local(aos.A_loc, aos.dofs, aos.adj,
                                    aos.adj_mask, 15)
    np.testing.assert_allclose(np.asarray(E @ v), np.asarray(E_aos @ v),
                               rtol=0, atol=1e-12)

    # general tensor-K + advection + reaction: dense scatter of _entries
    C = cells.shape[0]
    rngc = np.random.default_rng(8)
    coef = {k: jnp.asarray(rngc.uniform(0.5, 1.5, C))
            for k in ("kxx", "kyy", "kzz")}
    coef.update({k: jnp.asarray(rngc.uniform(-0.2, 0.2, C))
                 for k in ("kxy", "kxz", "kyz")})
    gen, overg = MatrixFreeSoA3D.build_general(
        x, y, z, c0, c1, c2, c3, nd, 24, bx=1.0, by=-0.5, bz=0.25,
        react=0.7, **coef,
    )
    assert not bool(overg)
    assert not gen.is_symmetric
    A = np.zeros((nd, nd))
    ent = gen._entries()
    dofs_np = np.asarray(cells)
    for i in range(4):
        for j in range(4):
            np.add.at(A, (dofs_np[:, i], dofs_np[:, j]),
                      np.asarray(ent[i][j]))
    np.testing.assert_allclose(np.asarray(gen @ v), A @ np.asarray(v),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gen.diagonal()), np.diag(A),
                               rtol=0, atol=1e-11)
    Eg, overge = gen.to_ell(15)
    assert not bool(overge)
    np.testing.assert_allclose(np.asarray(Eg @ v), A @ np.asarray(v),
                               rtol=0, atol=1e-11)

    # the general operator with b = 0, K = I, c = 0 reduces to diffusion
    gen0, _ = MatrixFreeSoA3D.build_general(x, y, z, c0, c1, c2, c3, nd, 24)
    np.testing.assert_allclose(np.asarray(gen0 @ v), np.asarray(op @ v),
                               rtol=0, atol=1e-12)


def test_cube_mesh_device_soa_matches_aos():
    """The 3D SoA mesh generator reproduces cube_mesh_device exactly
    (coordinates, cell order, boundary)."""
    from fdapde_core_tpu.geometry.structured import (
        cube_mesh_device,
        cube_mesh_device_soa,
    )

    n = 5
    nodes, cells, bnd = jax.jit(lambda a: cube_mesh_device(n, a))(0.2)
    x, y, z, c0, c1, c2, c3, bnd2 = jax.jit(
        lambda a: cube_mesh_device_soa(n, a)
    )(0.2)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(nodes[:, 0]))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(nodes[:, 1]))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(nodes[:, 2]))
    for j, cj in enumerate((c0, c1, c2, c3)):
        np.testing.assert_array_equal(np.asarray(cj),
                                      np.asarray(cells[:, j]))
    np.testing.assert_array_equal(np.asarray(bnd2), np.asarray(bnd))
