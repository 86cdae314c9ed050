"""DeviceCellLocator: jit point location parity with the host CellLocator.

VERDICT r1 item 4 — the reference serves arbitrary query batches through
TreeSearch (tree_search.h:28-84); the device locator must reproduce the host
(and hence reference) semantics exactly, including outside points and
manifold plane checks, while running entirely inside jit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fdapde_core_tpu.geometry.point_location import CellLocator, DeviceCellLocator
from tests.conftest import load_mesh


def _random_points(mesh, n, pad=0.1, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = mesh.range
    span = hi - lo
    return rng.uniform(lo - pad * span, hi + pad * span, size=(n, lo.size))


def _barycentric_points(mesh, n, seed=1):
    """Points sampled inside random cells (the reference MeshLoader
    protocol, test/src/utils/mesh_loader.h:94-109) with known cell."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, mesh.n_cells, size=n)
    coords = mesh.cell_coords[ids]  # (n, M+1, N)
    w = rng.dirichlet(np.ones(coords.shape[1]), size=n)
    return ids, np.einsum("nkj,nk->nj", coords, w)


def test_device_matches_host_unit_square():
    mesh = load_mesh("unit_square")
    host = CellLocator(mesh)
    dev = DeviceCellLocator(mesh)
    pts = _random_points(mesh, 2000)
    got = np.asarray(jax.jit(dev.locate)(jnp.asarray(pts)))
    want = host.locate(pts)
    np.testing.assert_array_equal(got, want)
    assert (want >= 0).sum() > 1000  # the batch genuinely exercises hits
    assert (want < 0).sum() > 100  # ... and misses


def test_device_locates_sampled_cells_exactly():
    mesh = load_mesh("unit_square_64")
    dev = DeviceCellLocator(mesh)
    ids, pts = _barycentric_points(mesh, 1000)
    got = np.asarray(dev.locate(jnp.asarray(pts)))
    # points on shared edges may legitimately resolve to a neighbor: accept
    # any cell that exactly contains the point
    from fdapde_core_tpu.geometry.point_location import contains

    ok = got == ids
    amb = ~ok & (got >= 0)
    if amb.any():
        ok[amb] = contains(mesh, got[amb], pts[amb])
    assert ok.all()


def test_device_3d_tets():
    mesh = load_mesh("unit_sphere")
    host = CellLocator(mesh)
    dev = DeviceCellLocator(mesh)
    pts = _random_points(mesh, 500)
    got = np.asarray(dev.locate(jnp.asarray(pts)))
    want = host.locate(pts)
    np.testing.assert_array_equal(got, want)


def test_device_manifold_plane_check():
    mesh = load_mesh("surface")  # 2.5D manifold
    host = CellLocator(mesh)
    dev = DeviceCellLocator(mesh)
    ids, on_surf = _barycentric_points(mesh, 300)
    off_surf = on_surf + np.array([0.0, 0.0, 0.31])  # displaced off-plane
    pts = np.concatenate([on_surf, off_surf])
    got = np.asarray(dev.locate(jnp.asarray(pts)))
    want = host.locate(pts)
    np.testing.assert_array_equal(got, want)
    assert (got[:300] >= 0).mean() > 0.9


def test_psi_matrix_via_device_locate_matches_host():
    """eval_basis_pointwise(device_locate=True) builds the identical Psi."""
    from fdapde_core_tpu.fem.evaluation import eval_basis_pointwise
    from fdapde_core_tpu.fem.space import FEMSpace

    mesh = load_mesh("unit_square_32")
    space = FEMSpace(mesh, 2)
    pts = np.random.default_rng(8).uniform(-0.02, 1.02, size=(800, 2))
    Ph, _ = eval_basis_pointwise(space, pts)
    Pd, _ = eval_basis_pointwise(space, pts, device_locate=True)
    np.testing.assert_array_equal(np.asarray(Ph.rows), np.asarray(Pd.rows))
    np.testing.assert_array_equal(np.asarray(Ph.cols), np.asarray(Pd.cols))
    np.testing.assert_allclose(np.asarray(Ph.vals), np.asarray(Pd.vals))
