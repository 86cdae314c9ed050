"""Tests: BlockFrame/BlockVector, walk search, shapefile reader, space-time."""

import struct

import numpy as np
import pytest

from fdapde_core_tpu.utils.block_frame import BlockFrame, BlockVector


def test_block_frame():
    bf = BlockFrame()
    bf.insert("y", np.arange(5.0))
    bf["X"] = np.arange(10.0).reshape(5, 2)
    assert bf.columns() == ["y", "X"]
    assert bf.has_block("y") and not bf.has_block("z")
    np.testing.assert_array_equal(bf["X"][2], [4.0, 5.0])
    assert bf.is_dirty("y")
    bf.clear_dirty()
    assert not bf.is_dirty("y")
    row = bf.row(1)
    assert row["y"][0] == 1.0
    sub = bf.rows(slice(1, 3))
    assert sub.n_rows == 2
    with pytest.raises(ValueError):
        bf.insert("bad", np.zeros(7))


def test_block_vector():
    bv = BlockVector(np.arange(12.0), 3)
    np.testing.assert_array_equal(bv[2], [6, 7, 8])
    bv[0] = [9, 9, 9]
    np.testing.assert_array_equal(bv.data[:3], [9, 9, 9])
    np.testing.assert_array_equal(bv.blocks(1, 2), [3, 4, 5, 6, 7, 8])


def test_walk_search(unit_square):
    from fdapde_core_tpu.geometry.walk_search import walk_search

    rng = np.random.default_rng(0)
    ids = rng.integers(0, unit_square.n_cells, 50)
    w = rng.dirichlet([1, 1, 1], size=50)
    pts = np.einsum("nkd,nk->nd", unit_square.cell_coords[ids], w)
    found = walk_search(unit_square, pts)
    # walk must agree with ground truth (unit square is convex)
    np.testing.assert_array_equal(found, ids)


def _write_tiny_shapefile(base):
    """Hand-roll a 2-record Point shapefile + dbf."""
    recs = []
    for i, (x, y) in enumerate([(1.5, 2.5), (-3.0, 4.0)]):
        content = struct.pack("<i2d", 1, x, y)
        recs.append(struct.pack(">2i", i + 1, len(content) // 2) + content)
    body = b"".join(recs)
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<2i", 1000, 1)
    header += struct.pack("<4d", -3.0, 2.5, 1.5, 4.0)
    header += struct.pack("<4d", 0, 0, 0, 0)
    with open(base + ".shp", "wb") as fh:
        fh.write(header + body)
    # dbf with one numeric field "VAL"
    field = b"VAL" + b"\0" * 8 + b"N" + b"\0" * 4 + bytes([8, 3]) + b"\0" * 14
    dbf_header = struct.pack("<B3BIHH", 3, 24, 1, 1, 2, 32 + 32 + 1, 1 + 8)
    dbf_header += b"\0" * 20
    records = b" " + b"  12.500" + b" " + b" -99.000"
    with open(base + ".dbf", "wb") as fh:
        fh.write(dbf_header + field + b"\r" + records + b"\x1a")


def test_shapefile_roundtrip(tmp_path):
    from fdapde_core_tpu.utils.shp_reader import ShapeFile

    base = str(tmp_path / "tiny")
    _write_tiny_shapefile(base)
    shp = ShapeFile(base + ".shp")
    assert shp.shape_type_name == "Point"
    assert len(shp) == 2
    np.testing.assert_allclose(shp.points(0), [[1.5, 2.5]])
    np.testing.assert_allclose(shp.points(1), [[-3.0, 4.0]])
    assert shp.field_names == ["VAL"]
    assert shp.attributes[0]["VAL"] == pytest.approx(12.5)
    assert shp.attributes[1]["VAL"] == pytest.approx(-99.0)


@pytest.mark.slow
def test_space_time_separable_solve():
    """(T1 x S0 + T0 x S1) x = b matches the dense assembled system."""
    import jax.numpy as jnp

    from fdapde_core_tpu.linear_algebra import SparseMatrix
    from fdapde_core_tpu.models import SeparableOperator, solve_space_time

    rng = np.random.default_rng(0)
    nt, ns = 6, 11
    T0 = np.eye(nt) + 0.1 * np.diag(np.ones(nt - 1), 1) + 0.1 * np.diag(np.ones(nt - 1), -1)
    S0 = np.eye(ns)
    T1 = np.diag(rng.uniform(1, 2, nt))
    A1 = 2 * np.eye(ns) - np.eye(ns, k=1) - np.eye(ns, k=-1)
    op = SeparableOperator(
        [
            (SparseMatrix.from_dense(T1), SparseMatrix.from_dense(S0)),
            (SparseMatrix.from_dense(T0), SparseMatrix.from_dense(A1)),
        ]
    )
    dense = np.kron(T1, S0) + np.kron(T0, A1)
    b = rng.normal(size=nt * ns)
    x, info = solve_space_time(op, jnp.asarray(b), rtol=1e-13)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-8)
    np.testing.assert_allclose(np.asarray(op.diagonal()), np.diag(dense), atol=1e-13)


@pytest.mark.slow
def test_space_time_fem_spline_system():
    """BASELINE config 5 (space-time): separable system built from REAL
    assembled blocks — spline mass/penalty in time x FEM mass/stiffness in
    space — solved matrix-free and checked against the dense Kronecker
    system."""
    import jax.numpy as jnp

    import fdapde_core_tpu as fdm
    from fdapde_core_tpu.geometry import Interval
    from fdapde_core_tpu.geometry.structured import unit_square_mesh
    from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
    from fdapde_core_tpu.models import SeparableOperator, solve_space_time

    mesh = unit_square_mesh(5)
    space = FEMSpace(mesh, 1)
    As = assemble_matrix(space, -fdm.laplacian())
    Ms = assemble_matrix(space, fdm.reaction(1.0))

    tpde = fdm.PDE(Interval(0, 1, 5), fdm.reaction(1.0), order=3, discretization="spline")
    tpde.init()
    Mt = tpde.stiff()  # spline mass
    ppde = fdm.PDE(Interval(0, 1, 5), -fdm.bilaplacian(), order=3, discretization="spline")
    ppde.init()
    Pt = ppde.stiff()  # bilaplacian penalty

    lam = 0.1
    op = SeparableOperator([(Mt, As), (lam * Pt, Ms), (Mt, Ms)])
    dense = (
        np.kron(Mt.toarray(), As.toarray())
        + lam * np.kron(Pt.toarray(), Ms.toarray())
        + np.kron(Mt.toarray(), Ms.toarray())
    )
    rng = np.random.default_rng(0)
    b = rng.normal(size=op.shape[0])
    x, info = solve_space_time(op, jnp.asarray(b), rtol=1e-12, maxiter=20000)
    ref = np.linalg.solve(dense, b)
    assert np.abs(np.asarray(x) - ref).max() < 1e-6


def _shp_header(shape_type, body_len):
    h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    h += struct.pack(">i", (100 + body_len) // 2)
    h += struct.pack("<2i", 1000, shape_type)
    h += struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
    return h


def test_shapefile_polylinez_zm_payloads(tmp_path):
    """PolyLineZ (type 13): z range+values then m range+values after the XY
    block (reference sf_polygon_t, shp_reader.h:132-144)."""
    from fdapde_core_tpu.utils.shp_reader import ShapeFile

    xy = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]
    z = [7.0, 8.0, 9.0]
    m = [0.1, 0.2, 0.3]
    content = struct.pack("<i", 13)
    content += struct.pack("<4d", 0, 0, 2, 1)  # bbox
    content += struct.pack("<2i", 1, 3)  # n_parts, n_points
    content += struct.pack("<i", 0)  # part offsets
    for x, y in xy:
        content += struct.pack("<2d", x, y)
    content += struct.pack("<2d", min(z), max(z))
    content += struct.pack(f"<{len(z)}d", *z)
    content += struct.pack("<2d", min(m), max(m))
    content += struct.pack(f"<{len(m)}d", *m)
    body = struct.pack(">2i", 1, len(content) // 2) + content
    base = str(tmp_path / "plz")
    with open(base + ".shp", "wb") as fh:
        fh.write(_shp_header(13, len(body)) + body)

    shp = ShapeFile(base + ".shp")
    assert shp.shape_type_name == "PolyLineZ"
    rec = shp.records[0]
    np.testing.assert_allclose(rec.points, xy)
    np.testing.assert_allclose(rec.z, z)
    np.testing.assert_allclose(rec.m, m)
    assert rec.z_range == (7.0, 9.0)
    assert rec.rings() == [(0, 3)]


def test_shapefile_multipointm(tmp_path):
    """MultiPointM (type 28): m range+values after XY (shp_reader.h:77-109)."""
    from fdapde_core_tpu.utils.shp_reader import ShapeFile

    xy = [(1.0, 2.0), (3.0, 4.0)]
    m = [5.5, 6.5]
    content = struct.pack("<i", 28)
    content += struct.pack("<4d", 1, 2, 3, 4)
    content += struct.pack("<i", 2)
    for x, y in xy:
        content += struct.pack("<2d", x, y)
    content += struct.pack("<2d", min(m), max(m))
    content += struct.pack(f"<{len(m)}d", *m)
    body = struct.pack(">2i", 1, len(content) // 2) + content
    base = str(tmp_path / "mpm")
    with open(base + ".shp", "wb") as fh:
        fh.write(_shp_header(28, len(body)) + body)

    shp = ShapeFile(base + ".shp")
    assert shp.shape_type_name == "MultiPointM"
    rec = shp.records[0]
    np.testing.assert_allclose(rec.points, xy)
    np.testing.assert_allclose(rec.m, m)
    assert rec.z is None


def test_shapefile_pointz(tmp_path):
    from fdapde_core_tpu.utils.shp_reader import ShapeFile

    content = struct.pack("<i4d", 11, 1.0, 2.0, 3.0, 4.0)  # x y z m
    body = struct.pack(">2i", 1, len(content) // 2) + content
    base = str(tmp_path / "pz")
    with open(base + ".shp", "wb") as fh:
        fh.write(_shp_header(11, len(body)) + body)
    shp = ShapeFile(base + ".shp")
    rec = shp.records[0]
    np.testing.assert_allclose(rec.points, [[1.0, 2.0]])
    np.testing.assert_allclose(rec.z, [3.0])
    np.testing.assert_allclose(rec.m, [4.0])


@pytest.mark.slow
def test_space_time_fast_diagonalization():
    """solve_space_time_fdm == matrix-free Kronecker CG == dense solve."""
    import fdapde_core_tpu as fdm
    import jax.numpy as jnp
    from fdapde_core_tpu.fem import FEMSpace
    from fdapde_core_tpu.fem.assembler import assemble_matrix
    from fdapde_core_tpu.fem.solvers import masked_matrix
    from fdapde_core_tpu.geometry.structured import unit_square_mesh
    from fdapde_core_tpu.models.space_time import (
        SeparableOperator,
        solve_space_time,
        solve_space_time_fdm,
    )

    mesh = unit_square_mesh(6)
    space = FEMSpace(mesh, 1)
    mask = jnp.asarray(space.boundary_dofs)
    S1 = masked_matrix(assemble_matrix(space, -fdm.laplacian()), mask)
    S0 = assemble_matrix(space, fdm.reaction(1.0))

    n_t = 7
    T1 = np.diag(2.0 * np.ones(n_t)) + np.diag(-np.ones(n_t - 1), 1) + np.diag(
        -np.ones(n_t - 1), -1
    )
    T0 = (np.diag(4.0 * np.ones(n_t)) + np.diag(np.ones(n_t - 1), 1)
          + np.diag(np.ones(n_t - 1), -1)) / 6.0

    rng = np.random.default_rng(4)
    b = rng.normal(size=n_t * space.n_dofs)

    x_fdm, info = solve_space_time_fdm(T0, T1, S0, S1, b, rtol=1e-12)
    assert bool(info.converged)

    op = SeparableOperator([(T1, S0), (T0, S1)])
    x_cg, info_cg = solve_space_time(op, jnp.asarray(b), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(x_fdm), np.asarray(x_cg), rtol=0, atol=1e-7
    )

    # dense ground truth
    R = np.kron(T1, S0.toarray()) + np.kron(T0, S1.toarray())
    x_ref = np.linalg.solve(R, b)
    np.testing.assert_allclose(np.asarray(x_fdm), x_ref, rtol=0, atol=1e-8)


@pytest.mark.slow
def test_space_time_fdm_mode_parallel():
    """solve_space_time_fdm(device_mesh=...): mode-parallel across 8
    devices, zero per-iteration communication; matches the single-device
    result."""
    import fdapde_core_tpu as fdm
    import jax.numpy as jnp
    from fdapde_core_tpu.fem import FEMSpace
    from fdapde_core_tpu.fem.assembler import assemble_matrix
    from fdapde_core_tpu.fem.solvers import masked_matrix
    from fdapde_core_tpu.geometry.structured import unit_square_mesh
    from fdapde_core_tpu.models.space_time import solve_space_time_fdm
    from fdapde_core_tpu.parallel.sharded import make_device_mesh

    mesh = unit_square_mesh(6)
    space = FEMSpace(mesh, 1)
    mask = jnp.asarray(space.boundary_dofs)
    S1 = masked_matrix(assemble_matrix(space, -fdm.laplacian()), mask)
    S0 = assemble_matrix(space, fdm.reaction(1.0))

    n_t = 11  # not divisible by 8: exercises mode padding
    T1 = np.diag(2.0 * np.ones(n_t)) + np.diag(-np.ones(n_t - 1), 1) + np.diag(
        -np.ones(n_t - 1), -1
    )
    T0 = (np.diag(4.0 * np.ones(n_t)) + np.diag(np.ones(n_t - 1), 1)
          + np.diag(np.ones(n_t - 1), -1)) / 6.0
    b = np.random.default_rng(6).normal(size=n_t * space.n_dofs)

    x1, info1 = solve_space_time_fdm(T0, T1, S0, S1, b, rtol=1e-12)
    x8, info8 = solve_space_time_fdm(
        T0, T1, S0, S1, b, rtol=1e-12, device_mesh=make_device_mesh(8)
    )
    assert bool(info8.converged)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), rtol=0, atol=1e-9)


@pytest.mark.slow
def test_separable_operator_grid_stencil_and_mode_preconditioners():
    """SeparableOperator with GridDIAMatrix space factors matches the dense
    Kronecker sum; ModeDiag and ModeMG preconditioners are SPD-consistent
    (CG converges to the dense solution, MG in far fewer iterations)."""
    import jax.numpy as jnp

    from fdapde_core_tpu.linear_algebra.solvers import cg, cg_chunked
    from fdapde_core_tpu.models.space_time import (
        ModeDiagPreconditioner,
        ModeMGPreconditioner,
        SeparableOperator,
    )
    from fdapde_core_tpu.ops.grid_dia import GridDIAMatrix

    rng = np.random.default_rng(1)
    m, nt = 17, 5
    ns = m * m
    gi = np.arange(m)
    int1d = (gi > 0) & (gi < m - 1)
    free = (int1d[:, None] & int1d[None, :]).astype(float)
    offs5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
    diag = np.where(free > 0, 4.0, 1.0)
    dataA = np.stack([diag] + [-1.0 * np.ones((m, m))] * 4)
    S1 = GridDIAMatrix(jnp.asarray(dataA), offs5, (m, m)).with_dirichlet_identity(
        jnp.asarray(free.reshape(-1))
    )
    dataE = np.zeros((5, m, m))
    dataE[0] = 0.01
    S0 = GridDIAMatrix(jnp.asarray(dataE), offs5, (m, m))

    T0 = (np.diag(4.0 * np.ones(nt)) + np.diag(np.ones(nt - 1), 1)
          + np.diag(np.ones(nt - 1), -1)) / 6.0
    T1 = (np.diag(2.0 * np.ones(nt)) + np.diag(-np.ones(nt - 1), 1)
          + np.diag(-np.ones(nt - 1), -1))

    op = SeparableOperator([(jnp.asarray(T1), S0), (jnp.asarray(T0), S1)])

    # dense reference via columns of the stencil operators
    eye = np.eye(ns)
    S1d = np.stack([np.asarray(S1 @ jnp.asarray(eye[:, i]))
                    for i in range(ns)], axis=1)
    S0d = np.stack([np.asarray(S0 @ jnp.asarray(eye[:, i]))
                    for i in range(ns)], axis=1)
    dense = np.kron(T1, S0d) + np.kron(T0, S1d)
    v = rng.standard_normal(nt * ns)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(v)), dense @ v,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(op.diagonal()), np.diag(dense),
                               atol=1e-13)

    b = jnp.asarray(rng.standard_normal(nt * ns))
    x_ref = np.linalg.solve(dense, np.asarray(b))

    pre_d = ModeDiagPreconditioner.build(T0, T1, S0.diagonal(), S1.diagonal())
    xd, infod = cg(op, b, M_inv=pre_d, rtol=1e-12, maxiter=3000)
    assert bool(infod.converged)
    np.testing.assert_allclose(np.asarray(xd), x_ref, atol=1e-8)

    pre_mg = ModeMGPreconditioner.build(T0, T1, S0, S1, dtype=jnp.float64,
                                        coarse_n=4)
    xm, infom = cg_chunked(op, b, M_inv=pre_mg, rtol=1e-12, maxiter=300,
                           chunk=25)
    assert bool(infom.converged)
    assert int(infom.iterations) < int(infod.iterations)
    np.testing.assert_allclose(np.asarray(xm), x_ref, atol=1e-8)


def test_block_view_write_through_and_dirty():
    """BlockView (block_frame.h:202): row/range/sparse access patterns read
    the LIVE frame and writes propagate back with dirty-bit marking."""
    from fdapde_core_tpu.utils.block_frame import BlockFrame, BlockView

    bf = BlockFrame()
    bf.insert("y", np.arange(6.0))
    bf.insert("X", np.arange(12.0).reshape(6, 2))
    bf.clear_dirty()

    rv = bf.range(1, 4)
    assert isinstance(rv, BlockView) and rv.n_rows == 3
    np.testing.assert_array_equal(rv["y"].ravel(), [1.0, 2.0, 3.0])

    # live view: mutations of the frame are visible through the view
    bf["y"] = np.arange(6.0) * 10
    bf.clear_dirty()
    np.testing.assert_array_equal(rv["y"].ravel(), [10.0, 20.0, 30.0])

    # write-through + dirty propagation
    rv["y"] = np.zeros((3, 1))
    assert bf.is_dirty("y") and not bf.is_dirty("X")
    np.testing.assert_array_equal(bf["y"].ravel(), [0.0, 0, 0, 0, 40, 50])

    sv = bf.sparse_view([0, 5])
    assert sv.n_rows == 2
    np.testing.assert_array_equal(sv["X"], [[0.0, 1.0], [10.0, 11.0]])
    sv["X"] = -np.ones((2, 2))
    assert bf.is_dirty("X")
    np.testing.assert_array_equal(bf["X"][5], [-1.0, -1.0])

    m = bf.row(2).materialize()
    assert m.n_rows == 1 and m.columns() == ["y", "X"]
