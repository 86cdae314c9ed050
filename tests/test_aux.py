"""Tests: binary matrices, binary trees, discretized fields, checkpointing,
solve reports."""

import numpy as np
import pytest

import fdapde_core_tpu as fdm


def test_binary_matrix_ops():
    from fdapde_core_tpu.linear_algebra.binary import BinaryMatrix, BinaryVector

    a = BinaryMatrix(np.eye(3))
    b = BinaryMatrix.ones(3, 3)
    assert (a & b).count() == 3
    assert (a | b).all()
    assert (~a).count() == 6
    assert (a ^ a).count() == 0
    assert a.block(0, 0, 2, 2).count() == 2
    assert a.repeat(2, 1).shape == (6, 3)
    v = BinaryVector([1, 0, 1])
    assert v.count() == 2 and not v.all() and v.any()
    M = np.arange(9.0).reshape(3, 3)
    np.testing.assert_array_equal(a.select(M), np.diag(np.diag(M)))
    from fdapde_core_tpu.linear_algebra import SparseMatrix

    S = SparseMatrix.from_dense(M)
    np.testing.assert_array_equal(a.select(S).toarray(), np.diag(np.diag(M)))


def test_binary_tree_and_bst():
    from fdapde_core_tpu.utils.binary_tree import BST, BinaryTree

    t = BinaryTree()
    r = t.set_root("a")
    l1 = t.push_left(r, "b")
    t.push_right(r, "c")
    t.push_left(l1, "d")
    assert list(t.dfs()) == ["a", "b", "d", "c"]
    assert list(t.bfs()) == ["a", "b", "c", "d"]
    assert sorted(t.leaves()) == ["c", "d"]

    bst = BST()
    for v in [5, 2, 8, 1, 3, 9]:
        bst.insert(v)
    assert bst.sorted() == [1, 2, 3, 5, 8, 9]
    assert bst.contains(3) and not bst.contains(7)


def test_discretized_field_as_coefficient(unit_square):
    """DiscretizedField arrays feed assembly exactly like raw arrays
    (the reference's forward(i) protocol)."""
    from fdapde_core_tpu.fields import DiscretizedField
    from fdapde_core_tpu.fem import FEMSpace, assemble_matrix

    space = FEMSpace(unit_square, 1)
    n_q = space.mesh.n_cells * space.n_quad
    vals = np.full(n_q, 2.0)
    field = DiscretizedField(vals)
    assert field.forward(7) == 2.0
    A1 = assemble_matrix(space, fdm.reaction(field.values))
    A2 = assemble_matrix(space, fdm.reaction(2.0))
    assert np.abs(A1.toarray() - A2.toarray()).max() < 1e-14


def test_space_checkpoint_roundtrip(tmp_path, unit_square):
    from fdapde_core_tpu.fem import FEMSpace
    from fdapde_core_tpu.utils.checkpoint import load_space, save_space

    space = FEMSpace(unit_square, 2)
    path = str(tmp_path / "space.npz")
    save_space(path, space)
    loaded = load_space(path)
    assert loaded.n_dofs == space.n_dofs
    np.testing.assert_array_equal(loaded.dofs, space.dofs)
    r1, c1, i1 = loaded.scatter
    r2, c2, i2 = space.scatter
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(i1, i2)


def test_solve_report(unit_square):
    pde = fdm.PDE(unit_square, -fdm.laplacian(), forcing=lambda x: 4.0, order=1)
    coords = pde.dof_coords()
    pde.set_dirichlet_bc(1 - coords[:, 0] ** 2 - coords[:, 1] ** 2)
    pde.init()
    pde.solve()
    rec = pde.report()
    assert rec["success"] and rec["solver_converged"]
    assert rec["n_dofs"] == 3600
    assert rec["stiff_nnz"] > 0
    assert rec["solver_iterations"] > 0
