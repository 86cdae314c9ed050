"""Host-side IO: CSV tables, MatrixMarket matrices, reference mesh loading.

Counterpart of `fdaPDE/utils/IO/csv_reader.h` and the test fixture
`test/src/utils/mesh_loader.h`. All IO is host-side NumPy; device arrays are
produced downstream by the mesh/assembly layers.
"""

from __future__ import annotations

import csv
import os

import numpy as np

__all__ = ["read_csv", "read_csv_sparse", "read_mtx", "load_mesh_csv"]


def read_csv(path: str, dtype=np.float64) -> np.ndarray:
    """Parse a CSV table into a dense array.

    Handles the R-style quoting of the reference fixtures (csv_reader.h:32):
    a quoted header row and a quoted row-name first column, both discarded;
    NA/NaN tokens map to nan.
    """
    rows = []
    with open(path, newline="") as fh:
        reader = csv.reader(fh)
        header = next(reader)
        # detect a row-name column: header's first field is empty in R dumps
        has_rownames = header[0].strip('"') == ""
        for rec in reader:
            if not rec:
                continue
            fields = rec[1:] if has_rownames else rec
            rows.append(
                [
                    np.nan
                    if f.strip().strip('"') in ("NA", "NaN", "nan", "")
                    else float(f.strip().strip('"'))
                    for f in fields
                ]
            )
    return np.asarray(rows, dtype=np.float64).astype(dtype)


def read_csv_sparse(path: str, shape=None):
    """Parse a COO-triplet CSV (row, col, value; 1-indexed) into a sparse
    matrix — the reference's `parse_file<Eigen::Sparse>` format used for
    network neighbor matrices (csv_reader.h, mesh_loader.h:82).

    Returns a `linear_algebra.SparseMatrix`.
    """
    from ..linear_algebra.sparse import SparseMatrix

    raw = read_csv(path)
    rows = raw[:, 0].astype(np.int64) - 1
    cols = raw[:, 1].astype(np.int64) - 1
    vals = raw[:, 2]
    if shape is None:
        shape = (int(rows.max()) + 1, int(cols.max()) + 1)
    return SparseMatrix.from_coo(rows, cols, vals, shape)


def read_mtx(path: str) -> np.ndarray:
    """Load a MatrixMarket file as a dense float64 array.

    Used to compare against the reference golden matrices
    (test/data/mtx/*.mtx, written by Eigen::saveMarket).
    """
    from scipy.io import mmread

    return np.asarray(mmread(path).todense() if hasattr(mmread(path), "todense") else mmread(path), dtype=np.float64)


def load_mesh_csv(mesh_dir: str):
    """Load a reference mesh CSV quintuple (points/elements/boundary[/edges/neigh]).

    Mirrors the reference test fixture (test/src/utils/mesh_loader.h:62-84):
    element/edge/neighbor indices are 1-based in the files and realigned to 0,
    with non-positive entries (missing neighbors) mapped to -1.

    Returns (points f64[N,d], elements i32[C,k], boundary i32[N]).
    """
    points = read_csv(os.path.join(mesh_dir, "points.csv"))
    elements = read_csv(os.path.join(mesh_dir, "elements.csv")).astype(np.int64) - 1
    boundary = read_csv(os.path.join(mesh_dir, "boundary.csv")).astype(np.int32).reshape(-1)
    return points, elements.astype(np.int32), boundary
