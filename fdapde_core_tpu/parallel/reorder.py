"""Bandwidth-reducing dof reorderings (host-side, one-time preprocessing).

The reference-parity dof numbering (P2 edge dofs at n_nodes + edge_id,
lagrangian_basis.h:94-136 semantics) is golden for assembly parity but
hostile to banded solver formats: a vertex dof couples to edge dofs numbered
~n_nodes away, so the DIA offset set spans the whole matrix. The solver
layer therefore applies a locality-restoring permutation first (SURVEY.md
§7.3 risk 2: "RCM/SFC dof reordering for banded structure"):

- `rcm_permutation`: reverse Cuthill–McKee on the dof coupling graph —
  the classic bandwidth minimizer, works for any mesh/order,
- structured meshes can instead use the Morton/SFC ordering from
  parallel/partition.py.

Pure NumPy BFS; at very large n move to native/ (the C++ topology module)
— preprocessing is host-side and checkpointable (utils/checkpoint.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["rcm_permutation", "permute_system"]


def _adjacency_csr(rows, cols, n: int):
    """Symmetrized dedup'd adjacency in CSR (no self loops)."""
    r = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cols, dtype=np.int64)
    keep = r != c
    r, c = r[keep], c[keep]
    rr = np.concatenate([r, c])
    cc = np.concatenate([c, r])
    key = np.unique(rr * n + cc)
    rr, cc = key // n, key % n
    indptr = np.searchsorted(rr, np.arange(n + 1))
    return indptr, cc.astype(np.int64)


def _rcm_native(indptr, adj, n: int):
    """Native C++ RCM (None when the library is unavailable)."""
    try:
        from ..native.build import get_lib
    except Exception:  # pragma: no cover - import robustness
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "rcm_order"):
        return None
    import ctypes

    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    adj = np.ascontiguousarray(adj, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    got = lib.rcm_order(
        indptr.ctypes.data_as(ctypes.c_void_p),
        adj.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        perm.ctypes.data_as(ctypes.c_void_p),
    )
    return perm if got == n else None


def rcm_permutation(rows, cols, n: int):
    """Reverse Cuthill–McKee ordering of the graph with edges (rows, cols).

    Returns (perm, inv): perm[new] = old (gather order), inv[old] = new.
    BFS from a minimum-degree node per component, neighbors visited in
    increasing-degree order, final order reversed. Uses the native C++
    kernel (native/rcm.cpp, identical tie-breaking) when available; the
    NumPy BFS below is the fallback.
    """
    indptr, adj = _adjacency_csr(rows, cols, n)
    native = _rcm_native(indptr, adj, n)
    if native is not None:
        perm = native
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n, dtype=np.int64)
        return perm, inv
    degree = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    # component seeds in min-degree order
    seeds = np.argsort(degree, kind="stable")
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = adj[indptr[u]:indptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                order[pos:pos + nbrs.size] = nbrs
                pos += nbrs.size
    perm = order[::-1].copy()  # reverse CM
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)
    return perm, inv


def permute_system(perm, inv, rows, cols, vals=None):
    """COO entries of P A P^T: A'[inv[i], inv[j]] = A[i, j].

    Solve A' x' = b[perm], then x = x'[inv].
    """
    inv = np.asarray(inv)
    r = inv[np.asarray(rows)]
    c = inv[np.asarray(cols)]
    return (r, c) if vals is None else (r, c, vals)
