"""BlockFrame: a typed, named-column data frame over NumPy/JAX arrays.

Counterpart of /root/reference/fdaPDE/utils/data_structures/block_frame.h:39
(named matrix blocks with row views and dirty bits) and block_vector.h:24
(strided m-block views over a vector). The C++ type-list machinery is
unnecessary: columns are arrays keyed by name; views are cheap slices.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BlockFrame", "BlockVector"]


class BlockFrame:
    """Named 2D blocks with a common number of rows (block_frame.h:39-202)."""

    def __init__(self, n_rows: int | None = None):
        self._blocks: dict[str, np.ndarray] = {}
        self._dirty: set[str] = set()
        self.n_rows = n_rows

    def insert(self, name: str, data) -> "BlockFrame":
        data = np.asarray(data)
        if data.ndim == 1:
            data = data[:, None]
        if self.n_rows is None:
            self.n_rows = data.shape[0]
        if data.shape[0] != self.n_rows:
            raise ValueError(
                f"block '{name}' has {data.shape[0]} rows, frame has {self.n_rows}"
            )
        self._blocks[name] = data
        self._dirty.add(name)
        return self

    def get(self, name: str) -> np.ndarray:
        return self._blocks[name]

    __getitem__ = get

    def __setitem__(self, name, data):
        self.insert(name, data)

    def has_block(self, name: str) -> bool:
        return name in self._blocks

    def columns(self):
        return list(self._blocks)

    def is_dirty(self, name: str) -> bool:
        return name in self._dirty

    def clear_dirty(self, name: str | None = None):
        if name is None:
            self._dirty.clear()
        else:
            self._dirty.discard(name)

    def row(self, i: int) -> dict:
        """Row view across all blocks (block_frame.h BlockView)."""
        return {k: v[i] for k, v in self._blocks.items()}

    def rows(self, sl) -> "BlockFrame":
        out = BlockFrame()
        for k, v in self._blocks.items():
            out.insert(k, v[sl])
        return out


class BlockVector:
    """View of a vector in contiguous m-sized blocks (block_vector.h:24)."""

    def __init__(self, data, block_size: int):
        self.data = np.asarray(data).reshape(-1)
        assert self.data.size % block_size == 0, "size must divide into blocks"
        self.m = block_size
        self.n_blocks = self.data.size // block_size

    def block(self, i: int) -> np.ndarray:
        return self.data[i * self.m : (i + 1) * self.m]

    __getitem__ = block

    def __setitem__(self, i, value):
        self.data[i * self.m : (i + 1) * self.m] = value

    def blocks(self, start: int, count: int) -> np.ndarray:
        return self.data[start * self.m : (start + count) * self.m]
