"""Performance-critical device ops: assembly contractions and SpMV variants.

The hot paths of the framework (SURVEY.md §2.10 mapping):

- batched local-matrix quadrature contraction (fem/assembler.py einsums,
  XLA-fused; Pallas variants live here as they land),
- `ell.py`: scatter-free SpMV — the element-local products are combined per
  dof through a precomputed ELL adjacency (pure gathers + a small-axis
  reduction), avoiding `segment_sum`'s scatter-add, which serializes on TPU.
"""

from .closed_form import SYM_TO_FULL, p1_stiffness_2d_sym, pack_cell_axis
from .ell import ELLMatrix, build_ell_adjacency, ell_spmv, local_matvec
from .matfree import MatrixFreeLocal, p1_local_stiffness

__all__ = [
    "ELLMatrix",
    "SYM_TO_FULL",
    "MatrixFreeLocal",
    "build_ell_adjacency",
    "ell_spmv",
    "local_matvec",
    "p1_local_stiffness",
    "p1_stiffness_2d_sym",
    "pack_cell_axis",
]
