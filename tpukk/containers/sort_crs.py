"""CRS row sorting + duplicate merging + zero removal — analogs of
sparse/src/KokkosSparse_SortCrs.hpp (537 LoC) and
KokkosSparse_Utils.hpp:1799 (removeCrsMatrixZeros), :338-392 (transpose).

These are symbolic (shape-changing) transforms → host-side numpy/scipy, same
placement rationale as convert.py.
"""
from __future__ import annotations

import numpy as np

from .csr import CsrMatrix

__all__ = ["sort_crs", "sort_and_merge_crs", "remove_zeros", "transpose", "is_sorted"]


def sort_crs(csr: CsrMatrix) -> CsrMatrix:
    sp = csr.to_scipy()
    sp.sort_indices()
    return CsrMatrix.from_scipy(sp, value_dtype=csr.dtype)


def sort_and_merge_crs(csr: CsrMatrix) -> CsrMatrix:
    sp = csr.to_scipy()
    sp.sum_duplicates()  # also sorts
    return CsrMatrix.from_scipy(sp, value_dtype=csr.dtype)


def remove_zeros(csr: CsrMatrix) -> CsrMatrix:
    sp = csr.to_scipy()
    sp.eliminate_zeros()
    return CsrMatrix.from_scipy(sp, value_dtype=csr.dtype)


def transpose(csr: CsrMatrix, sorted_cols: bool = True) -> CsrMatrix:
    """Materialized Aᵀ.  The reference also prefers materialization for
    repeated transpose-mode use (SURVEY.md §2.10: atomics-free scatter)."""
    sp = csr.to_scipy().T.tocsr()
    if sorted_cols:
        sp.sort_indices()
    return CsrMatrix.from_scipy(sp, value_dtype=csr.dtype)


def is_sorted(csr: CsrMatrix) -> bool:
    rm = csr.host_row_map()
    ent = csr.host_entries()
    for i in range(len(rm) - 1):
        row = ent[rm[i]:rm[i + 1]]
        if np.any(np.diff(row) < 0):
            return False
    return True
