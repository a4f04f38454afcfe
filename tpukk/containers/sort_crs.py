"""CRS row sorting + duplicate merging + zero removal — analogs of
sparse/src/KokkosSparse_SortCrs.hpp (537 LoC) and
KokkosSparse_Utils.hpp:1799 (removeCrsMatrixZeros), :338-392 (transpose).

These are symbolic (shape-changing) transforms → host-side numpy/scipy, same
placement rationale as convert.py.
"""
from __future__ import annotations

import numpy as np

from .csr import CsrMatrix

__all__ = ["sort_crs", "sort_and_merge_crs", "remove_zeros", "transpose",
           "is_sorted", "extract_diagonal_blocks", "sort_by_row_size",
           "symmetrize_pattern"]


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


def extract_diagonal_blocks(csr: CsrMatrix, n_blocks: int):
    """Split the square matrix into n_blocks diagonal CRS blocks (equal row
    ranges; remainder rows go to the last block) — analog of
    kk_extract_diagonal_blocks_crsmatrix_sequential
    (sparse/src/KokkosSparse_Utils.hpp:1867+)."""
    n = csr.nrows
    if csr.ncols != n:
        raise ValueError("extract_diagonal_blocks: square matrix required")
    if n_blocks < 1 or n_blocks > max(1, n):
        raise ValueError("extract_diagonal_blocks: bad n_blocks")
    sp = csr.to_scipy()
    size = n // n_blocks
    blocks = []
    for b in range(n_blocks):
        r0 = b * size
        r1 = n if b == n_blocks - 1 else (b + 1) * size
        blk = sp[r0:r1, r0:r1].tocsr()
        blk.sort_indices()
        blocks.append(CsrMatrix.from_scipy(blk, value_dtype=csr.dtype))
    return blocks


def sort_by_row_size(csr: CsrMatrix, ascending: bool = False) -> np.ndarray:
    """Permutation ordering rows by nnz (stable) — analog of
    kk_sort_by_row_size (sparse/src/KokkosSparse_Utils.hpp:1045-1155), used
    for load-balanced scheduling.  Returns the new-order row indices."""
    lens = np.diff(csr.host_row_map())
    key = lens if ascending else -lens
    return np.argsort(key, kind="stable").astype(np.int32)


def symmetrize_pattern(csr: CsrMatrix) -> CsrMatrix:
    """Pattern/value symmetrization A + Aᵀ (role of kk_symmetrize_graph,
    common/src/KokkosKernels_Utils.hpp)."""
    sp = csr.to_scipy()
    out = (sp + sp.T).tocsr()
    out.sort_indices()
    return CsrMatrix.from_scipy(out, value_dtype=csr.dtype)
