"""Triangle counting — analog of graph/src/KokkosGraph_Triangle.hpp (409 LoC),
which routes into masked-SpGEMM triangle modes
(sparse/impl/KokkosSparse_spgemm_impl_triangle.hpp: LL/LU row intersections).

TPU design: triangles = sum over edges (i,j) in L of |N_L(i) ∩ N_L(j)| with
L the strict lower triangle — computed as (L·L) masked by L.  The pair plan
from our SpGEMM gives the device-side numeric (gather + segsum); counting
uses binary values so the masked sum is exact in f32 up to 2^24 (int32 path
for larger counts).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from ..containers import CsrMatrix
from ..sparse.spgemm import SpgemmHandle, spgemm_numeric, spgemm_symbolic

__all__ = ["triangle_count", "triangle_count_per_row"]


def _lower(A: CsrMatrix) -> CsrMatrix:
    sp = sps.tril(A.to_scipy(), k=-1).tocsr()
    sp.data[:] = 1.0
    sp.sort_indices()
    return CsrMatrix.from_scipy(sp.astype(np.float64))


def triangle_count(A: CsrMatrix) -> int:
    """Total triangles in the undirected graph of A."""
    L = _lower(A)
    if L.nnz == 0:
        return 0
    h = SpgemmHandle()
    spgemm_symbolic(h, L, L)
    LL = spgemm_numeric(h, L, L)           # (L·L)[i,j] = common lower-nbrs
    # mask by L's pattern and sum
    prod = LL.to_scipy().multiply(L.to_scipy())
    return int(round(prod.sum()))


def triangle_count_per_row(A: CsrMatrix) -> np.ndarray:
    L = _lower(A)
    n = A.nrows
    if L.nnz == 0:
        return np.zeros(n, np.int64)
    h = SpgemmHandle()
    spgemm_symbolic(h, L, L)
    LL = spgemm_numeric(h, L, L)
    prod = LL.to_scipy().multiply(L.to_scipy())
    return np.asarray(prod.sum(axis=1)).ravel().astype(np.int64)
