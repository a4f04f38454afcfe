"""MDF — minimum discarded fill incomplete factorization + ordering, analog of
sparse/src/KokkosSparse_mdf.hpp:22-38 (mdf_symbolic / mdf_numeric /
mdf_ordering) and sparse/impl/KokkosSparse_mdf_impl.hpp.

Greedy: at each step eliminate the vertex whose elimination discards the
least fill (measured by the Frobenius norm of the discarded update), record
the permutation, and keep the factor entries on the original pattern.
Inherently sequential-greedy → host symbolic+numeric; the apply is sptrsv.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sps

from ..common import check
from ..containers import CsrMatrix
from ..common.tracing import annotate

__all__ = ["MdfHandle", "mdf_symbolic", "mdf_numeric", "mdf_ordering"]


class MdfHandle:
    def __init__(self):
        self.is_symbolic_called = False
        self.permutation = None


@annotate("mdf.mdf_ordering")
def mdf_ordering(A: CsrMatrix) -> np.ndarray:
    """The MDF elimination order (standalone, cf. mdf.hpp ordering entry)."""
    h = MdfHandle()
    mdf_symbolic(h, A)
    return h.permutation


@annotate("mdf.mdf_symbolic")
def mdf_symbolic(handle: MdfHandle, A: CsrMatrix):
    """Compute the greedy minimum-discarded-fill elimination order.

    The elimination updates are pattern-restricted (incomplete), so the
    structure is STATIC — only values on A's pattern change.  Scores are
    cached in a lazy-invalidation heap and recomputed only for the
    eliminated vertex's row/column neighbors (the reference's affected-
    vertex update, KokkosSparse_mdf_impl.hpp), giving ~O(n·deg³) instead of
    the dense O(n²·deg²) rescan."""
    import heapq

    check(A.nrows == A.ncols, "mdf: square matrix required")
    sp = A.to_scipy().tocsr().astype(np.float64)
    sp.sort_indices()
    n = sp.shape[0]
    from .. import native

    order_native = native.mdf_order(sp.indptr, sp.indices, sp.data, n)
    if order_native is not None:
        handle.permutation = order_native
        handle.is_symbolic_called = True
        return
    rm = sp.indptr
    cols_of = [sp.indices[rm[i]:rm[i + 1]] for i in range(n)]   # sorted
    pos0 = rm[:-1].copy()
    vals = sp.data.copy()
    spc = sp.tocsc()
    rows_of = [spc.indices[spc.indptr[j]:spc.indptr[j + 1]] for j in range(n)]
    # CSR position of (i, j) or -1
    def pos(i, j):
        k = np.searchsorted(cols_of[i], j)
        if k < len(cols_of[i]) and cols_of[i][k] == j:
            return pos0[i] + k
        return -1

    diag_pos = np.array([pos(i, i) for i in range(n)], np.int64)
    alive = np.ones(n, bool)

    def score(v):
        dp = diag_pos[v]
        piv = vals[dp] if dp >= 0 else 0.0
        if piv == 0.0:
            return np.inf
        R = rows_of[v][alive[rows_of[v]] & (rows_of[v] != v)]
        C = cols_of[v][alive[cols_of[v]] & (cols_of[v] != v)]
        if len(R) == 0 or len(C) == 0:
            return 0.0
        cv = np.array([vals[pos(r, v)] for r in R])             # column of v
        rv = vals[pos0[v] + np.searchsorted(cols_of[v], C)]     # row of v
        s = 0.0
        for idx, r in enumerate(R):
            k = np.searchsorted(cols_of[r], C)
            inpat = (k < len(cols_of[r])) & (cols_of[r][np.minimum(k, len(cols_of[r]) - 1)] == C)
            upd = (cv[idx] * rv[~inpat]) / piv
            s += float(np.sum(upd * upd))
        return s

    stamp = np.zeros(n, np.int64)
    heap = [(score(v), 0, v) for v in range(n)]
    heapq.heapify(heap)
    order = np.empty(n, np.int64)
    for step in range(n):
        v = -1
        while heap:
            sc, st, u = heapq.heappop(heap)
            if alive[u] and st == stamp[u]:
                v = u
                break
        if v < 0:
            v = int(np.nonzero(alive)[0][0])
        order[step] = v
        dp = diag_pos[v]
        piv = vals[dp] if dp >= 0 and vals[dp] != 0 else 1.0
        R = rows_of[v][alive[rows_of[v]] & (rows_of[v] != v)]
        C = cols_of[v][alive[cols_of[v]] & (cols_of[v] != v)]
        if len(R) and len(C):
            cv = np.array([vals[pos(r, v)] for r in R])
            rv = vals[pos0[v] + np.searchsorted(cols_of[v], C)]
            for idx, r in enumerate(R):
                k = np.searchsorted(cols_of[r], C)
                kc = np.minimum(k, len(cols_of[r]) - 1)
                inpat = (cols_of[r][kc] == C) & (k < len(cols_of[r]))
                vals[pos0[r] + kc[inpat]] -= cv[idx] * rv[inpat] / piv
        alive[v] = False
        # only row/column neighbors' scores changed
        for u in np.union1d(R, C):
            if alive[u]:
                stamp[u] += 1
                heapq.heappush(heap, (score(u), stamp[u], u))
    handle.permutation = order.astype(np.int32)
    handle.is_symbolic_called = True


@annotate("mdf.mdf_numeric")
def mdf_numeric(handle: MdfHandle, A: CsrMatrix) -> Tuple[CsrMatrix, CsrMatrix]:
    """ILU(0) on the MDF-permuted matrix: returns (L, U) in permuted order
    plus the permutation on the handle."""
    check(handle.is_symbolic_called, "mdf_numeric: symbolic first")
    from ..graph.ordering import permute_matrix
    from .spiluk import SpilukHandle, spiluk_numeric, spiluk_symbolic

    perm = handle.permutation
    B = permute_matrix(A, perm)
    h = SpilukHandle(0)
    spiluk_symbolic(h, B)
    return spiluk_numeric(h, B)
