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

__all__ = ["MdfHandle", "mdf_symbolic", "mdf_numeric", "mdf_ordering"]


class MdfHandle:
    def __init__(self):
        self.is_symbolic_called = False
        self.permutation = None


def mdf_ordering(A: CsrMatrix) -> np.ndarray:
    """The MDF elimination order (standalone, cf. mdf.hpp ordering entry)."""
    h = MdfHandle()
    mdf_symbolic(h, A)
    return h.permutation


def mdf_symbolic(handle: MdfHandle, A: CsrMatrix):
    """Compute the greedy minimum-discarded-fill elimination order."""
    check(A.nrows == A.ncols, "mdf: square matrix required")
    sp = A.to_scipy().tocsr().astype(np.float64)
    n = sp.shape[0]
    dense_ok = n <= 2048
    check(dense_ok, "mdf: host greedy limited to n<=2048 this round")
    M = sp.toarray()
    pat = M != 0
    alive = np.ones(n, bool)
    order = np.empty(n, np.int64)
    for step in range(n):
        best, best_score = -1, np.inf
        for v in np.nonzero(alive)[0]:
            piv = M[v, v]
            if piv == 0:
                score = np.inf
            else:
                rows = alive & (M[:, v] != 0)
                rows[v] = False
                cols = alive & (M[v, :] != 0)
                cols[v] = False
                upd = np.outer(M[rows, v], M[v, cols]) / piv
                # discarded = update outside existing pattern
                discarded = upd[~pat[np.ix_(rows, cols)]]
                score = float(np.sum(discarded ** 2))
            if score < best_score:
                best, best_score = v, score
        v = best if best >= 0 else int(np.nonzero(alive)[0][0])
        order[step] = v
        piv = M[v, v] if M[v, v] != 0 else 1.0
        rows = alive & (M[:, v] != 0)
        rows[v] = False
        cols = alive & (M[v, :] != 0)
        cols[v] = False
        upd = np.outer(M[rows, v], M[v, cols]) / piv
        keep = pat[np.ix_(rows, cols)]
        M[np.ix_(rows, cols)] -= np.where(keep, upd, 0.0)
        alive[v] = False
    handle.permutation = order.astype(np.int32)
    handle.is_symbolic_called = True


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
