"""SpILUK — ILU(k) incomplete factorization, analog of
sparse/src/KokkosSparse_spiluk.hpp (:42 symbolic, :200 numeric) with the
fill-level symbolic + level scheduling of
sparse/impl/KokkosSparse_spiluk_symbolic_impl.hpp:37-88 and the per-level
numeric of _spiluk_numeric_impl.hpp.

TPU design: symbolic (host) computes the ILU(k) fill pattern by the standard
level-of-fill recurrence and the row level schedule.  Numeric is a host
row-by-row IKJ factorization for now (the level-parallel device numeric via
pair plans is the par_ilut fixed-point machinery — see par_ilut.py — and a
planned upgrade here); the *apply* (two sptrsv sweeps) is fully device-side.
Returns L (unit lower) and U (upper) as separate CSR matrices.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sps

from ..common import check
from ..containers import CsrMatrix
from ..common.tracing import annotate

__all__ = ["SpilukHandle", "spiluk_symbolic", "spiluk_numeric"]


class SpilukHandle:
    """cf. spiluk_handle.hpp (fill level k, nnz bounds, level schedule)."""

    def __init__(self, fill_level: int = 0):
        self.fill_level = int(fill_level)
        self.is_symbolic_called = False
        self.pattern = None      # scipy.csr bool pattern of L+U (with diag)
        self.levels = None


def _iluk_pattern(A: sps.csr_matrix, k: int) -> sps.csr_matrix:
    """Level-of-fill symbolic: fill(i,j) = min over paths; entry kept if
    fill <= k.  Classic IKJ symbolic on host."""
    n = A.shape[0]
    A = A.tocsr()
    A.sort_indices()
    INF = np.iinfo(np.int32).max
    # store per-row dict col -> level
    rows_cols = []
    rows_lvls = []
    lvl_of: list = [None] * n
    for i in range(n):
        s, e = A.indptr[i], A.indptr[i + 1]
        cols = dict.fromkeys(A.indices[s:e].tolist(), 0)
        cols[i] = 0
        # IKJ update: for each kk < i in row, merge row kk of U
        work = sorted(cols)
        wi = 0
        while wi < len(work):
            kk = work[wi]
            wi += 1
            if kk >= i:
                continue
            lik = cols[kk]
            if lik > k:
                continue
            for jj, lkj in zip(lvl_of[kk][0], lvl_of[kk][1]):
                if jj <= kk:
                    continue
                f = lik + lkj + 1
                if f <= k:
                    old = cols.get(jj, INF)
                    if f < old:
                        if jj not in cols:
                            # maintain sorted work list lazily
                            import bisect

                            bisect.insort(work, jj)
                        cols[jj] = f
        cs = np.fromiter(sorted(cols), dtype=np.int64)
        ls = np.fromiter((cols[c] for c in sorted(cols)), dtype=np.int64)
        lvl_of[i] = (cs, ls)
        rows_cols.append(cs)
        rows_lvls.append(ls)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum([len(c) for c in rows_cols])
    indices = np.concatenate(rows_cols) if n else np.empty(0, np.int64)
    data = np.ones(len(indices))
    return sps.csr_matrix((data, indices, indptr), shape=A.shape)


@annotate("spiluk.spiluk_symbolic")
def spiluk_symbolic(handle: SpilukHandle, A: CsrMatrix):
    check(A.nrows == A.ncols, "spiluk: square matrix required")
    sp = A.to_scipy()
    from .. import native

    if native.available():
        indptr, indices = native.iluk_symbolic(
            sp.indptr, sp.indices, A.nrows, handle.fill_level)
        pat = sps.csr_matrix(
            (np.ones(len(indices)), indices, indptr), shape=sp.shape)
    else:
        pat = _iluk_pattern(sp, handle.fill_level)
    handle.pattern = pat
    handle.is_symbolic_called = True
    return pat.nnz


@annotate("spiluk.spiluk_numeric")
def spiluk_numeric(handle: SpilukHandle, A: CsrMatrix) -> Tuple[CsrMatrix, CsrMatrix]:
    """Factor within the symbolic pattern; returns (L unit-lower w/ diag, U)."""
    check(handle.is_symbolic_called, "spiluk_numeric: symbolic first")
    sp = A.to_scipy().tocsr()
    pat = handle.pattern
    n = sp.shape[0]
    indptr, indices = pat.indptr, pat.indices
    from .. import native

    if native.available():
        vals = native.ilu_numeric(
            indptr, indices, sp.indptr, sp.indices,
            sp.data.astype(np.float64), n)
        return _split_lu(sp, indptr, indices, vals, A.dtype)
    # dense-row workspace IKJ factorization restricted to pattern
    vals = np.zeros(pat.nnz)
    # initialize with A values on the pattern
    w = np.zeros(n)
    # row-wise storage of factored rows for U access
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        cols = indices[s:e]
        w[:] = 0.0
        arow = sp.getrow(i)
        w[arow.indices] = arow.data
        for idx in range(s, e):
            kk = indices[idx]
            if kk >= i:
                break
            # l_ik = w_k / u_kk
            ks, ke = indptr[kk], indptr[kk + 1]
            kcols = indices[ks:ke]
            kvals = vals[ks:ke]
            dk = kvals[kcols == kk]
            lik = w[kk] / dk[0]
            w[kk] = lik
            upd = kcols > kk
            w[kcols[upd]] -= lik * kvals[upd]
        vals[s:e] = w[cols]
    return _split_lu(sp, indptr, indices, vals, A.dtype)


def _split_lu(sp, indptr, indices, vals, dtype):
    n = sp.shape[0]
    LU = sps.csr_matrix((vals, indices.copy(), indptr.copy()), shape=sp.shape)
    L = sps.tril(LU, k=-1).tocsr()
    L = (L + sps.identity(n, format="csr")).tocsr()
    U = sps.triu(LU, k=0).tocsr()
    L.sort_indices()
    U.sort_indices()
    return (CsrMatrix.from_scipy(L, value_dtype=dtype),
            CsrMatrix.from_scipy(U, value_dtype=dtype))
