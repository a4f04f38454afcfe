"""Triangle counting — analog of graph/src/KokkosGraph_Triangle.hpp (409 LoC),
which routes into masked-SpGEMM triangle modes
(sparse/impl/KokkosSparse_spgemm_impl_triangle.hpp: LL/LU row intersections
with mergeAnd/TriangleCount hashmap inserts, HashmapAccumulator.hpp:167-272).

Design: triangles = Σ over edges (i,j) in L of |N_L(i) ∩ N_L(j)| with L the
strict lower triangle.  Like the reference (and unlike a generic SpGEMM),
C = L·L is never materialized: we enumerate the L·L wedges (i→k→j) exactly as
the SpGEMM pair plan does, then count the wedges whose endpoint (i,j) is an
edge of L via one sorted-key membership search.  This is the symbolic phase
of the masked SpGEMM — there is no numeric phase for pattern counting, so the
whole computation is vectorized host numpy (plan-time work in the TPU
design; the earlier version that ran a full device SpGEMM numeric spent 17s
on transfers for a count the symbolic already knew).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from ..containers import CsrMatrix

__all__ = ["triangle_count", "triangle_count_per_row"]


def _lower(A: CsrMatrix):
    sp = sps.tril(A.to_scipy(), k=-1).tocsr()
    sp.sort_indices()
    return sp.indptr.astype(np.int64), sp.indices.astype(np.int64)


def _masked_wedges(A: CsrMatrix):
    """(matching_rows, n) — the rows i of every wedge i→k→j with (i,j) ∈ L."""
    rm, ent = _lower(A)
    n = A.nrows
    if len(ent) == 0:
        return np.empty(0, np.int64), n
    row_len = rm[1:] - rm[:-1]
    row_of = np.repeat(np.arange(n, dtype=np.int64), row_len)
    # wedge enumeration (the pair-plan expansion of spgemm._symbolic_host):
    # for each L entry (i,k), pair with every entry (k,j) of L's row k
    expand = row_len[ent]
    P = int(expand.sum())
    out_row = np.repeat(row_of, expand)
    b_start = np.repeat(rm[ent], expand)
    within = np.arange(P, dtype=np.int64) - np.repeat(
        np.cumsum(expand) - expand, expand)
    out_col = ent[b_start + within]
    # membership (i,j) ∈ L: rows ascend and columns are sorted within rows,
    # so flat keys i*n+j are globally sorted — one searchsorted does the
    # merge-based intersection (the mergeAnd of the reference's accumulator)
    lkey = row_of * n + ent
    wkey = out_row * n + out_col
    pos = np.searchsorted(lkey, wkey)
    hit = (pos < len(lkey)) & (lkey[np.minimum(pos, len(lkey) - 1)] == wkey)
    return out_row[hit], n


def _native_count(A: CsrMatrix):
    """C++ mark-based count (~100x the vectorized-numpy wedge pass: the
    wedge expansion materializes every i->k->j while the mark-based loop
    touches each once with O(1) membership)."""
    from .. import native

    if not native.available():
        return None
    rm, ent = _lower(A)
    return native.triangle_count(rm, ent, A.nrows)


def triangle_count(A: CsrMatrix) -> int:
    """Total triangles in the undirected graph of A."""
    res = _native_count(A)
    if res is not None:
        return res[0]
    rows, _ = _masked_wedges(A)
    return int(rows.shape[0])


def triangle_count_per_row(A: CsrMatrix) -> np.ndarray:
    res = _native_count(A)
    if res is not None:
        return res[1]
    rows, n = _masked_wedges(A)
    return np.bincount(rows, minlength=n).astype(np.int64)
