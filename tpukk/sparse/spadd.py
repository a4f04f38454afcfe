"""SpADD (C = alpha*A + beta*B) — analog of sparse/src/KokkosSparse_spadd.hpp:32,106
with the sorted/unsorted split of the reference
(_spadd_symbolic_impl.hpp: SortedCountEntries / MergeEntriesFunctor vs the
hashmap path for unsorted inputs).

TPU-first: symbolic (host) computes C's union pattern + two index maps
a_pos/b_pos (position of each C entry in A/B values, -1 if absent); numeric
(device) is two masked gathers and an axpby — static, scatter-free.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check
from ..containers import CsrMatrix

__all__ = ["SpaddHandle", "spadd_symbolic", "spadd_numeric", "spadd"]


class SpaddHandle:
    """cf. sparse/src/KokkosSparse_spadd_handle.hpp (sorted flag + result nnz)."""

    def __init__(self, sorted_input: bool = True):
        self.sorted_input = sorted_input
        self.is_symbolic_called = False
        self.row_map_c = None
        self.entries_c = None
        self.a_pos = None
        self.b_pos = None
        self.shape = None


def spadd_symbolic(handle: SpaddHandle, A: CsrMatrix, B: CsrMatrix):
    check(A.shape == B.shape, "spadd: shape mismatch")
    arm, aent = A.host_row_map().astype(np.int64), A.host_entries().astype(np.int64)
    brm, bent = B.host_row_map().astype(np.int64), B.host_entries().astype(np.int64)
    n, m = A.shape
    a_rows = np.repeat(np.arange(n, dtype=np.int64), arm[1:] - arm[:-1])
    b_rows = np.repeat(np.arange(n, dtype=np.int64), brm[1:] - brm[:-1])
    a_keys = a_rows * m + aent
    b_keys = b_rows * m + bent
    if not handle.sorted_input:
        # unsorted rows: keys still encode (row, col); sort handles it —
        # the hashmap-accumulator fallback collapses into the same sort
        pass
    all_keys = np.concatenate([a_keys, b_keys])
    uniq = np.unique(all_keys)
    nnz_c = uniq.size
    rows_c = uniq // m
    cols_c = (uniq % m).astype(np.int32)
    row_map_c = np.zeros(n + 1, np.int32)
    np.add.at(row_map_c[1:], rows_c, 1)
    row_map_c = np.cumsum(row_map_c).astype(np.int32)
    # position maps via searchsorted (A/B keys must be unique per matrix)
    a_sorted_order = np.argsort(a_keys, kind="stable")
    b_sorted_order = np.argsort(b_keys, kind="stable")
    a_pos = np.full(nnz_c, -1, np.int64)
    b_pos = np.full(nnz_c, -1, np.int64)
    ia = np.searchsorted(a_keys[a_sorted_order], uniq)
    hit_a = (ia < a_keys.size)
    hit_a[hit_a] &= a_keys[a_sorted_order][ia[hit_a]] == uniq[hit_a]
    a_pos[hit_a] = a_sorted_order[ia[hit_a]]
    ib = np.searchsorted(b_keys[b_sorted_order], uniq)
    hit_b = ib < b_keys.size
    hit_b[hit_b] &= b_keys[b_sorted_order][ib[hit_b]] == uniq[hit_b]
    b_pos[hit_b] = b_sorted_order[ib[hit_b]]
    handle.row_map_c = row_map_c
    handle.entries_c = cols_c
    handle.a_pos = jnp.asarray(a_pos.astype(np.int32))
    handle.b_pos = jnp.asarray(b_pos.astype(np.int32))
    handle.shape = A.shape
    handle.is_symbolic_called = True
    return row_map_c


def spadd_numeric(handle: SpaddHandle, alpha, A: CsrMatrix, beta, B: CsrMatrix) -> CsrMatrix:
    check(handle.is_symbolic_called, "spadd_numeric: call spadd_symbolic first")
    a_take = jnp.take(A.values, jnp.maximum(handle.a_pos, 0))
    b_take = jnp.take(B.values, jnp.maximum(handle.b_pos, 0))
    vals = (alpha * jnp.where(handle.a_pos >= 0, a_take, 0)
            + beta * jnp.where(handle.b_pos >= 0, b_take, 0)).astype(A.dtype)
    return CsrMatrix.from_arrays(
        jnp.asarray(handle.row_map_c), jnp.asarray(handle.entries_c), vals,
        nrows=handle.shape[0], ncols=handle.shape[1])


def spadd(alpha, A: CsrMatrix, beta, B: CsrMatrix, sorted_input: bool = True) -> CsrMatrix:
    h = SpaddHandle(sorted_input)
    spadd_symbolic(h, A, B)
    return spadd_numeric(h, alpha, A, beta, B)
