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
from ..common.tracing import annotate
from ..containers import CsrMatrix

__all__ = ["SpaddHandle", "spadd_symbolic", "spadd_numeric", "spadd",
           "bspadd"]


class SpaddHandle:
    """cf. sparse/src/KokkosSparse_spadd_handle.hpp (sorted flag + result nnz)."""

    def __init__(self, sorted_input: bool = True):
        self.sorted_input = sorted_input
        self.is_symbolic_called = False
        self.row_map_c = None
        self.entries_c = None
        self.sort_key = None   # slot plan (2*c_idx / 2*c_idx+1 / pads)
        self.n_pad = 0
        self.nnz_c = 0
        self.shape = None


@annotate("spadd_symbolic")
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
    # slot plan: contribution of A entry j lands in slot 2·c_idx, of B entry
    # in 2·c_idx+1; numeric is then ONE keyed lax.sort (scatter-by-sort, see
    # common.utils.permute_via_sort — jnp.take gathers here cost ~13 ms at
    # 800k nnz) followed by a pairwise reshape-sum.
    c_of_a = np.searchsorted(uniq, a_keys)
    c_of_b = np.searchsorted(uniq, b_keys)
    slot = np.concatenate([2 * c_of_a, 2 * c_of_b + 1])
    n_tot = 2 * nnz_c
    used = np.zeros(n_tot, bool)
    used[slot] = True
    free = np.nonzero(~used)[0]
    handle.sort_key = jnp.asarray(
        np.concatenate([slot, free]).astype(np.int32))
    handle.n_pad = int(free.size)
    handle.nnz_c = nnz_c
    handle.row_map_c = row_map_c
    handle.entries_c = cols_c
    handle.shape = A.shape
    handle.is_symbolic_called = True
    return row_map_c


@annotate("spadd_numeric")
def spadd_numeric(handle: SpaddHandle, alpha, A: CsrMatrix, beta, B: CsrMatrix) -> CsrMatrix:
    check(handle.is_symbolic_called, "spadd_numeric: call spadd_symbolic first")
    v = jnp.concatenate([
        (alpha * A.values).astype(A.dtype),
        (beta * B.values).astype(A.dtype),
        jnp.zeros(handle.n_pad, A.dtype)])
    _, vs = jax.lax.sort((handle.sort_key, v), num_keys=1)
    vals = vs.reshape(handle.nnz_c, 2).sum(axis=1).astype(A.dtype)
    return CsrMatrix.from_arrays(
        jnp.asarray(handle.row_map_c), jnp.asarray(handle.entries_c), vals,
        nrows=handle.shape[0], ncols=handle.shape[1])


@annotate("spadd")
def spadd(alpha, A: CsrMatrix, beta, B: CsrMatrix, sorted_input: bool = True) -> CsrMatrix:
    h = SpaddHandle(sorted_input)
    spadd_symbolic(h, A, B)
    return spadd_numeric(h, alpha, A, beta, B)


@annotate("bspadd")
def bspadd(alpha, A, beta, B):
    """Block SpADD: C = alpha*A + beta*B over BsrMatrix operands with equal
    block size — the block variant the reference exercises in
    sparse/unit_test/Test_BlockSparse.hpp (spadd over BsrMatrix).  Symbolic
    is the union of the BLOCK patterns; numeric gathers whole (b,b) value
    blocks through the same slot-sort plan as the scalar path (each slot
    carries b*b values)."""
    from ..containers import BsrMatrix

    check(isinstance(A, BsrMatrix) and isinstance(B, BsrMatrix),
          "bspadd: BsrMatrix operands required")
    check(A.shape == B.shape and A.block_size == B.block_size,
          "bspadd: shape/block mismatch")
    b = A.block_size
    nbr, nbc = A.n_block_rows, A.n_block_cols
    arm = np.asarray(A.row_map, np.int64)
    brm = np.asarray(B.row_map, np.int64)
    aent = np.asarray(A.entries, np.int64)
    bent = np.asarray(B.entries, np.int64)
    a_rows = np.repeat(np.arange(nbr, dtype=np.int64), arm[1:] - arm[:-1])
    b_rows = np.repeat(np.arange(nbr, dtype=np.int64), brm[1:] - brm[:-1])
    a_keys = a_rows * nbc + aent
    b_keys = b_rows * nbc + bent
    uniq = np.unique(np.concatenate([a_keys, b_keys]))
    nnzb_c = uniq.size
    rows_c = uniq // nbc
    cols_c = (uniq % nbc).astype(np.int32)
    row_map_c = np.zeros(nbr + 1, np.int32)
    np.add.at(row_map_c[1:], rows_c, 1)
    row_map_c = np.cumsum(row_map_c).astype(np.int32)
    slot = np.concatenate([2 * np.searchsorted(uniq, a_keys),
                           2 * np.searchsorted(uniq, b_keys) + 1])
    used = np.zeros(2 * nnzb_c, bool)
    used[slot] = True
    free = np.nonzero(~used)[0]
    key = jnp.asarray(np.concatenate([slot, free]).astype(np.int32))
    v = jnp.concatenate([
        (alpha * A.values).astype(A.dtype).reshape(len(aent), b * b),
        (beta * B.values).astype(A.dtype).reshape(len(bent), b * b),
        jnp.zeros((free.size, b * b), A.dtype)], axis=0)
    _, vs = jax.lax.sort((jnp.broadcast_to(key[:, None], v.shape), v),
                         num_keys=1, dimension=0)
    vals = vs.reshape(nnzb_c, 2, b * b).sum(axis=1).reshape(nnzb_c, b, b)
    return BsrMatrix(jnp.asarray(row_map_c), jnp.asarray(cols_c),
                     vals.astype(A.dtype), A.nrows, A.ncols, b)
