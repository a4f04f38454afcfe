"""SpMV implementation layer — TPU-native analog of
sparse/impl/KokkosSparse_spmv_impl.hpp (row-per-thread + team paths) and
sparse/impl/KokkosSparse_spmv_impl_merge.hpp (merge-path load balance).

TPU algorithm taxonomy (SURVEY.md §2.10 translation table):

* ELL / bucketed-ELL  — the static load-balance replacement for merge-path:
  rows are bucketed by nnz into power-of-2 padded widths on host at plan time;
  each bucket is a dense (rows_b, width) gather+reduce with NO scatter and no
  dynamic control flow.  Pads point at column 0 with value 0 (mathematically
  neutral).  This is the default for matrices with skewed row lengths.
* SEGSUM — per-nnz `segment_sum` over the expanded COO row index; maps to
  XLA's sorted-segment reduction.  Good when nnz/row is tiny or uniform.
* BSR_MXU — block CSR: gathers x block-segments and contracts (nnzb,b,b)×
  (nnzb,b) as one batched einsum, the analog of the reference's tensor-core
  BSR path (KokkosSparse_spmv_bsrmatrix_impl.hpp:71-88).
* DENSE — densify tiny matrices and use the MXU outright.

All plans are immutable pytrees built host-side once (the symbolic/numeric
split of the reference's SPMVHandle, KokkosSparse_spmv_handle.hpp:91-135).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import inverse_permutation, round_up
from ..containers import BsrMatrix, CsrMatrix

__all__ = [
    "SpmvAlgorithm",
    "EllBucket",
    "EllPlan",
    "SegsumPlan",
    "build_ell_plan",
    "build_segsum_plan",
    "apply_ell",
    "apply_segsum",
    "apply_bsr",
    "apply_dense",
]


class SpmvAlgorithm(enum.Enum):
    """Analog of SPMVAlgorithm (KokkosSparse_spmv_handle.hpp:32-48)."""

    AUTO = "auto"
    ELL = "ell"            # bucketed padded rows (replaces MERGE_PATH)
    SEGSUM = "segsum"      # per-nnz segmented reduction (replaces NATIVE)
    DENSE = "dense"        # densify + MXU
    BSR = "bsr"            # block CSR via batched MXU contraction
    DIA = "dia"            # diagonal-offset shifted streaming (struct/banded,
                           # the analog of spmv_struct: _spmv_struct_impl.hpp:92-97)
    PALLAS = "pallas"      # hand-written Pallas kernel path
    ONEHOT = "onehot"      # tiled one-hot MXU kernel (unstructured, gather-free)
    DS = "ds"              # double-single f64 (two-f32 planes; DIA or
                           # gather-table by pattern) — the x64-free f64
                           # fast path (reference default scalar = double)
    RCM = "rcm"            # RCM-reorder route: kernel on P·A·Pᵀ (window-
                           # local gathers), explicit x/y permutes — the
                           # structure-exploiting reorder the reference's
                           # heuristics model (KokkosSparse_spmv_impl.hpp:
                           # 221-377); fastest when vectors stay in
                           # permuted space across a solver iteration


# ----------------------------------------------------------------------
# ELL (bucketed) plan
# ----------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllBucket:
    """One padded-width bucket: dense (rows, width) col ids + values."""

    cols: Any    # (rows, width) int32, pads -> 0
    vals: Any    # (rows, width) scalar, pads -> 0
    rows: Any    # (rows,) int32 original row ids (gather target order)

    def tree_flatten(self):
        return (self.cols, self.vals, self.rows), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def width(self):
        return self.cols.shape[1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllPlan:
    buckets: tuple          # tuple[EllBucket]
    inv_perm: Any           # (nrows,) int32: y = concat(bucket_ys)[inv_perm]
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.buckets, self.inv_perm), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def _bucket_widths(lengths: np.ndarray, max_buckets: int) -> list:
    """Power-of-2 width ladder covering [1, max_len]; merge tiny buckets."""
    max_len = int(lengths.max(initial=0))
    if max_len == 0:
        return [1]
    widths = []
    w = 1
    while w < max_len:
        w *= 2
        widths.append(w)
    if not widths:
        widths = [1]
    if len(widths) > max_buckets:
        widths = widths[-max_buckets:]
    return widths


def build_ell_plan(A: CsrMatrix, max_buckets: int = 4, row_block: int = 8) -> EllPlan:
    """Host-side symbolic phase: bucket rows by nnz, pad, layout.

    ``row_block`` pads each bucket's row count to a multiple of the VPU
    sublane count so downstream kernels see aligned shapes.
    """
    rm = A.host_row_map()
    ent = A.host_entries()
    vals = A.host_values()
    lengths = rm[1:] - rm[:-1]
    widths = _bucket_widths(lengths, max_buckets)

    # assign each row to the smallest width >= its length (widths[-1] catches all)
    bucket_of = np.searchsorted(widths, np.maximum(lengths, 1))
    bucket_of = np.minimum(bucket_of, len(widths) - 1)

    buckets = []
    perm_parts = []
    vdtype = vals.dtype
    for bi, w in enumerate(widths):
        rows = np.nonzero(bucket_of == bi)[0]
        if rows.size == 0 and len(widths) > 1:
            continue
        nrows_b = max(1, round_up(rows.size, row_block)) if rows.size else row_block
        cols2d = np.zeros((nrows_b, w), dtype=np.int32)
        vals2d = np.zeros((nrows_b, w), dtype=vdtype)
        if rows.size:
            # vectorized ELL fill: slot j of row r reads csr position rm[r]+j
            lens = (rm[rows + 1] - rm[rows]).astype(np.int64)
            if int(lens.max(initial=0)) > w:
                raise AssertionError("bucket width underflow")
            pos = rm[rows][:, None] + np.arange(w)[None, :]
            mask = np.arange(w)[None, :] < lens[:, None]
            pos = np.minimum(pos, len(ent) - 1 if len(ent) else 0)
            cols2d[: rows.size] = np.where(mask, ent[pos], 0)
            vals2d[: rows.size] = np.where(mask, vals[pos], 0)
        rows_padded = np.zeros(nrows_b, dtype=np.int32)
        rows_padded[: rows.size] = rows
        # padded rows point at row 0 but contribute val 0; they are dropped by
        # the inverse permutation below.
        buckets.append(
            EllBucket(jnp.asarray(cols2d), jnp.asarray(vals2d), jnp.asarray(rows_padded))
        )
        perm_parts.append((rows, nrows_b))

    # Build inverse permutation: concat of bucket outputs (padded) -> y rows.
    total = sum(nb for _, nb in perm_parts)
    pos = np.zeros(A.nrows, dtype=np.int32)
    offset = 0
    for rows, nb in perm_parts:
        pos[rows] = offset + np.arange(rows.size, dtype=np.int32)
        offset += nb
    assert offset == total
    return EllPlan(tuple(buckets), jnp.asarray(pos), A.nrows, A.ncols)


def apply_ell(plan: EllPlan, x, acc_dtype=None):
    """A·x (no alpha/beta — fused by the caller) for vector or multivector x."""
    outs = []
    for b in plan.buckets:
        xg = jnp.take(x, b.cols, axis=0)          # (rows, w[, k])
        v = b.vals if x.ndim == 1 else b.vals[..., None]
        outs.append(jnp.sum(v * xg, axis=1))      # (rows[, k])
    stacked = jnp.concatenate(outs, axis=0)
    return jnp.take(stacked, plan.inv_perm, axis=0)


# ----------------------------------------------------------------------
# DIA plan — the stencil/banded fast path
# ----------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaPlan:
    """Per-diagonal coefficient arrays: y[i] = Σ_d diags[d][i] * x[i+off[d]].

    The TPU-native equivalent of the reference's structured-grid SpMV
    (sparse/impl/KokkosSparse_spmv_struct_impl.hpp): every term is a
    contiguous shifted stream — no gather, no scatter, VPU-only.  Offsets are
    static plan metadata so the jit unrolls one fused multiply-add per
    diagonal.
    """

    diags: Any            # (ndiags, nrows) coefficients (0 where absent)
    offsets: tuple        # static python ints
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2])


def detect_dia_offsets(A: CsrMatrix, max_diags: int = 32) -> Optional[np.ndarray]:
    """Host-side: unique (col - row) offsets, or None if too many to be a
    banded/stencil matrix."""
    rm = A.host_row_map()
    ent = A.host_entries()
    rows = np.repeat(np.arange(A.nrows, dtype=np.int64), rm[1:] - rm[:-1])
    offs = np.unique(ent.astype(np.int64) - rows)
    if offs.size > max_diags:
        return None
    return offs


def build_dia_plan(A: CsrMatrix, offsets: Optional[np.ndarray] = None) -> DiaPlan:
    if offsets is None:
        # explicit DIA requests accept wider bands than the AUTO gate (a
        # b-block banded BSR expands to (2b-1) scalar diagonals per block
        # diagonal — the BSR->DIA route needs ~75-128)
        offsets = detect_dia_offsets(A, max_diags=256)
        if offsets is None:
            raise ValueError("build_dia_plan: matrix is not banded enough; use ELL")
    rm = A.host_row_map()
    ent = A.host_entries().astype(np.int64)
    vals = A.host_values_full() if hasattr(A, "host_values_full") \
        else A.host_values()
    rows = np.repeat(np.arange(A.nrows, dtype=np.int64), rm[1:] - rm[:-1])
    d = ent - rows
    offsets = np.asarray(offsets, dtype=np.int64)
    diags = np.zeros((len(offsets), A.nrows), dtype=vals.dtype)
    idx = np.searchsorted(offsets, d)  # offsets sorted & complete by construction
    diags[idx, rows] = vals  # duplicate (row,col) pairs are not supported (sorted CSR has none)
    plan = DiaPlan(jnp.asarray(diags), tuple(int(o) for o in offsets), A.nrows, A.ncols)
    # full-precision host copy: the jnp array truncates f64 -> f32 when x64
    # is off, but the double-single plan (DiaDsPlan) needs the real f64
    plan.diags_host = diags
    return plan


def _shift_read(x, off: int, n: int):
    """z[i] = x[i+off] for i in [0,n), zero outside — static pad+slice."""
    if off == 0:
        return x[:n] if x.shape[0] != n else x
    if off > 0:
        chunk = x[off: off + n]
        pad = n - chunk.shape[0]
        return jnp.pad(chunk, (0, pad)) if pad > 0 else chunk
    chunk = x[: max(0, n + off)]
    return jnp.pad(chunk, (-off, n - chunk.shape[0] + off))


def apply_dia(plan: DiaPlan, x):
    n = plan.nrows
    if x.ndim == 1:
        acc = jnp.zeros((n,), jnp.promote_types(x.dtype, plan.diags.dtype))
        for i, off in enumerate(plan.offsets):
            acc = acc + plan.diags[i] * _shift_read(x, off, n)
        return acc
    acc = jnp.zeros((n, x.shape[1]), jnp.promote_types(x.dtype, plan.diags.dtype))
    for i, off in enumerate(plan.offsets):
        acc = acc + plan.diags[i][:, None] * _shift_read_mv(x, off, n)
    return acc


def _shift_read_mv(x, off: int, n: int):
    if off == 0:
        return x[:n]
    if off > 0:
        chunk = x[off: off + n]
        pad = n - chunk.shape[0]
        return jnp.pad(chunk, ((0, pad), (0, 0))) if pad > 0 else chunk
    chunk = x[: max(0, n + off)]
    return jnp.pad(chunk, ((-off, n - chunk.shape[0] + off), (0, 0)))


# ----------------------------------------------------------------------
# SEGSUM plan
# ----------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SegsumPlan:
    rows: Any  # (nnz,) per-entry row index, sorted ascending
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.rows,), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])


def build_segsum_plan(A: CsrMatrix) -> SegsumPlan:
    rm = A.host_row_map()
    lengths = rm[1:] - rm[:-1]
    rows = np.repeat(np.arange(A.nrows, dtype=np.int32), lengths)
    return SegsumPlan(jnp.asarray(rows), A.nrows, A.ncols)


def apply_segsum(plan: SegsumPlan, A: CsrMatrix, x):
    prod = A.values * jnp.take(x, A.entries, axis=0) if x.ndim == 1 else (
        A.values[:, None] * jnp.take(x, A.entries, axis=0)
    )
    return jax.ops.segment_sum(
        prod, plan.rows, num_segments=plan.nrows, indices_are_sorted=True
    )


# ----------------------------------------------------------------------
# BSR via batched MXU contraction
# ----------------------------------------------------------------------

def build_bsr_rows(A: BsrMatrix):
    rm = A.host_row_map()
    lengths = rm[1:] - rm[:-1]
    rows = np.repeat(np.arange(A.n_block_rows, dtype=np.int32), lengths)
    return jnp.asarray(rows)


def apply_bsr(A: BsrMatrix, block_rows, x):
    """y = A·x for BSR: gather x blocks, batched (b×b)·(b) contraction,
    segment-sum over block rows."""
    b = A.block_size
    if x.ndim == 1:
        xb = x.reshape(A.n_block_cols, b)
        xg = jnp.take(xb, A.entries, axis=0)                     # (nnzb, b)
        prod = jnp.einsum("nij,nj->ni", A.values, xg,
                          preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))
        yb = jax.ops.segment_sum(prod, block_rows,
                                 num_segments=A.n_block_rows, indices_are_sorted=True)
        return yb.reshape(-1).astype(x.dtype)
    k = x.shape[1]
    xb = x.reshape(A.n_block_cols, b, k)
    xg = jnp.take(xb, A.entries, axis=0)                          # (nnzb, b, k)
    prod = jnp.einsum("nij,njk->nik", A.values, xg,
                      preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))
    yb = jax.ops.segment_sum(prod, block_rows,
                             num_segments=A.n_block_rows, indices_are_sorted=True)
    return yb.reshape(A.nrows, k).astype(x.dtype)


# ----------------------------------------------------------------------
# Dense fallback
# ----------------------------------------------------------------------

def apply_dense(dense, x):
    return jnp.dot(dense, x, preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
                   precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
