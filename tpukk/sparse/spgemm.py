"""SpGEMM (C = A·B) — analog of sparse/src/KokkosSparse_spgemm_symbolic.hpp:27,
_numeric.hpp:34 and the KokkosSPGEMM orchestrator
(sparse/impl/KokkosSparse_spgemm_impl*.hpp, KKMEM hash-accumulator algorithm).

TPU-first two-phase design (SURVEY.md §7.3):

* **symbolic** (host): determines C's sparsity AND a *pair plan* — for every
  scalar multiply a_ik·b_kj it records (a_idx, b_idx, c_idx) index triples.
  This replaces the reference's per-row hashmap accumulator
  (PortableNumericCHASH, _impl_kkmem.hpp:31-75): the hash insertions become a
  host-sorted static schedule.  Expensive once per sparsity, exactly the
  reuse contract of the reference handle (spgemm_handle.hpp:248-252).
* **numeric** (device): two gathers + one sorted segment-sum — static shapes,
  no atomics, deterministic, MXU-free but bandwidth-optimal:
      C.values = segment_sum(A.values[a_idx] * B.values[b_idx], c_idx).
  Changing A/B values (same pattern) re-runs only this.

Algorithms enum mirrors SPGEMMAlgorithm (spgemm_handle.hpp:44-76): the pair
plan is the KK default; DENSE_ACC is the "KK_SPEED/dense accumulator" analog
for small ncols(B) — a row-blocked dense accumulation entirely on device.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check
from ..common.tracing import annotate
from ..containers import CsrMatrix

__all__ = ["SpgemmAlgorithm", "SpgemmHandle", "spgemm_symbolic", "spgemm_numeric",
           "spgemm", "bspgemm_symbolic", "bspgemm_numeric", "bspgemm"]


class SpgemmAlgorithm(enum.Enum):
    KK = "kk"                  # pair-plan (hash-accumulator analog)
    DENSE_ACC = "dense_acc"    # dense accumulator (KK_SPEED/KK_DENSE analog)
    DEBUG = "debug"            # host scipy (SPGEMM_DEBUG/serial analog)
    DIA = "dia"                # banded offset-convolution (spgemm_dia.py);
    #                            pattern = clipped band (may hold explicit
    #                            zeros when operand diagonals have holes).
    #                            KK AUTO-routes here when exact (full diags).


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PairPlan:
    """Static multiply schedule: one entry per scalar product."""

    a_idx: Any   # (P,) int32 into A.values
    b_idx: Any   # (P,) int32 into B.values
    c_idx: Any   # (P,) int32 into C.values, sorted ascending
    nnz_c: int

    def tree_flatten(self):
        return (self.a_idx, self.b_idx, self.c_idx), (self.nnz_c,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])


class SpgemmHandle:
    """cf. KokkosKernels_Handle::create_spgemm_handle
    (KokkosKernels_Handle.hpp:470) + spgemm_handle.hpp state machine."""

    def __init__(self, algorithm: SpgemmAlgorithm = SpgemmAlgorithm.KK):
        self.algorithm = algorithm
        self.is_symbolic_called = False
        self.row_map_c = None
        self.entries_c = None
        self.pair_plan: Optional[PairPlan] = None
        self.onehot_plan = None  # lazy pallas numeric plan (TPU, f32)
        self.dia_plan = None     # banded offset-convolution plan (spgemm_dia)
        self.nrows_c = self.ncols_c = None
        self.block_size = None  # set by bspgemm_symbolic for BSR operands

    @property
    def nnz_c(self):
        return None if self.entries_c is None else int(len(self.entries_c))


def _symbolic_host(A: CsrMatrix, B: CsrMatrix):
    """Host symbolic: C pattern + pair plan, via sorted-CSR row merges.

    Row-by-row: for row i of A, the products are {(a_ptr, b_ptr): a_ptr in
    A.row i, b_ptr in B.row(A.col[a_ptr])}; their C column is B.col[b_ptr].
    We build all triples vectorized in numpy, then map (i, col) -> c_idx by
    lexicographic sort (the static replacement of the hashmap accumulator).
    """
    from .. import native

    nat = native.spgemm_symbolic(A.host_row_map(), A.host_entries(), A.nrows,
                                 B.ncols, B.host_row_map(), B.host_entries())
    if nat is not None:
        row_map_c, entries_c, a_idx, b_idx, c_idx = nat
        nnz_c = int(row_map_c[-1])
        plan = PairPlan(jnp.asarray(a_idx), jnp.asarray(b_idx),
                        jnp.asarray(c_idx), nnz_c)
        return row_map_c, entries_c, plan

    arm = A.host_row_map().astype(np.int64)
    aent = A.host_entries().astype(np.int64)
    brm = B.host_row_map().astype(np.int64)
    bent = B.host_entries().astype(np.int64)

    # per-A-entry: how many B entries does its row expand to
    b_row_len = brm[1:] - brm[:-1]
    expand = b_row_len[aent]                       # (nnzA,)
    P = int(expand.sum())
    # a_idx repeated per expansion; b_idx = brm[aent[a]] + arange(expand[a])
    a_idx = np.repeat(np.arange(len(aent)), expand)
    b_start = np.repeat(brm[aent], expand)
    within = np.arange(P) - np.repeat(np.cumsum(expand) - expand, expand)
    b_idx = b_start + within
    # output (row, col) per pair
    a_row_len = arm[1:] - arm[:-1]
    row_of_a = np.repeat(np.arange(A.nrows, dtype=np.int64), a_row_len)
    out_row = np.repeat(row_of_a, expand)
    out_col = bent[b_idx]
    # dedup (row, col) -> c_idx
    key = out_row * B.ncols + out_col
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    uniq_mask = np.empty(P, bool)
    uniq_mask[0:1] = True
    np.not_equal(key_sorted[1:], key_sorted[:-1], out=uniq_mask[1:]) if P > 1 else None
    c_of_sorted = np.cumsum(uniq_mask) - 1
    c_idx = np.empty(P, np.int64)
    c_idx[order] = c_of_sorted
    nnz_c = int(uniq_mask.sum()) if P else 0
    uniq_keys = key_sorted[uniq_mask] if P else np.empty(0, np.int64)
    rows_c = (uniq_keys // B.ncols).astype(np.int64)
    cols_c = (uniq_keys % B.ncols).astype(np.int32)
    row_map_c = np.zeros(A.nrows + 1, np.int32)
    np.add.at(row_map_c[1:], rows_c, 1)
    row_map_c = np.cumsum(row_map_c).astype(np.int32)
    # pairs sorted by c_idx for the sorted segment_sum
    psort = np.argsort(c_idx, kind="stable")
    plan = PairPlan(
        jnp.asarray(a_idx[psort].astype(np.int32)),
        jnp.asarray(b_idx[psort].astype(np.int32)),
        jnp.asarray(c_idx[psort].astype(np.int32)),
        nnz_c,
    )
    return row_map_c, cols_c, plan


@annotate("spgemm_symbolic")
def spgemm_symbolic(handle: SpgemmHandle, A: CsrMatrix, B: CsrMatrix):
    """Determine C's structure; caches the pair plan in the handle."""
    check(A.ncols == B.nrows, "spgemm: inner dimension mismatch")
    if handle.algorithm == SpgemmAlgorithm.DEBUG:
        Cs = (A.to_scipy() @ B.to_scipy()).tocsr()
        Cs.sort_indices()
        handle.row_map_c = Cs.indptr.astype(np.int32)
        handle.entries_c = Cs.indices.astype(np.int32)
    else:
        from . import spgemm_dia

        if handle.algorithm == SpgemmAlgorithm.DIA or (
                handle.algorithm == SpgemmAlgorithm.KK
                and spgemm_dia.dia_operands_exact(A, B)):
            plan = spgemm_dia.build_dia_spgemm_plan(A, B)
            check(plan is not None or handle.algorithm != SpgemmAlgorithm.DIA,
                  "spgemm DIA: operands are not banded (DIA-detectable)")
            if plan is not None:
                handle.dia_plan = plan
                handle.row_map_c = plan.row_map.astype(np.int64)
                handle.entries_c = plan.entries
                handle.nrows_c, handle.ncols_c = A.nrows, B.ncols
                handle.is_symbolic_called = True
                return handle.row_map_c
        rm, cols, plan = _symbolic_host(A, B)
        handle.row_map_c = rm
        handle.entries_c = cols
        handle.pair_plan = plan
    handle.nrows_c, handle.ncols_c = A.nrows, B.ncols
    handle.is_symbolic_called = True
    return handle.row_map_c


def _numeric_pairs(plan: PairPlan, a_vals, b_vals):
    prod = jnp.take(a_vals, plan.a_idx) * jnp.take(b_vals, plan.b_idx)
    return jax.ops.segment_sum(prod, plan.c_idx, num_segments=plan.nnz_c,
                               indices_are_sorted=True)


@annotate("spgemm_numeric")
def spgemm_numeric(handle: SpgemmHandle, A: CsrMatrix, B: CsrMatrix) -> CsrMatrix:
    """Numeric phase — device-side for KK (two gathers + sorted segsum)."""
    check(handle.is_symbolic_called, "spgemm_numeric: call spgemm_symbolic first")
    if handle.algorithm == SpgemmAlgorithm.DEBUG:
        Cs = (A.to_scipy() @ B.to_scipy()).tocsr()
        Cs.sort_indices()
        return CsrMatrix.from_scipy(Cs, value_dtype=A.dtype)
    if handle.dia_plan is not None:
        from . import spgemm_dia

        return spgemm_dia.dia_spgemm_numeric(handle.dia_plan, A, B)
    if handle.algorithm == SpgemmAlgorithm.DENSE_ACC:
        vals = _numeric_dense_acc(handle, A, B)
    else:
        vals = None
        if jnp.result_type(A.dtype) == jnp.float32:
            from .spmv_pallas import supports_pallas

            if supports_pallas():
                # one-hot pallas numeric: ~25x over the XLA take+segsum path
                from . import spgemm_pallas

                if handle.onehot_plan is None:
                    # scattered-B patterns pad the (ct,at,bt) chunking badly:
                    # the builder pre-checks pad/step bounds (None) and we
                    # then use the SORT-BASED plan: three local/monotone
                    # selection kernels + one key-sort reorder, pattern-
                    # independent (no 400x cliff; the graceful-degradation
                    # promise of _spgemm_impl_kkmem.hpp's two-level hash).
                    plan = spgemm_pallas.build_onehot_pair_plan(
                        handle.pair_plan, A.nnz, B.nnz)
                    if plan is None:
                        pp = handle.pair_plan
                        plan = spgemm_pallas.SortPairPlan(
                            pp.a_idx, pp.b_idx, pp.c_idx, A.nnz, B.nnz,
                            pp.nnz_c)
                    handle.onehot_plan = plan if plan is not None else False
                if handle.onehot_plan is not False:
                    if isinstance(handle.onehot_plan,
                                  spgemm_pallas.SortPairPlan):
                        vals = spgemm_pallas.sort_pair_numeric(
                            handle.onehot_plan, A.values, B.values)
                    else:
                        vals = spgemm_pallas.onehot_pair_numeric(
                            handle.onehot_plan, A.values, B.values)
        if vals is None:
            vals = _numeric_pairs(handle.pair_plan, A.values, B.values)
    return CsrMatrix.from_arrays(
        jnp.asarray(handle.row_map_c), jnp.asarray(handle.entries_c),
        vals.astype(A.dtype), nrows=handle.nrows_c, ncols=handle.ncols_c)


def _numeric_dense_acc(handle, A: CsrMatrix, B: CsrMatrix):
    """Dense accumulator path (KK_SPEED analog, _impl_speed.hpp): for modest
    ncols(B), accumulate dense rows on device, then gather C entries."""
    n, k, m = A.nrows, A.ncols, B.ncols
    dense_b = jnp.zeros((k, m), A.dtype).at[
        jnp.repeat(jnp.arange(k), jnp.diff(jnp.asarray(B.row_map))),
        B.entries].set(B.values)
    # dense C = A @ dense_b via the ELL plan of A would be ideal; reuse segsum
    rows_a = jnp.repeat(jnp.arange(n), jnp.diff(jnp.asarray(A.row_map)))
    contrib = A.values[:, None] * jnp.take(dense_b, A.entries, axis=0)
    dense_c = jax.ops.segment_sum(contrib, rows_a, num_segments=n,
                                  indices_are_sorted=True)
    rows_c = jnp.repeat(jnp.arange(n), jnp.diff(jnp.asarray(handle.row_map_c)))
    return dense_c[rows_c, jnp.asarray(handle.entries_c)]


@annotate("spgemm")
def spgemm(A: CsrMatrix, B: CsrMatrix,
           algorithm: SpgemmAlgorithm = SpgemmAlgorithm.KK) -> CsrMatrix:
    """No-reuse convenience (cf. KokkosSparse_spgemm.hpp)."""
    h = SpgemmHandle(algorithm)
    spgemm_symbolic(h, A, B)
    return spgemm_numeric(h, A, B)


def spgemm_jacobi(handle: SpgemmHandle, A: CsrMatrix, B: CsrMatrix,
                  omega, dinv) -> CsrMatrix:
    """Jacobi-fused SpGEMM: C = (I - omega·D⁻¹·A)·B — the reference's
    spgemm_jacobi variant (sparse/src/KokkosSparse_spgemm_jacobi.hpp role,
    used to build smoothed-aggregation prolongators).  ``dinv`` is the
    inverse-diagonal vector.  Reuses the handle's A·B pair plan; the B term
    merges through a host-side union (symbolic) + device axpby (numeric)."""
    check(handle.is_symbolic_called, "spgemm_jacobi: call spgemm_symbolic first")
    AB = spgemm_numeric(handle, A, B)
    # scale rows of AB by omega * dinv
    rows = jnp.repeat(jnp.arange(AB.nrows), jnp.diff(jnp.asarray(AB.row_map)),
                      total_repeat_length=AB.nnz)
    scaled = AB.with_values(-(omega * jnp.take(jnp.asarray(dinv), rows)) * AB.values)
    from .spadd import spadd

    return spadd(1.0, B, 1.0, scaled)


# ---------------------------------------------------------------------------
# Block (BSR) SpGEMM — analog of the bspgemm entry points
# (sparse/impl/KokkosSparse_bspgemm_impl*.hpp, the BlockHashmapAccumulator
# path).  The pair plan runs on the BLOCK graph; the numeric phase turns each
# scalar multiply of the CSR case into a (b,b)x(b,b) block product — batched
# dense matmuls, exactly the MXU-shaped work TPUs want.
# ---------------------------------------------------------------------------

class _GraphView:
    """Structure-only CSR view of a BSR block graph for _symbolic_host."""

    def __init__(self, rm, ent, nrows, ncols):
        self._rm, self._ent = rm, ent
        self.nrows, self.ncols = nrows, ncols

    def host_row_map(self):
        return self._rm

    def host_entries(self):
        return self._ent


@annotate("bspgemm_symbolic")
def bspgemm_symbolic(handle: SpgemmHandle, A, B):
    """Block-structure symbolic phase; handle caches the block pair plan."""
    from ..containers import BsrMatrix

    check(isinstance(A, BsrMatrix) and isinstance(B, BsrMatrix),
          "bspgemm: BsrMatrix inputs required")
    check(A.block_size == B.block_size, "bspgemm: equal block sizes required")
    check(A.ncols == B.nrows, "bspgemm: inner dimension mismatch")
    gA = _GraphView(A.host_row_map(), A.host_entries(),
                    A.n_block_rows, A.n_block_cols)
    gB = _GraphView(B.host_row_map(), B.host_entries(),
                    B.n_block_rows, B.n_block_cols)
    rm, cols, plan = _symbolic_host(gA, gB)
    handle.row_map_c = rm
    handle.entries_c = cols
    handle.pair_plan = plan
    handle.nrows_c, handle.ncols_c = A.nrows, B.ncols
    handle.block_size = A.block_size
    handle.is_symbolic_called = True
    return handle.row_map_c


@annotate("bspgemm_numeric")
def bspgemm_numeric(handle: SpgemmHandle, A, B):
    """Numeric: batched (P,b,b) MXU block products + sorted block segsum."""
    from ..containers import BsrMatrix

    check(handle.is_symbolic_called, "bspgemm_numeric: call bspgemm_symbolic first")
    plan = handle.pair_plan
    pa = jnp.take(A.values, plan.a_idx, axis=0)          # (P,b,b)
    pb = jnp.take(B.values, plan.b_idx, axis=0)
    pet = jnp.promote_types(A.dtype, jnp.float32)
    # HIGHEST: TPU matmuls default to bf16 passes; f32 operands must stay f32
    prod = jnp.matmul(pa.astype(pet), pb.astype(pet),
                      precision=jax.lax.Precision.HIGHEST)
    vals = jax.ops.segment_sum(prod, plan.c_idx, num_segments=plan.nnz_c,
                               indices_are_sorted=True).astype(A.dtype)
    return BsrMatrix(jnp.asarray(handle.row_map_c), jnp.asarray(handle.entries_c),
                     vals, handle.nrows_c, handle.ncols_c, handle.block_size)


@annotate("bspgemm")
def bspgemm(A, B):
    """No-reuse convenience: C = A·B for BSR operands."""
    h = SpgemmHandle(SpgemmAlgorithm.KK)
    bspgemm_symbolic(h, A, B)
    return bspgemm_numeric(h, A, B)
