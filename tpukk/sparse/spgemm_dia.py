"""Banded (DIA) SpGEMM — structured fast path for C = A·B.

The reference treats structured matrices specially for SpMV
(sparse/impl/KokkosSparse_spmv_struct_impl.hpp) but has no structured SpGEMM;
on TPU the DIA-first design makes one natural: a product of banded matrices
is an OFFSET CONVOLUTION of their diagonals,

    C[r, r+o] = Σ_{(i,j): oa_i + ob_j = o}  Ad[i, r] · Bd[j, r + oa_i]

i.e. kA·kB contiguous shifted multiply-adds of (n,) vectors — no pairs, no
gathers, pure streaming (measured ~150x over the one-hot pair kernel on the
1M-row 2D-Laplacian A·A).

Pattern semantics: C's sparsity is the *clipped band* — entry (r, r+o)
present iff some pair (i,j) with oa_i+ob_j=o is in-range at row r.  When
every stored diagonal of A and B is structurally full this equals the exact
structural product; otherwise it is a superset containing explicit zeros
(e.g. the ±1 diagonals of a 2D Laplacian have interior holes at grid-row
boundaries).  The path is therefore opt-in via SpgemmAlgorithm.DIA, and
AUTO only routes here when all stored diagonals are full (exact case).

Value layout trick: diagonals are row-indexed, so C's per-row values in
column order are rows of CdT = stack(diags).T (n, kC).  Interior rows
[R0, R1) carry the full band — their values are ONE reshape of CdT (no
gather); only the O(bandwidth) boundary rows use a small take.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import CsrMatrix
from .spmv_impl import detect_dia_offsets

__all__ = ["DiaSpgemmPlan", "build_dia_spgemm_plan", "dia_spgemm_numeric",
           "dia_operands_exact"]


def dia_operands_exact(A: CsrMatrix, B: CsrMatrix, max_diags: int = 32) -> bool:
    """True iff both operands are DIA-able AND every stored diagonal is
    structurally full — the case where the clipped-band pattern equals the
    exact structural product (safe for AUTO routing)."""
    for M in (A, B):
        # a matrix with <= max_diags diagonals has nnz <= max_diags*min(n,m);
        # skip the O(nnz log nnz) offset sort when that's impossible
        if M.nnz > max_diags * min(M.nrows, M.ncols):
            return False
        offs = detect_dia_offsets(M, max_diags=max_diags)
        if offs is None:
            return False
        n, m = M.nrows, M.ncols
        ent = M.host_entries()
        rm = M.host_row_map()
        rows = np.repeat(np.arange(n), np.diff(rm))
        d = ent - rows
        counts = {int(o): int(c) for o, c in
                  zip(*np.unique(d, return_counts=True))}
        for o in offs:
            full = min(n, m - o) - max(0, -o)
            if counts.get(int(o), 0) != full:
                return False
    return True


@dataclasses.dataclass
class _DiaRefresh:
    """values -> (k, n) row-indexed diagonal arrays, rebuilt each numeric
    call (the reuse contract: same pattern, new values).  Interior rows with
    a full band refresh by ONE reshape of the CSR values (sorted columns =>
    offset order); only boundary/hole rows use an indexed update."""
    offsets: Tuple[int, ...]
    n: int
    m: int
    R0: int          # rows [R0, R1) have all k offsets -> reshape
    R1: int
    rm0: int         # CSR value range backing the reshape
    rm1: int
    src: np.ndarray  # CSR value positions for the remaining entries
    tgt: np.ndarray  # flat (row*k + offset_idx) targets for them
    tgt_all: np.ndarray  # flat targets for ALL values (expansion-plan path)
    _eplan: Any = None   # lazy one-hot expansion plan (TPU f32)


def _build_refresh(M: CsrMatrix, offsets: np.ndarray) -> _DiaRefresh:
    n, m = M.nrows, M.ncols
    k = len(offsets)
    rm = M.host_row_map().astype(np.int64)
    ent = M.host_entries().astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rm))
    oidx = np.searchsorted(offsets, ent - rows)
    lens = np.diff(rm)
    full = lens == k
    # longest contiguous full-band run (single run in the exact case)
    R0 = R1 = 0
    if full.any():
        f = np.r_[False, full, False]
        starts = np.nonzero(f[1:] & ~f[:-1])[0]
        ends = np.nonzero(~f[1:] & f[:-1])[0]
        best = np.argmax(ends - starts)
        R0, R1 = int(starts[best]), int(ends[best])
    inside = (rows >= R0) & (rows < R1)
    src = np.nonzero(~inside)[0].astype(np.int64)
    tgt = (rows[src] * k + oidx[src]).astype(np.int64)
    tgt_all = (rows * k + oidx).astype(np.int64)
    return _DiaRefresh(tuple(int(o) for o in offsets), n, m, R0, R1,
                       int(rm[R0]), int(rm[R1]), src, tgt, tgt_all)


def _use_mxu_perm(dtype) -> bool:
    return (jnp.result_type(dtype) == jnp.float32
            and jax.devices()[0].platform in ("tpu", "axon"))


def _bf16_planes3(a):
    """Exact 3-term bf16 split via mantissa bit-masking.  The arithmetic
    form (a - bf16(a)) is FOLDED AWAY by XLA under
    --xla_allow_excess_precision=true (set by the TPU runtime), silently
    quantizing results to bf16; integer bitcasts are fold-proof.  Each
    16-bit-truncated piece is exactly representable in bf16."""
    mask = jnp.int32(-65536)  # 0xFFFF0000
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(ai & mask, jnp.float32)
    r1 = a - hi
    r1i = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid = jax.lax.bitcast_convert_type(r1i & mask, jnp.float32)
    lo = r1 - mid
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=32)
def _perm_const_np(k: int, inverse: bool):
    """bf16 one-hot permutation over one period of k·128 elements:
    row-major (row, phase) flat <-> phase-major (phase, 128-row-block).
    Cached as numpy — caching a jnp array would leak tracers when first
    built inside a trace."""
    P = k * 128
    S = np.zeros((P, P), np.float32)
    for i in range(k):
        for r in range(128):
            if inverse:
                S[i * 128 + r, r * k + i] = 1.0
            else:
                S[r * k + i, i * 128 + r] = 1.0
    return S.astype(jnp.bfloat16)


def _perm_const(k: int, inverse: bool):
    return jnp.asarray(_perm_const_np(k, inverse))


def _perm_mm(mat2, S):
    """Exact f32 permutation via 3-plane bf16 one-hot matmul — 4.4x faster
    than an XLA (n,k) transpose, whose 128-lane tile padding amplifies the
    thin-matrix relayout ~18x (measured on v5e)."""
    return sum(jax.lax.dot_general(p, S, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for p in _bf16_planes3(mat2))


def _expansion_plan(r: _DiaRefresh, nnz: int):
    """One-hot SpMV plan for the monotonic zero-insertion values -> (n,k)
    flat: a (n·k × nnz) selection matrix driven through the v3 one-hot
    kernel.  Replaces an XLA scatter (~0.14 G elem/s) with the 1.4 Gnnz/s
    pallas gather for operands whose bands have holes (e.g. stencil
    matrices): built lazily, once per plan."""
    if r._eplan is None:
        from ..containers import CsrMatrix
        from .spmv_pallas import build_onehot_spmv_plan

        k = len(r.offsets)
        counts = np.zeros(r.n * k + 1, np.int64)
        counts[1:][r.tgt_all] = 1
        rm_e = np.cumsum(counts)
        E = CsrMatrix.from_arrays(
            jnp.asarray(rm_e), jnp.asarray(np.arange(nnz, dtype=np.int32)),
            jnp.ones((nnz,), jnp.float32), nrows=r.n * k, ncols=nnz)
        object.__setattr__(r, "_eplan", build_onehot_spmv_plan(E))
    return r._eplan


def _refresh_diags(r: _DiaRefresh, values, eplan=None):
    """Device: k (n,) diagonal arrays from the operand's current values."""
    k = len(r.offsets)
    use_mxu = _use_mxu_perm(values.dtype)
    if eplan is not None:
        from .spmv_pallas import onehot_spmv

        flat = onehot_spmv(eplan, values)
    else:
        flat = jnp.zeros((r.n * k,), values.dtype)
        if r.R1 > r.R0:
            flat = jax.lax.dynamic_update_slice_in_dim(
                flat, values[r.rm0:r.rm1], r.R0 * k, 0)
        if len(r.src):
            flat = flat.at[jnp.asarray(r.tgt)].set(
                jnp.take(values, jnp.asarray(r.src)))
    if use_mxu:
        P = k * 128
        pad = (-flat.shape[0]) % P
        blocks = _perm_mm(jnp.pad(flat, (0, pad)).reshape(-1, P),
                          _perm_const(k, False)).reshape(-1, k, 128)
        return [blocks[:, i, :].reshape(-1)[:r.n] for i in range(k)]
    d = flat.reshape(r.n, k).T
    return [d[i] for i in range(k)]


@dataclasses.dataclass
class DiaSpgemmPlan:
    a_refresh: _DiaRefresh
    b_refresh: _DiaRefresh
    offsets_c: Tuple[int, ...]            # sorted
    groups: Tuple[Tuple[Tuple[int, int], ...], ...]  # per C offset: (i,j) pairs
    row_map: np.ndarray                   # exact clipped-band CSR pattern
    entries: np.ndarray
    R0: int                               # interior rows [R0, R1): full band
    R1: int
    top_idx: np.ndarray                   # flat CdT indices for boundary rows
    bot_idx: np.ndarray
    nrows: int
    ncols: int
    nnz_c: int


def build_dia_spgemm_plan(A: CsrMatrix, B: CsrMatrix,
                          max_diags: int = 32) -> Optional[DiaSpgemmPlan]:
    """Host symbolic phase.  None if either operand is not DIA-able or the
    pair count is too large to unroll."""
    offs_a = detect_dia_offsets(A, max_diags=max_diags)
    offs_b = detect_dia_offsets(B, max_diags=max_diags)
    if offs_a is None or offs_b is None:
        return None
    if len(offs_a) * len(offs_b) > 2048:
        return None
    n, m, p = A.nrows, A.ncols, B.ncols
    oa = np.asarray(offs_a)
    ob = np.asarray(offs_b)
    sums = oa[:, None] + ob[None, :]
    offsets_c = np.unique(sums)
    kC = len(offsets_c)
    groups: List[List[Tuple[int, int]]] = [[] for _ in range(kC)]
    oc_index = {int(o): t for t, o in enumerate(offsets_c)}
    # per-pair valid row interval [lo, hi): r in [0,n), r+oa_i in [0,m),
    # r+o in [0,p)
    los = np.empty((len(oa), len(ob)), np.int64)
    his = np.empty_like(los)
    for i, ai in enumerate(oa):
        for j, bj in enumerate(ob):
            o = int(ai + bj)
            groups[oc_index[o]].append((i, j))
            los[i, j] = max(0, -int(ai), -o)
            his[i, j] = min(n, m - int(ai), p - o)
    # per-offset merged row coverage
    unions = []
    for t, o in enumerate(offsets_c):
        iv = sorted((int(los[i, j]), int(his[i, j])) for (i, j) in groups[t])
        merged = []
        for lo, hi in iv:
            if hi <= lo:
                continue
            if merged and lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        unions.append(merged)
    if any(not u for u in unions):
        return None
    # interior: rows where every offset is covered by a single run
    R0 = max(u[0][0] for u in unions)
    R1 = min(u[-1][1] for u in unions)
    for u in unions:  # a hole inside [R0,R1) would break the reshape trick
        for (lo, hi), (lo2, _hi2) in zip(u, u[1:]):
            if hi > R0 and lo2 < R1:
                R0 = R1 = 0
                break
    if R1 < R0:
        R0 = R1 = 0

    def _boundary(rows: np.ndarray):
        """present[r_local, t] for the given rows."""
        if len(rows) == 0:
            return np.zeros((0, kC), bool)
        pres = np.zeros((len(rows), kC), bool)
        for t in range(kC):
            for lo, hi in unions[t]:
                pres[:, t] |= (rows >= lo) & (rows < hi)
        return pres

    top_rows = np.arange(0, R0)
    bot_rows = np.arange(R1, n)
    ptop = _boundary(top_rows)
    pbot = _boundary(bot_rows)
    # row_map / entries (entries ascend with offset => ascend with column)
    lengths = np.full(n, kC, np.int64)
    lengths[:R0] = ptop.sum(axis=1)
    lengths[R1:] = pbot.sum(axis=1)
    row_map = np.zeros(n + 1, np.int64)
    np.cumsum(lengths, out=row_map[1:])
    nnz_c = int(row_map[-1])
    entries = np.empty(nnz_c, np.int64)
    # interior entries
    if R1 > R0:
        cols_int = (np.arange(R0, R1)[:, None] + offsets_c[None, :]).reshape(-1)
        entries[row_map[R0]:row_map[R1]] = cols_int
    ti = np.nonzero(ptop)
    entries[:row_map[R0]] = top_rows[ti[0]] + offsets_c[ti[1]]
    bi = np.nonzero(pbot)
    entries[row_map[R1]:] = bot_rows[bi[0]] + offsets_c[bi[1]]
    # flat CdT (n, kC) extraction indices for boundary values
    top_idx = (top_rows[ti[0]] * kC + ti[1]).astype(np.int64)
    bot_idx = (bot_rows[bi[0]] * kC + bi[1]).astype(np.int64)
    return DiaSpgemmPlan(_build_refresh(A, oa), _build_refresh(B, ob),
                         tuple(int(o) for o in offsets_c),
                         tuple(tuple(g) for g in groups),
                         row_map, entries, int(R0), int(R1),
                         top_idx, bot_idx, n, p, nnz_c)


def dia_spgemm_numeric(plan: DiaSpgemmPlan, A: CsrMatrix, B: CsrMatrix) -> CsrMatrix:
    """Device numeric phase: refresh operand diagonals from current values
    (reshape + small update), offset-convolution, reshape/small-take value
    extraction — one fused jit dispatch."""
    if getattr(plan, "_jit_numeric", None) is None:
        top = jnp.asarray(plan.top_idx)
        bot = jnp.asarray(plan.bot_idx)
        # hole-y bands: build the one-hot expansion plans eagerly (host)
        if _use_mxu_perm(A.dtype):
            if len(plan.a_refresh.src) > 65536:
                _expansion_plan(plan.a_refresh, A.nnz)
            if len(plan.b_refresh.src) > 65536:
                _expansion_plan(plan.b_refresh, B.nnz)

        @jax.jit
        def _numeric(av, bv, ea, eb):
            return _dia_numeric_vals(
                _refresh_diags(plan.a_refresh, av, ea),
                _refresh_diags(plan.b_refresh, bv, eb), top, bot,
                oa=plan.a_refresh.offsets, n=plan.nrows,
                m=plan.a_refresh.m, offsets_c=plan.offsets_c,
                groups=plan.groups, R0=plan.R0, R1=plan.R1)

        object.__setattr__(plan, "_jit_numeric", _numeric)
    vals = plan._jit_numeric(A.values, B.values,
                             plan.a_refresh._eplan, plan.b_refresh._eplan)
    return CsrMatrix.from_arrays(
        jnp.asarray(plan.row_map), jnp.asarray(plan.entries),
        vals.astype(A.dtype), nrows=plan.nrows, ncols=plan.ncols)


@functools.partial(jax.jit, static_argnames=("oa", "n", "m", "offsets_c",
                                             "groups", "R0", "R1"))
def _dia_numeric_vals(ad, bd, top_idx, bot_idx, *, oa, n, m, offsets_c,
                      groups, R0, R1):
    """ad/bd: tuples of (n,)/(m,) diagonal arrays.  Offset convolution, then
    interleave back to CSR value order (MXU permutation on f32/TPU)."""
    L = max(0, -min(oa))
    R = max(0, n + max(oa) - m)
    bpad = [jnp.pad(d, (L, R)) for d in bd]
    kC = len(offsets_c)
    cdiags = []
    for t, o in enumerate(offsets_c):
        acc = None
        for (i, j) in groups[t]:
            term = ad[i] * jax.lax.dynamic_slice_in_dim(bpad[j], oa[i] + L, n)
            acc = term if acc is None else acc + term
        cdiags.append(acc)
    if _use_mxu_perm(cdiags[0].dtype):
        pad = (-n) % 128
        cd3 = jnp.stack([jnp.pad(d, (0, pad)).reshape(-1, 128)
                         for d in cdiags], axis=1)       # (nb, kC, 128)
        flat = _perm_mm(cd3.reshape(-1, kC * 128),
                        _perm_const(kC, True)).reshape(-1)
    else:
        flat = jnp.stack(cdiags, axis=1).reshape(-1)     # (n*kC,)
    parts = []
    if top_idx.shape[0]:
        parts.append(jnp.take(flat, top_idx))
    if R1 > R0:
        parts.append(flat[R0 * kC:R1 * kC])
    if bot_idx.shape[0]:
        parts.append(jnp.take(flat, bot_idx))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]
