"""SpILUK — ILU(k) incomplete factorization, analog of
sparse/src/KokkosSparse_spiluk.hpp (:42 symbolic, :200 numeric) with the
fill-level symbolic + level scheduling of
sparse/impl/KokkosSparse_spiluk_symbolic_impl.hpp:37-88 and the per-level
numeric of _spiluk_numeric_impl.hpp.

TPU design: symbolic (host) computes the ILU(k) fill pattern by the standard
level-of-fill recurrence AND the entry-dependency DAG depth (C++
`tpukk_iluk_depth`).  Numeric has two routes:

* host row-by-row IKJ factorization (C++ `tpukk_ilu_numeric`) — the exact
  classic algorithm, used by default and whenever the pattern's dependency
  DAG is deep (banded matrices factor sequentially on ANY backend — the
  reference's level schedule degenerates to 1-row levels there too,
  _spiluk_symbolic_impl.hpp level_list);
* **device value-refresh** (`build_iluk_refresh`, `spiluk_refresh`): the
  ILU(k) factors on a FIXED pattern are the unique fixed point of the Chow
  formulas restricted to that pattern, and a synchronous Jacobi sweep makes
  every entry whose dependency depth ≤ s exact after s sweeps.  Running
  depth-many sweeps inside ONE jit therefore reproduces the exact IKJ
  factorization with zero host transfers of A's values — the reference's
  per-level device numeric (_spiluk_numeric_impl.hpp:1-772) translated to
  static TPU dataflow (SURVEY §2.10: level schedules → masked static
  plans).  The *apply* (two sptrsv sweeps) is device-side as well.

Returns L (unit lower w/ diag) and U (upper) as separate CSR matrices.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from ..common import check
from ..containers import CsrMatrix
from ..common.tracing import annotate

__all__ = ["SpilukHandle", "spiluk_symbolic", "spiluk_numeric",
           "build_iluk_refresh", "spiluk_refresh"]


class SpilukHandle:
    """cf. spiluk_handle.hpp (fill level k, nnz bounds, level schedule)."""

    def __init__(self, fill_level: int = 0):
        self.fill_level = int(fill_level)
        self.is_symbolic_called = False
        self.pattern = None      # scipy.csr bool pattern of L+U (with diag)
        self.levels = None
        self.depth = None        # entry-DAG depth (= exact device sweep count)


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
    if native.available():
        handle.depth = native.iluk_depth(pat.indptr, pat.indices, A.nrows)
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


class IlukRefreshPlan:
    """Static device plan for exact ILU(k) value-refresh on a fixed pattern.

    Built once per symbolic pattern (host); `spiluk_refresh(plan, a_values)`
    then factors NEW values entirely on device — no host transfer, one jit.
    Exactness: `depth` synchronous Chow sweeps reproduce the IKJ
    factorization (see module docstring).  The pair schedule reuses
    par_ilut's `_SweepPlan` (same product enumeration, no prune phase)."""

    def __init__(self, handle: SpilukHandle, A: CsrMatrix):
        from .par_ilut import _SweepPlan

        check(handle.is_symbolic_called, "build_iluk_refresh: symbolic first")
        Asp = A.to_scipy().tocsr()
        Asp.sort_indices()
        n = Asp.shape[0]
        pat = handle.pattern.tocsr()
        pat.sort_indices()
        patL = sps.tril(pat, k=-1).tocsr()
        patU = sps.triu(pat, k=0).tocsr()
        sweep = _SweepPlan(patL, patU, Asp)
        check(sweep.nmiss_true == 0,
              "iluk pattern must contain A's pattern")
        self.sweep = sweep
        self.n = n
        if handle.depth is None:
            from .. import native

            d = native.iluk_depth(pat.indptr, pat.indices, n)
            handle.depth = d if d is not None else n
        self.depth = int(handle.depth)
        # pattern-slot -> A-nnz-position maps (for the on-device A restrict);
        # -1 where the slot is fill (A has no entry there) or padding
        akey = (np.repeat(np.arange(n, dtype=np.int64),
                          np.diff(Asp.indptr)) * n
                + Asp.indices.astype(np.int64))

        def amap(rows, cols, padded):
            want = rows.astype(np.int64) * n + cols.astype(np.int64)
            pos = np.searchsorted(akey, want)
            pos = np.minimum(pos, max(0, len(akey) - 1))
            hit = (akey[pos] == want) if len(akey) else np.zeros(len(want), bool)
            out = np.full(padded, -1, np.int32)
            out[:len(want)] = np.where(hit, pos, -1).astype(np.int32)
            return out

        self.mapL = jnp.asarray(amap(sweep.rowL_np, sweep.colL_np, sweep.nnzL))
        self.mapU = jnp.asarray(amap(sweep.rowU_np, sweep.colU_np, sweep.nnzU))
        self._build_level_schedule(sweep)

    def _build_level_schedule(self, s):
        """Level-scheduled refresh (round-5): every pattern entry is computed
        EXACTLY ONCE, at its dependency level, with all inputs already final
        — total pair work is 1x instead of the Jacobi loop's depth x (the
        level_sched idea of KokkosSparse_spiluk_symbolic_impl.hpp:37-88
        applied to the numeric refresh).  Entry levels: 1 + max over the
        entry's product pairs of its factors' levels; an L entry additionally
        exceeds its column's U-diagonal level (the scaling divide)."""
        self.levels = None
        nnzL_p, nnzU_p = s.nnzL, s.nnzU
        a_idx = np.asarray(s.a_idx).astype(np.int64)
        b_idx = np.asarray(s.b_idx).astype(np.int64)
        slot = np.asarray(s.slot).astype(np.int64)
        live = slot < nnzL_p + nnzU_p
        # drop pairs that only feed the trash/miss segments
        a_idx, b_idx, slot = a_idx[live], b_idx[live], slot[live]
        nL_t, nU_t = s.nnzL_true, s.nnzU_true
        diag_pos = np.asarray(s.diag_slot).astype(np.int64)        # (n,)
        colL = np.asarray(s.colL).astype(np.int64)[:nL_t]
        levL = np.ones(nnzL_p, np.int64)
        levU = np.ones(nnzU_p, np.int64)
        is_L = slot < nnzL_p
        tgt_local = np.where(is_L, slot, slot - nnzL_p)
        # fixpoint via presorted grouped max (np.maximum.reduceat beats
        # ufunc.at ~20x on multi-million pair lists)
        srt = np.argsort(slot, kind="stable")
        a_s, b_s, slot_s = a_idx[srt], b_idx[srt], slot[srt]
        gfirst = np.r_[True, slot_s[1:] != slot_s[:-1]] if len(slot_s) \
            else np.empty(0, bool)
        gstart = np.nonzero(gfirst)[0]
        gtgt = slot_s[gstart]
        gL = gtgt < nnzL_p
        for _ in range(80):
            cand = 1 + np.maximum(levL[a_s], levU[b_s])
            gmax = np.maximum.reduceat(cand, gstart) if len(gstart) else cand
            nl, nu = levL.copy(), levU.copy()
            nl[gtgt[gL]] = np.maximum(levL[gtgt[gL]], gmax[gL])
            tu = gtgt[~gL] - nnzL_p
            nu[tu] = np.maximum(levU[tu], gmax[~gL])
            nl[:nL_t] = np.maximum(nl[:nL_t], levU[diag_pos[colL]] + 1)
            if (nl == levL).all() and (nu == levU).all():
                break
            levL, levU = nl, nu
        else:
            return                           # deeper than 80: Jacobi path
        depth = int(max(levL[:nL_t].max(initial=1),
                        levU[:nU_t].max(initial=1)))
        if depth > 64:
            return                           # unrolled loop too deep: Jacobi
        # pads go to level 0 (before every real level, never touched)
        levL[nL_t:] = 0
        levU[nU_t:] = 0
        permL = np.argsort(levL, kind="stable")
        permU = np.argsort(levU, kind="stable")
        invL = np.empty(nnzL_p, np.int64)
        invL[permL] = np.arange(nnzL_p)
        invU = np.empty(nnzU_p, np.int64)
        invU[permU] = np.arange(nnzU_p)
        cL = np.searchsorted(levL[permL], np.arange(depth + 2))
        cU = np.searchsorted(levU[permU], np.arange(depth + 2))
        # pairs sorted by (target level, local slot); per-level local
        # segment ids [0, nL_l + nU_l)
        tL = np.minimum(tgt_local, nnzL_p - 1)
        tU = np.minimum(tgt_local, nnzU_p - 1)
        t_lev = np.where(is_L, levL[tL], levU[tU])
        t_new = np.where(is_L, invL[tL], invU[tU])
        lseg = np.where(is_L, t_new - cL[t_lev],
                        (cL[t_lev + 1] - cL[t_lev]) + t_new - cU[t_lev])
        po = np.lexsort((lseg, t_lev))
        p_off = np.searchsorted(t_lev[po], np.arange(depth + 2))
        ud_idx = invU[diag_pos[colL]]        # per true L entry, permuted uv pos
        ud_perm = np.zeros(nnzL_p, np.int64)
        ud_perm[invL[:nL_t]] = ud_idx
        self.levels = dict(
            depth=depth,
            a_idx=jnp.asarray(invL[a_idx[po]].astype(np.int32)),
            b_idx=jnp.asarray(invU[b_idx[po]].astype(np.int32)),
            lseg=jnp.asarray(lseg[po].astype(np.int32)),
            p_off=tuple(int(x) for x in p_off),
            cL=tuple(int(x) for x in cL),
            cU=tuple(int(x) for x in cU),
            mapLp=jnp.asarray(np.asarray(self.mapL)[permL]),
            mapUp=jnp.asarray(np.asarray(self.mapU)[permU]),
            ud=jnp.asarray(ud_perm.astype(np.int32)),
            keyL=jnp.asarray(permL.astype(np.int32)),  # sort key -> original
            keyU=jnp.asarray(permU.astype(np.int32)),
        )


@annotate("spiluk.build_iluk_refresh")
def build_iluk_refresh(handle: SpilukHandle, A: CsrMatrix) -> IlukRefreshPlan:
    return IlukRefreshPlan(handle, A)


@functools.partial(jax.jit, static_argnames=("nnzL", "nnzU", "nmiss",
                                             "depth"))
def _device_iluk(a_idx, b_idx, slot, mapL, mapU, diag_slot, colL, avals, *,
                 nnzL, nnzU, nmiss, depth):
    nseg = nnzL + nnzU + nmiss + 1
    zero = jnp.zeros((), avals.dtype)
    aL = jnp.where(mapL >= 0, jnp.take(avals, jnp.maximum(mapL, 0)), zero)
    aU = jnp.where(mapU >= 0, jnp.take(avals, jnp.maximum(mapU, 0)), zero)

    def one(_, lu):
        lv, uv = lu
        prod = jnp.take(lv, a_idx) * jnp.take(uv, b_idx)
        s = jax.ops.segment_sum(prod, slot, num_segments=nseg,
                                indices_are_sorted=True)
        udiag = jnp.take(uv, diag_slot)
        udiag = jnp.where(udiag != 0, udiag, 1.0)
        new_l = (aL - s[:nnzL]) / jnp.take(udiag, colL)
        new_u = aU - s[nnzL:nnzL + nnzU]
        return new_l, new_u

    return jax.lax.fori_loop(0, depth, one, (aL, aU))


@functools.partial(jax.jit, static_argnames=("p_off", "cL", "cU"))
def _device_iluk_levels(a_idx, b_idx, lseg, mapLp, mapUp, ud, avals, *,
                        p_off, cL, cU):
    """Level-scheduled exact refresh: one pass over the product pairs total.
    Per level: static pair slice -> gather-product -> local segment_sum ->
    static-slice update of the level's L/U entries (inputs already final)."""
    zero = jnp.zeros((), avals.dtype)
    lv = jnp.where(mapLp >= 0, jnp.take(avals, jnp.maximum(mapLp, 0)), zero)
    uv = jnp.where(mapUp >= 0, jnp.take(avals, jnp.maximum(mapUp, 0)), zero)
    depth = len(p_off) - 2
    for lev in range(1, depth + 1):
        nL = cL[lev + 1] - cL[lev]
        nU = cU[lev + 1] - cU[lev]
        if nL == 0 and nU == 0:
            continue
        s0, s1 = p_off[lev], p_off[lev + 1]
        if s1 > s0:
            prod = jnp.take(lv, a_idx[s0:s1]) * jnp.take(uv, b_idx[s0:s1])
            seg = jax.ops.segment_sum(prod, lseg[s0:s1],
                                      num_segments=nL + nU + 1,
                                      indices_are_sorted=True)
        else:
            seg = jnp.zeros(nL + nU + 1, avals.dtype)
        if nL:
            udiag = jnp.take(uv, jax.lax.dynamic_slice(ud, (cL[lev],), (nL,)))
            udiag = jnp.where(udiag != 0, udiag, 1.0)
            aLs = jax.lax.dynamic_slice(lv, (cL[lev],), (nL,))
            lv = jax.lax.dynamic_update_slice(
                lv, (aLs - seg[:nL]) / udiag, (cL[lev],))
        if nU:
            aUs = jax.lax.dynamic_slice(uv, (cU[lev],), (nU,))
            uv = jax.lax.dynamic_update_slice(
                uv, aUs - seg[nL:nL + nU], (cU[lev],))
    return lv, uv


@annotate("spiluk.spiluk_refresh")
def spiluk_refresh(plan: IlukRefreshPlan, a_values):
    """Exact device re-factorization for new A values on the symbolic
    pattern (role of re-calling the reference numeric on updated values,
    KokkosSparse_spiluk.hpp:200 — the time-stepping refresh use case).
    `a_values` is A's CSR value array (sorted-column order, device or host);
    returns (l_values, u_values) DEVICE arrays in the pattern's strict-lower
    / upper CSR entry order (padded tails are zero)."""
    s = plan.sweep
    L = getattr(plan, "levels", None)
    if L is not None:
        lvp, uvp = _device_iluk_levels(
            L["a_idx"], L["b_idx"], L["lseg"], L["mapLp"], L["mapUp"],
            L["ud"], jnp.asarray(a_values), p_off=L["p_off"], cL=L["cL"],
            cU=L["cU"])
        _, lv = jax.lax.sort((L["keyL"], lvp), num_keys=1)
        _, uv = jax.lax.sort((L["keyU"], uvp), num_keys=1)
        return lv, uv
    lv, uv = _device_iluk(
        s.a_idx, s.b_idx, s.slot, plan.mapL, plan.mapU, s.diag_slot, s.colL,
        jnp.asarray(a_values), nnzL=s.nnzL, nnzU=s.nnzU, nmiss=s.nmiss,
        depth=plan.depth)
    return lv, uv


def refresh_to_csr(plan: IlukRefreshPlan, lv, uv, dtype=None):
    """Assemble (L, U) CsrMatrix from spiluk_refresh output (host sync —
    for tests/interop; the hot path keeps lv/uv on device)."""
    s = plan.sweep
    n = plan.n
    lvals = np.asarray(lv)[:s.nnzL_true]
    uvals = np.asarray(uv)[:s.nnzU_true]
    dt = np.asarray(lvals).dtype if dtype is None else dtype
    L = sps.csr_matrix((lvals, (s.rowL_np, s.colL_np)), shape=(n, n))
    L = (L + sps.identity(n, dtype=dt)).tocsr()
    L.sort_indices()
    U = sps.csr_matrix((uvals, (s.rowU_np, s.colU_np)), shape=(n, n)).tocsr()
    U.sort_indices()
    return (CsrMatrix.from_scipy(L, value_dtype=dt),
            CsrMatrix.from_scipy(U, value_dtype=dt))


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
