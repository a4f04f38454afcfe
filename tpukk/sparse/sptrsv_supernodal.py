"""Supernodal sparse triangular solve — TPU-native analog of the reference's
SUPERNODAL_* SpTRSV algorithms (sparse/src/KokkosSparse_sptrsv_supernode.hpp:87-140,
sptrsv_handle.hpp:42-51 SUPERNODAL_NAIVE/ETREE/DAG/SPMV).

The reference imports a supernode partition from SuperLU/CHOLMOD and runs
per-supernode dense trsm/gemv on team scratch.  The TPU design instead:

* detects supernodes directly from the triangular CSR pattern (host symbolic):
  columns j and j+1 merge when struct(L[:,j+1]) == struct(L[:,j]) \\ {j+1},
  tested in O(nnz) with two independent XOR pattern hashes + counts (no
  per-column set compares), with a size cap so diagonal blocks stay
  MXU-shaped;
* level-schedules the supernode quotient DAG (same Kahn wavefront as the
  point path, sparse/impl/KokkosSparse_sptrsv_symbolic_impl.hpp's level_sched);
* executes each level as ONE batch of dense ops: a batched
  `lax.linalg.triangular_solve` over padded (m,m) diagonal blocks plus a
  batched dense panel matvec, with gather / scatter-add of the update —
  no per-supernode dispatch, no atomics.  Sparse launches become a handful
  of MXU-resident batched dense ops, which is exactly what supernodal
  factors (dense diagonal blocks + shared row structure) are for.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check

__all__ = ["build_supernodal_plan", "supernodal_solve", "SupernodalPlan",
           "FusedSupernodalPlan"]


def _detect_supernodes(rows, cols, n, max_size=64):
    """Supernode start flags from strictly-lower triplets (rows > cols).

    Columns j, j+1 share a supernode iff the strictly-below-diagonal row
    pattern of column j+1 equals column j's minus {j+1}.  Multiset equality is
    tested with XOR hashes of per-row random keys (two independent 63-bit
    draws; removal = XOR with the key) + pattern counts.  Returns
    sn_of_col (n,) int64.
    """
    rng = np.random.default_rng(0x5EED5)
    z1 = rng.integers(1, 2**62, n, dtype=np.int64)
    z2 = rng.integers(1, 2**62, n, dtype=np.int64)
    cnt = np.bincount(cols, minlength=n).astype(np.int64)
    h1 = np.zeros(n, np.int64)
    h2 = np.zeros(n, np.int64)
    if len(cols):
        order = np.argsort(cols, kind="stable")
        cs, rs = cols[order], rows[order]
        starts = np.nonzero(np.r_[True, cs[1:] != cs[:-1]])[0]
        segcols = cs[starts]
        h1[segcols] = np.bitwise_xor.reduceat(z1[rs], starts)
        h2[segcols] = np.bitwise_xor.reduceat(z2[rs], starts)
    # first_sub[j] = (j+1) in pattern(col j)
    first_sub = np.zeros(n, bool)
    sub = rows == cols + 1
    first_sub[cols[sub]] = True
    j = np.arange(n - 1)
    in_s = first_sub[j]
    ok = (cnt[j + 1] == cnt[j] - in_s.astype(np.int64)) \
        & (h1[j + 1] == (h1[j] ^ np.where(in_s, z1[j + 1], 0))) \
        & (h2[j + 1] == (h2[j] ^ np.where(in_s, z2[j + 1], 0)))
    new_sn = np.r_[True, ~ok]
    # size cap: split runs longer than max_size (vectorized within-run index)
    run_id = np.cumsum(new_sn) - 1
    run_start = np.zeros(run_id[-1] + 1 if n else 0, np.int64)
    run_start[run_id[new_sn]] = np.nonzero(new_sn)[0]
    within = np.arange(n) - run_start[run_id]
    new_sn |= (within % max_size == 0)
    return np.cumsum(new_sn) - 1


def _split_partition(sn_of_col, max_size):
    """Re-number an imported monotone partition, splitting runs > max_size
    (dense blocks must stay MXU-shaped)."""
    n = len(sn_of_col)
    if n == 0:
        return sn_of_col
    new_start = np.concatenate(([True], sn_of_col[1:] != sn_of_col[:-1]))
    run_id = np.cumsum(new_start) - 1
    run_first = np.nonzero(new_start)[0]
    within = np.arange(n) - run_first[run_id]
    return np.cumsum(new_start | (within % max_size == 0)) - 1


def _quotient_levels(sn_r, sn_c, nsn):
    """Kahn wavefront levels over the supernode quotient DAG (edges
    sn_c -> sn_r, sn_c < sn_r).  Returns level (nsn,) 0-based."""
    keep = sn_r != sn_c
    er, ec = sn_r[keep], sn_c[keep]
    if len(er):
        u = np.unique(er * np.int64(nsn) + ec)
        er, ec = u // nsn, u % nsn
    indeg = np.bincount(er, minlength=nsn)
    order = np.argsort(ec, kind="stable")
    out_r = er[order]
    out_ptr = np.zeros(nsn + 1, np.int64)
    np.cumsum(np.bincount(ec, minlength=nsn), out=out_ptr[1:])
    level = np.zeros(nsn, np.int64)
    frontier = np.nonzero(indeg == 0)[0]
    lv = 0
    while frontier.size:
        level[frontier] = lv
        starts, ends = out_ptr[frontier], out_ptr[frontier + 1]
        lens = ends - starts
        total = int(lens.sum())
        if total:
            base = np.repeat(starts, lens)
            within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            targets = out_r[base + within]
            indeg = indeg - np.bincount(targets, minlength=nsn)
            cand = np.unique(targets)
            frontier = cand[indeg[cand] == 0]
        else:
            frontier = np.empty(0, np.int64)
        lv += 1
    return level


@dataclasses.dataclass
class _SnLevel:
    D: Any      # (nsn, M, M) dense diag blocks, identity-padded
    P: Any      # (nsn, R, M) dense panels, zero-padded
    bidx: Any   # (nsn, M) global row ids of the block (pads -> n dump slot)
    pidx: Any   # (nsn, R) global row ids of panel updates (pads -> n)


@dataclasses.dataclass
class SupernodalPlan:
    levels: List[_SnLevel]
    n: int
    lower: bool          # original orientation (upper solved via reversal)
    reversed_: bool
    num_supernodes: int
    max_block: int
    dtype: Any


@dataclasses.dataclass
class FusedSupernodalPlan:
    """Whole-solve supernodal plan: the solve reduced to a unit-lower point
    DAG system run through the wide fused level kernel (sptrsv_pallas).

    Reduction (the SUPERNODAL_SPMV idea of the reference,
    sparse/impl/KokkosSparse_sptrsv_solve_impl.hpp — invert the diagonal
    blocks so every level becomes a matvec): with L = D + P (D block
    diagonal, P the panels), z := D x satisfies the unit-lower system
    (I + P·Dinv) z = b whose point-level count equals the SUPERNODE level
    count, and x = Dinv z.  Both the z recursion and the final Dinv apply
    are expressed as rows of one expanded DAG (z-rows, x-rows, plus
    partial-sum aux rows that split any row with more than Wc entries so
    the wide kernel's slot gate holds) and solved in ONE Pallas dispatch.
    """
    plan: Any               # FusedSptrsvPlan over the expanded DAG
    n: int
    reversed_: bool
    num_supernodes: int
    num_levels_sn: int      # supernode quotient levels (the model's floor)
    num_rows_dag: int
    max_block: int
    dtype: Any

    @property
    def levels(self):       # len(plan.levels) compatibility for benches
        return [None] * self.num_levels_sn


def _split_heavy_rows(con, ch, av, chlev, chpos, next_id, Wc):
    """Partial-sum aux expansion: while any consumer has more than Wc
    entries, its oldest entries (by child level, then position) are grouped
    into chunks of Wc; each chunk becomes an aux row carrying the chunk's
    coefficients (v_aux = -sum a_e v_child) and the consumer references it
    with coefficient -1.  Entries at the consumer's critical level
    (parent_level - 1) stay direct when possible so the dependency depth
    does not inflate.  Returns the updated entry arrays + per-aux levels."""
    con = con.copy(); ch = ch.copy(); av = av.copy()
    chlev = chlev.copy(); chpos = chpos.copy()
    for _ in range(8):
        cnt = np.bincount(con, minlength=next_id)
        heavy = cnt > Wc
        if not heavy.any():
            break
        m = heavy[con]
        idx = np.nonzero(m)[0]
        o = idx[np.lexsort((chpos[idx], chlev[idx], con[idx]))]
        cs, ls = con[o], chlev[o]
        first = np.r_[True, cs[1:] != cs[:-1]]
        rid = np.cumsum(first) - 1
        rstart = np.nonzero(first)[0]
        w = np.arange(len(o)) - rstart[rid]
        # parent critical level = max child level per consumer (sorted: last)
        rend = np.r_[rstart[1:], len(o)]
        pmax = ls[rend[rid] - 1]
        crit = ls == pmax
        ncrit = np.bincount(rid, weights=crit)[rid]
        # chunk everything below the critical level; if the critical set
        # alone exceeds Wc, chunk it too (depth inflation unavoidable)
        chunkable = ~crit | (ncrit > Wc - 1)
        ci = np.nonzero(chunkable)[0]
        if not len(ci):
            break
        wch = np.arange(len(ci)) - np.searchsorted(ci, rstart[rid[ci]])
        chunk_key = rid[ci] * (len(o) + 1) + wch // Wc
        newc = np.r_[True, chunk_key[1:] != chunk_key[:-1]]
        chunk_id = np.cumsum(newc) - 1
        nchunks = int(chunk_id[-1]) + 1
        aux_ids = next_id + np.arange(nchunks)
        sel = o[ci]
        # move entries to their aux rows
        con[sel] = aux_ids[chunk_id]
        # aux meta: level = max child level in chunk + 1, pos = min pos
        aux_lev = np.zeros(nchunks, np.int64)
        np.maximum.at(aux_lev, chunk_id, chlev[sel])
        aux_lev += 1
        aux_pos = np.full(nchunks, np.iinfo(np.int64).max)
        np.minimum.at(aux_pos, chunk_id, chpos[sel])
        # consumer references: (parent, aux, -1)
        par = cs[ci][newc]
        con = np.concatenate([con, par])
        ch = np.concatenate([ch, aux_ids])
        av = np.concatenate([av, np.full(nchunks, -1.0)])
        chlev = np.concatenate([chlev, aux_lev])
        chpos = np.concatenate([chpos, aux_pos])
        next_id += nchunks
    return con, ch, av, chlev, chpos, next_id


_RELAY_HOP = 3   # max level distance before a value rides a relay ladder


def _insert_relays(con, ch, av, klev, N):
    """Relay ladders: the wide kernel's gather window spans 4 level-units,
    so any edge longer than _RELAY_HOP levels is re-pointed at a chain of
    identity rows (one per _RELAY_HOP levels) that carries the value
    forward.  Every reference becomes window-local, which collapses the
    slot count W from the window-region-stacking regime (~30-50 measured
    on lap100's LU factor) back to the max-degree bound (~Wc)."""
    d = klev[con] - klev[ch]
    far = d > _RELAY_HOP
    if not far.any():
        return con, ch, av, klev, N
    kstar = (d - 1) // _RELAY_HOP            # relay index each far edge rides
    vmax = np.zeros(N, np.int64)
    np.maximum.at(vmax, ch[far], kstar[far])
    vids = np.nonzero(vmax)[0]               # values needing ladders
    Kv = vmax[vids]
    base = np.zeros(len(vids), np.int64)
    np.cumsum(Kv[:-1], out=base[1:])
    base += N
    base_of = np.full(N, -1, np.int64)
    base_of[vids] = base
    total = int(Kv.sum())
    # relay rows: r_{v,k} (k = 1..Kv) with single child (prev rung) and
    # coefficient -1 (unit diagonal makes the row copy its child's value)
    rk = np.concatenate([np.arange(1, k + 1) for k in Kv]) if total else \
        np.empty(0, np.int64)
    rv = np.repeat(vids, Kv)
    rid = np.repeat(base, Kv) + rk - 1
    prev = np.where(rk == 1, rv, rid - 1)
    con2 = np.concatenate([con, rid])
    ch2 = np.concatenate([ch, prev])
    av2 = np.concatenate([av, np.full(total, -1.0)])
    klev2 = np.concatenate([klev, klev[rv] + rk * _RELAY_HOP])
    # re-point far edges at the deepest rung still below the consumer
    ch2[: len(ch)][far] = base_of[ch[far]] + kstar[far] - 1
    return con2, ch2, av2, klev2, N + total


def build_supernodal_fused_plan(rm, ent, vals, n, lower=True, max_size=32,
                                sn_of_col=None, Wc=8):
    """Build the expanded-DAG fused supernodal plan (see
    FusedSupernodalPlan).  Returns None outside the wide kernel's gates —
    callers fall back to the batched-XLA SupernodalPlan."""
    if n == 0 or np.dtype(np.asarray(vals).dtype) != np.float32:
        return None
    rm = np.asarray(rm, np.int64)
    ent = np.asarray(ent, np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rm))
    cols = ent.copy()
    if not lower:
        rows, cols = n - 1 - rows, n - 1 - cols
    tri = cols <= rows
    rows, cols = rows[tri], cols[tri]
    v = np.asarray(vals)[tri].astype(np.float64)

    strict = cols < rows
    if sn_of_col is not None:
        sn = _split_partition(np.asarray(sn_of_col, np.int64), max_size)
    else:
        sn = _detect_supernodes(rows[strict], cols[strict], n, max_size)
    nsn = int(sn[-1]) + 1
    sn_start = np.zeros(nsn + 1, np.int64)
    np.cumsum(np.bincount(sn, minlength=nsn), out=sn_start[1:])
    size = np.diff(sn_start)
    M = int(size.max(initial=1))

    diag_present = np.zeros(n, bool)
    diag_present[rows[rows == cols]] = True
    if not diag_present.all():
        return None

    esn = sn[cols]
    in_diag = rows < sn_start[esn + 1]
    # batched diagonal-block inverses (f64 host; identity padding keeps the
    # inverse of the real block in the top-left corner)
    D = np.zeros((nsn, M, M))
    D[:, np.arange(M), np.arange(M)] = 1.0
    dl = in_diag
    D[esn[dl], rows[dl] - sn_start[esn[dl]], cols[dl] - sn_start[esn[dl]]] \
        = v[dl]
    try:
        Dinv = np.linalg.inv(D)
    except np.linalg.LinAlgError:
        return None

    # C = P · Dinv, one dense row segment per distinct (panel row, sn)
    pm = ~in_diag
    pr, pc, pv, ps = rows[pm], cols[pm], v[pm], esn[pm]
    if len(pr):
        order = np.lexsort((pc, pr, ps))
        ps_o, pr_o, pc_o, pv_o = ps[order], pr[order], pc[order], pv[order]
        newp = np.r_[True, (ps_o[1:] != ps_o[:-1]) | (pr_o[1:] != pr_o[:-1])]
        starts_p = np.nonzero(newp)[0]
        contrib = pv_o[:, None] * Dinv[ps_o, pc_o - sn_start[ps_o], :]
        Cp = np.add.reduceat(contrib, starts_p, axis=0)
        pair_r, pair_s = pr_o[starts_p], ps_o[starts_p]
        valid = (np.arange(M)[None, :] < size[pair_s][:, None]) & (Cp != 0.0)
        pidx, kidx = np.nonzero(valid)
        e_row = pair_r[pidx]
        e_col = sn_start[pair_s[pidx]] + kidx
        e_val = Cp[pidx, kidx]
    else:
        e_row = e_col = np.empty(0, np.int64)
        e_val = np.empty(0, np.float64)

    # x-rows: x_j = sum_k Dinv[sn(j)][local(j), k] z_(block col k)
    jl = np.arange(n, dtype=np.int64) - sn_start[sn]
    Xv = Dinv[sn, jl, :]                                     # (n, M)
    xvalid = (np.arange(M)[None, :] < size[sn][:, None]) & (Xv != 0.0)
    xj, xk = np.nonzero(xvalid)
    x_child = sn_start[sn[xj]] + xk
    x_val = Xv[xj, xk]

    # supernode quotient levels give z-node levels for chunk ordering
    lev_sn = _quotient_levels(sn[rows], sn[cols], nsn)
    zlev = lev_sn[sn]                                        # (n,)

    # assemble (consumer, child, coefficient) with provisional ids:
    # z_j -> j, x_j -> n + j, aux appended from 2n
    con = np.concatenate([e_row, n + xj])
    ch = np.concatenate([e_col, x_child])
    av = np.concatenate([e_val, -x_val])
    chlev = zlev[ch]
    chpos = ch.copy()
    con, ch, av, chlev, chpos, N = _split_heavy_rows(
        con, ch, av, chlev, chpos, 2 * n, Wc)

    # exact Kahn levels over the expanded DAG (0-based), then split any
    # level beyond 1024 rows into independent pseudo-level blocks
    klev = _quotient_levels(con, ch, N)
    con, ch, av, klev, N = _insert_relays(con, ch, av, klev, N)
    lev_cnt = np.bincount(klev, minlength=int(klev.max()) + 1)
    nblk = -(-lev_cnt // 1024)
    base = np.zeros(len(nblk) + 1, np.int64)
    np.cumsum(nblk, out=base[1:])
    order_nodes = np.argsort(klev, kind="stable")
    lev_off = np.zeros(len(nblk) + 1, np.int64)
    np.cumsum(lev_cnt, out=lev_off[1:])
    within = np.arange(N) - lev_off[klev[order_nodes]]
    blk = np.empty(N, np.int64)
    blk[order_nodes] = base[klev[order_nodes]] + within // 1024
    # topo relabel: new id sorted by (block level, provisional id)
    new_of = np.empty(N, np.int64)
    perm = np.lexsort((np.arange(N), blk))
    new_of[perm] = np.arange(N)

    # CSR of the expanded system (unit diagonal everywhere)
    r_all = np.concatenate([new_of[con], np.arange(N)])
    c_all = np.concatenate([new_of[ch], np.arange(N)])
    v_all = np.concatenate([av, np.ones(N)])
    o2 = np.lexsort((c_all, r_all))
    r_all, c_all, v_all = r_all[o2], c_all[o2], v_all[o2]
    rm2 = np.zeros(N + 1, np.int64)
    np.cumsum(np.bincount(r_all, minlength=N), out=rm2[1:])
    levels2 = np.empty(N, np.int64)
    levels2[new_of] = blk + 1                                # 1-based

    from .sptrsv_pallas import build_fused_dag_plan

    fplan = build_fused_dag_plan(
        rm2, c_all, v_all.astype(np.float32), N, levels2,
        ext_in=new_of[:n], ext_out=new_of[n:2 * n])
    if fplan is None:
        return None
    return FusedSupernodalPlan(
        plan=fplan, n=n, reversed_=not lower, num_supernodes=nsn,
        num_levels_sn=int(lev_sn.max()) + 1, num_rows_dag=N,
        max_block=M, dtype=np.float32)


def build_supernodal_plan(rm, ent, vals, n, lower=True, max_size=64,
                          sn_of_col=None, fused="auto"):
    """Host symbolic+numeric: supernode detection, quotient level schedule,
    dense block extraction.  `rm/ent/vals` describe a triangular CSR (diagonal
    entries required).  Upper-triangular inputs are index-reversed into lower
    form (perm i -> n-1-i) so one code path serves both sweeps.

    sn_of_col: optional IMPORTED supernode partition (e.g. from a CHOLMOD
    factor, sptrsv_cholmod.py) — monotone supernode id per column in the
    lower orientation; runs longer than max_size are split.

    fused: "auto" tries the whole-solve fused reduction (FusedSupernodalPlan)
    on TPU and falls back to the batched-XLA per-level plan; True forces the
    fused build (tests drive it in interpret mode on CPU); False skips it."""
    if fused == "auto":
        from .spmv_pallas import supports_pallas

        fused = supports_pallas()
    if fused:
        fp = build_supernodal_fused_plan(
            rm, ent, vals, n, lower=lower,
            max_size=min(max_size, 32), sn_of_col=sn_of_col)
        if fp is not None:
            return fp
    rm = np.asarray(rm, np.int64)
    ent = np.asarray(ent, np.int64)
    vals = np.asarray(vals)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rm))
    cols = ent
    if not lower:
        rows, cols = n - 1 - rows, n - 1 - cols
    tri = cols <= rows
    rows, cols, v = rows[tri], cols[tri], vals[tri]

    strict = cols < rows
    if sn_of_col is not None:
        sn_of_col = _split_partition(np.asarray(sn_of_col, np.int64),
                                     max_size)
    else:
        sn_of_col = _detect_supernodes(rows[strict], cols[strict], n,
                                       max_size)
    nsn = int(sn_of_col[-1]) + 1 if n else 0
    sn_start = np.zeros(nsn + 1, np.int64)
    np.cumsum(np.bincount(sn_of_col, minlength=nsn), out=sn_start[1:])
    sn_size = np.diff(sn_start)

    level = _quotient_levels(sn_of_col[rows], sn_of_col[cols], nsn)
    nlev = int(level.max()) + 1 if nsn else 0

    # per-entry routing
    esn = sn_of_col[cols]
    in_diag = rows < sn_start[esn + 1]

    # diagonal sanity (dense diag blocks still need nonzero true diagonal)
    diag_present = np.zeros(n, bool)
    diag_present[rows[rows == cols]] = True
    check(diag_present.all(), "supernodal sptrsv: missing diagonal entry")

    # panel row ranks: distinct rows per supernode, ordered
    pr, pc, pv_ = rows[~in_diag], cols[~in_diag], v[~in_diag]
    psn = esn[~in_diag]
    order = np.lexsort((pr, psn))
    psn_s, pr_s = psn[order], pr[order]
    newpair = np.r_[True, (psn_s[1:] != psn_s[:-1]) | (pr_s[1:] != pr_s[:-1])] \
        if len(psn_s) else np.empty(0, bool)
    pair_id = np.cumsum(newpair) - 1 if len(psn_s) else psn_s
    # rank of each distinct (sn,row) pair within its sn
    dist_sn = psn_s[newpair] if len(psn_s) else np.empty(0, np.int64)
    dist_row = pr_s[newpair] if len(psn_s) else np.empty(0, np.int64)
    sn_first_pair = np.r_[True, dist_sn[1:] != dist_sn[:-1]] if len(dist_sn) else np.empty(0, bool)
    pair_base = np.zeros(len(dist_sn), np.int64)
    pair_base[sn_first_pair] = np.nonzero(sn_first_pair)[0]
    pair_base = np.maximum.accumulate(pair_base)
    rank_of_pair = np.arange(len(dist_sn)) - pair_base
    panel_cnt = np.bincount(dist_sn, minlength=nsn)

    # per-level padded shapes.  Everything below is sorted-by-level once and
    # sliced per level (O(nnz log nnz) total — no O(nnz · nlev) rescans).
    levels = []
    dtype = vals.dtype
    lev_of_sn = level
    # rank of each supernode within its level
    order_sn = np.argsort(lev_of_sn, kind="stable")
    lev_counts = np.bincount(lev_of_sn, minlength=nlev)
    lev_off = np.zeros(nlev + 1, np.int64)
    np.cumsum(lev_counts, out=lev_off[1:])
    rank_in_lev = np.empty(nsn, np.int64)
    rank_in_lev[order_sn] = np.arange(nsn) - np.repeat(lev_off[:-1], lev_counts)
    # diag entries sorted by level
    d_all = np.nonzero(in_diag)[0]
    d_lv = lev_of_sn[esn[d_all]]
    d_all = d_all[np.argsort(d_lv, kind="stable")]
    d_off = np.searchsorted(np.sort(d_lv), np.arange(nlev + 1))
    # panel entries (sorted-by-sn `order` view) regrouped by level
    pcol_s, pval_s = (pc[order], pv_[order]) if len(psn_s) else (psn_s, psn_s)
    p_lv = lev_of_sn[psn_s] if len(psn_s) else psn_s
    p_ord = np.argsort(p_lv, kind="stable") if len(psn_s) else psn_s
    p_off = np.searchsorted(np.sort(p_lv), np.arange(nlev + 1)) if len(psn_s) \
        else np.zeros(nlev + 1, np.int64)
    # distinct (sn,row) pairs regrouped by level
    q_lv = lev_of_sn[dist_sn] if len(dist_sn) else dist_sn
    q_ord = np.argsort(q_lv, kind="stable") if len(dist_sn) else dist_sn
    q_off = np.searchsorted(np.sort(q_lv), np.arange(nlev + 1)) if len(dist_sn) \
        else np.zeros(nlev + 1, np.int64)
    for lv in range(nlev):
        sns = order_sn[lev_off[lv]:lev_off[lv + 1]]
        M = int(sn_size[sns].max())
        R = max(1, int(panel_cnt[sns].max(initial=0)))
        K = len(sns)
        # --- D blocks ---
        sel = d_all[d_off[lv]:d_off[lv + 1]]
        dr, dc, dv = rows[sel], cols[sel], v[sel]
        dk = rank_in_lev[esn[sel]]
        D = np.zeros((K, M, M), dtype)
        D[:, np.arange(M), np.arange(M)] = 1
        s0 = sn_start[esn[sel]]
        D[dk, dr - s0, dc - s0] = dv
        bidx = sn_start[sns][:, None] + np.arange(M)[None, :]
        bmask = np.arange(M)[None, :] < sn_size[sns][:, None]
        bidx = np.where(bmask, bidx, n).astype(np.int32)
        # off-pattern padded diagonal stays 1 only where the row is padding;
        # rows inside the block always carry their true diagonal (checked).
        # --- panels ---
        P = np.zeros((K, R, M), dtype)
        pidx = np.full((K, R), n, np.int32)
        if len(psn_s):
            e = p_ord[p_off[lv]:p_off[lv + 1]]
            pk = rank_in_lev[psn_s[e]]
            prk = rank_of_pair[pair_id[e]]
            P[pk, prk, pcol_s[e] - sn_start[psn_s[e]]] = pval_s[e]
            q = q_ord[q_off[lv]:q_off[lv + 1]]
            pidx[rank_in_lev[dist_sn[q]], rank_of_pair[q]] = dist_row[q]
        levels.append(_SnLevel(jnp.asarray(D), jnp.asarray(P),
                               jnp.asarray(bidx), jnp.asarray(pidx)))
    return SupernodalPlan(levels, n, lower, not lower, nsn,
                          int(sn_size.max(initial=1)), dtype)


def supernodal_solve(plan, b, interpret: bool = False):
    """x with tri(A)·x = b using the supernodal plan.  Fused plans run the
    whole expanded DAG in one Pallas dispatch; batched-XLA plans run one
    triangular_solve + one panel matvec per level with an n-index dump slot
    so padded lanes never branch."""
    if isinstance(plan, FusedSupernodalPlan):
        from .sptrsv_pallas import fused_sptrsv_solve

        bv = b[::-1] if plan.reversed_ else b
        x = fused_sptrsv_solve(plan.plan, bv, interpret=interpret)
        return x[::-1] if plan.reversed_ else x
    n = plan.n
    bv = b[::-1] if plan.reversed_ else b
    bw = jnp.concatenate([bv, jnp.zeros((1,), bv.dtype)])
    xw = jnp.zeros_like(bw)
    for L in plan.levels:
        bb = jnp.take(bw, L.bidx, axis=0)                     # (K, M)
        X = jax.lax.linalg.triangular_solve(
            L.D.astype(bb.dtype), bb[..., None],
            left_side=True, lower=True)[..., 0]               # (K, M)
        xw = xw.at[L.bidx.reshape(-1)].set(X.reshape(-1), mode="drop")
        upd = jnp.einsum("krm,km->kr", L.P.astype(bb.dtype), X,
                         precision=jax.lax.Precision.HIGHEST)
        bw = bw.at[L.pidx.reshape(-1)].add(-upd.reshape(-1), mode="drop")
    x = xw[:n]
    return x[::-1] if plan.reversed_ else x
