"""Fused level-scheduled triangular solve — one Pallas kernel for the WHOLE
solve (the TP1CHAIN idea of sptrsv_handle.hpp:42-51 taken to its limit).

The XLA level-set path (sptrsv.py) costs ~6.5 us of op overhead PER LEVEL —
a 300^2 Laplacian lower factor has 599 levels, so the solve is launch-bound
(~3.9 ms).  Here the entire dependency chain executes inside one kernel:

* rows are permuted into level order and every level is padded to a multiple
  of 128 rows, so a 128-row sublane of the (SR, 128) solution scratch never
  spans two levels;
* the grid walks 1024-row steps; inside a step the 8 sublanes are processed
  SEQUENTIALLY, each solving x_s = (b_s - sum_w vals_w * x[cols_w]) * invd_s
  and writing x_s back to the VMEM scratch — so dependencies between levels
  inside the same step (the common case for banded factors) resolve in
  registers, not through HBM;
* the off-diagonal gathers use the one-hot machinery of spmv_pallas: each
  (sublane, slot) has a host-planned 4096-entry scratch window (scalar
  prefetch), gathered by a (128,128) one-hot lane-route matmul (exact bf16
  3-plane x-decomposition) + per-vreg sublane dynamic_gather;
* x stays resident in VMEM for the whole solve — only b, the plan arrays and
  the result move through HBM.

Natural-order b / x are converted with dst-lane one-hot permutation applies
(~pad-free selection SpMV) instead of jnp.take (~120 M elem/s on v5e).

Gates: f32, TPU, n_pad <= ~2M rows (VMEM scratch), max slots per sublane
W <= 16.  Everything else falls back to the XLA level-set path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmv_pallas import _bf16_planes3, _pk_gather, _sublane_gather

__all__ = ["build_fused_sptrsv_plan", "fused_sptrsv_solve", "FusedSptrsvPlan"]

_WMAX = 16          # max slots per sublane before falling back
_WIN = 4096         # gather window (32 sublanes x 128 lanes)
_MAX_NPAD = 2 * 1024 * 1024   # 8 MB f32 VMEM scratch cap
_LB = 16            # levels per grid step in the wide kernel


class FusedSptrsvPlan:
    """Host symbolic+numeric product for the fused kernel (the handle-cached
    analog of the reference's level_sched arrays).

    Two layouts: `wide` pads every level to a full 1024-row grid step so the
    8 sublanes of a step solve IN PARALLEL (sources are strictly in earlier
    steps; gathers ride a T=1 gather-table: per-vreg sublane dynamic_gather
    + one lane gather).  The deep layout (`wide=False`) pads levels to 128
    rows and walks sublanes sequentially — denser, used when 1024·nlev
    exceeds the VMEM scratch cap (narrow/deep DAGs).

    Permutations ride on `jax.lax.sort` with precomputed keys — measured 3x
    faster than a one-hot selection SpMV and 4.6x faster than jnp.take at
    this shape, because level order has no tile locality for either."""

    def __init__(self, cols, vals, invd, wb, sort_key_b, sort_key_x,
                 n, n_pad, W, slot_src, slot_row, wide=False, gt=None,
                 LB=1, pb=None, px=None, n_in=None, n_out=None,
                 pk=None, wcnt=None):
        self.pk = pk                # packed gt*128+lo (S,W,8,128) or None
        self.wcnt = wcnt            # (S,) real slot count per level unit
        self.cols = cols            # deep: (S,8,W,128); wide: lo (S,W,8,128)
        self.vals = vals            # same layout as cols, f32
        self.invd = invd            # (S,8,128) f32 (0 on pad rows)
        self.wb = wb                # deep: (S,8,W); wide: (S,W) window base
        self.gt = gt                # wide only: (S,W,8,128) window src row
        self.wide = wide
        self.LB = LB                # wide only: levels per grid step
        self.pb = pb                # routed b->padded permute plan (or None)
        self.px = px                # routed padded->natural permute plan
        self.sort_key_b = sort_key_b  # (n_pad,) keys: concat(b, 0s) -> padded
        self.sort_key_x = sort_key_x  # (n_pad,) keys: padded -> natural x
        self.n = n
        self.n_in = n if n_in is None else n_in    # external b length
        self.n_out = n if n_out is None else n_out  # external x length
        self.n_pad = n_pad
        self.W = W
        self.slot_src = slot_src    # flat nnz index feeding each slot lane
        self.slot_row = slot_row    # (pos-of-diag per row) for refresh
        self.num_steps = n_pad // 1024

    def refresh_values(self, rm, ent, vals_host, lower: bool):
        """Values-only numeric refresh on the cached symbolic structure."""
        v = np.zeros(self.vals.shape, np.float32).reshape(-1)
        mask = self.slot_src >= 0
        v[mask] = vals_host[self.slot_src[mask]]
        self.vals = jnp.asarray(v.reshape(self.vals.shape))
        inv = np.zeros(self.invd.shape, np.float32).reshape(-1)
        dmask = self.slot_row >= 0
        inv[dmask] = 1.0 / vals_host[self.slot_row[dmask]]
        self.invd = jnp.asarray(inv.reshape(self.invd.shape))


def _greedy_slot_assign(gidx, sidx, lane, sl, srow, srcp, wmax):
    """First-fit slot assignment for the wide kernel when the fast
    rank+replica packing overflows _WMAX.  The true constraint set is a
    bipartite edge coloring whose optimum is the max degree (~max row nnz):
    per (g,w,s) each target lane holds one entry; per (g,w,s,src-lane) one
    source row (the T=1 cell); per (g,w) all sources fit one 32-sublane
    window.  Entries are placed in (g, srcp) order so windows fill
    near-monotonically.  Returns the slot array or None on overflow."""
    order = np.lexsort((srcp, gidx))
    slot = np.empty(len(gidx), np.int64)
    cur_g = -1
    lane_used = src_map = wlo = whi = None
    for e in order:
        g = gidx[e]
        if g != cur_g:
            lane_used, src_map, wlo, whi = {}, {}, {}, {}
            cur_g = g
        s = sidx[e]
        l = int(lane[e])
        sli = int(sl[e])
        sr = int(srow[e])
        for w in range(wmax):
            lu = lane_used.get((w, s), 0)
            if (lu >> l) & 1:
                continue
            m = src_map.get((w, s, sli))
            if m is not None and m != sr:
                continue
            lo = wlo.get(w, sr)
            hi = whi.get(w, sr)
            if max(hi, sr) - min(lo, sr) >= 32:
                continue
            lane_used[(w, s)] = lu | (1 << l)
            src_map[(w, s, sli)] = sr
            wlo[w] = min(lo, sr)
            whi[w] = max(hi, sr)
            slot[e] = w
            break
        else:
            return None
    return slot


def _build_wide(rm, ent, vals, n, levels, lower: bool,
                ext_in=None, ext_out=None, wmax=_WMAX):
    """One level per 1024-row grid step: the 8 sublanes of a step are
    independent (sources live strictly in earlier steps), so the whole
    (8,128) block solves in one batched iteration — the sequential unit is
    the LEVEL, not the sublane.  ~0.3us/level vs ~0.9us for the deep
    layout's per-sublane chain (v5e).  Returns None when a level exceeds
    1024 rows, the step count would blow the scratch cap, or the slot
    table exceeds _WMAX."""
    nlev = int(levels.max()) if n else 0
    if nlev < 4:
        return None  # <4 steps: the 32-row window would overrun the scratch
    LB = max(1, min(_LB, nlev))
    S = -(-nlev // LB) * LB          # level count padded to the step block
    if S * 1024 > _MAX_NPAD:
        return None
    sizes = np.bincount(levels, minlength=nlev + 1)[1:]
    if sizes.max(initial=0) > 1024:
        return None
    n_pad = S * 1024
    SR = n_pad // 128
    # padded position: level l (1-based) occupies rows [(l-1)*1024, l*1024)
    order = np.argsort(levels, kind="stable")
    within = np.arange(n, dtype=np.int64) - np.concatenate(
        ([0], np.cumsum(sizes)))[levels[order] - 1]
    pos = np.empty(n, np.int64)
    pos[order] = (levels[order].astype(np.int64) - 1) * 1024 + within

    rows = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])
    off = ent < rows if lower else ent > rows
    diag_sel = ent == rows
    slot_row = np.full(n_pad, -1, np.int64)
    dr = rows[diag_sel]
    if len(dr) != n:
        return None
    slot_row[pos[dr]] = np.nonzero(diag_sel)[0]

    src_nnz = np.nonzero(off)[0]
    dstp = pos[rows[off]]
    srcp = pos[ent[off]]
    o = np.lexsort((srcp, dstp))
    src_nnz, dstp, srcp = src_nnz[o], dstp[o], srcp[o]
    first = np.concatenate(([True], dstp[1:] != dstp[:-1]))
    rstart = np.nonzero(first)[0]
    rid = np.cumsum(first) - 1
    rank = (np.arange(len(dstp), dtype=np.int64) - rstart[rid]
            if len(dstp) else np.empty(0, np.int64))
    W_nat = int(rank.max()) + 1 if len(rank) else 1
    if W_nat > wmax:
        return None
    gidx = dstp // 1024
    sidx = (dstp // 128) % 8
    lane = dstp % 128
    sl = srcp % 128                    # source lane (base-invariant)
    srow = srcp // 128                 # global source sublane
    # T=1 cell constraint: a (step, sublane, slot, src_lane) gather-table
    # cell holds ONE source row.  j = rank of the distinct source row within
    # its (g, s, rank, sl) group; conflicting rows go to replica slots.
    ko = np.lexsort((srow, sl, rank, sidx, gidx))
    key = (((gidx[ko] * 8 + sidx[ko]) * W_nat + rank[ko]) * 128 + sl[ko])
    newg = np.concatenate(([True], key[1:] != key[:-1]))
    news = newg | np.concatenate(([True], srow[ko][1:] != srow[ko][:-1]))
    jj = np.zeros(len(ko), np.int64)
    if len(ko):
        cs = np.cumsum(news) - 1
        gstart = np.zeros(len(ko), np.int64)
        gs = np.nonzero(newg)[0]
        gstart[gs] = cs[gs]
        np.maximum.accumulate(gstart, out=gstart)
        jj_sorted = cs - gstart
        jj[ko] = jj_sorted
    slot = rank + W_nat * jj
    W1 = int(slot.max()) + 1 if len(slot) else 1
    # window split: per (g, slot) the source span must fit a 32-sublane
    # window; farther entries bucket into replica slots of stride W1
    if len(slot) and W1 <= wmax:
        fs = gidx * W1 + slot
        ordfs = np.argsort(fs, kind="stable")
        fs_s = fs[ordfs]
        gfirst = np.concatenate(([True], fs_s[1:] != fs_s[:-1]))
        gmin = np.minimum.reduceat(srcp[ordfs], np.nonzero(gfirst)[0])
        gmap = np.cumsum(gfirst) - 1
        gmin_per = np.empty(len(slot), np.int64)
        gmin_per[ordfs] = gmin[gmap]
        bucket = (srcp - gmin_per) // (_WIN - 128)
        slot = slot + W1 * bucket
    W = int(slot.max()) + 1 if len(slot) else 1
    if W > wmax and len(slot):
        slot = _greedy_slot_assign(gidx, sidx, lane, sl, srow, srcp, wmax)
        if slot is None:
            return None
        W = int(slot.max()) + 1
    if W > wmax:
        return None
    gt_a = np.zeros((S, W, 8, 128), np.int32)
    lo_a = np.zeros((S, W, 8, 128), np.int32)
    vals_a = np.zeros((S, W, 8, 128), np.float32)
    wb_a = np.zeros((S, W), np.int64)
    slot_src = np.full((S, W, 8, 128), -1, np.int64)
    if len(slot):
        # window base per (g, w): min source sublane, clamped in-range
        fsw = gidx * W + slot
        wmin = np.full(S * W, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(wmin, fsw, srcp)
        wmin[wmin == np.iinfo(np.int64).max] = 0
        wb = np.minimum(wmin // 128, max(SR - 32, 0))
        wb_a.reshape(-1)[:] = wb
        hi = srow - wb[fsw]
        assert (hi >= 0).all() and (hi < 32).all()
        gt_a[gidx, slot, sidx, sl] = hi.astype(np.int32)
        lo_a[gidx, slot, sidx, lane] = sl.astype(np.int32)
        vals_a[gidx, slot, sidx, lane] = vals[src_nnz].astype(np.float32)
        slot_src[gidx, slot, sidx, lane] = src_nnz
    invd_a = np.zeros(n_pad, np.float32)
    have = slot_row >= 0
    invd_a[have] = 1.0 / vals[slot_row[have]].astype(np.float32)

    key_b, key_x, pb, px = _perm_plans(pos, n, n_pad, ext_in, ext_out)

    return FusedSptrsvPlan(
        cols=jnp.asarray(lo_a), vals=jnp.asarray(vals_a),
        invd=jnp.asarray(invd_a.reshape(S, 8, 128)),
        wb=jnp.asarray(wb_a.astype(np.int32)),
        gt=jnp.asarray(gt_a),
        sort_key_b=jnp.asarray(key_b.astype(np.int32)),
        sort_key_x=jnp.asarray(key_x.astype(np.int32)),
        n=n, n_pad=n_pad, W=W, wide=True, LB=LB, pb=pb, px=px,
        slot_src=slot_src.reshape(-1), slot_row=slot_row,
        n_in=None if ext_in is None else len(ext_in),
        n_out=None if ext_out is None else len(ext_out))


def _perm_plans(pos, n, n_pad, ext_in=None, ext_out=None):
    """Sort keys (fallback) + routed static-permute plans for b->padded and
    padded->natural.  The two runtime lax.sort permutations dominated the
    whole fused solve (measured: kernel 67us vs 2.1ms end-to-end at
    n_pad=622k) — the Benes router (common.permute) replaces them with
    3 pad-free row-gather passes each.

    ext_in: optional (n_in,) node ids — external b slot e feeds row
    ext_in[e] (rows not listed get zero).  ext_out: optional (n_out,) node
    ids — external x slot j reads row ext_out[j].  Both default to identity
    over all n rows; the supernodal reduction (sptrsv_supernodal) uses them
    to feed only z-rows and read only x-rows of its expanded DAG."""
    from ..common.permute import build_permute_plan

    if ext_in is None:
        ext_in = np.arange(n, dtype=np.int64)
    if ext_out is None:
        ext_out = np.arange(n, dtype=np.int64)
    n_in, n_out = len(ext_in), len(ext_out)
    key_b = np.empty(n_pad, np.int64)
    key_b[:n_in] = pos[ext_in]
    used_b = np.zeros(n_pad, bool)
    used_b[pos[ext_in]] = True
    key_b[n_in:] = np.nonzero(~used_b)[0]
    key_x = np.full(n_pad, -1, np.int64)
    key_x[pos[ext_out]] = np.arange(n_out, dtype=np.int64)
    rest = key_x < 0
    key_x[rest] = np.arange(n_out, n_pad, dtype=np.int64)
    pb = px = None
    if n_pad >= 32768:
        srcb = np.empty(n_pad, np.int64)
        srcb[key_b] = np.arange(n_pad)
        srcx = np.empty(n_pad, np.int64)
        srcx[key_x] = np.arange(n_pad)
        pb = build_permute_plan(srcb, _force=True)
        px = build_permute_plan(srcx, _force=True)
    return key_b, key_x, pb, px


def build_fused_dag_plan(rm, ent, vals, n, levels, ext_in, ext_out):
    """Wide fused plan over an arbitrary unit-diagonal lower DAG system with
    external b/x maps (the supernodal reduction's entry point) — wide layout
    only; returns None outside its gates.  DAG plans use the packed kernel:
    one gt*128+lo table instead of two (-33% stream bytes) and a per-unit
    slot count that predicates away padding slots (relay-DAG units vary
    2..W in real slots; uniform W wasted ~55%% of the compute)."""
    p = _build_wide(rm, ent, vals, n, levels, True,
                    ext_in=ext_in, ext_out=ext_out, wmax=64)
    if p is not None and p.wide:
        gt = np.asarray(p.gt)
        lo = np.asarray(p.cols)
        p.pk = jnp.asarray((gt * 128 + lo).astype(np.int32))
        # per-unit real slot count: a slot is live if any val is nonzero OR
        # any table cell set; derive from the stored vals/gt tables
        live = (np.asarray(p.vals) != 0) | (gt != 0) | (lo != 0)
        wcnt = live.any(axis=(2, 3)).astype(np.int32)       # (S, W)
        cnt = np.zeros(p.num_steps, np.int32)
        nz = np.nonzero(wcnt)
        if len(nz[0]):
            np.maximum.at(cnt, nz[0], (nz[1] + 1).astype(np.int32))
        p.wcnt = jnp.asarray(cnt)
    return p


def build_fused_sptrsv_plan(rm, ent, vals, n, levels, lower: bool):
    """levels: 1-based level id per row (from sptrsv._compute_levels).
    Returns None when the matrix is outside the kernel's gates."""
    wide = _build_wide(rm, ent, vals, n, levels, lower)
    if wide is not None:
        return wide

    nlev = int(levels.max()) if n else 0
    sizes = np.bincount(levels, minlength=nlev + 1)[1:]
    padded = ((sizes + 127) // 128) * 128
    starts = np.zeros(nlev + 1, np.int64)
    np.cumsum(padded, out=starts[1:])
    n_pad = int(-(-max(starts[-1], 4096) // 1024) * 1024)
    if n_pad > _MAX_NPAD:
        return None
    # pos[r] = padded level-order position
    order = np.argsort(levels, kind="stable")
    within = np.arange(n, dtype=np.int64) - np.concatenate(
        ([0], np.cumsum(sizes)))[levels[order] - 1]
    pos = np.empty(n, np.int64)
    pos[order] = starts[levels[order] - 1] + within

    rows = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])
    off = ent < rows if lower else ent > rows
    diag_sel = ent == rows
    # diag flat positions per row
    slot_row = np.full(n_pad, -1, np.int64)
    dr = rows[diag_sel]
    if len(dr) != n:
        return None  # missing diagonal somewhere; let the XLA path report
    slot_row[pos[dr]] = np.nonzero(diag_sel)[0]

    src_nnz = np.nonzero(off)[0]
    dstp = pos[rows[off]]
    srcp = pos[ent[off]]
    # rank of each entry within its row, sorted by source position (keeps
    # every (sublane, slot) group's window span minimal)
    o = np.lexsort((srcp, dstp))
    src_nnz, dstp, srcp = src_nnz[o], dstp[o], srcp[o]
    first = np.concatenate(([True], dstp[1:] != dstp[:-1]))
    rstart = np.nonzero(first)[0]
    rid = np.cumsum(first) - 1
    rank = np.arange(len(dstp), dtype=np.int64) - rstart[rid]

    s_idx = dstp // 128
    lane = dstp % 128
    # split (sublane, rank) groups whose source span exceeds the window:
    # entries are window-assigned greedily within each (sublane, rank) group
    # (sorted by srcp); an entry farther than _WIN-128 from the group's
    # current base opens a new slot appended after the natural ranks.
    key = s_idx * (len(dstp) + 1) + rank
    ko = np.lexsort((srcp, key))
    key_s, src_s = key[ko], srcp[ko]
    gfirst = np.concatenate(([True], key_s[1:] != key_s[:-1]))
    gid = np.cumsum(gfirst) - 1
    ngrp = int(gid[-1]) + 1 if len(gid) else 0
    gmin = np.full(ngrp, np.iinfo(np.int64).max, np.int64)
    if ngrp:  # groups are contiguous in ko order: reduceat beats ufunc.at
        gmin = np.minimum.reduceat(src_s, np.nonzero(gfirst)[0])
    base_sl = (gmin[gid] // 128) if len(gid) else np.empty(0, np.int64)
    overflow = (src_s - base_sl * 128) >= _WIN if len(gid) else np.empty(0, bool)
    extra = np.zeros(len(key_s), np.int64)
    if overflow.any():
        # per group, give overflowing entries consecutive extra slot ids by
        # their window bucket (rare path; loop over affected groups)
        for g in np.unique(gid[overflow]):
            m = gid == g
            sp = src_s[m]
            b0 = sp.min() // 128
            bucket = (sp - b0 * 128) // (_WIN - 128)
            extra[m] = bucket
    W_nat = int(rank.max()) + 1 if len(rank) else 1
    slot = np.empty(len(dstp), np.int64)
    slot[ko] = key_s % (len(dstp) + 1) + extra * W_nat
    W = int(slot.max()) + 1 if len(slot) else 1
    if W > _WMAX:
        return None

    S = n_pad // 1024
    SR = n_pad // 128
    cols_a = np.zeros((SR, W, 128), np.int32)
    vals_a = np.zeros((SR, W, 128), np.float32)
    wb_a = np.zeros((SR, W), np.int64)
    slot_src = np.full((SR, W, 128), -1, np.int64)
    if len(dstp):
        # window base per (sublane, slot): min source sublane, clamped
        flat_sw = s_idx * W + slot
        wmin = np.full(SR * W, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(wmin, flat_sw, srcp)
        wmin[wmin == np.iinfo(np.int64).max] = 0
        wb = np.minimum(wmin // 128, max(SR - 32, 0))
        wb_a.reshape(-1)[:] = wb
        lc = srcp - wb[flat_sw] * 128
        assert (lc >= 0).all() and (lc < _WIN).all()
        cols_a[s_idx, slot, lane] = lc.astype(np.int32)
        vals_a[s_idx, slot, lane] = vals[src_nnz].astype(np.float32)
        slot_src[s_idx, slot, lane] = src_nnz
    invd_a = np.zeros(n_pad, np.float32)
    have = slot_row >= 0
    invd_a[have] = 1.0 / vals[slot_row[have]].astype(np.float32)

    key_b, key_x, pb, px = _perm_plans(pos, n, n_pad)

    return FusedSptrsvPlan(
        cols=jnp.asarray(cols_a.reshape(S, 8, W, 128)),
        vals=jnp.asarray(vals_a.reshape(S, 8, W, 128)),
        invd=jnp.asarray(invd_a.reshape(S, 8, 128)),
        wb=jnp.asarray(wb_a.reshape(S, 8, W).astype(np.int32)),
        sort_key_b=jnp.asarray(key_b.astype(np.int32)),
        sort_key_x=jnp.asarray(key_x.astype(np.int32)),
        n=n, n_pad=n_pad, W=W, pb=pb, px=px,
        slot_src=slot_src.reshape(-1), slot_row=slot_row)


@functools.partial(jax.jit, static_argnames=("S", "SR", "W", "LB",
                                             "interpret"))
def _fused_call_wide_pk(wb, wcnt, pk, vals, invd, b2, *, S, SR, W, LB,
                        interpret):
    """Packed/predicated wide kernel (DAG plans): ONE gt*128+lo stream per
    slot (the _pk_gather trick: gt rides the source-lane position, lo the
    target-lane position of the same (8,128) word) and a per-unit slot
    count that branches away the uniform-W padding slots — on the lap100
    supernodal DAG the real per-unit slot counts sum to 1619 vs 224x17
    streamed."""
    SB = S // LB

    def kernel(wb_ref, wcnt_ref, pk_ref, vals_ref, invd_ref, b_ref, out_ref,
               x_scr):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            x_scr[:, :] = jnp.zeros_like(x_scr)

        for j in range(LB):
            acc = jnp.zeros((8, 128), jnp.float32)
            for w in range(W):
                base = wb_ref[g * LB + j, w]
                xwin = x_scr[pl.ds(base, 32), :]
                xg = _pk_gather(xwin, pk_ref[0, j, w], 32)
                acc = acc + vals_ref[0, j, w] * xg
            xs = (b_ref[pl.ds(j * 8, 8), :] - acc) * invd_ref[0, j]
            x_scr[pl.ds((g * LB + j) * 8, 8), :] = xs
            out_ref[pl.ds(j * 8, 8), :] = xs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(SB,),
        in_specs=[
            pl.BlockSpec((1, LB, W, 8, 128), lambda g, wb, wc: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB, W, 8, 128), lambda g, wb, wc: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB, 8, 128), lambda g, wb, wc: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB * 8, 128), lambda g, wb, wc: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB * 8, 128), lambda g, wb, wc: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SR, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        name="tpukk_sptrsv_fused_wide_pk",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SR, 128), jnp.float32),
        interpret=interpret,
    )(wb, wcnt, pk.reshape(SB, LB, W, 8, 128),
      vals.reshape(SB, LB, W, 8, 128), invd.reshape(SB, LB, 8, 128), b2)


@functools.partial(jax.jit, static_argnames=("S", "SR", "W", "LB",
                                             "interpret"))
def _fused_call_wide(wb, gt, lo, vals, invd, b2, *, S, SR, W, LB, interpret):
    """One level per 1024-row block; all 8 sublanes of a level solve in one
    batched iteration (sources live strictly in earlier levels).  Per slot:
    T=1 gather-table fetch — per-vreg sublane dynamic_gather over the
    32-row window (select by gt//8) + one lane gather by the per-target
    source lane.

    LB levels share one grid step: the solve's loop-carried VMEM scratch
    dependency serializes grid steps (measured ~3.7us/step flat, deep AND
    wide — Mosaic cannot pipeline dependent steps), so the per-step cost is
    amortized over LB levels whose chain runs in-register/VMEM inside the
    body."""
    SB = S // LB

    def kernel(wb_ref, gt_ref, lo_ref, vals_ref, invd_ref, b_ref, out_ref,
               x_scr):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            x_scr[:, :] = jnp.zeros_like(x_scr)

        for j in range(LB):
            acc = jnp.zeros((8, 128), jnp.float32)
            for w in range(W):
                base = wb_ref[g * LB + j, w]
                xwin = x_scr[pl.ds(base, 32), :]
                gtw = gt_ref[0, j, w]              # (8,128) window src row
                t = jnp.zeros((8, 128), jnp.float32)
                for blk in range(4):
                    gsel = jnp.take_along_axis(
                        xwin[blk * 8:(blk + 1) * 8, :],
                        jnp.clip(gtw - blk * 8, 0, 7), axis=0)
                    t = jnp.where((gtw // 8) == blk, gsel, t)
                xg = jnp.take_along_axis(t, lo_ref[0, j, w], axis=1)
                acc = acc + vals_ref[0, j, w] * xg
            xs = (b_ref[pl.ds(j * 8, 8), :] - acc) * invd_ref[0, j]
            x_scr[pl.ds((g * LB + j) * 8, 8), :] = xs
            out_ref[pl.ds(j * 8, 8), :] = xs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(SB,),
        in_specs=[
            pl.BlockSpec((1, LB, W, 8, 128), lambda g, wb: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB, W, 8, 128), lambda g, wb: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB, W, 8, 128), lambda g, wb: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB, 8, 128), lambda g, wb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB * 8, 128), lambda g, wb: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB * 8, 128), lambda g, wb: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SR, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        name="tpukk_sptrsv_fused_wide",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SR, 128), jnp.float32),
        interpret=interpret,
    )(wb, gt.reshape(SB, LB, W, 8, 128), lo.reshape(SB, LB, W, 8, 128),
      vals.reshape(SB, LB, W, 8, 128), invd.reshape(SB, LB, 8, 128), b2)


@functools.partial(jax.jit, static_argnames=("S", "SR", "W", "interpret"))
def _fused_call(wb, cols, vals, invd, b2, *, S, SR, W, interpret):
    def kernel(wb_ref, cols_ref, vals_ref, invd_ref, b_ref, out_ref, x_scr):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            x_scr[:, :] = jnp.zeros_like(x_scr)

        rows_out = []
        for s in range(8):
            acc = jnp.zeros((1, 128), jnp.float32)
            for w in range(W):
                base = wb_ref[g, s, w]
                xwin = x_scr[pl.ds(base, 32), :]
                lc = cols_ref[0, s, w, :].reshape(1, 128)
                # pure-VPU (row, lane) gather from the (32,128) window:
                # lane-axis dynamic_gather per 8-row vreg + sublane gather
                # + select (the v5 finding that retired the one-hot
                # lane-route matmuls — no bf16 planes, no MXU round-trip)
                lo8 = jnp.broadcast_to(lc % 128, (8, 128))
                hi = lc // 128                             # (1,128) in [0,32)
                hi8 = jnp.broadcast_to(hi, (8, 128))
                xg = jnp.zeros((1, 128), jnp.float32)
                for blk in range(4):
                    t = jnp.take_along_axis(
                        xwin[blk * 8:(blk + 1) * 8, :], lo8, axis=1)
                    gsel = jnp.take_along_axis(
                        t, jnp.clip(hi8 - blk * 8, 0, 7), axis=0)[0:1]
                    xg = jnp.where((hi // 8) == blk, gsel, xg)
                acc = acc + vals_ref[0, s, w, :].reshape(1, 128) * xg
            xs = (b_ref[s:s + 1, :] - acc) * invd_ref[0, s, :].reshape(1, 128)
            x_scr[pl.ds(g * 8 + s, 1), :] = xs
            rows_out.append(xs)
        out_ref[:, :] = jnp.concatenate(rows_out, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 8, W, 128), lambda g, wb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W, 128), lambda g, wb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, wb: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, wb: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, wb: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SR, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        name="tpukk_sptrsv_fused",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SR, 128), jnp.float32),
        interpret=interpret,
    )(wb, cols, vals, invd, b2)


def fused_sptrsv_solve(plan: FusedSptrsvPlan, b, interpret: bool = False):
    """x with tri(A) x = b via the fused kernel; b natural order."""
    bfull = jnp.concatenate(
        [b.astype(jnp.float32),
         jnp.zeros(plan.n_pad - plan.n_in, jnp.float32)])
    if plan.pb is not None:
        from ..common.permute import static_permute

        bp = static_permute(plan.pb, bfull, interpret=interpret)
    else:
        _, bp = jax.lax.sort((plan.sort_key_b, bfull), num_keys=1)
    b2 = bp.reshape(plan.n_pad // 128, 128)
    if plan.wide and plan.pk is not None:
        x2 = _fused_call_wide_pk(plan.wb, plan.wcnt, plan.pk, plan.vals,
                                 plan.invd, b2, S=plan.num_steps,
                                 SR=plan.n_pad // 128, W=plan.W, LB=plan.LB,
                                 interpret=interpret)
    elif plan.wide:
        x2 = _fused_call_wide(plan.wb, plan.gt, plan.cols, plan.vals,
                              plan.invd, b2, S=plan.num_steps,
                              SR=plan.n_pad // 128, W=plan.W, LB=plan.LB,
                              interpret=interpret)
    else:
        x2 = _fused_call(plan.wb, plan.cols, plan.vals, plan.invd, b2,
                         S=plan.num_steps, SR=plan.n_pad // 128, W=plan.W,
                         interpret=interpret)
    if plan.px is not None:
        from ..common.permute import static_permute

        x = static_permute(plan.px, x2.reshape(plan.n_pad),
                           interpret=interpret)
    else:
        _, x = jax.lax.sort((plan.sort_key_x, x2.reshape(plan.n_pad)),
                            num_keys=1)
    return x[: plan.n_out].astype(b.dtype)
