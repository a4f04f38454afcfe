"""Sparse triangular solve — analog of sparse/src/KokkosSparse_sptrsv.hpp
(symbolic :55,119; solve :270,407) with level-set scheduling
(SPTRSVAlgorithm SEQLVLSCHD_*, sptrsv_handle.hpp:42-51; symbolic impl
KokkosSparse_sptrsv_symbolic_impl.hpp, per-level solve _solve_impl.hpp).

TPU design (SURVEY.md §2.10 "dependency-graph parallelism"): symbolic computes
the level of every row host-side and permutes rows into level-blocked ELL
form (columns remapped to permuted positions); solve executes one fused
gather+reduce per level with contiguous static-slice updates — a sequence of
O(#levels) data-parallel steps inside one jit, no scatters, no atomics.
"""
from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check, permute_via_sort
from ..common.tracing import annotate
from ..containers import CsrMatrix
from .sptrsv_supernodal import build_supernodal_plan, supernodal_solve

__all__ = ["SptrsvHandle", "SptrsvAlgorithm", "sptrsv_symbolic", "sptrsv_solve"]


class SptrsvAlgorithm(enum.Enum):
    """cf. SPTRSVAlgorithm, sptrsv_handle.hpp:42-51.  SEQLVLSCHD covers the
    SEQLVLSCHD_RP/TP1/TP1CHAIN family (one fused data-parallel step per level);
    SUPERNODAL covers SUPERNODAL_NAIVE/ETREE/DAG/SPMV (supernode-blocked
    batched dense solves on the MXU — sptrsv_supernodal.py)."""
    SEQLVLSCHD = "lvlsched"
    SUPERNODAL = "supernodal"


@dataclasses.dataclass(frozen=True)
class _LevelBlock:
    """Static slice coordinates into the handle's flat-packed plan arrays.
    All levels ride in three device arrays (one transfer each at symbolic
    time) instead of three per level — 599-level factors were paying ~1800
    small host->device transfers (~24s through a remote-device tunnel)."""
    start: int   # row offset in permuted order
    rows: int    # rows in this level
    w: int       # ELL width
    flat: int    # element offset into cols_cat / vals_cat


class SptrsvHandle:
    """cf. sptrsv_handle.hpp; one handle per (matrix, uplo)."""

    def __init__(self, lower: bool = True,
                 algorithm: SptrsvAlgorithm = SptrsvAlgorithm.SEQLVLSCHD,
                 supernode_max_size: int = 64):
        self.lower = lower
        self.algorithm = algorithm
        self.supernode_max_size = supernode_max_size
        self.is_symbolic_called = False
        self.blocks: List[_LevelBlock] = []
        self.cols_cat = None   # (sum rows_l*w_l,) permuted-space ids
        self.vals_cat = None   # (sum rows_l*w_l,)
        self.invd_cat = None   # (n,) 1/diag in permuted row order
        self.order = None
        self.inv_order = None
        self.num_levels = 0
        self.sn_plan = None
        self.fused_plan = None  # whole-solve pallas kernel (sptrsv_pallas)


def _compute_levels(rm, ent, n, lower: bool) -> np.ndarray:
    """level[r] = 1 + max(level of dependencies) via Kahn wavefronts —
    O(nnz) total (the level_sched of spiluk_symbolic_impl.hpp:37-88)."""
    rows = np.repeat(np.arange(n), rm[1:] - rm[:-1])
    dep_mask = ent < rows if lower else ent > rows
    dep_rows = rows[dep_mask].astype(np.int64)   # edge: dep_cols -> dep_rows
    dep_cols = ent[dep_mask].astype(np.int64)
    indeg = np.bincount(dep_rows, minlength=n)
    # reverse adjacency (dependents grouped by producer column)
    order = np.argsort(dep_cols, kind="stable")
    out_rows = dep_rows[order]
    out_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dep_cols, minlength=n), out=out_ptr[1:])
    levels = np.zeros(n, np.int64)
    frontier = np.nonzero(indeg == 0)[0]
    lv = 1
    while frontier.size:
        levels[frontier] = lv
        # all out-edges of frontier producers
        starts = out_ptr[frontier]
        lens = out_ptr[frontier + 1] - starts
        total = int(lens.sum())
        if total:
            # contiguous ranges concat: base + within-offset
            base = np.repeat(starts, lens)
            within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            targets = out_rows[base + within]
            dec = np.bincount(targets, minlength=n)
            indeg = indeg - dec
            cand = np.unique(targets)
            frontier = cand[indeg[cand] == 0]
        else:
            frontier = np.empty(0, np.int64)
        lv += 1
    return levels


@annotate("sptrsv_symbolic")
def sptrsv_symbolic(handle: SptrsvHandle, A: CsrMatrix):
    check(A.nrows == A.ncols, "sptrsv: square matrix required")
    rm = A.host_row_map()
    ent = A.host_entries()
    vals = A.host_values()
    n = A.nrows
    if handle.algorithm is SptrsvAlgorithm.SUPERNODAL:
        handle.sn_plan = build_supernodal_plan(
            rm, ent, vals, n, lower=handle.lower,
            max_size=handle.supernode_max_size,
            sn_of_col=getattr(handle, "sn_partition", None))
        handle.num_levels = len(handle.sn_plan.levels)
        handle.is_symbolic_called = True
        return
    levels = _compute_levels(rm, ent, n, handle.lower)
    handle.fused_plan = None
    if np.dtype(vals.dtype) == np.float32:
        from .spmv_pallas import supports_pallas

        if supports_pallas():
            from .sptrsv_pallas import build_fused_sptrsv_plan

            handle.fused_plan = build_fused_sptrsv_plan(
                rm, ent, vals, n, levels, handle.lower)
    order = np.argsort(levels, kind="stable").astype(np.int32)
    inv = np.empty_like(order)
    inv[order] = np.arange(n, dtype=np.int32)
    handle.order, handle.inv_order = order, inv
    nlev = int(levels.max())
    handle.num_levels = nlev
    counts = np.bincount(levels, minlength=nlev + 1)[1:]
    offsets = np.zeros(nlev + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    blocks = []
    nnz = len(ent)
    cols_parts, vals_parts, invd_parts = [], [], []
    flat = 0
    for lv in range(nlev):
        rows = order[offsets[lv]:offsets[lv + 1]]
        lens = (rm[rows + 1] - rm[rows]).astype(np.int64)
        w = max(1, int(lens.max(initial=1)))
        # vectorized full-row ELL gather; only the wanted triangle kept
        pos = rm[rows][:, None] + np.arange(w)[None, :]
        valid = np.arange(w)[None, :] < lens[:, None]
        pos = np.minimum(pos, max(nnz - 1, 0))
        cseg = ent[pos]
        vseg = vals[pos]
        is_diag = valid & (cseg == rows[:, None])
        keep = valid & (cseg < rows[:, None] if handle.lower else cseg > rows[:, None])
        diag = np.where(is_diag, vseg, 0).sum(axis=1)
        cols2d = np.where(keep, inv[np.minimum(cseg, len(inv) - 1)], 0).astype(np.int32)
        vals2d = np.where(keep, vseg, 0)
        check((diag != 0).all(), f"sptrsv: zero diagonal in level {lv}")
        cols_parts.append(cols2d.ravel())
        vals_parts.append(vals2d.ravel())
        invd_parts.append(1.0 / diag)
        blocks.append(_LevelBlock(int(offsets[lv]), len(rows), w, flat))
        flat += cols2d.size
    handle.cols_cat = jnp.asarray(np.concatenate(cols_parts)
                                  if cols_parts else np.zeros(0, np.int32))
    handle.vals_cat = jnp.asarray(np.concatenate(vals_parts)
                                  if vals_parts else np.zeros(0, vals.dtype))
    handle.invd_cat = jnp.asarray(np.concatenate(invd_parts)
                                  if invd_parts else np.zeros(0, vals.dtype))
    handle.blocks = blocks
    handle.is_symbolic_called = True


@annotate("sptrsv_solve")
def sptrsv_solve(handle: SptrsvHandle, A: CsrMatrix, b):
    """x with tri(A)·x = b (values read from the handle's plan — rebuild the
    handle for new values; a values-only refresh is the planned split)."""
    check(handle.is_symbolic_called, "sptrsv_solve: symbolic first")
    if handle.algorithm is SptrsvAlgorithm.SUPERNODAL:
        return supernodal_solve(handle.sn_plan, b)
    if handle.fused_plan is not None and jnp.asarray(b).dtype == jnp.float32:
        from .sptrsv_pallas import fused_sptrsv_solve

        return fused_sptrsv_solve(handle.fused_plan, b)
    return _levelset_solve(jnp.asarray(handle.order),
                           jnp.asarray(handle.inv_order),
                           handle.cols_cat, handle.vals_cat,
                           handle.invd_cat, b, blocks=tuple(handle.blocks))


@functools.partial(jax.jit, static_argnames=("blocks",))
def _levelset_solve(order, inv_order, cols_cat, vals_cat, invd_cat, b, *,
                    blocks):
    """Whole level chain under ONE jit (an eager per-level loop was 300+
    sub-0.1s compiles/dispatches per handle — profiled round 3)."""
    bp = permute_via_sort(b, inv_order)
    xp = jnp.zeros_like(bp)
    for blk in blocks:
        sz = blk.rows * blk.w
        cols = jax.lax.slice_in_dim(cols_cat, blk.flat, blk.flat + sz)
        cols = cols.reshape(blk.rows, blk.w)
        vls = jax.lax.slice_in_dim(vals_cat, blk.flat, blk.flat + sz)
        vls = vls.reshape(blk.rows, blk.w)
        invd = jax.lax.slice_in_dim(invd_cat, blk.start, blk.start + blk.rows)
        bb = jax.lax.slice_in_dim(bp, blk.start, blk.start + blk.rows)
        ax = jnp.sum(vls * jnp.take(xp, cols, axis=0), axis=1)
        xnew = (invd * (bb - ax)).astype(xp.dtype)
        xp = jax.lax.dynamic_update_slice_in_dim(xp, xnew, blk.start, 0)
    return permute_via_sort(xp, order)
