"""Distributed colored Gauss-Seidel — BASELINE config 5: row-partitioned
matrix over a mesh, global distance-1 coloring, one halo exchange per color
update so every part reads fresh remote x values (the sweep is then exactly
the sequential colored GS ordering, not a block-Jacobi approximation).
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import round_up
from ..containers import CsrMatrix
from ..graph.coloring import ColoringAlgorithm, graph_color
from .halo import import_lists
from ..common.tracing import annotate

__all__ = ["DistGsPlan", "DistGsGtPlan", "build_dist_gs_plan",
           "build_dist_gs_gt_plan", "shard_dist_gs_plan", "dist_gs_sweep"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DistGsPlan:
    send_idx: Any            # (P, P, H)
    color_cols: tuple        # per color: (P, Rc, Wc) x_ext ids (diag excluded)
    color_vals: tuple        # per color: (P, Rc, Wc)
    color_rows: tuple        # per color: (P, Rc) local row slot (pad -> rpp)
    color_invd: tuple        # per color: (P, Rc)
    nrows: int
    n_parts: int
    rows_per_part: int
    halo: int
    omega: float

    def tree_flatten(self):
        children = (self.send_idx, self.color_cols, self.color_vals,
                    self.color_rows, self.color_invd)
        aux = (self.nrows, self.n_parts, self.rows_per_part, self.halo, self.omega)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_rows(self):
        return self.n_parts * self.rows_per_part

    @property
    def num_colors(self):
        return len(self.color_cols)


@annotate("dist.build_dist_gs_plan")
def build_dist_gs_plan(A: CsrMatrix, n_parts: int, omega: float = 1.0,
                       row_block: int = 8,
                       coloring: ColoringAlgorithm = ColoringAlgorithm.VB) -> DistGsPlan:
    assert A.nrows == A.ncols
    rm = A.host_row_map().astype(np.int64)
    ent = A.host_entries().astype(np.int64)
    vals = A.host_values()
    n = A.nrows
    rpp = round_up(-(-n // n_parts), row_block)
    send_idx, ext_map, H = import_lists(rm, ent, n, n_parts, rpp)
    colors = graph_color(A, coloring)
    ncolors = int(colors.max())
    part_of = lambda g: min(int(g) // rpp, n_parts - 1)

    color_cols, color_vals, color_rows, color_invd = [], [], [], []
    for c in range(1, ncolors + 1):
        rows_c = np.nonzero(colors == c)[0]
        by_part = [rows_c[(rows_c // rpp).clip(max=n_parts - 1) == p] for p in range(n_parts)]
        Rc = round_up(max(1, max(r.size for r in by_part)), row_block)
        lens = rm[rows_c + 1] - rm[rows_c] if rows_c.size else np.zeros(0, np.int64)
        Wc = max(1, int(lens.max(initial=1)))
        cc = np.zeros((n_parts, Rc, Wc), np.int32)
        cv = np.zeros((n_parts, Rc, Wc), vals.dtype)
        cr = np.full((n_parts, Rc), rpp, np.int32)
        cd = np.zeros((n_parts, Rc), vals.dtype)
        for p in range(n_parts):
            lo = p * rpp
            for j, r in enumerate(by_part[p]):
                s, e = rm[r], rm[r + 1]
                cseg, vseg = ent[s:e], vals[s:e]
                t = 0
                diag = 0.0
                for ccol, vval in zip(cseg, vseg):
                    if ccol == r:
                        diag = vval
                        continue
                    cc[p, j, t] = (ccol - lo) if part_of(ccol) == p else ext_map[p][int(ccol)]
                    cv[p, j, t] = vval
                    t += 1
                cr[p, j] = r - lo
                cd[p, j] = 1.0 / diag if diag != 0 else 0.0
        color_cols.append(jnp.asarray(cc))
        color_vals.append(jnp.asarray(cv))
        color_rows.append(jnp.asarray(cr))
        color_invd.append(jnp.asarray(cd))
    return DistGsPlan(jnp.asarray(send_idx), tuple(color_cols), tuple(color_vals),
                      tuple(color_rows), tuple(color_invd),
                      n, n_parts, rpp, H, float(omega))


@annotate("dist.shard_dist_gs_plan")
def shard_dist_gs_plan(plan: DistGsPlan, mesh: Mesh, axis: str = "parts") -> DistGsPlan:
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), plan)


# ---------------------------------------------------------------------------
# Fast variant: per-color local compute through the v9 gather-table Pallas
# kernels (round-2 verdict: the per-color jnp.take gather runs ~0.12 Gelem/s
# on v5e vs 14-40 Gnnz/s for the single-chip kernels).  Round 4: local rows
# are COLOR-BLOCK permuted (the reference's color_adj permutation,
# gauss_seidel_impl.hpp — same layout the single-chip POINT GS uses), so each
# color's stream set covers only its own Rc_pad-row block and the x update is
# a contiguous static slice — a color step no longer initializes or rescans
# the full local row space (round-3 bench: 5 colors x full-rpp output cost a
# 7x floor at 1 part).
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DistGsGtPlan:
    send_idx: Any        # (P, P, H) — PERMUTED local ids to send
    color_streams: tuple  # per color: (dst, src, first, cnt, gt, rhi, vals)
    color_mask: tuple     # per color: (P, Rc/128, 128) f32 1/0 update mask
    color_invd: tuple     # per color: (P, Rc/128, 128) f32 inv diag (0 pad)
    color_last: tuple     # per color: (P, n_ss) last-step-of-block flags
    to_perm_idx: Any      # (P*rpp_perm,) i32 gather: natural-ext -> permuted
    from_perm_idx: Any    # (P*rpp_nat,)  i32 gather: permuted-ext -> natural
    layouts: tuple        # per color: "gi4" | "dlp"
    n_sss: tuple
    batches: tuple
    groups: tuple
    rcs: tuple            # per color: Rc_pad (uniform across parts)
    offs: tuple           # per color: static offset in the permuted layout
    nrows: int
    n_parts: int
    rows_per_part: int    # NATURAL rows per part (API padding unit)
    rpp_perm: int         # permuted rows per part = sum(rcs)
    halo: int
    ncols_ext: int
    omega: float
    no_remote: bool = False  # no part imports anything: skip the exchange
    # n_parts == 1: the partitioner degenerates to the single-chip colored
    # GS (per-color (cols, vals, inv_diag, oh_plan) blocks) — the dist
    # machinery (stacked SPMD streams, exchange, shard_map) is pure
    # overhead with one part (measured round 5: 100-117 us vs 36 us)
    single: Any = None
    single_starts: tuple = ()

    def tree_flatten(self):
        children = (self.send_idx, self.color_streams, self.color_mask,
                    self.color_invd, self.color_last, self.to_perm_idx,
                    self.from_perm_idx, self.single)
        aux = (self.layouts, self.n_sss, self.batches, self.groups,
               self.rcs, self.offs, self.nrows, self.n_parts,
               self.rows_per_part, self.rpp_perm, self.halo,
               self.ncols_ext, self.omega, self.no_remote,
               self.single_starts)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:7], *aux[:14], single=children[7],
                   single_starts=aux[14])

    @property
    def padded_rows(self):
        return self.n_parts * self.rows_per_part

    @property
    def padded_perm_rows(self):
        return self.n_parts * self.rpp_perm

    @property
    def num_colors(self):
        if self.single is not None:
            return len(self.single)
        return len(self.color_streams)

    # -- layout converters (outside the sweep hot loop) -----------------
    def to_internal(self, x_natural_padded):
        """Natural padded (P*rpp) -> color-blocked permuted (P*rpp_perm).
        Chained sweeps should stay in the permuted space
        (dist_gs_sweep(..., permuted=True)) — on TPU these converter
        gathers cost far more than a sweep."""
        xe = jnp.concatenate([jnp.asarray(x_natural_padded),
                              jnp.zeros(1, jnp.asarray(x_natural_padded).dtype)])
        return jnp.take(xe, self.to_perm_idx)

    def to_natural(self, x_perm):
        xe = jnp.concatenate([x_perm, jnp.zeros(1, x_perm.dtype)])
        return jnp.take(xe, self.from_perm_idx)


def _build_single_chip_gs_plan(A, omega, row_block, coloring):
    """n_parts == 1 degenerate case: embed the single-chip colored-GS
    blocks (the reference would not spin up its MPI machinery for one rank
    either).  The plan's internal layout IS the single-chip permuted space,
    so chained sweeps and the to_internal/to_natural converters keep the
    same contract as the multi-part plan."""
    from ..sparse.gauss_seidel import (GsAlgorithm, GsHandle,
                                      gauss_seidel_numeric,
                                      gauss_seidel_symbolic)

    # SERIAL greedy coloring (the single-chip GS default): VB's tiny
    # trailing color classes fall under the one-hot plan's nnz gate and
    # would run the slow jnp.take fallback (measured 2.7 ms vs 40 us)
    h = GsHandle(algorithm=GsAlgorithm.POINT,
                 coloring=ColoringAlgorithm.SERIAL)
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, omega)
    n = A.nrows
    rpp = round_up(n, row_block)
    rpp_perm = round_up(n, 1024)
    order = np.asarray(h.order).astype(np.int64)
    to_perm = np.full(rpp_perm, rpp, np.int64)       # pads -> appended zero
    to_perm[:n] = order
    from_perm = np.full(rpp, rpp_perm, np.int64)
    from_perm[:n] = np.asarray(h.inv_order).astype(np.int64)
    blocks = tuple((b.cols, b.vals, b.inv_diag, b.oh_plan)
                   for b in h.blocks)
    starts = tuple(int(b.start) for b in h.blocks)
    return DistGsGtPlan(
        send_idx=jnp.zeros((1, 1, 0), jnp.int32), color_streams=(),
        color_mask=(), color_invd=(), color_last=(),
        to_perm_idx=jnp.asarray(to_perm.astype(np.int32)),
        from_perm_idx=jnp.asarray(from_perm.astype(np.int32)),
        layouts=(), n_sss=(), batches=(), groups=(), rcs=(), offs=(),
        nrows=n, n_parts=1, rows_per_part=rpp, rpp_perm=rpp_perm,
        halo=0, ncols_ext=rpp, omega=float(omega), no_remote=True,
        single=blocks, single_starts=starts)


def _single_chip_half_sweep(plan, xp, bp, forward: bool):
    """One direction over the embedded single-chip color blocks (the
    _point_half_sweep recurrence on the plan's permuted space)."""
    from ..sparse.spmv_pallas import onehot_spmv

    omega = plan.omega
    idx = range(len(plan.single))
    if not forward:
        idx = reversed(idx)
    for c in idx:
        cols, vals, invd, ohp = plan.single[c]
        start = plan.single_starts[c]
        nrc = invd.shape[0]
        bb = jax.lax.dynamic_slice_in_dim(bp, start, nrc)
        xb = jax.lax.dynamic_slice_in_dim(xp, start, nrc)
        if ohp is not None:
            ax = onehot_spmv(ohp, xp)
        else:
            ax = jnp.sum(vals * jnp.take(xp, cols, axis=0), axis=1)
        xnew = (1.0 - omega) * xb + omega * invd * (bb - ax)
        xp = jax.lax.dynamic_update_slice_in_dim(
            xp, xnew.astype(xp.dtype), start, 0)
    return xp


@annotate("dist.build_dist_gs_gt_plan")
def build_dist_gs_gt_plan(A: CsrMatrix, n_parts: int, omega: float = 1.0,
                          row_block: int = 8,
                          coloring: ColoringAlgorithm = ColoringAlgorithm.VB,
                          force_batch: int | None = None,
                          ) -> "DistGsGtPlan | None":
    """Fast distributed colored-GS plan; None when the gather-table layouts
    cannot be made uniform (callers fall back to build_dist_gs_plan).

    Local rows are laid out color-block permuted (uniform per-color block
    size Rc_pad across parts for SPMD), so each color's kernel covers only
    ceil(Rc_pad/1024) output tiles instead of the whole part."""
    from ..sparse import spmv_pallas
    from .gt_spmv import build_stacked_streams
    from .halo import import_index

    assert A.nrows == A.ncols
    if n_parts == 1:
        return _build_single_chip_gs_plan(A, omega, row_block, coloring)
    rm = A.host_row_map().astype(np.int64)
    ent = A.host_entries().astype(np.int64)
    vals = np.asarray(A.host_values(), np.float32)
    n = A.nrows
    rpp = round_up(-(-n // n_parts), row_block)
    send_idx, rem_cols, rem_ids, H = import_index(rm, ent, n, n_parts, rpp)
    colors = graph_color(A, coloring)
    ncolors = int(colors.max())
    lens_all = rm[1:] - rm[:-1]
    rows_all = np.repeat(np.arange(n, dtype=np.int64), lens_all)
    diag = np.zeros(n, np.float32)
    dsel = rows_all == ent
    diag[rows_all[dsel]] = vals[dsel]

    # ---- color-blocked permuted layout ---------------------------------
    # by_part_color[p][c-1] = orig GLOBAL row ids of color c in part p
    by_part_color = []
    for p in range(n_parts):
        lo, hi = p * rpp, min(n, (p + 1) * rpp)
        col_p = colors[lo:hi]
        by_part_color.append([lo + np.nonzero(col_p == c)[0]
                              for c in range(1, ncolors + 1)])
    # G*1024-aligned color blocks: offsets land on whole output GROUPS of
    # the gi4 kernel, so the fused in-place GS update's aliased out blocks
    # tile cleanly.  G=4 (NOT 16 — measured round 4: wider groups made the
    # fused kernel 2.5x SLOWER per color, the G live accumulators and
    # per-chunk quarter selects outweigh the run-floor cut).
    G_GS = 4
    rcs = tuple(round_up(max(1, max(by_part_color[p][c - 1].size
                                    for p in range(n_parts))),
                         max(row_block, G_GS * 1024))
                for c in range(1, ncolors + 1))
    offs = tuple(int(np.sum(rcs[:c], dtype=np.int64)) for c in range(ncolors))
    rpp_perm = int(sum(rcs))
    ncols_ext = rpp_perm + n_parts * H
    ns = max(1, -(-ncols_ext // spmv_pallas._OH_SRC))
    if ns * spmv_pallas._OH_SRC * 4 > spmv_pallas._X_VMEM_CAP:
        return None

    # inv_perm[p]: orig local row -> permuted local position
    inv_perm = [np.full(rpp, rpp_perm, np.int64) for _ in range(n_parts)]
    for p in range(n_parts):
        lo = p * rpp
        for ci, rows_pc in enumerate(by_part_color[p]):
            inv_perm[p][rows_pc - lo] = offs[ci] + np.arange(rows_pc.size)

    # converter gather indices (sentinel slot = the appended zero)
    L_nat, L_perm = n_parts * rpp, n_parts * rpp_perm
    to_perm = np.full(L_perm, L_nat, np.int64)
    from_perm = np.full(L_nat, L_perm, np.int64)
    for p in range(n_parts):
        lo, hi = p * rpp, min(n, (p + 1) * rpp)
        orig_loc = np.arange(hi - lo, dtype=np.int64)
        newpos = inv_perm[p][orig_loc]
        to_perm[p * rpp_perm + newpos] = p * rpp + orig_loc
        from_perm[p * rpp + orig_loc] = p * rpp_perm + newpos

    # send schedule in permuted-local coordinates
    send_perm = np.zeros_like(send_idx)
    for q in range(n_parts):
        send_perm[q] = inv_perm[q][send_idx[q].astype(np.int64)].astype(
            send_idx.dtype)

    color_streams, color_mask, color_invd, color_last = [], [], [], []
    layouts, n_sss, batches, groups = [], [], [], []
    for ci in range(ncolors):
        Rc = rcs[ci]
        locals_c = []
        mk = np.zeros((n_parts, Rc), np.float32)
        iv = np.zeros((n_parts, Rc), np.float32)
        for p in range(n_parts):
            lo = p * rpp
            rows_pc = by_part_color[p][ci]          # global ids, ascending
            nrc = rows_pc.size
            if nrc == 0:
                locals_c.append((np.zeros(Rc + 1, np.int64),
                                 np.zeros(0, np.int64),
                                 np.zeros(0, np.float32)))
                continue
            lens = lens_all[rows_pc]
            tot = int(lens.sum())
            base = np.cumsum(lens) - lens
            pos = (np.arange(tot) - np.repeat(base, lens)
                   + np.repeat(rm[rows_pc], lens))
            cseg = ent[pos]
            vseg = vals[pos]
            erow = np.repeat(rows_pc, lens)
            jrow = np.repeat(np.arange(nrc, dtype=np.int64), lens)
            keep = cseg != erow                      # drop the diagonal
            cseg, vseg, jrow = cseg[keep], vseg[keep], jrow[keep]
            cnts = np.bincount(jrow, minlength=Rc)
            rm_pc = np.zeros(Rc + 1, np.int64)
            np.cumsum(cnts, out=rm_pc[1:])
            # P*rpp >= n, so every part's local range is [lo, lo+rpp)
            local = (cseg >= lo) & (cseg < lo + rpp)
            mapped = np.where(local, inv_perm[p][
                np.where(local, cseg - lo, 0)], 0)
            if rem_cols[p].size and (~local).any():
                ridx = np.searchsorted(rem_cols[p], cseg[~local])
                # remote ext ids shift from the natural to the permuted base
                mapped[~local] = rem_ids[p][ridx] - rpp + rpp_perm
            locals_c.append((rm_pc, mapped, vseg))
            mk[p, :nrc] = 1.0
            dloc = diag[rows_pc]
            iv[p, :nrc] = np.where(dloc != 0,
                                   1.0 / np.where(dloc == 0, 1.0, dloc), 0.0)
        built = build_stacked_streams(locals_c, Rc, ncols_ext,
                                      force_group=G_GS,
                                      force_batch=force_batch)
        if built is None:
            return None
        (dst, src, first, cnt, gt, rhi, valsj, last, layout, n_ss, B, G,
         _) = built
        color_streams.append((dst, src, first, cnt, gt, rhi, valsj))
        color_last.append(last)
        # stored in the kernel-table row layout (P, Rc/128, 128)
        color_mask.append(jnp.asarray(mk.reshape(n_parts, Rc // 128, 128)))
        color_invd.append(jnp.asarray(iv.reshape(n_parts, Rc // 128, 128)))
        layouts.append(layout)
        n_sss.append(n_ss)
        batches.append(B)
        groups.append(G)
    no_remote = all(rc.size == 0 for rc in rem_cols)
    return DistGsGtPlan(jnp.asarray(send_perm), tuple(color_streams),
                        tuple(color_mask), tuple(color_invd),
                        tuple(color_last),
                        jnp.asarray(to_perm, jnp.int32),
                        jnp.asarray(from_perm, jnp.int32),
                        tuple(layouts), tuple(n_sss), tuple(batches),
                        tuple(groups), rcs, offs,
                        n, n_parts, rpp, rpp_perm, H, ncols_ext,
                        float(omega), no_remote)


def _local_sweep_gt(send_idx, streams, masks, invds, lasts, x_shard,
                    b_shard, *, axis, omega, reverse, layouts, n_sss,
                    batches, groups, rcs, offs, ns, rpp_perm, no_remote,
                    interpret):
    """One sweep direction on a shard, entirely in the kernel-table 2-D row
    layout ((rows, 128), element e at (e//128, e%128)): the extended vector
    xe2 holds [permuted local | halo | pad-to-ns*SR].  gi4 colors run the
    FUSED kernel (_gi4_gs_fused_batched) that applies the GS update into the
    aliased xe2 in place — no full-x copies or relayouts inside the color
    loop (the round-3 1-part floor).  dlp colors and non-fusable cases fall
    back to slice/update."""
    from ..sparse import spmv_pallas
    from .gt_spmv import apply_stacked_gt

    SR = spmv_pallas._OH_SRC // 128
    x2 = x_shard[0]                  # (rpp_perm//128, 128)
    b2 = b_shard[0]
    R2 = rpp_perm // 128
    xe2 = jnp.pad(x2, ((0, ns * SR - R2), (0, 0)))
    ncolors = len(streams)
    order = range(ncolors - 1, -1, -1) if reverse else range(ncolors)
    for c in order:
        if not no_remote:
            # halo exchange: gather send values from the 2-D layout (row
            # gather + per-element lane select; send lists are small)
            sid = send_idx[0]
            rows = jnp.take(xe2, (sid // 128).reshape(-1), axis=0)
            sends = jnp.take_along_axis(
                rows, (sid % 128).reshape(-1, 1), axis=1).reshape(sid.shape)
            recv = jax.lax.all_to_all(sends, axis, split_axis=0,
                                      concat_axis=0)
            rflat = recv.reshape(-1)
            hrows = -(-rflat.shape[0] // 128)
            r2 = jnp.pad(rflat, (0, hrows * 128 - rflat.shape[0])).reshape(
                hrows, 128)
            xe2 = jax.lax.dynamic_update_slice(xe2, r2, (R2, 0))
        dst, src, first, cnt, gt, rhi, valsj = streams[c]
        Rc, off = rcs[c], offs[c]
        G = groups[c] if c < len(groups) else 4
        if layouts[c] == "gi4" and off % (G * 1024) == 0 \
                and Rc % (G * 1024) == 0:
            xe2 = spmv_pallas._gi4_gs_fused_batched(
                dst[0], src[0], first[0], lasts[c][0], gt[0], valsj[0],
                b2, invds[c][0], masks[c][0], xe2,
                off4=off // (G * 1024), ns=ns, n_ss=n_sss[c],
                B=batches[c], G=G, omega=omega, interpret=interpret)
            continue
        y2 = apply_stacked_gt(dst, src, first, cnt, gt, rhi, valsj, xe2,
                              layout=layouts[c], n_ss=n_sss[c], B=batches[c],
                              ns=ns, rpp=Rc, nd=-(-Rc // 1024),
                              interpret=interpret, G=G, out2d=True)
        # color block = contiguous rows [off/128, (off+Rc)/128)
        xb = jax.lax.dynamic_slice(xe2, (off // 128, 0), (Rc // 128, 128))
        bb = jax.lax.dynamic_slice(b2, (off // 128, 0), (Rc // 128, 128))
        xnew = (1.0 - omega) * xb + omega * invds[c][0] * (bb - y2)
        xnew = jnp.where(masks[c][0] > 0, xnew.astype(x2.dtype), xb)
        xe2 = jax.lax.dynamic_update_slice(xe2, xnew, (off // 128, 0))
    return xe2[None, :R2]


@functools.lru_cache(maxsize=64)
def _sweep_fn_gt(mesh: Mesh, axis: str, rpp_perm: int, n_parts: int,
                 omega: float, layouts: tuple, n_sss: tuple, batches: tuple,
                 groups: tuple, rcs: tuple, offs: tuple,
                 ns: int, no_remote: bool, fwd: bool, interpret: bool):
    f = jax.shard_map(
        partial(_local_sweep_gt, axis=axis, omega=omega,
                reverse=not fwd, layouts=layouts, n_sss=n_sss,
                batches=batches, groups=groups, rcs=rcs, offs=offs,
                ns=ns, rpp_perm=rpp_perm, no_remote=no_remote,
                interpret=interpret),
        mesh=mesh,
        in_specs=(P(axis),) * 5 + (P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def run(plan: DistGsGtPlan, x2, b2):
        """x2/b2 in the 2-D row layout (n_parts, rpp_perm//128, 128)."""
        return f(plan.send_idx, plan.color_streams, plan.color_mask,
                 plan.color_invd, plan.color_last, x2, b2)

    return run


def _local_sweep(send_idx, ccols, cvals, crows, cinvd, x_shard, b_shard, *,
                 axis, rpp, omega, reverse):
    x = x_shard[0]
    b = b_shard[0]
    order = range(len(ccols) - 1, -1, -1) if reverse else range(len(ccols))
    for c in order:
        sends = jnp.take(x, send_idx[0], axis=0)
        recv = jax.lax.all_to_all(sends, axis, split_axis=0, concat_axis=0)
        x_ext = jnp.concatenate([x, recv.reshape(-1)])
        rows = crows[c][0]
        ax = jnp.sum(cvals[c][0] * jnp.take(x_ext, ccols[c][0], axis=0), axis=1)
        xb = jnp.take(x, jnp.minimum(rows, rpp - 1))
        bb = jnp.take(b, jnp.minimum(rows, rpp - 1))
        xnew = (1.0 - omega) * xb + omega * cinvd[c][0] * (bb - ax)
        xpad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        xpad = xpad.at[rows].set(xnew.astype(x.dtype))
        x = xpad[:rpp]
    return x[None]


@functools.lru_cache(maxsize=64)
def _sweep_fn(mesh: Mesh, axis: str, rpp: int, n_parts: int, omega: float,
              fwd: bool):
    """Jitted one-direction sweep, cached per (mesh, geometry, direction) —
    without this every dist_gs_sweep call re-traced the shard_map (the
    compile was >90% of each call)."""
    f = jax.shard_map(
        partial(_local_sweep, axis=axis, rpp=rpp, omega=omega,
                reverse=not fwd),
        mesh=mesh,
        in_specs=(P(axis),) * 5 + (P(axis), P(axis)),
        out_specs=P(axis),
    )

    @jax.jit
    def run(plan: DistGsPlan, x, b):
        y2 = f(plan.send_idx, plan.color_cols, plan.color_vals,
               plan.color_rows, plan.color_invd,
               x.reshape(n_parts, rpp), b.reshape(n_parts, rpp))
        return y2.reshape(-1)

    return run


@annotate("dist.dist_gs_sweep")
def dist_gs_sweep(plan, x_padded, b_padded, mesh: Mesh,
                  num_sweeps: int = 1, direction: str = "symmetric",
                  axis: str = "parts", interpret: bool | None = None,
                  permuted: bool = False):
    """Colored GS sweeps on row-sharded x/b (padded to plan.padded_rows);
    accepts a DistGsPlan (ELL jnp.take schedule) or DistGsGtPlan (Pallas
    gather-table local kernels — the fast path).

    For a DistGsGtPlan, ``permuted=True`` means x/b are already in the
    plan's color-blocked permuted layout (length plan.padded_perm_rows) and
    the result stays there — the convention for chained sweeps/solvers on
    TPU, where the natural<->permuted converter gathers dominate a sweep
    (same contract as the single-chip POINT GS's permuted-space
    _point_half_sweep)."""
    if isinstance(plan, DistGsGtPlan):
        from ..sparse import spmv_pallas

        if interpret is None:
            interpret = not spmv_pallas.supports_pallas()
        if plan.single is not None:
            # single-chip degenerate plan: sweep the embedded color blocks
            # directly on the flat permuted vector
            n = plan.nrows
            R2 = plan.rpp_perm // 128
            x = x_padded if permuted else plan.to_internal(x_padded)
            b = b_padded if permuted else plan.to_internal(b_padded)
            was_2d = getattr(x, "ndim", 1) == 3
            xp = jnp.asarray(x).reshape(-1)[:n]
            bp = jnp.asarray(b).reshape(-1)[:n]
            for _ in range(num_sweeps):
                if direction in ("forward", "symmetric"):
                    xp = _single_chip_half_sweep(plan, xp, bp, True)
                if direction in ("backward", "symmetric"):
                    xp = _single_chip_half_sweep(plan, xp, bp, False)
            out = jnp.pad(xp, (0, plan.rpp_perm - n))
            if was_2d:
                return out.reshape(1, R2, 128)
            return out if permuted else plan.to_natural(out)
        ns = max(1, -(-plan.ncols_ext // spmv_pallas._OH_SRC))
        if plan.n_parts == 1 and plan.no_remote:
            # single-part, nothing imported: the shard_map wrapper is pure
            # overhead (~30 us/sweep measured round 5) — run the local body
            # directly; semantics are identical
            def fn(fwd):
                def run(p, x2, b2):
                    return _local_sweep_gt(
                        p.send_idx, p.color_streams, p.color_mask,
                        p.color_invd, p.color_last, x2, b2,
                        axis=axis, omega=p.omega, reverse=not fwd,
                        layouts=p.layouts, n_sss=p.n_sss, batches=p.batches,
                        groups=p.groups, rcs=p.rcs, offs=p.offs, ns=ns,
                        rpp_perm=p.rpp_perm, no_remote=True,
                        interpret=interpret)
                return run
        else:
            key = (mesh, axis, plan.rpp_perm, plan.n_parts, plan.omega,
                   plan.layouts, plan.n_sss, plan.batches, plan.groups,
                   plan.rcs, plan.offs, ns, plan.no_remote)
            fn = lambda fwd: _sweep_fn_gt(*key, fwd, interpret)
        x = x_padded if permuted else plan.to_internal(x_padded)
        b = b_padded if permuted else plan.to_internal(b_padded)
        # the sweep runs in the 2-D kernel-table row layout; 3-D inputs
        # (n_parts, rpp_perm//128, 128) pass through without relayout and
        # come back in the same form (the zero-copy chaining convention)
        was_2d = getattr(x, "ndim", 1) == 3
        R2 = plan.rpp_perm // 128
        if not was_2d:
            x = jnp.asarray(x).reshape(plan.n_parts, R2, 128)
            b = jnp.asarray(b).reshape(plan.n_parts, R2, 128)
        for _ in range(num_sweeps):
            if direction in ("forward", "symmetric"):
                x = fn(True)(plan, x, b)
            if direction in ("backward", "symmetric"):
                x = fn(False)(plan, x, b)
        if was_2d:
            return x
        x = x.reshape(-1)
        return x if permuted else plan.to_natural(x)
    key = (mesh, axis, plan.rows_per_part, plan.n_parts, plan.omega)
    fn = lambda fwd: _sweep_fn(*key, fwd)
    x = x_padded
    for _ in range(num_sweeps):
        if direction in ("forward", "symmetric"):
            x = fn(True)(plan, x, b_padded)
        if direction in ("backward", "symmetric"):
            x = fn(False)(plan, x, b_padded)
    return x
