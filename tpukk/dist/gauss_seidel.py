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
# on v5e vs 14-40 Gnnz/s for the single-chip kernels).  Each color's rows
# form a (rpp x ncols_ext) sub-matrix per part; its stacked stream set runs
# inside shard_map and the x update is a masked vector op (no scatter).
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DistGsGtPlan:
    send_idx: Any        # (P, P, H)
    color_streams: tuple  # per color: (dst, src, first, cnt, gt, rhi, vals)
    color_mask: tuple     # per color: (P, rpp) f32 1/0 update mask
    color_invd: tuple     # per color: (P, rpp) f32 inv diag (0 off-color)
    layouts: tuple        # per color: "gi4" | "dlp"
    n_sss: tuple
    batches: tuple
    groups: tuple
    nrows: int
    n_parts: int
    rows_per_part: int
    halo: int
    ncols_ext: int
    omega: float

    def tree_flatten(self):
        children = (self.send_idx, self.color_streams, self.color_mask,
                    self.color_invd)
        aux = (self.layouts, self.n_sss, self.batches, self.groups,
               self.nrows, self.n_parts, self.rows_per_part, self.halo,
               self.ncols_ext, self.omega)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_rows(self):
        return self.n_parts * self.rows_per_part

    @property
    def num_colors(self):
        return len(self.color_streams)


@annotate("dist.build_dist_gs_gt_plan")
def build_dist_gs_gt_plan(A: CsrMatrix, n_parts: int, omega: float = 1.0,
                          row_block: int = 8,
                          coloring: ColoringAlgorithm = ColoringAlgorithm.VB,
                          ) -> "DistGsGtPlan | None":
    """Fast distributed colored-GS plan; None when the gather-table layouts
    cannot be made uniform (callers fall back to build_dist_gs_plan)."""
    from ..sparse import spmv_pallas
    from .gt_spmv import build_stacked_streams
    from .halo import import_index

    assert A.nrows == A.ncols
    rm = A.host_row_map().astype(np.int64)
    ent = A.host_entries().astype(np.int64)
    vals = np.asarray(A.host_values(), np.float32)
    n = A.nrows
    rpp = round_up(-(-n // n_parts), row_block)
    send_idx, rem_cols, rem_ids, H = import_index(rm, ent, n, n_parts, rpp)
    ncols_ext = rpp + n_parts * H
    ns = max(1, -(-ncols_ext // spmv_pallas._OH_SRC))
    if ns * spmv_pallas._OH_SRC * 4 > spmv_pallas._X_VMEM_CAP:
        return None
    colors = graph_color(A, coloring)
    ncolors = int(colors.max())
    rows_all = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])

    color_streams, color_mask, color_invd = [], [], []
    layouts, n_sss, batches, groups = [], [], [], []
    diag = np.zeros(n, np.float32)
    dsel = rows_all == ent
    diag[rows_all[dsel]] = vals[dsel]
    for c in range(1, ncolors + 1):
        locals_c = []
        mk = np.zeros((n_parts, rpp), np.float32)
        iv = np.zeros((n_parts, rpp), np.float32)
        for p in range(n_parts):
            lo, hi = p * rpp, min(n, (p + 1) * rpp)
            nr = max(0, hi - lo)
            if nr == 0:
                locals_c.append((np.zeros(rpp + 1, np.int64),
                                 np.zeros(0, np.int64),
                                 np.zeros(0, np.float32)))
                continue
            s, e = rm[lo], rm[hi]
            erow = rows_all[s:e]
            keep = (colors[erow] == c) & (ent[s:e] != erow)
            cseg = ent[s:e][keep]
            vseg = vals[s:e][keep]
            # row map over kept entries
            cnts = np.bincount((erow[keep] - lo).astype(np.int64),
                               minlength=rpp)
            rm_pc = np.zeros(rpp + 1, np.int64)
            np.cumsum(cnts, out=rm_pc[1:])
            local = (cseg >= lo) & (cseg < lo + rpp)
            mapped = np.where(local, cseg - lo, 0)
            if rem_cols[p].size:
                ridx = np.searchsorted(rem_cols[p], cseg[~local])
                mapped[~local] = rem_ids[p][ridx]
            locals_c.append((rm_pc, mapped, vseg))
            sel = colors[lo:hi] == c
            mk[p, :nr] = sel
            dloc = diag[lo:hi]
            iv[p, :nr] = np.where(sel & (dloc != 0), 1.0 / np.where(
                dloc == 0, 1.0, dloc), 0.0)
        built = build_stacked_streams(locals_c, rpp, ncols_ext)
        if built is None:
            return None
        dst, src, first, cnt, gt, rhi, valsj, layout, n_ss, B, G, _ = built
        color_streams.append((dst, src, first, cnt, gt, rhi, valsj))
        color_mask.append(jnp.asarray(mk))
        color_invd.append(jnp.asarray(iv))
        layouts.append(layout)
        n_sss.append(n_ss)
        batches.append(B)
        groups.append(G)
    return DistGsGtPlan(jnp.asarray(send_idx), tuple(color_streams),
                        tuple(color_mask), tuple(color_invd),
                        tuple(layouts), tuple(n_sss), tuple(batches),
                        tuple(groups),
                        n, n_parts, rpp, H, ncols_ext, float(omega))


def _local_sweep_gt(send_idx, streams, masks, invds, x_shard, b_shard, *,
                    axis, rpp, omega, reverse, layouts, n_sss, batches,
                    groups, ns, nd, interpret):
    from .gt_spmv import apply_stacked_gt

    x = x_shard[0]
    b = b_shard[0]
    ncolors = len(streams)
    order = range(ncolors - 1, -1, -1) if reverse else range(ncolors)
    for c in order:
        sends = jnp.take(x, send_idx[0], axis=0)
        recv = jax.lax.all_to_all(sends, axis, split_axis=0, concat_axis=0)
        x_ext = jnp.concatenate([x, recv.reshape(-1)])
        dst, src, first, cnt, gt, rhi, valsj = streams[c]
        y = apply_stacked_gt(dst, src, first, cnt, gt, rhi, valsj, x_ext,
                             layout=layouts[c], n_ss=n_sss[c], B=batches[c],
                             ns=ns, rpp=rpp, nd=nd, interpret=interpret,
                             G=groups[c] if c < len(groups) else 4)
        xnew = (1.0 - omega) * x + omega * invds[c][0] * (b - y)
        x = jnp.where(masks[c][0] > 0, xnew.astype(x.dtype), x)
    return x[None]


@functools.lru_cache(maxsize=64)
def _sweep_fn_gt(mesh: Mesh, axis: str, rpp: int, n_parts: int, omega: float,
                 layouts: tuple, n_sss: tuple, batches: tuple, groups: tuple,
                 ns: int, nd: int, fwd: bool, interpret: bool):
    f = jax.shard_map(
        partial(_local_sweep_gt, axis=axis, rpp=rpp, omega=omega,
                reverse=not fwd, layouts=layouts, n_sss=n_sss,
                batches=batches, groups=groups, ns=ns, nd=nd,
                interpret=interpret),
        mesh=mesh,
        in_specs=(P(axis),) * 4 + (P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def run(plan: DistGsGtPlan, x, b):
        y2 = f(plan.send_idx, plan.color_streams, plan.color_mask,
               plan.color_invd,
               x.reshape(n_parts, rpp), b.reshape(n_parts, rpp))
        return y2.reshape(-1)

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
                  axis: str = "parts", interpret: bool | None = None):
    """Colored GS sweeps on row-sharded x/b (padded to plan.padded_rows);
    accepts a DistGsPlan (ELL jnp.take schedule) or DistGsGtPlan (Pallas
    gather-table local kernels — the fast path)."""
    if isinstance(plan, DistGsGtPlan):
        from ..sparse import spmv_pallas

        if interpret is None:
            interpret = not spmv_pallas.supports_pallas()
        ns = max(1, -(-plan.ncols_ext // spmv_pallas._OH_SRC))
        nd = max(1, -(-plan.rows_per_part // spmv_pallas._OH_DST))
        key = (mesh, axis, plan.rows_per_part, plan.n_parts, plan.omega,
               plan.layouts, plan.n_sss, plan.batches,
               getattr(plan, "groups", (4,) * len(plan.layouts)), ns, nd)
        fn = lambda fwd: _sweep_fn_gt(*key, fwd, interpret)
    else:
        key = (mesh, axis, plan.rows_per_part, plan.n_parts, plan.omega)
        fn = lambda fwd: _sweep_fn(*key, fwd)
    x = x_padded
    for _ in range(num_sweeps):
        if direction in ("forward", "symmetric"):
            x = fn(True)(plan, x, b_padded)
        if direction in ("backward", "symmetric"):
            x = fn(False)(plan, x, b_padded)
    return x
