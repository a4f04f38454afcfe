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

__all__ = ["DistGsPlan", "build_dist_gs_plan", "shard_dist_gs_plan", "dist_gs_sweep"]


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


def shard_dist_gs_plan(plan: DistGsPlan, mesh: Mesh, axis: str = "parts") -> DistGsPlan:
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), plan)


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


def dist_gs_sweep(plan: DistGsPlan, x_padded, b_padded, mesh: Mesh,
                  num_sweeps: int = 1, direction: str = "symmetric",
                  axis: str = "parts"):
    """Colored GS sweeps on row-sharded x/b (padded to plan.padded_rows)."""
    key = (mesh, axis, plan.rows_per_part, plan.n_parts, plan.omega)
    x = x_padded
    for _ in range(num_sweeps):
        if direction in ("forward", "symmetric"):
            x = _sweep_fn(*key, True)(plan, x, b_padded)
        if direction in ("backward", "symmetric"):
            x = _sweep_fn(*key, False)(plan, x, b_padded)
    return x
