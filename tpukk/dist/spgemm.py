"""Ring-scheduled distributed SpGEMM — C = A·B with A, B, C row-partitioned
over the mesh (SURVEY.md §5.7: "all-to-all rotation of B row-panels (ring
schedule — the ring-attention-shaped dataflow for sparse products)").

Plan (host symbolic): expand all scalar products for part p's C rows, group
them by the owner part of the A-column (= which ring step supplies that B
row), and pad each (part, step) pair list to a uniform length.  Numeric
(device, shard_map): P steps of {gather·multiply·segment-sum into the local
C accumulator; `ppermute` the B value panel to the next neighbor} — values
circulate over ICI while every part computes, double-buffer-style.
Same-sparsity reuse: the plan depends only on patterns; numeric re-runs on
new values.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import round_up
from ..containers import CsrMatrix
from ..common.tracing import annotate

__all__ = ["RingSpgemmPlan", "build_ring_spgemm_plan", "shard_ring_spgemm_plan",
           "ring_spgemm_numeric"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RingSpgemmPlan:
    a_vals_pad: Any      # (P, NA) padded local A values
    b_vals_pad: Any      # (P, NB) padded local B values (the rotating panel)
    pair_a: Any          # (P, S, PM) indices into local a_vals_pad
    pair_b: Any          # (P, S, PM) indices into the currently-held panel
    pair_c: Any          # (P, S, PM) indices into local C values (pad -> NC)
    row_map_c: Any       # host np (n+1,) global C structure
    entries_c: Any       # host np (nnzC,)
    nnz_c_local: Any     # (P,) actual local C nnz
    nrows_c: int
    ncols_c: int
    n_parts: int
    rows_per_part: int
    nc_max: int
    # pk fast path: per-(part, step) v9 pair streams stacked (P, steps, ...)
    # — None when the native placer was unavailable/overflowed
    pk_streams: Any = None           # 7-tuple of stacked arrays or None
    pk_meta: tuple = None            # (S, n_ss, B, nc_tiles, NA, NB) or None

    def tree_flatten(self):
        children = (self.a_vals_pad, self.b_vals_pad, self.pair_a, self.pair_b,
                    self.pair_c, self.nnz_c_local, self.pk_streams)
        aux = (self.row_map_c, self.entries_c, self.nrows_c, self.ncols_c,
               self.n_parts, self.rows_per_part, self.nc_max, self.pk_meta)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.a_vals_pad, obj.b_vals_pad, obj.pair_a, obj.pair_b,
         obj.pair_c, obj.nnz_c_local, obj.pk_streams) = children
        (obj.row_map_c, obj.entries_c, obj.nrows_c, obj.ncols_c,
         obj.n_parts, obj.rows_per_part, obj.nc_max, obj.pk_meta) = aux
        return obj


@annotate("dist.build_ring_spgemm_plan")
def build_ring_spgemm_plan(A: CsrMatrix, B: CsrMatrix, n_parts: int) -> RingSpgemmPlan:
    assert A.ncols == B.nrows
    arm = A.host_row_map().astype(np.int64)
    aent = A.host_entries().astype(np.int64)
    avals = A.host_values()
    brm = B.host_row_map().astype(np.int64)
    bent = B.host_entries().astype(np.int64)
    bvals = np.asarray(B.values)

    rppA = -(-A.nrows // n_parts)
    rppB = -(-B.nrows // n_parts)
    part_of_brow = lambda r: np.minimum(r // rppB, n_parts - 1)

    # global C pattern (host oracle for structure)
    Cs = (A.to_scipy() @ B.to_scipy()).tocsr()
    Cs.sort_indices()
    crm, cent = Cs.indptr.astype(np.int64), Cs.indices.astype(np.int64)

    # local paddings
    NA = max(1, max(int(arm[min(A.nrows, (p + 1) * rppA)] - arm[min(A.nrows, p * rppA)])
                    for p in range(n_parts)))
    NB = max(1, max(int(brm[min(B.nrows, (p + 1) * rppB)] - brm[min(B.nrows, p * rppB)])
                    for p in range(n_parts)))
    NC = max(1, max(int(crm[min(A.nrows, (p + 1) * rppA)] - crm[min(A.nrows, p * rppA)])
                    for p in range(n_parts)))

    a_pad = np.zeros((n_parts, NA), avals.dtype)
    b_pad = np.zeros((n_parts, NB), bvals.dtype)
    a_off = np.zeros(n_parts, np.int64)
    b_off = np.zeros(n_parts, np.int64)
    c_off = np.zeros(n_parts, np.int64)
    nnz_c_local = np.zeros(n_parts, np.int64)
    for p in range(n_parts):
        alo, ahi = arm[min(A.nrows, p * rppA)], arm[min(A.nrows, (p + 1) * rppA)]
        blo, bhi = brm[min(B.nrows, p * rppB)], brm[min(B.nrows, (p + 1) * rppB)]
        clo, chi = crm[min(A.nrows, p * rppA)], crm[min(A.nrows, (p + 1) * rppA)]
        a_pad[p, : ahi - alo] = avals[alo:ahi]
        b_pad[p, : bhi - blo] = bvals[blo:bhi]
        a_off[p], b_off[p], c_off[p] = alo, blo, clo
        nnz_c_local[p] = chi - clo

    # pair expansion grouped by (owner part p, source part of A-col)
    pairs = [[([], [], []) for _ in range(n_parts)] for _ in range(n_parts)]
    # map (row, col) -> c idx via searchsorted per row
    for p in range(n_parts):
        rows = range(p * rppA, min(A.nrows, (p + 1) * rppA))
        for r in rows:
            crow = cent[crm[r]:crm[r + 1]]
            cbase = crm[r] - c_off[p]
            for ea in range(arm[r], arm[r + 1]):
                k = aent[ea]
                q = int(part_of_brow(k))
                step = (q - p) % n_parts
                pa, pb, pc = pairs[p][step]
                for eb in range(brm[k], brm[k + 1]):
                    j = bent[eb]
                    ci = cbase + np.searchsorted(crow, j)
                    pa.append(ea - a_off[p])
                    pb.append(eb - b_off[q])
                    pc.append(int(ci))

    PM = max(1, max(len(pairs[p][s][0]) for p in range(n_parts) for s in range(n_parts)))
    PM = round_up(PM, 8)
    pair_a = np.zeros((n_parts, n_parts, PM), np.int32)
    pair_b = np.zeros((n_parts, n_parts, PM), np.int32)
    pair_c = np.full((n_parts, n_parts, PM), NC, np.int32)  # pad -> NC (dropped)
    for p in range(n_parts):
        for s in range(n_parts):
            pa, pb, pc = pairs[p][s]
            pair_a[p, s, : len(pa)] = pa
            pair_b[p, s, : len(pb)] = pb
            pair_c[p, s, : len(pc)] = pc

    # pk fast path is f32-only (the pair kernel computes in f32); f64 plans
    # keep the exact take+segment schedule
    if a_pad.dtype == np.float32 and b_pad.dtype == np.float32:
        pk_streams, pk_meta = _build_ring_pk_streams(pairs, n_parts, NA, NB, NC)
    else:
        pk_streams, pk_meta = None, None
    return RingSpgemmPlan(
        jnp.asarray(a_pad), jnp.asarray(b_pad),
        jnp.asarray(pair_a), jnp.asarray(pair_b), jnp.asarray(pair_c),
        Cs.indptr.astype(np.int32), Cs.indices.astype(np.int32),
        jnp.asarray(nnz_c_local),
        A.nrows, B.ncols, n_parts, rppA, NC, pk_streams, pk_meta)


def _build_ring_pk_streams(pairs, n_parts, NA, NB, NC):
    """Per-(part, step) v9 pk pair streams with a uniform batch, padded to
    common shapes and stacked (P, steps, ...) — the local compute of every
    ring step then runs the packed-gather pair kernel instead of XLA takes.
    (None, None) when the native placer is unavailable or any set
    overflows."""
    import os

    from ..sparse import spgemm_pallas

    if int(os.environ.get("TPUKK_NO_PK_RING", "0")):
        return None, None
    streams = []
    B0 = None
    for p in range(n_parts):
        row = []
        for s in range(n_parts):
            pa, pb, pc = pairs[p][s]
            res = spgemm_pallas.build_pk_pair_streams_host(
                np.asarray(pa, np.int64), np.asarray(pb, np.int64),
                np.asarray(pc, np.int64), NA, NB, NC, force_batch=B0)
            if res is None:
                return None, None
            if B0 is None:
                B0 = res["B"]
            row.append(res)
        streams.append(row)
    nc = streams[0][0]["nc"]
    n_ss = max(r["n_ss"] for row in streams for r in row)
    S = n_ss * B0

    def stack(key, fill, per_chunk_rows):
        out = []
        for row in streams:
            rr = []
            for r in row:
                a = r[key]
                if per_chunk_rows:
                    pad = ((0, (S - r["S"]) * 8), (0, 0))
                else:
                    pad = (0, n_ss - r["n_ss"]) if a.ndim == 1 else None
                    if a.ndim == 1 and key in ("at_ids", "bt_ids"):
                        pad = (0, S - r["S"])
                rr.append(np.pad(a, pad, constant_values=fill))
            out.append(np.stack(rr))
        return jnp.asarray(np.stack(out))

    pk = (stack("at_ids", 0, False), stack("bt_ids", 0, False),
          stack("ct_ss", 0, False), stack("first_ss", 0, False),
          stack("pkA", 0, True), stack("pkB", 0, True),
          stack("crhi", -1, True))
    return pk, (S, n_ss, B0, nc, NA, NB)


@annotate("dist.shard_ring_spgemm_plan")
def shard_ring_spgemm_plan(plan: RingSpgemmPlan, mesh: Mesh, axis: str = "parts"):
    spec = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), plan)


def _local_ring(a_vals, b_vals, pa, pb, pc, *, axis, n_parts, nc_max):
    av = a_vals[0]
    panel = b_vals[0]
    acc = jnp.zeros(nc_max + 1, av.dtype)
    perm = [(i, (i - 1) % n_parts) for i in range(n_parts)]
    for s in range(n_parts):
        prod = jnp.take(av, pa[0, s]) * jnp.take(panel, pb[0, s])
        acc = acc + jax.ops.segment_sum(prod, pc[0, s], num_segments=nc_max + 1)
        if s + 1 < n_parts:
            panel = jax.lax.ppermute(panel, axis, perm=perm)
    return acc[:nc_max][None]


def _local_ring_pk(a_vals, b_vals, at, bt, ct, first, pkA, pkB, crhi, *,
                   axis, n_parts, nc_max, n_ss, B, nc, na, nb, interpret):
    from ..sparse.spgemm_pallas import _gtp_pk_call

    av = a_vals[0]
    panel = b_vals[0]
    acc = jnp.zeros(nc_max, jnp.float32)
    perm = [(i, (i - 1) % n_parts) for i in range(n_parts)]
    for s in range(n_parts):
        cv = _gtp_pk_call(at[0, s], bt[0, s], ct[0, s], first[0, s],
                          pkA[0, s], pkB[0, s], crhi[0, s], av, panel,
                          na=na, nb=nb, nc=nc, n_ss=n_ss, B=B,
                          nnz_c=nc_max, interpret=interpret)
        acc = acc + cv
        if s + 1 < n_parts:
            panel = jax.lax.ppermute(panel, axis, perm=perm)
    return acc.astype(av.dtype)[None]


@annotate("dist.ring_spgemm_numeric")
def ring_spgemm_numeric(plan: RingSpgemmPlan, mesh: Mesh, axis: str = "parts",
                        interpret: bool | None = None) -> CsrMatrix:
    """Run the ring; assemble the global CsrMatrix C.  Local compute runs
    the v9 packed-gather pair kernel per step when the plan carries pk
    streams (f32 + native placer), else the take+segment schedule."""
    if plan.pk_meta is not None:
        from ..sparse import spgemm_pallas
        from ..sparse.spmv_pallas import supports_pallas

        if interpret is None:
            interpret = not supports_pallas()
        S, n_ss, B, nc, NA, NB = plan.pk_meta
        na = max(1, -(-NA // spgemm_pallas._BLK))
        nb = max(1, -(-NB // spgemm_pallas._BLK))
        f = jax.shard_map(
            partial(_local_ring_pk, axis=axis, n_parts=plan.n_parts,
                    nc_max=plan.nc_max, n_ss=n_ss, B=B, nc=nc, na=na,
                    nb=nb, interpret=interpret),
            mesh=mesh,
            in_specs=(P(axis),) * 9,
            out_specs=P(axis),
            check_vma=False,
        )
        c_pad = f(plan.a_vals_pad, plan.b_vals_pad, *plan.pk_streams)
    else:
        f = jax.shard_map(
            partial(_local_ring, axis=axis, n_parts=plan.n_parts,
                    nc_max=plan.nc_max),
            mesh=mesh,
            in_specs=(P(axis),) * 5,
            out_specs=P(axis),
        )
        c_pad = f(plan.a_vals_pad, plan.b_vals_pad, plan.pair_a,
                  plan.pair_b, plan.pair_c)
    # host assembly: drop per-part padding
    c_np = np.asarray(c_pad)
    counts = np.asarray(plan.nnz_c_local)
    vals = np.concatenate([c_np[p, : counts[p]] for p in range(plan.n_parts)]) \
        if plan.n_parts else np.empty(0)
    return CsrMatrix.from_arrays(
        jnp.asarray(plan.row_map_c), jnp.asarray(plan.entries_c),
        jnp.asarray(vals), nrows=plan.nrows_c, ncols=plan.ncols_c)
