"""Pallas TPU kernel for the SpGEMM numeric phase.

The pair-plan numeric (spgemm.py::_numeric_pairs) is three XLA index ops —
two `take`s and a sorted segment-sum — each running at ~0.1 G elem/s on v5e
(docs/PERF_NOTES.md).  This kernel executes the same static schedule with
VMEM one-hot radix contractions instead (no HBM gathers), the SpGEMM analog
of spmv_pallas.onehot_spmv:

  per (c_tile 1024, a_block, b_block) chunk of CH pairs:
    a(1,CH)    = radix_gather(Avals_block, a_loc)   [3 bf16 MXU passes + VPU]
    b(1,CH)    = radix_gather(Bvals_block, b_loc)
    C(8,128)  += sum_p OH_chi(8,CH) @ (cmp_clo ⊙ (a*b)_p)^T [3 bf16 passes]

All selection matmuls are single-pass bf16 with f32 accumulation yet exact
to f32 semantics (one-hot operand is {0,1}-exact in bf16; the value operand
is a 3-plane bf16 decomposition) — see spmv_pallas for the v3 design and
measurements (2.7x over 6-pass HIGHEST f32 selection).

Pairs arrive sorted by C position (the pair plan's contract), so chunks are
C-tile contiguous: the C tile stays VMEM-resident and accumulates across
steps, with a `first` flag initializing it.  Pad slots carry c_loc = -1
(rhi=-1 matches no one-hot row -> contribution dropped).  Values change
between numeric calls; only cheap device pads happen per call — the plan
is built once per sparsity (spgemm_handle.hpp:248-252 reuse contract).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmv_pallas import (_bf16_planes3, _sublane_gather, _dl_schedule,
                          _gather_rows)

__all__ = ["OnehotPairPlan", "DlPairPlan", "GtPairPlan",
           "build_onehot_pair_plan", "onehot_pair_numeric"]

_BLK = 4096   # A/B value block (32 x 128 radix; 4096 beat 8192 on v5e)
_SR = _BLK // 128
_CT = 1024    # C tile (8 x 128 radix)
_CH = 1024    # pairs per grid step


class OnehotPairPlan:
    """Host schedule from a (c-sorted) pair plan."""

    def __init__(self, a_idx, b_idx, c_idx, nnz_a, nnz_b, nnz_c, *, _fields=None):
        if _fields is not None:
            (self.a_loc, self.b_loc, self.c_loc, self.at_ids, self.bt_ids,
             self.ct_ids, self.first, self.na_blocks, self.nb_blocks,
             self.nc_tiles, self.nnz_c, self.num_steps, self.pad_ratio) = _fields
            return
        a_idx = np.asarray(a_idx, dtype=np.int64)
        b_idx = np.asarray(b_idx, dtype=np.int64)
        c_idx = np.asarray(c_idx, dtype=np.int64)
        P = len(c_idx)
        na = max(1, -(-max(nnz_a, 1) // _BLK))
        nb = max(1, -(-max(nnz_b, 1) // _BLK))
        nc = max(1, -(-max(nnz_c, 1) // _CT))
        at = a_idx // _BLK
        bt = b_idx // _BLK
        ct = c_idx // _CT
        key = (ct * na + at) * nb + bt
        order = np.argsort(key, kind="stable")
        a_s, b_s, c_s = a_idx[order], b_idx[order], c_idx[order]
        at_s, bt_s, ct_s = at[order], bt[order], ct[order]
        ks = key[order]
        change = np.nonzero(np.diff(ks))[0] + 1
        run_starts = np.concatenate(([0], change)) if P else np.empty(0, np.int64)
        run_ends = np.concatenate((change, [P])) if P else np.empty(0, np.int64)
        nchunks = -(-(run_ends - run_starts) // _CH)
        step_run = np.repeat(np.arange(len(run_starts)), nchunks)
        cum = np.concatenate(([0], np.cumsum(nchunks)))[:-1]
        S0 = int(nchunks.sum())
        within = np.arange(S0, dtype=np.int64) - cum[step_run]
        c0 = run_starts[step_run] + within * _CH
        c1 = np.minimum(run_ends[step_run], c0 + _CH)
        sct = ct_s[c0] if S0 else np.empty(0, np.int64)
        sat = at_s[c0] if S0 else np.empty(0, np.int64)
        sbt = bt_s[c0] if S0 else np.empty(0, np.int64)
        # dummy steps so every C tile gets initialized
        missing = np.setdiff1d(np.arange(nc, dtype=np.int64), np.unique(sct),
                               assume_unique=True)
        if len(missing):
            sct = np.concatenate([sct, missing])
            sat = np.concatenate([sat, np.zeros(len(missing), np.int64)])
            sbt = np.concatenate([sbt, np.zeros(len(missing), np.int64)])
            c0 = np.concatenate([c0, np.zeros(len(missing), np.int64)])
            c1 = np.concatenate([c1, np.zeros(len(missing), np.int64)])
            reorder = np.argsort(sct, kind="stable")
            sct, sat, sbt = sct[reorder], sat[reorder], sbt[reorder]
            c0, c1 = c0[reorder], c1[reorder]
        S = len(sct)
        idx = c0[:, None] + np.arange(_CH, dtype=np.int64)[None, :]
        mask = idx < c1[:, None]
        idxc = np.minimum(idx, max(0, P - 1))
        if P:
            a_loc = np.where(mask, a_s[idxc] - sat[:, None] * _BLK, 0).astype(np.int32)
            b_loc = np.where(mask, b_s[idxc] - sbt[:, None] * _BLK, 0).astype(np.int32)
            c_loc = np.where(mask, c_s[idxc] - sct[:, None] * _CT, -1).astype(np.int32)
        else:
            a_loc = np.zeros((S, _CH), np.int32)
            b_loc = np.zeros((S, _CH), np.int32)
            c_loc = np.full((S, _CH), -1, np.int32)
        first = np.ones(S, np.int32)
        first[1:] = (sct[1:] != sct[:-1]).astype(np.int32)
        self.a_loc = jnp.asarray(a_loc.reshape(-1))
        self.b_loc = jnp.asarray(b_loc.reshape(-1))
        self.c_loc = jnp.asarray(c_loc.reshape(-1))
        self.at_ids = jnp.asarray(sat.astype(np.int32))
        self.bt_ids = jnp.asarray(sbt.astype(np.int32))
        self.ct_ids = jnp.asarray(sct.astype(np.int32))
        self.first = jnp.asarray(first)
        self.na_blocks, self.nb_blocks, self.nc_tiles = na, nb, nc
        self.nnz_c = nnz_c
        self.num_steps = S
        self.pad_ratio = S * _CH / max(1, P)

    def tree_flatten(self):
        aux = (self.na_blocks, self.nb_blocks, self.nc_tiles, self.nnz_c,
               self.num_steps, self.pad_ratio)
        return (self.a_loc, self.b_loc, self.c_loc, self.at_ids, self.bt_ids,
                self.ct_ids, self.first), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, None, None, 0, 0, 0, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(OnehotPairPlan)


class DlPairPlan:
    """Dst-lane-aligned pair schedule (see spmv_pallas.DlSpmvPlan): chunk
    slots are (8,128) tiles, slot lane == local C position % 128.  The C
    scatter is then a masked sublane reduction (no one-hot matmul, pure
    f32); pad slots carry crhi = -1 (matches no sublane).  Both value
    gathers keep per-slot-row one-hot lane routing."""

    def __init__(self, a_idx, b_idx, c_idx, nnz_a, nnz_b, nnz_c, *, _fields=None):
        if _fields is not None:
            (self.a_loc, self.b_loc, self.crhi, self.at_ids, self.bt_ids,
             self.ct_ids, self.first, self.ct_ss, self.first_ss,
             self.na_blocks, self.nb_blocks, self.nc_tiles, self.nnz_c,
             self.num_steps, self.n_ss, self.batch, self.pad_ratio) = _fields
            return
        a_idx = np.asarray(a_idx, dtype=np.int64)
        b_idx = np.asarray(b_idx, dtype=np.int64)
        c_idx = np.asarray(c_idx, dtype=np.int64)
        P = len(c_idx)
        na = max(1, -(-max(nnz_a, 1) // _BLK))
        nb = max(1, -(-max(nnz_b, 1) // _BLK))
        nc = max(1, -(-max(nnz_c, 1) // _CT))
        at = a_idx // _BLK
        bt = b_idx // _BLK
        ct = c_idx // _CT
        cl = c_idx - ct * _CT
        lc = cl % 128
        crhi = cl // 128
        run_key = (ct * na + at) * nb + bt
        if P:
            order, step_e, srow, rstart, nchunks, S0 = _dl_schedule(run_key, lc)
            lc_s = lc[order]
            crhi_s = crhi[order]
            aloc_s = (a_idx - at * _BLK)[order]
            bloc_s = (b_idx - bt * _BLK)[order]
            at_s, bt_s, ct_s = at[order], bt[order], ct[order]
            sat = np.repeat(at_s[rstart], nchunks)
            sbt = np.repeat(bt_s[rstart], nchunks)
            sct = np.repeat(ct_s[rstart], nchunks)
        else:
            step_e = srow = lc_s = crhi_s = aloc_s = bloc_s = np.empty(0, np.int64)
            sat = sbt = sct = np.empty(0, np.int64)
        missing = np.setdiff1d(np.arange(nc, dtype=np.int64), np.unique(sct),
                               assume_unique=True)
        if len(missing):
            sct = np.concatenate([sct, missing])
            sat = np.concatenate([sat, np.zeros(len(missing), np.int64)])
            sbt = np.concatenate([sbt, np.zeros(len(missing), np.int64)])
            reorder = np.argsort(sct, kind="stable")
            inv = np.empty_like(reorder)
            inv[reorder] = np.arange(len(reorder))
            step_e = inv[step_e]
            sct, sat, sbt = sct[reorder], sat[reorder], sbt[reorder]
        S = len(sct)
        a_loc = np.zeros((S, 8, 128), np.int32)
        b_loc = np.zeros((S, 8, 128), np.int32)
        crhi_a = np.full((S, 8, 128), -1, np.int32)
        if P:
            a_loc[step_e, srow, lc_s] = aloc_s.astype(np.int32)
            b_loc[step_e, srow, lc_s] = bloc_s.astype(np.int32)
            crhi_a[step_e, srow, lc_s] = crhi_s.astype(np.int32)

        # super-step schedule (kernel v6, see spmv_pallas): B chunks of one
        # C tile per grid step when BOTH padded value blocks fit VMEM
        counts = np.diff(np.concatenate((
            np.nonzero(np.concatenate(([1], (sct[1:] != sct[:-1])
                                       .astype(np.int64))))[0], [S])))
        resident = (na + nb) * _BLK * 4 <= _VALS_VMEM_CAP
        B = 1
        if resident and S:
            best = float("inf")
            for cand in (1, 2, 4, 8, 16):
                nss_c = int(np.ceil(counts / cand).sum())
                cost = nss_c * (_DL_FIX_US + cand * _DL_VAR_US)
                if cost < best:
                    best, B = cost, cand
        if B > 1:
            padc = (-counts) % B
            tot = counts + padc
            starts = np.concatenate(([0], np.cumsum(tot)))[:-1]
            gb = np.concatenate(([0], np.cumsum(counts)))
            gid = np.repeat(np.arange(len(counts)), tot)
            within = np.arange(int(tot.sum()), dtype=np.int64) - starts[gid]
            cidx = np.where(within < counts[gid], gb[gid] + within, S)
            a_loc = np.concatenate([a_loc, np.zeros((1, 8, 128), np.int32)])[cidx]
            b_loc = np.concatenate([b_loc, np.zeros((1, 8, 128), np.int32)])[cidx]
            crhi_a = np.concatenate([crhi_a, np.full((1, 8, 128), -1, np.int32)])[cidx]
            sat = np.concatenate([sat, [0]])[cidx]
            sbt = np.concatenate([sbt, [0]])[cidx]
            sct = sct[gb[gid]]
            S = len(cidx)
        first = np.ones(S, np.int32)
        first[1:] = (sct[1:] != sct[:-1]).astype(np.int32)
        self.a_loc = jnp.asarray(a_loc.reshape(S * 8, 128))
        self.b_loc = jnp.asarray(b_loc.reshape(S * 8, 128))
        self.crhi = jnp.asarray(crhi_a.reshape(S * 8, 128))
        self.at_ids = jnp.asarray(sat.astype(np.int32))
        self.bt_ids = jnp.asarray(sbt.astype(np.int32))
        self.ct_ids = jnp.asarray(sct.astype(np.int32))
        self.first = jnp.asarray(first)
        self.ct_ss = jnp.asarray(sct[::B].astype(np.int32))
        self.first_ss = jnp.asarray(first[::B])
        self.na_blocks, self.nb_blocks, self.nc_tiles = na, nb, nc
        self.nnz_c = nnz_c
        self.num_steps = S
        self.n_ss = S // B
        self.batch = B
        self.pad_ratio = S * 1024 / max(1, P)

    def tree_flatten(self):
        aux = (self.na_blocks, self.nb_blocks, self.nc_tiles, self.nnz_c,
               self.num_steps, self.n_ss, self.batch, self.pad_ratio)
        return (self.a_loc, self.b_loc, self.crhi, self.at_ids, self.bt_ids,
                self.ct_ids, self.first, self.ct_ss, self.first_ss), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, None, None, 0, 0, 0, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(DlPairPlan)

# per-step cost on v5e (us), for the layout choice (measured lap300/rand50k)
_FLAT_PAIR_COST = 0.83
_DL_PAIR_COST = 0.12
# v6 super-step cost model (shared shape with spmv_pallas; two gathers per
# chunk instead of one, hence the larger VAR)
_DL_FIX_US = 0.15
_DL_VAR_US = 0.11
# both padded value blocks must fit VMEM for the batched kernel (f32 bytes)
_VALS_VMEM_CAP = 8 * 2 ** 20


def build_onehot_pair_plan(pair_plan, nnz_a: int, nnz_b: int,
                           layout: str = "auto", max_pad: float = 16.0,
                           max_steps: int = 60_000):
    """From a spgemm PairPlan (pairs sorted by C position); picks the
    cheaper chunk layout by padded-step cost model.

    In "auto" mode the pad ratios are computed BEFORE construction (one
    sort pass) and None is returned when even the better layout exceeds
    `max_pad`/`max_steps` — scattered patterns would otherwise materialize
    multi-GB schedules just to be discarded.  max_steps also respects the
    SMEM prefetch-table limit: the per-chunk at/bt tables are prefetched
    SMEM operands capped at 1MB each (measured: 357k-chunk schedule fails
    AOT with 'prefetched SMEM operand' allocation error), and the v6 kernel
    beats the XLA pair path (~8.5us/1024 gathers) up to pad~60, so the pad
    gate is schedule-memory-bound, not compute-bound."""
    a_idx = np.asarray(pair_plan.a_idx)
    b_idx = np.asarray(pair_plan.b_idx)
    c_idx = np.asarray(pair_plan.c_idx)
    args = (a_idx, b_idx, c_idx, nnz_a, nnz_b, pair_plan.nnz_c)
    if layout == "flat":
        return OnehotPairPlan(*args)
    if layout == "dstlane":
        return DlPairPlan(*args)
    P = len(c_idx)
    if P == 0:
        return OnehotPairPlan(*args)
    na = max(1, -(-max(nnz_a, 1) // _BLK))
    nb = max(1, -(-max(nnz_b, 1) // _BLK))
    ct = c_idx.astype(np.int64) // _CT
    run = (ct * na + (a_idx.astype(np.int64) // _BLK)) * nb \
        + b_idx.astype(np.int64) // _BLK
    lc = (c_idx.astype(np.int64) - ct * _CT) % 128
    grp = np.sort(run * 128 + lc)
    gb = np.concatenate(([1], (np.diff(grp) != 0).astype(np.int64)))
    gcnt = np.diff(np.concatenate((np.nonzero(gb)[0], [P])))
    grun = grp[gb.astype(bool)] // 128
    rstarts = np.nonzero(np.concatenate(([1], np.diff(grun) != 0)))[0]
    rcnt = np.add.reduceat(gcnt, rstarts)  # groups are run-contiguous
    steps_flat = int(np.ceil(rcnt / _CH).sum())
    pad_flat = steps_flat * _CH / P
    cmax = np.maximum.reduceat(-(-gcnt // 8), rstarts)
    steps_dl = int(cmax.sum())
    pad_dl = steps_dl * 1024 / P
    use_dl = pad_dl * _DL_PAIR_COST <= pad_flat * _FLAT_PAIR_COST
    pad, steps = (pad_dl, steps_dl) if use_dl else (pad_flat, steps_flat)
    if pad > max_pad or steps > max_steps:
        return None
    if use_dl and (na + nb) * _BLK * 4 <= _VALS_VMEM_CAP:
        gt = GtPairPlan(*args)     # v7 g-table gathers (values VMEM-resident)
        # conflicts on BOTH gathers can inflate gt padding on scattered
        # patterns; the gt kernel is ~1.9x cheaper per chunk (measured
        # lap300: 0.124 vs 0.165 us/chunk + worse DL B at small C tiles),
        # so keep gt unless its padding outgrows dl by more than that
        if gt.num_steps <= 1.8 * steps_dl:
            return gt
    return DlPairPlan(*args) if use_dl else OnehotPairPlan(*args)


def _radix_gather(win, loc):
    """win: (_SR,128) VMEM block; loc: (1,CH) int32 -> (1,CH) f32 values.
    v3: 3-plane bf16 lane-routing matmul + per-vreg sublane dynamic_gather."""
    hi = loc // 128
    lo = loc % 128
    ch = loc.shape[1]
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, ch), 0) == lo
             ).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    u = sum(jax.lax.dot_general(p, oh_lo, dn,
                                preferred_element_type=jnp.float32)
            for p in _bf16_planes3(win))                              # (_SR,CH)
    return _sublane_gather(u, hi, _SR, ch)                            # (1,CH)


@functools.partial(jax.jit, static_argnames=("na", "nb", "nc", "num_steps",
                                             "nnz_c", "interpret"))
def _onehot_pair_call(at_ids, bt_ids, ct_ids, first, a_loc, b_loc, c_loc,
                      a_vals, b_vals, *, na, nb, nc, num_steps, nnz_c, interpret):
    CH = _CH
    av = jnp.pad(a_vals.astype(jnp.float32),
                 (0, na * _BLK - a_vals.shape[0])).reshape(na * _SR, 128)
    bv = jnp.pad(b_vals.astype(jnp.float32),
                 (0, nb * _BLK - b_vals.shape[0])).reshape(nb * _SR, 128)

    def kernel(at_ref, bt_ref, ct_ref, first_ref, aloc_ref, bloc_ref,
               cloc_ref, av_ref, bv_ref, c_ref):
        g = pl.program_id(0)
        a = _radix_gather(av_ref[:], aloc_ref[:].reshape(1, CH))
        b = _radix_gather(bv_ref[:], bloc_ref[:].reshape(1, CH))
        pv = a * b
        cl = cloc_ref[:].reshape(1, CH)
        rhi = cl // 128           # pad slots: -1//128 = -1 -> no one-hot row
        rlo = cl % 128
        cmpb = (jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0) == rlo
                ).astype(jnp.bfloat16)
        oh_rhi = (jax.lax.broadcasted_iota(jnp.int32, (8, CH), 0) == rhi
                  ).astype(jnp.bfloat16)
        dn2 = (((1,), (1,)), ((), ()))
        # value planes on the small (8,CH) operand (see spmv_pallas note)
        contrib = sum(jax.lax.dot_general(oh_rhi * p, cmpb, dn2,
                                          preferred_element_type=jnp.float32)
                      for p in _bf16_planes3(pv))

        @pl.when(first_ref[g] == 1)
        def _():
            c_ref[:, :] = contrib

        @pl.when(first_ref[g] == 0)
        def _():
            c_ref[:, :] = c_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((CH,), lambda g, a, b, c, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, a, b, c, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, a, b, c, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SR, 128), lambda g, a, b, c, f: (a[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SR, 128), lambda g, a, b, c, f: (b[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, a, b, c, f: (c[g], 0),
                               memory_space=pltpu.VMEM),
    )
    cv = pl.pallas_call(
        kernel,
        name="tpukk_spgemm_pair_flat",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc * 8, 128), jnp.float32),
        interpret=interpret,
    )(at_ids, bt_ids, ct_ids, first, a_loc, b_loc, c_loc, av, bv)
    return cv.reshape(nc * _CT)[:nnz_c]


@functools.partial(jax.jit, static_argnames=("na", "nb", "nc", "num_steps",
                                             "nnz_c", "interpret"))
def _dl_pair_call(at_ids, bt_ids, ct_ids, first, a_loc, b_loc, crhi,
                  a_vals, b_vals, *, na, nb, nc, num_steps, nnz_c, interpret):
    av = jnp.pad(a_vals.astype(jnp.float32),
                 (0, na * _BLK - a_vals.shape[0])).reshape(na * _SR, 128)
    bv = jnp.pad(b_vals.astype(jnp.float32),
                 (0, nb * _BLK - b_vals.shape[0])).reshape(nb * _SR, 128)

    def kernel(at_ref, bt_ref, ct_ref, first_ref, aloc_ref, bloc_ref,
               crhi_ref, av_ref, bv_ref, c_ref):
        g = pl.program_id(0)
        aloc2, bloc2, crhi2 = aloc_ref[:], bloc_ref[:], crhi_ref[:]
        # v5: lane-axis dynamic_gather (see spmv_pallas._gather_rows) — no
        # one-hot matmuls, no bf16 planes, pure f32
        a = _gather_rows(av_ref[:], aloc2 % 128, aloc2 // 128, _SR)
        b = _gather_rows(bv_ref[:], bloc2 % 128, bloc2 // 128, _SR)
        pv = a * b                                             # (8,128)
        crows = [jnp.sum(jnp.where(crhi2 == d, pv, 0.0), axis=0, keepdims=True)
                 for d in range(8)]
        contrib = jnp.concatenate(crows, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            c_ref[:, :] = contrib

        @pl.when(first_ref[g] == 0)
        def _():
            c_ref[:, :] = c_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SR, 128), lambda g, a, b, c, f: (a[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SR, 128), lambda g, a, b, c, f: (b[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, a, b, c, f: (c[g], 0),
                               memory_space=pltpu.VMEM),
    )
    cv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spgemm_pair_dl",
        out_shape=jax.ShapeDtypeStruct((nc * 8, 128), jnp.float32),
        interpret=interpret,
    )(at_ids, bt_ids, ct_ids, first, a_loc, b_loc, crhi, av, bv)
    return cv.reshape(nc * _CT)[:nnz_c]


@functools.partial(jax.jit, static_argnames=("na", "nb", "nc", "n_ss", "B",
                                             "nnz_c", "interpret"))
def _dl_pair_call_batched(at_ids, bt_ids, ct_ss, first_ss, a_loc, b_loc, crhi,
                          a_vals, b_vals, *, na, nb, nc, n_ss, B, nnz_c,
                          interpret):
    """Kernel v6 for pairs: one grid step = B chunks of ONE C tile, A/B value
    blocks fully VMEM-resident, per-chunk pl.ds window slices (see
    spmv_pallas._dl_call_batched)."""
    av = jnp.pad(a_vals.astype(jnp.float32),
                 (0, na * _BLK - a_vals.shape[0])).reshape(na * _SR, 128)
    bv = jnp.pad(b_vals.astype(jnp.float32),
                 (0, nb * _BLK - b_vals.shape[0])).reshape(nb * _SR, 128)

    def kernel(at_ref, bt_ref, ct_ref, first_ref, aloc_ref, bloc_ref,
               crhi_ref, av_ref, bv_ref, c_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            at = at_ref[g * B + j]
            bt = bt_ref[g * B + j]
            AW = av_ref[pl.ds(at * _SR, _SR), :]
            BW = bv_ref[pl.ds(bt * _SR, _SR), :]
            aloc2 = aloc_ref[j * 8:(j + 1) * 8, :]
            bloc2 = bloc_ref[j * 8:(j + 1) * 8, :]
            crhi2 = crhi_ref[j * 8:(j + 1) * 8, :]
            a = _gather_rows(AW, aloc2 % 128, aloc2 // 128, _SR)
            b = _gather_rows(BW, bloc2 % 128, bloc2 // 128, _SR)
            pv = a * b
            crows = [jnp.sum(jnp.where(crhi2 == d, pv, 0.0), axis=0,
                             keepdims=True) for d in range(8)]
            acc = acc + jnp.concatenate(crows, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            c_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            c_ref[:, :] = c_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # av resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bv resident
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, a, b, c, f: (c[g], 0),
                               memory_space=pltpu.VMEM),
    )
    cv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spgemm_pair_dl_ss",
        out_shape=jax.ShapeDtypeStruct((nc * 8, 128), jnp.float32),
        interpret=interpret,
    )(at_ids, bt_ids, ct_ss, first_ss, a_loc, b_loc, crhi, av, bv)
    return cv.reshape(nc * _CT)[:nnz_c]


def onehot_pair_numeric(plan, a_vals, b_vals, interpret: bool = False):
    """C.values for the planned product, f32."""
    if isinstance(plan, GtPairPlan) and getattr(plan, "layout", "legacy") == "pk":
        return _gtp_pk_call(
            plan.at_ids, plan.bt_ids, plan.ct_ss, plan.first_ss,
            plan.a_lo, plan.b_lo, plan.crhi, a_vals, b_vals,
            na=plan.na_blocks, nb=plan.nb_blocks, nc=plan.nc_tiles,
            n_ss=plan.n_ss, B=plan.batch, nnz_c=plan.nnz_c,
            interpret=interpret)
    if isinstance(plan, GtPairPlan):
        return _gt_pair_call(
            plan.at_ids, plan.bt_ids, plan.ct_ss, plan.first_ss,
            plan.a_lo, plan.b_lo, plan.gta, plan.gtb, plan.crhi,
            a_vals, b_vals, na=plan.na_blocks, nb=plan.nb_blocks,
            nc=plan.nc_tiles, n_ss=plan.n_ss, B=plan.batch,
            T=plan.n_tables, nnz_c=plan.nnz_c, interpret=interpret)
    if isinstance(plan, DlPairPlan) and getattr(plan, "batch", 1) > 1:
        return _dl_pair_call_batched(
            plan.at_ids, plan.bt_ids, plan.ct_ss, plan.first_ss,
            plan.a_loc, plan.b_loc, plan.crhi, a_vals, b_vals,
            na=plan.na_blocks, nb=plan.nb_blocks, nc=plan.nc_tiles,
            n_ss=plan.n_ss, B=plan.batch, nnz_c=plan.nnz_c,
            interpret=interpret)
    if isinstance(plan, DlPairPlan):
        return _dl_pair_call(plan.at_ids, plan.bt_ids, plan.ct_ids, plan.first,
                             plan.a_loc, plan.b_loc, plan.crhi,
                             a_vals, b_vals,
                             na=plan.na_blocks, nb=plan.nb_blocks,
                             nc=plan.nc_tiles, num_steps=plan.num_steps,
                             nnz_c=plan.nnz_c, interpret=interpret)
    return _onehot_pair_call(plan.at_ids, plan.bt_ids, plan.ct_ids, plan.first,
                             plan.a_loc, plan.b_loc, plan.c_loc,
                             a_vals, b_vals,
                             na=plan.na_blocks, nb=plan.nb_blocks,
                             nc=plan.nc_tiles, num_steps=plan.num_steps,
                             nnz_c=plan.nnz_c, interpret=interpret)


# ---------------------------------------------------------------------------
# Pair kernel v7: host-emitted gather tables for BOTH value gathers (see
# spmv_pallas kernel v7).  A slot needs gtA[s, aLane] == aRow and
# gtB[s, bLane] == bRow; T tables per side tolerate T distinct rows per
# (chunk, sublane, lane) cell, overflow reschedules in levels, and a final
# level keyed by (run, aRow, bRow) is conflict-free by construction.

from .spmv_pallas import _gt_gather

_GTP_LEVELS = 5
_GTP_FIX_US = 0.15
_GTP_VAR_US = 0.0145  # per table-side per chunk (fitted: lap300 T=3 B=4 -> 0.087/chunk)
_GTP_VAR_PK_US = 0.030  # pk path per chunk: 2 packed gathers + 8-way scatter


def _rank_in_cell(cell, hi):
    """Group elements by (cell, hi); return per-element rank of its group
    within its cell, ranked by group size (0 = largest)."""
    n = len(cell)
    pair = cell * 64 + hi
    po = np.argsort(pair, kind="stable")
    pp = pair[po]
    pfirst = np.concatenate(([1], (np.diff(pp) != 0).astype(np.int64)))
    gid = np.cumsum(pfirst) - 1
    gsize = np.bincount(gid)
    cells = pp[pfirst.astype(bool)] // 64
    go = np.lexsort((-gsize, cells))
    cf = np.concatenate(([1], (np.diff(cells[go]) != 0).astype(np.int64)))
    rank_go = np.arange(len(go)) - np.nonzero(cf)[0][np.cumsum(cf) - 1]
    grank = np.empty(len(gsize), np.int64)
    grank[go] = rank_go
    r = np.empty(n, np.int64)
    r[po] = grank[gid]
    return r


def _gtp_level(run_key, lc, crhi_e, aloc_e, bloc_e, dt_e, at_e, bt_e, T):
    """One v7 pair level.  Returns (aLo_a, bLo_a, gtA, gtB, crhi_a, emap_a,
    sct, sat, sbt, overflow_mask)."""
    n = len(run_key)
    order, step_e, srow, rstart, nchunks, S = _dl_schedule(run_key, lc)
    alo_s = (aloc_e % 128)[order]
    ahi_s = (aloc_e // 128)[order]
    blo_s = (bloc_e % 128)[order]
    bhi_s = (bloc_e // 128)[order]
    cell = (step_e * 8 + srow) * 128
    rA = _rank_in_cell(cell + alo_s, ahi_s)
    rB = _rank_in_cell(cell + blo_s, bhi_s)
    keep = (rA < T) & (rB < T)
    aLo_a = np.zeros((S, 8, 128), np.int32)
    bLo_a = np.zeros((S, 8, 128), np.int32)
    gtA = np.zeros((S, T, 8, 128), np.int32)
    gtB = np.zeros((S, T, 8, 128), np.int32)
    crhi_a = np.full((S, 8, 128), -1, np.int32)
    se, sr, lcs = step_e[keep], srow[keep], lc[order][keep]
    aLo_a[se, sr, lcs] = (rA[keep] * 128 + alo_s[keep]).astype(np.int32)
    bLo_a[se, sr, lcs] = (rB[keep] * 128 + blo_s[keep]).astype(np.int32)
    gtA[se, rA[keep], sr, alo_s[keep]] = ahi_s[keep].astype(np.int32)
    gtB[se, rB[keep], sr, blo_s[keep]] = bhi_s[keep].astype(np.int32)
    crhi_a[se, sr, lcs] = crhi_e[order][keep].astype(np.int32)
    sct = np.repeat(dt_e[order][rstart], nchunks)
    sat = np.repeat(at_e[order][rstart], nchunks)
    sbt = np.repeat(bt_e[order][rstart], nchunks)
    ovf = np.zeros(n, bool)
    ovf[order] = ~keep
    return aLo_a, bLo_a, gtA, gtB, crhi_a, sct, sat, sbt, ovf


class GtPairPlan:
    """v7 pair plan: g-table gathers for A and B values + super-steps.
    Requires both padded value blocks VMEM-resident."""

    def __init__(self, a_idx, b_idx, c_idx, nnz_a, nnz_b, nnz_c, *, _fields=None):
        if _fields is not None:
            (self.a_lo, self.b_lo, self.gta, self.gtb, self.crhi,
             self.at_ids, self.bt_ids, self.ct_ss, self.first_ss,
             self.na_blocks, self.nb_blocks, self.nc_tiles, self.nnz_c,
             self.num_steps, self.n_ss, self.batch, self.pad_ratio,
             self.n_levels, self.n_tables, self.layout) = _fields
            return
        a_idx = np.asarray(a_idx, dtype=np.int64)
        b_idx = np.asarray(b_idx, dtype=np.int64)
        c_idx = np.asarray(c_idx, dtype=np.int64)
        P = len(c_idx)
        SR = _SR
        na = max(1, -(-max(nnz_a, 1) // _BLK))
        nb = max(1, -(-max(nnz_b, 1) // _BLK))
        nc = max(1, -(-max(nnz_c, 1) // _CT))
        at = a_idx // _BLK
        bt = b_idx // _BLK
        ct = c_idx // _CT
        cl = c_idx - ct * _CT
        lc = cl % 128
        crhi = cl // 128
        aloc = a_idx - at * _BLK
        bloc = b_idx - bt * _BLK
        run = (ct * na + at) * nb + bt

        # v9 "pk" fast path: C++ dual-cell placement at T=1
        # (tpukk_gt_place2) + packed gt|lo streams for BOTH value gathers
        # (_pk_gather: 6.9ns vs 14.3ns per (8,128) chunk, probe round 2) —
        # the same v9 treatment the SpMV plan got in round 2, applied to
        # the pair kernel (round-3 verdict: spgemm numeric perf).
        if P and not int(os.environ.get("TPUKK_NO_PK_PAIR", "0")):
            pk = self._try_pk_build(run, lc, crhi, aloc, bloc, ct, at, bt,
                                    na, nb, nc, nnz_c, P)
            if pk:
                return

        # T selection: smallest with first-level combined overflow <= 0.5%
        T = 3
        if P:
            order0, step0, srow0, _, _, _ = _dl_schedule(run, lc)
            cell0 = (step0 * 8 + srow0) * 128
            rA0 = _rank_in_cell(cell0 + (aloc % 128)[order0], (aloc // 128)[order0])
            rB0 = _rank_in_cell(cell0 + (bloc % 128)[order0], (bloc // 128)[order0])
            for t in (1, 2, 3):
                if ((rA0 >= t) | (rB0 >= t)).mean() <= 0.005:
                    T = t
                    break

        parts = []
        rem = np.ones(P, bool) if P else np.zeros(0, bool)
        levels = 0
        for lvl in range(_GTP_LEVELS + 1):
            if not rem.any():
                break
            idx = np.nonzero(rem)[0]
            key = (run[idx] if lvl < _GTP_LEVELS
                   else (run[idx] * SR + aloc[idx] // 128) * SR + bloc[idx] // 128)
            out = _gtp_level(key, lc[idx], crhi[idx], aloc[idx], bloc[idx],
                             ct[idx], at[idx], bt[idx], T)
            parts.append(out[:8])
            levels += 1
            rem2 = np.zeros(P, bool)
            rem2[idx[out[8]]] = True
            rem = rem2
        if parts:
            aLo = np.concatenate([p[0] for p in parts])
            bLo = np.concatenate([p[1] for p in parts])
            gtA = np.concatenate([p[2] for p in parts])
            gtB = np.concatenate([p[3] for p in parts])
            crhi_a = np.concatenate([p[4] for p in parts])
            sct = np.concatenate([p[5] for p in parts])
            sat = np.concatenate([p[6] for p in parts])
            sbt = np.concatenate([p[7] for p in parts])
        else:
            aLo = bLo = np.zeros((0, 8, 128), np.int32)
            gtA = gtB = np.zeros((0, T, 8, 128), np.int32)
            crhi_a = np.full((0, 8, 128), -1, np.int32)
            sct = sat = sbt = np.zeros(0, np.int64)
        missing = np.setdiff1d(np.arange(nc, dtype=np.int64), np.unique(sct),
                               assume_unique=True)
        if len(missing):
            nm = len(missing)
            sct = np.concatenate([sct, missing])
            sat = np.concatenate([sat, np.zeros(nm, np.int64)])
            sbt = np.concatenate([sbt, np.zeros(nm, np.int64)])
            aLo = np.concatenate([aLo, np.zeros((nm, 8, 128), np.int32)])
            bLo = np.concatenate([bLo, np.zeros((nm, 8, 128), np.int32)])
            gtA = np.concatenate([gtA, np.zeros((nm, T, 8, 128), np.int32)])
            gtB = np.concatenate([gtB, np.zeros((nm, T, 8, 128), np.int32)])
            crhi_a = np.concatenate([crhi_a, np.full((nm, 8, 128), -1, np.int32)])
        ordc = np.argsort(sct, kind="stable")
        sct, sat, sbt = sct[ordc], sat[ordc], sbt[ordc]
        aLo, bLo, gtA, gtB, crhi_a = (aLo[ordc], bLo[ordc], gtA[ordc],
                                      gtB[ordc], crhi_a[ordc])
        S = len(sct)

        counts = np.diff(np.concatenate((
            np.nonzero(np.concatenate(([1], (sct[1:] != sct[:-1])
                                       .astype(np.int64))))[0], [S])))
        B = 1
        best = float("inf")
        var = 2 * _GTP_VAR_US * T
        for cand in (1, 2, 4, 8, 16, 32):
            nss_c = int(np.ceil(counts / cand).sum())
            cost = nss_c * (_GTP_FIX_US + cand * var)
            if cost < best:
                best, B = cost, cand
        if B > 1:
            padc = (-counts) % B
            tot = counts + padc
            starts = np.concatenate(([0], np.cumsum(tot)))[:-1]
            gb = np.concatenate(([0], np.cumsum(counts)))
            gid = np.repeat(np.arange(len(counts)), tot)
            within = np.arange(int(tot.sum()), dtype=np.int64) - starts[gid]
            cidx = np.where(within < counts[gid], gb[gid] + within, S)
            aLo = np.concatenate([aLo, np.zeros((1, 8, 128), np.int32)])[cidx]
            bLo = np.concatenate([bLo, np.zeros((1, 8, 128), np.int32)])[cidx]
            gtA = np.concatenate([gtA, np.zeros((1, T, 8, 128), np.int32)])[cidx]
            gtB = np.concatenate([gtB, np.zeros((1, T, 8, 128), np.int32)])[cidx]
            crhi_a = np.concatenate([crhi_a, np.full((1, 8, 128), -1, np.int32)])[cidx]
            sat = np.concatenate([sat, [0]])[cidx]
            sbt = np.concatenate([sbt, [0]])[cidx]
            sct = sct[gb[gid]]
            S = len(cidx)
        first = np.ones(S, np.int32)
        first[1:] = (sct[1:] != sct[:-1]).astype(np.int32)
        self.a_lo = jnp.asarray(aLo.reshape(S * 8, 128))
        self.b_lo = jnp.asarray(bLo.reshape(S * 8, 128))
        self.gta = jnp.asarray(gtA.reshape(S * T * 8, 128))
        self.gtb = jnp.asarray(gtB.reshape(S * T * 8, 128))
        self.crhi = jnp.asarray(crhi_a.reshape(S * 8, 128))
        self.at_ids = jnp.asarray(sat.astype(np.int32))
        self.bt_ids = jnp.asarray(sbt.astype(np.int32))
        self.ct_ss = jnp.asarray(sct[::B].astype(np.int32))
        self.first_ss = jnp.asarray(first[::B])
        self.na_blocks, self.nb_blocks, self.nc_tiles = na, nb, nc
        self.nnz_c = nnz_c
        self.num_steps = S
        self.n_ss = S // B
        self.batch = B
        self.pad_ratio = S * 1024 / max(1, P)
        self.n_levels = levels
        self.n_tables = T
        self.layout = "legacy"

    def _try_pk_build(self, run, lc, crhi, aloc, bloc, ct, at, bt,
                      na, nb, nc, nnz_c, P) -> bool:
        """Single-table native placement + packed streams; False on
        unavailability/overflow (caller falls back to the legacy levels)."""
        res = GtPairPlan._pk_streams_body(run, lc, crhi, aloc, bloc,
                                          na, nb, nc, P, None)
        if res is None:
            return False
        self.a_lo = jnp.asarray(res["pkA"])
        self.b_lo = jnp.asarray(res["pkB"])
        self.gta = jnp.zeros((1, 128), jnp.int32)
        self.gtb = jnp.zeros((1, 128), jnp.int32)
        self.crhi = jnp.asarray(res["crhi"])
        self.at_ids = jnp.asarray(res["at_ids"])
        self.bt_ids = jnp.asarray(res["bt_ids"])
        self.ct_ss = jnp.asarray(res["ct_ss"])
        self.first_ss = jnp.asarray(res["first_ss"])
        self.na_blocks, self.nb_blocks, self.nc_tiles = na, nb, nc
        self.nnz_c = nnz_c
        self.num_steps = res["S"]
        self.n_ss = res["n_ss"]
        self.batch = res["B"]
        self.pad_ratio = res["S"] * 1024 / max(1, P)
        self.n_levels = 1
        self.n_tables = 1
        self.layout = "pk"
        return True

    @staticmethod
    def _pk_streams_body(run, lc, crhi, aloc, bloc, na, nb, nc, P,
                         force_batch):
        """Host-side pk stream build (shared by the device plan above and
        the ring-SpGEMM stacked builder): returns a dict of HOST numpy
        streams + meta, or None on placer unavailability/overflow."""
        from .. import native

        if not native.available():
            return None
        # cluster same-source pairs within a run so the placer's table-reuse
        # pass sees them consecutively (aloc/bloc < _BLK = 2^12)
        key = (run << 24) | (aloc << 12) | bloc
        order = np.argsort(key, kind="stable")
        run_s = run[order]
        rfirst = np.concatenate(([1], (np.diff(run_s) != 0).astype(np.int64)))
        rstart = np.nonzero(rfirst)[0]
        run_off = np.concatenate((rstart, [P]))
        loA = (aloc % 128)[order].astype(np.int32)
        hiA = (aloc // 128)[order].astype(np.int32)
        loB = (bloc % 128)[order].astype(np.int32)
        hiB = (bloc // 128)[order].astype(np.int32)
        res = native.gt_place2(run_off, lc[order].astype(np.int32),
                               loA, hiA, loB, hiB, 1, 8)
        if res is None:
            return None
        c, s, _, _, nch = res
        if (c < 0).any():
            return None
        base = np.concatenate(([0], np.cumsum(nch.astype(np.int64))))
        rid = np.cumsum(rfirst) - 1
        chunk = base[rid] + c
        S_real = int(base[-1])
        crhi_a = np.full(S_real * 1024, -1, np.int32)
        rowb = (chunk * 8 + s) * 128
        lane_o = lc[order].astype(np.int64)

        def pack(lo_v, hi_v):
            # lo at the (unique) slot lane, hi<<7 at the source lane: two
            # plain fancy assignments (hi collisions all carry the same
            # value — the <=T-distinct-hi cell cap) OR'd together
            lo_pl = np.zeros(S_real * 1024, np.int32)
            hi_pl = np.zeros(S_real * 1024, np.int32)
            lo_pl[rowb + lane_o] = lo_v
            hi_pl[rowb + lo_v] = hi_v << 7
            return lo_pl | hi_pl

        pkA = pack(loA, hiA)
        pkB = pack(loB, hiB)
        crhi_a[rowb + lane_o] = crhi[order]
        # chunk -> (ct, at, bt); runs sorted ascending => ct-major order
        run_u = run_s[rstart]
        ch_run = np.repeat(run_u, nch)
        ch_ct = ch_run // (na * nb)
        ch_at = (ch_run // nb) % na
        ch_bt = ch_run % nb
        # merge missing-ct-tile dummies in sorted position
        missing = np.setdiff1d(np.arange(nc, dtype=np.int64),
                               np.unique(ch_ct), assume_unique=True)
        if len(missing):
            nm = len(missing)
            ins = np.searchsorted(ch_ct, missing)
            ch_ct = np.insert(ch_ct, ins, missing)
            ch_at = np.insert(ch_at, ins, 0)
            ch_bt = np.insert(ch_bt, ins, 0)
            old = np.delete(np.arange(len(ch_ct)),
                            ins + np.arange(nm))  # positions of real chunks
            pkA = pkA.reshape(-1, 1024)
            pkB = pkB.reshape(-1, 1024)
            crhi_a = crhi_a.reshape(-1, 1024)
            pkA2 = np.zeros((len(ch_ct), 1024), np.int32)
            pkB2 = np.zeros((len(ch_ct), 1024), np.int32)
            cr2 = np.full((len(ch_ct), 1024), -1, np.int32)
            pkA2[old], pkB2[old], cr2[old] = pkA, pkB, crhi_a
            pkA, pkB, crhi_a = (pkA2.reshape(-1), pkB2.reshape(-1),
                                cr2.reshape(-1))
        S = len(ch_ct)
        # 4-tile output grouping (the gi4 trick): the (32,128) output block
        # covers FOUR c-tiles, so B amortizes the ~0.15us step floor over
        # the whole block's chunks (lap300: ~4.4 chunks/tile -> ~17/block)
        gids = ch_ct // 4
        sub = (ch_ct & 3).astype(np.int64)
        counts = np.diff(np.concatenate((
            np.nonzero(np.concatenate(([1], (gids[1:] != gids[:-1])
                                       .astype(np.int64))))[0], [S])))
        if force_batch is not None:
            B = int(force_batch)
        else:
            B = 1
            best = float("inf")
            for cand in (1, 2, 4, 8, 16, 32):
                nss_c = int(np.ceil(counts / cand).sum())
                cost = nss_c * (_GTP_FIX_US + cand * _GTP_VAR_PK_US)
                if cost < best:
                    best, B = cost, cand
        pkA = pkA.reshape(-1, 1024)
        pkB = pkB.reshape(-1, 1024)
        crhi_a = crhi_a.reshape(-1, 1024)
        if B > 1:
            padc = (-counts) % B
            tot = counts + padc
            starts = np.concatenate(([0], np.cumsum(tot)))[:-1]
            gb = np.concatenate(([0], np.cumsum(counts)))
            gid = np.repeat(np.arange(len(counts)), tot)
            within = np.arange(int(tot.sum()), dtype=np.int64) - starts[gid]
            cidx = np.where(within < counts[gid], gb[gid] + within, S)
            pkA = np.concatenate([pkA, np.zeros((1, 1024), np.int32)])[cidx]
            pkB = np.concatenate([pkB, np.zeros((1, 1024), np.int32)])[cidx]
            crhi_a = np.concatenate(
                [crhi_a, np.full((1, 1024), -1, np.int32)])[cidx]
            ch_at = np.concatenate([ch_at, [0]])[cidx]
            ch_bt = np.concatenate([ch_bt, [0]])[cidx]
            sub = np.concatenate([sub, [0]])[cidx]
            gids = gids[gb[gid]]
            S = len(cidx)
        else:
            gids = gids
        gss = gids[::B]
        first = np.ones(len(gss), np.int32)
        first[1:] = (gss[1:] != gss[:-1]).astype(np.int32)
        return {"pkA": pkA.reshape(S * 8, 128),
                "pkB": pkB.reshape(S * 8, 128),
                "crhi": crhi_a.reshape(S * 8, 128),
                # per-chunk c-quarter packed into at's low bits (gi4 trick)
                "at_ids": ((ch_at << 2) | sub).astype(np.int32),
                "bt_ids": ch_bt.astype(np.int32),
                "ct_ss": gss.astype(np.int32),   # per-ss OUTPUT BLOCK id
                "first_ss": first,
                "S": S, "n_ss": S // B, "B": B}

    def tree_flatten(self):
        aux = (self.na_blocks, self.nb_blocks, self.nc_tiles, self.nnz_c,
               self.num_steps, self.n_ss, self.batch, self.pad_ratio,
               self.n_levels, self.n_tables, self.layout)
        return (self.a_lo, self.b_lo, self.gta, self.gtb, self.crhi,
                self.at_ids, self.bt_ids, self.ct_ss, self.first_ss), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, None, None, 0, 0, 0, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(GtPairPlan)


def build_pk_pair_streams_host(a_idx, b_idx, c_idx, nnz_a, nnz_b, nnz_c,
                               force_batch=None):
    """HOST pk pair streams for (a_idx, b_idx, c_idx) — no device transfer;
    used by dist ring-SpGEMM to stack per-(part, step) stream sets.  Returns
    dict + meta (with nc) or None."""
    a_idx = np.asarray(a_idx, dtype=np.int64)
    b_idx = np.asarray(b_idx, dtype=np.int64)
    c_idx = np.asarray(c_idx, dtype=np.int64)
    P = len(c_idx)
    na = max(1, -(-max(nnz_a, 1) // _BLK))
    nb = max(1, -(-max(nnz_b, 1) // _BLK))
    nc = max(1, -(-max(nnz_c, 1) // _CT))
    if P == 0:
        # degenerate: one dummy block so the stacked kernel has >= 1 step
        B = int(force_batch or 1)
        return {"pkA": np.zeros((B * 8, 128), np.int32),
                "pkB": np.zeros((B * 8, 128), np.int32),
                "crhi": np.full((B * 8, 128), -1, np.int32),
                "at_ids": np.zeros(B, np.int32),
                "bt_ids": np.zeros(B, np.int32),
                "ct_ss": np.zeros(1, np.int32),
                "first_ss": np.ones(1, np.int32),
                "S": B, "n_ss": 1, "B": B, "nc": nc}
    at = a_idx // _BLK
    bt = b_idx // _BLK
    ct = c_idx // _CT
    cl = c_idx - ct * _CT
    lc = cl % 128
    crhi = cl // 128
    aloc = a_idx - at * _BLK
    bloc = b_idx - bt * _BLK
    run = (ct * na + at) * nb + bt
    res = GtPairPlan._pk_streams_body(run, lc, crhi, aloc, bloc,
                                      na, nb, nc, P, force_batch)
    if res is not None:
        res["nc"] = nc
    return res


@functools.partial(jax.jit, static_argnames=("na", "nb", "nc", "n_ss", "B",
                                             "T", "nnz_c", "interpret"))
def _gt_pair_call(at_ids, bt_ids, ct_ss, first_ss, a_lo, b_lo, gta, gtb,
                  crhi, a_vals, b_vals, *, na, nb, nc, n_ss, B, T, nnz_c,
                  interpret):
    av = jnp.pad(a_vals.astype(jnp.float32),
                 (0, na * _BLK - a_vals.shape[0])).reshape(na * _SR, 128)
    bv = jnp.pad(b_vals.astype(jnp.float32),
                 (0, nb * _BLK - b_vals.shape[0])).reshape(nb * _SR, 128)

    def kernel(at_ref, bt_ref, ct_ref, first_ref, alo_ref, blo_ref,
               gta_ref, gtb_ref, crhi_ref, av_ref, bv_ref, c_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            at = at_ref[g * B + j]
            bt = bt_ref[g * B + j]
            sl = slice(j * 8, (j + 1) * 8)
            slT = slice(j * 8 * T, (j + 1) * 8 * T)
            a = _gt_gather(av_ref[pl.ds(at * _SR, _SR), :], gta_ref[slT, :],
                           alo_ref[sl, :], _SR, T)
            b = _gt_gather(bv_ref[pl.ds(bt * _SR, _SR), :], gtb_ref[slT, :],
                           blo_ref[sl, :], _SR, T)
            pv = a * b
            crhi2 = crhi_ref[sl, :]
            crows = [jnp.sum(jnp.where(crhi2 == d, pv, 0.0), axis=0,
                             keepdims=True) for d in range(8)]
            acc = acc + jnp.concatenate(crows, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            c_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            c_ref[:, :] = c_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * T * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * T * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, a, b, c, f: (c[g], 0),
                               memory_space=pltpu.VMEM),
    )
    cv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spgemm_pair_gt",
        out_shape=jax.ShapeDtypeStruct((nc * 8, 128), jnp.float32),
        interpret=interpret,
    )(at_ids, bt_ids, ct_ss, first_ss, a_lo, b_lo, gta, gtb, crhi, av, bv)
    return cv.reshape(nc * _CT)[:nnz_c]


@functools.partial(jax.jit, static_argnames=("na", "nb", "nc", "n_ss", "B",
                                             "nnz_c", "interpret"))
def _gtp_pk_call(at_ids, bt_ids, ct_ss, first_ss, pkA, pkB, crhi,
                 a_vals, b_vals, *, na, nb, nc, n_ss, B, nnz_c, interpret):
    """v9 pair kernel: BOTH value gathers through the packed pk streams
    (_pk_gather — 2 streams/chunk/side instead of (T+1)+1), dl-style 8-way
    crhi scatter into a (32,128) output block covering FOUR c-tiles
    (per-chunk quarter packed in at's low bits); placement from the C++
    dual-cell T=1 placer."""
    from .spmv_pallas import _pk_gather

    nc4 = -(-nc // 4)
    av = jnp.pad(a_vals.astype(jnp.float32),
                 (0, na * _BLK - a_vals.shape[0])).reshape(na * _SR, 128)
    bv = jnp.pad(b_vals.astype(jnp.float32),
                 (0, nb * _BLK - b_vals.shape[0])).reshape(nb * _SR, 128)

    def kernel(at_ref, bt_ref, ct_ref, first_ref, pkA_ref, pkB_ref,
               crhi_ref, av_ref, bv_ref, c_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(4)]
        for j in range(B):
            asub = at_ref[g * B + j]
            at = asub >> 2
            sub = asub & 3
            bt = bt_ref[g * B + j]
            sl = slice(j * 8, (j + 1) * 8)
            a = _pk_gather(av_ref[pl.ds(at * _SR, _SR), :], pkA_ref[sl, :],
                           _SR)
            b = _pk_gather(bv_ref[pl.ds(bt * _SR, _SR), :], pkB_ref[sl, :],
                           _SR)
            pv = a * b
            crhi2 = crhi_ref[sl, :]
            crows = [jnp.sum(jnp.where(crhi2 == d, pv, 0.0), axis=0,
                             keepdims=True) for d in range(8)]
            con = jnp.concatenate(crows, axis=0)
            for q in range(4):
                accs[q] = jnp.where(sub == q, accs[q] + con, accs[q])
        acc = jnp.concatenate(accs, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            c_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            c_ref[:, :] = c_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, a, b, c, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, 128), lambda g, a, b, c, f: (c[g], 0),
                               memory_space=pltpu.VMEM),
    )
    cv = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spgemm_pair_pk",
        out_shape=jax.ShapeDtypeStruct((nc4 * 32, 128), jnp.float32),
        interpret=interpret,
    )(at_ids, bt_ids, ct_ss, first_ss, pkA, pkB, crhi, av, bv)
    return cv.reshape(nc4 * 4 * _CT)[:nnz_c]


# ---------------------------------------------------------------------------
# Sort-based pair numeric — the scattered-pattern path (round 2).
#
# The windowed pair kernels above pay a one-chunk-per-(ct,at,bt)-run floor
# that blows up on scattered patterns (rand50k deg-8: pad 74; bigger value
# blocks only reach ~0.3 Gpair/s because the in-kernel gather loop grows
# with the window).  This path is pattern-INDEPENDENT: it decomposes the
# numeric phase into three selection kernels whose gathers are local or
# monotone (pad ~1 through the v8 spmv machinery) plus ONE global reorder
# done as a key-sort (`permute_via_sort` — fully vectorized on TPU, unlike
# scalarized takes):
#
#   ag   = Sa @ a_vals        pairs in C-order; A gathers are row-local
#   bg   = Sb @ b_vals        pairs in B-order; monotone expansion
#   bg_c = sort(bg by c-pos)  the only pattern-free global data motion
#   C    = Sc @ (ag * bg_c)   contiguous-range sums, monotone
#
# Reference analog: the two-level hash accumulator of
# sparse/impl/KokkosSparse_spgemm_impl_kkmem.hpp:31-75 degrades gracefully
# on scattered rows; this is the TPU formulation of the same promise.

class SortPairPlan:
    """Plan for the sort-based numeric: three selection-matrix spmv plans +
    the b→c reorder, either routed (StaticPermutePlan — 3 local gather
    passes, no runtime sort) or as permute_via_sort keys.

    COMPACT slot layout (round 3): when almost every C entry has exactly
    one pair (scattered A·A: rand50k deg-8 has 4.1k multi-pair segments out
    of 4.5M), the c-sum reduction pass — measured 2.1 ms of the 3.5 ms
    total — is eliminated: single-pair products land DIRECTLY at their C
    slot (the a-selection rows and the b→slot permutation are re-targeted
    at plan time), multi-pair segments go to a small overflow region whose
    segment-sum + scatter-set is negligible."""

    def __init__(self, a_idx, b_idx, c_idx, nnz_a, nnz_b, nnz_c,
                 *, _fields=None):
        if _fields is not None:
            (self.a_sel, self.b_sel, self.c_sum, self.perm_keys,
             self.perm_plan, self.multi_ids, self.over_seg,
             self.nnz_c, self.npairs, self.compact, self.nslots,
             self.n_over, self.n_multi) = _fields
            return
        from ..containers.csr import CsrMatrix
        from .spmv_pallas import build_onehot_spmv_plan

        a_idx = np.asarray(a_idx, dtype=np.int64)
        b_idx = np.asarray(b_idx, dtype=np.int64)
        c_idx = np.asarray(c_idx, dtype=np.int64)
        P = len(c_idx)

        def selection_rm(rm, cols, nrows, ncols):
            A = CsrMatrix.from_arrays(rm.astype(np.int64),
                                      cols.astype(np.int32),
                                      np.ones(len(cols), np.float32),
                                      nrows=nrows, ncols=ncols)
            return build_onehot_spmv_plan(A)

        def selection(cols, ncols):
            return selection_rm(np.arange(P + 1), cols, P, ncols)

        from ..common.permute import build_permute_plan

        seg_sizes = (np.bincount(c_idx, minlength=max(nnz_c, 1))
                     if P else np.zeros(max(nnz_c, 1), np.int64))
        multi = seg_sizes > 1
        n_multi = int(multi.sum())
        self.compact = bool(P) and n_multi <= 0.05 * max(nnz_c, 1)
        border = np.argsort(b_idx, kind="stable")
        inv_border = np.empty(P, np.int64)
        inv_border[border] = np.arange(P, dtype=np.int64)
        self.b_sel = None
        if self.compact:
            pair_single = ~multi[c_idx]
            n_over = int(P - pair_single.sum())
            nslots = nnz_c + n_over
            slot_of = np.empty(P, np.int64)
            slot_of[pair_single] = c_idx[pair_single]
            slot_of[~pair_single] = nnz_c + np.arange(n_over)
            has = np.zeros(nslots, bool)
            has[slot_of] = True
            rm_s = np.zeros(nslots + 1, np.int64)
            np.cumsum(has, out=rm_s[1:])
            cols_s = np.empty(P, np.int64)
            cols_s[rm_s[slot_of]] = a_idx
            # bijection on nslots: pair (b-order j) -> its slot; the
            # nslots-P pads -> the empty (multi-c) slots
            empty = np.nonzero(~has)[0]
            src_slots = np.empty(nslots, np.int64)
            src_slots[slot_of] = inv_border
            src_slots[empty] = P + np.arange(len(empty))
            self.perm_plan = build_permute_plan(src_slots)
            if self.perm_plan is not None:
                self.perm_keys = None
            else:
                dst = np.empty(nslots, np.int64)
                dst[src_slots] = np.arange(nslots)
                self.perm_keys = jnp.asarray(dst.astype(np.int32))
            self.c_sum = None
            self.multi_ids = jnp.asarray(
                np.nonzero(multi)[0].astype(np.int32))
            over_c = c_idx[~pair_single]  # pair order == c-sorted
            self.over_seg = jnp.asarray(np.searchsorted(
                np.nonzero(multi)[0], over_c).astype(np.int32))
            self.nslots, self.n_over, self.n_multi = nslots, n_over, n_multi
            self._build_fused(a_idx, b_idx, border, slot_of, nnz_a, nnz_b, P, nnz_c)
            if not self.fused:
                self.a_sel = selection_rm(rm_s, cols_s, nslots,
                                          max(nnz_a, 1))
                self.b_sel = selection(b_idx[border], max(nnz_b, 1))
            else:
                self.a_sel = None
        else:
            # b-order element j is c-order pair border[j]: route the static
            # permutation (3 local gathers) when the planner supports it,
            # else sort bg by key border at runtime
            self.perm_plan = build_permute_plan(inv_border)
            self.perm_keys = (None if self.perm_plan is not None
                              else jnp.asarray(border.astype(np.int32)))
            # Sc: nnz_c rows, row c sums its contiguous pair range
            crm = np.zeros(nnz_c + 1, np.int64)
            np.add.at(crm, c_idx + 1, 1)
            crm = np.cumsum(crm).astype(np.int64)
            self.c_sum = selection_rm(crm, np.arange(P, dtype=np.int32),
                                      nnz_c, max(P, 1))
            self.multi_ids = jnp.zeros(0, jnp.int32)
            self.over_seg = jnp.zeros(0, jnp.int32)
            self.nslots, self.n_over, self.n_multi = P, 0, 0
            # fused pipeline applies here too (products in c-sorted pair
            # order, then the c_sum reduce); no overflow region
            self._build_fused(a_idx, b_idx, border,
                              np.arange(P, dtype=np.int64), nnz_a, nnz_b,
                              P, P)
            if not self.fused:
                self.a_sel = selection(a_idx, max(nnz_a, 1))
                self.b_sel = selection(b_idx[border], max(nnz_b, 1))
            else:
                self.a_sel = None
        if not hasattr(self, "fused"):
            self.fused = False
            self.exp_wb = self.t3a = self.wb_a = None
            self.t1x = None
            self.a_over_sel = None
            self.Rb = self.Ra = 0
        self.nnz_c = nnz_c
        self.npairs = P

    def _build_fused(self, a_idx, b_idx, border, slot_of, nnz_a, nnz_b, P, nnz_c):
        """Fused-pipeline tables (compact layout only): the b-expansion as a
        2-sublane-window gather kernel (replaces the b_sel selection SpMV)
        and the a-gather+product folded into phase 3 of the permute network
        (a's window-relative position rides spare bits 21-29 of the packed
        phase-3 table).  Gated on the routed packed3 permute plan and on
        every tile/row's source span fitting 256 values."""
        self.fused = False
        self.exp_wb = self.t3a = self.wb_a = None
        self.t1x = None
        self.a_over_sel = None
        self.Rb = self.Ra = 0
        pp = self.perm_plan
        if pp is None or not getattr(pp, "packed3", False):
            return
        # Both value arrays are pinned whole in VMEM ((Rb,128)+(Ra,128)
        # f32 blocks); gate like every other pinned-operand path so a
        # large-nnz product falls back to the non-fused selection SpMVs
        # instead of failing at Mosaic compile.
        _rb = max(4, -(-max(nnz_b, 1) // 128) + 3)
        _ra = max(4, -(-max(nnz_a, 1) // 128) + 3)
        if (_rb + _ra) * 128 * 4 > _VALS_VMEM_CAP:
            return
        nslots = self.nslots
        R = pp.R
        N = R * 1024
        # --- expansion side: b-order tile windows over pinned b ---
        Rb = max(4, -(-max(nnz_b, 1) // 128) + 3)
        bpos = b_idx[border].astype(np.int64)          # sorted ascending
        n_tiles = N // 1024
        wb_b = np.zeros(n_tiles, np.int32)
        rel_b = np.zeros(N, np.int64)
        nt_real = -(-P // 1024)
        starts = np.arange(0, nt_real * 1024, 1024)
        mins = bpos[np.minimum(starts, P - 1)]         # sorted → tile min
        wb = np.minimum(mins // 128, Rb - 4)
        wb_b[:nt_real] = wb
        rel_b[:P] = bpos - np.repeat(wb, 1024)[:P] * 128
        if rel_b[:P].max(initial=0) >= 512 or rel_b[:P].min(initial=0) < 0:
            return
        # --- a side: per-final-row windows over pinned a.  Overflow slots
        # (multi-pair segments, slot >= nnz_c) have arbitrary a positions:
        # they get the PASSTHROUGH flag (bit 29, av = 1 in-kernel) and
        # their a-product is applied in the fixup via a small selection
        # plan (a_over_sel) ---
        Ra = max(4, -(-max(nnz_a, 1) // 128) + 3)
        apos = np.zeros(N, np.int64)
        apos[slot_of] = a_idx
        real = np.zeros(N, bool)
        real[slot_of] = True
        single = real.copy()
        single[nnz_c:] = False              # overflow + tail: flag
        ap2 = apos.reshape(R, 1024)
        sg2 = single.reshape(R, 1024)
        mins_a = np.where(sg2.any(axis=1),
                          np.where(sg2, ap2, np.iinfo(np.int64).max)
                          .min(axis=1), 0)
        wa = np.minimum(mins_a // 128, Ra - 4).astype(np.int64)
        rel_a = np.where(sg2, ap2 - wa[:, None] * 128, 0)
        if rel_a.max(initial=0) >= 512 or rel_a.min(initial=0) < 0:
            return
        flag = (~sg2).astype(np.int32) << 30
        t3 = np.asarray(pp.t3)                          # (R*8,128) packed
        self.t3a = jnp.asarray(
            t3 | (rel_a.reshape(R * 8, 128).astype(np.int32) << 21)
            | flag.reshape(R * 8, 128))
        self.wb_a = jnp.asarray(wa.astype(np.int32))
        # compose expansion with stage a of phase 1: t1x bits 0-8 = the
        # composed window offset rel' = rel[s, a1(s,l)], 9-15 = sig,
        # 16-22 = a3 (consumed by _expand3_call — the separate expansion
        # kernel and its HBM round-trip disappear)
        t1 = np.asarray(pp.t1).reshape(R, 8, 128)
        a1 = t1 & 127
        rel3 = rel_b.reshape(R, 8, 128).astype(np.int32)
        relc = np.take_along_axis(rel3, a1, axis=2)
        self.t1x = jnp.asarray(
            (relc | (((t1 >> 7) & 127) << 9)
             | (((t1 >> 14) & 127) << 16)).reshape(R * 8, 128))
        # overflow a-values: tiny deg-1 selection plan (n_over rows)
        self.a_over_sel = None
        if self.n_over:
            from ..containers.csr import CsrMatrix
            from .spmv_pallas import build_onehot_spmv_plan

            over_a = apos[nnz_c:nnz_c + self.n_over]
            Ao = CsrMatrix.from_arrays(
                np.arange(self.n_over + 1, dtype=np.int64),
                over_a.astype(np.int32),
                np.ones(self.n_over, np.float32),
                nrows=self.n_over, ncols=max(nnz_a, 1))
            self.a_over_sel = build_onehot_spmv_plan(Ao)
        self.exp_wb = jnp.asarray(wb_b)
        self.Rb, self.Ra = Rb, Ra
        self.fused = True

    def tree_flatten(self):
        return ((self.a_sel, self.b_sel, self.c_sum, self.perm_keys,
                 self.perm_plan, self.multi_ids, self.over_seg,
                 self.exp_wb, self.t3a, self.wb_a,
                 self.a_over_sel, self.t1x),
                (self.nnz_c, self.npairs, self.compact, self.nslots,
                 self.n_over, self.n_multi, self.fused, self.Rb, self.Ra))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls(None, None, None, 0, 0, 0,
                  _fields=(*children[:7], *aux[:6]))
        (obj.exp_wb, obj.t3a, obj.wb_a,
         obj.a_over_sel, obj.t1x) = children[7:]
        (obj.fused, obj.Rb, obj.Ra) = aux[6:]
        return obj


jax.tree_util.register_pytree_node_class(SortPairPlan)


@functools.partial(jax.jit, static_argnames=("n_rows", "B", "Rb",
                                             "interpret"))
def _expand3_call(wb, tab, bpin, *, n_rows, B, Rb, interpret):
    """Expansion FUSED with phase 1 of the permute network: stage a of the
    row factorization composes with the b-window gather on the host
    (rel' = rel ∘ a1), so one kernel reads pinned b through the 4-sublane
    window, applies the vertical (sig) and lane (a3) stages in-register,
    and writes y1 directly — the xb2 HBM round-trip and the separate
    expansion kernel disappear.  tab bits: 0-8 rel', 9-15 sig, 16-22 a3."""

    def kernel(wb_ref, t_ref, b_ref, y_ref):
        g = pl.program_id(0)
        for j in range(B):
            tabj = t_ref[j * 8:(j + 1) * 8, :]
            rel = tabj & 511
            sig = (tabj >> 9) & 127
            a3 = (tabj >> 16) & 127
            base = wb_ref[g * B + j]
            win = b_ref[pl.ds(base, 4), :]
            lane = rel & 127
            hi = rel >> 7
            z1 = jnp.zeros((8, 128), jnp.float32)
            for w in range(4):
                tw = jnp.take_along_axis(
                    jnp.broadcast_to(win[w:w + 1, :], (8, 128)), lane,
                    axis=1)
                z1 = jnp.where(hi == w, tw, z1)
            z2 = jnp.take_along_axis(z1, sig, axis=0)
            y_ref[j * 8:(j + 1) * 8, :] = jnp.take_along_axis(z2, a3,
                                                              axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows // B,),
        in_specs=[
            pl.BlockSpec((B * 8, 128), lambda g, wb: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, 128), lambda g, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B * 8, 128), lambda g, wb: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, name="tpukk_spgemm_expand_perm1", grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * 8, 128), jnp.float32),
        interpret=interpret)(wb, tab, bpin)


@functools.partial(jax.jit, static_argnames=("n_rows", "B", "Ra",
                                             "interpret"))
def _rowperm3a_call(x2, ptab, wb_a, apin, *, n_rows, B, Ra, interpret):
    """Phase 3 of the permute network (SRR=8) FUSED with the a-value gather
    and the pair product: the packed table carries (lane, sublane, lane)
    permute stages in bits 0-20 and the a-position window offset in bits
    21-29 (bit 30 = passthrough); a is pinned in VMEM."""

    def kernel(wb_ref, t_ref, x_ref, a_ref, y_ref):
        g = pl.program_id(0)
        for j in range(B):
            X = x_ref[j * 8:(j + 1) * 8, :]
            tab = t_ref[j * 8:(j + 1) * 8, :]
            a1 = tab & 127
            sig = (tab >> 7) & 7
            a3 = (tab >> 14) & 127
            rel = (tab >> 21) & 511
            passthru = (tab >> 30) & 1
            z1 = jnp.take_along_axis(X, a1, axis=1)
            z2 = jnp.take_along_axis(z1, sig, axis=0)
            y3 = jnp.take_along_axis(z2, a3, axis=1)
            base = wb_ref[g * B + j]
            win = a_ref[pl.ds(base, 4), :]
            lane = rel & 127
            hi = rel >> 7
            av = jnp.ones((8, 128), jnp.float32)
            for w in range(4):
                tw = jnp.take_along_axis(
                    jnp.broadcast_to(win[w:w + 1, :], (8, 128)), lane,
                    axis=1)
                av = jnp.where((passthru == 0) & (hi == w), tw, av)
            y_ref[j * 8:(j + 1) * 8, :] = y3 * av

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows // B,),
        in_specs=[
            pl.BlockSpec((B * 8, 128), lambda g, wb: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * 8, 128), lambda g, wb: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ra, 128), lambda g, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B * 8, 128), lambda g, wb: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, name="tpukk_spgemm_perm3_prod", grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * 8, 128), jnp.float32),
        interpret=interpret)(wb_a, ptab, x2, apin)


def sort_pair_numeric(plan: SortPairPlan, a_vals, b_vals,
                      interpret: bool = False):
    """C values from the sort-based plan (values in C-sorted order)."""
    from ..common.permute import static_permute
    from ..common.utils import permute_via_sort
    from .spmv_pallas import onehot_spmv

    a32 = a_vals.astype(jnp.float32)
    b32 = b_vals.astype(jnp.float32)
    if plan.fused:
        # fused pipeline: expansion-from-pinned-b, permute phases 1-2,
        # phase 3 + a-gather + product in one kernel — two full passes and
        # both selection SpMVs eliminated
        from ..common.permute import _C, _rowperm3_call

        pp = plan.perm_plan
        R = pp.R
        bpin = jnp.pad(b32, (0, plan.Rb * 128 - b32.shape[0])
                       ).reshape(plan.Rb, 128)
        apin = jnp.pad(a32, (0, plan.Ra * 128 - a32.shape[0])
                       ).reshape(plan.Ra, 128)
        b16 = 16 if R % 16 == 0 else 8
        y1 = _expand3_call(plan.exp_wb, plan.t1x, bpin,
                           n_rows=R, B=b16, Rb=plan.Rb,
                           interpret=interpret)
        y1t = y1.reshape(R, _C).T.reshape(_C * (R // 128), 128)
        y2 = _rowperm3_call(y1t, pp.t2, n_rows=_C, SRR=R // 128, B=8,
                            interpret=interpret)
        y2t = y2.reshape(_C, R).T.reshape(R * 8, 128)
        prod2 = _rowperm3a_call(y2t, plan.t3a, plan.wb_a, apin,
                                n_rows=R, B=b16, Ra=plan.Ra,
                                interpret=interpret)
        prod = prod2.reshape(-1)[:plan.nslots]
        if not plan.compact:
            # non-compact: reduce c-sorted pair products per C entry
            return onehot_spmv(plan.c_sum, prod, interpret=interpret)
        y = prod[:plan.nnz_c]
        if plan.n_multi:
            # overflow slots passed b through un-multiplied (arbitrary a
            # positions): apply a via the tiny overflow selection plan
            ag_over = onehot_spmv(plan.a_over_sel, a32,
                                  interpret=interpret)[:plan.n_over]
            extra = jax.ops.segment_sum(
                prod[plan.nnz_c:plan.nnz_c + plan.n_over] * ag_over,
                plan.over_seg,
                num_segments=plan.n_multi, indices_are_sorted=True)
            y = y.at[plan.multi_ids].set(extra.astype(y.dtype))
        return y
    ag = onehot_spmv(plan.a_sel, a32, interpret=interpret)
    bg = onehot_spmv(plan.b_sel, b32, interpret=interpret)
    if plan.compact:
        # slot layout: single-pair products land AT their C slot — no
        # reduction pass; the few multi-pair segments sum in the overflow
        # tail and scatter-set into place
        xb = jnp.pad(bg, (0, plan.nslots - plan.npairs))
        if plan.perm_plan is not None:
            bg_s = static_permute(plan.perm_plan, xb, interpret=interpret)
        else:
            bg_s = permute_via_sort(xb, plan.perm_keys)
        prod = ag * bg_s
        y = prod[:plan.nnz_c]
        if plan.n_multi:
            extra = jax.ops.segment_sum(
                prod[plan.nnz_c:plan.nnz_c + plan.n_over], plan.over_seg,
                num_segments=plan.n_multi, indices_are_sorted=True)
            y = y.at[plan.multi_ids].set(extra.astype(y.dtype))
        return y
    if plan.perm_plan is not None:
        bg_c = static_permute(plan.perm_plan, bg, interpret=interpret)
    else:
        bg_c = permute_via_sort(bg, plan.perm_keys)
    return onehot_spmv(plan.c_sum, ag * bg_c, interpret=interpret)
