#!/usr/bin/env python
"""Probe the per-super-step fixed cost of the gi spmv kernel and its
dependence on (a) stream count + gather op count — packing gt+lo into one
int32 stream with hoisted bit-ops, (b) super-step batch B, (c) multi-tile
output blocks (4 dst tiles per grid step -> 4x more chunks amortize the
step floor).

Synthetic plans (random tables) isolate schedule cost. per_ss(B) = FIX +
B*VAR measured at B=4/16 via chained fori-loops (slope timing kills relay
dispatch overhead).  Minimal compile count: 3 variants x 2 B x 2 chain
lengths = 12 remote compiles.

Run on real TPU: python scripts/probe_ss_cost.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SR = 32  # _OH_SRC // 128
ND, NS = 64, 16  # 512x128 y rows == x rows so the chain feeds back


def _gather_base(X, gt, lo):
    t2 = jnp.zeros(gt.shape, jnp.float32)
    for b in range(SR // 8):
        blk = X[b * 8:(b + 1) * 8, :]
        tb = jnp.take_along_axis(blk, jnp.clip(gt - b * 8, 0, 7), axis=0)
        t2 = jnp.where((gt // 8) == b, tb, t2)
    return jnp.take_along_axis(t2, lo, axis=1)


def make_base(n_ss, B):
    """3 streams/chunk (gt, lo, vals) — current _gi_call_batched shape."""
    def kernel(dst_ref, src_ref, first_ref, gt_ref, lo_ref, v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            xg = _gather_base(X, gt_ref[sl, :], lo_ref[sl, :])
            acc = acc + v_ref[sl, :] * xg

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_ss,),
        in_specs=[pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM))
    call = pl.pallas_call(kernel, grid_spec=grid_spec, name="probe_gi3",
                          out_shape=jax.ShapeDtypeStruct((ND * 8, 128),
                                                         jnp.float32))

    def one(x, dst, src, first, gt, lo, vals):
        return call(dst, src, first, gt, lo, vals, x)
    return one


def make_packed_opt(n_ss, B):
    """2 streams/chunk (pk = gt*8192 + ti*1024 + lo) + hoisted bit-ops."""
    def kernel(dst_ref, src_ref, first_ref, pk_ref, v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            pkj = pk_ref[sl, :]
            gt_and = (pkj >> 13) & 7
            gt_blk = pkj >> 16
            lo = pkj & 1023
            t2 = jnp.zeros((8, 128), jnp.float32)
            for b in range(SR // 8):
                blk = X[b * 8:(b + 1) * 8, :]
                tb = jnp.take_along_axis(blk, gt_and, axis=0)
                t2 = jnp.where(gt_blk == b, tb, t2)
            xg = jnp.take_along_axis(t2, lo, axis=1)
            acc = acc + v_ref[sl, :] * xg

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_ss,),
        in_specs=[pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM))
    call = pl.pallas_call(kernel, grid_spec=grid_spec, name="probe_gi2o",
                          out_shape=jax.ShapeDtypeStruct((ND * 8, 128),
                                                         jnp.float32))

    def one(x, dst, src, first, pk, vals):
        return call(dst, src, first, pk, vals, x)
    return one


def make_mt4(n_ss, B):
    """(32,128) out block = 4 dst tiles; per-chunk sub in [0,4) packed into
    src_ids upper bits; packed gt+lo stream."""
    def kernel(dst_ref, srcsub_ref, first_ref, pk_ref, v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(4)]
        for j in range(B):
            ss = srcsub_ref[g * B + j]
            src = ss >> 2
            sub = ss & 3
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            pkj = pk_ref[sl, :]
            gt_and = (pkj >> 13) & 7
            gt_blk = pkj >> 16
            lo = pkj & 1023
            t2 = jnp.zeros((8, 128), jnp.float32)
            for b in range(SR // 8):
                blk = X[b * 8:(b + 1) * 8, :]
                tb = jnp.take_along_axis(blk, gt_and, axis=0)
                t2 = jnp.where(gt_blk == b, tb, t2)
            xg = jnp.take_along_axis(t2, lo, axis=1)
            con = v_ref[sl, :] * xg
            for q in range(4):
                accs[q] = jnp.where(sub == q, accs[q] + con, accs[q])
        acc = jnp.concatenate(accs, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_ss,),
        in_specs=[pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM))
    call = pl.pallas_call(kernel, grid_spec=grid_spec, name="probe_gi_mt4",
                          out_shape=jax.ShapeDtypeStruct((ND // 4 * 32, 128),
                                                         jnp.float32))

    def one(x, dst, src, first, pk, vals):
        return call(dst, src, first, pk, vals, x)
    return one


def run_one(variant, n_ss, B, K):
    S = n_ss * B
    rng = np.random.default_rng(0)
    gt = rng.integers(0, SR, (S * 8, 128), dtype=np.int32)
    lo = rng.integers(0, 128, (S * 8, 128), dtype=np.int32)
    pk = (gt << 13) | lo
    vals = jnp.asarray(rng.standard_normal((S * 8, 128)).astype(np.float32)
                       * 1e-3)
    x0 = jnp.asarray(rng.standard_normal((NS * SR, 128)).astype(np.float32))
    src = rng.integers(0, NS, S, dtype=np.int32)
    if variant == "mt4":
        nd4 = ND // 4
        dst = jnp.asarray((np.arange(n_ss) % nd4).astype(np.int32))
        first = jnp.asarray((np.arange(n_ss) < nd4).astype(np.int32))
        sub = rng.integers(0, 4, S, dtype=np.int32)
        srcsub = jnp.asarray((src << 2) | sub)
        one = make_mt4(n_ss, B)
        streams = (srcsub, first, jnp.asarray(pk), vals)
    else:
        dst = jnp.asarray((np.arange(n_ss) % ND).astype(np.int32))
        first = jnp.asarray((np.arange(n_ss) < ND).astype(np.int32))
        if variant == "base":
            one = make_base(n_ss, B)
            streams = (jnp.asarray(src), first, jnp.asarray(gt),
                       jnp.asarray(lo), vals)
        else:
            one = make_packed_opt(n_ss, B)
            streams = (jnp.asarray(src), first, jnp.asarray(pk), vals)

    @jax.jit
    def chain(x, *s):
        def body(i, c):
            y = one(c, dst, *s)
            return c * 0.5 + y * 1e-6
        return jax.lax.fori_loop(0, K, body, x)

    r = chain(x0, *streams)
    r.block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        chain(x0, *streams).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    n_ss = 1024
    for variant in ("base", "packed_opt", "mt4"):
        res = {}
        for B in (4, 16):
            t1 = run_one(variant, n_ss, B, 10)
            t2 = run_one(variant, n_ss, B, 50)
            per_call = (t2 - t1) / 40
            res[B] = per_call / n_ss
            print(f"{variant} B={B}: per_ss={res[B]*1e6:7.4f}us "
                  f"per_chunk={res[B]/B*1e6:7.4f}us", flush=True)
        var = (res[16] - res[4]) / 12
        fix = res[4] - 4 * var
        print(f"{variant}: FIX={fix*1e6:.4f}us VAR={var*1e6:.4f}us", flush=True)


if __name__ == "__main__":
    main()
