"""Pallas TPU kernels for SpMV — the hand-tuned hot path.

DIA kernel: single HBM pass.  The XLA DIA path (spmv_impl.apply_dia)
materializes a shifted copy of x per diagonal; this kernel DMAs one x window
(chunk + halo) into VMEM per grid step and forms all diagonal products from
in-VMEM shifted slices.  Traffic drops from ~(2k·n) to (k·n + 2n) elements
for k diagonals — beyond the CSR roofline bytes the reference counts
(perf_test/sparse/KokkosSparse_spmv.cpp:94-106), because DIA never re-reads
column indices.  Diagonals are k separate 1-D blocked inputs (auto-pipelined
by Pallas; no sublane-padding traffic).  Measured on TPU v5e: ~885 GB/s of
actual traffic (~1.4 TB/s in reference-counted useful bytes).

Note: an explicitly double-buffered x-window variant (two scratch buffers +
predicated DMA) measured ~2x SLOWER than this serial version — the x DMA is
<1us per ~33us step, and the predicated duplicate compute defeated Mosaic's
own software pipelining.  Keep it serial.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import round_up

__all__ = ["dia_spmv", "DiaPallasPlan", "build_dia_pallas_plan", "supports_pallas"]


def supports_pallas() -> bool:
    plat = jax.devices()[0].platform
    return plat in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "interpret"))
def _dia_call(x_full, *diags, offsets, chunk, interpret):
    """diags: k arrays of shape (n_pad,); x_full: (n_pad + W,) with
    x_full[t] = x[t + off_min] (zeros outside), W = round_up(span, 128);
    chunk i reads x_full[i*C : i*C + C + W]."""
    k = len(diags)
    n_pad = diags[0].shape[0]
    off_min = min(offsets)
    span = max(offsets) - off_min
    C = chunk
    num_chunks = n_pad // C
    W = round_up(max(span, 1), 1024)  # DMA slices must be 1024-aligned (1-D HBM tiling)
    win = C + W
    assert x_full.shape[0] == n_pad + W, (x_full.shape, n_pad, W)
    dtype = diags[0].dtype

    # bf16 value planes (the reference's bhalf scalar axis): stream A's
    # diagonals at 2 B/value, widen in-register, accumulate f32 — halves
    # the dominant stream of the banded kernel at f32-x accuracy minus
    # only the bf16 value rounding the caller opted into
    bf16_vals = dtype == jnp.bfloat16
    out_dtype = jnp.float32 if bf16_vals else dtype

    def kernel(x_ref, *rest):
        d_refs = rest[:k]
        y_ref = rest[k]
        scratch, sem = rest[k + 1], rest[k + 2]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * C, win)], scratch, sem)
        cp.start()
        cp.wait()

        def dv(j):
            d = d_refs[j][:]
            return d.astype(jnp.float32) if bf16_vals else d

        acc = dv(0) * scratch[pl.ds(offsets[0] - off_min, C)]
        for j in range(1, k):
            acc = acc + dv(j) * scratch[pl.ds(offsets[j] - off_min, C)]
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        name="tpukk_spmv_dia",
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM) for _ in range(k)],
        out_specs=pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), x_full.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_full, *diags)


@jax.tree_util.register_pytree_node_class
class DiaPallasPlan:
    """Plan-time prepared inputs: padded per-diagonal arrays + geometry.
    All padding happens once here, not per matvec (the handle-reuse contract,
    KokkosSparse_spmv_handle.hpp:218).  A pytree: pass it as a jit ARGUMENT,
    never close over it (closure constants re-upload through the device
    tunnel)."""

    def __init__(self, dia_plan=None, chunk: int = 128 * 1024, *, _fields=None):
        if _fields is not None:
            (self.dlist, self.offsets, self.nrows, self.ncols,
             self.n_pad, self.chunk, self.W) = _fields
            return
        offsets = dia_plan.offsets
        n = dia_plan.nrows
        span = max(offsets) - min(offsets)
        if span >= chunk:
            raise ValueError("dia pallas: diagonal span exceeds chunk size")
        n_pad = round_up(n, chunk)
        diags = dia_plan.diags
        if diags.shape[1] != n_pad:
            diags = jnp.pad(diags, ((0, 0), (0, n_pad - n)))
        self.dlist = [diags[j] for j in range(len(offsets))]
        self.offsets = tuple(offsets)
        self.nrows = n
        self.ncols = dia_plan.ncols
        self.n_pad = n_pad
        self.chunk = chunk
        self.W = round_up(max(span, 1), 1024)  # DMA slices must be 1024-aligned (1-D HBM tiling)

    def tree_flatten(self):
        aux = (self.offsets, self.nrows, self.ncols, self.n_pad, self.chunk, self.W)
        return tuple(self.dlist), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_fields=(list(children), *aux))


def build_dia_pallas_plan(dia_plan, chunk: int = 128 * 1024) -> DiaPallasPlan:
    # scale the chunk so the per-step VMEM residency (k diagonal blocks + the
    # x window, f32) stays within the ~16 MB scoped-vmem budget — wide bands
    # (e.g. the BSR->scalar-DIA route: (2b-1) diagonals per block diagonal)
    # otherwise OOM the stack at the default 128k chunk
    if np.dtype(dia_plan.diags.dtype) == np.dtype(jnp.bfloat16):
        # NEGATIVE RESULT (round 4, v5e): streaming bf16 value planes and
        # widening in-kernel measured 3.7x SLOWER than f32 (65.8 vs
        # 17.9 us on lap1000) — the f32 banded kernel already runs above
        # nominal HBM (clock-boosted, partially cache-resident), so the
        # kernel is compute-bound and per-element widening only adds VPU
        # work (plus a halved chunk to fit the widened stack copies).
        # bf16-valued matrices therefore upcast ONCE at plan time; the
        # in-kernel bf16 path stays for completeness.
        dia_plan = dataclasses.replace(
            dia_plan, diags=dia_plan.diags.astype(jnp.float32))
    k = len(dia_plan.offsets)
    budget_elems = (6 * 1024 * 1024) // 4
    c = min(chunk, max(1, budget_elems // (k + 2)) // 1024 * 1024)
    span = int(max(dia_plan.offsets)) - int(min(dia_plan.offsets))
    from ..common import round_up as _ru

    c = max(c, _ru(span + 129, 1024))
    return DiaPallasPlan(dia_plan, c)


def dia_spmv(plan, x, interpret: bool = False):
    """y = A·x for a DiaPallasPlan.  Per-call work: one pad of x, the kernel,
    one slice of y."""
    off_min = min(plan.offsets)
    T = plan.n_pad + plan.W
    # x_full[t] = x[t + off_min] for t in [0, T), zeros outside
    if off_min >= 0:
        body = x[off_min:]
    else:
        body = jnp.concatenate([jnp.zeros((-off_min,), x.dtype), x])
    tail = T - body.shape[0]
    x_full = jnp.pad(body, (0, tail)) if tail > 0 else body[:T]
    y = _dia_call(x_full, *plan.dlist, offsets=plan.offsets, chunk=plan.chunk,
                  interpret=interpret)
    return y[: plan.nrows]


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "k", "interpret"))
def _dia_mv_call(x_full, *diags, offsets, chunk, k, interpret):
    """Fused multi-RHS DIA SpMM: one pass over the diagonals serves all k
    columns (column-at-a-time re-reads the k_d diagonal arrays k times; for a
    5-diagonal Laplacian with 8 RHS that is 2.7x the traffic).  x_full:
    (k, n_pad + W) transposed RHS windows; out (k, n_pad)."""
    kd = len(diags)
    n_pad = diags[0].shape[0]
    off_min = min(offsets)
    C = chunk
    num_chunks = n_pad // C
    W = round_up(max(max(offsets) - off_min, 1), 1024)
    win = C + W
    dtype = diags[0].dtype

    def kernel(x_ref, *rest):
        d_refs = rest[:kd]
        y_ref = rest[kd]
        scratch, sem = rest[kd + 1], rest[kd + 2]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(i * C, win)], scratch, sem)
        cp.start()
        cp.wait()
        acc = d_refs[0][:].reshape(1, C) * scratch[:, pl.ds(offsets[0] - off_min, C)]
        for j in range(1, kd):
            acc = acc + d_refs[j][:].reshape(1, C) * scratch[:, pl.ds(offsets[j] - off_min, C)]
        y_ref[:, :] = acc

    return pl.pallas_call(
        kernel,
        name="tpukk_spmv_dia_mv",
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM) for _ in range(kd)],
        out_specs=pl.BlockSpec((k, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((k, win), x_full.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_full, *diags)


def dia_spmm(plan, x, interpret: bool = False):
    """Y = A·X for a DiaPallasPlan, X (ncols, k) — fused multi-RHS kernel."""
    k = int(x.shape[1])
    # VMEM budget: scratch (k,win) + double-buffered y (k,C) ≈ 12·k·C bytes
    # of the ~16MB VMEM; halve the chunk (n_pad stays a multiple) until safe.
    chunk = plan.chunk
    while k * chunk * 12 > 8 * 2**20 and chunk % 2 == 0 and chunk // 2 > plan.W:
        chunk //= 2
    if chunk != plan.chunk:
        plan = DiaPallasPlan(_fields=(plan.dlist, plan.offsets, plan.nrows,
                                      plan.ncols, plan.n_pad, chunk, plan.W))
    off_min = min(plan.offsets)
    T = plan.n_pad + plan.W
    xt = x.T  # (k, ncols)
    if off_min >= 0:
        body = xt[:, off_min:]
    else:
        body = jnp.concatenate([jnp.zeros((k, -off_min), x.dtype), xt], axis=1)
    tail = T - body.shape[1]
    x_full = jnp.pad(body, ((0, 0), (0, tail))) if tail > 0 else body[:, :T]
    y = _dia_mv_call(x_full, *plan.dlist, offsets=plan.offsets, chunk=plan.chunk,
                     k=k, interpret=interpret)
    return y[:, : plan.nrows].T


def apply(handle, x):
    """Dispatch for the Pallas DIA path from the handle layer."""
    plan = handle._plan("dia_pallas")
    if x.ndim == 2:
        return dia_spmm(plan, x)
    return dia_spmv(plan, x)


# ===========================================================================
# Tiled one-hot SpMV — the unstructured-matrix kernel.
#
# XLA's gather runs at ~120 M elem/s on v5e (docs/PERF_NOTES.md), which makes
# every index-based CSR formulation (ELL, segment-sum; cf. the row-per-thread
# / merge-path taxonomy of sparse/impl/KokkosSparse_spmv_impl.hpp:221-377)
# gather-bound.  This kernel replaces gather/scatter with one-hot
# contractions built in VMEM — never touching HBM.  v3 design (measured
# 1.37 Gnnz/s Laplacian / 1.13 Gnnz/s random on v5e — 2.7x the v1 kernel,
# 10x XLA take):
#
#   per (dst_tile, src_tile) nnz chunk of CH, x tile stored as (32,128):
#     lo = col % 128, hi = col // 128
#     x planes   = exact 3-term bf16 split of the x tile   (24 mantissa bits)
#     u(32,CH)   = sum_p planes_p @ OH_lo(128,CH)          [MXU, 3 bf16 passes]
#     xg(1,CH)   = u[hi_j, j] via per-vreg sublane dynamic_gather (4 blocks)
#     pv planes  = exact 3-term bf16 split of vals*xg
#     y2(8,128) += sum_p OH_rhi(8,CH) @ (cmp_rlo ⊙ pv_p)^T [MXU, 3 bf16 passes]
#
# All matmuls are single-pass bf16 with f32 accumulation yet EXACT to f32
# semantics: one operand of every product is a {0,1} one-hot (exact in bf16)
# and the other is a 3-plane bf16 decomposition whose planes sum to the f32
# value.  This replaces the 6-pass HIGHEST f32 selection matmuls of the v1
# kernel (measured: the scatter matmul alone was ~half the kernel time).
# Steps are ordered dst-major so the y block stays VMEM-resident and
# accumulates across steps; the x tile is fetched data-dependently via a
# scalar-prefetched src-tile id.  Locality reduces chunk padding; pre-order
# scattered patterns with graph.rcm.
# ===========================================================================

# ---------------------------------------------------------------------------
# f64 DIA SpMV via double-single (two-f32) arithmetic — the fast path for
# BASELINE config 1's default scalar (double; cmake/KokkosKernels_config.h.in
# :44-105 makes double the reference's default ETI scalar).  TPU VPUs have no
# f64 ALUs (XLA emulates ~10x slower); each f64 is carried as an (hi, lo) f32
# pair capturing 48 mantissa bits, products use a Dekker-style error-free
# transform (plan-time 12-bit value splits, per-chunk x splits), and the
# accumulator is a compensated (sum, err) pair.  Relative accuracy ~1e-13
# (bounded by the 48-bit representation); the XLA f64 path stays available
# for strict IEEE-double semantics.

_DS_SPLIT_MASK = -4096  # 0xFFFFF000: keep 12 mantissa bits (python int:
#                           a jnp constant would be captured by the kernel)


def _fp_barrier(v):
    """Force v to materialize as a rounded f32 and block FMA contraction
    (fusing `a*b` into the following add silently changes p's rounding and
    breaks the two_sum invariants — found as scattered 1e-7 errors in the
    multi-chunk ds kernel).  `lax.optimization_barrier` has no Mosaic
    lowering (NotImplementedError on TPU, observed round 2), so inside
    pallas kernels the barrier is an int32 bitcast round-trip: value-
    preserving, and opaque to floating-point reassociation passes.

    COMPILER-VERSION FRAGILITY: a canonicalization folding
    bitcast(bitcast(x)) -> x would be legal and would silently re-enable
    FMA contraction (quiet ~1e-7-scale ds errors, not a crash).  The
    hardware accuracy tests in tests/test_tpu.py (ds kernels asserted at
    <1e-12 rel against full-precision oracles) are the pinned canary;
    revisit with lax.optimization_barrier when Mosaic grows a lowering."""
    vi = jax.lax.bitcast_convert_type(v, jnp.int32)
    return jax.lax.bitcast_convert_type(vi, jnp.float32)


def _f32_split12(a):
    """Exact a = a1 + a2 with both halves 12-bit-mantissa f32 (bitmask, not
    arithmetic: --xla_allow_excess_precision folds arithmetic splits)."""
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    a1 = jax.lax.bitcast_convert_type(ai & _DS_SPLIT_MASK, jnp.float32)
    return a1, a - a1


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "pow2",
                                             "interpret"))
def _dia_ds_call(xh_full, xl_full, *planes, offsets, chunk, pow2, interpret):
    """Double-single DIA kernel: planes = k hi diags then k lo diags (f32)
    — or just the k hi diags when pow2 — x as (hi, lo) f32 windows; returns
    (y_sum, y_err) f32 pair with y = y_sum + y_err to ~2^-48.

    pow2 (plan-time property): every matrix value is 0 or ±2^j, so each
    product ah*xh is EXACT in f32 (the mantissa is xh's) and the lo value
    plane is identically 0 — the Dekker two_prod (10 vops/(diag,elem)) and
    the lo-plane streams both drop with no accuracy loss.  This is the
    flagship FD-stencil case (BASELINE config 1's Laplacian is ±1/±4).
    Negative result (round 3): an FMA-based residual is NOT available —
    Mosaic never contracts mul+add/sub into fma (probed all forms;
    `a*b - barrier(a*b)` is exactly 0)."""
    k = len(offsets)
    d_hi = planes[:k]
    d_lo = None if pow2 else planes[k:]
    n_pad = d_hi[0].shape[0]
    off_min = min(offsets)
    span = max(offsets) - off_min
    C = chunk
    num_chunks = n_pad // C
    W = round_up(max(span, 1), 1024)
    win = C + W
    n_planes = k if pow2 else 2 * k

    def kernel(xh_ref, xl_ref, *rest):
        dh = rest[:k]
        dl = None if pow2 else rest[k:2 * k]
        ys_ref, ye_ref = rest[n_planes], rest[n_planes + 1]
        sh, sl_, semh, seml = rest[n_planes + 2:n_planes + 6]
        i = pl.program_id(0)
        cph = pltpu.make_async_copy(xh_ref.at[pl.ds(i * C, win)], sh, semh)
        cph.start()
        cpl = pltpu.make_async_copy(xl_ref.at[pl.ds(i * C, win)], sl_, seml)
        cpl.start()
        cph.wait()
        cpl.wait()
        xh_win = sh[:]
        if not pow2:
            x1w, x2w = _f32_split12(xh_win)  # once per window, all diags
        S = jnp.zeros((C,), jnp.float32)
        E = jnp.zeros((C,), jnp.float32)
        for j in range(k):
            s0 = offsets[j] - off_min   # static python int: plain slices
            xh = xh_win[s0:s0 + C]
            xl = sl_[pl.ds(s0, C)]
            ah = dh[j][:]
            p = _fp_barrier(ah * xh)   # must round BEFORE entering two_sum
            if pow2:
                perr = None            # ah = ±2^j: the product was exact
            else:
                x1 = x1w[s0:s0 + C]
                x2 = x2w[s0:s0 + C]
                a1, a2 = _f32_split12(ah)
                # Dekker two_prod residual: exact because every partial
                # product of 12-bit halves is exactly representable in f32
                perr = ((_fp_barrier(a1 * x1) - p) + a1 * x2 + a2 * x1) + a2 * x2
            # two_sum(S, p) — Knuth, branch-free; every intermediate is
            # barriered (FMA contraction/reassociation re-rounds them)
            t = _fp_barrier(S + p)
            bv = _fp_barrier(t - S)
            carry = _fp_barrier(S - _fp_barrier(t - bv)) + _fp_barrier(p - bv)
            S = t
            if pow2:
                E = E + (carry + ah * xl)
            else:
                E = E + (carry + perr + ah * xl + dl[j][:] * xh)
        ys_ref[:] = S
        ye_ref[:] = E

    return pl.pallas_call(
        kernel,
        name="tpukk_spmv_dia_ds",
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(n_planes)],
        out_specs=[pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM),
                   pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad,), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((win,), jnp.float32),
            pltpu.VMEM((win,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xh_full, xl_full, *(d_hi if pow2 else (*d_hi, *d_lo)))


@jax.tree_util.register_pytree_node_class
class DiaDsPlan:
    """Plan for the double-single f64 DIA kernel: per-diagonal (hi, lo) f32
    plane pairs + geometry (mirrors DiaPallasPlan).

    chunk is 4x smaller than DiaPallasPlan's: the compensated two_sum chain
    keeps ~70 chunk-sized temporaries live per grid step, and Mosaic
    allocates them on the VMEM stack (128k chunks hit 'Ran out of memory in
    memory space vmem ... 39.77M' on v5e, observed round 2)."""

    def __init__(self, dia_plan=None, chunk: int = 32 * 1024, *, _fields=None):
        if _fields is not None:
            (self.hlist, self.llist, self.offsets, self.nrows, self.ncols,
             self.n_pad, self.chunk, self.W, self.pow2) = _fields
            return
        offsets = dia_plan.offsets
        n = dia_plan.nrows
        span = max(offsets) - min(offsets)
        if span >= chunk:
            raise ValueError("dia ds: diagonal span exceeds chunk size")
        n_pad = round_up(n, chunk)
        diags = np.asarray(getattr(dia_plan, "diags_host", dia_plan.diags),
                           np.float64)
        if diags.shape[1] != n_pad:
            diags = np.pad(diags, ((0, 0), (0, n_pad - diags.shape[1])))
        hi = diags.astype(np.float32)
        lo = (diags - hi.astype(np.float64)).astype(np.float32)
        # pow2: every value 0 or ±2^j => each f32 product ah*xh is exact and
        # lo == 0 — the kernel drops the Dekker two_prod + lo-plane streams
        # (the FD-stencil flagship case; measured 2.07x on lap1000)
        m, _ = np.frexp(diags)
        self.pow2 = bool((lo == 0).all()
                         and ((diags == 0) | (np.abs(m) == 0.5)).all())
        self.hlist = [jnp.asarray(hi[j]) for j in range(len(offsets))]
        self.llist = ([] if self.pow2 else
                      [jnp.asarray(lo[j]) for j in range(len(offsets))])
        self.offsets = tuple(int(o) for o in offsets)
        self.nrows = n
        self.ncols = dia_plan.ncols
        self.n_pad = n_pad
        self.chunk = chunk
        self.W = round_up(max(span, 1), 1024)

    def tree_flatten(self):
        aux = (self.offsets, self.nrows, self.ncols, self.n_pad, self.chunk,
               self.W, self.pow2)
        return tuple(self.hlist) + tuple(self.llist), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        if aux[-1]:  # pow2: no lo planes
            return cls(_fields=(list(children), [], *aux))
        k = len(children) // 2
        return cls(_fields=(list(children[:k]), list(children[k:]), *aux))


def ds_split_f64(x):
    """Host split of an f64 vector into exact (hi, lo) f32 planes — numpy,
    so the device path never needs jax_enable_x64 (enabling x64 on the axon
    backend wedged the relay in round-2 testing)."""
    x64 = np.asarray(x, np.float64)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    return xh, xl


def dia_spmv_ds_planes(plan: DiaDsPlan, xh, xl, interpret: bool = False):
    """(y_sum, y_err) f32 pair from (hi, lo) f32 input planes — pure-f32,
    jittable; y = y_sum + y_err summed at f64 by the caller."""
    n_pad, W = plan.n_pad, plan.W
    off_min = min(plan.offsets)
    idx0 = -off_min  # x_full[t] = x[t + off_min]

    def place(v):
        v = jnp.asarray(v, jnp.float32)
        out = jnp.zeros(n_pad + W, jnp.float32)
        return jax.lax.dynamic_update_slice(out, v, (idx0,)) if idx0 >= 0 \
            else out.at[0:v.shape[0] + idx0].set(v[-idx0:])

    pw2 = getattr(plan, "pow2", False)
    planes = tuple(plan.hlist) if pw2 else (*plan.hlist, *plan.llist)
    ys, ye = _dia_ds_call(place(xh), place(xl), *planes,
                          offsets=plan.offsets, chunk=plan.chunk,
                          pow2=pw2, interpret=interpret)
    return ys[:plan.nrows], ye[:plan.nrows]


def dia_spmv_ds(plan: DiaDsPlan, x, interpret: bool = False):
    """y = A·x for f64 A/x through the double-single kernel (~1e-13 rel).
    Host-side f64 split/combine (numpy): works with x64 disabled."""
    xh, xl = ds_split_f64(np.asarray(x))
    ys, ye = dia_spmv_ds_planes(plan, xh, xl, interpret=interpret)
    return np.asarray(ys, np.float64) + np.asarray(ye, np.float64)


_OH_DST = 1024    # dst tile (8 x 128 radix)
_OH_SRC = 4096    # src tile (32 x 128 radix); 4096 beat 2048/8192 on v5e
_OH_CH = 1024     # nnz chunk per grid step


def _bf16_planes3(a):
    """Exact 3-term bf16 decomposition: sum(planes) == a (f32, 24 bits).
    Mantissa bit-masking, not arithmetic rounding: XLA folds (a - bf16(a))
    to zero under --xla_allow_excess_precision=true (the TPU runtime sets
    it), which would silently quantize to bf16; integer bitcasts survive.
    Each 16-bit-truncated piece is exactly representable in bf16."""
    mask = jnp.int32(-65536)  # 0xFFFF0000
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(ai & mask, jnp.float32)
    r1 = a - hi
    r1i = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid = jax.lax.bitcast_convert_type(r1i & mask, jnp.float32)
    lo = r1 - mid
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _gather_rows(X, lo, hi, SR):
    """xg[s,l] = X[hi[s,l], lo[s,l]] for X (SR,128), idx (8,128): per-row
    broadcast + LANE-axis dynamic_gather + select.  Pure VPU, pure f32 —
    Mosaic supports take_along_axis on the lane axis (probed on v5e), which
    replaces the (128,CH) one-hot lane-route matmuls of kernel v3/v4 and
    drops the bf16 plane splits entirely."""
    xg = jnp.zeros(lo.shape, jnp.float32)
    for r in range(SR):
        row = jnp.broadcast_to(X[r:r + 1, :], lo.shape)
        t = jnp.take_along_axis(row, lo, axis=1)
        xg = jnp.where(hi == r, t, xg)
    return xg


def _sublane_gather(u, hi, SR, CH):
    """xg[0, j] = u[hi_j, j] for u (SR, CH): per-vreg sublane dynamic_gather
    over SR//8 blocks + masked combine (Mosaic supports take_along_axis only
    within one 8-sublane vreg)."""
    hib = jnp.broadcast_to(hi, (8, CH))
    xg = None
    for b in range(SR // 8):
        blk = u[b * 8:(b + 1) * 8, :]
        g = jnp.take_along_axis(blk, jnp.clip(hib - b * 8, 0, 7), axis=0)[0:1]
        xg = g if xg is None else jnp.where((hi // 8) == b, g, xg)
    return xg


class OneHotSpmvPlan:
    """Host symbolic phase (vectorized): tile the CSR into
    (dst 1024) x (src 4096) tiles, order nonzero tile pairs dst-major, chunk
    each pair's nnz to CH with zero-padding (padded vals are 0 => no-ops).
    Every dst tile gets at least one step so the output block is always
    initialized."""

    def __init__(self, A, *, _fields=None):
        if _fields is not None:
            (self.locr, self.locc, self.vals, self.dst_ids, self.src_ids,
             self.first, self.nrows, self.ncols, self.n_dst_tiles,
             self.n_src_tiles, self.num_steps, self.pad_ratio) = _fields
            return
        TD, TS, CH = _OH_DST, _OH_SRC, _OH_CH
        rm = np.asarray(A.host_row_map(), dtype=np.int64)
        ent = np.asarray(A.host_entries(), dtype=np.int64)
        vals = A.host_values()
        n, m = A.nrows, A.ncols
        nd = max(1, -(-n // TD))
        ns = max(1, -(-m // TS))
        nnz = len(ent)
        rows = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])
        dt = rows // TD
        st = ent // TS
        order = np.lexsort((st, dt))
        rows_s, cols_s, vals_s = rows[order], ent[order], vals[order]
        dt_s, st_s = dt[order], st[order]
        # runs of equal (dst,src)
        key = dt_s * ns + st_s
        change = np.nonzero(np.diff(key))[0] + 1
        run_starts = np.concatenate(([0], change)) if nnz else np.empty(0, np.int64)
        run_ends = np.concatenate((change, [nnz])) if nnz else np.empty(0, np.int64)
        nchunks = -(-(run_ends - run_starts) // CH)
        # one chunk per step; vectorized step table
        step_run = np.repeat(np.arange(len(run_starts)), nchunks)
        cum = np.concatenate(([0], np.cumsum(nchunks)))[:-1]
        S0 = int(nchunks.sum())
        within = np.arange(S0, dtype=np.int64) - cum[step_run]
        c0 = run_starts[step_run] + within * CH
        c1 = np.minimum(run_ends[step_run], c0 + CH)
        sdst = dt_s[c0] if S0 else np.empty(0, np.int64)
        ssrc = st_s[c0] if S0 else np.empty(0, np.int64)
        # dummy steps for dst tiles with no nonzeros (forces y-block init)
        missing = np.setdiff1d(np.arange(nd, dtype=np.int64),
                               np.unique(sdst), assume_unique=True)
        if len(missing):
            sdst = np.concatenate([sdst, missing])
            ssrc = np.concatenate([ssrc, np.zeros(len(missing), np.int64)])
            c0 = np.concatenate([c0, np.zeros(len(missing), np.int64)])
            c1 = np.concatenate([c1, np.zeros(len(missing), np.int64)])
            reorder = np.argsort(sdst, kind="stable")
            sdst, ssrc, c0, c1 = sdst[reorder], ssrc[reorder], c0[reorder], c1[reorder]
        S = len(sdst)
        idx = c0[:, None] + np.arange(CH, dtype=np.int64)[None, :]
        mask = idx < c1[:, None]
        idxc = np.minimum(idx, max(0, nnz - 1))
        if nnz:
            locr = np.where(mask, rows_s[idxc] - sdst[:, None] * TD, 0).astype(np.int32)
            locc = np.where(mask, cols_s[idxc] - ssrc[:, None] * TS, 0).astype(np.int32)
            v = np.where(mask, vals_s[idxc], 0).astype(np.float32)
        else:
            locr = np.zeros((S, CH), np.int32)
            locc = np.zeros((S, CH), np.int32)
            v = np.zeros((S, CH), np.float32)
        first = np.ones(S, np.int32)
        first[1:] = (sdst[1:] != sdst[:-1]).astype(np.int32)
        self.locr = jnp.asarray(locr.reshape(-1))
        self.locc = jnp.asarray(locc.reshape(-1))
        self.vals = jnp.asarray(v.reshape(-1))
        self.dst_ids = jnp.asarray(sdst.astype(np.int32))
        self.src_ids = jnp.asarray(ssrc.astype(np.int32))
        self.first = jnp.asarray(first)
        self.nrows, self.ncols = n, m
        self.n_dst_tiles = nd
        self.n_src_tiles = ns
        self.num_steps = S
        self.pad_ratio = S * CH / max(1, nnz)

    def tree_flatten(self):
        aux = (self.nrows, self.ncols, self.n_dst_tiles, self.n_src_tiles,
               self.num_steps, self.pad_ratio)
        return (self.locr, self.locc, self.vals, self.dst_ids, self.src_ids,
                self.first), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(OneHotSpmvPlan)


def _dl_schedule(run_key, lc):
    """Slot schedule for the dst-lane layout (nnz > 0): elements sharing a
    run_key pack into (8,128) chunks where an element may only use lane
    `lc`; chunks per run = max over lane classes of ceil(count/8).
    Returns (order, step_e, srow, run_first, nchunks, n_steps); step_e/srow
    are per SORTED element, run_first indexes sorted elements."""
    nnz = len(run_key)
    # single packed-key argsort beats np.lexsort ~3x at 5M elements
    grp_full = run_key * 128 + lc
    order = np.argsort(grp_full, kind="stable")
    run_s = run_key[order]
    grp = grp_full[order]
    gfirst = np.concatenate(([1], (np.diff(grp) != 0).astype(np.int64)))
    gid = np.cumsum(gfirst) - 1
    gstart = np.nonzero(gfirst)[0]
    rank = np.arange(nnz, dtype=np.int64) - gstart[gid]
    cwr = rank // 8
    srow = rank % 8
    rfirst = np.concatenate(([1], (np.diff(run_s) != 0).astype(np.int64)))
    rstart = np.nonzero(rfirst)[0]
    rid = np.cumsum(rfirst) - 1
    # runs are contiguous in sorted order: reduceat beats ufunc.at ~30x
    nchunks = np.maximum.reduceat(cwr + 1, rstart)
    base = np.concatenate(([0], np.cumsum(nchunks)))
    step_e = base[rid] + cwr
    return order, step_e, srow, rstart, nchunks, int(base[-1])


class DlSpmvPlan:
    """Dst-lane-aligned one-hot plan (layout v4).

    Chunks are physical (8,128) slot tiles; an nnz may only occupy a slot
    whose LANE equals its local dst row % 128.  The scatter side then needs
    no (128,CH) one-hot matmul at all: the contribution to dst sublane d is
    a masked sublane-reduction of the (8,128) product tile, in pure f32.
    Only the gather side keeps the one-hot lane routing (per slot-row).

    Trade-off: chunk count per (dst,src)-tile run is ceil(max lane-class
    count / 8) instead of ceil(run/1024) — worse padding when dst rows within
    a run are lane-skewed (few long rows), better per-step time (~0.45us vs
    ~0.70us on v5e).  build_onehot_spmv_plan picks by cost model.
    """

    def __init__(self, A, *, _fields=None):
        if _fields is not None:
            (self.locc, self.vals, self.rhi, self.dst_ids, self.src_ids,
             self.first, self.dst_ss, self.first_ss, self.nrows, self.ncols,
             self.n_dst_tiles, self.n_src_tiles, self.num_steps, self.n_ss,
             self.batch, self.pad_ratio) = _fields
            return
        TD, TS = _OH_DST, _OH_SRC
        rm = np.asarray(A.host_row_map(), dtype=np.int64)
        ent = np.asarray(A.host_entries(), dtype=np.int64)
        vals = np.asarray(A.host_values(), dtype=np.float32)
        n, m = A.nrows, A.ncols
        nd = max(1, -(-n // TD))
        ns = max(1, -(-m // TS))
        nnz = len(ent)
        rows = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])
        dt = rows // TD
        st = ent // TS
        locr = rows - dt * TD
        lc = locr % 128
        rhi = locr // 128
        run_key = dt * ns + st
        if nnz:
            order, step_e, srow, rstart, nchunks, S0 = _dl_schedule(run_key, lc)
            lc_s = lc[order]
            rhi_s = rhi[order]
            locc_s = (ent - st * TS)[order]
            vals_s = vals[order]
            dt_s, st_s = dt[order], st[order]
            sdst = np.repeat(dt_s[rstart], nchunks)
            ssrc = np.repeat(st_s[rstart], nchunks)
        else:
            step_e = np.empty(0, np.int64)
            srow = np.empty(0, np.int64)
            lc_s = np.empty(0, np.int64)
            rhi_s = np.empty(0, np.int64)
            locc_s = np.empty(0, np.int64)
            vals_s = np.empty(0, np.float32)
            sdst = np.empty(0, np.int64)
            ssrc = np.empty(0, np.int64)
        missing = np.setdiff1d(np.arange(nd, dtype=np.int64), np.unique(sdst),
                               assume_unique=True)
        if len(missing):
            sdst = np.concatenate([sdst, missing])
            ssrc = np.concatenate([ssrc, np.zeros(len(missing), np.int64)])
            reorder = np.argsort(sdst, kind="stable")
            inv = np.empty_like(reorder)
            inv[reorder] = np.arange(len(reorder))
            step_e = inv[step_e]
            sdst, ssrc = sdst[reorder], ssrc[reorder]
        S = len(sdst)
        locc_a = np.zeros((S, 8, 128), np.int32)
        vals_a = np.zeros((S, 8, 128), np.float32)
        rhi_a = np.zeros((S, 8, 128), np.int32)
        if nnz:
            locc_a[step_e, srow, lc_s] = locc_s.astype(np.int32)
            vals_a[step_e, srow, lc_s] = vals_s
            rhi_a[step_e, srow, lc_s] = rhi_s.astype(np.int32)

        # ---- super-step schedule (kernel v6): B chunks of ONE dst tile per
        # grid step, amortizing the ~0.25us fixed per-step cost (measured
        # no-gather floor on v5e).  Needs x fully VMEM-resident for per-chunk
        # window slices; otherwise B=1 (per-step windowed kernel).
        counts = np.diff(np.concatenate((
            np.nonzero(np.concatenate(([1], (sdst[1:] != sdst[:-1])
                                       .astype(np.int64))))[0], [S])))
        resident = ns * TS * 4 <= _X_VMEM_CAP
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
            locc_a = np.concatenate([locc_a, np.zeros((1, 8, 128), np.int32)])[cidx]
            vals_a = np.concatenate([vals_a, np.zeros((1, 8, 128), np.float32)])[cidx]
            rhi_a = np.concatenate([rhi_a, np.zeros((1, 8, 128), np.int32)])[cidx]
            ssrc = np.concatenate([ssrc, [0]])[cidx]
            sdst = sdst[gb[gid]]
            S = len(cidx)
        first = np.ones(S, np.int32)
        first[1:] = (sdst[1:] != sdst[:-1]).astype(np.int32)
        n_ss = S // B
        self.locc = jnp.asarray(locc_a.reshape(S * 8, 128))
        self.vals = jnp.asarray(vals_a.reshape(S * 8, 128))
        self.rhi = jnp.asarray(rhi_a.reshape(S * 8, 128))
        self.dst_ids = jnp.asarray(sdst.astype(np.int32))
        self.src_ids = jnp.asarray(ssrc.astype(np.int32))
        self.first = jnp.asarray(first)
        self.dst_ss = jnp.asarray(sdst[::B].astype(np.int32))
        self.first_ss = jnp.asarray(first[::B])
        self.nrows, self.ncols = n, m
        self.n_dst_tiles, self.n_src_tiles = nd, ns
        self.num_steps = S
        self.n_ss = n_ss
        self.batch = B
        self.pad_ratio = S * 1024 / max(1, nnz)

    def tree_flatten(self):
        aux = (self.nrows, self.ncols, self.n_dst_tiles, self.n_src_tiles,
               self.num_steps, self.n_ss, self.batch, self.pad_ratio)
        return (self.locc, self.vals, self.rhi, self.dst_ids, self.src_ids,
                self.first, self.dst_ss, self.first_ss), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(DlSpmvPlan)

# per-step cost on v5e (us): measured 0.64-0.85 flat; dst-lane v6 (lane-axis
# dynamic_gather + B-chunk super-steps) ~0.09-0.11 us/chunk at B=8
_FLAT_STEP_COST = 0.80
_DL_STEP_COST = 0.10
# v6 super-step cost model: n_ss * (FIX + B*VAR), fitted to v5e slope
# measurements (B=8/16 on lap1000 + rand100k: per-ss 0.68us@B=8, 1.21@B=16)
_DL_FIX_US = 0.15
_DL_VAR_US = 0.066
# x must be fully VMEM-resident for per-chunk window slices (f32 bytes)
_X_VMEM_CAP = 8 * 2 ** 20
# XLA's take runs at ~120 M elem/s on v5e => ~8.5us per 1024 gathers; the
# one-hot kernel only wins while padded-step cost stays below that.
_XLA_GATHER_STEP_COST = 8.5


def onehot_cost_estimate(A):
    """Predicted us per 1024 nnz for the better one-hot layout (cheap: one
    sort pass, no plan construction) — compare against the XLA gather path
    before committing to SpmvAlgorithm.ONEHOT."""
    pad_flat, pad_dl = _onehot_pad_ratios(A)
    return min(pad_flat * _FLAT_STEP_COST, pad_dl * _DL_STEP_COST)


def _onehot_pad_ratios(A):
    return _onehot_pad_ratios_arrays(
        np.asarray(A.host_row_map(), dtype=np.int64),
        np.asarray(A.host_entries(), dtype=np.int64), A.nrows, A.ncols)


def _onehot_pad_ratios_arrays(rm, ent, nrows, ncols):
    """(pad_flat, pad_dl) without building either plan: one sort pass."""
    TD, TS = _OH_DST, _OH_SRC
    nnz = len(ent)
    if nnz == 0:
        return 1.0, 1.0
    ns = max(1, -(-ncols // TS))
    rows = np.repeat(np.arange(nrows, dtype=np.int64), rm[1:] - rm[:-1])
    run = (rows // TD) * ns + ent // TS
    lc = (rows % TD) % 128
    grp = np.sort(run * 128 + lc)
    gb = np.concatenate(([1], np.diff(grp) != 0))
    gcnt = np.diff(np.concatenate((np.nonzero(gb)[0], [nnz])))
    grun = grp[gb.astype(bool)] // 128
    # flat: chunks per run = ceil(run_nnz/1024); groups are run-contiguous
    rstarts = np.nonzero(np.concatenate(([1], np.diff(grun) != 0)))[0]
    rcnt = np.add.reduceat(gcnt, rstarts)
    pad_flat = np.ceil(rcnt / _OH_CH).sum() * _OH_CH / nnz
    # dst-lane: chunks per run = max over lane classes of ceil(cnt/8)
    cmax = np.maximum.reduceat(-(-gcnt // 8), rstarts)
    pad_dl = cmax.sum() * 1024 / nnz
    return float(pad_flat), float(pad_dl)


def build_onehot_spmv_plan(A, layout: str = "auto"):
    """Pick the cheaper one-hot layout by padded-step cost model."""
    if layout == "flat":
        return OneHotSpmvPlan(A)
    if layout == "dstlane":
        return DlSpmvPlan(A)
    if layout == "gt":
        return GtSpmvPlan(A)
    pad_flat, pad_dl = _onehot_pad_ratios(A)
    if pad_dl * _DL_STEP_COST <= pad_flat * _FLAT_STEP_COST:
        ns = max(1, -(-A.ncols // _OH_SRC))
        if ns * _OH_SRC * 4 <= _X_VMEM_CAP:
            return GtSpmvPlan(A)   # v7: g-table gather (x VMEM-resident)
        return DlSpmvPlan(A)
    return OneHotSpmvPlan(A)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "num_steps", "nrows", "interpret"))
def _onehot_call(dst_ids, src_ids, first, locr, locc, vals, x, *,
                 nd, ns, num_steps, nrows, interpret):
    TD, TS, CH = _OH_DST, _OH_SRC, _OH_CH
    SR = TS // 128
    m_pad = ns * TS
    x2 = jnp.pad(x.astype(jnp.float32), (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, locr_ref, locc_ref, v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        xp = _bf16_planes3(x_ref[:])
        locc2 = locc_ref[:].reshape(1, CH)
        hi = locc2 // 128                                            # (1,CH)
        lo = locc2 % 128
        oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0) == lo
                 ).astype(jnp.bfloat16)                              # (128,CH)
        dn = (((1,), (0,)), ((), ()))
        u = sum(jax.lax.dot_general(p, oh_lo, dn,
                                    preferred_element_type=jnp.float32)
                for p in xp)                                         # (SR,CH)
        xg = _sublane_gather(u, hi, SR, CH)                          # (1,CH)
        pv = v_ref[:].reshape(1, CH) * xg
        locr2 = locr_ref[:].reshape(1, CH)
        rhi = locr2 // 128
        rlo = locr2 % 128
        cmpb = (jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0) == rlo
                ).astype(jnp.bfloat16)
        oh_rhi = (jax.lax.broadcasted_iota(jnp.int32, (8, CH), 0) == rhi
                  ).astype(jnp.bfloat16)
        dn2 = (((1,), (1,)), ((), ()))
        # value planes multiply the SMALL (8,CH) one-hot, not the (128,CH)
        # one: p or 0 is bf16-exact either way, but this is 16x less VPU work
        contrib = sum(jax.lax.dot_general(oh_rhi * p, cmpb, dn2,
                                          preferred_element_type=jnp.float32)
                      for p in _bf16_planes3(pv))                    # (8,128)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = contrib

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, 128), lambda g, d, s, f: (d[0] * 0 + s[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel,
        name="tpukk_spmv_onehot_flat",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ids, src_ids, first, locr, locc, vals, x2)
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "num_steps", "nrows",
                                             "interpret"))
def _dl_call(dst_ids, src_ids, first, rhi, locc, vals, x, *,
             nd, ns, num_steps, nrows, interpret):
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    x2 = jnp.pad(x.astype(jnp.float32), (0, m_pad - x.shape[0])).reshape(ns * SR, 128)
    dn = (((1,), (0,)), ((), ()))

    def kernel(dst_ref, src_ref, first_ref, rhi_ref, locc_ref, v_ref,
               x_ref, y_ref):
        g = pl.program_id(0)
        X = x_ref[:]                                           # (SR,128)
        locc2, vals2, rhi2 = locc_ref[:], v_ref[:], rhi_ref[:]
        xg = _gather_rows(X, locc2 % 128, locc2 // 128, SR)    # (8,128)
        pv = vals2 * xg                                        # pure f32
        crows = [jnp.sum(jnp.where(rhi2 == d, pv, 0.0), axis=0, keepdims=True)
                 for d in range(8)]
        contrib = jnp.concatenate(crows, axis=0)               # (8,128)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = contrib

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, 128), lambda g, d, s, f: (s[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_onehot_dl",
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ids, src_ids, first, rhi, locc, vals, x2)
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B", "nrows",
                                             "interpret"))
def _dl_call_batched(dst_ss, src_ids, first_ss, rhi, locc, vals, x, *,
                     nd, ns, n_ss, B, nrows, interpret):
    """Kernel v6: one grid step = B chunks of ONE dst tile.  x is fully
    VMEM-resident (plan builder guarantees ns*TS*4 <= _X_VMEM_CAP); each
    chunk slices its (SR,128) window with pl.ds.  Amortizes the ~0.25us
    fixed grid-step cost measured on v5e (3-4x over the per-chunk grid)."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    x2 = jnp.pad(x.astype(jnp.float32), (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, rhi_ref, locc_ref, v_ref,
               x_ref, y_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            locc2 = locc_ref[j * 8:(j + 1) * 8, :]
            vals2 = v_ref[j * 8:(j + 1) * 8, :]
            rhi2 = rhi_ref[j * 8:(j + 1) * 8, :]
            xg = _gather_rows(X, locc2 % 128, locc2 // 128, SR)
            pv = vals2 * xg
            crows = [jnp.sum(jnp.where(rhi2 == d, pv, 0.0), axis=0,
                             keepdims=True) for d in range(8)]
            acc = acc + jnp.concatenate(crows, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = y_ref[:, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x fully resident
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_onehot_dl_ss",
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, rhi, locc, vals, x2)
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "num_steps", "nrows",
                                             "nrhs", "interpret"))
def _dl_mm_call(dst_ids, src_ids, first, rhi, locc, vals, x, *,
                nd, ns, num_steps, nrows, nrhs, interpret):
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    k = nrhs
    x3 = jnp.pad(x.astype(jnp.float32),
                 ((0, m_pad - x.shape[0]), (0, 0))).T.reshape(k, ns * SR, 128)
    dn = (((1,), (0,)), ((), ()))

    def kernel(dst_ref, src_ref, first_ref, rhi_ref, locc_ref, v_ref,
               x_ref, y_ref):
        g = pl.program_id(0)
        locc2, vals2, rhi2 = locc_ref[:], v_ref[:], rhi_ref[:]
        lo = locc2 % 128
        hi = locc2 // 128
        for c in range(k):
            xg = _gather_rows(x_ref[c], lo, hi, SR)
            pv = vals2 * xg
            crows = [jnp.sum(jnp.where(rhi2 == d, pv, 0.0), axis=0,
                             keepdims=True) for d in range(8)]
            contrib = jnp.concatenate(crows, axis=0)

            @pl.when(first_ref[g] == 1)
            def _():
                y_ref[c] = contrib

            @pl.when(first_ref[g] == 0)
            def _():
                y_ref[c] = y_ref[c] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SR, 128), lambda g, d, s, f: (0, s[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, 8, 128), lambda g, d, s, f: (0, d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y3 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmm_onehot_dl",
        out_shape=jax.ShapeDtypeStruct((k, nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ids, src_ids, first, rhi, locc, vals, x3)
    return y3.reshape(k, nd * TD)[:, :nrows].T.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B", "nrows",
                                             "nrhs", "interpret"))
def _dl_mm_call_batched(dst_ss, src_ids, first_ss, rhi, locc, vals, x, *,
                        nd, ns, n_ss, B, nrows, nrhs, interpret):
    """Multi-RHS v6: B chunks of one dst tile per grid step, all k column
    tiles of x VMEM-resident (caller gates k*ns*TS*4 <= _X_VMEM_CAP)."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    k = nrhs
    x3 = jnp.pad(x.astype(jnp.float32),
                 ((0, m_pad - x.shape[0]), (0, 0))).T.reshape(k, ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, rhi_ref, locc_ref, v_ref,
               x_ref, y_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(k)]
        for j in range(B):
            src = src_ref[g * B + j]
            locc2 = locc_ref[j * 8:(j + 1) * 8, :]
            vals2 = v_ref[j * 8:(j + 1) * 8, :]
            rhi2 = rhi_ref[j * 8:(j + 1) * 8, :]
            lo = locc2 % 128
            hi = locc2 // 128
            for c in range(k):
                xg = _gather_rows(x_ref[c, pl.ds(src * SR, SR), :], lo, hi, SR)
                pv = vals2 * xg
                crows = [jnp.sum(jnp.where(rhi2 == d, pv, 0.0), axis=0,
                                 keepdims=True) for d in range(8)]
                accs[c] = accs[c] + jnp.concatenate(crows, axis=0)
        for c in range(k):
            @pl.when(first_ref[g] == 1)
            def _(c=c):
                y_ref[c] = accs[c]

            @pl.when(first_ref[g] == 0)
            def _(c=c):
                y_ref[c] = y_ref[c] + accs[c]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x fully resident
        ],
        out_specs=pl.BlockSpec((k, 8, 128), lambda g, d, s, f: (0, d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y3 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmm_onehot_dl_ss",
        out_shape=jax.ShapeDtypeStruct((k, nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, rhi, locc, vals, x3)
    return y3.reshape(k, nd * TD)[:, :nrows].T.astype(x.dtype)


def onehot_spmv(plan, x, interpret: bool = False, reduce: str = "sum"):
    """y = A·x via the tiled one-hot kernel (vector x, f32).  reduce="max"
    computes a (max, ×) semiring row reduction instead (requires
    non-negative values/x: padding slots contribute the neutral 0) — used
    by the device MIS-2/graph rounds."""
    if isinstance(plan, GtSpmvPlan):
        if plan.layout == "gi4":
            G = getattr(plan, "group", 4)
            return _gi4_call_batched(plan.dst_ss, plan.src_ids,
                                     plan.first_ss, plan.gt, plan.vals, x,
                                     nd4=-(-plan.n_dst_tiles // G),
                                     ns=plan.n_src_tiles, n_ss=plan.n_ss,
                                     B=plan.batch, nrows=plan.nrows, G=G,
                                     reduce=reduce, interpret=interpret)
        if plan.layout == "dlp":
            lane_tab = plan.lo if plan.lo.shape[0] > 1 else None
            return _dlp_call_batched(plan.dst_ss, plan.src_ids,
                                     plan.first_ss, plan.cnt_ss, plan.gt,
                                     plan.rhi, plan.vals, lane_tab, x,
                                     nd=plan.n_dst_tiles,
                                     ns=plan.n_src_tiles, n_ss=plan.n_ss,
                                     B=plan.batch, nrows=plan.nrows,
                                     reduce=reduce, interpret=interpret)
        if plan.layout == "gi":
            return _gi_call_batched(plan.dst_ss, plan.src_ids, plan.first_ss,
                                    plan.cnt_ss, plan.gt, plan.lo, plan.vals,
                                    x, nd=plan.n_dst_tiles,
                                    ns=plan.n_src_tiles, n_ss=plan.n_ss,
                                    B=plan.batch, T=plan.n_tables,
                                    nrows=plan.nrows, reduce=reduce,
                                    interpret=interpret)
        return _gt_call_batched(plan.dst_ss, plan.src_ids, plan.first_ss,
                                plan.cnt_ss, plan.gt, plan.lo, plan.rhi,
                                plan.vals, x,
                                nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                                n_ss=plan.n_ss, B=plan.batch,
                                T=plan.n_tables, nrows=plan.nrows,
                                reduce=reduce, interpret=interpret)
    if reduce != "sum":
        raise NotImplementedError("reduce='max' needs the gt/gi plan layout")
    if isinstance(plan, DlSpmvPlan):
        if getattr(plan, "batch", 1) > 1:
            return _dl_call_batched(plan.dst_ss, plan.src_ids, plan.first_ss,
                                    plan.rhi, plan.locc, plan.vals, x,
                                    nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                                    n_ss=plan.n_ss, B=plan.batch,
                                    nrows=plan.nrows, interpret=interpret)
        return _dl_call(plan.dst_ids, plan.src_ids, plan.first,
                        plan.rhi, plan.locc, plan.vals, x,
                        nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                        num_steps=plan.num_steps, nrows=plan.nrows,
                        interpret=interpret)
    return _onehot_call(plan.dst_ids, plan.src_ids, plan.first,
                        plan.locr, plan.locc, plan.vals, x,
                        nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                        num_steps=plan.num_steps, nrows=plan.nrows,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "num_steps", "nrows",
                                             "nrhs", "interpret"))
def _onehot_spmm_call(dst_ids, src_ids, first, locr, locc, vals, x, *,
                      nd, ns, num_steps, nrows, nrhs, interpret):
    """Multi-RHS variant: the four one-hot masks are built once per chunk and
    reused for every column — the SpMM gather-amortization the reference gets
    from multivector SPMV_MV (spmv_impl.hpp MV functors)."""
    TD, TS, CH = _OH_DST, _OH_SRC, _OH_CH
    SR = TS // 128
    m_pad = ns * TS
    k = nrhs
    # (k, ns*SR, 128): per-column 2-D tiles, lanes on the fast axis
    x3 = jnp.pad(x.astype(jnp.float32),
                 ((0, m_pad - x.shape[0]), (0, 0))).T.reshape(k, ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, locr_ref, locc_ref, v_ref,
               x_ref, y_ref):
        g = pl.program_id(0)
        locc2 = locc_ref[:].reshape(1, CH)
        hi = locc2 // 128
        lo = locc2 % 128
        oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0) == lo
                 ).astype(jnp.bfloat16)
        locr2 = locr_ref[:].reshape(1, CH)
        rhi = locr2 // 128
        rlo = locr2 % 128
        cmpb = (jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0) == rlo
                ).astype(jnp.bfloat16)
        oh_rhi = (jax.lax.broadcasted_iota(jnp.int32, (8, CH), 0) == rhi
                  ).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        dn2 = (((1,), (1,)), ((), ()))
        v2 = v_ref[:].reshape(1, CH)
        for c in range(k):        # static unroll: masks shared across columns
            u = sum(jax.lax.dot_general(p, oh_lo, dn,
                                        preferred_element_type=jnp.float32)
                    for p in _bf16_planes3(x_ref[c]))                 # (SR,CH)
            xg = _sublane_gather(u, hi, SR, CH)                       # (1,CH)
            pv = v2 * xg
            contrib = sum(jax.lax.dot_general(oh_rhi * p, cmpb, dn2,
                                              preferred_element_type=jnp.float32)
                          for p in _bf16_planes3(pv))                 # (8,128)

            @pl.when(first_ref[g] == 1)
            def _():
                y_ref[c] = contrib

            @pl.when(first_ref[g] == 0)
            def _():
                y_ref[c] = y_ref[c] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda g, d, s, f: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, SR, 128), lambda g, d, s, f: (0, s[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, 8, 128), lambda g, d, s, f: (0, d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y3 = pl.pallas_call(
        kernel,
        name="tpukk_spmm_onehot_flat",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ids, src_ids, first, locr, locc, vals, x3)
    return y3.reshape(k, nd * _OH_DST)[:, :nrows].T.astype(x.dtype)


def onehot_spmm(plan, x, interpret: bool = False):
    """Y = A·X via the tiled one-hot kernel (X: (ncols, k), f32)."""
    if isinstance(plan, GtSpmvPlan):
        k = int(x.shape[1])
        if plan.layout in ("gi4", "dlp") and (
                plan.layout != "gi4" or getattr(plan, "group", 4) == 4):
            # the multi-RHS kernel hardcodes 4-tile gi blocks (dlp has no
            # quarter packing and is unaffected by the group)
            if (k * plan.n_src_tiles * _OH_SRC * 4 <= _X_VMEM_CAP
                    and plan.batch * k <= 128):
                lane_tab = plan.lo if plan.lo.shape[0] > 1 else None
                return _pk_mm_call_batched(
                    plan.dst_ss, plan.src_ids, plan.first_ss, plan.cnt_ss,
                    plan.gt, plan.rhi, plan.vals, lane_tab, x,
                    nd_out=(-(-plan.n_dst_tiles // 4)
                            if plan.layout == "gi4" else plan.n_dst_tiles),
                    ns=plan.n_src_tiles, n_ss=plan.n_ss, B=plan.batch,
                    nrows=plan.nrows, nrhs=k, layout=plan.layout,
                    interpret=interpret)
            cols = [onehot_spmv(plan, x[:, j], interpret=interpret)
                    for j in range(k)]
            return jnp.stack(cols, axis=1)
        if plan.layout == "gi4":
            # gi4 with group != 4 (auto-selected G=16 native plans): the
            # legacy _gt_mm_call_batched expects the T-table gi/gt stream
            # format, which native gi4 plans do not carry (src_ids packed
            # as (src<<4)|sub, pk-packed gt, placeholder lo) — route each
            # column through onehot_spmv, which handles any G.
            cols = [onehot_spmv(plan, x[:, j], interpret=interpret)
                    for j in range(k)]
            return jnp.stack(cols, axis=1)
        if (k * plan.n_src_tiles * _OH_SRC * 4 <= _X_VMEM_CAP
                and plan.batch * k <= 128):
            return _gt_mm_call_batched(
                plan.dst_ss, plan.src_ids, plan.first_ss, plan.cnt_ss,
                plan.gt, plan.lo, plan.rhi, plan.vals, x,
                nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                n_ss=plan.n_ss, B=plan.batch, T=plan.n_tables,
                nrows=plan.nrows, nrhs=k, gi=plan.layout == "gi",
                interpret=interpret)
        # per-column vector calls still use the v7 gather
        cols = [onehot_spmv(plan, x[:, j], interpret=interpret)
                for j in range(int(x.shape[1]))]
        return jnp.stack(cols, axis=1)
    if isinstance(plan, DlSpmvPlan):
        k = int(x.shape[1])
        if (getattr(plan, "batch", 1) > 1
                and k * plan.n_src_tiles * _OH_SRC * 4 <= _X_VMEM_CAP
                and plan.batch * k <= 64):  # unrolled B*k*SR gather loop
            return _dl_mm_call_batched(
                plan.dst_ss, plan.src_ids, plan.first_ss,
                plan.rhi, plan.locc, plan.vals, x,
                nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                n_ss=plan.n_ss, B=plan.batch, nrows=plan.nrows,
                nrhs=k, interpret=interpret)
        return _dl_mm_call(plan.dst_ids, plan.src_ids, plan.first,
                           plan.rhi, plan.locc, plan.vals, x,
                           nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                           num_steps=plan.num_steps, nrows=plan.nrows,
                           nrhs=int(x.shape[1]), interpret=interpret)
    return _onehot_spmm_call(plan.dst_ids, plan.src_ids, plan.first,
                             plan.locr, plan.locc, plan.vals, x,
                             nd=plan.n_dst_tiles, ns=plan.n_src_tiles,
                             num_steps=plan.num_steps, nrows=plan.nrows,
                             nrhs=int(x.shape[1]), interpret=interpret)


# ---------------------------------------------------------------------------
# Kernel v7: host-emitted gather table ("gt") collapses the SR-row select
# loop of v5/v6 into ONE sublane dynamic_gather + ONE lane dynamic_gather.
#
# Per chunk, a (8,128) table gt with gt[s, c] = source window ROW for slots
# of sublane s whose source LANE is c.  The kernel computes
#     t2[s,l] = X[gt[s,l], l]          (sublane gather, 4 blocks + selects)
#     xg[s,l] = t2[s, lo[s,l]]         (lane gather)
#            == X[gt[s, lo[s,l]], lo[s,l]] == X[hi[s,l], lo[s,l]]
# which requires gt[s, lo] == hi consistently: two slots in one (chunk,
# sublane) with the same source lane but DIFFERENT source rows conflict.
# The planner keeps the largest same-row group per (chunk, sublane, lane)
# cell and reschedules the overflow in further levels; a final level keys
# chunks by (run, hi) so every chunk shares one window row — conflict-free
# by construction, guaranteeing termination.

_GT_LEVELS = 5
_GT_FIX_US = 0.235      # per-super-step floor (probe round 2: stream count
                        # does NOT move it; only B amortizes it)
_GT_VAR_US = 0.030      # legacy dl chunk (T=1): 3-stream gather + scatter
_GT_VAR_GI_US = 0.015   # legacy gi chunk: 3-stream gather + accumulate
_GT_VAR_GI4_US = 0.0115  # v9 packed gather + 4-way quarter select (probe)
_GT_VAR_DLP_US = 0.022   # v9 packed gather + 8-way rhi scatter (estimate:
                         # probe packed 0.0069 + legacy scatter delta)
_GT_DUMMY_US = 0.004   # branch-skipped padding chunk (cnt_ss)


def _cell_rank(cell, hi):
    """Per-element rank of its (cell, hi) group within its cell, ranked by
    group size (0 = largest)."""
    n = len(cell)
    pair = cell * 64 + hi
    po = np.argsort(pair, kind="stable")
    pp = pair[po]
    pfirst = np.concatenate(([True], np.diff(pp) != 0))
    gsize = np.diff(np.concatenate((np.nonzero(pfirst)[0], [n])))
    gid = np.cumsum(pfirst) - 1            # group id per sorted-by-pair elem
    cell_of_g = pp[pfirst] // 64
    # packed-key argsort == lexsort((-gsize, cell_of_g)) but ~3x faster;
    # gsize <= nnz < 2^40/64 so the pack never overflows int64
    go = np.argsort(cell_of_g * (gsize.max() + 1) + (gsize.max() - gsize),
                    kind="stable")
    cg = cell_of_g[go]
    cfirst = np.concatenate(([1], (np.diff(cg) != 0).astype(np.int64)))
    cstart = np.nonzero(cfirst)[0]
    cid = np.cumsum(cfirst) - 1
    grank_go = np.arange(len(go), dtype=np.int64) - cstart[cid]
    grank = np.empty(len(gsize), np.int64)
    grank[go] = grank_go
    r = np.empty(n, np.int64)
    r[po] = grank[gid]
    return r


def _gt_level(run_key, lc, rhi_e, locc_e, vals_e, dt_e, st_e, T,
              sched=None, ranks=None):
    """One v7 scheduling level with T gather tables.  Per (chunk, sublane,
    src-lane) cell the T largest same-src-row groups are kept (table index =
    group rank, packed into lo's upper bits); the rest overflow.  Returns
    (lo_a [ti*128+lo], gt_a (S, T, 8, 128), vals_a, rhi_a, sdst, ssrc,
    overflow_mask_over_input).  sched/ranks allow reusing the T-selection
    pre-pass for level 0."""
    n = len(run_key)
    order, step_e, srow, rstart, nchunks, S = (
        sched if sched is not None else _dl_schedule(run_key, lc))
    lo_s = (locc_e % 128)[order]
    hi_s = (locc_e // 128)[order]
    if ranks is None:
        cell = (step_e * 8 + srow) * 128 + lo_s
        ranks = _cell_rank(cell, hi_s)
    ti = ranks                             # per element in SORTED order
    keep = ti < T
    # build arrays from kept slots (flat single-index scatters: the
    # multi-index fancy assignment recomputed strides per array)
    lo_a = np.zeros(S * 8 * 128, np.int32)
    gt_a = np.zeros(S * T * 8 * 128, np.int32)
    vals_a = np.zeros(S * 8 * 128, np.float32)
    rhi_a = np.zeros(S * 8 * 128, np.int32)
    se, sr, lcs = step_e[keep], srow[keep], lc[order][keep]
    flat = (se * 8 + sr) * 128 + lcs
    lo_a[flat] = (ti[keep] * 128 + lo_s[keep]).astype(np.int32)
    gt_a[((se * T + ti[keep]) * 8 + sr) * 128 + lo_s[keep]] = \
        hi_s[keep].astype(np.int32)
    vals_a[flat] = vals_e[order][keep]
    rhi_a[flat] = rhi_e[order][keep].astype(np.int32)
    lo_a = lo_a.reshape(S, 8, 128)
    gt_a = gt_a.reshape(S, T, 8, 128)
    vals_a = vals_a.reshape(S, 8, 128)
    rhi_a = rhi_a.reshape(S, 8, 128)
    sdst = np.repeat(dt_e[order][rstart], nchunks)
    ssrc = np.repeat(st_e[order][rstart], nchunks)
    ovf = np.zeros(n, bool)
    ovf[order] = ~keep
    return lo_a, gt_a, vals_a, rhi_a, sdst, ssrc, ovf


def _gt_place_native(run, lc, locc, vals_e, rhi_e, dt_e, st_e, T,
                     max_grow=4, lock_sublane=False):
    """Level 0 via the C++ conflict-aware greedy placer (native.gt_place):
    each element picks a (chunk, sublane) slot in its (run, lane) avoiding
    >T distinct source rows per gather-table cell.  Measured round 2: zero
    overflow at T=1 on the perf-suite matrices, vs the rank-based levels
    whose one-chunk-per-run floor inflated pad 4.12/1.60 -> 2.62/1.33
    (rand100k / lap1000).  Returns the same tuple as _gt_level, or None if
    the native library is unavailable."""
    from .. import native

    if not native.available():
        return None
    nnz = len(run)
    lo = (locc % 128).astype(np.int32)
    hi = (locc // 128).astype(np.int32)
    # sort by (run, lo, hi): same-source elements cluster so the greedy's
    # table-reuse pass sees them consecutively
    key = (run * 128 + lo) * 64 + hi
    order = np.argsort(key, kind="stable")
    run_s = run[order]
    rfirst = np.concatenate(([1], (np.diff(run_s) != 0).astype(np.int64)))
    rstart = np.nonzero(rfirst)[0]
    run_off = np.concatenate((rstart, [nnz]))
    res = native.gt_place(run_off, lc[order].astype(np.int32), lo[order],
                          hi[order], T, max_grow,
                          srow=rhi_e[order].astype(np.int32)
                          if lock_sublane else None)
    if res is None:
        return None
    c, s, ti, nch = res
    placed = c >= 0
    base = np.concatenate(([0], np.cumsum(nch.astype(np.int64))))
    rid = np.cumsum(rfirst) - 1
    step_e = base[rid] + c
    S = int(base[-1])
    lo_a = np.zeros(S * 8 * 128, np.int32)
    gt_a = np.zeros(S * T * 8 * 128, np.int32)
    vals_a = np.zeros(S * 8 * 128, np.float32)
    rhi_a = np.zeros(S * 8 * 128, np.int32)
    pe = step_e[placed]
    ps = s[placed].astype(np.int64)
    pl = lc[order][placed].astype(np.int64)
    plo = lo[order][placed].astype(np.int64)
    flat = (pe * 8 + ps) * 128 + pl
    lo_a[flat] = (ti[placed] * 128 + plo).astype(np.int32)
    gt_a[((pe * T + ti[placed]) * 8 + ps) * 128 + plo] = hi[order][placed]
    vals_a[flat] = vals_e[order][placed]
    rhi_a[flat] = rhi_e[order][placed].astype(np.int32)
    sdst = np.repeat(dt_e[order][rstart], nch)
    ssrc = np.repeat(st_e[order][rstart], nch)
    ovf = np.zeros(nnz, bool)
    ovf[order[~placed]] = True
    return (lo_a.reshape(S, 8, 128), gt_a.reshape(S, T, 8, 128),
            vals_a.reshape(S, 8, 128), rhi_a.reshape(S, 8, 128),
            sdst, ssrc, ovf)


def _dl_assign_lanes(run, rows, st, nd, ns, group_target: int = 1 << 30):
    """Group-scoped balanced lane assignment: each dst tile's runs are cut
    into consecutive GROUPS of ~group_target estimated chunks, and each
    group gets its OWN row->lane bijection (the per-super-step lane_tab
    stream un-permutes inside the kernel).  Scoping the assignment to a
    group removes cross-run coupling in the assignment.  Measured round 2
    (rand100k deg16): finer groups DO cut the placement estimate (4976
    natural -> 4083 at target 32) but conflict growth during placement
    eats the gain (real pad unchanged) while the group-partitioned
    super-steps pay the ~0.23us step floor more often — so the default is
    effectively whole-tile; the group machinery stays for experimentation.

    Returns (lane per nnz, tab (ngroups*8,128) jnp, group id per run-sorted
    unique run, run_keys) or None.  The C++ `tpukk_gt_assign_lanes` is
    reused unchanged by treating each GROUP as a pseudo dst tile."""
    from .. import native

    if not native.available():
        return None
    # unique (run, row) pair counts, run-major
    key = (run * np.int64(nd) * 1024 + rows)  # run-major, row within
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.concatenate(([True], np.diff(ks) != 0))
    pair_key = ks[first]
    pair_cnt = np.diff(np.concatenate((np.nonzero(first)[0], [len(ks)])))
    pair_run = pair_key // (np.int64(nd) * 1024)
    pair_row = pair_key % (np.int64(nd) * 1024)
    # unique runs + estimated chunks (natural lanes): ceil(max lane count/8)
    kdl = run * 128 + (rows % 128)
    u, c = np.unique(kdl, return_counts=True)
    urun = u // 128
    rstart = np.nonzero(np.concatenate(([1], np.diff(urun) != 0)))[0]
    run_keys = urun[rstart]
    est = np.ceil(np.maximum.reduceat(c, rstart) / 8).astype(np.int64)
    # consecutive grouping per tile, cut at ~group_target cumulative chunks
    tile_of = run_keys // ns
    cs = np.cumsum(est)
    tfirst = np.concatenate(([1], (np.diff(tile_of) != 0).astype(np.int64)))
    tstart = np.nonzero(tfirst)[0]
    tile_id = np.cumsum(tfirst) - 1
    base = (cs[tstart] - est[tstart])[tile_id]
    within = cs - base
    sub = np.maximum(0, (within - 1) // group_target)
    _, group_of_run = np.unique(tile_id * (int(sub.max()) + 1) + sub,
                                return_inverse=True)
    group_of_run = group_of_run.astype(np.int64)
    ngroups = int(group_of_run.max()) + 1
    # pseudo-tile pair data: pseudo_row = group*1024 + (row % 1024)
    run_idx = np.searchsorted(run_keys, pair_run)
    pg = group_of_run[run_idx]
    pseudo_row = pg * 1024 + (pair_row % 1024)
    porder = np.argsort(pseudo_row, kind="stable")
    pseudo_row = pseudo_row[porder]
    p_st = (pair_run[porder] % ns).astype(np.int32)
    p_cnt = pair_cnt[porder].astype(np.int32)
    pair_off = np.zeros(ngroups * 1024 + 1, np.int64)
    np.add.at(pair_off, pseudo_row + 1, 1)
    pair_off = np.cumsum(pair_off)
    out_lane = native.gt_assign_lanes(ngroups, ns, pair_off, p_st, p_cnt)
    if out_lane is None:
        return None
    # lane per nnz: group of its run, then pseudo-row lookup
    nnz_run_idx = np.searchsorted(run_keys, run)
    nnz_group = group_of_run[nnz_run_idx]
    lane = out_lane[nnz_group * 1024 + (rows % 1024)].astype(np.int64)
    return (lane, jnp.asarray(out_lane.reshape(ngroups * 8, 128)),
            group_of_run, run_keys)


class GtSpmvPlan:
    """v7/v9 gather-table plan (dst-lane or identity-scatter layout +
    per-chunk g-tables + super-steps; v9 packs gt+lo into one int32 stream
    and adds 4-tile output grouping / balanced lane assignment).  Requires
    x VMEM-resident; build_onehot_spmv_plan falls back to DlSpmvPlan
    otherwise."""

    def __init__(self, A, *, _fields=None, force_gi=False, force_dl=False,
                 no_lane_tab=False, force_batch=None, force_group=None):
        if _fields is not None:
            (self.lo, self.gt, self.vals, self.rhi, self.src_ids,
             self.dst_ss, self.first_ss, self.cnt_ss, self.nrows, self.ncols,
             self.n_dst_tiles, self.n_src_tiles, self.num_steps, self.n_ss,
             self.batch, self.pad_ratio, self.real_pad_ratio, self.n_levels,
             self.n_tables, self.layout, self.group) = _fields
            return
        TD, TS = _OH_DST, _OH_SRC
        SR = TS // 128
        rm = np.asarray(A.host_row_map(), dtype=np.int64)
        ent = np.asarray(A.host_entries(), dtype=np.int64)
        vals = np.asarray(A.host_values(), dtype=np.float32)
        n, m = A.nrows, A.ncols
        nd = max(1, -(-n // TD))
        ns = max(1, -(-m // TS))
        nnz = len(ent)
        # v9 fast path: the whole stream build in C++ (tpukk_gt_build —
        # expansion, radix sort, layout cost model, placement, batching,
        # packing) — O(nnz) native instead of chained numpy sorts (round 3:
        # lap1000 16.4 s -> sub-second).  The Python path below remains for
        # native-lib absence, placement overflow (multi-level fallback) and
        # the dlp balanced-lane-map variant.
        if nnz and not int(os.environ.get("TPUKK_NO_NATIVE_GT", "0")):
            from .. import native

            if native.available():
                fl = 1 if force_gi else (2 if force_dl else 0)
                res = native.gt_build(
                    rm, ent, n, m, TD, TS, force_layout=fl,
                    max_grow_gi=16 if force_gi else 8, max_grow_dl=4,
                    force_batch=int(force_batch or 0),
                    use_lane_tab=not no_lane_tab,
                    force_group=int(force_group or 0),
                    fix_us=_GT_FIX_US, var_gi4=_GT_VAR_GI4_US,
                    var_dlp=_GT_VAR_DLP_US)
                if res is not None:
                    self._init_from_native(res, vals, n, m, nnz)
                    return
        rows = np.repeat(np.arange(n, dtype=np.int64), rm[1:] - rm[:-1])
        dt = rows // TD
        st = ent // TS
        locr = rows - dt * TD
        lc = locr % 128
        rhi_e = locr // 128
        locc = ent - st * TS
        run = dt * ns + st

        # level 0: C++ conflict-aware greedy placement at T=1 (measured
        # round 2: zero overflow on the suite matrices AND the cheapest
        # kernel — one gather table).  Fallback when the native lib is
        # unavailable: rank-based levels with T chosen for <=0.5% overflow.
        parts = []
        rem = np.ones(nnz, bool) if nnz else np.zeros(0, bool)
        levels = 0
        T = 1
        layout = "dl"
        out0 = None
        lane_tab = None
        lane_groups = None
        if nnz:
            # layout choice: identity-scatter ("gi"/v9 "gi4", slot sublane
            # == dst sublane, scatter = plain accumulate + 4-tile grouped
            # output) vs dst-lane ("dl"/v9 "dlp", 8-way masked-reduction
            # scatter + balanced lane assignment).  gi chunks/run = max
            # per-ROW count, dl = max per-lane count / 8; gi wins when rows
            # spread their nnz thinly across runs (structured patterns).
            kdl = run * 128 + lc
            u, c = np.unique(kdl, return_counts=True)
            rs = np.nonzero(np.concatenate(([1], np.diff(u // 128) != 0)))[0]
            chunks_dl = int(np.ceil(np.maximum.reduceat(c, rs) / 8).sum())
            kgi = run * 1024 + locr
            u, c = np.unique(kgi, return_counts=True)
            rs = np.nonzero(np.concatenate(([1], np.diff(u // 1024) != 0)))[0]
            chunks_gi = int(np.maximum.reduceat(c, rs).sum())
            if not force_dl and (
                    force_gi
                    or chunks_gi * _GT_VAR_GI4_US < chunks_dl * _GT_VAR_DLP_US):
                out0 = _gt_place_native(run, lc, locc, vals, rhi_e, dt, st,
                                        T, max_grow=16 if force_gi else 8,
                                        lock_sublane=True)
                if out0 is not None:
                    layout = "gi"
                    if out0[6].any():
                        # guarantee-level slots cannot honor the sublane
                        # lock; pathological conflicts fall back to dl
                        out0, layout = None, "dl"
            if out0 is None and force_gi:
                # ds caller requires the gi layout: signal via the levels
                # fallback (layout stays dl -> builder returns None)
                pass
            elif out0 is None:
                # balanced per-run-group lane assignment (C++): kills the
                # Poisson max-lane skew that sets dl's chunks/run; the
                # output lane un-permute is one XLA lane gather (lane_tab)
                lc_use = lc
                asg = None if no_lane_tab else _dl_assign_lanes(run, rows, st, nd, ns)
                if asg is not None:
                    lc2, tab2, grp_of_run, run_keys = asg
                    k2 = run * 128 + lc2
                    u2, c2 = np.unique(k2, return_counts=True)
                    rs2 = np.nonzero(np.concatenate(
                        ([1], np.diff(u2 // 128) != 0)))[0]
                    chunks_dl2 = int(np.ceil(
                        np.maximum.reduceat(c2, rs2) / 8).sum())
                    if chunks_dl2 < chunks_dl:
                        lc_use, lane_tab = lc2, tab2
                        lane_groups = (grp_of_run, run_keys)
                out0 = _gt_place_native(run, lc_use, locc, vals, rhi_e,
                                        dt, st, T)
                if out0 is not None and out0[6].any() and lane_tab is not None:
                    # overflow under the assigned lanes: retry natural
                    out0 = _gt_place_native(run, lc, locc, vals, rhi_e,
                                            dt, st, T)
                    lane_tab, lane_groups = None, None
        if out0 is not None:
            parts.append(out0[:6])
            levels = 1
            rem = out0[6]
            start_lvl = 1
        else:
            T = 3
            start_lvl = 0
            if nnz:
                sched0 = _dl_schedule(run, lc)
                order0, step0, srow0 = sched0[0], sched0[1], sched0[2]
                cell0 = (step0 * 8 + srow0) * 128 + (locc % 128)[order0]
                ranks0 = _cell_rank(cell0, (locc // 128)[order0])
                for t in (1, 2, 3):
                    if (ranks0 >= t).mean() <= 0.005:
                        T = t
                        break
        for lvl in range(start_lvl, _GT_LEVELS + 1):
            if not rem.any():
                break
            idx = np.nonzero(rem)[0]
            key = run[idx] if lvl < _GT_LEVELS else run[idx] * SR + (locc[idx] // 128)
            out = _gt_level(key, lc[idx], rhi_e[idx], locc[idx], vals[idx],
                            dt[idx], st[idx], T,
                            sched=sched0 if lvl == 0 else None,
                            ranks=ranks0 if lvl == 0 else None)
            parts.append(out[:6])
            levels += 1
            rem2 = np.zeros(nnz, bool)
            rem2[idx[out[6]]] = True
            rem = rem2
        if parts:
            lo_a = np.concatenate([p[0] for p in parts])
            gt_a = np.concatenate([p[1] for p in parts])
            vals_a = np.concatenate([p[2] for p in parts])
            rhi_a = np.concatenate([p[3] for p in parts])
            sdst = np.concatenate([p[4] for p in parts])
            ssrc = np.concatenate([p[5] for p in parts])
        else:
            lo_a = np.zeros((0, 8, 128), np.int32)
            gt_a = np.zeros((0, T, 8, 128), np.int32)
            vals_a = np.zeros((0, 8, 128), np.float32)
            rhi_a = np.zeros((0, 8, 128), np.int32)
            sdst = np.zeros(0, np.int64)
            ssrc = np.zeros(0, np.int64)
        # v9 packed path: single-table placement succeeded with no overflow
        # levels -> pack gt+lo into one int32 stream and use the probe-tuned
        # kernels (_gi4_call_batched / _dlp_call_batched)
        v9 = levels == 1 and T == 1 and parts and start_lvl == 1
        if v9:
            layout = "gi4" if layout == "gi" else "dlp"
        valid = np.ones(len(sdst), bool)  # real chunks (vs init dummies)
        # dummy steps for dst tiles with no chunks (output init)
        missing = np.setdiff1d(np.arange(nd, dtype=np.int64), np.unique(sdst),
                               assume_unique=True)
        if len(missing):
            sdst = np.concatenate([sdst, missing])
            ssrc = np.concatenate([ssrc, np.zeros(len(missing), np.int64)])
            lo_a = np.concatenate([lo_a, np.zeros((len(missing), 8, 128), np.int32)])
            gt_a = np.concatenate([gt_a, np.zeros((len(missing), T, 8, 128), np.int32)])
            vals_a = np.concatenate([vals_a, np.zeros((len(missing), 8, 128), np.float32)])
            rhi_a = np.concatenate([rhi_a, np.zeros((len(missing), 8, 128), np.int32)])
            valid = np.concatenate([valid, np.zeros(len(missing), bool)])
        # dst-major chunk order (stable keeps level locality)
        ordc = np.argsort(sdst, kind="stable")
        sdst, ssrc = sdst[ordc], ssrc[ordc]
        lo_a, gt_a, vals_a, rhi_a = lo_a[ordc], gt_a[ordc], vals_a[ordc], rhi_a[ordc]
        valid = valid[ordc]
        S = len(sdst)
        ssub = sdst % 4  # gi4 quarter within the 4-tile output block

        # super-step schedule (B by cost model); gi4 groups FOUR dst tiles
        # per output block so B can grow ~4x on matrices whose per-tile
        # chunk counts are small (the ~0.23us step floor dominates there).
        # dlp-with-lane-maps partitions super-steps by lane-map GROUP (each
        # ss reads its group's lane_tab via the tabidx scalar stream).
        tabidx_chunk = None
        if layout == "gi4":
            gids = sdst // 4
        elif lane_groups is not None and layout == "dlp":
            grp_of_run, run_keys = lane_groups
            crun = sdst * ns + ssrc
            ok_run = np.searchsorted(run_keys, crun)
            ok_run = np.minimum(ok_run, max(0, len(run_keys) - 1))
            cgrp = np.where(
                (len(run_keys) > 0) & (run_keys[ok_run] == crun),
                grp_of_run[ok_run], -1)
            # dummy chunks (missing tiles) get fresh identity-map groups
            n_main = int(grp_of_run.max()) + 1 if len(grp_of_run) else 0
            dummy = cgrp < 0
            if dummy.any():
                dt_d = sdst[dummy]
                ud, inv = np.unique(dt_d, return_inverse=True)
                cgrp[dummy] = n_main + inv
                ident = np.tile(np.arange(128, dtype=np.int32)[None, :],
                                (len(ud) * 8, 1))
                lane_tab = jnp.concatenate(
                    [lane_tab, jnp.asarray(ident)], axis=0)
            tabidx_chunk = cgrp
            gids = cgrp
        else:
            gids = sdst
        counts = np.diff(np.concatenate((
            np.nonzero(np.concatenate(([1], (gids[1:] != gids[:-1])
                                       .astype(np.int64))))[0], [S])))
        B = 1
        best = float("inf")
        var = {"gi4": _GT_VAR_GI4_US, "dlp": _GT_VAR_DLP_US,
               "gi": _GT_VAR_GI_US * T}.get(layout, _GT_VAR_US * T)
        for cand in range(1, 33):
            nss_c = int(np.ceil(counts / cand).sum())
            # padding chunks compute zeros at full rate (a branch-skip via
            # scratch-ref accumulator measured 45% SLOWER than wasting them:
            # the VMEM round-trip defeats register accumulation)
            cost = nss_c * (_GT_FIX_US + cand * var)
            if cost < best:
                best, B = cost, cand
        if force_batch is not None:
            # SPMD stacking (dist/) needs one B across all shards' plans
            B = int(force_batch)
        if B > 1:
            padc = (-counts) % B
            tot = counts + padc
            starts = np.concatenate(([0], np.cumsum(tot)))[:-1]
            gb = np.concatenate(([0], np.cumsum(counts)))
            gid = np.repeat(np.arange(len(counts)), tot)
            within = np.arange(int(tot.sum()), dtype=np.int64) - starts[gid]
            cidx = np.where(within < counts[gid], gb[gid] + within, S)
            lo_a = np.concatenate([lo_a, np.zeros((1, 8, 128), np.int32)])[cidx]
            gt_a = np.concatenate([gt_a, np.zeros((1, T, 8, 128), np.int32)])[cidx]
            vals_a = np.concatenate([vals_a, np.zeros((1, 8, 128), np.float32)])[cidx]
            rhi_a = np.concatenate([rhi_a, np.zeros((1, 8, 128), np.int32)])[cidx]
            ssrc = np.concatenate([ssrc, [0]])[cidx]
            ssub = np.concatenate([ssub, [0]])[cidx]
            valid = np.concatenate([valid, [False]])[cidx]
            sdst = sdst[gb[gid]]
            gids = gids[gb[gid]]
            S = len(cidx)
        # output-block id per super-step (first/init breaks on THIS, not on
        # the ss-partition id: dlp lane-map groups subdivide a tile and
        # must keep accumulating into it)
        out_pc = sdst // 4 if layout == "gi4" else sdst
        gss = out_pc[::B]
        first = np.ones(len(gss), np.int32)
        first[1:] = (gss[1:] != gss[:-1]).astype(np.int32)
        tabidx_ss = (gids[::B].astype(np.int32)
                     if tabidx_chunk is not None else None)
        # valid chunks are contiguous at the front of each super-step
        # (B-group padding appends at the tail): the legacy kernels skip
        # the rest by branching on cnt_ss; v9 padding chunks compute zeros
        cnt = valid.reshape(S // B, B).sum(axis=1).astype(np.int32)
        if v9:
            pk = ((gt_a.reshape(S, 8, 128) << 7) | lo_a).astype(np.int32)
            self.gt = jnp.asarray(pk.reshape(S * 8, 128))
            self.lo = (lane_tab if layout == "dlp" and lane_tab is not None
                       else jnp.zeros((1, 128), jnp.int32))
            self.rhi = (jnp.asarray(rhi_a.reshape(S * 8, 128))
                        if layout == "dlp"
                        else jnp.zeros((1, 128), jnp.int32))
            # 4-bit sub field (matches the native builder's G<=16 contract)
            src_pack = (ssrc << 4) | ssub if layout == "gi4" else ssrc
            self.src_ids = jnp.asarray(src_pack.astype(np.int32))
        else:
            self.lo = jnp.asarray(lo_a.reshape(S * 8, 128))
            self.gt = jnp.asarray(gt_a.reshape(S * T * 8, 128))
            self.rhi = jnp.asarray(rhi_a.reshape(S * 8, 128))
            self.src_ids = jnp.asarray(ssrc.astype(np.int32))
        self.vals = jnp.asarray(vals_a.reshape(S * 8, 128))
        self.dst_ss = jnp.asarray(gss.astype(np.int32))
        self.first_ss = jnp.asarray(first)
        # cnt_ss: legacy kernels branch on per-ss valid counts; the v9
        # dlp-with-lane-maps kernel repurposes the slot for the per-ss
        # lane-map GROUP index (tab stream BlockSpec index)
        self.cnt_ss = jnp.asarray(tabidx_ss if tabidx_ss is not None
                                  else cnt)
        self.nrows, self.ncols = n, m
        self.n_dst_tiles, self.n_src_tiles = nd, ns
        self.num_steps = S
        self.n_ss = S // B
        self.batch = B
        self.pad_ratio = S * 1024 / max(1, nnz)
        self.real_pad_ratio = int(valid.sum()) * 1024 / max(1, nnz)
        self.n_levels = levels
        self.n_tables = T
        self.layout = layout
        self.group = 4  # python builder: fixed 4-tile gi blocks

    @classmethod
    def from_host_streams(cls, res, nrows, ncols, nnz):
        """Plan from a build_gt_streams_host result (res carries the value
        plane already) — no CsrMatrix needed; used by callers that built
        their matrix as raw host arrays (dist/, coloring's selection
        matrix)."""
        self = object.__new__(cls)
        self._init_from_native(res, None, nrows, ncols, nnz)
        return self

    def _init_from_native(self, res, vals_host, n, m, nnz):
        """Fill the plan fields from a tpukk_gt_build result; the per-slot
        element-index map stays on the host (host_eidx) so value planes —
        incl. the double-single LO plane — are one numpy gather away."""
        S, B, n_ss = res["S"], res["B"], res["n_ss"]
        layout = res["layout"]
        eidx = res["eidx"]
        if vals_host is None:
            vplane = res["vals"]  # precomputed by build_gt_streams_host
        else:
            vplane = np.zeros(S * 1024, np.float32)
            selm = eidx >= 0
            vplane[selm] = vals_host[eidx[selm]]
        self.gt = jnp.asarray(np.ascontiguousarray(
            res["pk"].reshape(S * 8, 128)))
        self.vals = jnp.asarray(np.ascontiguousarray(
            vplane.reshape(S * 8, 128)))
        self.rhi = (jnp.asarray(res["rhi"].reshape(S * 8, 128))
                    if layout == "dlp" else jnp.zeros((1, 128), jnp.int32))
        tab = res.get("lane_tab")
        # dlp balanced-lane maps: lo carries the per-tile un-permute table,
        # cnt_ss the per-super-step tabidx (== dst tile for whole-tile maps)
        self.lo = (jnp.asarray(tab.reshape(-1, 128))
                   if tab is not None else jnp.zeros((1, 128), jnp.int32))
        self.src_ids = jnp.asarray(res["src_ids"])
        self.dst_ss = jnp.asarray(res["dst_ss"])
        self.first_ss = jnp.asarray(res["first_ss"])
        self.cnt_ss = jnp.asarray(res["cnt_ss"])
        self.nrows, self.ncols = n, m
        self.n_dst_tiles, self.n_src_tiles = res["nd"], res["ns"]
        self.num_steps = S
        self.n_ss = n_ss
        self.batch = B
        self.pad_ratio = S * 1024 / max(1, nnz)
        self.real_pad_ratio = res["n_valid"] * 1024 / max(1, nnz)
        self.n_levels = 1
        self.n_tables = 1
        self.layout = layout
        self.group = res.get("G", 4) or 4  # gi output-block tiles
        self.host_eidx = eidx  # host-only; not part of the pytree

    def tree_flatten(self):
        aux = (self.nrows, self.ncols, self.n_dst_tiles, self.n_src_tiles,
               self.num_steps, self.n_ss, self.batch, self.pad_ratio,
               self.real_pad_ratio, self.n_levels, self.n_tables, self.layout,
               self.group)
        return (self.lo, self.gt, self.vals, self.rhi, self.src_ids,
                self.dst_ss, self.first_ss, self.cnt_ss), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, _fields=(*children, *aux))


jax.tree_util.register_pytree_node_class(GtSpmvPlan)


def build_gt_streams_host(rm, ent, vals, nrows, ncols, *, force_gi=False,
                          force_dl=False, force_batch=None,
                          force_group=None):
    """Native v9 stream build from raw host CSR arrays, returning HOST numpy
    streams + meta (no device transfer) — used by dist/ to assemble stacked
    per-part plans without round-tripping anything through the (possibly
    remote) device.  None when the native builder is unavailable or falls
    back."""
    from .. import native

    if int(os.environ.get("TPUKK_NO_NATIVE_GT", "0")) or not native.available():
        return None
    rm = np.asarray(rm, dtype=np.int64)
    ent = np.asarray(ent, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    if not len(ent):
        return None
    fl = 1 if force_gi else (2 if force_dl else 0)
    res = native.gt_build(rm, ent, nrows, ncols, _OH_DST, _OH_SRC,
                          force_layout=fl,
                          max_grow_gi=16 if force_gi else 8, max_grow_dl=4,
                          force_batch=int(force_batch or 0),
                          use_lane_tab=False,  # SPMD stacking: no tab streams
                          force_group=int(force_group or 0),
                          fix_us=_GT_FIX_US, var_gi4=_GT_VAR_GI4_US,
                          var_dlp=_GT_VAR_DLP_US)
    if res is None:
        return None
    eidx = res["eidx"]
    vplane = np.zeros(res["S"] * 1024, np.float32)
    selm = eidx >= 0
    vplane[selm] = vals[eidx[selm]]
    res["vals"] = vplane.reshape(res["S"] * 8, 128)
    res["pk"] = res["pk"].reshape(res["S"] * 8, 128)
    if res["rhi"] is not None:
        res["rhi"] = res["rhi"].reshape(res["S"] * 8, 128)
    return res


def _pk_gather(X, pk, SR):
    """xg[s,l] = X[gt[s, lo], lo] with gt/lo PACKED in one int32 stream
    (pk = gt*128 + lo, T=1 only): hoisted bit-ops make each 8-row block
    3 vector ops (take/cmp/sel) instead of 7 — probe-measured round 2 at
    6.9ns per (8,128) chunk vs 14.3ns for the 3-stream clip-form gather
    (scripts/probe_ss_cost.py)."""
    gt_and = (pk >> 7) & 7
    gt_blk = pk >> 10
    lo = pk & 127
    t2 = jnp.zeros(pk.shape, jnp.float32)
    for b in range(SR // 8):
        blk = X[b * 8:(b + 1) * 8, :]
        tb = jnp.take_along_axis(blk, gt_and, axis=0)
        t2 = jnp.where(gt_blk == b, tb, t2)
    return jnp.take_along_axis(t2, lo, axis=1)


@functools.partial(jax.jit, static_argnames=("nd4", "ns", "n_ss", "B",
                                             "nrows", "G", "reduce",
                                             "interpret", "out2d"))
def _gi4_call_batched(dst_ss, srcsub_ids, first_ss, pk, vals, x, *,
                      nd4, ns, n_ss, B, nrows, G=4, reduce="sum", interpret,
                      out2d=False):
    """v9 identity-scatter kernel: packed gt+lo stream (2 streams/chunk) and
    a (32,128) output block covering FOUR dst tiles — per-chunk sub (packed
    into srcsub upper bits) selects the 8-row quarter.  The 4-tile grouping
    lets B grow ~4x on matrices whose per-tile chunk counts are small
    (structured patterns), amortizing the ~0.23us grid-step floor.

    x may arrive pre-shaped (ns*SR, 128) — the kernel-table layout — to
    skip the 1-D→2-D relayout copy (a real ~2x-stream cost on TPU); with
    out2d the result stays in that layout too (rows [:ceil(nrows/128)])."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    if x.ndim == 2:
        x2 = x.astype(jnp.float32)
    else:
        x2 = jnp.pad(x.astype(jnp.float32),
                     (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, srcsub_ref, first_ref, pk_ref, v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(G)]
        for j in range(B):
            ss = srcsub_ref[g * B + j]
            src = ss >> 4
            sub = ss & (G - 1)
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            pv = v_ref[sl, :] * _pk_gather(X, pk_ref[sl, :], SR)
            for q in range(G):
                upd = accs[q] + pv if reduce == "sum" \
                    else jnp.maximum(accs[q], pv)
                accs[q] = jnp.where(sub == q, upd, accs[q])
        acc = jnp.concatenate(accs, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = (y_ref[:, :] + acc if reduce == "sum"
                           else jnp.maximum(y_ref[:, :], acc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * 8, 128), lambda g, d, s, f: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_gi4",
        out_shape=jax.ShapeDtypeStruct((nd4 * G * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, srcsub_ids, first_ss, pk, vals, x2)
    if out2d:
        return y2[: -(-nrows // 128)]
    return y2.reshape(nd4 * G * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("off4", "ns", "n_ss", "B", "G",
                                             "omega", "interpret"))
def _gi4_gs_fused_batched(dst_ss, srcsub_ids, first_ss, last_ss, pk, vals,
                          b2, invd2, mask2, x2, *, off4, ns, n_ss, B,
                          G, omega, interpret):
    """Colored-GS color step fused into the v9 gi4 kernel: accumulates the
    color block's y = A_offdiag·x per output group and, at each group's LAST
    super-step, applies  xnew = (1-ω)·xb + ω·invd·(b - y)  (mask-guarded)
    directly into the ALIASED extended-x buffer (input_output_aliases) — the
    distributed GS color loop then updates x in place instead of copying the
    full local vector per color (round-4: the slice/concat variants paid
    ~2 full-x streams per color; cf. the reference's PSGS color-permuted
    update, sparse/impl/KokkosSparse_gauss_seidel_impl.hpp:128).

    x2: (ns*SR, 128) kernel-table layout, rows [off4*G*8, off4*G*8 + Rc/128)
    hold this color's block.  b2: (>=rows, 128) full local b in the same
    layout.  invd2/mask2: (Rc/128, 128) for this color.  Unwritten rows of
    the aliased output keep x2's values (verified: compiled AND interpret).
    Gathers never read the color's own rows (distance-1 coloring excludes
    same-color neighbors), so in-place is exact."""
    SR = _OH_SRC // 128

    def kernel(dst_ref, srcsub_ref, first_ref, last_ref, pk_ref, v_ref,
               b_ref, invd_ref, mask_ref, x_ref, y_ref, xb_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(G)]
        for j in range(B):
            ss = srcsub_ref[g * B + j]
            src = ss >> 4
            sub = ss & (G - 1)
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            pv = v_ref[sl, :] * _pk_gather(X, pk_ref[sl, :], SR)
            for q in range(G):
                accs[q] = jnp.where(sub == q, accs[q] + pv, accs[q])
        acc = jnp.concatenate(accs, axis=0)
        is_first = first_ref[g] == 1
        is_last = last_ref[g] == 1
        # at a block's first step the (aliased, revisit-loaded) out block
        # still holds the OLD x rows — capture them in scratch for the
        # epilogue (a dynamic x_ref slice here measured ~10us/call extra)
        old = y_ref[:, :]

        @pl.when(is_first)
        def _():
            xb_ref[:, :] = old

        tot = jnp.where(is_first, acc, old + acc)

        @pl.when(jnp.logical_not(is_last))
        def _():
            y_ref[:, :] = tot

        @pl.when(is_last)
        def _():
            xb = xb_ref[:, :]
            xnew = ((1.0 - omega) * xb
                    + omega * invd_ref[:, :] * (b_ref[:, :] - tot))
            y_ref[:, :] = jnp.where(mask_ref[:, :] > 0, xnew, xb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, l: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, l: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 8, 128), lambda g, d, s, f, l: (off4 + d[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 8, 128), lambda g, d, s, f, l: (d[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 8, 128), lambda g, d, s, f, l: (d[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * 8, 128), lambda g, d, s, f, l:
                               (off4 + d[g], 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * 8, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_gs_gi4_fused",
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        # 9 = x2's position in the flattened inputs (scalars included)
        input_output_aliases={9: 0},
        interpret=interpret,
    )(dst_ss, srcsub_ids, first_ss, last_ss, pk, vals, b2, invd2, mask2, x2)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B",
                                             "nrows", "reduce", "interpret",
                                             "out2d"))
def _dlp_call_batched(dst_ss, src_ids, first_ss, tabidx_ss, pk, rhi, vals,
                      lane_tab, x,
                      *, nd, ns, n_ss, B, nrows, reduce="sum", interpret,
                      out2d=False):
    """v9 dst-lane kernel: packed gt+lo stream + 8-way rhi scatter; when the
    C++ balanced lane assignment replaced the natural row%128 lanes, the
    per-super-step partial sum is lane-un-permuted INSIDE the kernel (one
    Mosaic take_along_axis per super-step, lane_tab streamed per dst tile).
    Sum/max commute with the gather so per-super-step un-permute is exact.
    An XLA-side take_along_axis on the output was 6x SLOWER than the whole
    kernel (XLA scalarizes TPU gathers — measured round 2, rand100k
    920us vs 155us modeled)."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    has_tab = lane_tab is not None
    if x.ndim == 2:       # pre-shaped kernel-table layout (see _gi4 docstring)
        x2 = x.astype(jnp.float32)
    else:
        x2 = jnp.pad(x.astype(jnp.float32),
                     (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, tabidx_ref, *refs):
        if has_tab:
            pk_ref, rhi_ref, v_ref, tab_ref, x_ref, y_ref = refs
        else:
            pk_ref, rhi_ref, v_ref, x_ref, y_ref = refs
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            pv = v_ref[sl, :] * _pk_gather(X, pk_ref[sl, :], SR)
            rhi2 = rhi_ref[sl, :]
            # NOTE (round 4): an XOR-butterfly sublane scatter (3 static
            # shuffles) is INCORRECT here — elements merging at an
            # intermediate row can carry divergent remaining routes, and
            # once summed they cannot split.  The masked 8-way reduction
            # is the exact form; only a placement-level capacity
            # constraint (= the gi layout) removes it.
            red = jnp.sum if reduce == "sum" else jnp.max
            crows = [red(jnp.where(rhi2 == d, pv, 0.0), axis=0,
                         keepdims=True) for d in range(8)]
            con = jnp.concatenate(crows, axis=0)
            acc = acc + con if reduce == "sum" else jnp.maximum(acc, con)
        if has_tab:
            acc = jnp.take_along_axis(acc, tab_ref[:, :], axis=1)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = (y_ref[:, :] + acc if reduce == "sum"
                           else jnp.maximum(y_ref[:, :], acc))

    stream = pl.BlockSpec((8 * B, 128), lambda g, d, s, f, t: (g, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [stream, stream, stream]
    args = [pk, rhi, vals]
    if has_tab:
        # per-ss lane-map group via the tabidx scalar stream
        in_specs.append(pl.BlockSpec((8, 128),
                                     lambda g, d, s, f, t: (t[g], 0),
                                     memory_space=pltpu.VMEM))
        args.append(lane_tab)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(x2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f, t: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_dlp",
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, tabidx_ss, *args)
    if out2d:
        return y2[: -(-nrows // 128)]
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


def _gt_gather(X, gts, lop, SR, T):
    """xg[s,l] = X[gts[ti][s, lo], lo] with lop = ti*128 + lo (table index
    packed in the upper bits): per table, one sublane gather per 8-row block
    + one lane gather, then select by ti."""
    lo = lop % 128
    ti = lop // 128
    xg = None
    for t in range(T):
        gt = gts[t * 8:(t + 1) * 8, :]
        t2 = jnp.zeros(gt.shape, jnp.float32)
        for b in range(SR // 8):
            blk = X[b * 8:(b + 1) * 8, :]
            tb = jnp.take_along_axis(blk, jnp.clip(gt - b * 8, 0, 7), axis=0)
            t2 = jnp.where((gt // 8) == b, tb, t2)
        xgt = jnp.take_along_axis(t2, lo, axis=1)
        xg = xgt if xg is None else jnp.where(ti == t, xgt, xg)
    return xg


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B", "T",
                                             "nrows", "reduce", "interpret"))
def _gt_call_batched(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, rhi, vals, x,
                     *, nd, ns, n_ss, B, T, nrows, reduce="sum", interpret):
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    x2 = jnp.pad(x.astype(jnp.float32), (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, cnt_ref, gt_ref, lo_ref, rhi_ref,
               v_ref, x_ref, y_ref):
        # register accumulation (a scratch-ref acc measured 45% slower:
        # VMEM round-trip per chunk defeats Mosaic's register allocation);
        # padding chunks have zero vals and compute zeros
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            xg = _gt_gather(X, gt_ref[j * 8 * T:(j + 1) * 8 * T, :],
                            lo_ref[sl, :], SR, T)
            pv = v_ref[sl, :] * xg
            rhi2 = rhi_ref[sl, :]
            red = jnp.sum if reduce == "sum" else jnp.max
            crows = [red(jnp.where(rhi2 == d, pv, 0.0), axis=0,
                         keepdims=True) for d in range(8)]
            con = jnp.concatenate(crows, axis=0)
            acc = acc + con if reduce == "sum" else jnp.maximum(acc, con)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = (y_ref[:, :] + acc if reduce == "sum"
                           else jnp.maximum(y_ref[:, :], acc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * T * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f, c: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_gt",
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, rhi, vals, x2)
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B", "T",
                                             "nrows", "reduce", "interpret"))
def _gi_call_batched(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, vals, x,
                     *, nd, ns, n_ss, B, T, nrows, reduce="sum", interpret):
    """Identity-scatter variant: slot sublane == dst sublane (planner lock),
    so the per-chunk contribution is a plain accumulate — no 8-way masked
    reduction and no rhi table (one less (8,128) stream per chunk)."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    x2 = jnp.pad(x.astype(jnp.float32), (0, m_pad - x.shape[0])).reshape(ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, cnt_ref, gt_ref, lo_ref,
               v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(B):
            src = src_ref[g * B + j]
            X = x_ref[pl.ds(src * SR, SR), :]
            sl = slice(j * 8, (j + 1) * 8)
            xg = _gt_gather(X, gt_ref[j * 8 * T:(j + 1) * 8 * T, :],
                            lo_ref[sl, :], SR, T)
            pv = v_ref[sl, :] * xg
            acc = acc + pv if reduce == "sum" else jnp.maximum(acc, pv)

        @pl.when(first_ref[g] == 1)
        def _():
            y_ref[:, :] = acc

        @pl.when(first_ref[g] == 0)
        def _():
            y_ref[:, :] = (y_ref[:, :] + acc if reduce == "sum"
                           else jnp.maximum(y_ref[:, :], acc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * T * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, d, s, f, c: (d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_gi",
        out_shape=jax.ShapeDtypeStruct((nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, vals, x2)
    return y2.reshape(nd * TD)[:nrows].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd", "ns", "n_ss", "B", "T",
                                             "nrows", "nrhs", "gi",
                                             "interpret"))
def _gt_mm_call_batched(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, rhi, vals,
                        x, *, nd, ns, n_ss, B, T, nrows, nrhs, gi, interpret):
    """Multi-RHS gt kernel; gi=True uses the identity-scatter accumulate
    (planner sublane lock) instead of the 8-way masked reduction."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    k = nrhs
    x3 = jnp.pad(x.astype(jnp.float32),
                 ((0, m_pad - x.shape[0]), (0, 0))).T.reshape(k, ns * SR, 128)

    def kernel(dst_ref, src_ref, first_ref, cnt_ref, gt_ref, lo_ref, rhi_ref,
               v_ref, x_ref, y_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(k)]
        for j in range(B):
            src = src_ref[g * B + j]
            sl = slice(j * 8, (j + 1) * 8)
            gtj = gt_ref[j * 8 * T:(j + 1) * 8 * T, :]
            loj = lo_ref[sl, :]
            vj = v_ref[sl, :]
            rhij = None if gi else rhi_ref[sl, :]
            for c in range(k):
                xg = _gt_gather(x_ref[c, pl.ds(src * SR, SR), :], gtj,
                                loj, SR, T)
                pv = vj * xg
                if gi:
                    accs[c] = accs[c] + pv
                else:
                    crows = [jnp.sum(jnp.where(rhij == d, pv, 0.0),
                                     axis=0, keepdims=True)
                             for d in range(8)]
                    accs[c] = accs[c] + jnp.concatenate(crows, axis=0)
        for c in range(k):
            @pl.when(first_ref[g] == 1)
            def _(c=c):
                y_ref[c] = accs[c]

            @pl.when(first_ref[g] == 0)
            def _(c=c):
                y_ref[c] = y_ref[c] + accs[c]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * T * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, 8, 128),
                               lambda g, d, s, f, c: (0, d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y3 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmm_gi" if gi else "tpukk_spmm_gt",
        out_shape=jax.ShapeDtypeStruct((k, nd * 8, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, src_ids, first_ss, cnt_ss, gt, lo, rhi, vals, x3)
    return y3.reshape(k, nd * TD)[:, :nrows].T.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("nd_out", "ns", "n_ss", "B",
                                             "nrows", "nrhs", "layout",
                                             "interpret"))
def _pk_mm_call_batched(dst_ss, srcsub_ids, first_ss, tabidx_ss, pk, rhi,
                        vals, lane_tab, x, *, nd_out, ns, n_ss, B, nrows,
                        nrhs, layout, interpret):
    """Multi-RHS v9 kernel: packed gt+lo stream; layout 'gi4' accumulates
    into a (k,32,128) four-tile block, 'dlp' does the 8-way rhi reduction
    into (k,8,128) with optional output lane un-permute."""
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS
    k = nrhs
    gi4 = layout == "gi4"
    QT = 4 if gi4 else 1
    has_tab = lane_tab is not None
    x3 = jnp.pad(x.astype(jnp.float32),
                 ((0, m_pad - x.shape[0]), (0, 0))).T.reshape(k, ns * SR, 128)

    def kernel(dst_ref, srcsub_ref, first_ref, tabidx_ref, *refs):
        if has_tab:
            pk_ref, rhi_ref, v_ref, tab_ref, x_ref, y_ref = refs
        else:
            pk_ref, rhi_ref, v_ref, x_ref, y_ref = refs
        g = pl.program_id(0)
        accs = [[jnp.zeros((8, 128), jnp.float32) for _ in range(QT)]
                for _ in range(k)]
        for j in range(B):
            ss = srcsub_ref[g * B + j]
            src = ss >> 4 if gi4 else ss   # 4-bit sub field
            sub = ss & 3
            sl = slice(j * 8, (j + 1) * 8)
            pkj = pk_ref[sl, :]
            vj = v_ref[sl, :]
            rhij = None if gi4 else rhi_ref[sl, :]
            for c in range(k):
                pv = vj * _pk_gather(x_ref[c, pl.ds(src * SR, SR), :],
                                     pkj, SR)
                if gi4:
                    for q in range(QT):
                        accs[c][q] = jnp.where(sub == q, accs[c][q] + pv,
                                               accs[c][q])
                else:
                    crows = [jnp.sum(jnp.where(rhij == d, pv, 0.0),
                                     axis=0, keepdims=True)
                             for d in range(8)]
                    accs[c][0] = accs[c][0] + jnp.concatenate(crows, axis=0)
        for c in range(k):
            acc = jnp.concatenate(accs[c], axis=0) if gi4 else accs[c][0]
            if has_tab:
                acc = jnp.take_along_axis(acc, tab_ref[:, :], axis=1)

            @pl.when(first_ref[g] == 1)
            def _(c=c, acc=acc):
                y_ref[c] = acc

            @pl.when(first_ref[g] == 0)
            def _(c=c, acc=acc):
                y_ref[c] = y_ref[c] + acc

    OB = 32 if gi4 else 8
    stream = pl.BlockSpec((8 * B, 128), lambda g, d, s, f, t: (g, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [stream, stream, stream]
    args = [pk, rhi, vals]
    if has_tab:
        in_specs.append(pl.BlockSpec((8, 128),
                                     lambda g, d, s, f, t: (t[g], 0),
                                     memory_space=pltpu.VMEM))
        args.append(lane_tab)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(x3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ss,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, OB, 128),
                               lambda g, d, s, f, t: (0, d[g], 0),
                               memory_space=pltpu.VMEM),
    )
    y3 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name=f"tpukk_spmm_{layout}",
        out_shape=jax.ShapeDtypeStruct((k, nd_out * OB, 128), jnp.float32),
        interpret=interpret,
    )(dst_ss, srcsub_ids, first_ss, tabidx_ss, *args)
    return y3.reshape(k, nd_out * OB * 128)[:, :nrows].T.astype(x.dtype)


# ---------------------------------------------------------------------------
# Unstructured f64 SpMV: double-single (two-f32) gather-table kernel.
# BASELINE config 1's scalar is double; the DIA ds kernel only covers
# banded patterns.  This is the gi4 kernel carrying (hi, lo) value planes
# and (hi, lo) x planes with Dekker two_prod + compensated (two_sum)
# accumulation per slot — the sublane-locked (gi) placement is FORCED so
# the per-quarter accumulate stays a masked plain add (the dl 8-way
# reduction cannot be compensated without re-ordering the sum).
# Reference analog: double is the default ETI scalar
# (cmake/KokkosKernels_config.h.in:44-105).
# ---------------------------------------------------------------------------

class OnehotDsPlan:
    """GtSpmvPlan locked to the gi4 layout + full-precision (hi, lo) f32
    value planes.  None-able builder: use `build_onehot_ds_plan`."""

    def __init__(self, base: "GtSpmvPlan", vals_hi, vals_lo):
        self.base = base
        self.vals_hi = vals_hi
        self.vals_lo = vals_lo

    def tree_flatten(self):
        return (self.base, self.vals_hi, self.vals_lo), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(OnehotDsPlan)


def build_onehot_ds_plan(A):
    """Double-single plan for an arbitrary-pattern CSR matrix with f64
    values; None when the native placer is unavailable, the gi placement
    overflows, or x would not be VMEM-resident.

    The lo-plane slot values come from REPLAYING the plan build with the lo
    values: placement is value-independent and fully deterministic (C++
    greedy + stable sorts), so both builds produce identical slot layouts —
    no slot-source plumbing needed (2x symbolic cost, zero extra state)."""
    from ..containers.csr import CsrMatrix

    ns = max(1, -(-A.ncols // _OH_SRC))
    if 2 * ns * _OH_SRC * 4 > _X_VMEM_CAP:
        return None  # both x planes must be VMEM-resident
    # host_values() is the f32-NARROWED device mirror when x64 is off (the
    # TPU configuration this path exists for); the f64 originals live in
    # host_values_full().  Splitting the narrowed copy would make vl == 0
    # and silently compute at f32 accuracy.
    v64 = np.asarray(A.host_values_full(), np.float64)
    vh = v64.astype(np.float32)
    vl = (v64 - vh.astype(np.float64)).astype(np.float32)
    rm, ent = A.host_row_map(), A.host_entries()
    Ah = CsrMatrix.from_arrays(rm, ent, vh, nrows=A.nrows, ncols=A.ncols)
    base = GtSpmvPlan(Ah, force_gi=True, force_group=4)  # ds kernel is G=4
    if base.layout != "gi4":
        return None
    eidx = getattr(base, "host_eidx", None)
    if eidx is not None:
        # native build exposes the slot -> element map: the lo plane is one
        # numpy gather, no plan replay needed
        lop = np.zeros(eidx.shape[0], np.float32)
        selm = eidx >= 0
        lop[selm] = vl[eidx[selm]]
        return OnehotDsPlan(base, base.vals,
                            jnp.asarray(lop.reshape(-1, 128)))
    Al = CsrMatrix.from_arrays(rm, ent, vl, nrows=A.nrows, ncols=A.ncols)
    low = GtSpmvPlan(Al, force_gi=True, force_group=4)
    if low.layout != "gi4" or low.vals.shape != base.vals.shape:
        return None
    return OnehotDsPlan(base, base.vals, low.vals)


def _ds_two_sum(s, p):
    """(s', err) = two_sum(s, p) with Mosaic-safe barriers."""
    t = _fp_barrier(s + p)
    bb = _fp_barrier(t - s)
    e = _fp_barrier((s - _fp_barrier(t - bb)) + _fp_barrier(p - bb))
    return t, e


@functools.partial(jax.jit, static_argnames=("nd4", "ns", "n_ss", "B",
                                             "nrows", "interpret"))
def _gi4_ds_call_batched(dst_ss, srcsub_ids, first_ss, pk, vh, vl,
                         xh, xl, *, nd4, ns, n_ss, B, nrows, interpret):
    TD, TS = _OH_DST, _OH_SRC
    SR = TS // 128
    m_pad = ns * TS

    def pad2(v):
        return jnp.pad(v.astype(jnp.float32),
                       (0, m_pad - v.shape[0])).reshape(ns * SR, 128)

    xh2, xl2 = pad2(xh), pad2(xl)

    def kernel(dst_ref, srcsub_ref, first_ref, pk_ref, vh_ref, vl_ref,
               xh_ref, xl_ref, ys_ref, ye_ref):
        g = pl.program_id(0)
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(4)]
        acce = [jnp.zeros((8, 128), jnp.float32) for _ in range(4)]
        for j in range(B):
            ss = srcsub_ref[g * B + j]
            src = ss >> 4      # 4-bit sub field (ds plans force G=4)
            sub = ss & 3
            sl = slice(j * 8, (j + 1) * 8)
            pkj = pk_ref[sl, :]
            Xh = xh_ref[pl.ds(src * SR, SR), :]
            Xl = xl_ref[pl.ds(src * SR, SR), :]
            gh = _pk_gather(Xh, pkj, SR)
            gl = _pk_gather(Xl, pkj, SR)
            ah = vh_ref[sl, :]
            al = vl_ref[sl, :]
            p = _fp_barrier(ah * gh)
            # Dekker two_prod(ah, gh) via 12-bit bitmask splits.  (Negative
            # result, round 3: Mosaic does NOT contract any mul+add/sub
            # pattern into an fma — `a*b - barrier(a*b)` is exactly 0 in
            # every form probed — so the 1-op FMA residual is unavailable.)
            a1, a2 = _f32_split12(ah)
            b1, b2 = _f32_split12(gh)
            e = ((_fp_barrier(a1 * b1) - p) + a1 * b2 + a2 * b1) + a2 * b2
            e = e + ah * gl + al * gh
            for q in range(4):
                m = jnp.where(sub == q, 1.0, 0.0).astype(jnp.float32)
                s2, err = _ds_two_sum(accs[q], p * m)
                accs[q] = s2
                acce[q] = acce[q] + err + e * m
        acc_s = jnp.concatenate(accs, axis=0)
        acc_e = jnp.concatenate(acce, axis=0)

        @pl.when(first_ref[g] == 1)
        def _():
            ys_ref[:, :] = acc_s
            ye_ref[:, :] = acc_e

        @pl.when(first_ref[g] == 0)
        def _():
            s2 = _fp_barrier(ys_ref[:, :] + acc_s)
            bb = _fp_barrier(s2 - ys_ref[:, :])
            err = _fp_barrier((ys_ref[:, :] - _fp_barrier(s2 - bb))
                              + _fp_barrier(acc_s - bb))
            ys_ref[:, :] = s2
            ye_ref[:, :] = ye_ref[:, :] + acc_e + err

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ss,),
        in_specs=[
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * B, 128), lambda g, d, s, f: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((32, 128), lambda g, d, s, f: (d[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda g, d, s, f: (d[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        )
    ys, ye = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        name="tpukk_spmv_gi4_ds",
        out_shape=[jax.ShapeDtypeStruct((nd4 * 32, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nd4 * 32, 128), jnp.float32)],
        interpret=interpret,
    )(dst_ss, srcsub_ids, first_ss, pk, vh, vl, xh2, xl2)
    n4 = nd4 * 4 * TD
    return ys.reshape(n4)[:nrows], ye.reshape(n4)[:nrows]


def onehot_spmv_ds_planes(plan: OnehotDsPlan, xh, xl,
                          interpret: bool = False):
    """(y_sum, y_err) f32 pair for arbitrary-pattern f64 SpMV; y = sum at
    f64 by the caller (x64-free device path)."""
    b = plan.base
    return _gi4_ds_call_batched(
        b.dst_ss, b.src_ids, b.first_ss, b.gt, plan.vals_hi, plan.vals_lo,
        xh, xl, nd4=-(-b.n_dst_tiles // 4), ns=b.n_src_tiles, n_ss=b.n_ss,
        B=b.batch, nrows=b.nrows, interpret=interpret)


def onehot_spmv_ds(plan: OnehotDsPlan, x, interpret: bool = False):
    """y = A·x for f64 A/x through the gather-table double-single kernel
    (~1e-13 rel).  Host-side split/combine — works with x64 disabled."""
    xh, xl = ds_split_f64(np.asarray(x))
    ys, ye = onehot_spmv_ds_planes(plan, jnp.asarray(xh), jnp.asarray(xl),
                                   interpret=interpret)
    return np.asarray(ys, np.float64) + np.asarray(ye, np.float64)
