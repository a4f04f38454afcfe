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

import functools

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
    W = round_up(max(span, 1), 128)
    win = C + W
    assert x_full.shape[0] == n_pad + W, (x_full.shape, n_pad, W)
    dtype = diags[0].dtype

    def kernel(x_ref, *rest):
        d_refs = rest[:k]
        y_ref = rest[k]
        scratch, sem = rest[k + 1], rest[k + 2]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * C, win)], scratch, sem)
        cp.start()
        cp.wait()
        acc = d_refs[0][:] * scratch[pl.ds(offsets[0] - off_min, C)]
        for j in range(1, k):
            acc = acc + d_refs[j][:] * scratch[pl.ds(offsets[j] - off_min, C)]
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM) for _ in range(k)],
        out_specs=pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
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
        self.W = round_up(max(span, 1), 128)

    def tree_flatten(self):
        aux = (self.offsets, self.nrows, self.ncols, self.n_pad, self.chunk, self.W)
        return tuple(self.dlist), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_fields=(list(children), *aux))


def build_dia_pallas_plan(dia_plan, chunk: int = 128 * 1024) -> DiaPallasPlan:
    return DiaPallasPlan(dia_plan, chunk)


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


def apply(handle, x):
    """Dispatch for the Pallas DIA path from the handle layer."""
    plan = handle._plan("dia_pallas")
    if x.ndim == 2:
        # multivector: column-at-a-time (dense-RHS fusion is a later round)
        cols = [dia_spmv(plan, x[:, j]) for j in range(x.shape[1])]
        return jnp.stack(cols, axis=1)
    return dia_spmv(plan, x)
