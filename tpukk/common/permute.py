"""Static permutation router — plan-time Beneš/Slepian–Duguid routing of a
host-known permutation into 3 row-local gather passes + 2 XLA transposes.

``permute_via_sort`` (common.utils) pays a runtime key-sort every apply even
though the permutation is known at plan time.  This module routes the
permutation once on the host (C++ Euler-split edge coloring,
``native.permute_route``) through an (R, C) grid:

    phase 1: permute within each source row      (pad-free local gather)
    transpose (R, C) -> (C, R)                   (XLA, HBM-speed)
    phase 2: permute within each column-row
    transpose back
    phase 3: permute within each dest row

Each phase is a Pallas kernel whose gathers stay inside one row tile — no
conflict machinery, no padding.  Measured round 2 (v5e): ~15-70x over the
runtime sort for multi-million-element permutations (see PERF_NOTES).

Reference analog: the data-motion half of the KKMEM SpGEMM accumulator
(sparse/impl/KokkosSparse_spgemm_impl_kkmem.hpp) and every color/level
permutation the reference applies via parallel scatter; TPUs have no fast
scatter, so the permutation becomes a routed gather network instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .utils import permute_via_sort

__all__ = ["StaticPermutePlan", "build_permute_plan", "static_permute"]

_C = 1024          # grid columns (power of two; row tile = (8, 128))
_MAX_N = 1 << 24   # beyond this the int32 tables / host routing get heavy


def _gather_in_row(X, tt, SRR):
    """out[s, l] = X[tt[s,l] >> 7, tt[s,l] & 127] for X (SRR, 128), tt
    (8, 128): per-source-sublane broadcast + lane gather + select (the
    _gather_rows pattern of spmv_pallas, v5 probe).  NOTE two chained
    take_along_axis calls can NOT replace this loop for per-target 2-D
    indices: the second gather reads the other coordinate's plane at the
    substituted row, which is a different target's index — the 3-stage
    packed factorization (_rowperm3_call) is the fast path instead."""
    hi = tt >> 7
    lo = tt & 127
    xg = jnp.zeros(tt.shape, jnp.float32)
    for r in range(SRR):
        row = jnp.broadcast_to(X[r:r + 1, :], tt.shape)
        g = jnp.take_along_axis(row, lo, axis=1)
        xg = jnp.where(hi == r, g, xg)
    return xg


def _pack_row_stages(t_rows, SRR):
    """Inner-factor every row permutation into (lane, sublane, lane) stages
    and pack the three index planes into ONE i32 table.

    t_rows: (n_rows, SRR*128) row-local source positions (a permutation of
    [0, SRR*128) per row).  The inner factorization is the same
    Slepian–Duguid routing as the outer network (native.permute_route with
    an (SRR, 128) grid): stage a permutes lanes within each sublane-row,
    stage b permutes sublanes within each lane (vertical), stage c permutes
    lanes — so the kernel gather is 2 lane-axis dynamic_gathers + one
    blocked vertical gather instead of an SRR-iteration broadcast loop.
    Packed: bits 0-6 stage-a lane, 7-13 stage-b sublane, 14-20 stage-c
    lane (each plane indexed at its own stage's output position)."""
    from .. import native

    out = native.permute_route_rows(t_rows.astype(np.int64), SRR)
    if out is not None:
        return out
    n_rows = t_rows.shape[0]
    out = np.empty((n_rows, SRR * 128), np.int32)
    for r in range(n_rows):
        route = native.permute_route(SRR, 128, t_rows[r].astype(np.int64))
        if route is None:
            return None
        i1, i2, i3 = route
        sig = i2.reshape(128, SRR).T.reshape(-1)
        out[r] = (i1.astype(np.int32) | (sig.astype(np.int32) << 7)
                  | (i3.astype(np.int32) << 14))
    return out


@functools.partial(jax.jit, static_argnames=("n_rows", "SRR", "B",
                                             "interpret"))
def _rowperm3_call(x2, ptab, *, n_rows, SRR, B, interpret):
    """Row-local permutation via the packed 3-stage tables: per (SRR,128)
    row — lane gather, blocked vertical gather (nb² vreg select pairs),
    lane gather.  ~3 ops per 8-row block instead of 3 per row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = -(-SRR // 8)

    def kernel(t_ref, x_ref, y_ref):
        for j in range(B):
            X = x_ref[j * SRR:(j + 1) * SRR, :]
            tab = t_ref[j * SRR:(j + 1) * SRR, :]
            if SRR < nb * 8:
                # Mosaic's dynamic_gather wants whole (8,128) vregs:
                # zero-pad the sub-vreg remainder before the takes
                zf = jnp.zeros((nb * 8 - SRR, 128), jnp.float32)
                zi = jnp.zeros((nb * 8 - SRR, 128), jnp.int32)
                X = jnp.concatenate([X, zf], axis=0)
                tab = jnp.concatenate([tab, zi], axis=0)
            a1 = tab & 127
            sig = (tab >> 7) & 127
            a3 = (tab >> 14) & 127
            z1 = jnp.take_along_axis(X, a1, axis=1)
            rows = []
            for ob in range(nb):
                sig_b = sig[ob * 8:(ob + 1) * 8, :]         # (8,128)
                acc = jnp.zeros((8, 128), jnp.float32)
                for sb in range(nb):
                    g = jnp.take_along_axis(
                        z1[sb * 8:(sb + 1) * 8, :],
                        jnp.clip(sig_b - sb * 8, 0, 7), axis=0)
                    acc = jnp.where((sig_b >> 3) == sb, g, acc)
                rows.append(acc)
            z2 = jnp.concatenate(rows, axis=0) if nb > 1 else rows[0]
            z3 = jnp.take_along_axis(z2, a3, axis=1)
            y_ref[j * SRR:(j + 1) * SRR, :] = z3[:SRR]

    spec = pl.BlockSpec((B * SRR, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // B,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * SRR, 128), jnp.float32),
        name="tpukk_rowperm3",
        interpret=interpret,
    )(ptab, x2)


@functools.partial(jax.jit, static_argnames=("n_rows", "SRR", "B",
                                             "interpret"))
def _rowperm_call(x2, tt, *, n_rows, SRR, B, interpret):
    """Permute within rows: x2/tt (n_rows*SRR, 128); row r's slots gather
    x2[r*SRR + idx>>7, idx&127] with idx = tt row-local."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(t_ref, x_ref, y_ref):
        for j in range(B):
            X = x_ref[j * SRR:(j + 1) * SRR, :]
            for o in range(-(-SRR // 8)):
                r0, r1 = o * 8, min(SRR, o * 8 + 8)
                sl = slice(j * SRR + r0, j * SRR + r1)
                y_ref[sl, :] = _gather_in_row(X, t_ref[sl, :], SRR)

    grid = n_rows // B
    spec = pl.BlockSpec((B * SRR, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * SRR, 128), jnp.float32),
        name="tpukk_rowperm",
        interpret=interpret,
    )(tt, x2)


@jax.tree_util.register_pytree_node_class
class StaticPermutePlan:
    """Routing tables for out[i] = x[src[i]] on an (R, C=1024) grid.
    packed3: tables are the 3-stage packed form consumed by _rowperm3_call
    (lane/sublane/lane dynamic_gathers); else hi*128+lo per-row tables for
    the broadcast-loop kernel."""

    def __init__(self, t1, t2, t3, n, R, *, packed3=False, _from_tree=False):
        self.t1, self.t2, self.t3 = t1, t2, t3
        self.n = n
        self.R = R
        self.packed3 = packed3

    def tree_flatten(self):
        return (self.t1, self.t2, self.t3), (self.n, self.R, self.packed3)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1], packed3=aux[2],
                   _from_tree=True)


def build_permute_plan(src, *, _force=False):
    """Plan for the static gather out[i] = x[src[i]] (src a permutation).
    Returns None when the native router is unavailable or the size is out
    of range (callers fall back to permute_via_sort)."""
    from .. import native

    src = np.asarray(src, np.int64)
    n = len(src)
    if not native.available() or n > _MAX_N or (n < _C * 1024 and not _force):
        return None  # small n: the runtime sort is already cheap
    # phase-2 rows have length R viewed (R//128, 128) -> R must be a
    # multiple of 128 (was 1024, which padded 622k-element permutes to 1M)
    rows = -(-n // _C)
    R = max(128, -(-rows // 128) * 128)
    N = R * _C
    if n < N:  # pad with identity on the tail
        src = np.concatenate([src, np.arange(n, N, dtype=np.int64)])
    route = native.permute_route(R, _C, src)
    if route is None:
        return None
    t1, t2, t3 = route

    # inner-factor each row permutation into 3 packed stages (fast kernel);
    # fall back to the hi*128+lo tables + broadcast-loop kernel if the
    # inner router balks
    p1 = _pack_row_stages(t1.reshape(R, _C), _C // 128)
    p2 = _pack_row_stages(t2.reshape(_C, R), R // 128) \
        if p1 is not None else None
    p3 = _pack_row_stages(t3.reshape(R, _C), _C // 128) \
        if p2 is not None else None

    def pack(t, rows, rowlen):
        t = t.astype(np.int32)  # already the in-row index
        return jnp.asarray(t.reshape(rows * (rowlen // 128), 128))

    if p3 is not None:
        return StaticPermutePlan(
            jnp.asarray(p1.reshape(R * (_C // 128), 128)),
            jnp.asarray(p2.reshape(_C * (R // 128), 128)),
            jnp.asarray(p3.reshape(R * (_C // 128), 128)), n, R, packed3=True)
    return StaticPermutePlan(pack(t1, R, _C), pack(t2, _C, R),
                             pack(t3, R, _C), n, R)


def static_permute(plan, x, keys=None, interpret: bool = False):
    """Apply the routed permutation (f32 path); with plan None, fall back to
    ``permute_via_sort(x, keys)``."""
    if plan is None:
        return permute_via_sort(x, keys)
    R, n = plan.R, plan.n
    N = R * _C
    dt = x.dtype
    call = _rowperm3_call if plan.packed3 else _rowperm_call
    # B=16 for the SRR=8 phases: B=8's 8KB blocks left the kernel
    # DMA-issue-bound (measured 265 -> 41.5 us at 4.5M on v5e); phase 2's
    # bigger rows already saturate at B=8
    b13 = 16 if plan.packed3 and R % 16 == 0 else 8
    xp = jnp.pad(x.astype(jnp.float32), (0, N - x.shape[0]))
    y1 = call(xp.reshape(R * 8, 128), plan.t1, n_rows=R, SRR=8,
              B=b13, interpret=interpret)
    y1t = y1.reshape(R, _C).T.reshape(_C * (R // 128), 128)
    SRR2 = R // 128
    # block rows = B*SRR2 must be a multiple of 8 (Mosaic block constraint)
    y2 = call(y1t, plan.t2, n_rows=_C, SRR=SRR2, B=8,
              interpret=interpret)
    y2t = y2.reshape(_C, R).T.reshape(R * 8, 128)
    y3 = call(y2t, plan.t3, n_rows=R, SRR=8, B=b13,
              interpret=interpret)
    return y3.reshape(-1)[:n].astype(dt)
