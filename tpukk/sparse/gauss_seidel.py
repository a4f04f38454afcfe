"""Gauss-Seidel / SOR smoothers — analog of
sparse/src/KokkosSparse_gauss_seidel.hpp (symbolic :46, numeric :175, apply
:465/707/952) with the GSAlgorithm taxonomy of gauss_seidel_handle.hpp:30
({DEFAULT, PERMUTED/POINT, TEAM, CLUSTER, TWOSTAGE}).

TPU design:

* POINT (color-permuted, the reference's PSGS,
  KokkosSparse_gauss_seidel_impl.hpp:128,199): symbolic colors the graph and
  *permutes the matrix into color-block ELL form*; apply iterates color
  blocks with contiguous static-slice updates of the permuted x — no
  scatters, the color-set parallelism of SURVEY.md §2.10 with the update
  as one fused gather+reduce per color.
* TWOSTAGE (KokkosSparse_twostage_gauss_seidel_impl.hpp:120-256): classical
  GS sweeps approximated by inner Jacobi-Richardson iterations on the
  triangular parts, built entirely from SpMV — no sequential dependency at
  all (the most TPU-friendly variant).
* omega (SOR relaxation) supported on both.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check, permute_via_sort
from ..common.tracing import annotate
from ..containers import CsrMatrix
from ..graph.coloring import ColoringAlgorithm, color_sets, graph_color
from .spmv import SpmvAlgorithm, SpmvHandle

__all__ = ["GsAlgorithm", "ClusteringAlgorithm", "GsHandle", "gauss_seidel_symbolic",
           "gauss_seidel_numeric", "forward_sweep", "backward_sweep",
           "symmetric_sweep", "gauss_seidel_apply"]


_OH_MIN_NNZ = 1 << 17  # color-block nnz above which the one-hot kernel wins


class GsAlgorithm(enum.Enum):
    POINT = "point"        # color-permuted PSGS
    TWOSTAGE = "twostage"  # inner-Jacobi classical GS
    CLUSTER = "cluster"    # MIS2-clustered GS (cluster_gauss_seidel_impl.hpp)


class ClusteringAlgorithm(enum.Enum):
    """cf. gauss_seidel_handle.hpp:32 {CLUSTER_MIS2, BALLOON}."""

    MIS2 = "mis2"
    BALLOON = "balloon"


@dataclasses.dataclass
class _ColorBlock:
    cols: Any       # (rows_c, w) permuted-space column ids (pads -> 0)
    vals: Any       # (rows_c, w) off-diagonal values (pads and diag -> 0)
    inv_diag: Any   # (rows_c,)
    start: int      # offset of this block in permuted order
    oh_plan: Any = None  # one-hot SpMV plan for the block (TPU f32 fast path)


class GsHandle:
    """cf. KokkosKernels_Handle::create_gs_handle (:581-627)."""

    def __init__(self, algorithm: GsAlgorithm = GsAlgorithm.POINT,
                 coloring: ColoringAlgorithm = ColoringAlgorithm.SERIAL,
                 inner_sweeps: int = 2,
                 clustering: "ClusteringAlgorithm" = None,
                 cluster_inner_sweeps: int = 3,
                 compact_form: bool = False):
        self.algorithm = algorithm
        self.coloring_algorithm = coloring
        self.inner_sweeps = inner_sweeps  # twostage inner Jacobi count
        self.compact_form = compact_form  # twostage: complement-matrix rhs
        self.clustering = clustering or ClusteringAlgorithm.MIS2
        self.cluster_inner_sweeps = cluster_inner_sweeps
        self.is_symbolic_called = False
        self.is_numeric_called = False
        # point
        self.colors = None
        self.order = None           # permuted order (old index per position)
        self.inv_order = None
        self.blocks: Optional[List[_ColorBlock]] = None
        # twostage
        self._tw = None
        # block (BSR)
        self._blk = None


@annotate("gauss_seidel_symbolic")
def gauss_seidel_symbolic(handle: GsHandle, A: CsrMatrix):
    """Coloring + permutation plan (cf. gauss_seidel.hpp:46 →
    graph_color_symbolic).  BsrMatrix input routes to block GS (the
    reference's block_gauss_seidel overloads)."""
    check(A.nrows == A.ncols, "gauss_seidel: square matrix required")
    from ..containers import BsrMatrix

    if isinstance(A, BsrMatrix):
        return _block_symbolic(handle, A)
    if handle.algorithm == GsAlgorithm.POINT:
        colors = graph_color(A, handle.coloring_algorithm)
        offsets, order = color_sets(colors)
        handle.colors = colors
        handle.color_offsets = offsets
        handle.order = order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order), dtype=order.dtype)
        handle.inv_order = inv
    elif handle.algorithm == GsAlgorithm.CLUSTER:
        _cluster_symbolic(handle, A)
    handle.is_symbolic_called = True


def _balloon_clustering(A: CsrMatrix, target_size: int = 8) -> np.ndarray:
    """Balloon clustering (sparse/impl/KokkosSparse_partitioning_impl.hpp:42-91
    role): seed every ceil(n/target)-th vertex, grow balloons by BFS rounds
    until all vertices claimed."""
    rm = A.host_row_map()
    ent = A.host_entries()
    n = A.nrows
    n_clusters = max(1, -(-n // target_size))
    labels = np.full(n, -1, np.int64)
    seeds = np.linspace(0, n - 1, n_clusters).astype(np.int64)
    labels[seeds] = np.arange(n_clusters)
    while (labels == -1).any():
        progressed = False
        rows = np.repeat(np.arange(n), rm[1:] - rm[:-1])
        lab_n = np.where(labels[ent] >= 0, labels[ent], np.iinfo(np.int64).max)
        best = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(best, rows, lab_n)
        adopt = (labels == -1) & (best != np.iinfo(np.int64).max)
        if adopt.any():
            labels[adopt] = best[adopt]
            progressed = True
        if not progressed:
            v = np.nonzero(labels == -1)[0][0]
            labels[v] = labels.max() + 1
    return labels.astype(np.int32)


def _cluster_symbolic(handle, A: CsrMatrix):
    """Cluster GS symbolic: cluster vertices (MIS2 aggregation or Balloon),
    color the cluster graph, order vertices color-major then cluster-major —
    cf. cluster_gauss_seidel_impl.hpp:114-164."""
    import scipy.sparse as sps

    from ..graph.mis2 import graph_mis2_aggregate

    if handle.clustering == ClusteringAlgorithm.MIS2:
        labels = graph_mis2_aggregate(A)
    else:
        labels = _balloon_clustering(A)
    nc = int(labels.max()) + 1
    n = A.nrows
    P = sps.csr_matrix((np.ones(n), (np.arange(n), labels)), shape=(n, nc))
    cg = (P.T @ A.to_scipy() @ P).tocsr()
    cg.setdiag(1.0)
    cg.sort_indices()
    ccolors = graph_color(CsrMatrix.from_scipy(cg.astype(np.float64)),
                          handle.coloring_algorithm)
    # vertex order: (cluster color, cluster id, vertex id)
    vc = ccolors[labels]
    order = np.lexsort((np.arange(n), labels, vc)).astype(np.int32)
    colors = vc  # per-vertex color = its cluster's color
    offsets, _ = color_sets(colors.astype(np.int32))
    handle.colors = colors.astype(np.int32)
    handle.color_offsets = offsets
    handle.order = order
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=order.dtype)
    handle.inv_order = inv
    handle.cluster_labels = labels


@annotate("gauss_seidel_numeric")
def gauss_seidel_numeric(handle: GsHandle, A: CsrMatrix, omega: float = 1.0):
    """Extract permuted color-block ELL + inverse diagonal
    (cf. gauss_seidel.hpp:175); BsrMatrix input routes to block GS."""
    from ..containers import BsrMatrix

    if isinstance(A, BsrMatrix):
        return _block_numeric(handle, A, omega)
    check(handle.is_symbolic_called, "gauss_seidel_numeric: symbolic first")
    handle.omega = float(omega)
    if handle.algorithm == GsAlgorithm.TWOSTAGE:
        _twostage_numeric(handle, A)
        handle.is_numeric_called = True
        return
    rm = A.host_row_map()
    ent = A.host_entries()
    vals = A.host_values()
    order = handle.order
    inv = handle.inv_order
    offsets = handle.color_offsets
    blocks = []
    nnz = len(ent)
    for c in range(len(offsets) - 1):
        rows = order[offsets[c]:offsets[c + 1]]
        if rows.size == 0:
            continue
        lens = (rm[rows + 1] - rm[rows]).astype(np.int64)
        w = max(1, int(lens.max(initial=1)))
        # vectorized full-row ELL gather; diagonal entries masked to 0 in
        # vals (no compaction needed — pads/diag contribute 0 to the dot)
        pos = rm[rows][:, None] + np.arange(w)[None, :]
        valid = np.arange(w)[None, :] < lens[:, None]
        pos = np.minimum(pos, max(nnz - 1, 0))
        cseg = ent[pos]
        vseg = vals[pos]
        is_diag = valid & (cseg == rows[:, None])
        diag = np.where(is_diag, vseg, 0).sum(axis=1)
        keep = valid & ~is_diag
        cols2d = np.where(keep, inv[np.minimum(cseg, len(inv) - 1)], 0).astype(np.int32)
        vals2d = np.where(keep, vseg, 0)
        with np.errstate(divide="ignore"):
            inv_diag = np.where(diag != 0, 1.0 / diag, 0.0)
        oh_plan = None
        if vals.dtype == np.float32 and int(keep.sum()) >= _OH_MIN_NNZ:
            from .spmv_pallas import supports_pallas

            if supports_pallas():
                # large color block: the per-sweep x-gather dominates; route
                # the block row x full-x product through the one-hot kernel
                from .spmv_pallas import build_onehot_spmv_plan

                nk = keep.sum(axis=1)
                brm = np.zeros(rows.size + 1, np.int64)
                np.cumsum(nk, out=brm[1:])
                bent = cols2d[keep].astype(np.int64)
                bval = vals2d[keep]
                blkA = CsrMatrix.from_arrays(brm, bent.astype(np.int32),
                                             bval, ncols=A.nrows)
                oh_plan = build_onehot_spmv_plan(blkA)
        blocks.append(_ColorBlock(
            jnp.asarray(cols2d), jnp.asarray(vals2d), jnp.asarray(inv_diag),
            int(offsets[c]), oh_plan))
    handle.blocks = blocks
    handle.is_numeric_called = True


def _twostage_numeric(handle, A: CsrMatrix):
    import scipy.sparse as sps

    sp = A.to_scipy()
    D = sp.diagonal()
    L = sps.tril(sp, k=-1).tocsr()
    U = sps.triu(sp, k=1).tocsr()
    L.sort_indices()
    U.sort_indices()
    handle._tw = dict(
        inv_diag=jnp.asarray(np.where(D != 0, 1.0 / D, 0.0).astype(A.host_values().dtype)),
        L=SpmvHandle(CsrMatrix.from_scipy(L, value_dtype=A.dtype), SpmvAlgorithm.AUTO),
        U=SpmvHandle(CsrMatrix.from_scipy(U, value_dtype=A.dtype), SpmvAlgorithm.AUTO),
        A=SpmvHandle(A, SpmvAlgorithm.AUTO),
    )


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _point_half_sweep(handle, xp, bp, forward: bool):
    """One forward or backward colored sweep in permuted space.  CLUSTER
    mode repeats each color-block update (inner relaxation of intra-cluster
    coupling, cf. the sequential within-cluster solve of
    cluster_gauss_seidel_impl.hpp)."""
    omega = handle.omega
    reps = handle.cluster_inner_sweeps if handle.algorithm == GsAlgorithm.CLUSTER else 1
    blocks = handle.blocks if forward else list(reversed(handle.blocks))
    for blk in blocks:
        nrc = blk.inv_diag.shape[0]
        bb = jax.lax.dynamic_slice_in_dim(bp, blk.start, nrc)
        for _ in range(reps):
            xb = jax.lax.dynamic_slice_in_dim(xp, blk.start, nrc)
            if blk.oh_plan is not None:
                from .spmv_pallas import onehot_spmv

                ax = onehot_spmv(blk.oh_plan, xp)
            else:
                ax = jnp.sum(blk.vals * jnp.take(xp, blk.cols, axis=0), axis=1)
            xnew = (1.0 - omega) * xb + omega * blk.inv_diag * (bb - ax)
            xp = jax.lax.dynamic_update_slice_in_dim(xp, xnew.astype(xp.dtype), blk.start, 0)
    return xp


def _twostage_half_sweep(handle, x, b, forward: bool):
    """(D + L) z = r (forward) or (D + U) z = r (backward) approximated by
    inner Jacobi-Richardson sweeps (twostage_gauss_seidel_impl.hpp:120-256).

    compact_form (the isCompactForm() option, same file :120): the rhs is
    built from the COMPLEMENT matrix only — rhs = b - U x (forward) — and
    the inner solve returns the new iterate directly, skipping the full-A
    residual SpMV.  With an exact inner solve the two forms coincide at
    omega=1 ((D+L)^{-1}(b-Ux) = x + (D+L)^{-1}(b-Ax)); with truncated inner
    sweeps they differ by the truncation, exactly as in the reference."""
    tw = handle._tw
    omega = handle.omega
    invD = tw["inv_diag"]
    T = tw["L"] if forward else tw["U"]
    if getattr(handle, "compact_form", False):
        C = tw["U"] if forward else tw["L"]       # complement of (T + D)
        rhs = b - C(x)
        z = invD * rhs
        for _ in range(handle.inner_sweeps):
            z = invD * (rhs - T(z))
        return (1.0 - omega) * x + omega * z
    r = b - tw["A"](x)
    z = invD * r
    for _ in range(handle.inner_sweeps):
        z = invD * (r - T(z))
    return x + omega * z


@annotate("forward_sweep")
def forward_sweep(handle: GsHandle, A: CsrMatrix, x, b, num_sweeps: int = 1):
    return gauss_seidel_apply(handle, A, x, b, num_sweeps, "forward")


@annotate("backward_sweep")
def backward_sweep(handle: GsHandle, A: CsrMatrix, x, b, num_sweeps: int = 1):
    return gauss_seidel_apply(handle, A, x, b, num_sweeps, "backward")


@annotate("symmetric_sweep")
def symmetric_sweep(handle: GsHandle, A: CsrMatrix, x, b, num_sweeps: int = 1):
    return gauss_seidel_apply(handle, A, x, b, num_sweeps, "symmetric")


@annotate("gauss_seidel_apply")
def gauss_seidel_apply(handle: GsHandle, A: CsrMatrix, x, b,
                       num_sweeps: int = 1, direction: str = "symmetric",
                       permuted: bool = False):
    """x may be None (zero initial guess, the init_zero_x_vector flag).
    Rank-2 x/b (multivector, the reference's batched apply —
    cluster_gauss_seidel_impl.hpp 16-wide) sweeps all columns in ONE traced
    computation via vmap over the column axis (every sweep flavor is built
    from SpMVs/gathers that batch cleanly), not a per-column Python loop.

    permuted=True (POINT/CLUSTER only): x/b are already in the handle's
    color-permuted space and the result stays there — the convention for
    chained smoother applications (multigrid, preconditioner sweeps), the
    same contract as dist_gs_sweep(permuted=True).  The two
    permute_via_sort conversions cost ~10-16 us per call at 160k rows;
    convert once with handle.order/inv_order keys instead."""
    check(handle.is_numeric_called, "gauss_seidel_apply: numeric first")
    if b.ndim == 2:
        fn = lambda xj, bj: gauss_seidel_apply(
            handle, A, xj, bj, num_sweeps=num_sweeps, direction=direction)
        if x is None:
            return jax.vmap(lambda bj: fn(None, bj),
                            in_axes=1, out_axes=1)(b)
        return jax.vmap(fn, in_axes=(1, 1), out_axes=1)(x, b)
    if x is None:
        x = jnp.zeros_like(b)
    if getattr(handle, "_blk", None) is not None:
        for _ in range(num_sweeps):
            if direction in ("forward", "symmetric"):
                x = _block_half_sweep(handle, x, b, True)
            if direction in ("backward", "symmetric"):
                x = _block_half_sweep(handle, x, b, False)
        return x
    if handle.algorithm == GsAlgorithm.TWOSTAGE:
        for _ in range(num_sweeps):
            if direction in ("forward", "symmetric"):
                x = _twostage_half_sweep(handle, x, b, True)
            if direction in ("backward", "symmetric"):
                x = _twostage_half_sweep(handle, x, b, False)
        return x
    # POINT: work in permuted space.  Permutations ride on lax.sort with the
    # precomputed keys (~4.6x faster than jnp.take on TPU for large vectors;
    # see common.utils.permute_via_sort) — the inverse permutation IS the
    # forward sort key and vice versa.
    if permuted:
        xp, bp = x, b
    else:
        inv_order = jnp.asarray(handle.inv_order)
        xp = permute_via_sort(x, inv_order)
        bp = permute_via_sort(b, inv_order)
    for _ in range(num_sweeps):
        if direction in ("forward", "symmetric"):
            xp = _point_half_sweep(handle, xp, bp, True)
        if direction in ("backward", "symmetric"):
            xp = _point_half_sweep(handle, xp, bp, False)
    if permuted:
        return xp
    return permute_via_sort(xp, jnp.asarray(handle.order))


# ---------------------------------------------------------------------------
# Block (BSR) Gauss-Seidel — analog of the reference's block_gauss_seidel
# (Test_Sparse_block_gauss_seidel.hpp; the point-GS machinery applied to
# BsrMatrix with b×b diagonal-block inverses).  TPU design: color the BLOCK
# graph, batched-invert the diagonal blocks (MXU), sweep color sets with
#   x_c <- (1-ω) x_c + ω D_c^{-1} ((b - A x)_c + D_c x_c)
# — one BSR SpMV per color per half sweep, block updates as batched einsum.

def _block_symbolic(handle: GsHandle, A):
    graph = CsrMatrix.from_arrays(
        jnp.asarray(A.row_map), jnp.asarray(A.entries),
        jnp.zeros(A.nnz_blocks, jnp.float32),
        nrows=A.n_block_rows, ncols=A.n_block_cols)
    colors = graph_color(graph, handle.coloring_algorithm)
    offsets, order = color_sets(colors)
    handle.colors = colors
    handle.color_offsets = offsets
    handle.order = order
    handle.is_symbolic_called = True


def _block_numeric(handle: GsHandle, A, omega: float):
    rm = A.host_row_map()
    ent = A.host_entries()
    nb = A.n_block_rows
    rows = np.repeat(np.arange(nb), rm[1:] - rm[:-1])
    dpos = np.full(nb, -1, np.int64)
    hits = np.nonzero(ent == rows)[0]
    dpos[rows[hits]] = hits
    check((dpos >= 0).all(), "block GS: every block row needs a diagonal block")
    D = jnp.asarray(A.host_values()[dpos])             # (nb, bs, bs)
    handle._blk = {
        "D": D,
        "Dinv": jnp.linalg.inv(D),
        "h": SpmvHandle(A),
        "omega": float(omega),
        "sets": [np.asarray(handle.order[handle.color_offsets[c]:
                                         handle.color_offsets[c + 1]])
                 for c in range(len(handle.color_offsets) - 1)],
        "bs": A.block_size,
    }
    handle.is_numeric_called = True


def _block_half_sweep(handle: GsHandle, x, b, forward: bool):
    blk = handle._blk
    D, Dinv, h, omega, bs = blk["D"], blk["Dinv"], blk["h"], blk["omega"], blk["bs"]
    sets = blk["sets"] if forward else blk["sets"][::-1]
    nb = D.shape[0]
    for I in sets:
        r = (b - h.matvec(x)).reshape(nb, bs)
        xb = x.reshape(nb, bs)
        rc = r[I] + jnp.einsum("ipq,iq->ip", D[I], xb[I])
        xc = jnp.einsum("ipq,iq->ip", Dinv[I], rc)
        xb = xb.at[I].set((1.0 - omega) * xb[I] + omega * xc)
        x = xb.reshape(-1)
    return x
