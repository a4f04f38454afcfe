"""Distance-1 and distance-2 graph coloring — analog of
graph/src/KokkosGraph_Distance1Color.hpp:28 (graph_color_symbolic) with the
algorithm taxonomy of Distance1ColorHandle.hpp:28-41 ({SERIAL, VB, VBD, ...})
and graph/src/KokkosGraph_Distance2Color.hpp.

TPU translation (SURVEY.md §2.10): the VB speculative-color + conflict-resolve
loop (Distance1Color_impl.hpp:170-493) becomes a data-parallel JAX iteration
over an ELL-padded adjacency — each round every uncolored vertex picks the
smallest color absent among neighbors (forbidden-mask via one-hot reduce),
then conflicts (equal-colored adjacent vertices) are demoted by index order
(deterministic, = the VBD determinism guarantee).  SERIAL is the host greedy
oracle.
"""
from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..common import round_up
from ..common.tracing import annotate
from ..containers import CsrMatrix, StaticCrsGraph

__all__ = ["ColoringAlgorithm", "graph_color", "graph_color_d2", "verify_coloring",
           "color_sets"]


class ColoringAlgorithm(enum.Enum):
    """Taxonomy of Distance1ColorHandle.hpp:28-41, two genuine behaviors:

    * VB / VBBIT / EB — speculative JPL coloring with hash-priority conflict
      demotion (fewer rounds, occasionally more colors).  VBBIT coincides
      with VB because the kernel already keeps forbidden sets as 32-color
      bitmask words (the VBBIT idea); EB's edge-centric conflict pass
      (Distance1Color_impl.hpp:1974) is a GPU-atomics memory-layout choice
      whose data-parallel reduction is exactly VB's per-edge any-reduce —
      same demotion set, so same colors (SURVEY §2.10 atomics-free rule).
    * VBD / VBDBIT — deterministic wavefront
      (Distance1Color_impl.hpp:1591): a vertex colors only when no
      higher-priority neighbor remains uncolored; no speculation, schedule-
      independent colors, more rounds, usually ≤ VB's color count."""
    SERIAL = "serial"
    VB = "vb"        # speculative parallel, deterministic conflict resolution
    VBBIT = "vbbit"  # == VB here (the kernel already uses bitmask forbidden sets)
    VBD = "vbd"      # deterministic wavefront (no speculation)
    VBDBIT = "vbdbit"
    EB = "eb"        # vertex-based realization of the edge-based variant


def _adjacency(graph) -> tuple:
    rm = graph.host_row_map()
    ent = graph.host_entries()
    return rm, ent, graph.nrows


def _ell_pad(rm, ent, nrows):
    deg = (rm[1:] - rm[:-1]).astype(np.int64)
    w = max(1, int(deg.max(initial=1)))
    pos = rm[:-1, None].astype(np.int64) + np.arange(w)[None, :]
    mask = np.arange(w)[None, :] < deg[:, None]
    pos = np.minimum(pos, max(0, len(ent) - 1))
    return np.where(mask, ent[pos], -1).astype(np.int32)


def _serial_greedy(rm, ent, nrows) -> np.ndarray:
    from .. import native

    if native.available():
        return native.d1_greedy_color(rm, ent, nrows)
    colors = np.zeros(nrows, np.int32)  # 0 = uncolored; colors 1-based
    for v in range(nrows):
        nbr = ent[rm[v]:rm[v + 1]]
        used = set(colors[nbr[nbr != v]].tolist())
        c = 1
        while c in used:
            c += 1
        colors[v] = c
    return colors


@functools.partial(jax.jit, static_argnames=("max_colors", "max_rounds",
                                             "deterministic"))
def _vb_run(cols, *, max_colors: int, max_rounds: int,
            deterministic: bool = False):
    """Speculative parallel coloring, whole loop in ONE dispatch (per-round
    host syncs cost 1-30ms each through a tunneled TPU; lax.while_loop keeps
    it on device).  Module-level jit so repeated colorings of same-shaped
    graphs reuse the compiled executable — a closure-jit here recompiled on
    EVERY call (20-40s each through the remote-compile tunnel)."""
    nrows = cols.shape[0]
    idx = jnp.arange(nrows, dtype=jnp.int32)

    # hash priorities break the symmetry of speculative coloring: demoting
    # the lower-INDEX endpoint of each conflict makes progress a 1-vertex-
    # per-round wavefront on index-monotone graphs (measured: 64 rounds
    # colored only 8k of 160k grid vertices); demoting the lower-HASH
    # endpoint keeps an expected constant fraction per round (Jones-
    # Plassmann-Luby argument), deterministic for a fixed hash.
    pri = (idx * jnp.int32(-1640531527)) ^ jnp.int32(0x5BF03635)  # Knuth mix
    nbr_valid = (cols >= 0) & (cols != idx[:, None])
    nbr_pri = jnp.where(nbr_valid, jnp.take(pri, jnp.maximum(cols, 0)), 0)
    nbr_idx = jnp.where(nbr_valid, cols, -1)
    # neighbor wins a tie on equal hash by larger index
    nbr_beats = ((nbr_pri > pri[:, None]) | (
        (nbr_pri == pri[:, None]) & (nbr_idx > idx[:, None]))) & nbr_valid

    def gather(colors):
        return jnp.where(nbr_valid,
                         jnp.take(colors, jnp.maximum(cols, 0)), 0)

    return _vb_loop(gather, nbr_beats, nrows, cols.shape[1], max_colors,
                    max_rounds, deterministic=deterministic)


def _vb_color(cols_ell: np.ndarray, nrows: int, max_colors: int = 128,
              max_rounds: int = 64, deterministic: bool = False) -> np.ndarray:
    return np.asarray(_vb_run(jnp.asarray(cols_ell),
                              max_colors=max_colors, max_rounds=max_rounds,
                              deterministic=deterministic))


# ---------------------------------------------------------------------------
# Offset VB rounds (banded/stencil graphs): when the adjacency has few
# distinct (col − row) offsets — every mesh/stencil graph — the neighbor-
# color gather is K shifted copies of the color vector (the DIA argument
# from SpMV applied to coloring).  No gather plan, no kernel: jnp.roll
# streams at full bandwidth and the one-shot cost collapses to the rounds
# themselves.  Detection is one O(nnz) host pass.
# ---------------------------------------------------------------------------

def _vb_offsets(rm, ent, nrows, max_offsets: int = 24):
    """(offsets tuple, valid mask (n,K), nbr_beats (n,K)) when the graph is
    offset-representable with ≤ max_offsets distinct non-self offsets, else
    None."""
    rows = np.repeat(np.arange(nrows, dtype=np.int64),
                     np.diff(rm).astype(np.int64))
    ent64 = ent.astype(np.int64)
    non_self = ent64 != rows
    offs = (ent64 - rows)[non_self]
    # sampled candidate set + one verification pass: a full np.unique sort
    # of the nnz-sized offset array was ~25 ms of the one-shot budget
    if offs.size > 200_000:
        samp = np.unique(offs[:: max(1, offs.size // 100_000)])
        if len(samp) > max_offsets:
            return None
        pos = np.searchsorted(samp, offs)
        ok = (pos < len(samp)) & (samp[np.minimum(pos, len(samp) - 1)]
                                  == offs)
        if not ok.all():
            uniq = np.unique(offs)     # sample missed an offset: full pass
        else:
            uniq = samp
    else:
        uniq = np.unique(offs)
    if len(uniq) > max_offsets:
        return None
    K = max(1, len(uniq))
    mask = np.zeros((nrows, K), bool)
    if len(uniq):
        k_of = np.searchsorted(uniq, offs)
        mask[rows[non_self], k_of] = True
    idx = np.arange(nrows, dtype=np.int64)
    pri = ((idx * np.int64(-1640531527)).astype(np.int32)
           ^ np.int32(0x5BF03635))
    nbr_i = idx[:, None] + (uniq[None, :] if len(uniq) else 0)
    inb = mask & (nbr_i >= 0) & (nbr_i < nrows)
    nbr_pri = np.where(inb, pri[np.clip(nbr_i, 0, nrows - 1)], 0)
    nbr_beats = (nbr_pri > pri[:, None]) | (
        (nbr_pri == pri[:, None])
        & (np.where(inb, nbr_i, -1) > idx[:, None]))
    nbr_beats &= inb
    # ONE packed device transfer (bit0 valid, bit1 beats): two separate
    # bool uploads each paid the relay's per-transfer latency
    packed = (inb.astype(np.int8) | (nbr_beats.astype(np.int8) << 1))
    return tuple(int(d) for d in uniq), jnp.asarray(packed)


@functools.partial(jax.jit, static_argnames=("offsets", "max_colors",
                                             "max_rounds", "deterministic"))
def _vb_run_offsets(packed, *, offsets, max_colors, max_rounds,
                    deterministic=False):
    """VB rounds with the neighbor gather realized as static shifts:
    nbr_color[i, k] = colors[i + offsets[k]] — a roll per offset, masked by
    `valid` (wrapped entries are never real edges).  packed: int8 with
    bit0 = valid, bit1 = beats (one host→device transfer)."""
    n = packed.shape[0]
    w = max(1, len(offsets))
    valid = (packed & 1) == 1
    nbr_beats = (packed & 2) == 2

    def gather(colors):
        if not offsets:
            return jnp.zeros((n, w), jnp.int32)
        cols = [jnp.roll(colors, -d) for d in offsets]
        return jnp.where(valid, jnp.stack(cols, axis=1), 0)

    return _vb_loop(gather, nbr_beats, n, w, max_colors, max_rounds,
                    deterministic=deterministic)


def _vb_loop(gather, nbr_beats, n, w, max_colors, max_rounds,
             deterministic=False):
    """Shared speculative-coloring loop body: one gather per round (demote
    previous conflicts, recolor from the same snapshot), forbidden sets as
    32-color bitmask words, runs until a round changes nothing.  Traced
    inside a caller's jit; `gather(colors) -> (n, w) int32`.

    deterministic=True is the VBD wavefront (Distance1Color_impl.hpp:1591
    role): a vertex colors only once NO higher-priority neighbor remains
    uncolored — no speculation, no conflicts ever, identical colors on
    every run AND under any round schedule (the reference's VBD guarantee);
    costs more rounds (priority-DAG depth) for usually-fewer colors."""
    n_words = (max_colors + 32) // 32

    def one_round(colors):
        nbr_colors = gather(colors)
        if deterministic:
            # wait out higher-priority uncolored neighbors
            blocked = jnp.any(nbr_beats & (nbr_colors == 0), axis=1)
            n_changed = jnp.sum((colors == 0) & ~blocked).astype(jnp.int32)
        else:
            conflict = jnp.any((nbr_colors == colors[:, None]) & nbr_beats
                               & (colors[:, None] != 0), axis=1)
            colors = jnp.where(conflict, 0, colors)
            n_changed = (jnp.sum(conflict)
                         + jnp.sum(colors == 0)).astype(jnp.int32)
        one = jnp.int32(1)
        first_free = jnp.full(n, max_colors, jnp.int32)
        found = jnp.zeros(n, jnp.bool_)
        for j in range(n_words):
            rel = nbr_colors - 32 * j
            inb = (rel >= 0) & (rel < 32)
            bits = jnp.where(inb, jnp.left_shift(one, jnp.where(inb, rel, 0)), 0)
            word = functools.reduce(jnp.bitwise_or,
                                    [bits[:, k] for k in range(w)])
            if j == 0:
                word = word | one
            free = ~word
            has = free != 0
            lsb = free & (-free)
            tz = jax.lax.population_count(lsb - 1)
            first_free = jnp.where(~found & has, 32 * j + tz, first_free)
            found = found | has
        if deterministic:
            assign = (colors == 0) & ~blocked
            return jnp.where(assign, first_free, colors), n_changed
        return jnp.where(colors == 0, first_free, colors), n_changed

    def cond(state):
        _, it, n_changed = state
        return jnp.logical_and(it < max_rounds,
                               jnp.logical_or(it == 0, n_changed > 0))

    def body(state):
        colors, it, _ = state
        colors, n_changed = one_round(colors)
        return colors, it + 1, n_changed

    colors, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(n, jnp.int32), 0, jnp.int32(0)))
    nbr_colors = gather(colors)
    conflict = jnp.any((nbr_colors == colors[:, None]) & nbr_beats
                       & (colors[:, None] != 0), axis=1)
    return jnp.where(conflict, 0, colors)


# ---------------------------------------------------------------------------
# Gather-table VB rounds: the per-round neighbor-color gather is the whole
# cost of a VB round (jnp.take runs at ~0.12 G elem/s on v5e — PERF_NOTES),
# and it has a FIXED pattern, so it is exactly a degree-1 selection-matrix
# SpMV: S[(i*w+j), cols[i,j]] = 1.  Routing it through the v7 gather-table
# pallas kernel (sparse/spmv_pallas.py) turns every round into one ~10 Gnnz/s
# kernel dispatch.  Colors are < 2^24 so the f32 value path is exact.
# ---------------------------------------------------------------------------

def _vb_gather_plan(cols_ell: np.ndarray, nrows: int, interpret: bool = False):
    """Build (plan, nbr_beats, self_mask) for the plan-driven VB runner, or
    None when the pallas path is unavailable/unprofitable.

    The selection matrix is assembled as raw host CSR arrays and the plan
    built via the native stream builder — no scipy matrix, no CsrMatrix
    device transfer (one-shot coloring was plan-build-bound, 514 ms of
    which 25 ms device rounds, round-2 bench)."""
    from ..sparse import spmv_pallas as sp  # lazy: sparse imports graph

    if not (sp.supports_pallas() or interpret):
        return None
    n, w = cols_ell.shape
    idx = np.arange(n, dtype=np.int64)
    valid = (cols_ell >= 0) & (cols_ell != idx[:, None].astype(cols_ell.dtype))
    # CSR of S[(i*w+j), cols[i,j]] = 1 directly: row (i*w+j) has <=1 entry
    vflat = valid.reshape(-1)
    rm_s = np.zeros(n * w + 1, np.int64)
    np.cumsum(vflat, out=rm_s[1:])
    ent_s = cols_ell.reshape(-1)[vflat].astype(np.int64)
    plan = None
    res = sp.build_gt_streams_host(rm_s, ent_s,
                                   np.ones(len(ent_s), np.float32), n * w, n)
    if res is not None:
        # gate on the BUILT plan's padding (the native build already ran
        # the layout cost model; a separate estimate pass cost 50 ms of the
        # one-shot budget): bail to XLA take when the kernel would lose
        pad = res["S"] * 1024 / max(1, len(ent_s))
        if pad * sp._DL_STEP_COST >= sp._XLA_GATHER_STEP_COST:
            return None
        plan = sp.GtSpmvPlan.from_host_streams(res, n * w, n, len(ent_s))
    if plan is None:
        # no native builder: estimate first, then the Python plan build
        pf, pd = sp._onehot_pad_ratios_arrays(rm_s, ent_s, n * w, n)
        if min(pf * sp._FLAT_STEP_COST,
               pd * sp._DL_STEP_COST) >= sp._XLA_GATHER_STEP_COST:
            return None
        import scipy.sparse as sps

        S = sps.csr_matrix((np.ones(len(ent_s), np.float32),
                            ent_s, rm_s), shape=(n * w, n))
        plan = sp.build_onehot_spmv_plan(CsrMatrix.from_scipy(S))
    # hash priorities (identical mix as _vb_run), host-side since static
    pri = ((idx * np.int64(-1640531527)).astype(np.int32)
           ^ np.int32(0x5BF03635))
    nbr_pri = np.where(valid, pri[np.maximum(cols_ell, 0)], 0)
    nbr_idx = np.where(valid, cols_ell, -1)
    nbr_beats = (nbr_pri > pri[:, None]) | (
        (nbr_pri == pri[:, None]) & (nbr_idx > idx[:, None]))
    return plan, jnp.asarray(nbr_beats)


@functools.partial(jax.jit, static_argnames=("n", "w", "max_colors",
                                             "max_rounds", "interpret",
                                             "deterministic"))
def _vb_run_plan(plan, nbr_beats, *, n, w, max_colors, max_rounds,
                 interpret=False, deterministic=False):
    """VB rounds with the neighbor-color gather as a gather-table SpMV.
    Invalid/self slots have no matrix entry, so they gather 0 — identical
    semantics to _vb_run's masked take (color 0 is never a constraint)."""
    from ..sparse import spmv_pallas as sp

    def gather(colors):
        y = sp.onehot_spmv(plan, colors.astype(jnp.float32),
                           interpret=interpret)
        return y[:n * w].reshape(n, w).astype(jnp.int32)

    return _vb_loop(gather, nbr_beats, n, w, max_colors, max_rounds)


@annotate("graph_color")
def graph_color(graph, algorithm: ColoringAlgorithm = ColoringAlgorithm.VB,
                *, _interpret: bool = False) -> np.ndarray:
    """1-based colors per vertex (0 never returned on success)."""
    rm, ent, nrows = _adjacency(graph)
    if algorithm == ColoringAlgorithm.SERIAL:
        return _serial_greedy(rm, ent, nrows)
    det = algorithm in (ColoringAlgorithm.VBD, ColoringAlgorithm.VBDBIT)
    colors = None
    if nrows >= 4096 and not _interpret:
        # banded/stencil fast path: neighbor gather = static shifts
        off = _vb_offsets(rm, ent, nrows)
        if off is not None:
            offsets, packed = off
            colors = np.asarray(_vb_run_offsets(
                packed, offsets=offsets, max_colors=128,
                max_rounds=64, deterministic=det))
            if (colors == 0).any():
                colors = None
    if colors is not None:
        return colors
    cols_ell = _ell_pad(rm, ent, nrows)
    if cols_ell.size >= 32768 or _interpret:
        # big graphs: per-round gather via the v7 gather-table pallas kernel
        gp = _vb_gather_plan(cols_ell, nrows, interpret=_interpret)
        if gp is not None:
            plan, nbr_beats = gp
            colors = np.asarray(_vb_run_plan(
                plan, nbr_beats, n=nrows, w=cols_ell.shape[1],
                max_colors=128, max_rounds=64, interpret=_interpret,
                deterministic=det))
    if colors is None:
        colors = _vb_color(cols_ell, nrows, deterministic=det)
    if (colors == 0).any():  # pathological fallback
        return _serial_greedy(rm, ent, nrows)
    return colors


@annotate("graph_color_d2")
def graph_color_d2(graph, algorithm: ColoringAlgorithm = ColoringAlgorithm.VB) -> np.ndarray:
    """Distance-2 coloring.  Default path is the native forbidden-set sweep
    (`tpukk_d2_greedy_color`): two-hop neighborhoods are walked with an O(n)
    stamped workspace and G² is never materialized — the same memory shape as
    the reference's forbidden arrays (Distance2Color_impl.hpp).  The scipy
    square-graph reduction is the no-toolchain fallback only."""
    if isinstance(graph, CsrMatrix):
        sp = graph.to_scipy()
        n, m = sp.shape
        rm, ent = sp.indptr, sp.indices
    else:
        n, m = graph.nrows, graph.ncols
        rm = np.asarray(graph.host_row_map())
        ent = np.asarray(graph.host_entries())
        sp = None
    square = (n == m)
    if square:
        # symmetrize so one adjacency serves both hops
        import scipy.sparse as sps

        if sp is None:
            sp = sps.csr_matrix((np.ones(len(ent), np.float32), ent, rm),
                                shape=(n, m))
        pat = sp.copy()
        pat.data[:] = 1.0
        pat = (pat + pat.T).tocsr()
        pat.sort_indices()
        colors = native.d2_greedy_color(pat.indptr, pat.indices, n,
                                        include_d1=True)
        if colors is not None:
            return colors
        # pat@pat alone drops distance-1 edges when the diagonal is not
        # explicitly stored; add pat back so the D1-reduction keeps them.
        sq = (pat @ pat + pat).tocsr()
        sq.sort_indices()
        return graph_color(CsrMatrix.from_scipy(sq.astype(np.float32)),
                           algorithm)
    # rectangular: rows conflict iff they share a column
    t_rm, t_ent, _ = _csr_transpose_pattern(rm, ent, n, m)
    colors = native.d2_greedy_color(rm, ent, n, t_rm, t_ent, m,
                                    include_d1=False)
    if colors is not None:
        return colors
    import scipy.sparse as sps

    if sp is None:
        sp = sps.csr_matrix((np.ones(len(ent), np.float32), ent, rm),
                            shape=(n, m))
    pat = sp.copy()
    pat.data[:] = 1.0
    sq = (pat @ pat.T).tocsr()
    sq.sort_indices()
    return graph_color(CsrMatrix.from_scipy(sq.astype(np.float32)), algorithm)


def _csr_transpose_pattern(rm, ent, n, m):
    """Pattern-only CSR transpose (counting sort), host."""
    counts = np.bincount(ent, minlength=m)
    t_rm = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=t_rm[1:])
    order = np.argsort(ent, kind="stable")
    rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(rm).astype(np.int64))
    t_ent = rows[order]
    return t_rm.astype(np.int32), t_ent.astype(np.int32), None


def verify_coloring(graph, colors: np.ndarray) -> bool:
    """cf. kk_is_d1_coloring_valid (Test_Graph_graph_color.hpp:135-167)."""
    rm, ent, nrows = _adjacency(graph)
    if (colors <= 0).any():
        return False
    for v in range(nrows):
        nbr = ent[rm[v]:rm[v + 1]]
        nbr = nbr[nbr != v]
        if (colors[nbr] == colors[v]).any():
            return False
    return True


def color_sets(colors: np.ndarray):
    """Group vertices by color: returns (color_offsets, vertex_order) — the
    color_adj permutation used by colored Gauss-Seidel
    (gauss_seidel_impl.hpp color_adj build)."""
    order = np.argsort(colors, kind="stable")
    ncolors = int(colors.max())
    counts = np.bincount(colors, minlength=ncolors + 1)[1:]
    offsets = np.zeros(ncolors + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets, order.astype(np.int32)
