"""Distance-2 maximal independent set + MIS2-based coarsening — analog of
graph/src/KokkosGraph_MIS2.hpp:53-68 (graph_mis2, graph_mis2_coarsen,
graph_mis2_aggregate) and graph/impl/KokkosGraph_Distance2MIS_impl.hpp.

Luby-style random-priority rounds (the reference's worklist algorithm is the
same fixpoint): host orchestration, vectorized numpy per round — symbolic
(plan-time) work in the TPU design.
"""
from __future__ import annotations

import functools

import numpy as np
import scipy.sparse as sps

from ..containers import CsrMatrix

__all__ = ["graph_mis2", "graph_mis2_aggregate", "graph_mis2_coarsen"]


def _pattern(graph) -> sps.csr_matrix:
    if isinstance(graph, CsrMatrix):
        sp = graph.to_scipy().copy()
    else:
        rm = graph.host_row_map()
        ent = graph.host_entries()
        sp = sps.csr_matrix((np.ones(len(ent)), ent, rm), shape=(graph.nrows, graph.ncols))
    sp.data[:] = 1.0
    return sp.tocsr()


@functools.lru_cache(maxsize=1)
def _device_loop(n, interpret):
    """Jitted Luby loop: per round, ONE (max,*) semiring SpMV finds each
    undecided vertex's best undecided d<=2 neighbor priority and ONE sum
    SpMV covers the winners' neighborhoods — both through the v8 gather-
    table kernel (the reference's device worklist rounds,
    _Distance2MIS_impl.hpp; the host loop below was the round-1 gap)."""
    import jax
    import jax.numpy as jnp

    from ..sparse import spmv_pallas as sp

    @jax.jit
    def run(plan, prio):
        def cond(state):
            st, it = state
            return jnp.logical_and(it < 128, jnp.any(st == 0))

        def body(state):
            st, it = state
            p = jnp.where(st == 0, prio, 0.0)
            nbr_best = sp.onehot_spmv(plan, p, reduce="max",
                                      interpret=interpret)[:n]
            win = (st == 0) & (p > nbr_best)
            covered = sp.onehot_spmv(plan, win.astype(jnp.float32),
                                     interpret=interpret)[:n] > 0
            st = jnp.where(win, 1, jnp.where((st == 0) & covered, -1, st))
            return st, it + 1

        st, _ = jax.lax.while_loop(cond, body,
                                   (jnp.zeros(n, jnp.int32), 0))
        return st

    return run


def _mis2_device(A2: sps.csr_matrix, prio: np.ndarray):
    """Device Luby rounds; None when the pallas path is unavailable."""
    from ..sparse import spmv_pallas as sp

    interpret = False
    if not sp.supports_pallas():
        import jax

        if jax.default_backend() != "cpu":
            return None
        interpret = True  # CPU test path exercises the same kernels
    n = A2.shape[0]
    Ad = A2.copy()
    Ad.setdiag(0)
    Ad.eliminate_zeros()
    Ad.data[:] = 1.0  # A@A carries path multiplicities; we need the pattern
    Am = CsrMatrix.from_scipy(Ad.astype(np.float32))
    plan = sp.build_onehot_spmv_plan(Am)
    if not isinstance(plan, sp.GtSpmvPlan):
        return None  # reduce="max" needs the gt/gi layouts
    import jax.numpy as jnp

    st = _device_loop(n, interpret)(plan, jnp.asarray(prio + 1.0,
                                                      jnp.float32))
    return np.asarray(st)


def graph_mis2(graph, seed: int = 0) -> np.ndarray:
    """Indices of a maximal set with pairwise distance > 2."""
    A = _pattern(graph)
    n = A.shape[0]
    A2 = (A @ A).tocsr()
    A2 = (A2 + A).tocsr()  # distance-1 or distance-2 adjacency
    rng = np.random.default_rng(seed)
    prio = rng.permutation(n).astype(np.int64)
    if n >= 4096:  # device rounds; tiny graphs stay on host
        st = _mis2_device(A2, prio.astype(np.float64))
        if st is not None:
            return np.nonzero(st == 1)[0].astype(np.int32)
    state = np.zeros(n, np.int8)  # 0 undecided, 1 in set, -1 out
    rm, ent = A2.indptr, A2.indices
    rows = np.repeat(np.arange(n), rm[1:] - rm[:-1])
    not_self = ent != rows
    while (state == 0).any():
        undecided = state == 0
        # v joins if its priority beats all undecided distance<=2 neighbors
        cand_prio = np.where(undecided, prio, -1)
        vals = np.where(undecided[ent] & not_self, prio[ent], -1)
        nbr_best = np.full(n, -1, np.int64)
        nz = rm[1:] > rm[:-1]  # rows sorted: reduceat beats ufunc.at ~30x
        nbr_best[nz] = np.maximum.reduceat(vals, rm[:-1][nz])
        win = undecided & (cand_prio > nbr_best)
        state[win] = 1
        # neighbors (distance<=2) of winners are out: one O(nnz) CSR matvec
        # (A2 symmetric) instead of per-round fancy row slicing + sum
        if win.any():
            out = (A2 @ win.astype(np.float64)) > 0
            out &= state == 0
            state[out] = -1
        elif (state == 0).any():
            # tie-break stall (shouldn't happen with a permutation) — pick min index
            state[np.nonzero(state == 0)[0][0]] = 1
    return np.nonzero(state == 1)[0].astype(np.int32)


def graph_mis2_aggregate(graph, seed: int = 0) -> np.ndarray:
    """Label each vertex with the nearest MIS-2 root (aggregation/clustering)
    — cf. graph_mis2_aggregate."""
    A = _pattern(graph)
    n = A.shape[0]
    roots = graph_mis2(graph, seed)
    labels = np.full(n, -1, np.int64)
    labels[roots] = np.arange(len(roots))
    frontier = roots
    # BFS from all roots simultaneously (2 hops suffice for MIS-2 maximality,
    # but iterate until fully labeled for safety)
    while (labels == -1).any():
        progressed = False
        unl = labels == -1
        rm, ent = A.indptr, A.indices
        rows = np.repeat(np.arange(n), rm[1:] - rm[:-1])
        # propagate: unlabeled vertex adopts min labeled neighbor's label
        lab_n = np.where(labels[ent] >= 0, labels[ent], np.iinfo(np.int64).max)
        best = np.full(n, np.iinfo(np.int64).max)
        nz = rm[1:] > rm[:-1]  # rows sorted: reduceat beats ufunc.at ~30x
        best[nz] = np.minimum.reduceat(lab_n, rm[:-1][nz])
        adopt = unl & (best != np.iinfo(np.int64).max)
        if adopt.any():
            labels[adopt] = best[adopt]
            progressed = True
        if not progressed:
            # disconnected unlabeled vertex becomes its own aggregate
            v = np.nonzero(unl)[0][0]
            labels[v] = labels.max() + 1
    return labels.astype(np.int32)


def graph_mis2_coarsen(graph, seed: int = 0):
    """Coarse graph = Pᵀ·A·P with P the aggregation matrix —
    cf. build_coarse_graph_spgemm (CoarsenConstruct.hpp:230-258)."""
    A = _pattern(graph)
    labels = graph_mis2_aggregate(graph, seed)
    nc = int(labels.max()) + 1
    n = A.shape[0]
    P = sps.csr_matrix((np.ones(n), (np.arange(n), labels)), shape=(n, nc))
    coarse = (P.T @ A @ P).tocsr()
    coarse.setdiag(0)
    coarse.eliminate_zeros()
    coarse.sort_indices()
    return CsrMatrix.from_scipy(coarse.astype(np.float32)), labels
