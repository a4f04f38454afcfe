"""Graph orderings — RCM (graph/src/KokkosGraph_RCM.hpp:31-40, BFS-based,
impl graph/impl/KokkosGraph_BFS_impl.hpp) and RCB recursive coordinate
bisection (graph/src/KokkosGraph_RCB.hpp, impl _RCB_impl.hpp).

Orderings are plan-time symbolic work → host.  RCM is a native C++ BFS
(George-Liu pseudo-peripheral start + ascending-degree Cuthill-McKee,
`tpukk_rcm`), with scipy's csgraph as the no-toolchain fallback; RCB is a
direct median-split recursion.
"""
from __future__ import annotations

import numpy as np

from .. import native
from ..containers import CsrMatrix

__all__ = ["rcm", "rcb", "permute_matrix"]


def rcm(A: CsrMatrix, symmetrize: bool = True) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (new ordering: perm[i] = old index)."""
    sp = A.to_scipy()
    if symmetrize:
        sp = (sp + sp.T).tocsr()
        sp.sort_indices()
    perm = native.rcm(sp.indptr, sp.indices, sp.shape[0])
    if perm is not None:
        return perm
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(sp, symmetric_mode=True), dtype=np.int32)


def rcb(coords: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection: coords (n, d) -> part id per point.
    Splits along the widest dimension at the median (cf. _RCB_impl.hpp)."""
    n = coords.shape[0]
    parts = np.zeros(n, np.int32)

    def split(idx, lo, hi):
        if hi - lo <= 1 or idx.size == 0:
            parts[idx] = lo
            return
        span = coords[idx].max(axis=0) - coords[idx].min(axis=0)
        dim = int(np.argmax(span))
        order = np.argsort(coords[idx, dim], kind="stable")
        mid_parts = (hi - lo) // 2
        cut = idx.size * mid_parts // (hi - lo)
        left, right = idx[order[:cut]], idx[order[cut:]]
        split(left, lo, lo + mid_parts)
        split(right, lo + mid_parts, hi)

    split(np.arange(n), 0, n_parts)
    return parts


def permute_matrix(A: CsrMatrix, perm: np.ndarray) -> CsrMatrix:
    """Symmetric permutation B = A[perm,:][:,perm] (host symbolic)."""
    sp = A.to_scipy()[perm][:, perm].tocsr()
    sp.sort_indices()
    return CsrMatrix.from_scipy(sp, value_dtype=A.dtype)
