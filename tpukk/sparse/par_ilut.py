"""PAR_ILUT — iterative threshold ILU (Anzt–Chow–Dongarra), analog of
sparse/src/KokkosSparse_par_ilut.hpp:20-33 and
sparse/impl/KokkosSparse_par_ilut_numeric_impl.hpp (repeated {candidate add,
fixed-point sweep, threshold-prune, sweep}).

The fixed-point sweep uses the residual identity (all updates independent —
the algorithm's whole point, and why it suits data-parallel hardware):
    R = A - L·U (on the current pattern union)
    L += tril(R,-1) / diag(U) ;  U += triu(R)
Each outer iteration: grow pattern by the nonzeros of R (candidates), sweep,
prune smallest |values| down to the fill budget (keeping diagonals), sweep.
Deterministic by construction (= the reference's async_update=false mode,
par_ilut.hpp:23-27).  Pattern phases are host-side; sweeps are sparse
products expressible with the spgemm pair plan (host scipy here; the device
pair-plan path shares the machinery of spgemm.py).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sps

from ..common import check
from ..containers import CsrMatrix

__all__ = ["ParIlutHandle", "par_ilut", "par_ilut_symbolic", "par_ilut_numeric"]


class ParIlutHandle:
    """cf. par_ilut_handle.hpp: max_iters, residual norm tolerance,
    fill-in limit (fill_factor x nnz(A))."""

    def __init__(self, max_iters: int = 5, residual_tol: float = 1e-2,
                 fill_factor: float = 2.0, sweeps_per_iter: int = 1):
        self.max_iters = int(max_iters)
        self.residual_tol = float(residual_tol)
        self.fill_factor = float(fill_factor)
        self.sweeps_per_iter = int(sweeps_per_iter)
        self.is_symbolic_called = False
        self.final_residual = float("nan")
        self.num_iters = 0


def par_ilut_symbolic(handle: ParIlutHandle, A: CsrMatrix):
    """Symbolic phase — initial pattern = pattern of A (tri parts); budget
    bookkeeping only (the iteration re-symbolics internally)."""
    check(A.nrows == A.ncols, "par_ilut: square matrix required")
    handle.is_symbolic_called = True
    return A.nnz


def _sweep(Asp, L, U, n_sweeps: int):
    for _ in range(n_sweeps):
        R = (Asp - L @ U).tocsr()
        d = U.diagonal()
        d = np.where(d != 0, d, 1.0)
        Rl = sps.tril(R, k=-1).tocsr()
        # scale rows? scaling is by column of U diag: entry (i,j) /= u_jj
        Rl = (Rl @ sps.diags(1.0 / d)).tocsr()
        Ru = sps.triu(R, k=0).tocsr()
        L = (L + Rl).tocsr()
        U = (U + Ru).tocsr()
    return L, U


def _prune(L, U, budget_l, budget_u):
    def keep_largest(M, budget, is_lower):
        M = M.tocoo()
        diag_mask = M.row == M.col
        off_idx = np.nonzero(~diag_mask)[0]
        if off_idx.size > budget:
            mags = np.abs(M.data[off_idx])
            kth = np.partition(mags, off_idx.size - budget)[off_idx.size - budget]
            drop = off_idx[np.abs(M.data[off_idx]) < kth]
            M.data[drop] = 0.0
        out = M.tocsr()
        out.eliminate_zeros()
        return out

    return keep_largest(L, budget_l, True), keep_largest(U, budget_u, False)


def par_ilut_numeric(handle: ParIlutHandle, A: CsrMatrix) -> Tuple[CsrMatrix, CsrMatrix]:
    check(handle.is_symbolic_called, "par_ilut_numeric: symbolic first")
    Asp = A.to_scipy().tocsr().astype(np.float64)
    n = Asp.shape[0]
    # init: L = unit lower of A, U = upper of A (diagonal forced nonzero)
    L = (sps.tril(Asp, k=-1) + sps.identity(n)).tocsr()
    U = sps.triu(Asp, k=0).tocsr()
    dU = U.diagonal()
    if (dU == 0).any():
        U = (U + sps.diags(np.where(dU == 0, 1.0, 0.0))).tocsr()
    budget = int(handle.fill_factor * Asp.nnz)
    budget_l = budget // 2
    budget_u = budget - budget_l
    anorm = sps.linalg.norm(Asp)
    res = float("inf")
    it = 0
    for it in range(1, handle.max_iters + 1):
        # candidates: one sweep naturally adds R's pattern (L+Rl grows)
        L, U = _sweep(Asp, L, U, handle.sweeps_per_iter)
        L, U = _prune(L, U, budget_l, budget_u)
        # re-sweep on the pruned pattern (values only: R restricted to pattern)
        patL = L.copy(); patL.data = np.ones_like(patL.data)
        patU = U.copy(); patU.data = np.ones_like(patU.data)
        R = (Asp - L @ U).tocsr()
        d = np.where(U.diagonal() != 0, U.diagonal(), 1.0)
        L = (L + (sps.tril(R, -1) @ sps.diags(1.0 / d)).multiply(patL)).tocsr()
        U = (U + sps.triu(R, 0).multiply(patU)).tocsr()
        # ensure unit diagonal of L
        L = (L - sps.diags(L.diagonal()) + sps.identity(n)).tocsr()
        res = sps.linalg.norm((Asp - L @ U).multiply(Asp != 0)) / max(anorm, 1e-30)
        if res <= handle.residual_tol:
            break
    handle.final_residual = float(res)
    handle.num_iters = it
    L.sort_indices()
    U.sort_indices()
    dt = A.dtype
    return (CsrMatrix.from_scipy(L, value_dtype=dt),
            CsrMatrix.from_scipy(U, value_dtype=dt))


def par_ilut(A: CsrMatrix, **kw) -> Tuple[CsrMatrix, CsrMatrix]:
    h = ParIlutHandle(**kw)
    par_ilut_symbolic(h, A)
    return par_ilut_numeric(h, A)
