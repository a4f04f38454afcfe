"""CHOLMOD-format supernodal factor import — the role of
sparse/src/KokkosSparse_sptrsv_cholmod.hpp (read_cholmod_factor): consume a
Cholesky factorization produced by CHOLMOD and drive tpukk's device solve
kernels (A = Pᵀ·L·Lᵀ·P  ⇒  x = Pᵀ·L⁻ᵀ·L⁻¹·P·b).

Two entry forms:

* the raw supernodal arrays of a ``cholmod_factor`` struct — exactly the
  fields the reference reads (``super``, ``pi``, ``px``, ``s``, ``x``,
  ``Perm``); panels are column-major with the full (nrows × ncols) leading
  block, upper-triangle entries of the diagonal block ignored;
* a ``scikit-sparse`` ``cholmod.Factor`` object, when that package is
  installed (``cholmod_import(factor)``) — its simplicial L/perm are used.

The imported supernode partition is forwarded to the supernodal solve plan
(``build_supernodal_plan(..., sn_of_col=...)``) so the reference's
partition, not re-detection, shapes the batched dense blocks.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from ..common.tracing import annotate
from ..containers import CsrMatrix
from .sptrsv import SptrsvAlgorithm, SptrsvHandle, sptrsv_solve, sptrsv_symbolic

__all__ = ["CholmodSolve", "cholmod_import", "cholmod_raw_to_csr"]


def cholmod_raw_to_csr(n, super_, pi, px, s, x):
    """Assemble lower-triangular CSR L from CHOLMOD supernodal raw arrays.

    For supernode k covering columns [super_[k], super_[k+1]):
    row pattern = s[pi[k]:pi[k+1]] (first ncols entries are the diagonal
    block rows), values column-major: L[s[pi[k]+i], super_[k]+j] =
    x[px[k] + j*nrows + i].  Entries above the diagonal of the diagonal
    block are storage padding and dropped.  Returns (scipy CSR, sn_of_col).
    """
    super_ = np.asarray(super_, np.int64)
    pi = np.asarray(pi, np.int64)
    px = np.asarray(px, np.int64)
    s = np.asarray(s, np.int64)
    x = np.asarray(x)
    nsn = len(super_) - 1
    rows_all, cols_all, vals_all = [], [], []
    sn_of_col = np.zeros(n, np.int64)
    for k in range(nsn):
        c0, c1 = super_[k], super_[k + 1]
        ncols = c1 - c0
        ridx = s[pi[k]:pi[k + 1]]
        nrows = len(ridx)
        sn_of_col[c0:c1] = k
        panel = x[px[k]:px[k] + nrows * ncols].reshape(ncols, nrows).T
        rr = np.broadcast_to(ridx[:, None], (nrows, ncols)).ravel()
        cc = np.broadcast_to(np.arange(c0, c1)[None, :], (nrows, ncols)).ravel()
        vv = panel.ravel()
        keep = rr >= cc
        rows_all.append(rr[keep])
        cols_all.append(cc[keep])
        vals_all.append(vv[keep])
    if nsn:
        rows = np.concatenate(rows_all)
        cols = np.concatenate(cols_all)
        vals = np.concatenate(vals_all)
    else:
        rows = cols = np.empty(0, np.int64)
        vals = np.empty(0)
    L = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
    L.sort_indices()
    return L, sn_of_col


class CholmodSolve:
    """x = Pᵀ·L⁻ᵀ·L⁻¹·P·b for an imported Cholesky factor.  Callable; also
    exposes .apply (the preconditioner contract)."""

    def __init__(self, Lh, Lth, L, Lt, perm):
        import jax.numpy as jnp

        self.Lh, self.Lth = Lh, Lth
        self.L, self.Lt = L, Lt
        # CHOLMOD Perm: (P b)[i] = b[perm[i]]; x = Pᵀ w  ⇔  x[perm[i]] = w[i]
        self.perm = jnp.asarray(np.asarray(perm, np.int32))
        self.inv_perm = jnp.asarray(np.argsort(perm).astype(np.int32))

    def __call__(self, b):
        import jax.numpy as jnp

        bp = jnp.take(jnp.asarray(b), self.perm)
        y = sptrsv_solve(self.Lh, self.L, bp)
        w = sptrsv_solve(self.Lth, self.Lt, y)
        return jnp.take(w, self.inv_perm)

    def apply(self, r):
        return self.__call__(r)


@annotate("sptrsv_cholmod_import")
def cholmod_import(factor=None, *, n=None, super_=None, pi=None, px=None,
                   s=None, x=None, perm=None,
                   algorithm: SptrsvAlgorithm = SptrsvAlgorithm.SEQLVLSCHD,
                   value_dtype=None) -> CholmodSolve:
    """Import a CHOLMOD Cholesky factor (cf. read_cholmod_factor,
    KokkosSparse_sptrsv_cholmod.hpp).

    Pass either a scikit-sparse ``cholmod.Factor`` as ``factor``, or the raw
    supernodal struct arrays.  ``algorithm`` SUPERNODAL routes the solve
    through the batched dense-block path with the IMPORTED partition."""
    sn_of_col = None
    if factor is not None:
        Lsp = factor.L().tocsr()
        perm = np.asarray(factor.P(), np.int64)
    else:
        if any(a is None for a in (n, super_, pi, px, s, x)):
            raise ValueError("cholmod_import: factor or raw arrays required")
        Lsp, sn_of_col = cholmod_raw_to_csr(n, super_, pi, px, s, x)
        if perm is None:
            perm = np.arange(Lsp.shape[0], dtype=np.int64)
    Lsp.sort_indices()
    Ltsp = Lsp.T.tocsr()
    Ltsp.sort_indices()
    L = CsrMatrix.from_scipy(Lsp, value_dtype=value_dtype)
    Lt = CsrMatrix.from_scipy(Ltsp, value_dtype=value_dtype)
    Lh = SptrsvHandle(lower=True, algorithm=algorithm)
    Lth = SptrsvHandle(lower=False, algorithm=algorithm)
    if algorithm == SptrsvAlgorithm.SUPERNODAL and sn_of_col is not None:
        Lh.sn_partition = sn_of_col
        # upper solve reuses the same partition mirrored by the lower-form
        # index reversal inside the plan builder
        Lth.sn_partition = sn_of_col[::-1]
    sptrsv_symbolic(Lh, L)
    sptrsv_symbolic(Lth, Lt)
    return CholmodSolve(Lh, Lth, L, Lt, perm)
