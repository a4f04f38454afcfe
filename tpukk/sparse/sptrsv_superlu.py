"""External-factor import for the triangular solvers — the role of the
reference's SuperLU/CHOLMOD supernodal adapters
(sparse/src/KokkosSparse_sptrsv_superlu.hpp:87-140, _cholmod.hpp): consume a
factorization produced by an external package and drive OUR solve kernels.

TPU translation: scipy's SuperLU object (`scipy.sparse.linalg.splu`) is the
in-environment external factorizer; `superlu_import` converts its permuted
L/U factors into tpukk SptrsvHandles (level-set or supernodal algorithm —
the supernode detection runs on the imported pattern exactly as it does on
tpukk's own ILU factors), and `SuperLUSolve` applies
x = Pc·(U⁻¹·(L⁻¹·(Pr·b))) through the device solve path.  A CHOLMOD-style
import is the same entry point fed with a Cholesky factor (L, Lᵀ).
"""
from __future__ import annotations

import numpy as np

from ..common.tracing import annotate
from ..containers import CsrMatrix
from .sptrsv import SptrsvAlgorithm, SptrsvHandle, sptrsv_solve, sptrsv_symbolic

__all__ = ["SuperLUSolve", "superlu_import"]


class SuperLUSolve:
    """Imported LU solve: handles + row/col permutations from an external
    factorization.  Callable as x = solver(b); usable as a GMRES/PCG
    preconditioner via .apply (the LUPrec contract)."""

    def __init__(self, Lh, Uh, L, U, perm_r, perm_c):
        import jax.numpy as jnp

        self.Lh, self.Uh = Lh, Uh
        self.L, self.U = L, U
        # scipy convention: Pr·A·Pc = L·U with (Pr b)[perm_r[i]] = b[i]
        # and (Pc z) = z[perm_c] (verified numerically against lu.solve)
        self.inv_perm_r = jnp.asarray(np.argsort(perm_r).astype(np.int32))
        self.perm_c = jnp.asarray(np.asarray(perm_c, np.int32))

    def __call__(self, b):
        import jax.numpy as jnp

        bp = jnp.take(jnp.asarray(b), self.inv_perm_r)
        y = sptrsv_solve(self.Lh, self.L, bp)
        z = sptrsv_solve(self.Uh, self.U, y)
        return jnp.take(z, self.perm_c)

    def apply(self, r):
        return self.__call__(r)


@annotate("sptrsv_superlu_import")
def superlu_import(lu, algorithm: SptrsvAlgorithm = SptrsvAlgorithm.SEQLVLSCHD,
                   value_dtype=None) -> SuperLUSolve:
    """Import a scipy ``SuperLU`` object (``scipy.sparse.linalg.splu(A)``)
    into tpukk solve handles.

    Reference parity: sptrsv_supernode.hpp's ``read_superlu_*`` — the
    external package owns the numeric factorization, this library owns the
    device solve.  ``algorithm`` selects level-set (default) or SUPERNODAL
    (pattern-detected supernodes, batched MXU diagonal solves)."""
    Lsp = lu.L.tocsr()
    Usp = lu.U.tocsr()
    Lsp.sort_indices()
    Usp.sort_indices()
    L = CsrMatrix.from_scipy(Lsp, value_dtype=value_dtype)
    U = CsrMatrix.from_scipy(Usp, value_dtype=value_dtype)
    Lh = SptrsvHandle(lower=True, algorithm=algorithm)
    Uh = SptrsvHandle(lower=False, algorithm=algorithm)
    sptrsv_symbolic(Lh, L)
    sptrsv_symbolic(Uh, U)
    return SuperLUSolve(Lh, Uh, L, U,
                        np.asarray(lu.perm_r, np.int64),
                        np.asarray(lu.perm_c, np.int64))
