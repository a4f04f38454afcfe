"""trsv — dense-RHS sparse triangular solve, analog of
sparse/src/KokkosSparse_trsv.hpp (the reference impl is a host-sequential
reference; ours routes through the level-scheduled sptrsv plan, which is the
TPU-parallel implementation of the same contract)."""
from __future__ import annotations

import jax.numpy as jnp

from ..common import check
from ..containers import CsrMatrix
from .sptrsv import SptrsvHandle, sptrsv_solve, sptrsv_symbolic
from ..common.tracing import annotate

__all__ = ["trsv"]


@annotate("trsv")
def trsv(uplo: str, trans: str, diag: str, A: CsrMatrix, b):
    """Solve op(tri(A))·x = b.  uplo 'L'/'U', trans 'N'/'T', diag 'N'/'U'
    (unit diagonal)."""
    check(uplo.upper() in ("L", "U"), "trsv: uplo must be L or U")
    check(diag.upper() in ("N", "U"), "trsv: diag must be N or U")
    work = A
    lower = uplo.upper() == "L"
    if trans.upper() in ("T", "C"):
        from ..containers.sort_crs import transpose

        work = transpose(A)
        if trans.upper() == "C":
            work = work.with_values(jnp.conj(work.values))
        lower = not lower
    if diag.upper() == "U":
        # unit diagonal: set diagonal to 1 explicitly
        import numpy as np
        import scipy.sparse as sps

        sp = work.to_scipy().tolil()
        sp.setdiag(1.0)
        spc = sp.tocsr()
        spc.sort_indices()
        work = CsrMatrix.from_scipy(spc, value_dtype=A.dtype)
    h = SptrsvHandle(lower=lower)
    sptrsv_symbolic(h, work)
    if b.ndim == 1:
        return sptrsv_solve(h, work, b)
    cols = [sptrsv_solve(h, work, b[:, j]) for j in range(b.shape[1])]
    return jnp.stack(cols, axis=1)
