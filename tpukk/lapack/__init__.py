"""LAPACK component — analog of lapack/src/KokkosLapack_{gesv,svd,trtri}.hpp.

The reference's native impls are thin and the heavy lifting goes to TPLs
(host LAPACK/cuSOLVER/MAGMA, lapack/tpls/); here XLA's `lax.linalg`
decompositions are the "TPL" (SURVEY.md §2.7 TPU build note).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import check
from ..common.tracing import annotate

__all__ = ["gesv", "svd", "trtri", "getrf", "getrs", "geqrf", "cholesky"]


@annotate("lapack.gesv")
def gesv(A, B):
    """Solve A·X = B via LU with partial pivoting
    (cf. lapack/src/KokkosLapack_gesv.hpp)."""
    check(A.ndim == 2 and A.shape[0] == A.shape[1], "gesv: A must be square")
    return jnp.linalg.solve(A, B)


@annotate("lapack.svd")
def svd(A, full_matrices: bool = False, compute_uv: bool = True):
    """cf. lapack/src/KokkosLapack_svd.hpp."""
    return jnp.linalg.svd(A, full_matrices=full_matrices, compute_uv=compute_uv)


@annotate("lapack.trtri")
def trtri(A, uplo: str = "L", diag: str = "N"):
    """Invert a triangular matrix — cf. lapack/src/KokkosLapack_trtri.hpp.
    Implemented as a triangular solve against I (one XLA op)."""
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    return jax.lax.linalg.triangular_solve(
        A, eye, left_side=True, lower=(uplo.upper() == "L"),
        unit_diagonal=(diag.upper() == "U"),
    )


@annotate("lapack.getrf")
def getrf(A):
    """LU factorization returning (lu, pivots, permutation) — cf. batched
    Getrf; exposed here for parity with host LAPACK."""
    return jax.lax.linalg.lu(A)


@annotate("lapack.getrs")
def getrs(lu, piv, b):
    """Solve from a getrf factorization."""
    return jax.scipy.linalg.lu_solve((lu, piv), b)


@annotate("lapack.geqrf")
def geqrf(A):
    """QR factorization (economy)."""
    return jnp.linalg.qr(A, mode="reduced")


@annotate("lapack.cholesky")
def cholesky(A, upper: bool = False):
    L = jnp.linalg.cholesky(A)
    return L.T if upper else L
