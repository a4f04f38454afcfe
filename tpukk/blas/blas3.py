"""BLAS3 — gemm / trmm / trsm.  Analog of blas/src/KokkosBlas3_*.hpp.

gemm maps directly to the MXU via `jnp.dot` with an explicit accumulation
dtype (`preferred_element_type`) — the TPU equivalent of the reference's
blocked team-scratch GEMM (blas/impl/KokkosBlas3_gemm_impl.hpp:34-57); XLA
performs the tiling/double-buffering the reference hand-codes.  The
single-column fallback to gemv (KokkosBlas3_gemm.hpp:162-163) is free here —
XLA specializes on shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import check
from ..common.tracing import annotate

__all__ = ["gemm", "trmm", "trsm"]


def _op(A, trans: str):
    t = trans.upper()
    check(t in ("N", "T", "C"), f"invalid trans '{trans}'")
    if t == "N":
        return A
    if t == "T":
        return A.T
    return jnp.conj(A).T


@annotate("blas3.gemm")
def gemm(transA, transB, alpha, A, B, beta, C, preferred_element_type=None):
    """C = beta*C + alpha*op(A)·op(B) — cf. blas/src/KokkosBlas3_gemm.hpp:96."""
    pet = preferred_element_type or jnp.promote_types(A.dtype, jnp.float32)
    prod = jnp.dot(_op(A, transA), _op(B, transB), preferred_element_type=pet,
                   precision=jax.lax.Precision.HIGHEST)
    return (beta * C + alpha * prod).astype(C.dtype)


def _tri_mask(A, uplo: str, diag: str):
    m = jnp.tril(A) if uplo.upper() == "L" else jnp.triu(A)
    if diag.upper() == "U":  # unit diagonal
        m = m - jnp.diag(jnp.diag(m)) + jnp.eye(A.shape[0], dtype=A.dtype)
    return m

@annotate("blas3.trmm")
def trmm(side, uplo, trans, diag, alpha, A, B):
    """B = alpha*op(tri(A))·B (side='L') or alpha*B·op(tri(A)) (side='R')."""
    T = _op(_tri_mask(A, uplo, diag), trans)
    hp = jax.lax.Precision.HIGHEST
    if side.upper() == "L":
        return alpha * jnp.matmul(T, B, precision=hp)
    return alpha * jnp.matmul(B, T, precision=hp)


@annotate("blas3.trsm")
def trsm(side, uplo, trans, diag, alpha, A, B):
    """Solve op(tri(A))·X = alpha*B (side='L') or X·op(tri(A)) = alpha*B —
    via XLA's native triangular_solve (lax.linalg)."""
    t = trans.upper()
    lower = uplo.upper() == "L"
    unit = diag.upper() == "U"
    left = side.upper() == "L"
    X = jax.lax.linalg.triangular_solve(
        A, alpha * B,
        left_side=left,
        lower=lower,
        transpose_a=(t == "T"),
        conjugate_a=(t == "C"),
        unit_diagonal=unit,
    )
    return X
