"""BLAS2 — gemv / ger / syr / syr2.  Analog of blas/src/KokkosBlas2_*.hpp.
XLA's dot/outer fusions are the "TPL" here; transpose modes are explicit
arguments like the reference's mode chars ('N','T','C')."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import arith_traits, check
from ..common.tracing import annotate

__all__ = ["gemv", "ger", "syr", "syr2"]


def _apply_trans(A, trans: str):
    t = trans.upper()
    check(t in ("N", "T", "C"), f"invalid trans '{trans}'")
    if t == "N":
        return A
    if t == "T":
        return A.T
    return jnp.conj(A).T


@annotate("blas2.gemv")
def gemv(trans, alpha, A, x, beta, y):
    """y = beta*y + alpha*op(A)·x — cf. blas/src/KokkosBlas2_gemv.hpp."""
    op = _apply_trans(A, trans)
    return beta * y + alpha * jnp.matmul(op, x, precision=jax.lax.Precision.HIGHEST)


@annotate("blas2.ger")
def ger(alpha, x, y, A, conj_y: bool = True):
    """A += alpha * x yᴴ (rank-1 update) — cf. KokkosBlas2_ger.hpp."""
    tr = arith_traits(A.dtype)
    yv = tr.conj(y) if conj_y else y
    return A + alpha * jnp.outer(x, yv)


@annotate("blas2.syr")
def syr(uplo, alpha, x, A):
    """Symmetric rank-1 update on the given triangle — cf. KokkosBlas2_syr.hpp."""
    full = alpha * jnp.outer(x, x)
    mask = jnp.tril(jnp.ones_like(A, bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones_like(A, bool))
    return A + jnp.where(mask, full, 0)


@annotate("blas2.syr2")
def syr2(uplo, alpha, x, y, A):
    """Symmetric rank-2 update — cf. KokkosBlas2_syr2.hpp."""
    full = alpha * (jnp.outer(x, y) + jnp.outer(y, x))
    mask = jnp.tril(jnp.ones_like(A, bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones_like(A, bool))
    return A + jnp.where(mask, full, 0)
