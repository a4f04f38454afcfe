"""Batched small-dense kernels — analog of batched/dense/src/ (54 headers:
Gemm, Gemv, Ger, Syr, Dot, Axpy, Xpay, HadamardProduct, Copy/Set/Scale/
SetIdentity, AddRadial, LU, SolveLU, InverseLU, Trsm, Trsv, Trmm, Trtri, QR,
Householder/ApplyQ, SVD, Eigendecomposition, Gesv, Getrf/Getrs, Pttrf/Pttrs,
Tbsv, Laswp, Iamax — SURVEY.md §2.6).

The reference's Serial/Team/TeamVector axis (KokkosBatched_Gemm_Decl.hpp:39,
90,122) collapses on TPU into `vmap` over the leading batch dimension
(SURVEY.md §3.5): XLA batches the MXU/VPU work natively, and the
Algo::{Unblocked,Blocked} tag distinction disappears (the compiler tiles).
All functions take (B, ...) batched arrays and are functional.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import check
from ..common.tracing import annotate

__all__ = [
    "gemm", "gemv", "ger", "syr", "dot", "axpy", "xpay", "hadamard",
    "copy", "set_value", "scale", "set_identity", "add_radial",
    "lu", "solve_lu", "inverse_lu", "trsm", "trsv", "trmm", "trtri",
    "qr", "apply_q", "svd", "eigh", "gesv", "getrf", "getrs",
    "pttrf", "pttrs", "pbtrf", "pbtrs", "gbtrf", "gbtrs",
    "tbsv", "laswp", "iamax",
    "qr_with_column_pivoting", "utv", "solve_utv",
]


def _op(A, trans):
    t = trans.upper()
    if t == "N":
        return A
    if t == "T":
        return jnp.swapaxes(A, -1, -2)
    return jnp.conj(jnp.swapaxes(A, -1, -2))


# ---- BLAS-like ------------------------------------------------------------

@annotate("batched.gemm")
def gemm(transA, transB, alpha, A, B, beta, C):
    """(B,m,k)x(B,k,n): batched MXU matmul (cf. KokkosBatched_Gemm_Decl.hpp)."""
    pet = jnp.promote_types(A.dtype, jnp.float32)
    return (beta * C + alpha * jnp.matmul(_op(A, transA), _op(B, transB),
                                          precision=jax.lax.Precision.HIGHEST)
            .astype(pet)).astype(C.dtype)


@annotate("batched.gemv")
def gemv(trans, alpha, A, x, beta, y):
    return beta * y + alpha * jnp.einsum("bij,bj->bi", _op(A, trans), x,
                                         precision=jax.lax.Precision.HIGHEST)


@annotate("batched.ger")
def ger(alpha, x, y, A):
    return A + alpha * jnp.einsum("bi,bj->bij", x, jnp.conj(y))


@annotate("batched.syr")
def syr(uplo, alpha, x, A):
    full = alpha * jnp.einsum("bi,bj->bij", x, x)
    n = A.shape[-1]
    mask = jnp.tril(jnp.ones((n, n), bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones((n, n), bool))
    return A + jnp.where(mask, full, 0)


@annotate("batched.dot")
def dot(x, y):
    return jnp.sum(jnp.conj(x) * y, axis=-1)


@annotate("batched.axpy")
def axpy(alpha, x, y):
    return y + _bcast(alpha, x) * x


@annotate("batched.xpay")
def xpay(beta, x, y):
    """x + beta*y (cf. KokkosBatched_Xpay.hpp)."""
    return x + _bcast(beta, y) * y


def _bcast(a, x):
    a = jnp.asarray(a)
    if a.ndim == 1 and x.ndim > 1:
        return a.reshape((-1,) + (1,) * (x.ndim - 1))
    return a


@annotate("batched.hadamard")
def hadamard(alpha, x, y):
    return alpha * x * y


@annotate("batched.copy")
def copy(x):
    return jnp.array(x)


@annotate("batched.set_value")
def set_value(x, val):
    return jnp.full_like(x, val)


@annotate("batched.scale")
def scale(alpha, x):
    return _bcast(alpha, x) * x


@annotate("batched.set_identity")
def set_identity(A):
    n = A.shape[-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)


@annotate("batched.add_radial")
def add_radial(eps, A):
    """A += eps*sign(diag)*I — diagonal stabilizer
    (cf. KokkosBatched_AddRadial_Decl.hpp)."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    shift = eps * jnp.where(d >= 0, 1.0, -1.0).astype(A.dtype)
    return A + shift[..., None] * jnp.eye(A.shape[-1], dtype=A.dtype)


# ---- factorizations -------------------------------------------------------

@annotate("batched.lu")
def lu(A):
    """Unpivoted batched LU stored packed (L unit-lower, U upper in one
    matrix) — the KokkosBatched::LU semantic (no pivoting,
    KokkosBatched_LU_Decl.hpp)."""
    n = A.shape[-1]

    # right-looking elimination with masks, unrolled over static n
    def body(j, M):
        piv = M[..., j, j]
        l = M[..., :, j] / piv[..., None]
        l = jnp.where(jnp.arange(n) > j, l, 0.0)
        u = jnp.where(jnp.arange(n) >= j, M[..., j, :], 0.0)
        M = M - l[..., :, None] * u[..., None, :]
        # write back L factors into strictly-lower part of column j
        M = M.at[..., :, j].set(jnp.where(jnp.arange(n) > j, l, M[..., :, j]))
        return M

    M = A
    for j in range(n - 1):
        M = body(j, M)
    return M


@annotate("batched.solve_lu")
def solve_lu(LU, b, trans: str = "N"):
    """Solve with a packed unpivoted LU (cf. KokkosBatched_SolveLU_Decl.hpp)."""
    n = LU.shape[-1]
    L = jnp.tril(LU, -1) + jnp.broadcast_to(jnp.eye(n, dtype=LU.dtype), LU.shape)
    U = jnp.triu(LU)
    rhs = b[..., None] if b.ndim == LU.ndim - 1 else b
    if trans.upper() == "N":
        y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True, unit_diagonal=True)
        x = jax.lax.linalg.triangular_solve(U, y, left_side=True, lower=False)
    else:
        y = jax.lax.linalg.triangular_solve(U, rhs, left_side=True, lower=False, transpose_a=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, unit_diagonal=True, transpose_a=True)
    return x[..., 0] if b.ndim == LU.ndim - 1 else x


@annotate("batched.inverse_lu")
def inverse_lu(LU):
    n = LU.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=LU.dtype), LU.shape)
    return solve_lu(LU, eye)


@annotate("batched.trsm")
def trsm(side, uplo, trans, diag, alpha, A, B):
    return jax.lax.linalg.triangular_solve(
        A, alpha * B, left_side=(side.upper() == "L"),
        lower=(uplo.upper() == "L"),
        transpose_a=(trans.upper() == "T"),
        conjugate_a=(trans.upper() == "C"),
        unit_diagonal=(diag.upper() == "U"),
    )


@annotate("batched.trsv")
def trsv(uplo, trans, diag, A, b):
    return trsm("L", uplo, trans, diag, 1.0, A, b[..., None])[..., 0]


@annotate("batched.trmm")
def trmm(side, uplo, trans, diag, alpha, A, B):
    n = A.shape[-1]
    T = jnp.tril(A) if uplo.upper() == "L" else jnp.triu(A)
    if diag.upper() == "U":
        d = jnp.diagonal(T, axis1=-2, axis2=-1)
        T = T - d[..., None] * jnp.eye(n, dtype=A.dtype) + jnp.eye(n, dtype=A.dtype)
    T = _op(T, trans)
    hp = jax.lax.Precision.HIGHEST
    return alpha * (jnp.matmul(T, B, precision=hp) if side.upper() == "L"
                    else jnp.matmul(B, T, precision=hp))


@annotate("batched.trtri")
def trtri(uplo, diag, A):
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return jax.lax.linalg.triangular_solve(
        A, eye, left_side=True, lower=(uplo.upper() == "L"),
        unit_diagonal=(diag.upper() == "U"))


@annotate("batched.qr")
def qr(A):
    return jnp.linalg.qr(A, mode="reduced")


@annotate("batched.apply_q")
def apply_q(Q, B, trans: str = "N"):
    """Apply Q (from qr) to B (cf. KokkosBatched_ApplyQ_Decl.hpp)."""
    return jnp.matmul(_op(Q, trans), B, precision=jax.lax.Precision.HIGHEST)


@annotate("batched.svd")
def svd(A, full_matrices: bool = False):
    return jnp.linalg.svd(A, full_matrices=full_matrices)


@annotate("batched.eigh")
def eigh(A):
    """Symmetric eigendecomposition (the reference's Eigendecomposition
    targets general small matrices; symmetric path is the XLA-native one)."""
    return jnp.linalg.eigh(A)


@annotate("batched.gesv")
def gesv(A, b):
    """Batched solve with pivoting (cf. KokkosBatched_Gesv.hpp; the
    reference's static-pivoting variant is an optimization of the same
    contract)."""
    rhs = b[..., None] if b.ndim == A.ndim - 1 else b
    x = jnp.linalg.solve(A, rhs)
    return x[..., 0] if b.ndim == A.ndim - 1 else x


@annotate("batched.getrf")
def getrf(A):
    return jax.lax.linalg.lu(A)


@annotate("batched.getrs")
def getrs(lu_, piv, b, trans: str = "N"):
    rhs = b[..., None] if b.ndim == lu_.ndim - 1 else b
    n = lu_.shape[-1]
    perm = _piv_to_perm(piv, n)
    if trans.upper() == "N":
        pb = jnp.take_along_axis(rhs, perm[..., None], axis=-2)
        y = jax.lax.linalg.triangular_solve(lu_, pb, left_side=True, lower=True, unit_diagonal=True)
        x = jax.lax.linalg.triangular_solve(lu_, y, left_side=True, lower=False)
    else:
        y = jax.lax.linalg.triangular_solve(lu_, rhs, left_side=True, lower=False, transpose_a=True)
        x = jax.lax.linalg.triangular_solve(lu_, y, left_side=True, lower=True, unit_diagonal=True, transpose_a=True)
        inv = jnp.argsort(perm, axis=-1)
        x = jnp.take_along_axis(x, inv[..., None], axis=-2)
    return x[..., 0] if b.ndim == lu_.ndim - 1 else x


def _piv_to_perm(piv, n):
    """LAPACK-style sequential row swaps -> permutation vector."""
    def one(p):
        perm = jnp.arange(n)
        def body(i, perm):
            j = p[i]
            a, bb = perm[i], perm[j]
            perm = perm.at[i].set(bb).at[j].set(a)
            return perm
        return jax.lax.fori_loop(0, p.shape[0], body, perm)
    flat_piv = piv.reshape((-1, piv.shape[-1]))
    perms = jax.vmap(one)(flat_piv)
    return perms.reshape(piv.shape[:-1] + (n,))


# ---- banded / tridiagonal -------------------------------------------------

@annotate("batched.pttrf")
def pttrf(d, e):
    """LDLᵀ of a symmetric tridiagonal (d diag (B,n), e off-diag (B,n-1)) —
    cf. KokkosBatched_Pttrf.hpp.  Sequential recurrence via lax.scan."""
    def scan_fn(carry, de):
        d_prev = carry
        d_i, e_im1 = de
        l = e_im1 / d_prev
        d_new = d_i - l * e_im1
        return d_new, (d_new, l)

    d0 = d[..., 0]
    _, (d_rest, l) = jax.lax.scan(
        scan_fn, d0, (jnp.moveaxis(d[..., 1:], -1, 0), jnp.moveaxis(e, -1, 0)))
    d_out = jnp.concatenate([d0[..., None], jnp.moveaxis(d_rest, 0, -1)], axis=-1)
    return d_out, jnp.moveaxis(l, 0, -1)


@annotate("batched.pttrs")
def pttrs(d, l, b):
    """Solve from pttrf factors."""
    n = b.shape[-1]

    def fwd(carry, lb):
        y_prev = carry
        l_i, b_i = lb
        y = b_i - l_i * y_prev
        return y, y

    y0 = b[..., 0]
    _, y_rest = jax.lax.scan(fwd, y0, (jnp.moveaxis(l, -1, 0), jnp.moveaxis(b[..., 1:], -1, 0)))
    y = jnp.concatenate([y0[..., None], jnp.moveaxis(y_rest, 0, -1)], axis=-1)
    z = y / d

    def bwd(carry, lz):
        x_next = carry
        l_i, z_i = lz
        x = z_i - l_i * x_next
        return x, x

    xn = z[..., -1]
    _, x_rest = jax.lax.scan(
        bwd, xn,
        (jnp.moveaxis(l[..., ::-1], -1, 0), jnp.moveaxis(z[..., -2::-1], -1, 0)))
    x = jnp.concatenate([xn[..., None], jnp.moveaxis(x_rest, 0, -1)], axis=-1)
    return x[..., ::-1]


@annotate("batched.pbtrf")
def pbtrf(A):
    """Banded Cholesky — dense-storage fallback (cf. KokkosBatched_Pbtrf.hpp;
    a band-storage kernel is a planned refinement)."""
    return jnp.linalg.cholesky(A)


@annotate("batched.pbtrs")
def pbtrs(L, b):
    rhs = b[..., None] if b.ndim == L.ndim - 1 else b
    y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)
    return x[..., 0] if b.ndim == L.ndim - 1 else x


@annotate("batched.gbtrf")
def gbtrf(A):
    """Banded LU — dense-storage fallback (cf. KokkosBatched_Gbtrf.hpp)."""
    return jax.lax.linalg.lu(A)


@annotate("batched.gbtrs")
def gbtrs(lu_, piv, b):
    return getrs(lu_, piv, b)


@annotate("batched.tbsv")
def tbsv(uplo, trans, diag, A, b):
    """Triangular banded solve — dense-storage fallback
    (cf. KokkosBatched_Tbsv.hpp)."""
    return trsv(uplo, trans, diag, A, b)


@annotate("batched.laswp")
def laswp(piv, B):
    """Apply LAPACK-style row interchanges (cf. KokkosBatched_Laswp.hpp)."""
    n = B.shape[-2]
    perm = _piv_to_perm(piv, n)
    return jnp.take_along_axis(B, perm[..., None], axis=-2)


@annotate("batched.iamax")
def iamax(x):
    return jnp.argmax(jnp.abs(x), axis=-1)


# ---- rank-revealing factorizations ---------------------------------------

def _batch_apply(fn, A, extra=()):
    """vmap fn over all leading batch dims of A (and matching extras)."""
    f = fn
    for _ in range(A.ndim - 2):
        f = jax.vmap(f)
    return f(A, *extra)


@annotate("batched.qr_with_column_pivoting")
def qr_with_column_pivoting(A):
    """Householder QR with greedy column pivoting:  A[..., :, perm] = Q @ R
    (cf. batched/dense/src/KokkosBatched_QR_WithColumnPivoting_Decl.hpp).
    Returns (Q (m,k), R (k,n), perm (n,)) with k = min(m, n); |diag R| is
    non-increasing.  Real dtypes (the reference's tested axis)."""

    def one(a):
        m, n = a.shape
        k = min(m, n)
        dtype = a.dtype
        rows = jnp.arange(m)
        cols = jnp.arange(n)

        def step(j, carry):
            q, r, perm = carry
            live = (rows >= j)[:, None]
            norms = jnp.sum(jnp.where(live, r, 0) ** 2, axis=0)
            norms = jnp.where(cols >= j, norms, -jnp.inf)
            p = jnp.argmax(norms)
            jp = jnp.stack([j, p])
            pj = jnp.stack([p, j])
            r = r.at[:, jp].set(r[:, pj])
            perm = perm.at[jp].set(perm[pj])
            # Householder for column j on rows >= j
            x = jnp.where(rows >= j, r[:, j], 0)
            alpha = jnp.sqrt(jnp.sum(x * x))
            sgn = jnp.where(r[j, j] >= 0, 1.0, -1.0).astype(dtype)
            v = x.at[j].add(sgn * alpha)
            vn2 = jnp.sum(v * v)
            v = jnp.where(vn2 > 0, v * jax.lax.rsqrt(jnp.maximum(vn2, 1e-37)), 0)
            hp = jax.lax.Precision.HIGHEST
            r = r - 2.0 * jnp.outer(v, jnp.matmul(v, r, precision=hp))
            q = q - 2.0 * jnp.outer(jnp.matmul(q, v, precision=hp), v)
            return q, r, perm

        q, r, perm = jax.lax.fori_loop(
            0, k, step, (jnp.eye(m, dtype=dtype), a, jnp.arange(n)))
        r = jnp.where(rows[:, None] <= cols[None, :], r, 0)
        return q[:, :k], r[:k], perm

    return _batch_apply(one, A)


@annotate("batched.utv")
def utv(A, rel_tol: float = 1e-6):
    """Rank-revealing UTV factorization (cf. KokkosBatched_UTV_Decl.hpp):
    A[..., :, perm] = U @ T @ Vᵀ with U (m,k), T (k,k) lower-triangular with
    its trailing (k-rank) block zero, V (n,k) orthonormal columns.  Returns
    (U, T, V, perm, rank).  rank is detected as |R_jj| > rel_tol*|R_00| after
    the pivoted QR; shapes stay static (the rank-deficient tail is zeroed),
    matching the reference's matrix_rank output contract."""

    def one(a):
        q, r, perm = qr_with_column_pivoting(a)
        k = r.shape[0]
        d = jnp.abs(jnp.diagonal(r))
        rank = jnp.sum((d > rel_tol * jnp.maximum(d[0], 1e-37)).astype(jnp.int32))
        # LQ of the leading `rank` rows of R via QR of maskedᵀ:
        #   R(rank,n)ᵀ = V(n,k) R2(k,k)  =>  R = R2ᵀ Vᵀ,  T = R2ᵀ lower-tri
        rmask = jnp.where((jnp.arange(k) < rank)[:, None], r, 0)
        v, r2 = jnp.linalg.qr(rmask.T, mode="reduced")
        return q, r2.T, v, perm, rank

    return _batch_apply(one, A)


@annotate("batched.solve_utv")
def solve_utv(U, T, V, perm, rank, b):
    """Min-norm least-squares solve from utv() factors (cf.
    KokkosBatched_SolveUTV_Decl.hpp):  x = argmin |x| s.t. x minimizes
    |A x - b|.  Handles the dynamic rank by solving the rank-padded lower
    system with a unit-padded diagonal and masking the tail."""

    def one(u, t, v, p, rk, rhs):
        k = t.shape[0]
        c = u.T @ rhs                                   # (k,) or (k,nrhs)
        live = jnp.arange(k) < rk
        # pad the dead diagonal so the triangular solve stays nonsingular
        tpad = t + jnp.diag(jnp.where(live, 0.0, 1.0).astype(t.dtype))
        z = jax.lax.linalg.triangular_solve(
            tpad, c[:, None] if c.ndim == 1 else c, left_side=True, lower=True)
        z = jnp.where(live[:, None], z, 0)
        x = v @ z                                        # (n, nrhs)
        xp = jnp.zeros_like(x).at[p].set(x)              # undo column pivoting
        return xp[:, 0] if rhs.ndim == 1 else xp

    f = one
    for _ in range(U.ndim - 2):
        f = jax.vmap(f)
    return f(U, T, V, perm, rank, b)
