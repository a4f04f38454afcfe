"""Batched general (nonsymmetric) eigendecomposition — analog of
KokkosBatched_Eigendecomposition (batched/dense/src/
KokkosBatched_Eigendecomposition_Decl.hpp: Hessenberg condensation, QR
iteration to Schur form, eigenvalues er+ei·i with conjugate pairs adjacent,
left/right eigenvectors; eigenvalue-only interface =
KokkosBatched_Eigenvalue_Serial_Internal.hpp).

TPU-native design: the reference runs Francis double-shift QR in *real*
arithmetic per thread.  Here each matrix is condensed with masked Householder
reflectors (static shapes, `lax.fori_loop`), then driven to *complex* Schur
form by a single-Wilkinson-shift implicit QR with bulge chasing under
`lax.while_loop` — complex arithmetic trades the double-shift bookkeeping for
rank-1/Givens updates XLA vectorizes cleanly, and `vmap` supplies the batch
axis (SURVEY.md §3.5: the Serial/Team/TeamVector axis collapses into vmap).
Eigenvectors come from masked triangular solves against the Schur factor.

This also fills a JAX-on-TPU hole: `jnp.linalg.eig` is CPU-only.

Backend note: standard XLA:TPU lowers complex64 to real pairs, so this path
compiles for TPU; the *experimental axon relay backend in this container*
rejects ALL complex-dtype ops ("UNIMPLEMENTED", probed 2026-08: even c64
add fails), so in-container TPU runs of eig/schur are blocked by the
environment, not the kernel design.  Correctness is oracle-tested against
numpy.linalg.eig on the CPU backend (tests/test_batched.py TestGeneralEig).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from ..common.tracing import annotate

__all__ = ["hessenberg", "schur", "eig", "eigenvalues", "eigendecomposition"]

_HIGH = jax.lax.Precision.HIGHEST


def _complex_dtype(dtype):
    return jnp.complex64 if jnp.finfo(dtype).bits <= 32 else jnp.complex128


def _hessenberg_one(A):
    """(H, Q) with Q^H A Q = H upper Hessenberg.  Masked Householder columns
    (the condensation step of Eigendecomposition_Serial_Internal)."""
    n = A.shape[-1]
    dt = A.dtype
    rows = jnp.arange(n)

    def body(j, HQ):
        H, Q = HQ
        x = H[:, j]
        m = rows > j
        xm = jnp.where(m, x, 0)
        normx = jnp.sqrt(jnp.sum(jnp.abs(xm) ** 2))
        p = jnp.take(x, j + 1, mode="clip")
        phase = jnp.where(jnp.abs(p) > 0, p / jnp.maximum(jnp.abs(p), 1e-300),
                          jnp.ones((), dt))
        e = (rows == j + 1).astype(dt)
        u = xm - (-phase * normx) * e
        unorm = jnp.sqrt(jnp.sum(jnp.abs(u) ** 2))
        u = jnp.where(unorm > 0, u / jnp.where(unorm > 0, unorm, 1), 0)
        uh = jnp.conj(u)
        # H ← (I-2uuᴴ) H (I-2uuᴴ);  Q ← Q (I-2uuᴴ)
        H = H - 2.0 * jnp.outer(u, uh @ H)
        H = H - 2.0 * jnp.outer(H @ u, uh)
        Q = Q - 2.0 * jnp.outer(Q @ u, uh)
        return H, Q

    Q0 = jnp.eye(n, dtype=dt)
    if n <= 2:
        return A, Q0
    return jax.lax.fori_loop(0, n - 2, body, (A, Q0))


def _givens(x, z):
    """Unitary G=[[c̄x, c̄z],[-z, x]]/r zeroing z in (x,z)ᵀ; identity if r≈0."""
    r = jnp.sqrt(jnp.abs(x) ** 2 + jnp.abs(z) ** 2)
    ok = r > 0
    rs = jnp.where(ok, r, 1)
    g00 = jnp.where(ok, jnp.conj(x) / rs, 1)
    g01 = jnp.where(ok, jnp.conj(z) / rs, 0)
    return jnp.array([[g00, g01], [-jnp.conj(g01), jnp.conj(g00)]])


def _rot_rows(H, j, G):
    two = jax.lax.dynamic_slice_in_dim(H, j, 2, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(
        H, jnp.matmul(G, two, precision=_HIGH), j, axis=0)


def _rot_cols(H, j, G):
    two = jax.lax.dynamic_slice_in_dim(H, j, 2, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        H, jnp.matmul(two, jnp.conj(G.T), precision=_HIGH), j, axis=1)


def _schur_one(H, Q, max_sweeps):
    """Complex Schur form of an upper-Hessenberg H: single-Wilkinson-shift
    implicit QR with masked deflation windows (the QR-iteration phase of the
    reference's Eigendecomposition, in complex arithmetic)."""
    n = H.shape[-1]
    dt = H.dtype
    eps = jnp.finfo(dt).eps
    idx = jnp.arange(max(n - 1, 1))

    def subdiag_small(H):
        sub = jnp.abs(jnp.diagonal(H, -1))
        d = jnp.abs(jnp.diagonal(H))
        tol = eps * (d[:-1] + d[1:] + eps)
        return sub <= tol

    def cond(state):
        H, Q, k, it = state
        return (k > 0) & (it < max_sweeps)

    def deflate(H, Q, k):
        # zero the negligible subdiagonal H[k, k-1] and shrink the window
        mask = 1 - (jnp.outer(jnp.arange(n) == k,
                              jnp.arange(n) == k - 1)).astype(dt)
        return H * mask, Q, k - 1

    def sweep(H, Q, k):
        small = subdiag_small(H)
        # active window start: one past the last negligible subdiag below k
        lcand = jnp.where((idx < k) & small, idx + 1, 0)
        l = jnp.max(lcand) if n > 1 else 0
        # Wilkinson shift from the trailing 2x2 of the active window
        a = H[k - 1, k - 1] if n > 1 else H[0, 0]
        b = jnp.take(H[k - 1] if n > 1 else H[0], k, mode="clip")
        c = jnp.take(H[k], k - 1, mode="clip")
        d = H[k, k]
        tr2 = (a + d) / 2
        disc = jnp.sqrt(tr2 * tr2 - (a * d - b * c))
        mu1, mu2 = tr2 + disc, tr2 - disc
        mu = jnp.where(jnp.abs(mu1 - d) < jnp.abs(mu2 - d), mu1, mu2)

        def chase(j, HQ):
            H, Q = HQ
            active = (j >= l) & (j < k)
            # j==l starts the bulge from (H[l,l]-mu, H[l+1,l]); j>l chases it
            xs = jnp.where(j == l, H[j, j] - mu,
                           jnp.take(H[j], j - 1, mode="clip"))
            zs = jnp.where(j == l, H[j + 1, j],
                           jnp.take(H[j + 1], j - 1, mode="clip"))
            G = jnp.where(active, _givens(xs, zs), jnp.eye(2, dtype=dt))
            H = _rot_rows(H, j, G)
            H = _rot_cols(H, j, G)
            Q = _rot_cols(Q, j, G)
            return H, Q

        H, Q = jax.lax.fori_loop(0, n - 1, chase, (H, Q))
        return H, Q, k

    def body(state):
        H, Q, k, it = state
        sub_k = jnp.abs(jnp.take(H[k], k - 1, mode="clip"))
        tol_k = eps * (jnp.abs(H[k - 1, k - 1] if n > 1 else H[0, 0])
                       + jnp.abs(H[k, k]) + eps)
        H, Q, k = jax.lax.cond(sub_k <= tol_k, deflate, sweep, H, Q, k)
        return H, Q, k, it + 1

    if n == 1:
        return H, Q
    H, Q, _, _ = jax.lax.while_loop(
        cond, body, (H, Q, jnp.int32(n - 1), jnp.int32(0)))
    # clean: exact upper triangular
    return jnp.triu(H), Q


def _eigvec_right_one(T):
    """Right eigenvectors of upper-triangular T (unit column i pivots),
    analog of RightEigenvectorFromSchur_Serial_Internal."""
    n = T.shape[-1]
    dt = T.dtype
    eps = jnp.finfo(dt).eps
    tnorm = jnp.maximum(jnp.max(jnp.abs(T)), eps)
    rows = jnp.arange(n)
    eye = jnp.eye(n, dtype=dt)

    def one(i):
        lam = T[i, i]
        U = T - lam * eye
        # guard singular diagonals (repeated eigenvalues): LAPACK-style bump
        dg = jnp.diagonal(U)
        mag = jnp.abs(dg)
        dg = jnp.where(mag < eps * tnorm,
                       jnp.where(mag > 0, dg / jnp.where(mag > 0, mag, 1), 1)
                       * (eps * tnorm), dg)
        U = U - jnp.diag(jnp.diagonal(U)) + jnp.diag(dg)
        # rows >= i become identity rows → y_i = 1, y_{>i} = 0
        below = (rows >= i)[:, None]
        M = jnp.where(below, eye, U)
        rhs = (rows == i).astype(dt)
        y = jax.scipy.linalg.solve_triangular(M, rhs, lower=False)
        return y / jnp.maximum(jnp.sqrt(jnp.sum(jnp.abs(y) ** 2)), eps)

    return jax.vmap(one, out_axes=1)(rows)  # columns are eigenvectors


def _eigvec_left_one(T):
    """Left eigenvectors: zᴴT = λzᴴ ⇔ (Tᴴ − λ̄I)z = 0, forward substitution
    (analog of LeftEigenvectorFromSchur_Serial_Internal)."""
    n = T.shape[-1]
    dt = T.dtype
    eps = jnp.finfo(dt).eps
    Th = jnp.conj(T.T)
    tnorm = jnp.maximum(jnp.max(jnp.abs(T)), eps)
    rows = jnp.arange(n)
    eye = jnp.eye(n, dtype=dt)

    def one(i):
        lam = jnp.conj(T[i, i])
        L = Th - lam * eye
        dg = jnp.diagonal(L)
        mag = jnp.abs(dg)
        dg = jnp.where(mag < eps * tnorm,
                       jnp.where(mag > 0, dg / jnp.where(mag > 0, mag, 1), 1)
                       * (eps * tnorm), dg)
        L = L - jnp.diag(jnp.diagonal(L)) + jnp.diag(dg)
        above = (rows <= i)[:, None]
        M = jnp.where(above, eye, L)
        rhs = (rows == i).astype(dt)
        z = jax.scipy.linalg.solve_triangular(M, rhs, lower=True)
        return z / jnp.maximum(jnp.sqrt(jnp.sum(jnp.abs(z) ** 2)), eps)

    return jax.vmap(one, out_axes=1)(rows)


def _as_batch(A):
    A = jnp.asarray(A)
    if A.ndim == 2:
        return A[None], True
    return A, False


@annotate("batched.hessenberg")
def hessenberg(A):
    """Batched (H, Q) with Qᴴ A Q = H upper Hessenberg."""
    Ab, single = _as_batch(A)
    H, Q = jax.vmap(_hessenberg_one)(Ab)
    return (H[0], Q[0]) if single else (H, Q)


@annotate("batched.schur")
def schur(A, max_sweeps: int | None = None):
    """Batched complex Schur decomposition A = Z T Zᴴ (T upper triangular).
    Accepts real or complex input; returns complex (T, Z)."""
    Ab, single = _as_batch(A)
    cdt = _complex_dtype(Ab.dtype) if not jnp.iscomplexobj(Ab) else Ab.dtype
    Ab = Ab.astype(cdt)
    n = Ab.shape[-1]
    ms = max_sweeps if max_sweeps is not None else max(40 * n, 80)

    def one(A1):
        H, Q = _hessenberg_one(A1)
        return _schur_one(H, Q, ms)

    T, Z = jax.vmap(one)(Ab)
    return (T[0], Z[0]) if single else (T, Z)


@annotate("batched.eigenvalues")
def eigenvalues(A, max_sweeps: int | None = None):
    """Batched eigenvalues only (the reference's Eigenvalue interface)."""
    T, _ = schur(A, max_sweeps)
    return jnp.diagonal(T, axis1=-2, axis2=-1)


@annotate("batched.eig")
def eig(A, left: bool = True, right: bool = True,
        max_sweeps: int | None = None):
    """Batched general eigendecomposition: (w, VL, VR) complex with
    VRᴴ·A·VR diag-dominant, VLᴴ·A = w·VLᴴ per column.  None is returned for
    a side that is not requested (the reference's zero-span-view convention,
    Eigendecomposition_Decl.hpp)."""
    T, Z = schur(A, max_sweeps)
    Tb, single = _as_batch(T)
    Zb, _ = _as_batch(Z)
    w = jnp.diagonal(Tb, axis1=-2, axis2=-1)
    VL = VR = None
    if right:
        Y = jax.vmap(_eigvec_right_one)(Tb)
        VR = jnp.matmul(Zb, Y, precision=_HIGH)
        VR = VR / jnp.linalg.norm(VR, axis=-2, keepdims=True)
    if left:
        W = jax.vmap(_eigvec_left_one)(Tb)
        VL = jnp.matmul(Zb, W, precision=_HIGH)
        VL = VL / jnp.linalg.norm(VL, axis=-2, keepdims=True)
    if single:
        w = w[0]
        VL = VL[0] if VL is not None else None
        VR = VR[0] if VR is not None else None
    return w, VL, VR


@annotate("batched.eigendecomposition")
def eigendecomposition(A, max_sweeps: int | None = None):
    """Reference-convention outputs (er, ei, UL, UR) for REAL batched A
    (Eigendecomposition_Decl.hpp: er(m)+ei(m)i with a conjugate pair stored
    a+bi, a−bi consecutively; UL/UR complex eigenvector columns in the same
    order)."""
    w, VL, VR = eig(A)
    wb = w if w.ndim == 2 else w[None]
    # conjugate pairs adjacent: stable sort by (re, −|im|, sign(im)≤0)
    re, im = jnp.real(wb), jnp.imag(wb)
    order = jnp.lexsort((im < 0, -jnp.abs(im), re), axis=-1)
    ws0 = jnp.take_along_axis(wb, order, axis=-1)
    # numerical asymmetry in a computed pair's re can flip (a+bi, a-bi)
    # through the sort (re is the primary key): a vectorized swap pass
    # restores the +b-first convention wherever an adjacent conjugate pair
    # arrived negative-first
    re_s, im_s = jnp.real(ws0), jnp.imag(ws0)
    scale = jnp.max(jnp.abs(ws0), axis=-1, keepdims=True) + 1e-30
    tol = 1e-7 * scale
    nxt_im = jnp.concatenate([im_s[..., 1:], jnp.zeros_like(im_s[..., :1])],
                             axis=-1)
    nxt_re = jnp.concatenate([re_s[..., 1:], re_s[..., :1]], axis=-1)
    flip = ((im_s < 0) & (nxt_im > 0)
            & (jnp.abs(im_s + nxt_im) <= tol)
            & (jnp.abs(re_s - nxt_re) <= tol))
    prev = jnp.concatenate([jnp.zeros_like(flip[..., :1]), flip[..., :-1]],
                           axis=-1)
    flip = flip & ~prev
    prev = jnp.concatenate([jnp.zeros_like(flip[..., :1]), flip[..., :-1]],
                           axis=-1)
    shift = flip.astype(order.dtype) - prev.astype(order.dtype)
    idx = jnp.arange(ws0.shape[-1], dtype=order.dtype) + shift
    order = jnp.take_along_axis(order, idx, axis=-1)
    take = lambda X: jnp.take_along_axis(X, order[..., None, :], axis=-1)
    ws = jnp.take_along_axis(wb, order, axis=-1)
    ULs = take(VL if VL.ndim == 3 else VL[None])
    URs = take(VR if VR.ndim == 3 else VR[None])
    if w.ndim == 1:
        ws, ULs, URs = ws[0], ULs[0], URs[0]
    return jnp.real(ws), jnp.imag(ws), ULs, URs
