"""Batched sparse kernels — analog of batched/sparse/src/ (CrsMatrix with
batched values + shared graph, Spmv, CG, GMRES, JacobiPrec, Identity,
Krylov handle; SURVEY.md §2.6).  Many small systems with one sparsity
pattern, solved concurrently — on TPU this is `vmap` over the values/vector
batch axis of the shared-plan SpMV.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..containers import CsrMatrix
from ..sparse.spmv_impl import build_segsum_plan
from ..common.tracing import annotate

__all__ = ["BatchedCrsMatrix", "batched_spmv", "JacobiPrec", "IdentityPrec",
           "batched_cg", "batched_gmres"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BatchedCrsMatrix:
    """Shared graph, per-batch values (B, nnz) —
    cf. batched/sparse/src/KokkosBatched_CrsMatrix.hpp."""

    row_map: Any
    entries: Any
    values: Any     # (B, nnz)
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.row_map, self.entries, self.values), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, A: CsrMatrix, batched_values):
        return cls(A.row_map, A.entries, jnp.asarray(batched_values), A.nrows, A.ncols)

    @property
    def n_batch(self):
        return self.values.shape[0]

    def _rows(self):
        import numpy as np

        rm = np.asarray(self.row_map)
        return jnp.asarray(np.repeat(np.arange(self.nrows, dtype=np.int32), rm[1:] - rm[:-1]))


@annotate("batched.batched_spmv")
def batched_spmv(A: BatchedCrsMatrix, X, rows=None):
    """Y[b] = A[b] · X[b] for X of shape (B, n) —
    cf. KokkosBatched_Spmv_*_Impl.hpp."""
    if rows is None:
        rows = A._rows()

    def one(vals, x):
        prod = vals * jnp.take(x, A.entries, axis=0)
        return jax.ops.segment_sum(prod, rows, num_segments=A.nrows,
                                   indices_are_sorted=True)

    return jax.vmap(one)(A.values, X)


class IdentityPrec:
    """cf. batched/sparse/src/KokkosBatched_Identity.hpp."""

    def apply(self, X):
        return X


class JacobiPrec:
    """Diagonal preconditioner — cf. KokkosBatched_JacobiPrec.hpp."""

    def __init__(self, A: BatchedCrsMatrix):
        import numpy as np

        rm = np.asarray(A.row_map)
        ent = np.asarray(A.entries)
        # locate diagonal positions host-side (symbolic)
        diag_pos = np.full(A.nrows, -1, np.int64)
        for r in range(A.nrows):
            seg = ent[rm[r]:rm[r + 1]]
            hit = np.nonzero(seg == r)[0]
            if hit.size:
                diag_pos[r] = rm[r] + hit[0]
        self.diag = jnp.where(
            jnp.asarray(diag_pos) >= 0,
            A.values[:, jnp.maximum(jnp.asarray(diag_pos), 0)],
            1.0,
        )

    def apply(self, X):
        return X / self.diag


@annotate("batched.batched_cg")
def batched_cg(A: BatchedCrsMatrix, B, max_iters: int = 100, tol: float = 1e-8,
               prec=None, X0=None):
    """Batched CG — cf. KokkosBatched_CG_*_Impl.hpp.  Returns (X, iters,
    final residual norms).  Fixed trip count with masked updates (TPU-friendly
    convergence: converged systems freeze)."""
    rows = A._rows()
    prec = prec or IdentityPrec()
    X = jnp.zeros_like(B) if X0 is None else X0
    R = B - batched_spmv(A, X, rows)
    Z = prec.apply(R)
    P = Z
    rz = jnp.sum(R * Z, axis=-1)
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=-1))
    tol_abs = tol * jnp.maximum(bnorm, 1.0)

    def body(carry, _):
        X, R, P, rz = carry
        AP = batched_spmv(A, P, rows)
        pAp = jnp.sum(P * AP, axis=-1)
        active = jnp.sqrt(jnp.sum(R * R, axis=-1)) > tol_abs
        alpha = jnp.where(active & (pAp != 0), rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        X = X + alpha[:, None] * P
        R = R - alpha[:, None] * AP
        Z = prec.apply(R)
        rz_new = jnp.sum(R * Z, axis=-1)
        beta = jnp.where(active & (rz != 0), rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        P = Z + beta[:, None] * P
        return (X, R, P, rz_new), None

    (X, R, _, _), _ = jax.lax.scan(body, (X, R, P, rz), None, length=max_iters)
    res = jnp.sqrt(jnp.sum(R * R, axis=-1))
    return X, max_iters, res


@annotate("batched.batched_gmres")
def batched_gmres(A: BatchedCrsMatrix, B, restart: int = 30, max_restarts: int = 5,
                  tol: float = 1e-8, prec=None, X0=None):
    """Batched restarted GMRES(m) with MGS orthogonalization —
    cf. KokkosBatched_GMRES_*_Impl.hpp.  Static m, masked convergence."""
    rows = A._rows()
    prec = prec or IdentityPrec()
    nb, n = B.shape
    m = min(restart, n)

    def one_cycle(X):
        R = prec.apply(B - batched_spmv(A, X, rows))
        beta = jnp.sqrt(jnp.sum(R * R, axis=-1))
        V = jnp.zeros((nb, m + 1, n), B.dtype)
        V = V.at[:, 0].set(R / jnp.where(beta == 0, 1.0, beta)[:, None])
        H = jnp.zeros((nb, m + 1, m), B.dtype)

        def arnoldi(j, carry):
            V, H = carry
            W = prec.apply(batched_spmv(A, V[:, j], rows))
            # modified Gram-Schmidt over previous basis vectors (masked)
            def mgs(i, wh):
                W, H = wh
                h = jnp.sum(W * V[:, i], axis=-1)
                h = jnp.where(i <= j, h, 0.0)
                W = W - h[:, None] * V[:, i]
                H = H.at[:, i, j].set(h)
                return (W, H)

            W, H = jax.lax.fori_loop(0, m + 1, lambda i, wh: jax.lax.cond(
                i <= j, lambda: mgs(i, wh), lambda: wh), (W, H))
            hn = jnp.sqrt(jnp.sum(W * W, axis=-1))
            H = H.at[:, j + 1, j].set(hn)
            V = V.at[:, j + 1].set(W / jnp.where(hn == 0, 1.0, hn)[:, None])
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
        # solve the (m+1, m) least squares per batch via batched QR
        e1 = jnp.zeros((nb, m + 1), B.dtype).at[:, 0].set(beta)
        Q, Rm = jnp.linalg.qr(H, mode="reduced")          # (nb,m+1,m),(nb,m,m)
        rhs = jnp.einsum("bij,bi->bj", Q, e1,
                         precision=jax.lax.Precision.HIGHEST)[..., None]
        y = jax.lax.linalg.triangular_solve(Rm, rhs, left_side=True, lower=False)
        dX = jnp.einsum("bmn,bm->bn", V[:, :m], y[..., 0],
                        precision=jax.lax.Precision.HIGHEST)
        return X + dX

    X = jnp.zeros_like(B) if X0 is None else X0
    for _ in range(max_restarts):
        X = one_cycle(X)
    R = B - batched_spmv(A, X, rows)
    res = jnp.sqrt(jnp.sum(R * R, axis=-1))
    return X, res
