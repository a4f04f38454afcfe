"""Batched dense/sparse oracle tests — analog of batched/dense/unit_test/
(106 files) condensed to the numpy-oracle pattern."""
import numpy as np
import pytest

from tpukk.batched import dense as bd
from tpukk.batched import (
    BatchedCrsMatrix,
    JacobiPrec,
    batched_cg,
    batched_gmres,
    batched_spmv,
)
from tpukk.containers import generate_diag_dominant_csr

from conftest import tol_for


@pytest.fixture
def batch(rng, scalar):
    B, n = 6, 12
    A = rng.standard_normal((B, n, n)).astype(scalar) + 5 * np.eye(n, dtype=scalar)
    x = rng.standard_normal((B, n)).astype(scalar)
    Y = rng.standard_normal((B, n, n)).astype(scalar)
    return A, x, Y


def _close(a, b, dtype, scale=100):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol_for(dtype, scale),
                               atol=tol_for(dtype, scale) * 10)


class TestBatchedDense:
    def test_gemm(self, batch, scalar):
        A, _, Y = batch
        _close(bd.gemm("N", "N", 1.0, A, Y, 0.0, Y), A @ Y, scalar, 300)
        _close(bd.gemm("T", "N", 2.0, A, Y, 1.0, Y),
               Y + 2 * np.swapaxes(A, 1, 2) @ Y, scalar, 300)

    def test_gemv_ger_dot(self, batch, scalar):
        A, x, _ = batch
        y = np.zeros_like(x)
        _close(bd.gemv("N", 1.0, A, x, 0.0, y), np.einsum("bij,bj->bi", A, x), scalar, 300)
        _close(bd.ger(1.5, x, x, A), A + 1.5 * np.einsum("bi,bj->bij", x, x), scalar)
        _close(bd.dot(x, x), (x * x).sum(-1), scalar, 300)

    def test_vector_ops(self, batch, scalar):
        _, x, _ = batch
        y = x[::-1].copy().reshape(x.shape)
        _close(bd.axpy(2.0, x, y), y + 2 * x, scalar)
        _close(bd.xpay(3.0, x, y), x + 3 * y, scalar)
        _close(bd.hadamard(2.0, x, y), 2 * x * y, scalar)
        _close(bd.scale(0.5, x), 0.5 * x, scalar)
        assert np.all(np.asarray(bd.iamax(x)) == np.argmax(np.abs(x), -1))

    def test_add_radial_set_identity(self, batch, scalar):
        A, _, _ = batch
        out = np.asarray(bd.add_radial(0.1, A))
        d = np.diagonal(A, axis1=1, axis2=2)
        expect = d + 0.1 * np.where(d >= 0, 1, -1)
        _close(np.diagonal(out, axis1=1, axis2=2), expect, scalar)
        I = np.asarray(bd.set_identity(A))
        assert np.all(I == np.eye(A.shape[-1], dtype=scalar))

    def test_lu_solve_roundtrip(self, batch, scalar):
        A, x, _ = batch
        LU = bd.lu(A)
        got = np.asarray(bd.solve_lu(LU, x))
        ref = np.linalg.solve(A, x[..., None])[..., 0]
        _close(got, ref, scalar, 5000)
        Ainv = np.asarray(bd.inverse_lu(LU))
        _close(Ainv @ A, np.broadcast_to(np.eye(A.shape[-1]), A.shape), scalar, 5000)

    def test_getrf_getrs(self, batch, scalar):
        A, x, _ = batch
        lu_, piv, _ = bd.getrf(A)
        got = np.asarray(bd.getrs(lu_, piv, x))
        ref = np.linalg.solve(A, x[..., None])[..., 0]
        _close(got, ref, scalar, 2000)

    def test_trsm_trmm_trtri(self, batch, scalar):
        A, x, _ = batch
        L = np.tril(A)
        got = np.asarray(bd.trsv("L", "N", "N", A, x))
        ref = np.stack([np.linalg.solve(L[b], x[b]) for b in range(len(A))])
        _close(got, ref, scalar, 2000)
        _close(bd.trmm("L", "L", "N", "N", 1.0, A, A), L @ A, scalar, 300)
        Li = np.asarray(bd.trtri("L", "N", A))
        _close(Li @ L, np.broadcast_to(np.eye(A.shape[-1]), A.shape), scalar, 2000)

    def test_qr_svd_eigh(self, batch, scalar):
        A, _, _ = batch
        Q, R = bd.qr(A)
        _close(np.asarray(Q) @ np.asarray(R), A, scalar, 2000)
        U, s, Vt = bd.svd(A)
        _close(np.asarray(U) * np.asarray(s)[:, None, :] @ np.asarray(Vt), A, scalar, 5000)
        S = A + np.swapaxes(A, 1, 2)
        w, V = bd.eigh(S)
        _close(np.asarray(V) @ (np.asarray(w)[..., None] * np.swapaxes(np.asarray(V), 1, 2)), S, scalar, 10000)

    def test_gesv(self, batch, scalar):
        A, x, _ = batch
        _close(bd.gesv(A, x), np.linalg.solve(A, x[..., None])[..., 0], scalar, 2000)

    def test_pttrf_pttrs(self, rng, scalar):
        B, n = 4, 20
        d = (rng.random((B, n)) + 2).astype(scalar)
        e = (rng.random((B, n - 1)) * 0.5).astype(scalar)
        dd, l = bd.pttrf(d, e)
        b = rng.standard_normal((B, n)).astype(scalar)
        x = np.asarray(bd.pttrs(dd, l, b))
        for bi in range(B):
            T = np.diag(d[bi]) + np.diag(e[bi], 1) + np.diag(e[bi], -1)
            _close(T @ x[bi], b[bi], scalar, 2000)

    def test_pbtrf_pbtrs(self, rng, scalar):
        B, n = 3, 10
        M = rng.standard_normal((B, n, n)).astype(scalar)
        A = M @ np.swapaxes(M, 1, 2) + n * np.eye(n, dtype=scalar)
        L = bd.pbtrf(A)
        b = rng.standard_normal((B, n)).astype(scalar)
        x = np.asarray(bd.pbtrs(L, b))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        _close(x, ref, scalar, 5000)

    def test_laswp(self, rng, scalar):
        B, n = 2, 5
        A = rng.standard_normal((B, n, n)).astype(scalar)
        lu_, piv, perm = bd.getrf(A)
        swapped = np.asarray(bd.laswp(piv, A))
        ref = np.take_along_axis(A, np.asarray(perm)[..., None], axis=1)
        _close(swapped, ref, scalar)


class TestBatchedSparse:
    def _problem(self, rng, B=5, n=30):
        A0 = generate_diag_dominant_csr(n, 4, dtype=np.float64, seed=1)
        base = np.asarray(A0.values)
        vals = np.stack([base * (1 + 0.1 * b) for b in range(B)])
        Ab = BatchedCrsMatrix.from_csr(A0, vals)
        X = rng.standard_normal((B, n))
        return A0, Ab, X

    def test_batched_spmv(self, rng):
        A0, Ab, X = self._problem(rng)
        Y = np.asarray(batched_spmv(Ab, X))
        for b in range(Ab.n_batch):
            sp = A0.to_scipy().copy()
            sp.data = np.asarray(Ab.values[b])
            _close(Y[b], sp @ X[b], np.float64, 100)

    def test_batched_cg(self, rng):
        A0, Ab, X = self._problem(rng)
        # make SPD: use A^T A per batch? diag-dominant unsymmetric CG is not
        # guaranteed; use symmetrized problem
        sp = A0.to_scipy()
        S = (sp + sp.T) * 0.5
        import scipy.sparse as sps

        S = sps.csr_matrix(S)
        S.sort_indices()
        from tpukk.containers import CsrMatrix

        A0s = CsrMatrix.from_scipy(S)
        vals = np.stack([np.asarray(A0s.values) * (1 + 0.1 * b) for b in range(5)])
        Abs_ = BatchedCrsMatrix.from_csr(A0s, vals)
        Brhs = rng.standard_normal((5, A0s.nrows))
        Xs, _, res = batched_cg(Abs_, Brhs, max_iters=200, tol=1e-10,
                                prec=JacobiPrec(Abs_))
        assert np.all(np.asarray(res) < 1e-8 * np.linalg.norm(Brhs, axis=-1).max())

    def test_batched_gmres(self, rng):
        A0, Ab, X = self._problem(rng)
        Brhs = rng.standard_normal((Ab.n_batch, A0.nrows))
        Xg, res = batched_gmres(Ab, Brhs, restart=30, max_restarts=3, tol=1e-10)
        assert np.all(np.asarray(res) < 1e-6 * np.linalg.norm(Brhs, axis=-1).max())
