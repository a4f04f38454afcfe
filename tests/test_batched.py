"""Batched dense/sparse oracle tests — analog of batched/dense/unit_test/
(106 files) condensed to the numpy-oracle pattern."""
import jax.numpy as jnp
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


def test_qr_with_column_pivoting(rng):
    """A[:,perm]=QR, orthonormal Q, non-increasing |diag R|
    (cf. KokkosBatched_QR_WithColumnPivoting_Decl.hpp)."""
    from tpukk.batched.dense import qr_with_column_pivoting

    A = rng.standard_normal((3, 8, 6)).astype(np.float32)
    Q, R, perm = qr_with_column_pivoting(A)
    for i in range(3):
        ap = A[i][:, np.asarray(perm[i])]
        assert np.abs(np.asarray(Q[i]) @ np.asarray(R[i]) - ap).max() < 1e-4
        assert np.abs(np.asarray(Q[i]).T @ np.asarray(Q[i]) - np.eye(6)).max() < 1e-5
        d = np.abs(np.diagonal(np.asarray(R[i])))
        assert np.all(np.diff(d) <= 1e-5)
    # wide case
    Aw = rng.standard_normal((2, 4, 7)).astype(np.float32)
    Qw, Rw, pw = qr_with_column_pivoting(Aw)
    for i in range(2):
        ap = Aw[i][:, np.asarray(pw[i])]
        assert np.abs(np.asarray(Qw[i]) @ np.asarray(Rw[i]) - ap).max() < 1e-4


def test_utv_solve_rank_deficient(rng):
    """UTV rank detection + min-norm LS solve on a rank-3 8x6 batch
    (cf. KokkosBatched_UTV_Decl.hpp / KokkosBatched_SolveUTV_Decl.hpp)."""
    from tpukk.batched.dense import solve_utv, utv

    B = (rng.standard_normal((2, 8, 3)) @ rng.standard_normal((2, 3, 6))).astype(np.float32)
    U, T, V, perm, rank = utv(B)
    assert np.all(np.asarray(rank) == 3)
    for i in range(2):
        bp = B[i][:, np.asarray(perm[i])]
        rec = np.asarray(U[i]) @ np.asarray(T[i]) @ np.asarray(V[i]).T
        assert np.abs(rec - bp).max() < 1e-4 * np.abs(B[i]).max()
    b = rng.standard_normal((2, 8)).astype(np.float32)
    x = solve_utv(U, T, V, perm, rank, b)
    for i in range(2):
        xr, *_ = np.linalg.lstsq(B[i], b[i], rcond=1e-5)
        # same residual as the rank-aware numpy solution
        r_mine = np.linalg.norm(B[i] @ np.asarray(x[i]) - b[i])
        r_ref = np.linalg.norm(B[i] @ xr - b[i])
        assert r_mine <= r_ref * (1 + 1e-4)
        # min-norm: not larger than the reference norm
        assert np.linalg.norm(np.asarray(x[i])) <= np.linalg.norm(xr) * (1 + 1e-4)
    # full-rank square sanity
    C = rng.standard_normal((1, 5, 5)).astype(np.float32) + 3 * np.eye(5, dtype=np.float32)
    U, T, V, perm, rank = utv(C)
    assert int(np.asarray(rank)[0]) == 5
    bc = rng.standard_normal((1, 5)).astype(np.float32)
    xc = solve_utv(U, T, V, perm, rank, bc)
    assert np.abs(C[0] @ np.asarray(xc[0]) - bc[0]).max() < 1e-3


class TestBandStorage:
    """Band-storage kernels (tpukk/batched/banded.py) vs scipy banded oracles
    (cf. KokkosBatched_{Pbtrf,Pbtrs,Gbtrf,Gbtrs,Tbsv}.hpp)."""

    def _spd_band(self, rng, n, kd):
        A = np.zeros((n, n))
        for i in range(n):
            for j in range(max(0, i - kd), min(n, i + kd + 1)):
                A[i, j] = rng.standard_normal() * 0.1
        A = A + A.T + np.eye(n) * (2 * kd + 2)
        Ab = np.zeros((kd + 1, n))
        for i in range(kd + 1):
            Ab[i, : n - i] = np.diag(A, -i)
        return A, Ab

    def test_pbtrf_pbtrs(self, rng):
        import scipy.linalg as sla

        from tpukk.batched import pbtrf_banded, pbtrs_banded

        n, kd = 23, 4
        A, Ab = self._spd_band(rng, n, kd)
        L = np.asarray(pbtrf_banded(jnp.asarray(Ab)))
        Lref = sla.cholesky_banded(Ab, lower=True)
        assert np.abs(L - Lref).max() < 1e-10
        b = rng.standard_normal(n)
        x = np.asarray(pbtrs_banded(jnp.asarray(L), jnp.asarray(b)))
        xr = sla.solveh_banded(Ab, b, lower=True)
        assert np.abs(x - xr).max() < 1e-10
        # batched axis
        AbB = jnp.asarray(np.stack([Ab, Ab * 1.5]))
        LB = np.asarray(pbtrf_banded(AbB))
        assert LB.shape == (2, kd + 1, n)
        assert np.abs(LB[0] - Lref).max() < 1e-10

    def test_gbtrf_gbtrs(self, rng):
        import scipy.linalg as sla

        from tpukk.batched import gbtrf_banded, gbtrs_banded

        n, kl, ku = 19, 2, 3
        G = np.zeros((n, n))
        for i in range(n):
            for j in range(max(0, i - kl), min(n, i + ku + 1)):
                G[i, j] = rng.standard_normal()
        G += np.eye(n) * (kl + ku + 3)   # diagonally dominant (no pivoting)
        Gb = np.zeros((kl + ku + 1, n))
        for idx, d in enumerate(range(ku, -kl - 1, -1)):
            dv = np.diag(G, d)
            if d >= 0:
                Gb[idx, d:d + len(dv)] = dv
            else:
                Gb[idx, : len(dv)] = dv
        Lb, Ub = gbtrf_banded(jnp.asarray(Gb), kl, ku)
        b = rng.standard_normal(n)
        y = np.asarray(gbtrs_banded(Lb, Ub, jnp.asarray(b)))
        yr = sla.solve_banded((kl, ku), Gb, b)
        assert np.abs(y - yr).max() < 1e-9
        # LU reconstruction
        Lm = np.eye(n)
        for i in range(1, kl + 1):
            Lm += np.diag(np.asarray(Lb)[i - 1, : n - i], -i)
        Um = np.zeros((n, n))
        for t in range(ku + 1):
            Um += np.diag(np.asarray(Ub)[t, : n - t], t)
        assert np.abs(Lm @ Um - G).max() < 1e-10

    def test_tbsv(self, rng):
        import scipy.linalg as sla

        from tpukk.batched import tbsv_banded

        n, kd = 23, 4
        A, _ = self._spd_band(rng, n, kd)
        b = rng.standard_normal(n)
        T = np.tril(A)
        Tb = np.zeros((kd + 1, n))
        for i in range(kd + 1):
            Tb[i, : n - i] = np.diag(T, -i)
        xt = np.asarray(tbsv_banded(jnp.asarray(Tb), jnp.asarray(b), lower=True))
        assert np.abs(sla.solve_triangular(T, b, lower=True) - xt).max() < 1e-10
        U2 = np.triu(A)
        Ub2 = np.zeros((kd + 1, n))
        for t in range(kd + 1):
            Ub2[t, : n - t] = np.diag(U2, t)
        xu = np.asarray(tbsv_banded(jnp.asarray(Ub2), jnp.asarray(b), lower=False))
        assert np.abs(sla.solve_triangular(U2, b, lower=False) - xu).max() < 1e-10


class TestGeneralEig:
    """General nonsymmetric eigendecomposition — oracle = numpy.linalg.eig
    (reference: KokkosBatched_Eigendecomposition, Hessenberg + QR to Schur,
    er/ei + left/right eigenvectors)."""

    @staticmethod
    def _match_multisets(got, ref, tol):
        # pair greedily by nearest distance (sort keys are unstable when real
        # parts agree to 1 ulp)
        ref = list(ref)
        for g in got:
            j = int(np.argmin([abs(g - r) for r in ref]))
            assert abs(g - ref[j]) < tol, (g, ref[j])
            ref.pop(j)

    @pytest.mark.parametrize("n", [1, 2, 3, 6, 12])
    def test_eig_random(self, rng, n):
        from tpukk.batched import eig

        A = rng.standard_normal((3, n, n))
        w, VL, VR = eig(jnp.asarray(A))
        w, VL, VR = np.asarray(w), np.asarray(VL), np.asarray(VR)
        for b in range(3):
            self._match_multisets(w[b], np.linalg.eigvals(A[b]),
                                  1e-8 * max(1, np.abs(A[b]).sum()))
            for i in range(n):
                assert np.linalg.norm(A[b] @ VR[b][:, i] - w[b, i] * VR[b][:, i]) < 1e-10 * n
                assert np.linalg.norm(np.conj(VL[b][:, i]) @ A[b] - w[b, i] * np.conj(VL[b][:, i])) < 1e-10 * n

    def test_schur_similarity(self, rng):
        from tpukk.batched import schur

        A = rng.standard_normal((2, 7, 7))
        T, Z = schur(jnp.asarray(A))
        T, Z = np.asarray(T), np.asarray(Z)
        for b in range(2):
            assert np.abs(np.tril(T[b], -1)).max() < 1e-12
            assert np.abs(Z[b] @ T[b] @ Z[b].conj().T - A[b]).max() < 1e-10
            assert np.abs(Z[b].conj().T @ Z[b] - np.eye(7)).max() < 1e-12

    def test_eig_complex_input(self, rng):
        from tpukk.batched import eigenvalues

        A = (rng.standard_normal((2, 5, 5)) + 1j * rng.standard_normal((2, 5, 5)))
        w = np.asarray(eigenvalues(jnp.asarray(A)))
        for b in range(2):
            self._match_multisets(w[b], np.linalg.eigvals(A[b]), 1e-9)

    def test_eigendecomposition_pairs_adjacent(self, rng):
        from tpukk.batched import eigendecomposition

        # real matrix with complex pairs: er/ei store a+bi, a-bi consecutively
        # (Eigendecomposition_Decl.hpp convention)
        A = rng.standard_normal((1, 6, 6))
        er, ei, UL, UR = eigendecomposition(jnp.asarray(A))
        er, ei = np.asarray(er)[0], np.asarray(ei)[0]
        i = 0
        while i < 6:
            if abs(ei[i]) > 1e-10:
                assert abs(er[i] - er[i + 1]) < 1e-8
                assert abs(ei[i] + ei[i + 1]) < 1e-8
                assert ei[i] > 0  # a+bi first
                i += 2
            else:
                i += 1

    def test_eig_f32(self, rng):
        from tpukk.batched import eig

        A = rng.standard_normal((2, 4, 4)).astype(np.float32)
        w, _, VR = eig(jnp.asarray(A))
        w, VR = np.asarray(w), np.asarray(VR)
        for b in range(2):
            for i in range(4):
                r = np.linalg.norm(A[b] @ VR[b][:, i] - w[b, i] * VR[b][:, i])
                assert r < 1e-4
