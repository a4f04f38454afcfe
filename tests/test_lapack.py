import numpy as np

from tpukk import lapack

from conftest import tol_for


def _close(a, b, dtype, scale=2000):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol_for(dtype, scale),
                               atol=tol_for(dtype, scale) * 10)


def test_gesv(rng, scalar):
    n = 20
    A = rng.standard_normal((n, n)).astype(scalar) + n * np.eye(n, dtype=scalar)
    b = rng.standard_normal(n).astype(scalar)
    _close(lapack.gesv(A, b), np.linalg.solve(A, b), scalar)


def test_svd(rng, scalar):
    A = rng.standard_normal((15, 10)).astype(scalar)
    U, s, Vt = lapack.svd(A)
    _close(np.asarray(U) @ np.diag(np.asarray(s)) @ np.asarray(Vt), A, scalar, 5000)


def test_trtri(rng, scalar):
    n = 12
    A = rng.standard_normal((n, n)).astype(scalar) + n * np.eye(n, dtype=scalar)
    Li = np.asarray(lapack.trtri(A, "L"))
    _close(Li @ np.tril(A), np.eye(n), scalar)
    Ui = np.asarray(lapack.trtri(A, "U"))
    _close(Ui @ np.triu(A), np.eye(n), scalar)


def test_getrf_getrs_qr_chol(rng, scalar):
    n = 10
    A = rng.standard_normal((n, n)).astype(scalar) + n * np.eye(n, dtype=scalar)
    lu, piv, _ = lapack.getrf(A)
    b = rng.standard_normal(n).astype(scalar)
    _close(lapack.getrs(lu, piv, b), np.linalg.solve(A, b), scalar)
    Q, R = lapack.geqrf(A)
    _close(np.asarray(Q) @ np.asarray(R), A, scalar)
    S = A @ A.T + n * np.eye(n, dtype=scalar)
    L = np.asarray(lapack.cholesky(S))
    _close(L @ L.T, S, scalar, 5000)
