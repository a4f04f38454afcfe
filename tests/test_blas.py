"""BLAS 1/2/3 oracle tests — vanilla numpy references, the analog of
test_common/KokkosKernels_TestVanilla.hpp (vanillaGEMM et al.)."""
import numpy as np
import pytest

from tpukk import blas

from conftest import tol_for


@pytest.fixture
def vecs(rng, scalar):
    x = rng.standard_normal(257).astype(scalar)
    y = rng.standard_normal(257).astype(scalar)
    z = rng.standard_normal(257).astype(scalar)
    return x, y, z


def _close(a, b, dtype, scale=20):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol_for(dtype, scale), atol=tol_for(dtype, scale))


class TestBlas1:
    def test_abs(self, vecs, scalar):
        x, _, _ = vecs
        _close(blas.blas1.abs(x), np.abs(x), scalar)

    def test_axpby(self, vecs, scalar):
        x, y, _ = vecs
        _close(blas.axpby(2.0, x, -0.5, y), 2 * x - 0.5 * y, scalar)

    def test_axpy(self, vecs, scalar):
        x, y, _ = vecs
        _close(blas.axpy(3.0, x, y), 3 * x + y, scalar)

    def test_dot(self, vecs, scalar):
        x, y, _ = vecs
        _close(blas.dot(x, y), np.dot(x, y), scalar, 300)

    def test_dot_mv(self, rng, scalar):
        X = rng.standard_normal((64, 3)).astype(scalar)
        Y = rng.standard_normal((64, 3)).astype(scalar)
        _close(blas.dot(X, Y), (X * Y).sum(0), scalar, 100)

    def test_fill(self, vecs, scalar):
        x, _, _ = vecs
        assert np.all(np.asarray(blas.fill(x, 3.0)) == np.array(3.0, scalar))

    def test_iamax(self, vecs, scalar):
        x, _, _ = vecs
        assert int(blas.iamax(x)) == int(np.argmax(np.abs(x)))

    def test_mult(self, vecs, scalar):
        x, y, z = vecs
        _close(blas.mult(0.5, z, 2.0, x, y), 0.5 * z + 2.0 * x * y, scalar)

    def test_norms(self, vecs, scalar):
        x, _, _ = vecs
        _close(blas.nrm1(x), np.abs(x).sum(), scalar, 300)
        _close(blas.nrm2(x), np.linalg.norm(x), scalar, 100)
        _close(blas.nrm2_squared(x), np.linalg.norm(x) ** 2, scalar, 300)
        _close(blas.nrminf(x), np.abs(x).max(), scalar)

    def test_nrm2w(self, vecs, scalar):
        x, y, _ = vecs
        w = np.abs(y) + 1.0
        _close(blas.nrm2w(x, w), np.linalg.norm(x / w), scalar, 100)

    def test_reciprocal_scal_update(self, vecs, scalar):
        x, y, z = vecs
        _close(blas.reciprocal(x), 1.0 / x, scalar)
        _close(blas.scal(2.0, x), 2 * x, scalar)
        _close(blas.update(1.0, x, 2.0, y, 3.0, z), x + 2 * y + 3 * z, scalar)

    def test_sum_swap(self, vecs, scalar):
        x, y, _ = vecs
        _close(blas.blas1.sum(x), x.sum(), scalar, 300)
        a, b = blas.swap(x, y)
        _close(a, y, scalar)
        _close(b, x, scalar)

    def test_mv_coefficients(self, rng, scalar):
        X = rng.standard_normal((32, 4)).astype(scalar)
        Y = rng.standard_normal((32, 4)).astype(scalar)
        a = np.arange(1, 5, dtype=scalar)
        b = np.arange(4, 0, -1).astype(scalar)
        _close(blas.axpby(a, X, b, Y), X * a[None] + Y * b[None], scalar)

    def test_rot(self, vecs, scalar):
        x, y, _ = vecs
        c, s = np.array(0.8, scalar), np.array(0.6, scalar)
        xr, yr = blas.rot(x, y, c, s)
        _close(xr, c * x + s * y, scalar)
        _close(yr, c * y - s * x, scalar)

    def test_rotg(self, scalar):
        r, z, c, s = blas.rotg(np.array(3.0, scalar), np.array(4.0, scalar))
        _close(r, 5.0, scalar)
        _close(c, 0.6, scalar)
        _close(s, 0.8, scalar)
        # rotation really zeroes b
        _close(c * 3.0 + s * 4.0, float(np.asarray(r)), scalar)
        _close(c * 4.0 - s * 3.0, 0.0, scalar)

    def test_rotm_apply(self, scalar):
        # flag=-2 (identity)
        x = np.array([1.0, 2.0], scalar)
        y = np.array([3.0, 4.0], scalar)
        param = np.array([-2.0, 0, 0, 0, 0], scalar)
        xr, yr = blas.rotm(x, y, param)
        _close(xr, x, scalar)
        _close(yr, y, scalar)

    def test_rotmg_zeroes_y(self, scalar):
        if scalar == np.float32:
            pytest.skip("f64-only oracle")
        d1, d2, x1, y1 = 2.0, 3.0, 1.5, 0.7
        nd1, nd2, nx1, param = blas.rotmg(d1, d2, x1, y1)
        # applying the returned H to (x1, y1) must zero the second component
        xr, yr = blas.rotm(np.array(x1), np.array(y1), np.asarray(param))
        assert abs(float(np.asarray(yr))) < 1e-12


class TestBlas2:
    def test_gemv_modes(self, rng, scalar):
        A = rng.standard_normal((40, 30)).astype(scalar)
        x = rng.standard_normal(30).astype(scalar)
        y = rng.standard_normal(40).astype(scalar)
        _close(blas.gemv("N", 2.0, A, x, 0.5, y), 0.5 * y + 2 * A @ x, scalar, 200)
        xt = rng.standard_normal(40).astype(scalar)
        yt = rng.standard_normal(30).astype(scalar)
        _close(blas.gemv("T", 1.0, A, xt, 0.0, yt), A.T @ xt, scalar, 200)

    def test_ger(self, rng, scalar):
        A = rng.standard_normal((20, 25)).astype(scalar)
        x = rng.standard_normal(20).astype(scalar)
        y = rng.standard_normal(25).astype(scalar)
        _close(blas.ger(1.5, x, y, A), A + 1.5 * np.outer(x, y), scalar, 100)

    def test_syr_syr2(self, rng, scalar):
        n = 16
        A = np.triu(rng.standard_normal((n, n))).astype(scalar)
        x = rng.standard_normal(n).astype(scalar)
        y = rng.standard_normal(n).astype(scalar)
        out = np.asarray(blas.syr("U", 2.0, x, A))
        ref = A + np.triu(2.0 * np.outer(x, x))
        _close(out, ref, scalar, 100)
        out2 = np.asarray(blas.syr2("L", 1.0, x, y, A))
        ref2 = A + np.tril(np.outer(x, y) + np.outer(y, x))
        _close(out2, ref2, scalar, 100)


class TestBlas3:
    def test_gemm_modes(self, rng, scalar):
        A = rng.standard_normal((33, 17)).astype(scalar)
        B = rng.standard_normal((17, 29)).astype(scalar)
        C = rng.standard_normal((33, 29)).astype(scalar)
        _close(blas.gemm("N", "N", 1.0, A, B, 0.0, C), A @ B, scalar, 300)
        _close(blas.gemm("T", "T", 2.0, B, A, 1.0, C.T.copy()), C.T + 2 * (B.T @ A.T), scalar, 300)

    def test_gemm_single_column(self, rng, scalar):
        # the gemv fallback shape (KokkosBlas3_gemm.hpp:162-163)
        A = rng.standard_normal((16, 8)).astype(scalar)
        B = rng.standard_normal((8, 1)).astype(scalar)
        C = np.zeros((16, 1), scalar)
        _close(blas.gemm("N", "N", 1.0, A, B, 0.0, C), A @ B, scalar, 100)

    def test_trmm(self, rng, scalar):
        n = 12
        A = rng.standard_normal((n, n)).astype(scalar)
        B = rng.standard_normal((n, 7)).astype(scalar)
        _close(blas.trmm("L", "L", "N", "N", 1.0, A, B), np.tril(A) @ B, scalar, 200)
        _close(blas.trmm("R", "U", "T", "N", 2.0, A, B.T.copy()), 2 * B.T @ np.triu(A).T, scalar, 200)
        # unit diagonal
        ref = (np.tril(A, -1) + np.eye(n)) @ B
        _close(blas.trmm("L", "L", "N", "U", 1.0, A, B), ref, scalar, 200)

    def test_trsm(self, rng, scalar):
        n = 12
        A = (rng.standard_normal((n, n)) + n * np.eye(n)).astype(scalar)
        B = rng.standard_normal((n, 5)).astype(scalar)
        X = np.asarray(blas.trsm("L", "L", "N", "N", 1.0, A, B))
        _close(np.tril(A) @ X, B, scalar, 500)
        X2 = np.asarray(blas.trsm("R", "U", "N", "N", 2.0, A, B.T.copy()))
        _close(X2 @ np.triu(A), 2 * B.T, scalar, 500)


class TestRotmgRescaling:
    """Full drotmg gamma-threshold rescaling (reference LAPACK semantics).
    scipy.linalg.blas.drotmg returns only the 5-vector param; the d/x
    outputs are checked through the defining invariants instead: H zeroes
    the second component of (x1, y1), the weighted norm d1 a^2 + d2 b^2 is
    preserved for every vector, and the rescaled scale factors sit inside
    [1/GAM^2, GAM^2]."""

    @pytest.mark.parametrize("d1,d2,x1,y1", [
        (2.0, 3.0, 1.5, -0.5),          # ordinary flag path
        (1e-12, 2.0, 1.0, 1.0),         # small d1 -> rescale up
        (1e12, 1e-14, 3.0, 2.0),        # large d1 / tiny d2
        (4.0, 1e18, 1.0, 2.0),          # huge d2 -> rescale down
        (1e-20, 1e-20, 7.0, 3.0),       # both tiny
    ])
    def test_matches_lapack(self, d1, d2, x1, y1):
        from scipy.linalg import blas as sblas
        from tpukk.blas import rotmg

        rparam = np.asarray(sblas.drotmg(d1, d2, x1, y1), np.float64).ravel()
        nd1, nd2, nx1, param = rotmg(np.float64(d1), np.float64(d2),
                                     np.float64(x1), np.float64(y1))
        nd1, nd2, nx1 = float(nd1), float(nd2), float(nx1)
        p = np.asarray(param, np.float64)
        assert p[0] == rparam[0]

        def full(par):
            fl, h11, h21, h12, h22 = par
            if fl == -2.0:
                return np.eye(2)
            if fl == 0.0:
                return np.array([[1.0, h12], [h21, 1.0]])
            if fl == 1.0:
                return np.array([[h11, 1.0], [-1.0, h22]])
            return np.array([[h11, h12], [h21, h22]])

        H = full(p)
        np.testing.assert_allclose(H, full(rparam), rtol=1e-6, atol=1e-300)
        # defining contract: H zeroes y, x1' is the rotated first component
        out = H @ np.array([x1, y1])
        assert abs(out[1]) <= 1e-10 * max(1.0, abs(out[0]))
        np.testing.assert_allclose(out[0], nx1, rtol=1e-10)
        # weighted norm preserved for arbitrary vectors
        rng = np.random.default_rng(3)
        for _ in range(3):
            v = rng.standard_normal(2)
            w = H @ v
            lhs = d1 * v[0] ** 2 + d2 * v[1] ** 2
            rhs = nd1 * w[0] ** 2 + nd2 * w[1] ** 2
            np.testing.assert_allclose(rhs, lhs, rtol=1e-8)
        # gamma rescaling engaged: scale factors inside the window
        gamsq = 4096.0 ** 2
        for d in (nd1, nd2):
            if d != 0:
                assert 1.0 / gamsq <= abs(d) <= gamsq
