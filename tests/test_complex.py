"""Complex-scalar sweep — the reference ETI includes complex<float>/
complex<double> and its unit tests sweep them
(test_common/Test_Common_Test_All_Type_Combos.hpp); this file locks the
same capability for the TPU build (conjugation-correct dots, modes N/T/C,
solver convergence)."""
import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from tpukk import blas
from tpukk.containers import CsrMatrix


def _rand_complex_csr(rng, n, density=0.1, diag_boost=4.0, dtype=np.complex128):
    D = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    D = D * (rng.random((n, n)) < density)
    np.fill_diagonal(D, D.diagonal() + diag_boost)
    return sps.csr_matrix(D.astype(dtype)), D.astype(dtype)


@pytest.fixture
def cmat(rng):
    return _rand_complex_csr(rng, 50)


class TestComplexSparse:
    @pytest.mark.parametrize("mode", ["N", "T", "C", "H"])
    def test_spmv_modes(self, rng, cmat, mode):
        # reference mode taxonomy (KokkosSparse_spmv.hpp:126): C = conjugate
        # WITHOUT transpose, H = conjugate transpose
        from tpukk.sparse import spmv
        sp, D = cmat
        A = CsrMatrix.from_scipy(sp)
        x = jnp.asarray(rng.standard_normal(50) + 1j * rng.standard_normal(50))
        y = np.asarray(spmv(A, x, mode=mode))
        ref = {"N": D @ np.asarray(x), "T": D.T @ np.asarray(x),
               "C": D.conj() @ np.asarray(x),
               "H": D.conj().T @ np.asarray(x)}[mode]
        np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12)

    def test_spgemm_spadd(self, cmat):
        from tpukk.sparse import spadd, spgemm
        sp, D = cmat
        A = CsrMatrix.from_scipy(sp)
        C = spgemm(A, A)
        np.testing.assert_allclose(C.to_scipy().toarray(), D @ D,
                                   rtol=1e-12, atol=1e-12)
        S = spadd(1 + 2j, A, 3 - 1j, A)
        np.testing.assert_allclose(S.to_scipy().toarray(), (4 + 1j) * D,
                                   rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("supernodal", [False, True])
    def test_sptrsv(self, rng, cmat, supernodal):
        from tpukk.sparse import (SptrsvAlgorithm, SptrsvHandle, sptrsv_solve,
                                  sptrsv_symbolic)
        sp, D = cmat
        T = sps.csr_matrix(np.tril(D))
        M = CsrMatrix.from_scipy(T)
        algo = (SptrsvAlgorithm.SUPERNODAL if supernodal
                else SptrsvAlgorithm.SEQLVLSCHD)
        h = SptrsvHandle(True, algorithm=algo)
        sptrsv_symbolic(h, M)
        b = rng.standard_normal(50) + 1j * rng.standard_normal(50)
        x = np.asarray(sptrsv_solve(h, M, jnp.asarray(b)))
        np.testing.assert_allclose(T @ x, b, rtol=1e-10, atol=1e-10)

    def test_gmres(self, rng, cmat):
        from tpukk.sparse import GmresHandle, gmres
        sp, D = cmat
        A = CsrMatrix.from_scipy(sp)
        b = jnp.asarray(rng.standard_normal(50) + 1j * rng.standard_normal(50))
        h = GmresHandle(m=40, tol=1e-10, max_restarts=10)
        x, stats = gmres(h, A, b)
        assert stats.converged
        r = np.linalg.norm(sp @ np.asarray(x) - np.asarray(b))
        assert r / np.linalg.norm(np.asarray(b)) < 1e-9

    def test_pcg_hermitian(self, rng):
        from tpukk.sparse import pcg
        n = 40
        B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        H = B @ B.conj().T + n * np.eye(n)   # HPD
        A = CsrMatrix.from_scipy(sps.csr_matrix(H.astype(np.complex128)))
        b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
        x, stats = pcg(A, b, tol=1e-10, max_iters=200)
        assert stats.converged
        np.testing.assert_allclose(H @ np.asarray(x), np.asarray(b),
                                   rtol=1e-8, atol=1e-8)


class TestComplexBlas:
    def test_dot_conjugates(self, rng):
        x = jnp.asarray(rng.standard_normal(30) + 1j * rng.standard_normal(30))
        y = jnp.asarray(rng.standard_normal(30) + 1j * rng.standard_normal(30))
        np.testing.assert_allclose(np.asarray(blas.dot(x, y)),
                                   np.vdot(np.asarray(x), np.asarray(y)),
                                   rtol=1e-12)

    def test_nrm2_real(self, rng):
        x = jnp.asarray(rng.standard_normal(30) + 1j * rng.standard_normal(30))
        got = np.asarray(blas.nrm2(x))
        np.testing.assert_allclose(got, np.linalg.norm(np.asarray(x)), rtol=1e-12)
        assert not np.iscomplexobj(got) or abs(got.imag) == 0

    def test_gemm_conj_modes(self, rng):
        D = rng.standard_normal((20, 20)) + 1j * rng.standard_normal((20, 20))
        A = jnp.asarray(D)
        C0 = jnp.zeros((20, 20), jnp.complex128)
        got = np.asarray(blas.gemm("C", "N", 1.0, A, A, 0.0, C0))
        np.testing.assert_allclose(got, D.conj().T @ D, rtol=1e-12, atol=1e-12)


def test_complex64_pair_route_matches_xla(rng):
    """complex64 SpMV decomposed onto four real fast-kernel products (the
    pallas-platform route) == the XLA complex path."""
    import scipy.sparse as sps
    from tpukk.containers import CsrMatrix
    from tpukk.sparse.spmv import SpmvHandle

    n = 800
    sp = sps.random(n, n, 0.01, random_state=5, dtype=np.float64).tocsr()
    sp = (sp + sps.identity(n)).tocsr()
    sp.sort_indices()
    spc = sp.astype(np.complex64)
    spc.data = (spc.data
                + 1j * np.random.default_rng(1).standard_normal(spc.nnz)
                .astype(np.float32))
    A = CsrMatrix.from_scipy(spc)
    x = (np.random.default_rng(2).standard_normal(n)
         + 1j * np.random.default_rng(3).standard_normal(n)).astype(np.complex64)
    h_xla = SpmvHandle(A)
    y_xla = np.asarray(h_xla(x))
    h_pair = SpmvHandle(A)
    h_pair._force_complex_pair = True
    y_pair = np.asarray(h_pair(x))
    assert h_pair._cpair is not None
    ref = spc @ x
    tol = 60 * np.finfo(np.float32).eps * np.abs(ref).max()
    assert np.abs(y_pair - ref).max() < tol
    assert np.abs(y_xla - ref).max() < tol


def test_dtype_tier_policy():
    """Pinned dtype-tier decision (docs/API.md 'Value-dtype tiers'):
    complex128 and int-valued matrices are COMPATIBILITY tier — correct
    through the XLA routes, no Pallas plan engaged.  If a fast path is
    added later this test must be updated together with the docs."""
    import scipy.sparse as sps
    from tpukk.sparse import spmv
    from tpukk.sparse.spmv import SpmvHandle

    rng = np.random.default_rng(4)
    n = 60
    # complex128
    Ac = sps.random(n, n, 0.1, random_state=4, format="csr").astype(np.complex128)
    Ac.data += 1j * rng.standard_normal(len(Ac.data))
    M = CsrMatrix.from_scipy(Ac)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = np.asarray(spmv(M, jnp.asarray(x)))
    ref = Ac @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12
    h = SpmvHandle(M)
    assert h.algorithm.name in ("ELL", "SEGSUM", "DENSE"), h.algorithm
    # integer values
    Ai = sps.random(n, n, 0.1, random_state=5, format="csr")
    Ai.data = np.round(Ai.data * 10)
    Mi = CsrMatrix.from_scipy(Ai.astype(np.int32))
    xi = np.arange(n, dtype=np.int32)
    yi = np.asarray(spmv(Mi, jnp.asarray(xi)))
    refi = (Ai.astype(np.int64) @ xi.astype(np.int64))
    assert (yi.astype(np.int64) == refi).all()
    hi = SpmvHandle(Mi)
    assert hi.algorithm.name in ("ELL", "SEGSUM", "DENSE"), hi.algorithm
