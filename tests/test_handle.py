"""Aggregate handle + streams-parity tests (KokkosKernels_Handle contract)."""
import numpy as np
import pytest

from tpukk.common import TpuKKError
from tpukk.containers import generate_diag_dominant_csr
from tpukk.handle import TpukkHandle, spiluk_numeric_streams, sptrsv_solve_streams
from tpukk.sparse import (
    gauss_seidel_apply,
    gauss_seidel_numeric,
    gauss_seidel_symbolic,
    gmres,
    spgemm_numeric,
    spgemm_symbolic,
    spiluk_symbolic,
    sptrsv_symbolic,
)


def test_handle_lifecycle():
    kh = TpukkHandle()
    with pytest.raises(TpuKKError):
        kh.get_spgemm_handle()
    h = kh.create_spgemm_handle()
    assert kh.get_spgemm_handle() is h
    kh.destroy_spgemm_handle()
    with pytest.raises(TpuKKError):
        kh.get_spgemm_handle()


def test_handle_composition(rng):
    A = generate_diag_dominant_csr(50, 4, dtype=np.float64, seed=20)
    kh = TpukkHandle()
    sh = kh.create_spgemm_handle()
    spgemm_symbolic(sh, A, A)
    C = spgemm_numeric(sh, A, A)
    assert C.nnz > 0
    gh = kh.create_gs_handle()
    gauss_seidel_symbolic(gh, A)
    gauss_seidel_numeric(gh, A)
    b = rng.standard_normal(A.nrows)
    x = gauss_seidel_apply(gh, A, None, b, 2)
    assert np.linalg.norm(A.to_scipy() @ np.asarray(x) - b) < np.linalg.norm(b)
    mh = kh.create_gmres_handle(m=20, tol=1e-8)
    xg, stats = gmres(mh, A, b)
    assert stats.converged


def test_streams(rng):
    import scipy.sparse as sps

    from tpukk.containers import CsrMatrix
    from tpukk.sparse import SpilukHandle, SptrsvHandle

    mats = [generate_diag_dominant_csr(30, 3, dtype=np.float64, seed=s) for s in (1, 2, 3)]
    ilu_handles = [SpilukHandle(0) for _ in mats]
    for h, A in zip(ilu_handles, mats):
        spiluk_symbolic(h, A)
    lus = spiluk_numeric_streams(ilu_handles, mats)
    assert len(lus) == 3
    tris = []
    tri_handles = []
    for A in mats:
        T = sps.tril(A.to_scipy()).tocsr()
        T.setdiag(np.abs(T.diagonal()) + 1.0)
        T.sort_indices()
        Tm = CsrMatrix.from_scipy(T)
        h = SptrsvHandle(True)
        sptrsv_symbolic(h, Tm)
        tris.append(Tm)
        tri_handles.append(h)
    rhss = [rng.standard_normal(30) for _ in mats]
    xs = sptrsv_solve_streams(tri_handles, tris, rhss)
    for Tm, x, b in zip(tris, xs, rhss):
        np.testing.assert_allclose(Tm.to_scipy() @ np.asarray(x), b, rtol=1e-10, atol=1e-10)
