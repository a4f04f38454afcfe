"""par_ilut + MDF tests — factorization-quality oracles
(Test_Sparse_par_ilut.hpp checks ||A-LU|| shrinks; mdf checks ordering is a
permutation and the factorization preconditions GMRES)."""
import numpy as np
import scipy.sparse as sps

from tpukk.containers import CsrMatrix, generate_diag_dominant_csr
from tpukk.sparse.gmres import GmresHandle, gmres
from tpukk.sparse.mdf import MdfHandle, mdf_numeric, mdf_ordering, mdf_symbolic
from tpukk.sparse.par_ilut import ParIlutHandle, par_ilut, par_ilut_numeric, par_ilut_symbolic
from tpukk.sparse.preconditioner import LUPrec


def test_par_ilut_reduces_residual():
    A = generate_diag_dominant_csr(60, 5, dtype=np.float64, seed=11)
    h = ParIlutHandle(max_iters=8, residual_tol=1e-8, fill_factor=4.0, sweeps_per_iter=2)
    par_ilut_symbolic(h, A)
    L, U = par_ilut_numeric(h, A)
    assert np.allclose(L.to_scipy().diagonal(), 1.0)
    Asp = A.to_scipy()
    r = sps.linalg.norm((Asp - L.to_scipy() @ U.to_scipy()).multiply(Asp != 0))
    assert r / sps.linalg.norm(Asp) < 0.05
    assert h.num_iters >= 1


def test_par_ilut_preconditioner_helps():
    A = generate_diag_dominant_csr(80, 5, dtype=np.float64, seed=12)
    b = np.random.default_rng(0).standard_normal(A.nrows)
    h0 = GmresHandle(m=8, tol=1e-9, max_restarts=50)
    _, s0 = gmres(h0, A, b)
    L, U = par_ilut(A, max_iters=5, fill_factor=3.0)
    h1 = GmresHandle(m=8, tol=1e-9, max_restarts=50)
    _, s1 = gmres(h1, A, b, prec=LUPrec(L, U))
    assert s1.converged
    assert s1.num_iters <= s0.num_iters


def test_mdf_ordering_is_permutation():
    A = generate_diag_dominant_csr(30, 4, dtype=np.float64, seed=13)
    perm = mdf_ordering(A)
    assert sorted(perm.tolist()) == list(range(A.nrows))


def test_mdf_numeric_factors():
    A = generate_diag_dominant_csr(25, 3, dtype=np.float64, seed=14)
    h = MdfHandle()
    mdf_symbolic(h, A)
    L, U = mdf_numeric(h, A)
    # LU approximates permuted A on its pattern
    from tpukk.graph.ordering import permute_matrix

    B = permute_matrix(A, h.permutation).to_scipy()
    prod = (L.to_scipy() @ U.to_scipy()).tocsr()
    diff = (prod - B).multiply(B != 0)
    assert np.abs(diff.data).max(initial=0.0) < 1e-10


def test_par_ilut_candidate_regrowth():
    """fill_factor=4 on a {0,±1,±10}-diagonal matrix whose true ILU fill
    (the full width-21 band) exceeds the level-2 candidate set: the outer
    loop must re-grow candidates (reference add_candidates role,
    par_ilut_numeric_impl.hpp) instead of capping at level-2."""
    import scipy.sparse as sps

    from tpukk.sparse.par_ilut import (ParIlutHandle, _pattern,
                                       par_ilut_numeric, par_ilut_symbolic)

    n = 300
    offs = {0: 30.0, 1: -1.0, -1: -1.0, 10: -1.0, -10: -1.0}
    A = sps.diags(list(offs.values()), list(offs.keys()), (n, n)).tocsr()
    A.sort_indices()
    M = CsrMatrix.from_scipy(A.astype(np.float64))
    patL = sps.tril(A, -1).tocsr()
    patU = sps.triu(A, 0).tocsr()
    cap = (_pattern(((_pattern(patL) + sps.identity(n))
                     @ _pattern(patU)).tocsr()) + _pattern(A)).nnz
    h = ParIlutHandle(max_iters=8, fill_factor=4.0, residual_tol=1e-10,
                      sweeps_per_iter=3)
    par_ilut_symbolic(h, M)
    L, U = par_ilut_numeric(h, M)
    fill = (L.nnz - n) + U.nnz
    assert fill > cap, (fill, cap)          # grew beyond the level-2 set
    assert h.final_residual < 1e-10         # and converged on A's pattern
    R = A - (L.to_scipy() @ U.to_scipy())
    assert sps.linalg.norm(R) / sps.linalg.norm(A) < 1e-4
