"""Real-matrix-file-driven tests — the analog of the reference's .mtx-driven
perf/example inputs (example/gmres/ex_real_A.cpp:36,
perf_test/sparse/KokkosSparse_spgemm.cpp).  The fixture data/fem2d_small.mtx.gz
is an unstructured P1 FEM stiffness matrix (irregular degrees, random node
order, SPD) read through the MatrixMarket path."""
import os

import numpy as np
import pytest
import scipy.sparse as sps

from tpukk.containers import read_mtx

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


@pytest.fixture(scope="module")
def fem():
    return read_mtx(os.path.join(DATA, "fem2d_small.mtx.gz"),
                    value_dtype=np.float64)


def test_fixture_shape(fem):
    assert fem.nrows == fem.ncols == 3000
    deg = np.diff(np.asarray(fem.row_map))
    assert deg.min() >= 3 and deg.max() >= 10  # genuinely irregular


def test_spmv_real_matrix(fem, rng):
    from tpukk.sparse import spmv

    x = rng.standard_normal(fem.ncols)
    y = np.asarray(spmv(fem, x))
    ref = fem.to_scipy() @ x
    tol = 20 * np.finfo(np.float64).eps * np.abs(ref).max()
    assert np.abs(y - ref).max() < tol


def test_spgemm_real_matrix(fem):
    from tpukk.sparse.spgemm import SpgemmHandle, spgemm_numeric, spgemm_symbolic

    h = SpgemmHandle()
    spgemm_symbolic(h, fem, fem)
    C = spgemm_numeric(h, fem, fem)
    ref = (fem.to_scipy() @ fem.to_scipy()).tocsr()
    ref.sort_indices()
    got = C.to_scipy()
    assert got.nnz == ref.nnz
    d = np.abs((got - ref).data).max(initial=0.0)
    assert d < 1e-10 * np.abs(ref.data).max()


def test_pcg_real_matrix(fem, rng):
    from tpukk.sparse.pcg import pcg

    x_true = rng.standard_normal(fem.nrows)
    b = fem.to_scipy() @ x_true
    x, stats = pcg(fem, b, tol=1e-8, max_iters=4000)
    r = b - fem.to_scipy() @ np.asarray(x)
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)
