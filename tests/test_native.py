"""Native C++ host-runtime tests: results must match the pure-Python
fallbacks exactly."""
import numpy as np
import pytest
import scipy.sparse as sps

from tpukk import native
from tpukk.containers import CsrMatrix, generate_diag_dominant_csr, generate_random_csr
from tpukk.sparse.spiluk import SpilukHandle, _iluk_pattern, spiluk_numeric, spiluk_symbolic

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_compiles():
    assert native.available()


def test_greedy_color_valid():
    from tpukk.graph.coloring import verify_coloring

    A = generate_random_csr(200, 200, 5, seed=1)
    sp = ((A.to_scipy() + A.to_scipy().T) * 0.5).tocsr()
    sp.sort_indices()
    S = CsrMatrix.from_scipy(sp.astype(np.float64))
    colors = native.d1_greedy_color(np.asarray(S.row_map), np.asarray(S.entries), S.nrows)
    assert verify_coloring(S, colors)


@pytest.mark.parametrize("k", [0, 1, 2])
def test_iluk_symbolic_matches_python(k):
    A = generate_diag_dominant_csr(40, 4, dtype=np.float64, seed=3)
    sp = A.to_scipy()
    indptr, indices = native.iluk_symbolic(sp.indptr, sp.indices, A.nrows, k)
    ref = _iluk_pattern(sp, k)
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)


def test_ilu_numeric_matches_python(monkeypatch):
    A = generate_diag_dominant_csr(50, 5, dtype=np.float64, seed=4)
    h = SpilukHandle(1)
    spiluk_symbolic(h, A)
    Ln, Un = spiluk_numeric(h, A)                       # native
    monkeypatch.setattr(native, "available", lambda: False)
    Lp, Up = spiluk_numeric(h, A)                       # python fallback
    np.testing.assert_allclose(np.asarray(Ln.values), np.asarray(Lp.values), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(Un.values), np.asarray(Up.values), rtol=1e-14)


def test_csr_transpose_matches_scipy():
    A = generate_random_csr(30, 50, 4, seed=5, dtype=np.float64)
    sp = A.to_scipy()
    ti, tj, tv = native.csr_transpose(sp.indptr, sp.indices, sp.data, 30, 50)
    T = sps.csr_matrix((tv, tj, ti), shape=(50, 30))
    assert (T != sp.T.tocsr()).nnz == 0


def test_mdf_order_native_matches_python():
    """C++ MDF greedy (tpukk_native.cpp::tpukk_mdf_order) must reproduce the
    Python reference ordering exactly on a generic matrix."""
    import numpy as np
    from tpukk import native
    from tpukk.containers import generate_diag_dominant_csr
    from tpukk.sparse.mdf import MdfHandle, mdf_symbolic

    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    A = generate_diag_dominant_csr(150, 5, dtype=np.float64, seed=11)
    h1 = MdfHandle()
    mdf_symbolic(h1, A)
    orig = native.mdf_order
    try:
        native.mdf_order = lambda *a, **k: None
        h2 = MdfHandle()
        mdf_symbolic(h2, A)
    finally:
        native.mdf_order = orig
    np.testing.assert_array_equal(h1.permutation, h2.permutation)
