"""SpGEMM/SpADD tests — sorted-CRS matrix-equality oracle
(Test_Sparse_spgemm.hpp:22,98-110 `is_same_matrix` + handle state flags)."""
import numpy as np
import pytest
import scipy.sparse as sps

from tpukk.containers import CsrMatrix, generate_random_csr, generate_structured_laplacian
from tpukk.sparse.spadd import SpaddHandle, spadd, spadd_numeric, spadd_symbolic
from tpukk.sparse.spgemm import SpgemmAlgorithm, SpgemmHandle, spgemm, spgemm_numeric, spgemm_symbolic


def is_same_matrix(C, ref, tol=1e-10):
    Cs = C.to_scipy()
    Cs.sort_indices()
    ref = ref.tocsr()
    ref.sort_indices()
    ref.eliminate_zeros()
    Cs2 = Cs.copy()
    Cs2.data = np.where(np.abs(Cs2.data) < tol, 0, Cs2.data)
    Cs2.eliminate_zeros()
    if Cs2.shape != ref.shape:
        return False
    d = (Cs2 - ref)
    return np.abs(d.data).max(initial=0.0) < tol * max(1.0, np.abs(ref.data).max(initial=1.0))


@pytest.mark.parametrize("algo", [SpgemmAlgorithm.KK, SpgemmAlgorithm.DENSE_ACC, SpgemmAlgorithm.DEBUG])
def test_spgemm_aa(algo):
    A = generate_structured_laplacian(15, 12, dtype=np.float64)
    h = SpgemmHandle(algo)
    spgemm_symbolic(h, A, A)
    assert h.is_symbolic_called
    C = spgemm_numeric(h, A, A)
    assert is_same_matrix(C, A.to_scipy() @ A.to_scipy())


def test_spgemm_rect():
    A = generate_random_csr(40, 60, 5, seed=1, dtype=np.float64)
    B = generate_random_csr(60, 30, 4, seed=2, dtype=np.float64)
    C = spgemm(A, B)
    assert is_same_matrix(C, A.to_scipy() @ B.to_scipy())


def test_spgemm_numeric_reuse():
    A = generate_random_csr(30, 30, 4, seed=3, dtype=np.float64)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, A)
    C1 = spgemm_numeric(h, A, A)
    A2 = A.with_values(np.asarray(A.values) * 2.0)
    C2 = spgemm_numeric(h, A2, A2)
    np.testing.assert_allclose(np.asarray(C2.values), 4 * np.asarray(C1.values), rtol=1e-12)


def test_spgemm_empty_rows():
    d = np.zeros((8, 8))
    d[1, 2] = 1.0
    d[5, 5] = 2.0
    A = CsrMatrix.from_scipy(sps.csr_matrix(d).astype(np.float64))
    C = spgemm(A, A)
    assert is_same_matrix(C, sps.csr_matrix(d @ d))


@pytest.mark.parametrize("sorted_input", [True, False])
def test_spadd(sorted_input):
    A = generate_random_csr(50, 40, 4, seed=5, dtype=np.float64)
    B = generate_random_csr(50, 40, 6, seed=6, dtype=np.float64)
    C = spadd(2.0, A, -0.5, B, sorted_input=sorted_input)
    assert is_same_matrix(C, 2.0 * A.to_scipy() - 0.5 * B.to_scipy())


def test_spadd_numeric_reuse():
    A = generate_random_csr(20, 20, 3, seed=7, dtype=np.float64)
    B = generate_random_csr(20, 20, 3, seed=8, dtype=np.float64)
    h = SpaddHandle()
    spadd_symbolic(h, A, B)
    C1 = spadd_numeric(h, 1.0, A, 1.0, B)
    C2 = spadd_numeric(h, 0.0, A, 1.0, B)
    assert is_same_matrix(C2, B.to_scipy())
    assert is_same_matrix(C1, A.to_scipy() + B.to_scipy())


def test_spgemm_jacobi():
    from tpukk.sparse.spgemm import spgemm_jacobi

    A = generate_structured_laplacian(12, 10, dtype=np.float64)
    B = generate_random_csr(120, 40, 3, seed=9, dtype=np.float64)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, B)
    dinv = 1.0 / A.to_scipy().diagonal()
    omega = 0.7
    C = spgemm_jacobi(h, A, B, omega, dinv)
    import scipy.sparse as _sps

    ref = (B.to_scipy() - omega * _sps.diags(dinv) @ A.to_scipy() @ B.to_scipy()).tocsr()
    assert is_same_matrix(C, ref)


def test_bspgemm_vs_scipy(rng):
    """Block SpGEMM (sparse/impl/KokkosSparse_bspgemm_impl*.hpp analog):
    BSR block pair plan + batched MXU block products vs scipy."""
    import scipy.sparse as sp
    from tpukk.containers import BsrMatrix, crs2bsr, generate_random_csr
    from tpukk.sparse import bspgemm

    b = 4
    nb = 30
    S = sp.random(nb, nb, density=0.15, random_state=11, format="csr")
    S.data[:] = 1.0
    dense = np.kron(S.toarray(), np.ones((b, b))) * rng.standard_normal((nb * b, nb * b))
    Absr = crs2bsr(_dense_to_csr(dense.astype(np.float32)), b)
    Bbsr = crs2bsr(_dense_to_csr(dense.T.copy().astype(np.float32)), b)
    C = bspgemm(Absr, Bbsr)
    ref = dense.astype(np.float32) @ dense.T.astype(np.float32)
    got = np.asarray(_bsr_to_dense(C))
    assert np.abs(got - ref).max() <= 1e-4 * max(1.0, np.abs(ref).max())


def _dense_to_csr(d):
    from tpukk.containers import CsrMatrix

    return CsrMatrix.from_dense(d)


def _bsr_to_dense(C):
    import numpy as _np

    b = C.block_size
    out = _np.zeros((C.nrows, C.ncols), _np.float32)
    rm = _np.asarray(C.row_map)
    ent = _np.asarray(C.entries)
    vals = _np.asarray(C.values)
    for i in range(C.n_block_rows):
        for p in range(rm[i], rm[i + 1]):
            j = ent[p]
            out[i * b:(i + 1) * b, j * b:(j + 1) * b] = vals[p]
    return out


def test_spgemm_onehot_pallas_interpret(rng):
    """One-hot pallas SpGEMM numeric (interpret mode) vs scipy — exact for
    f32 pair products; covers multi-C-tile, padding, empty C tiles."""
    from tpukk.containers import generate_random_csr, generate_structured_laplacian
    from tpukk.sparse.spgemm import SpgemmHandle, spgemm_symbolic
    from tpukk.sparse.spgemm_pallas import build_onehot_pair_plan, onehot_pair_numeric

    for A in (generate_structured_laplacian(35, 35, dtype=np.float32),
              generate_random_csr(600, 400, 4, seed=9, dtype=np.float32)):
        from tpukk.containers import generate_random_csr as g
        B = A if A.ncols == A.nrows else g(A.ncols, 300, 3, seed=10, dtype=np.float32)
        h = SpgemmHandle()
        spgemm_symbolic(h, A, B)
        ref = (A.to_scipy() @ B.to_scipy()).tocsr()
        ref.sort_indices()
        for layout in ("flat", "dstlane", "auto"):
            plan = build_onehot_pair_plan(h.pair_plan, A.nnz, B.nnz,
                                          layout=layout)
            cv = np.asarray(onehot_pair_numeric(plan, A.values, B.values,
                                                interpret=True))
            assert np.abs(cv - ref.data).max() <= 1e-5 * max(1.0, np.abs(ref.data).max())


class TestSpgemmDia:
    """Banded offset-convolution path (spgemm_dia.py).  AUTO routes here only
    when operand diagonals are full (exact pattern); opt-in DIA yields the
    clipped-band pattern (superset with explicit zeros)."""

    def test_auto_exact_banded(self, rng):
        from tpukk.containers import generate_banded_csr
        from tpukk.sparse import SpgemmHandle, spgemm_symbolic, spgemm_numeric
        A = generate_banded_csr(400, 3, dtype=np.float64, seed=2)
        h = SpgemmHandle()
        spgemm_symbolic(h, A, A)
        assert h.dia_plan is not None
        C = spgemm_numeric(h, A, A)
        ref = (A.to_scipy() @ A.to_scipy()).tocsr()
        ref.sort_indices()
        got = C.to_scipy()
        got.sort_indices()
        np.testing.assert_array_equal(ref.indptr, got.indptr)
        np.testing.assert_array_equal(ref.indices, got.indices)
        np.testing.assert_allclose(got.data, ref.data, rtol=1e-12, atol=1e-12)

    def test_auto_skips_holey_band(self):
        from tpukk.containers import generate_structured_laplacian
        from tpukk.sparse import SpgemmHandle, spgemm_symbolic
        L = generate_structured_laplacian(20, 20, dtype=np.float64)
        h = SpgemmHandle()
        spgemm_symbolic(h, L, L)
        assert h.dia_plan is None  # ±1/±nx diagonals have interior holes

    def test_optin_band_dense_equality(self, rng):
        from tpukk.containers import generate_structured_laplacian
        from tpukk.sparse import (SpgemmAlgorithm, SpgemmHandle,
                                  spgemm_numeric, spgemm_symbolic)
        L = generate_structured_laplacian(25, 25, dtype=np.float64)
        h = SpgemmHandle(SpgemmAlgorithm.DIA)
        spgemm_symbolic(h, L, L)
        C = spgemm_numeric(h, L, L)
        ref = (L.to_scipy() @ L.to_scipy()).toarray()
        np.testing.assert_allclose(C.to_scipy().toarray(), ref,
                                   rtol=1e-12, atol=1e-12)

    def test_rectangular(self, rng):
        from tpukk.containers import generate_banded_csr
        from tpukk.sparse import (SpgemmAlgorithm, SpgemmHandle,
                                  spgemm_numeric, spgemm_symbolic)
        import scipy.sparse as sps
        A = generate_banded_csr(300, 2, dtype=np.float64, seed=4)
        B = generate_banded_csr(300, 4, dtype=np.float64, seed=5)
        h = SpgemmHandle(SpgemmAlgorithm.DIA)
        spgemm_symbolic(h, A, B)
        C = spgemm_numeric(h, A, B)
        ref = (A.to_scipy() @ B.to_scipy()).toarray()
        np.testing.assert_allclose(C.to_scipy().toarray(), ref,
                                   rtol=1e-12, atol=1e-12)

    def test_values_refresh_reuse(self, rng):
        # same pattern, new values — the reuse contract
        from tpukk.containers import CsrMatrix, generate_banded_csr
        from tpukk.sparse import SpgemmHandle, spgemm_symbolic, spgemm_numeric
        A = generate_banded_csr(200, 3, dtype=np.float64, seed=7)
        h = SpgemmHandle()
        spgemm_symbolic(h, A, A)
        assert h.dia_plan is not None
        import jax.numpy as jnp
        A2 = CsrMatrix.from_arrays(A.row_map, A.entries,
                                   jnp.asarray(np.asarray(A.values) * 2 + 1),
                                   nrows=A.nrows, ncols=A.ncols)
        C2 = spgemm_numeric(h, A2, A2)
        ref = (A2.to_scipy() @ A2.to_scipy()).toarray()
        np.testing.assert_allclose(C2.to_scipy().toarray(), ref,
                                   rtol=1e-12, atol=1e-12)


def test_spgemm_sort_pair_interpret():
    """Sort-based scattered numeric (SortPairPlan): both the routed
    (StaticPermutePlan) and the runtime-sort reorder match scipy in
    interpret mode."""
    from tpukk.common.permute import build_permute_plan
    from tpukk.sparse import spgemm_pallas

    A = generate_random_csr(300, 300, 6, seed=11, dtype=np.float32)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, A)
    pp = h.pair_plan
    plan = spgemm_pallas.SortPairPlan(pp.a_idx, pp.b_idx, pp.c_idx,
                                      A.nnz, A.nnz, pp.nnz_c)
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    ref.sort_indices()
    vals = np.asarray(spgemm_pallas.sort_pair_numeric(
        plan, A.values, A.values, interpret=True))
    np.testing.assert_allclose(vals, ref.data, rtol=1e-5, atol=1e-5)
    if plan.perm_plan is None:
        # small problem fell back to the sort: also exercise the routed path
        b_idx = np.asarray(pp.b_idx)
        border = np.argsort(b_idx, kind="stable")
        inv = np.empty(len(border), np.int64)
        inv[border] = np.arange(len(border))
        routed = build_permute_plan(inv, _force=True)
        if routed is not None:
            plan.perm_plan, plan.perm_keys = routed, None
            vals2 = np.asarray(spgemm_pallas.sort_pair_numeric(
                plan, A.values, A.values, interpret=True))
            np.testing.assert_allclose(vals2, ref.data, rtol=1e-5, atol=1e-5)


def test_spgemm_pk_pair_layout_interpret(rng):
    """The pk pair fast path (native dual-cell placement + packed dual
    gathers + 4-tile output blocks) engages on structured patterns and is
    exact; the compact slot layout engages on scattered patterns."""
    from tpukk import native
    from tpukk.containers import (generate_random_csr,
                                  generate_structured_laplacian)
    from tpukk.sparse import spgemm_pallas

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    A = generate_structured_laplacian(60, 60, dtype=np.float32)
    rm = A.host_row_map()
    ent = A.host_entries()
    res = native.spgemm_symbolic(rm, ent, A.nrows, A.ncols, rm, ent)
    _, entries_c, a_idx, b_idx, c_idx = res
    plan = spgemm_pallas.GtPairPlan(a_idx, b_idx, c_idx, A.nnz, A.nnz,
                                    len(entries_c))
    assert plan.layout == "pk"
    cv = np.asarray(spgemm_pallas.onehot_pair_numeric(
        plan, A.values, A.values, interpret=True))
    sp = A.to_scipy()
    ref = (sp @ sp).tocsr()
    ref.sort_indices()
    np.testing.assert_allclose(cv, ref.data, rtol=1e-6)

    Ar = generate_random_csr(4000, 4000, 5, seed=9, dtype=np.float32)
    rmr = Ar.host_row_map()
    entr = Ar.host_entries()
    resr = native.spgemm_symbolic(rmr, entr, Ar.nrows, Ar.ncols, rmr, entr)
    _, entries_cr, ai, bi, ci = resr
    planr = spgemm_pallas.SortPairPlan(ai, bi, ci, Ar.nnz, Ar.nnz,
                                       len(entries_cr))
    assert planr.compact
    cvr = np.asarray(spgemm_pallas.sort_pair_numeric(
        planr, Ar.values, Ar.values, interpret=True))
    refr = (Ar.to_scipy() @ Ar.to_scipy()).tocsr()
    refr.sort_indices()
    np.testing.assert_allclose(cvr, refr.data, rtol=1e-5, atol=1e-6)


def test_spgemm_sort_pair_fused_interpret(monkeypatch):
    """Fused compact pipeline (pinned-b expansion kernel + phase-3
    a-gather+product): exact vs scipy in interpret mode.  Routing is
    forced so the small test matrix takes the fused path."""
    import tpukk.common.permute as pmod
    from tpukk.sparse import spgemm_pallas

    orig = pmod.build_permute_plan
    monkeypatch.setattr(pmod, "build_permute_plan",
                        lambda src, **kw: orig(src, _force=True))
    A = generate_random_csr(2000, 2000, 6, seed=5, dtype=np.float32)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, A)
    pp = h.pair_plan
    plan = spgemm_pallas.SortPairPlan(pp.a_idx, pp.b_idx, pp.c_idx,
                                      A.nnz, A.nnz, pp.nnz_c)
    assert plan.compact
    assert plan.fused, "fused gate did not engage"
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    ref.sort_indices()
    vals = np.asarray(spgemm_pallas.sort_pair_numeric(
        plan, A.values, A.values, interpret=True))
    np.testing.assert_allclose(vals, ref.data, rtol=1e-5, atol=1e-5)


def test_spgemm_sort_pair_fused_noncompact_interpret(monkeypatch):
    """Fused pipeline on the NON-compact layout (many multi-pair C
    segments): products emerge in c-sorted pair order and reduce through
    c_sum; exact vs scipy."""
    import tpukk.common.permute as pmod
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import spgemm_pallas

    orig = pmod.build_permute_plan
    monkeypatch.setattr(pmod, "build_permute_plan",
                        lambda src, **kw: orig(src, _force=True))
    A = generate_structured_laplacian(40, 40, dtype=np.float32)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, A)
    pp = h.pair_plan
    plan = spgemm_pallas.SortPairPlan(pp.a_idx, pp.b_idx, pp.c_idx,
                                      A.nnz, A.nnz, pp.nnz_c)
    assert not plan.compact
    assert plan.fused, "non-compact fused gate did not engage"
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    ref.sort_indices()
    vals = np.asarray(spgemm_pallas.sort_pair_numeric(
        plan, A.values, A.values, interpret=True))
    np.testing.assert_allclose(vals, ref.data, rtol=1e-5, atol=1e-5)


def test_bspadd_block_matrices():
    """Block SpADD over BsrMatrix (Test_BlockSparse.hpp spadd coverage):
    C = 2A - B with block-pattern union."""
    from tpukk.containers import generate_random_bsr
    from tpukk.sparse import bspadd

    A = generate_random_bsr(8, 8, 4, 3, seed=1)
    B = generate_random_bsr(8, 8, 4, 3, seed=2)
    C = bspadd(2.0, A, -1.0, B)
    ref = (2.0 * A.to_scipy() - B.to_scipy()).tocsr()
    got = C.to_scipy().tocsr()
    ref.sort_indices(); got.sort_indices()
    ref.eliminate_zeros(); got.eliminate_zeros()
    assert np.abs((got - ref).toarray()).max() < 1e-5
    assert C.block_size == 4
