"""SpMV oracle tests — analog of sparse/unit_test/Test_Sparse_spmv.hpp:
sequential host reference (scipy) + scaled-eps tolerance (:76-181), mode
N/T/C coverage, multivector (:211), alpha/beta sweep."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpukk.containers import crs2bsr, generate_random_csr, generate_structured_laplacian
from tpukk.sparse import SpmvAlgorithm, SpmvHandle, spmm, spmv

from conftest import tol_for

ALGOS = [SpmvAlgorithm.ELL, SpmvAlgorithm.SEGSUM, SpmvAlgorithm.DENSE]


def _check(y, y_ref, dtype):
    scale = max(1.0, np.abs(y_ref).max())
    assert np.abs(np.asarray(y) - y_ref).max() <= tol_for(dtype, 20) * scale


@pytest.mark.parametrize("algo", ALGOS)
def test_spmv_laplacian(algo, scalar, rng):
    A = generate_structured_laplacian(30, 20, dtype=scalar)
    x = rng.standard_normal(A.ncols).astype(scalar)
    _check(spmv(A, x, algorithm=algo), A.to_scipy() @ x, scalar)


@pytest.mark.parametrize("algo", ALGOS)
def test_spmv_random_skewed(algo, rng):
    # skewed row lengths exercise the bucketed-ELL load balance
    A = generate_random_csr(200, 150, 6, seed=3, dtype=np.float64)
    x = rng.standard_normal(A.ncols)
    _check(spmv(A, x, algorithm=algo), A.to_scipy() @ x, np.float64)


@pytest.mark.parametrize("alpha,beta", [(1.0, 0.0), (2.5, 0.0), (1.0, 1.0), (-1.0, 0.5), (0.0, 2.0)])
def test_spmv_alpha_beta(alpha, beta, rng):
    A = generate_structured_laplacian(25, 25, dtype=np.float64)
    x = rng.standard_normal(A.ncols)
    y = rng.standard_normal(A.nrows)
    ref = beta * y + alpha * (A.to_scipy() @ x)
    _check(spmv(A, x, alpha=alpha, beta=beta, y=y, algorithm=SpmvAlgorithm.ELL), ref, np.float64)


@pytest.mark.parametrize("mode", ["T", "H"])
def test_spmv_transpose(mode, rng):
    # real scalars: T and H (conjugate transpose) coincide; C = conjugate
    # without transpose (KokkosSparse_spmv.hpp:126) is the N shape
    A = generate_random_csr(60, 40, 5, seed=7, dtype=np.float64)
    x = rng.standard_normal(A.nrows)
    ref = A.to_scipy().T @ x
    _check(spmv(A, x, mode=mode, algorithm=SpmvAlgorithm.ELL), ref, np.float64)
    xc = rng.standard_normal(A.ncols)
    _check(spmv(A, xc, mode="C", algorithm=SpmvAlgorithm.ELL),
           A.to_scipy() @ xc, np.float64)


def test_spmm_multivector(rng):
    A = generate_structured_laplacian(20, 20, dtype=np.float64)
    X = rng.standard_normal((A.ncols, 8))
    _check(spmm(A, X, algorithm=SpmvAlgorithm.ELL), A.to_scipy() @ X, np.float64)
    _check(spmm(A, X, algorithm=SpmvAlgorithm.SEGSUM), A.to_scipy() @ X, np.float64)


def test_spmv_bsr(rng):
    A = generate_structured_laplacian(64, dtype=np.float64)
    B = crs2bsr(A, 4)
    x = rng.standard_normal(B.ncols)
    _check(spmv(B, x), A.to_scipy() @ x, np.float64)
    X = rng.standard_normal((B.ncols, 4))
    _check(spmv(B, X), A.to_scipy() @ X, np.float64)


def test_handle_reuse(rng):
    A = generate_structured_laplacian(16, 16, dtype=np.float64)
    h = SpmvHandle(A, SpmvAlgorithm.ELL)
    x1 = rng.standard_normal(A.ncols)
    x2 = rng.standard_normal(A.ncols)
    _check(h(x1), A.to_scipy() @ x1, np.float64)
    _check(h(x2), A.to_scipy() @ x2, np.float64)
    assert "ell" in h._plans  # symbolic result cached


def test_spmv_jit(rng):
    import jax

    A = generate_structured_laplacian(16, 16, dtype=np.float32)
    h = SpmvHandle(A, SpmvAlgorithm.ELL)
    f = jax.jit(lambda x: h(x))
    x = rng.standard_normal(A.ncols).astype(np.float32)
    _check(f(x), A.to_scipy() @ x, np.float32)


def test_empty_rows(rng):
    # matrix with empty rows: correctness of padding path
    import scipy.sparse as sps

    from tpukk.containers import CsrMatrix

    d = np.zeros((10, 10))
    d[0, 0] = 1.0
    d[5, 3] = 2.0
    d[9, 9] = 3.0
    A = CsrMatrix.from_scipy(sps.csr_matrix(d).astype(np.float64))
    x = rng.standard_normal(10)
    for algo in ALGOS:
        _check(spmv(A, x, algorithm=algo), d @ x, np.float64)


def test_spmv_struct_api(rng):
    from tpukk.sparse.spmv_struct import spmv_struct, structured_stencil_offsets

    A = generate_structured_laplacian(25, 20, dtype=np.float64)
    x = rng.standard_normal(A.ncols)
    y = spmv_struct(A, (25, 20), x)
    _check(y, A.to_scipy() @ x, np.float64)
    offs = structured_stencil_offsets((25, 20))
    assert list(offs) == [-25, -1, 0, 1, 25]
    # 3D 7-point
    A3 = generate_structured_laplacian(8, 8, 8, dtype=np.float64)
    x3 = rng.standard_normal(A3.ncols)
    _check(spmv_struct(A3, (8, 8, 8), x3), A3.to_scipy() @ x3, np.float64)
    # wrong grid declaration must raise
    import pytest as _pytest
    from tpukk.common import TpuKKError

    with _pytest.raises(TpuKKError):
        spmv_struct(A, (7, 11), x)


def test_spmv_bf16():
    """bf16 scalar axis (the reference's bhalf ETI axis)."""
    import jax.numpy as jnp

    A = generate_structured_laplacian(20, 20, dtype=np.float32)
    Ab = A.with_values(A.values.astype(jnp.bfloat16))
    x = np.linspace(-1, 1, Ab.ncols).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    y = np.asarray(spmv(Ab, xb, algorithm=SpmvAlgorithm.ELL)).astype(np.float32)
    ref = A.to_scipy() @ x
    assert np.abs(y - ref).max() <= 0.05 * max(1.0, np.abs(ref).max())


def test_onehot_pallas_interpret(rng):
    """Tiled one-hot MXU kernel (interpret mode on CPU) vs scipy — covers
    multi-tile dst/src, chunk padding, empty dst tiles, rectangular shapes."""
    from tpukk.sparse.spmv_pallas import build_onehot_spmv_plan, onehot_spmv
    import jax.numpy as jnp

    cases = [
        generate_random_csr(1200, 1500, 4, seed=7, dtype=np.float32),  # >1 dst tile
        generate_random_csr(100, 8400, 3, seed=8, dtype=np.float32),   # >1 src tile
        generate_structured_laplacian(36, 36, dtype=np.float32),
    ]
    # empty rows / empty dst tile: rows 1100.. have no entries
    import scipy.sparse as sp
    from tpukk.containers import CsrMatrix

    M = sp.random(1100, 1100, density=0.002, random_state=5, format="csr", dtype=np.float32)
    M.resize(2100, 1100)
    cases.append(CsrMatrix.from_scipy(M))
    for A in cases:
        x = rng.standard_normal(A.ncols).astype(np.float32)
        ref = A.to_scipy() @ x
        for layout in ("flat", "dstlane", "gt", "auto"):
            plan = build_onehot_spmv_plan(A, layout=layout)
            y = np.asarray(onehot_spmv(plan, jnp.asarray(x), interpret=True))
            _check(y, ref, np.float32)


def test_onehot_spmm_interpret(rng):
    """Multi-RHS one-hot kernel: masks built once per chunk, reused per
    column; must match scipy for rectangular + multi-tile cases."""
    from tpukk.sparse.spmv_pallas import build_onehot_spmv_plan, onehot_spmm
    import jax.numpy as jnp

    for A in (generate_random_csr(1200, 8400, 3, seed=12, dtype=np.float32),
              generate_structured_laplacian(35, 35, dtype=np.float32)):
        X = rng.standard_normal((A.ncols, 3)).astype(np.float32)
        ref = A.to_scipy() @ X
        for layout in ("flat", "dstlane"):
            plan = build_onehot_spmv_plan(A, layout=layout)
            Y = np.asarray(onehot_spmm(plan, jnp.asarray(X), interpret=True))
            _check(Y, ref, np.float32)


def test_bsr_banded_routes_to_dia(rng):
    """AUTO on a banded block graph routes through the scalar-DIA expansion
    (the MXU/streaming analog of SPMV_BSR_TC special-casing) and matches the
    scipy BSR product exactly."""
    import scipy.sparse as sps

    from tpukk.containers import BsrMatrix, generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle

    G = generate_structured_laplacian(12, 12, dtype=np.float32)
    sp = G.to_scipy().tocsr()
    b = 4
    blocks = (rng.standard_normal((sp.nnz, b, b)) * 0.1).astype(np.float32)
    bsr = sps.bsr_matrix((blocks, sp.indices, sp.indptr),
                         shape=(sp.shape[0] * b, sp.shape[1] * b))
    A = BsrMatrix.from_scipy_bsr(bsr)
    h = SpmvHandle(A)
    assert h.algorithm == SpmvAlgorithm.DIA
    x = rng.standard_normal(A.ncols).astype(np.float32)
    y = np.asarray(h(jnp.asarray(x)))
    ref = bsr.tocsr() @ x
    assert np.abs(y - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())
    # explicit BSR algorithm still uses the block gather path
    hb = SpmvHandle(A, SpmvAlgorithm.BSR)
    assert hb.algorithm == SpmvAlgorithm.BSR
    yb = np.asarray(hb(jnp.asarray(x)))
    assert np.abs(yb - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


def test_dia_ds_f64_interpret(rng):
    """Double-single f64 DIA kernel (interpret).  NOTE: interpret mode runs
    through XLA:CPU which keeps excess precision across f32 ops, breaking
    the compensated-arithmetic invariants — so only a loose (~f32-level)
    tolerance is checkable here; the real ~1e-13 accuracy is asserted on
    hardware in tests/test_tpu.py::test_dia_ds_f64_on_tpu."""
    from tpukk.containers import generate_banded_csr
    from tpukk.sparse import spmv_impl
    from tpukk.sparse.spmv_pallas import DiaDsPlan, dia_spmv_ds

    A = generate_banded_csr(3000, 3, dtype=np.float64, seed=2)
    plan = DiaDsPlan(spmv_impl.build_dia_plan(A), chunk=1024)
    x = rng.standard_normal(A.ncols)
    y = dia_spmv_ds(plan, x, interpret=True)
    ref = A.to_scipy() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-6, rel


def test_onehot_ds_f64_interpret(rng):
    """Arbitrary-pattern f64 double-single gather kernel (gi4-locked,
    compensated accumulate) vs the f64 scipy oracle."""
    from tpukk.sparse.spmv_pallas import build_onehot_ds_plan, onehot_spmv_ds

    for A in (generate_structured_laplacian(40, 40, dtype=np.float64),
              generate_random_csr(2500, 2500, 8, seed=9, dtype=np.float64)):
        plan = build_onehot_ds_plan(A)
        if plan is None:
            import pytest
            pytest.skip("native placer unavailable")
        x = rng.standard_normal(A.ncols)
        y = onehot_spmv_ds(plan, x, interpret=True)
        ref = A.to_scipy() @ x
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 1e-12


def test_native_gt_build_matches_python_builder(rng):
    """tpukk_gt_build streams must be byte-identical to the Python plan
    builder across layouts and edge shapes (the fast path replaced a
    numpy pipeline; equivalence IS the spec)."""
    import os

    import scipy.sparse as sps

    from tpukk import native
    from tpukk.containers import CsrMatrix, generate_structured_laplacian
    from tpukk.sparse import spmv_pallas

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    def rand(n, deg, seed):
        r = np.repeat(np.arange(n), deg)
        c = np.random.default_rng(seed).integers(0, n, n * deg)
        v = np.random.default_rng(seed + 1).standard_normal(n * deg)
        sp = sps.csr_matrix((v.astype(np.float32), (r, c)), shape=(n, n))
        sp.sum_duplicates()
        return CsrMatrix.from_scipy(sp)

    def single_entry():
        return CsrMatrix.from_arrays(np.array([0, 1]), np.array([2]),
                                     np.array([3.0], np.float32),
                                     nrows=1, ncols=5)

    def empty_tail():
        # rows beyond the first block empty; rectangular
        rm = np.zeros(3000 + 1, np.int64)
        rm[1:200] = np.arange(1, 200)
        rm[200:] = 199
        ent = np.arange(199, dtype=np.int64) * 37 % 9000
        return CsrMatrix.from_arrays(rm, np.sort(ent) if False else ent,
                                     np.ones(199, np.float32),
                                     nrows=3000, ncols=9000)

    cases = [generate_structured_laplacian(50, 50, dtype=np.float32),
             rand(12000, 9, 3), single_entry(), empty_tail()]
    for A in cases:
        # python builder is fixed at 4-tile gi blocks: force the native one
        p_nat = spmv_pallas.GtSpmvPlan(A, force_group=4)
        os.environ["TPUKK_NO_NATIVE_GT"] = "1"
        try:
            p_py = spmv_pallas.GtSpmvPlan(A)
        finally:
            os.environ["TPUKK_NO_NATIVE_GT"] = "0"
        if p_py.layout not in ("gi4", "dlp"):
            continue  # python fell to a legacy layout: no equivalence claim
        assert p_nat.layout == p_py.layout
        assert p_nat.batch == p_py.batch
        for f in ("gt", "vals", "rhi", "src_ids", "dst_ss", "first_ss",
                  "cnt_ss", "lo"):
            a, b = np.asarray(getattr(p_nat, f)), np.asarray(getattr(p_py, f))
            assert a.shape == b.shape, (f, a.shape, b.shape)
            assert (a == b).all(), f
        # and the plan computes the right product (interpret kernel)
        x = rng.standard_normal(A.ncols).astype(np.float32)
        y = np.asarray(spmv_pallas.onehot_spmv(p_nat, x, interpret=True))
        ref = A.to_scipy() @ x
        tol = 40 * np.finfo(np.float32).eps * max(1, np.abs(ref).max()) * 8
        assert np.abs(y - ref).max() < tol


def test_onehot_spmm_dlp_interpret(rng):
    """Multi-RHS through a dlp-layout plan (interpret) — the gap that let a
    mis-gated fall-through reach a wrong-format legacy kernel on hardware
    (round 3: one bad pallas execution then wedges the whole process)."""
    import jax.numpy as jnp
    import scipy.sparse as sps

    from tpukk.containers import CsrMatrix
    from tpukk.sparse.spmv_pallas import GtSpmvPlan, onehot_spmm

    n, deg = 9000, 8
    r = np.repeat(np.arange(n), deg)
    c = np.random.default_rng(5).integers(0, n, n * deg)
    sp = sps.csr_matrix(
        (np.random.default_rng(6).standard_normal(n * deg).astype(np.float32),
         (r, c)), shape=(n, n))
    sp.sum_duplicates()
    A = CsrMatrix.from_scipy(sp)
    plan = GtSpmvPlan(A, force_dl=True)
    assert plan.layout == "dlp"
    X = rng.standard_normal((n, 3)).astype(np.float32)
    Y = np.asarray(onehot_spmm(plan, jnp.asarray(X), interpret=True))
    ref = sp @ X
    tol = 50 * np.finfo(np.float32).eps * np.abs(ref).max()
    assert np.abs(Y - ref).max() < tol


def test_onehot_spmm_gi4_wide_group_interpret(rng):
    """Multi-RHS through a gi4 plan with group != 4 (round-3 advisor high:
    such plans used to fall through to the legacy T-table batched kernel
    whose stream format does not match native gi4 plans — wrong results or
    a trace failure).  Must route per-column through onehot_spmv."""
    import jax.numpy as jnp

    from tpukk.containers.generators import generate_structured_laplacian
    from tpukk.sparse.spmv_pallas import GtSpmvPlan, onehot_spmm

    A = generate_structured_laplacian(60, 60, dtype=np.float32)
    plan = GtSpmvPlan(A, force_gi=True, force_group=16)
    assert plan.layout == "gi4" and plan.group == 16
    X = rng.standard_normal((A.ncols, 3)).astype(np.float32)
    Y = np.asarray(onehot_spmm(plan, jnp.asarray(X), interpret=True))
    ref = A.to_scipy() @ X
    tol = 50 * np.finfo(np.float32).eps * max(1.0, np.abs(ref).max())
    assert np.abs(Y - ref).max() < tol


def test_spmv_bf16_dia_route():
    """bf16 value planes through the banded DIA route: upcast once at plan
    time (measured negative result: in-kernel widening is 3.7x slower on
    v5e — see build_dia_pallas_plan), results match the f32 kernel exactly
    when values are bf16-representable."""
    import jax.numpy as jnp

    A = generate_structured_laplacian(60, 60, dtype=np.float32)
    Ab = A.with_values(A.values.astype(jnp.bfloat16))
    x = np.linspace(-1, 1, A.ncols).astype(np.float32)
    y32 = np.asarray(spmv(A, jnp.asarray(x)))
    yb = np.asarray(spmv(Ab, jnp.asarray(x))).astype(np.float32)
    np.testing.assert_allclose(yb, y32, rtol=1e-6, atol=1e-6)


def test_spmv_bf16_modes_and_coefficients():
    """bf16 scalar axis with alpha/beta/transpose — the bhalf ETI rows of
    the reference's Test_Sparse_spmv.hpp."""
    import jax.numpy as jnp

    A = generate_random_csr(150, 120, 5, seed=8, dtype=np.float32)
    Ab = A.with_values(A.values.astype(jnp.bfloat16))
    x = np.linspace(-1, 1, A.ncols).astype(np.float32)
    y0 = np.linspace(1, 2, A.nrows).astype(np.float32)
    got = np.asarray(spmv(Ab, jnp.asarray(x), alpha=2.0, beta=-0.5,
                          y=jnp.asarray(y0))).astype(np.float32)
    spq = A.to_scipy().copy()
    spq.data = np.asarray(spq.data.astype(np.float32)
                          .astype(jnp.bfloat16)).astype(np.float32)
    Abf = np.asarray(spq.todense())
    ref = 2.0 * (Abf @ x) - 0.5 * y0
    assert np.abs(got - ref).max() <= 2e-2 * np.abs(ref).max()
    xt = np.linspace(-1, 1, A.nrows).astype(np.float32)
    gt = np.asarray(spmv(Ab, jnp.asarray(xt), mode="T")).astype(np.float32)
    reft = Abf.T @ xt
    assert np.abs(gt - reft).max() <= 2e-2 * np.abs(reft).max()


def test_rcm_reorder_route():
    """RCM-reorder SpMV route (round-5: the structure-exploiting reorder of
    KokkosSparse_spmv_impl.hpp:221-377's heuristics): exact vs scipy both
    through the public matvec (permutes folded) and the permuted-space
    interface solvers use."""
    import jax.numpy as jnp
    from tpukk.containers import generate_fem2d_csr, CsrMatrix
    from tpukk.sparse.spmv import SpmvHandle
    from tpukk.sparse.spmv_impl import SpmvAlgorithm

    A = CsrMatrix.from_scipy(
        generate_fem2d_csr(800, seed=3).to_scipy().astype(np.float32))
    h = SpmvHandle(A, SpmvAlgorithm.RCM)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.ncols).astype(np.float32)
    ref = A.to_scipy() @ x
    y = np.asarray(h.matvec(jnp.asarray(x)))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    ph, to_p, from_p = h.rcm_permuted()
    yp = np.asarray(from_p(ph.matvec(to_p(jnp.asarray(x)))))
    assert np.abs(yp - ref).max() / np.abs(ref).max() < 1e-5
    # the reordered matrix really is banded-ized (bandwidth shrinks)
    sp = A.to_scipy().tocsr()
    bw = lambda s: int(np.abs(np.repeat(np.arange(s.shape[0]),
                                        np.diff(s.indptr))
                              - s.indices).max())
    assert bw(ph.A.to_scipy().tocsr()) < bw(sp) // 2
