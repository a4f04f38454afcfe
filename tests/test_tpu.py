"""Real-TPU (Mosaic-lowered, non-interpret) kernel correctness — the analog
of the reference's per-backend test executables
(sparse/unit_test/backends/Test_Cuda_Sparse.cpp): every Pallas kernel family
gets at least one correctness assertion on actual hardware.

Run with:  TPUKK_TPU_TESTS=1 python -m pytest tests -m tpu -q

Interpret mode cannot stand in for these: XLA:CPU keeps excess precision
across f32 ops, which breaks the compensated (two_sum) arithmetic of the
double-single f64 kernel, and Mosaic lowering itself (dynamic_gather,
DMA windows, scf branches) is only exercised on the chip."""
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")


def _require_tpu():
    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")


@pytest.fixture(scope="module")
def rngm():
    return np.random.default_rng(7)


def test_dia_f32_on_tpu(rngm):
    _require_tpu()
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle

    A = generate_structured_laplacian(200, 200, dtype=np.float32)
    h = SpmvHandle(A, SpmvAlgorithm.DIA)
    x = rngm.standard_normal(A.ncols).astype(np.float32)
    y = np.asarray(h(x))
    ref = A.to_scipy() @ x
    assert np.abs(y - ref).max() < 20 * np.finfo(np.float32).eps * np.abs(ref).max() * 8


def test_dia_ds_f64_on_tpu(rngm):
    """Double-single f64 DIA kernel: ~1e-13 relative (48-bit repr bound)."""
    _require_tpu()
    from tpukk.containers import generate_banded_csr
    from tpukk.sparse import spmv_impl
    from tpukk.sparse.spmv_pallas import DiaDsPlan, dia_spmv_ds

    A = generate_banded_csr(200_000, 3, dtype=np.float64, seed=3)
    plan = DiaDsPlan(spmv_impl.build_dia_plan(A))
    x = rngm.standard_normal(A.ncols)
    y = np.asarray(dia_spmv_ds(plan, x))
    ref = A.to_scipy() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 5e-13, rel


def test_onehot_gt_gi_on_tpu(rngm):
    """v7 gather-table kernels, both layouts, Mosaic-lowered."""
    _require_tpu()
    import jax.numpy as jnp

    from tpukk.containers import generate_random_csr, generate_structured_laplacian
    from tpukk.sparse.spmv_pallas import GtSpmvPlan, onehot_spmm, onehot_spmv

    for A in (generate_structured_laplacian(120, 120, dtype=np.float32),
              generate_random_csr(30_000, 30_000, 8, seed=5, dtype=np.float32)):
        plan = GtSpmvPlan(A)
        x = rngm.standard_normal(A.ncols).astype(np.float32)
        y = np.asarray(onehot_spmv(plan, jnp.asarray(x)))
        ref = A.to_scipy() @ x
        tol = 50 * np.finfo(np.float32).eps * np.abs(ref).max()
        assert np.abs(y - ref).max() < tol, plan.layout
        X = rngm.standard_normal((A.ncols, 3)).astype(np.float32)
        Y = np.asarray(onehot_spmm(plan, jnp.asarray(X)))
        assert np.abs(Y - A.to_scipy() @ X).max() < tol, plan.layout


def test_sptrsv_fused_on_tpu(rngm):
    _require_tpu()
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse.sptrsv import SptrsvAlgorithm, SptrsvHandle, sptrsv_solve, sptrsv_symbolic
    import scipy.sparse as sps
    from tpukk.containers import CsrMatrix

    A = generate_structured_laplacian(60, 60, dtype=np.float32)
    sp = sps.tril(A.to_scipy()).tocsr()
    sp.sort_indices()
    L = CsrMatrix.from_scipy(sp)
    h = SptrsvHandle(lower=True)
    sptrsv_symbolic(h, L)
    b = rngm.standard_normal(L.nrows).astype(np.float32)
    x = np.asarray(sptrsv_solve(h, L, b))
    r = sp @ x - b
    assert np.abs(r).max() < 1e-3 * np.abs(b).max()


def test_pcg_solve_on_tpu():
    _require_tpu()
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse.pcg import pcg

    A = generate_structured_laplacian(100, 100, dtype=np.float32)
    b = np.ones(A.nrows, np.float32)
    x, stats = pcg(A, b, tol=1e-5, max_iters=800)
    r = b - A.to_scipy() @ np.asarray(x)
    assert np.linalg.norm(r) < 1e-4 * np.linalg.norm(b)
