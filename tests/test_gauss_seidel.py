"""GS tests — error must decrease per sweep (the reference's oracle,
Test_Sparse_gauss_seidel.hpp) and POINT must match a sequential GS sweep
ordering-equivalence (colored GS = exact GS in the permuted order)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpukk.containers import generate_diag_dominant_csr, generate_structured_laplacian
from tpukk.sparse.gauss_seidel import (
    GsAlgorithm,
    GsHandle,
    gauss_seidel_apply,
    gauss_seidel_numeric,
    gauss_seidel_symbolic,
)


def _setup(A, algo, omega=1.0):
    h = GsHandle(algo)
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, omega=omega)
    return h


@pytest.mark.parametrize("algo", [GsAlgorithm.POINT, GsAlgorithm.TWOSTAGE])
def test_error_decreases(algo, rng):
    A = generate_structured_laplacian(20, 20, dtype=np.float64)
    # make strictly diagonally dominant so GS converges fast
    sp = A.to_scipy()
    sp.setdiag(sp.diagonal() + 1.0)
    from tpukk.containers import CsrMatrix

    A = CsrMatrix.from_scipy(sp.tocsr())
    x_true = rng.standard_normal(A.nrows)
    b = sp @ x_true
    h = _setup(A, algo)
    x = None
    errs = []
    for _ in range(6):
        x = gauss_seidel_apply(h, A, x, b, num_sweeps=1, direction="symmetric")
        errs.append(np.linalg.norm(np.asarray(x) - x_true))
    errs = np.array(errs)
    assert np.all(errs[1:] < errs[:-1])
    assert errs[-1] < errs[0] * 0.1


def test_point_exact_on_diag_dominant(rng):
    """Colored GS equals sequential GS in the color-permuted row order —
    verify a forward sweep against an explicit sequential sweep in that order."""
    A = generate_diag_dominant_csr(50, 4, dtype=np.float64, seed=9)
    h = _setup(A, GsAlgorithm.POINT)
    b = rng.standard_normal(A.nrows)
    x0 = rng.standard_normal(A.nrows)
    got = np.asarray(gauss_seidel_apply(h, A, x0.copy(), b, 1, "forward"))
    # sequential reference in permuted order
    sp = A.to_scipy()
    order = h.order
    x = x0.copy()
    for r in order:
        diag = float(sp[r, r])
        off = float((sp.getrow(r) @ x).item()) - diag * x[r]
        x[r] = (b[r] - off) / diag
    np.testing.assert_allclose(got, x, rtol=1e-12, atol=1e-12)


def test_directions(rng):
    A = generate_diag_dominant_csr(40, 4, dtype=np.float64, seed=3)
    h = _setup(A, GsAlgorithm.POINT)
    b = rng.standard_normal(A.nrows)
    for d in ["forward", "backward", "symmetric"]:
        x = gauss_seidel_apply(h, A, None, b, 3, d)
        r = np.linalg.norm(A.to_scipy() @ np.asarray(x) - b)
        assert r < np.linalg.norm(b)


def test_sor_omega(rng):
    A = generate_structured_laplacian(15, 15, dtype=np.float64)
    sp = A.to_scipy()
    sp.setdiag(sp.diagonal() + 0.5)
    from tpukk.containers import CsrMatrix

    A = CsrMatrix.from_scipy(sp.tocsr())
    b = rng.standard_normal(A.nrows)
    h1 = _setup(A, GsAlgorithm.POINT, omega=1.0)
    x1 = gauss_seidel_apply(h1, A, None, b, 5)
    h2 = _setup(A, GsAlgorithm.POINT, omega=1.2)
    x2 = gauss_seidel_apply(h2, A, None, b, 5)
    # both reduce residual; omega path exercised
    for x in (x1, x2):
        assert np.linalg.norm(sp @ np.asarray(x) - b) < 0.5 * np.linalg.norm(b)


def test_cluster_gs_error_decreases(rng):
    from tpukk.sparse.gauss_seidel import ClusteringAlgorithm

    A = generate_structured_laplacian(16, 16, dtype=np.float64)
    sp = A.to_scipy()
    sp.setdiag(sp.diagonal() + 1.0)
    from tpukk.containers import CsrMatrix

    A = CsrMatrix.from_scipy(sp.tocsr())
    x_true = rng.standard_normal(A.nrows)
    b = sp @ x_true
    for clustering in [ClusteringAlgorithm.MIS2, ClusteringAlgorithm.BALLOON]:
        h = GsHandle(GsAlgorithm.CLUSTER, clustering=clustering)
        gauss_seidel_symbolic(h, A)
        gauss_seidel_numeric(h, A)
        x = None
        errs = []
        for _ in range(5):
            x = gauss_seidel_apply(h, A, x, b, 1, "symmetric")
            errs.append(np.linalg.norm(np.asarray(x) - x_true))
        assert all(bb < aa for aa, bb in zip(errs, errs[1:])), clustering
        assert errs[-1] < 0.2 * errs[0]


def test_point_onehot_block_path_matches_ell(rng, monkeypatch):
    """The one-hot color-block fast path must produce the same sweep as the
    ELL gather path (covers the TPU-only route in interpret mode)."""
    import dataclasses
    import functools

    import jax.numpy as jnp
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import GsHandle, gauss_seidel_numeric, gauss_seidel_symbolic
    from tpukk.sparse import gauss_seidel as gsmod
    from tpukk.sparse import spmv_pallas

    monkeypatch.setattr(gsmod, "_OH_MIN_NNZ", 1)
    monkeypatch.setattr(spmv_pallas, "supports_pallas", lambda: True)
    orig = spmv_pallas.onehot_spmv
    monkeypatch.setattr(spmv_pallas, "onehot_spmv",
                        functools.partial(orig, interpret=True))

    A = generate_structured_laplacian(30, 25, dtype=np.float32)
    h = GsHandle()
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, omega=0.9)
    assert all(b.oh_plan is not None for b in h.blocks)
    b = jnp.asarray(rng.standard_normal(A.nrows).astype(np.float32))
    x0 = jnp.zeros(A.nrows, jnp.float32)
    x1 = gsmod._point_half_sweep(h, x0, b, True)
    h.blocks = [dataclasses.replace(blk, oh_plan=None) for blk in h.blocks]
    x2 = gsmod._point_half_sweep(h, x0, b, True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=2e-6, atol=2e-6)


def test_multivector_apply(rng):
    """Rank-2 apply sweeps each column like per-column rank-1 applies
    (the reference's batched multi-vector GS apply)."""
    import jax.numpy as jnp

    from tpukk.containers import generate_diag_dominant_csr
    from tpukk.sparse.gauss_seidel import (GsHandle, gauss_seidel_apply,
                                           gauss_seidel_numeric,
                                           gauss_seidel_symbolic)

    from tpukk.sparse.gauss_seidel import GsAlgorithm

    A = generate_diag_dominant_csr(60, 5, dtype=np.float64, seed=11)
    for alg in [GsAlgorithm.POINT, GsAlgorithm.CLUSTER, GsAlgorithm.TWOSTAGE]:
        h = GsHandle(algorithm=alg)
        gauss_seidel_symbolic(h, A)
        gauss_seidel_numeric(h, A)
        B = rng.standard_normal((A.nrows, 3))
        X2 = np.asarray(gauss_seidel_apply(h, A, None, jnp.asarray(B),
                                           num_sweeps=2))
        for j in range(3):
            xj = np.asarray(gauss_seidel_apply(
                h, A, None, jnp.asarray(B[:, j]), num_sweeps=2))
            np.testing.assert_allclose(X2[:, j], xj, rtol=1e-12, atol=1e-12)
        # warm-start (x given) path batches too
        X0 = rng.standard_normal((A.nrows, 3))
        X3 = np.asarray(gauss_seidel_apply(h, A, jnp.asarray(X0),
                                           jnp.asarray(B), num_sweeps=1))
        x30 = np.asarray(gauss_seidel_apply(h, A, jnp.asarray(X0[:, 0]),
                                            jnp.asarray(B[:, 0]),
                                            num_sweeps=1))
        np.testing.assert_allclose(X3[:, 0], x30, rtol=1e-12, atol=1e-12)


def test_block_gauss_seidel_bsr(rng):
    import jax.numpy as jnp
    """Block (BSR) GS — analog of Test_Sparse_block_gauss_seidel: error must
    decrease every symmetric sweep on a diag-dominant block matrix."""
    import scipy.sparse as sps

    from tpukk.containers import BsrMatrix, generate_structured_laplacian
    from tpukk.sparse import (GsHandle, gauss_seidel_apply,
                              gauss_seidel_numeric, gauss_seidel_symbolic)

    Ac = generate_structured_laplacian(10, 10, dtype=np.float64).to_scipy()
    bs = 3
    Ab = (sps.kron(Ac, np.eye(bs))
          + sps.kron(sps.eye(Ac.shape[0]), 0.3 * np.ones((bs, bs)) + bs * np.eye(bs)))
    A = BsrMatrix.from_scipy_bsr(sps.bsr_matrix(Ab, blocksize=(bs, bs)))
    xstar = rng.standard_normal(Ab.shape[0])
    b = jnp.asarray(Ab @ xstar)

    h = GsHandle()
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, omega=1.0)
    x = None
    errs = []
    for _ in range(5):
        x = gauss_seidel_apply(h, A, x, b, num_sweeps=1, direction="symmetric")
        errs.append(float(np.linalg.norm(np.asarray(x) - xstar)))
    assert all(errs[i + 1] < errs[i] for i in range(len(errs) - 1)), errs
    assert errs[-1] < 0.05 * errs[0]


def test_twostage_compact_form():
    """compact_form (twostage_gauss_seidel_impl.hpp:120): complement-matrix
    rhs, no full-A residual SpMV.  With many inner sweeps both forms
    converge to classical GS, and at omega=1 with an (effectively) exact
    inner solve they coincide."""
    from tpukk.sparse.gauss_seidel import (GsAlgorithm, GsHandle,
                                           gauss_seidel_apply,
                                           gauss_seidel_numeric,
                                           gauss_seidel_symbolic)

    A = generate_diag_dominant_csr(60, 4, dtype=np.float64, seed=9)
    rng = np.random.default_rng(9)
    b = rng.standard_normal(60)
    xs = {}
    for compact in (False, True):
        h = GsHandle(algorithm=GsAlgorithm.TWOSTAGE, inner_sweeps=60,
                     compact_form=compact)
        gauss_seidel_symbolic(h, A)
        gauss_seidel_numeric(h, A)
        x = gauss_seidel_apply(h, A, None, jnp.asarray(b), num_sweeps=3,
                               direction="forward")
        xs[compact] = np.asarray(x)
    np.testing.assert_allclose(xs[True], xs[False], rtol=1e-8, atol=1e-10)
    # and it actually reduces the residual
    r = A.to_scipy() @ xs[True] - b
    assert np.linalg.norm(r) < 0.5 * np.linalg.norm(b)


def test_point_apply_permuted_space():
    """permuted=True contract (round 5): chained smoother applications stay
    in the handle's color-permuted space; converting once outside matches
    the natural-space result."""
    from tpukk.common import permute_via_sort

    A = generate_diag_dominant_csr(80, 4, dtype=np.float64, seed=3)
    h = GsHandle()
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(80))
    x_nat = np.asarray(gauss_seidel_apply(h, A, None, b, 3, "symmetric"))
    inv = jnp.asarray(h.inv_order)
    bp = permute_via_sort(b, inv)
    xp = gauss_seidel_apply(h, A, jnp.zeros_like(b), bp, 3, "symmetric",
                            permuted=True)
    x_back = np.asarray(permute_via_sort(xp, jnp.asarray(h.order)))
    np.testing.assert_allclose(x_back, x_nat, rtol=1e-12, atol=1e-12)
