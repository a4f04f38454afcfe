import numpy as np
import pytest
import scipy.sparse as sps

from tpukk.containers import (
    CooMatrix,
    CsrMatrix,
    bsr2crs,
    ccs2crs,
    coo2crs,
    crs2bsr,
    crs2ccs,
    crs2coo,
    generate_diag_dominant_csr,
    generate_random_csr,
    generate_structured_laplacian,
    is_sorted,
    load_csr_npz,
    read_mtx,
    remove_zeros,
    save_csr_npz,
    sort_crs,
    transpose,
    write_mtx,
)


def random_scipy(m, n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    A = sps.random(m, n, density=density, random_state=np.random.RandomState(seed), format="csr")
    A.sort_indices()
    return A


def test_csr_roundtrip():
    sp = random_scipy(40, 30)
    A = CsrMatrix.from_scipy(sp)
    assert A.shape == (40, 30)
    assert A.nnz == sp.nnz
    back = A.to_scipy()
    assert (back != sp).nnz == 0


def test_csr_from_dense():
    d = np.array([[1.0, 0, 2], [0, 0, 3], [4, 5, 0]])
    A = CsrMatrix.from_dense(d)
    np.testing.assert_allclose(np.asarray(A.to_dense()), d)


def test_laplacian_structure():
    A = generate_structured_laplacian(10, 10)
    sp = A.to_scipy()
    # 5-point stencil: interior rows have 5 entries, diag == 4
    assert sp.shape == (100, 100)
    assert np.allclose(sp.diagonal(), 4.0)
    assert (sp.sum(axis=1).max()) <= 4.0 + 1e-6  # rows sum <= boundary leakage


def test_conversions_roundtrip():
    sp = random_scipy(50, 50, 0.08)
    A = CsrMatrix.from_scipy(sp)
    assert (crs2coo(A).to_scipy().tocsr() != sp).nnz == 0
    assert (coo2crs(CooMatrix.from_scipy(sp)).to_scipy() != sp).nnz == 0
    assert (ccs2crs(crs2ccs(A)).to_scipy() != sp).nnz == 0


def test_bsr_roundtrip():
    A = generate_structured_laplacian(64)
    B = crs2bsr(A, 4)
    assert B.block_size == 4
    assert (bsr2crs(B, prune_zeros=True).to_scipy() != A.to_scipy()).nnz == 0


def test_transpose():
    sp = random_scipy(30, 50)
    At = transpose(CsrMatrix.from_scipy(sp))
    assert (At.to_scipy() != sp.T.tocsr()).nnz == 0


def test_sort_and_zeros():
    row = np.array([0, 0, 1, 1, 1])
    col = np.array([2, 0, 1, 0, 2])
    val = np.array([1.0, 2.0, 0.0, 3.0, 4.0])
    A = CsrMatrix.from_arrays(np.array([0, 2, 5]), col, val, ncols=3)
    assert not is_sorted(A)
    As = sort_crs(A)
    assert is_sorted(As)
    Az = remove_zeros(A)
    assert Az.nnz == 4


def test_io_roundtrip(tmp_path):
    A = generate_random_csr(20, 20, 3, seed=1)
    write_mtx(tmp_path / "a.mtx", A)
    B = read_mtx(tmp_path / "a.mtx", value_dtype=np.float32)
    assert np.abs((B.to_scipy() - A.to_scipy())).max() < 1e-6
    save_csr_npz(tmp_path / "a.npz", A)
    C = load_csr_npz(str(tmp_path / "a.npz") + ".npz" if not (tmp_path / "a.npz").exists() else tmp_path / "a.npz")
    assert (C.to_scipy() != A.to_scipy()).nnz == 0


def test_diag_dominant():
    A = generate_diag_dominant_csr(30, 4).to_scipy()
    d = np.abs(A.diagonal())
    off = np.abs(A).sum(axis=1)
    off = np.asarray(off).ravel() - d
    assert np.all(d >= off)


def test_pytree_flatten():
    import jax

    A = generate_structured_laplacian(8)
    leaves, treedef = jax.tree_util.tree_flatten(A)
    assert len(leaves) == 3
    B = jax.tree_util.tree_unflatten(treedef, leaves)
    assert B.shape == A.shape


def test_extract_diagonal_blocks(rng):
    from tpukk.containers import extract_diagonal_blocks, generate_diag_dominant_csr
    A = generate_diag_dominant_csr(90, 4, dtype=np.float64, seed=3)
    blocks = extract_diagonal_blocks(A, 4)
    assert len(blocks) == 4
    sp = A.to_scipy()
    sizes = [22, 22, 22, 24]
    r0 = 0
    for blk, sz in zip(blocks, sizes):
        assert blk.nrows == sz
        ref = sp[r0:r0 + sz, r0:r0 + sz].toarray()
        np.testing.assert_allclose(blk.to_scipy().toarray(), ref)
        r0 += sz


def test_sort_by_row_size():
    from tpukk.containers import CsrMatrix, sort_by_row_size
    import scipy.sparse as sps
    D = np.zeros((4, 4))
    D[0, :3] = 1; D[1, 0] = 1; D[2, :] = 1; D[3, :2] = 1
    A = CsrMatrix.from_scipy(sps.csr_matrix(D))
    perm = sort_by_row_size(A)               # descending
    assert list(perm) == [2, 0, 3, 1]
    perm_a = sort_by_row_size(A, ascending=True)
    assert list(perm_a) == [1, 3, 0, 2]


def test_symmetrize_pattern(rng):
    from tpukk.containers import generate_random_csr, symmetrize_pattern
    A = generate_random_csr(50, 50, 3, dtype=np.float64, seed=5)
    S = symmetrize_pattern(A)
    sp = S.to_scipy()
    np.testing.assert_allclose(sp.toarray(), sp.T.toarray())


def test_replace_sum_into_values(rng):
    """replaceValues / sumIntoValues parity (CrsMatrix.hpp:305-319; reference
    tests Test_Sparse_replaceSumInto*.hpp): absent coordinates are ignored."""
    from tpukk.containers import generate_random_csr

    A = generate_random_csr(40, 30, 4, seed=5, dtype=np.float64)
    S = A.to_scipy()
    rows = np.array([0, 2, 2, 17, 39, 5])
    cols = np.empty_like(rows)
    present = np.zeros(len(rows), bool)
    for i, r in enumerate(rows):
        seg = S.indices[S.indptr[r]:S.indptr[r + 1]]
        if i % 2 == 0 and len(seg):
            cols[i] = seg[i % len(seg)]
            present[i] = True
        else:
            cols[i] = next(c for c in range(30) if c not in seg)
    vals = np.arange(1.0, len(rows) + 1)
    for sorted_flag in (True, False):
        A2 = A.sum_into_values(rows, cols, vals, is_sorted=sorted_flag)
        ref = S.tolil(copy=True)
        for r, c, v, p in zip(rows, cols, vals, present):
            if p:
                ref[r, c] += v
        np.testing.assert_allclose(A2.to_scipy().toarray(), ref.toarray())
        A3 = A.replace_values(rows, cols, vals, is_sorted=sorted_flag)
        ref2 = S.tolil(copy=True)
        for r, c, v, p in zip(rows, cols, vals, present):
            if p:
                ref2[r, c] = v
        np.testing.assert_allclose(A3.to_scipy().toarray(), ref2.toarray())


class TestDetectBlockSize:
    """Pattern-aware block-size detection — contract of
    sparse/impl/KokkosSparse_crs_detect_block_size.hpp (every nonempty b*b
    block must be FULLY dense; largest such b wins)."""

    def test_truly_blocked(self):
        import scipy.sparse as sps
        from tpukk.containers import detect_block_size

        rng = np.random.default_rng(0)
        nb, b = 10, 4
        pat = sps.random(nb, nb, 0.4, random_state=1, format="csr")
        pat.data[:] = 1.0
        dense_blocks = sps.kron(pat, np.ones((b, b))).tocsr()
        A = CsrMatrix.from_scipy(dense_blocks.astype(np.float32))
        assert detect_block_size(A) == b

    def test_non_blocked_even_dims_returns_1(self):
        """The round-4 advisor case: even dimensions but scattered pattern
        must NOT report a block size > 1."""
        import scipy.sparse as sps
        from tpukk.containers import detect_block_size

        A = sps.random(64, 64, 0.05, random_state=2, format="csr")
        A.setdiag(1.0)
        A = CsrMatrix.from_scipy(A.tocsr().astype(np.float32))
        assert detect_block_size(A) == 1

    def test_multiple_factor(self):
        import scipy.sparse as sps
        from tpukk.containers import detect_block_size

        pat = sps.random(6, 6, 0.5, random_state=3, format="csr")
        pat.data[:] = 1.0
        A = CsrMatrix.from_scipy(
            sps.kron(pat, np.ones((6, 6))).tocsr().astype(np.float32))
        # blocks of 6 are dense; 2 and 3 divide 6 so they are dense too —
        # the LARGEST must be returned
        assert detect_block_size(A) == 6


def test_generate_random_bsr():
    """BSR random generator (IOUtils kk_generate_sparse_matrix BSR overload,
    sparse/src/KokkosSparse_IOUtils.hpp:383)."""
    from tpukk.containers import generate_random_bsr

    A = generate_random_bsr(12, 10, 3, 4, seed=5)
    assert A.shape == (36, 30)
    assert A.block_size == 3
    assert A.values.shape == (12 * 4, 3, 3)
    sp = A.to_scipy().tocsr()
    assert sp.shape == (36, 30)
    # block columns within range and sorted per row
    ent = np.asarray(A.entries).reshape(12, 4)
    assert (ent >= 0).all() and (ent < 10).all()
    assert (np.diff(ent, axis=1) > 0).all()
