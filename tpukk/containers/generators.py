"""Matrix generators — analogs of
sparse/src/KokkosSparse_IOUtils.hpp:229 (kk_generate_diagonally_dominant_sparse_matrix),
:333 (kk_generate_sparse_matrix), and the structured FD/FE stencil generators in
test_common/KokkosKernels_Test_Structured_Matrix.hpp (1D/2D/3D Laplacians used
by the structured SpMV perf tests and BASELINE config 1).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from .csr import CsrMatrix

__all__ = [
    "generate_structured_laplacian",
    "generate_random_csr",
    "generate_diag_dominant_csr",
    "generate_banded_csr",
    "generate_fem2d_csr",
    "generate_random_bsr",
]


def generate_structured_laplacian(nx: int, ny: int = 1, nz: int = 1, dtype=np.float32) -> CsrMatrix:
    """FD Laplacian on an nx(×ny(×nz)) grid with Dirichlet boundaries —
    5-point stencil in 2D, 7-point in 3D, 3-point in 1D
    (cf. KokkosKernels_Test_Structured_Matrix.hpp stencil modes)."""
    def lap1d(n):
        return sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n), format="csr")

    eye = sps.identity
    if ny == 1 and nz == 1:
        A = lap1d(nx)
    elif nz == 1:
        A = sps.kron(eye(ny), lap1d(nx)) + sps.kron(lap1d(ny), eye(nx))
    else:
        A = (
            sps.kron(eye(nz), sps.kron(eye(ny), lap1d(nx)))
            + sps.kron(eye(nz), sps.kron(lap1d(ny), eye(nx)))
            + sps.kron(lap1d(nz), sps.kron(eye(ny), eye(nx)))
        )
    A = A.tocsr().astype(dtype)
    A.sort_indices()
    return CsrMatrix.from_scipy(A)


def generate_random_csr(nrows: int, ncols: int, nnz_per_row: int, dtype=np.float32,
                        seed: int = 0, sorted_cols: bool = True) -> CsrMatrix:
    """Random CSR with ~nnz_per_row entries per row
    (cf. kk_generate_sparse_matrix, KokkosSparse_IOUtils.hpp:333)."""
    rng = np.random.default_rng(seed)
    rows = []
    cols = []
    for i in range(nrows):
        k = min(ncols, max(1, int(rng.integers(max(1, nnz_per_row // 2), nnz_per_row * 2))))
        c = rng.choice(ncols, size=k, replace=False)
        rows.append(np.full(k, i))
        cols.append(c)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(len(rows)).astype(dtype)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(nrows, ncols)).tocsr()
    if sorted_cols:
        A.sort_indices()
    return CsrMatrix.from_scipy(A)


def generate_diag_dominant_csr(n: int, nnz_per_row: int, dtype=np.float32, seed: int = 0) -> CsrMatrix:
    """Diagonally dominant random CSR for solver tests
    (cf. kk_generate_diagonally_dominant_sparse_matrix, IOUtils.hpp:229)."""
    A = generate_random_csr(n, n, nnz_per_row, dtype=np.float64, seed=seed).to_scipy().tolil()
    A.setdiag(0.0)
    A = A.tocsr()
    rowsum = np.abs(A).sum(axis=1).A1 if hasattr(np.abs(A).sum(axis=1), "A1") else np.asarray(np.abs(A).sum(axis=1)).ravel()
    A = A + sps.diags(rowsum + 1.0)
    A = A.tocsr().astype(dtype)
    A.sort_indices()
    return CsrMatrix.from_scipy(A)


def generate_banded_csr(n: int, bandwidth: int, dtype=np.float32, seed: int = 0) -> CsrMatrix:
    rng = np.random.default_rng(seed)
    diags = []
    offsets = list(range(-bandwidth, bandwidth + 1))
    for k in offsets:
        diags.append(rng.standard_normal(n - abs(k)))
    A = sps.diags(diags, offsets, shape=(n, n), format="csr").astype(dtype)
    A.sort_indices()
    return CsrMatrix.from_scipy(A)


def generate_fem2d_csr(n_nodes: int, dtype=np.float64, seed: int = 0) -> CsrMatrix:
    """P1 finite-element stiffness matrix on an UNSTRUCTURED 2-D Delaunay
    triangulation of random points — the stand-in for the SuiteSparse-style
    real-world inputs the reference's perf tests consume from .mtx files
    (perf_test/sparse/KokkosSparse_spgemm.cpp, example/gmres/ex_real_A.cpp:36).

    Unlike the structured generators, the sparsity pattern here is genuinely
    irregular: node numbering is random (no banded structure), vertex degrees
    vary 3..12+, and the matrix is symmetric positive semi-definite with
    heterogeneous entries (cotangent weights).  `data/fem2d_*.mtx.gz` fixtures
    are produced from this generator (scripts/make_fixtures.py) and consumed
    through `io.read_mtx`, exercising the MatrixMarket path end-to-end."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((n_nodes, 2))
    tri = Delaunay(pts)
    t = tri.simplices  # (ntri, 3)
    # per-triangle P1 stiffness: K_ij = (grad phi_i . grad phi_j) * area
    p0, p1, p2 = pts[t[:, 0]], pts[t[:, 1]], pts[t[:, 2]]
    # edge vectors opposite each vertex
    e0 = p2 - p1
    e1 = p0 - p2
    e2 = p1 - p0
    cross = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * np.abs(cross)
    area = np.maximum(area, 1e-14)
    E = np.stack([e0, e1, e2], axis=1)               # (ntri, 3, 2)
    K = np.einsum("tid,tjd->tij", E, E) / (4.0 * area)[:, None, None]
    rows = np.repeat(t, 3, axis=1).reshape(-1)       # i index
    cols = np.tile(t, (1, 3)).reshape(-1)            # j index
    vals = K.reshape(-1)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(n_nodes, n_nodes)).tocsr()
    A.sum_duplicates()
    # small diagonal shift makes it SPD (usable by the solver benches too)
    A = A + 1e-3 * sps.identity(n_nodes, format="csr")
    A.sort_indices()
    return CsrMatrix.from_scipy(A, value_dtype=dtype)


def generate_random_bsr(n_block_rows: int, n_block_cols: int, block_size: int,
                        blocks_per_row: int, dtype=np.float32, seed: int = 0):
    """Random BSR matrix with dense (b,b) blocks — analog of the BSR
    overload of kk_generate_sparse_matrix
    (sparse/src/KokkosSparse_IOUtils.hpp:383-399, which generates a scalar
    CRS and re-blocks it).  The block pattern is a random CSR pattern at
    block granularity; every stored block is fully dense."""
    from .bsr import BsrMatrix

    rng = np.random.default_rng(seed)
    bpr = min(blocks_per_row, n_block_cols)
    cols = np.concatenate([
        np.sort(rng.choice(n_block_cols, size=bpr, replace=False))
        for _ in range(n_block_rows)]) if n_block_rows else np.empty(0, int)
    row_map = np.arange(n_block_rows + 1, dtype=np.int32) * bpr
    nnzb = n_block_rows * bpr
    vals = rng.standard_normal((nnzb, block_size, block_size)).astype(dtype)
    import jax.numpy as jnp

    return BsrMatrix(jnp.asarray(row_map), jnp.asarray(cols.astype(np.int32)),
                     jnp.asarray(vals),
                     n_block_rows * block_size, n_block_cols * block_size,
                     block_size)
