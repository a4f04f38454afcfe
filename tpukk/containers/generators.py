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
