"""Sparse wiki samples — parity with example/wiki/sparse/ (spmv, spadd,
spgemm, gauss_seidel, bsrmatrix)."""
import numpy as np

from tpukk.containers import crs2bsr, generate_structured_laplacian
from tpukk.sparse import (
    GsAlgorithm,
    GsHandle,
    gauss_seidel_apply,
    gauss_seidel_numeric,
    gauss_seidel_symbolic,
    spadd,
    spgemm,
    spmv,
)


def main():
    A = generate_structured_laplacian(32, 32, dtype=np.float32)
    x = np.ones(A.ncols, np.float32)

    y = spmv(A, x, alpha=1.0, beta=0.0)
    print("spmv:   ||A·1|| =", float(np.linalg.norm(np.asarray(y))))

    C = spadd(1.0, A, 1.0, A)
    print("spadd:  nnz(A+A) =", C.nnz)

    C2 = spgemm(A, A)
    print("spgemm: nnz(A·A) =", C2.nnz)

    B = crs2bsr(generate_structured_laplacian(64, dtype=np.float32), 4)
    yb = spmv(B, np.ones(B.ncols, np.float32))
    print("bsr spmv: ||B·1|| =", float(np.linalg.norm(np.asarray(yb))))

    sp = A.to_scipy()
    sp.setdiag(sp.diagonal() + 1.0)
    from tpukk.containers import CsrMatrix

    Add = CsrMatrix.from_scipy(sp.tocsr())
    h = GsHandle(GsAlgorithm.POINT)
    gauss_seidel_symbolic(h, Add)
    gauss_seidel_numeric(h, Add)
    b = np.ones(Add.nrows, np.float32)
    xs = gauss_seidel_apply(h, Add, None, b, num_sweeps=5)
    r = np.linalg.norm(sp @ np.asarray(xs) - b) / np.linalg.norm(b)
    print(f"gauss_seidel: rel residual after 5 sweeps = {r:.3e}")


if __name__ == "__main__":
    main()
