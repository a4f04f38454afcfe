"""Banded SpGEMM: C = A·B as an offset convolution of diagonals — the
structured fast path (tpukk/sparse/spgemm_dia.py).  For banded operands with
full diagonals AUTO routes here with the exact structural pattern; otherwise
opt in with SpgemmAlgorithm.DIA to get the clipped-band pattern (a superset
that may carry explicit zeros)."""
import numpy as np

from tpukk.containers import generate_banded_csr, generate_structured_laplacian
from tpukk.sparse import (SpgemmAlgorithm, SpgemmHandle, spgemm_numeric,
                          spgemm_symbolic)


def main():
    # exact case: full-diagonal band -> AUTO uses the DIA path
    A = generate_banded_csr(2000, 3, dtype=np.float64, seed=0)
    h = SpgemmHandle()
    spgemm_symbolic(h, A, A)
    assert h.dia_plan is not None, "AUTO should route full bands to DIA"
    C = spgemm_numeric(h, A, A)
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    print(f"banded A·A: nnz={C.nnz} (scipy {ref.nnz}), "
          f"max err {abs(C.to_scipy() - ref).max():.2e}")

    # opt-in band pattern for a stencil matrix with diagonal holes
    L = generate_structured_laplacian(40, 40, dtype=np.float64)
    h2 = SpgemmHandle(SpgemmAlgorithm.DIA)
    spgemm_symbolic(h2, L, L)
    C2 = spgemm_numeric(h2, L, L)
    ref2 = (L.to_scipy() @ L.to_scipy()).toarray()
    err = np.abs(C2.to_scipy().toarray() - ref2).max()
    print(f"laplacian A·A (clipped band): nnz={C2.nnz}, dense err {err:.2e}")


if __name__ == "__main__":
    main()
