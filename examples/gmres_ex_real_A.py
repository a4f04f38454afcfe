"""GMRES example — parity with example/gmres/ex_real_A.cpp:26-113 (read/build
a matrix, solve with restarted GMRES, then with an ILU(0) preconditioner) and
example/gmres/test_prec.cpp."""
import numpy as np

from tpukk.containers import generate_diag_dominant_csr
from tpukk.sparse import (
    GmresHandle,
    LUPrec,
    SpilukHandle,
    gmres,
    spiluk_numeric,
    spiluk_symbolic,
)


def main():
    A = generate_diag_dominant_csr(400, 8, dtype=np.float64, seed=1)
    b = np.ones(A.nrows)

    h = GmresHandle(m=25, tol=1e-8, max_restarts=40)
    x, stats = gmres(h, A, b)
    print(f"plain GMRES: converged={stats.converged} iters={stats.num_iters} "
          f"rel_res={stats.end_rel_res:.2e}")

    kh = SpilukHandle(fill_level=0)
    spiluk_symbolic(kh, A)
    L, U = spiluk_numeric(kh, A)
    h2 = GmresHandle(m=25, tol=1e-8, max_restarts=40)
    x2, stats2 = gmres(h2, A, b, prec=LUPrec(L, U))
    print(f"ILU(0)-GMRES: converged={stats2.converged} iters={stats2.num_iters} "
          f"rel_res={stats2.end_rel_res:.2e}")
    assert stats2.num_iters <= stats.num_iters


if __name__ == "__main__":
    main()
