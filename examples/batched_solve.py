"""Batched-solve example — parity with example/batched_solve/ (serial
getrs/pttrs/pbtrs solves + team GMRES on many small systems)."""
import numpy as np

from tpukk.batched import BatchedCrsMatrix, JacobiPrec, batched_cg, batched_gmres
from tpukk.batched import dense as bd
from tpukk.containers import generate_diag_dominant_csr


def main():
    rng = np.random.default_rng(0)
    B, n = 64, 16
    A = rng.standard_normal((B, n, n)) + n * np.eye(n)
    b = rng.standard_normal((B, n))

    lu, piv, _ = bd.getrf(A)
    x = bd.getrs(lu, piv, b)
    r = np.linalg.norm(np.einsum("bij,bj->bi", A, np.asarray(x)) - b)
    print(f"getrf/getrs: residual = {r:.2e}")

    d = rng.random((B, n)) + 2
    e = rng.random((B, n - 1)) * 0.5
    dd, l = bd.pttrf(d, e)
    xt = bd.pttrs(dd, l, b)
    print("pttrf/pttrs: solved tridiagonal batch, x[0,0] =", float(np.asarray(xt)[0, 0]))

    S = A @ np.swapaxes(A, 1, 2) / n + n * np.eye(n)
    Lc = bd.pbtrf(S)
    xs = bd.pbtrs(Lc, b)
    print("pbtrf/pbtrs: residual =",
          f"{np.linalg.norm(np.einsum('bij,bj->bi', S, np.asarray(xs)) - b):.2e}")

    # batched Krylov on shared-sparsity systems
    A0 = generate_diag_dominant_csr(40, 4, dtype=np.float64, seed=2)
    vals = np.stack([np.asarray(A0.values) * (1 + 0.05 * k) for k in range(8)])
    Ab = BatchedCrsMatrix.from_csr(A0, vals)
    rhs = rng.standard_normal((8, 40))
    xg, res = batched_gmres(Ab, rhs, restart=20, max_restarts=3)
    print(f"team GMRES: max residual = {float(np.max(np.asarray(res))):.2e}")


if __name__ == "__main__":
    main()
