"""Supernodal sparse triangular solve — the SUPERNODAL_* SpTRSV capability
(cf. reference example usage of sptrsv_supernode.hpp with SuperLU factors).
Here the supernode partition is detected from the factor pattern itself and
each dependency level runs as one batched dense triangular_solve + panel
matvec on the MXU."""
import numpy as np
import scipy.sparse as sps

from tpukk.containers import CsrMatrix
from tpukk.sparse import (SptrsvAlgorithm, SptrsvHandle, sptrsv_solve,
                          sptrsv_symbolic)


def blocked_lower_factor(n, bs, seed=0):
    """A supernodal-looking lower factor: dense diagonal blocks + shared
    below-diagonal row panels (the shape SuperLU/CHOLMOD factors have)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for k in range(n // bs):
        s = k * bs
        for i in range(bs):
            for j in range(i + 1):
                rows.append(s + i)
                cols.append(s + j)
                vals.append(rng.standard_normal() + (5.0 if i == j else 0.0))
        below = np.arange(s + bs, n)
        if len(below):
            for r in rng.choice(below, size=min(4, len(below)), replace=False):
                for j in range(bs):
                    rows.append(int(r))
                    cols.append(s + j)
                    vals.append(0.3 * rng.standard_normal())
    T = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
    T.sum_duplicates()
    T.sort_indices()
    return T


def main():
    T = blocked_lower_factor(256, 16)
    L = CsrMatrix.from_scipy(T.astype(np.float32))

    h = SptrsvHandle(lower=True, algorithm=SptrsvAlgorithm.SUPERNODAL)
    sptrsv_symbolic(h, L)
    print(f"supernodes: {h.sn_plan.num_supernodes} "
          f"(max block {h.sn_plan.max_block}), levels: {h.num_levels}")

    b = np.random.default_rng(1).standard_normal(L.nrows).astype(np.float32)
    x = np.asarray(sptrsv_solve(h, L, b))
    resid = np.abs(T @ x - b).max() / np.abs(b).max()
    print(f"relative residual: {resid:.2e}")
    assert resid < 1e-4


if __name__ == "__main__":
    main()
