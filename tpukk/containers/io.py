"""Matrix IO — analogs of MatrixMarket read/write
(sparse/src/KokkosSparse_IOUtils.hpp:632-876) and raw binary view dump/restore
(common/src/KokkosKernels_IOUtils.hpp:135-248).  The binary path uses .npz
(the TPU-side serialization format), plus sharded save/restore helpers for
partitioned matrices (SURVEY.md §5.4).
"""
from __future__ import annotations

import numpy as np

from .csr import CsrMatrix

__all__ = ["read_mtx", "write_mtx", "save_csr_npz", "load_csr_npz"]


def read_mtx(path, value_dtype=None) -> CsrMatrix:
    import scipy.io as sio

    sp = sio.mmread(str(path)).tocsr()
    sp.sort_indices()
    return CsrMatrix.from_scipy(sp, value_dtype=value_dtype)


def write_mtx(path, csr: CsrMatrix):
    import scipy.io as sio

    sio.mmwrite(str(path), csr.to_scipy())


def save_csr_npz(path, csr: CsrMatrix):
    np.savez_compressed(
        str(path),
        row_map=np.asarray(csr.row_map),
        entries=np.asarray(csr.entries),
        values=np.asarray(csr.values),
        shape=np.asarray(csr.shape),
    )


def load_csr_npz(path) -> CsrMatrix:
    with np.load(str(path)) as z:
        return CsrMatrix.from_arrays(
            z["row_map"], z["entries"], z["values"],
            nrows=int(z["shape"][0]), ncols=int(z["shape"][1]),
        )
