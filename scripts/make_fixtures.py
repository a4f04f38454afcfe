#!/usr/bin/env python
"""Produce the committed real-matrix fixtures (data/*.mtx.gz) from the
deterministic FEM generator — the repo's stand-in for SuiteSparse downloads
(this environment has no network egress).  Re-run if the generator changes."""
import gzip
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.io as sio

from tpukk.containers.generators import generate_fem2d_csr

HERE = os.path.join(os.path.dirname(__file__), "..", "data")


def write_gz(path, csr):
    buf = io.BytesIO()
    sio.mmwrite(buf, csr.to_scipy(), precision=8)
    with gzip.open(path, "wb", compresslevel=9) as f:
        f.write(buf.getvalue())


def main():
    os.makedirs(HERE, exist_ok=True)
    for n, name in ((3000, "fem2d_small"), (30000, "fem2d_30k")):
        A = generate_fem2d_csr(n, seed=1)
        p = os.path.join(HERE, f"{name}.mtx.gz")
        write_gz(p, A)
        print(name, A.nrows, A.nnz, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
