#!/usr/bin/env python
"""Headline benchmark — SpMV bandwidth on the 2D 1000x1000 structured
Laplacian (BASELINE.md config 1; metric methodology of
perf_test/sparse/KokkosSparse_spmv.cpp:94-106).

Prints ONE JSON line:
  {"metric": "spmv_laplacian_gbps", "value": GB/s, "unit": "GB/s",
   "vs_baseline": value / (0.7 * peak_hbm)}

Bytes counted are the *useful* CSR bytes of the reference formula
(values + col idx + row map + x + y), independent of the algorithm's actual
layout — so padding/streaming overheads hurt the reported number, exactly as
the reference counts.  vs_baseline >= 1.0 means the BASELINE target
(>=70% of HBM roofline) is met.
"""
import json
import sys
import time

import numpy as np


def peak_hbm_gbps() -> float:
    """Best-known peak HBM bandwidth per chip for the attached device."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 819.0,   # TPU v5e
        "v5litepod": 819.0,
        "v4": 1228.0,
        "v5p": 2765.0,
        "v6e": 1640.0,
        "cpu": 50.0,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819.0


def main():
    import jax

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle

    n_side = 1000
    dtype = np.float32  # f64 is emulated on TPU; reference ETI default axis includes f32
    A = generate_structured_laplacian(n_side, n_side, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(A.ncols).astype(dtype))

    h = SpmvHandle(A, SpmvAlgorithm.AUTO)
    f = jax.jit(h.matvec)
    y = f(x)
    y.block_until_ready()  # compile + warm

    reps = 50
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(x)
        y.block_until_ready()
        times.append((time.perf_counter() - t0) / reps)
    t = min(times)

    itemsize = np.dtype(dtype).itemsize
    useful_bytes = (
        A.nnz * (itemsize + 4)        # values + col idx
        + (A.nrows + 1) * 4           # row map
        + (A.ncols + A.nrows) * itemsize  # x + y
    )
    gbps = useful_bytes / t / 1e9
    gflops = 2.0 * A.nnz / t / 1e9
    target = 0.70 * peak_hbm_gbps()
    print(json.dumps({
        "metric": "spmv_laplacian_gbps",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 3),
        "extra": {
            "algorithm": h.algorithm.value,
            "gflops": round(gflops, 2),
            "time_us": round(t * 1e6, 1),
            "nnz": A.nnz,
            "device": str(jax.devices()[0]),
            "peak_hbm_gbps": peak_hbm_gbps(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
