#!/usr/bin/env python
"""Headline benchmark — SpMV bandwidth on the 2D 1000x1000 structured
Laplacian (BASELINE.md config 1; metric methodology of
perf_test/sparse/KokkosSparse_spmv.cpp:94-106).

Prints ONE JSON line:
  {"metric": "spmv_laplacian_gbps", "value": GB/s, "unit": "GB/s",
   "vs_baseline": value / (0.7 * peak_hbm)}

Bytes counted are the *useful* CSR bytes of the reference formula
(values + col idx + row map + x + y), independent of the algorithm's actual
layout — padding/streaming overheads hurt the reported number exactly as the
reference counts.  vs_baseline >= 1.0 means the BASELINE target (>=70% of
HBM roofline) is met.

Methodology note: the attached TPU is reached through a relay with a large,
variable per-dispatch latency (1-30 ms), so per-call wall timing is
meaningless.  We time data-dependent SpMVs chained inside ONE jit
(power-iteration style: x <- A x / 8) at two chain lengths and take the
SLOPE (tpukk.common.timing.chain_time_slope) — the latency term cancels
exactly instead of leaving a latency/K bias of tens of us.
"""
import json
import sys
import time

import numpy as np


def peak_hbm_gbps(kind: str) -> float:
    table = {
        "v5 lite": 819.0,   # TPU v5e
        "v5litepod": 819.0,
        "v4": 1228.0,
        "v5p": 2765.0,
        "v6e": 1640.0,
        "cpu": 50.0,
    }
    for k, v in table.items():
        if k in kind.lower():
            return v
    return 819.0


def main():
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle
    from tpukk.sparse import spmv_pallas

    n_side = 1000
    dtype = np.float32
    A = generate_structured_laplacian(n_side, n_side, dtype=dtype)
    h = SpmvHandle(A, SpmvAlgorithm.AUTO)
    rng = np.random.default_rng(0)

    from tpukk.common.timing import chain_time_slope

    use_pallas = h.algorithm == SpmvAlgorithm.DIA and spmv_pallas.supports_pallas()
    if use_pallas:
        plan = h._plan("dia_pallas")
        T = plan.n_pad + plan.W
        x0 = jax.device_put((rng.standard_normal(T) * 0.01).astype(dtype))

        def body(plan, c):
            y = spmv_pallas._dia_call(
                c, *plan.dlist, offsets=plan.offsets, chunk=plan.chunk, interpret=False)
            return jnp.pad(y * 0.125, (0, plan.W))

        def mk(K):
            return jax.jit(lambda plan, x: jax.lax.scan(
                lambda c, _: (body(plan, c), None), x, None, length=K)[0])

        args = (plan, x0)
        algo_name = "dia_pallas"
    else:
        from tpukk.sparse import spmv_impl

        plan = h._plan("ell") if h.algorithm == SpmvAlgorithm.ELL else h._plan("dia")
        apply_fn = (spmv_impl.apply_ell if h.algorithm == SpmvAlgorithm.ELL
                    else spmv_impl.apply_dia)
        x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(dtype))

        def mk(K):
            return jax.jit(lambda plan, x: jax.lax.scan(
                lambda c, _: (apply_fn(plan, c) * 0.125, None), x, None, length=K)[0])

        args = (plan, x0)
        algo_name = h.algorithm.value

    best = chain_time_slope(mk, args, k1=200, k2=1200, reps=6)

    itemsize = np.dtype(dtype).itemsize
    useful_bytes = (
        A.nnz * (itemsize + 4)
        + (A.nrows + 1) * 4
        + (A.ncols + A.nrows) * itemsize
    )
    gbps = useful_bytes / best / 1e9
    kind = jax.devices()[0].device_kind
    target = 0.70 * peak_hbm_gbps(kind)
    print(json.dumps({
        "metric": "spmv_laplacian_gbps",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 3),
        "extra": {
            "algorithm": algo_name,
            "gflops": round(2.0 * A.nnz / best / 1e9, 2),
            "time_us": round(best * 1e6, 1),
            "nnz": A.nnz,
            "device": kind,
            "peak_hbm_gbps": peak_hbm_gbps(kind),
            "timing": "slope k1=200 k2=1200",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
