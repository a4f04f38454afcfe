"""Relay-robust device timing.

The attached TPU is reached through a relay whose per-call latency is large
and variable (~1-30 ms), and `block_until_ready` can return before execution
completes.  Two consequences for anything that wants a kernel time:

* sync by FETCHING BYTES (a 1-element device->host read), never by
  `block_until_ready`;
* even then, `total_time / K` over one K-iteration chained jit carries a
  `latency / K` additive bias (tens of us at K=500 — larger than many
  kernels).  The unbiased estimator is the SLOPE: time the same chained
  computation at two lengths K1 < K2 and divide the difference by (K2 - K1);
  the latency term cancels.

`chain_time_slope` is the one true timer; bench.py / bench_suite.py and all
perf notes use it.  (Role analog: the rep-loop timing discipline of the
reference's perf_test CLIs, perf_test/sparse/KokkosSparse_spmv.cpp:94-106,
which never needed this because CUDA events are cheap and local.)
"""
from __future__ import annotations

import time

import numpy as np

__all__ = ["sync_fetch", "chain_time_slope"]


def sync_fetch(y) -> float:
    """Force completion of `y`'s computation by reading one real element."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(np.asarray(jnp.ravel(leaf)[:1].astype(jnp.float32))[0])


def chain_time_slope(mk_run, args, k1: int = 200, k2: int = 1200,
                     reps: int = 6) -> float:
    """Per-iteration seconds of a chained computation, latency-cancelled.

    mk_run(K) must return a compiled callable running K chained iterations
    of the workload; per-iter = (best_t(K2) - best_t(K1)) / (K2 - K1).
    """
    def measure(ka, kb):
        f1, f2 = mk_run(ka), mk_run(kb)
        sync_fetch(f1(*args))
        sync_fetch(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync_fetch(f1(*args))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync_fetch(f2(*args))
            b2 = min(b2, time.perf_counter() - t0)
        return b1, b2

    b1, b2 = measure(k1, k2)
    # the relay's per-dispatch latency is 1-30 ms and VARIABLE: when the
    # chain-length delta doesn't clear that noise floor the slope collapses
    # to ~0 (observed round 3: 'spmv at 209942 Gnnz/s').  Retry with 4x
    # chains; final fallback = the biased-but-bounded b2/k2.
    for _ in range(2):
        if (b2 - b1) >= max(0.10 * b2, 0.003):
            break
        k1, k2 = 4 * k1, 4 * k2
        b1, b2 = measure(k1, k2)
    if (b2 - b1) <= 0:
        return b2 / k2
    return (b2 - b1) / (k2 - k1)
