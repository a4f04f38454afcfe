#!/usr/bin/env python
"""Headline + full honest benchmark record (BASELINE.md configs).

Prints ONE JSON line PER FAMILY — unfavorable numbers included (unstructured
SpMV, scattered SpGEMM, f64) — with the flagship structured-SpMV line LAST so
tail-line parsers keep the headline.  The whole record is also written to
BENCH_FULL.json.

Methodology: chained data-dependent iterations inside one jit, timed at two
chain lengths, per-iter = slope (tpukk.common.timing.chain_time_slope) — the
relay dispatch latency (1-30 ms) cancels exactly.  Bytes counted are the
reference's useful-CSR formula (perf_test/sparse/KokkosSparse_spmv.cpp:94-106)
regardless of the algorithm's actual layout.
"""
import json
import sys
import time
import traceback

import numpy as np

RESULTS = []


def peak_hbm_gbps(kind: str) -> float:
    table = {
        "v5 lite": 819.0,   # TPU v5e nominal (measured streaming 966-1008:
        "v5litepod": 819.0,  # boost clocks; keep nominal for vs_baseline)
        "v4": 1228.0,
        "v5p": 2765.0,
        "v6e": 1640.0,
        "cpu": 50.0,
    }
    for k, v in table.items():
        if k in kind.lower():
            return v
    return 819.0


def emit(metric, value, unit, vs_baseline, **extra):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit,
           "vs_baseline": round(float(vs_baseline), 3), "extra": extra}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    return rec


def family(fn):
    """Run one benchmark family, never let it kill the record."""
    try:
        fn()
    except Exception:
        print(json.dumps({"metric": f"{fn.__name__}_failed",
                          "value": 0, "unit": "error", "vs_baseline": 0,
                          "extra": {"err": traceback.format_exc(limit=2)}}),
              flush=True)


def csr_bytes(A, itemsize):
    return (A.nnz * (itemsize + 4) + (A.nrows + 1) * 4
            + (A.ncols + A.nrows) * itemsize)


def _chain_onehot(plan, A, k1=50, k2=250):
    import jax
    import jax.numpy as jnp

    from tpukk.common.timing import chain_time_slope
    from tpukk.sparse.spmv_pallas import onehot_spmv

    rng = np.random.default_rng(0)
    x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(np.float32))
    n = min(A.nrows, A.ncols)

    def mk(K):
        def step(c, _):
            y = onehot_spmv(plan, c)
            return (jnp.zeros(A.ncols, jnp.float32).at[:n].set(y[:n] * 0.125),
                    None)
        return jax.jit(lambda p, x: jax.lax.scan(step, x, None, length=K)[0])

    return chain_time_slope(mk, (plan, x0), k1=k1, k2=k2, reps=5)


def bench_spmv_unstructured():
    """Unstructured SpMV through the v7/v8 gather-table kernels — the honest
    non-DIA record (VERDICT r1: publish the unfavorable cases)."""
    import jax

    from tpukk.containers import (generate_random_csr,
                                  generate_structured_laplacian, read_mtx)
    from tpukk.sparse.spmv_pallas import build_onehot_spmv_plan

    kind = jax.devices()[0].device_kind
    target = 0.70 * peak_hbm_gbps(kind)
    cases = [
        ("spmv_rand100k_deg16_gnnz",
         generate_random_csr(100_000, 100_000, 16, seed=3, dtype=np.float32)),
        ("spmv_lap1000_csr_gnnz",
         generate_structured_laplacian(1000, 1000, dtype=np.float32)),
        ("spmv_fem2d30k_mtx_gnnz",
         read_mtx("data/fem2d_30k.mtx.gz", value_dtype=np.float32)),
    ]
    for name, A in cases:
        plan = build_onehot_spmv_plan(A)
        t = _chain_onehot(plan, A)
        gbps = csr_bytes(A, 4) / t / 1e9
        emit(name, A.nnz / t / 1e9, "Gnnz/s", gbps / target,
             gbps=round(gbps, 1), time_us=round(t * 1e6, 1),
             layout=getattr(plan, "layout", type(plan).__name__),
             pad=round(getattr(plan, "pad_ratio", 0), 2), nnz=A.nnz)


def bench_spmv_f64():
    """BASELINE config 1's scalar is double: the double-single (two-f32)
    DIA kernel vs the f64-bytes roofline (~1e-13 accuracy; exact XLA f64
    path remains available)."""
    import jax

    from tpukk.common.timing import chain_time_slope
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import spmv_impl
    from tpukk.sparse.spmv_pallas import (DiaDsPlan, dia_spmv_ds_planes,
                                          ds_split_f64)

    # NO jax_enable_x64: the ds API is x64-free by design (host numpy
    # split/combine; x64 on the axon relay wedged it in round-2 testing).
    # The chain carries the (hi, lo) f32 planes; scaling the planes keeps
    # the data dependence (chain accuracy is irrelevant to timing).
    A = generate_structured_laplacian(1000, 1000, dtype=np.float64)
    plan = DiaDsPlan(spmv_impl.build_dia_plan(A))
    rng = np.random.default_rng(0)
    xh, xl = ds_split_f64(rng.standard_normal(A.ncols) * 0.01)
    c0 = (jax.device_put(xh), jax.device_put(xl))

    def mk(K):
        def step(c, _):
            ys, ye = dia_spmv_ds_planes(plan, c[0], c[1])
            return (ys * 0.125, ye * 0.125), None
        return jax.jit(lambda p, c: jax.lax.scan(step, c, None, length=K)[0])

    t = chain_time_slope(mk, (plan, c0), k1=50, k2=250, reps=5)
    kind = jax.devices()[0].device_kind
    target = 0.70 * peak_hbm_gbps(kind)
    gbps = csr_bytes(A, 8) / t / 1e9
    emit("spmv_f64_ds_lap1000_gbps", gbps, "GB/s", gbps / target,
         time_us=round(t * 1e6, 1), gnnz=round(A.nnz / t / 1e9, 2),
         algorithm="dia_double_single", accuracy="~1e-13 rel")

    # unstructured f64: the gi4-locked double-single gather kernel
    from tpukk.containers import generate_random_csr
    from tpukk.sparse.spmv_pallas import (build_onehot_ds_plan,
                                          onehot_spmv_ds_planes)

    Ar = generate_random_csr(100_000, 100_000, 16, seed=3, dtype=np.float64)
    pr = build_onehot_ds_plan(Ar)
    if pr is not None:
        xh, xl = ds_split_f64(rng.standard_normal(Ar.ncols) * 0.01)
        c0 = (jax.device_put(xh), jax.device_put(xl))

        def mkr(K):
            def step(c, _):
                ys, ye = onehot_spmv_ds_planes(pr, c[0], c[1])
                return (ys * 0.125, ye * 0.125), None
            return jax.jit(lambda p, c: jax.lax.scan(step, c, None,
                                                     length=K)[0])

        tr = chain_time_slope(mkr, (pr, c0), k1=20, k2=100, reps=4)
        gbps_r = csr_bytes(Ar, 8) / tr / 1e9
        emit("spmv_f64_ds_rand100k_gbps", gbps_r, "GB/s", gbps_r / target,
             time_us=round(tr * 1e6, 1),
             gnnz=round(Ar.nnz / tr / 1e9, 2),
             algorithm="onehot_gi4_double_single",
             pad=round(pr.base.real_pad_ratio, 2))


def bench_spgemm():
    """SpGEMM A·A: structured (gt pair kernel), scattered-random, and the
    real-matrix .mtx input (BASELINE config 3)."""
    import jax

    from tpukk.common.timing import chain_time_slope
    from tpukk.containers import (generate_random_csr,
                                  generate_structured_laplacian, read_mtx)
    from tpukk.sparse import SpgemmHandle, spgemm_numeric, spgemm_symbolic
    from tpukk.sparse import spgemm_pallas
    from tpukk.sparse.spgemm import _numeric_pairs

    cases = [
        ("spgemm_lap300_aa_gpair",
         generate_structured_laplacian(300, 300, dtype=np.float32)),
        ("spgemm_rand50k_deg8_aa_gpair",
         generate_random_csr(50_000, 50_000, 8, seed=3, dtype=np.float32)),
        ("spgemm_fem2d30k_mtx_aa_gpair",
         read_mtx("data/fem2d_30k.mtx.gz", value_dtype=np.float32)),
    ]
    for name, A in cases:
        h = SpgemmHandle()
        t0 = time.perf_counter()
        spgemm_symbolic(h, A, A)
        t_sym = time.perf_counter() - t0
        C = spgemm_numeric(h, A, A)
        jax.block_until_ready(C.values)
        npairs = int(np.asarray(h.pair_plan.a_idx).shape[0])
        plan = h.onehot_plan
        if isinstance(plan, spgemm_pallas.SortPairPlan):
            path, fast = "sort_pair", True
            numeric = lambda v: spgemm_pallas.sort_pair_numeric(plan, v, v)
        elif plan not in (None, False):
            path, fast = "onehot_pair", True
            numeric = lambda v: spgemm_pallas.onehot_pair_numeric(plan, v, v)
        else:
            path, fast = "xla_pairs", False
            numeric = lambda v: _numeric_pairs(h.pair_plan, v, v)

        def mk(k):
            def body(i, v):
                out = numeric(v)
                return v * 0.5 + out[: v.shape[0]] * 1e-20
            return jax.jit(lambda v: jax.lax.fori_loop(0, k, body, v))

        k1 = 20 if fast else 3
        t = chain_time_slope(mk, (A.values,), k1=k1, k2=5 * k1, reps=4)
        emit(name, npairs / t / 1e9, "Gpair/s", npairs / t / 1e9 / 1.0,
             numeric_us=round(t * 1e6, 1), symbolic_s=round(t_sym, 2),
             path=path, pairs=npairs, nnz_c=h.nnz_c)


def bench_sptrsv():
    """Fused whole-solve sptrsv kernel (entire level chain in one kernel)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    from tpukk.common.timing import chain_time_slope
    from tpukk.containers import CsrMatrix, generate_structured_laplacian
    from tpukk.sparse.sptrsv import SptrsvHandle, sptrsv_solve, sptrsv_symbolic

    A = generate_structured_laplacian(300, 300, dtype=np.float32)
    sp = sps.tril(A.to_scipy()).tocsr()
    sp.sort_indices()
    L = CsrMatrix.from_scipy(sp)
    h = SptrsvHandle(lower=True)
    sptrsv_symbolic(h, L)
    b0 = jax.device_put(np.ones(L.nrows, np.float32))

    def mk(K):
        def step(c, _):
            x = sptrsv_solve(h, L, c)
            return x * 0.5 + c * 0.5, None
        return jax.jit(lambda x: jax.lax.scan(step, x, None, length=K)[0])

    t = chain_time_slope(mk, (b0,), k1=20, k2=100, reps=4)
    emit("sptrsv_fused_lap300_us", t * 1e6, "us", 1.0,
         levels=int(h.num_levels), gnnz=round(L.nnz / t / 1e9, 2))


def bench_solvers():
    """Solver-level per-iteration costs (pcg+twostage GS, gmres+ILU-jacobi)."""
    import jax

    from tpukk.common.timing import chain_time_slope
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse.gauss_seidel import (GsAlgorithm, GsHandle,
                                           gauss_seidel_numeric,
                                           gauss_seidel_symbolic)
    from tpukk.sparse.pcg import pcg_initial_state, pcg_iteration_body
    from tpukk.sparse.preconditioner import GsPrec
    from tpukk.sparse.spmv import SpmvHandle

    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    Ah = SpmvHandle(A)
    gh = GsHandle(GsAlgorithm.TWOSTAGE)
    gauss_seidel_symbolic(gh, A)
    gauss_seidel_numeric(gh, A)
    prec = GsPrec(gh, A, sweeps=1)
    b = np.ones(A.nrows, np.float32)
    x0 = np.zeros(A.nrows, np.float32)
    body = pcg_iteration_body(Ah, prec)
    st = pcg_initial_state(Ah, prec, jax.device_put(b), jax.device_put(x0))

    def mk(K):
        return jax.jit(lambda s: jax.lax.scan(body, s, None, length=K)[0])

    t = chain_time_slope(mk, (st,), k1=50, k2=250, reps=4)
    emit("pcg_twostage_iter_us", t * 1e6, "us", 1.0, n=A.nrows, nnz=A.nnz)


def bench_graph():
    """Device D1 coloring (graph/perf_test KokkosGraph_color.cpp metric:
    color time + #colors).  One-shot wall time is host-plan-bound on TPU
    (the gather-table plan build); the device rounds are reported
    separately via a 10-deep pipeline (the relay adds 1-30ms latency to
    any single dispatch, which would otherwise dominate the number)."""
    from tpukk.containers import generate_structured_laplacian
    from tpukk.graph import coloring as col
    from tpukk.graph.coloring import ColoringAlgorithm, graph_color

    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    graph_color(A, ColoringAlgorithm.VB)  # warm the jit
    t0 = time.perf_counter()
    colors = graph_color(A, ColoringAlgorithm.VB)
    t = time.perf_counter() - t0
    rm, ent, nrows = col._adjacency(A)
    cols_ell = col._ell_pad(rm, ent, nrows)
    gp = col._vb_gather_plan(cols_ell, nrows)
    t_dev = None
    if gp is not None:
        plan, nbr_beats = gp
        w = cols_ell.shape[1]
        run = lambda: col._vb_run_plan(plan, nbr_beats, n=nrows, w=w,
                                       max_colors=128, max_rounds=64)
        np.asarray(run())
        t0 = time.perf_counter()
        rs = [run() for _ in range(10)]
        np.asarray(rs[-1])
        t_dev = (time.perf_counter() - t0) / 10
    emit("graph_color_lap400_ms", t * 1e3, "ms", 1.0,
         colors=int(colors.max()), n=A.nrows,
         device_rounds_ms=round(t_dev * 1e3, 2) if t_dev else None,
         note="one-shot incl. host plan build; device_rounds_ms = "
              "pipelined device-only resolve")


def bench_flagship():
    """Flagship: structured SpMV, DIA pallas kernel (BASELINE config 1
    metric/bytes model) — printed LAST."""
    import jax
    import jax.numpy as jnp

    from tpukk.common.timing import chain_time_slope
    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle
    from tpukk.sparse import spmv_pallas

    dtype = np.float32
    A = generate_structured_laplacian(1000, 1000, dtype=dtype)
    h = SpmvHandle(A, SpmvAlgorithm.AUTO)
    rng = np.random.default_rng(0)
    use_pallas = (h.algorithm == SpmvAlgorithm.DIA
                  and spmv_pallas.supports_pallas())
    if use_pallas:
        plan = h._plan("dia_pallas")
        x0 = jax.device_put(
            (rng.standard_normal(plan.n_pad + plan.W) * 0.01).astype(dtype))

        def body(plan, c):
            y = spmv_pallas._dia_call(c, *plan.dlist, offsets=plan.offsets,
                                      chunk=plan.chunk, interpret=False)
            return jnp.pad(y * 0.125, (0, plan.W))

        def mk(K):
            return jax.jit(lambda plan, x: jax.lax.scan(
                lambda c, _: (body(plan, c), None), x, None, length=K)[0])

        args = (plan, x0)
        algo = "dia_pallas"
    else:
        from tpukk.sparse import spmv_impl

        plan = h._plan("dia")
        x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(dtype))

        def mk(K):
            return jax.jit(lambda p, x: jax.lax.scan(
                lambda c, _: (spmv_impl.apply_dia(p, c) * 0.125, None),
                x, None, length=K)[0])

        args = (plan, x0)
        algo = h.algorithm.value
    best = chain_time_slope(mk, args, k1=200, k2=1200, reps=6)
    kind = jax.devices()[0].device_kind
    target = 0.70 * peak_hbm_gbps(kind)
    gbps = csr_bytes(A, np.dtype(dtype).itemsize) / best / 1e9
    emit("spmv_laplacian_gbps", gbps, "GB/s", gbps / target,
         algorithm=algo, gflops=round(2.0 * A.nnz / best / 1e9, 2),
         time_us=round(best * 1e6, 1), nnz=A.nnz, device=kind,
         peak_hbm_gbps=peak_hbm_gbps(kind), timing="slope k1=200 k2=1200")


def main():
    t_start = time.time()
    for fn in (bench_spmv_unstructured, bench_spmv_f64, bench_spgemm,
               bench_sptrsv, bench_solvers, bench_graph):
        family(fn)
    family(bench_flagship)  # LAST line = headline
    try:
        with open("BENCH_FULL.json", "w") as f:
            json.dump({"wall_s": round(time.time() - t_start, 1),
                       "results": RESULTS}, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    sys.exit(main())
