#!/usr/bin/env python
"""Perf-test suite — the analog of perf_test/sparse CLIs (GB/s + GFlop/s
tables, perf_test/sparse/KokkosSparse_spmv.cpp:94-106 methodology) plus the
machine-keyed regression archive (test_common/Kokkos_Performance.hpp role).

Usage:
  python bench_suite.py [--size N] [--reps K] [--archive perf_archive.json]

All timings use the chained-in-jit methodology (see bench.py) to amortize
relay dispatch latency.
"""
import argparse
import json
import time

import numpy as np


def chain_time(mk, args, K, reps=5):
    """Latency-cancelled per-iteration time: mk(K) -> K-iteration chained jit;
    timed at K and 5K and differenced (tpukk.common.timing.chain_time_slope).
    The old total/K estimator carried a relay-latency/K bias of tens of us."""
    from tpukk.common.timing import chain_time_slope

    return chain_time_slope(mk, args, k1=K, k2=5 * K, reps=reps)


def bench_spmv(n_side, K):
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle
    from tpukk.sparse import spmv_impl, spmv_pallas

    A = generate_structured_laplacian(n_side, n_side, dtype=np.float32)
    h = SpmvHandle(A, SpmvAlgorithm.DIA)
    rng = np.random.default_rng(0)
    useful = A.nnz * 8 + (A.nrows + 1) * 4 + 2 * A.nrows * 4
    rows = {}

    if spmv_pallas.supports_pallas():
        plan = h._plan("dia_pallas")
        x0 = jax.device_put((rng.standard_normal(plan.n_pad + plan.W) * 0.01).astype(np.float32))

        def body(p, c):
            y = spmv_pallas._dia_call(c, *p.dlist, offsets=p.offsets, chunk=p.chunk,
                                      interpret=False)
            return jnp.pad(y * 0.125, (0, p.W))

        def mk(k):
            return jax.jit(lambda p, x: jax.lax.scan(
                lambda c, _: (body(p, c), None), x, None, length=k)[0])

        t = chain_time(mk, (plan, x0), K)
        rows["spmv_dia_pallas"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                       gflops=2 * A.nnz / t / 1e9)

    dplan = h._plan("dia")
    xn = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(np.float32))
    def mk2(k):
        return jax.jit(lambda p, x: jax.lax.scan(
            lambda c, _: (spmv_impl.apply_dia(p, c) * 0.125, None), x, None,
            length=k)[0])

    t = chain_time(mk2, (dplan, xn), max(10, K // 4))
    rows["spmv_dia_xla"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                gflops=2 * A.nnz / t / 1e9)

    eplan = h._plan("ell")
    def mk3(k):
        return jax.jit(lambda p, x: jax.lax.scan(
            lambda c, _: (spmv_impl.apply_ell(p, c) * 0.125, None), x, None,
            length=k)[0])

    # the ELL gather path is ~65 ms/iter on the 1M-row Laplacian; keep the
    # chain short (slope timing cancels latency regardless of K)
    t = chain_time(mk3, (eplan, xn), max(2, K // 100))
    rows["spmv_ell_xla"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                gflops=2 * A.nnz / t / 1e9)
    return rows, A


def bench_spmm(A, K, nrhs=8):
    import jax

    from tpukk.sparse import SpmvHandle, SpmvAlgorithm
    from tpukk.sparse import spmv_impl

    h = SpmvHandle(A, SpmvAlgorithm.DIA)
    plan = h._plan("dia")
    rng = np.random.default_rng(1)
    X = jax.device_put((rng.standard_normal((A.ncols, nrhs)) * 0.01).astype(np.float32))
    def mk(k):
        return jax.jit(lambda p, x: jax.lax.scan(
            lambda c, _: (spmv_impl.apply_dia(p, c) * 0.125, None), x, None,
            length=k)[0])

    t = chain_time(mk, (plan, X), K)
    useful = A.nnz * 8 + (A.nrows + 1) * 4 + 2 * A.nrows * 4 * nrhs
    return {"spmm_8rhs_dia": dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                  gflops=2 * A.nnz * nrhs / t / 1e9)}


def bench_blas(n, K):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    rows = {}
    x = jax.device_put(rng.standard_normal(n).astype(np.float32))
    def mk(k):
        return jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (c * 0.999 + 0.001, None), x, None, length=k)[0])

    t = chain_time(mk, (x,), K)
    rows["axpby_stream"] = dict(time_us=t * 1e6, gbps=2 * n * 4 / t / 1e9)

    m = 2048
    Am = jax.device_put(rng.standard_normal((m, m)).astype(np.float32) / m)
    def mk2(k):
        return jax.jit(lambda a: jax.lax.scan(
            lambda c, _: (jnp.dot(c, a, preferred_element_type=jnp.float32), None),
            jnp.eye(m, dtype=np.float32), None, length=k)[0])

    t2 = chain_time(mk2, (Am,), 32)
    rows["gemm_2048"] = dict(time_us=t2 * 1e6, tflops=2 * m ** 3 / t2 / 1e12)

    # dot (benchmarks/blas/blas1/KokkosBlas_dot_benchmark role): data-dependent
    # chain x <- x * (x·x normalized) keeps the reduction on the critical path
    def mk3(k):
        def f(x):
            def body(c, _):
                d = jnp.dot(c, c)
                return c * (0.999 + 1e-20 * d), None
            return jax.lax.scan(body, x, None, length=k)[0]
        return jax.jit(f)

    t3 = chain_time(mk3, (x,), K)
    rows["dot_16M"] = dict(time_us=t3 * 1e6, gbps=n * 4 / t3 / 1e9)

    # gemv 4096x4096 (benchmarks/blas/blas2 role)
    g = 4096
    Ag = jax.device_put(rng.standard_normal((g, g)).astype(np.float32) / g)
    xg = jax.device_put(rng.standard_normal(g).astype(np.float32))

    def mk4(k):
        return jax.jit(lambda a, v: jax.lax.scan(
            lambda c, _: (a @ c * 0.5 + v, None), v, None, length=k)[0])

    t4 = chain_time(mk4, (Ag, xg), K)
    rows["gemv_4096"] = dict(time_us=t4 * 1e6, gbps=g * g * 4 / t4 / 1e9,
                             gflops=2 * g * g / t4 / 1e9)
    return rows


def bench_spadd_spiluk(K):
    """SpADD numeric reuse (perf_test/sparse/KokkosSparse_spadd.cpp role) and
    SpILUK factor wall time per fill level (KokkosSparse_spiluk.cpp role)."""
    import jax

    from tpukk.containers import generate_diag_dominant_csr, generate_structured_laplacian
    from tpukk.sparse.spadd import SpaddHandle, spadd_numeric, spadd_symbolic
    from tpukk.sparse.spiluk import SpilukHandle, spiluk_numeric, spiluk_symbolic

    rows = {}
    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    sp = A.to_scipy()
    from tpukk.containers import CsrMatrix
    B = CsrMatrix.from_scipy((sp + sp.T * 0.5).tocsr().astype(np.float32))
    h = SpaddHandle(sorted_input=True)
    t0 = time.perf_counter()
    spadd_symbolic(h, A, B)
    t_sym = time.perf_counter() - t0
    C = spadd_numeric(h, 1.0, A, 2.0, B)
    jax.block_until_ready(C.values)

    def mk(k):
        def f(av):
            def body(i, v):
                out = spadd_numeric(h, 1.0,
                                    CsrMatrix.from_arrays(A.row_map, A.entries, v,
                                                          A.nrows, A.ncols),
                                    2.0, B)
                return v * 0.5 + out.values[: v.shape[0]] * 1e-20
            return jax.lax.fori_loop(0, k, body, av)
        return jax.jit(f)

    t = chain_time(mk, (A.values,), K)
    rows["spadd_400"] = dict(time_us=t * 1e6, symbolic_s=t_sym,
                             gnnz_s=(A.nnz + B.nnz) / t / 1e9)

    D = generate_diag_dominant_csr(50_000, 12, dtype=np.float32, seed=3)
    for k in (0, 1):
        hk = SpilukHandle(fill_level=k)
        t0 = time.perf_counter()
        nnz = spiluk_symbolic(hk, D)
        t_sym = time.perf_counter() - t0
        t0 = time.perf_counter()
        L, U = spiluk_numeric(hk, D)
        jax.block_until_ready(U.values)
        t_num = time.perf_counter() - t0
        rows[f"spiluk_k{k}_50k"] = dict(
            time_us=t_num * 1e6, symbolic_s=t_sym,
            gnnz_s=nnz / max(t_num, 1e-12) / 1e9)
    return rows


def bench_spmv_onehot(K):
    """Unstructured SpMV: the one-hot MXU kernel vs the XLA ELL gather path."""
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_random_csr
    from tpukk.sparse import spmv_pallas

    A = generate_random_csr(100000, 100000, 16, seed=1, dtype=np.float32)
    rows = {}
    if not spmv_pallas.supports_pallas():
        return rows, A
    plan = spmv_pallas.build_onehot_spmv_plan(A)
    rng = np.random.default_rng(3)
    x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(np.float32))
    def mk(k):
        return jax.jit(lambda p, x: jax.lax.scan(
            lambda c, _: (spmv_pallas.onehot_spmv(p, c) * 0.125, None), x, None,
            length=k)[0])

    t = chain_time(mk, (plan, x0), K)
    useful = A.nnz * 8 + (A.nrows + 1) * 4 + 2 * A.nrows * 4
    rows["spmv_onehot_rand100k"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                        gflops=2 * A.nnz / t / 1e9,
                                        gnnz_s=A.nnz / t / 1e9)
    return rows, A


def bench_gs_sweep(K):
    """Colored symmetric GS sweep (one-hot block path on TPU)."""
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import GsHandle, gauss_seidel_numeric, gauss_seidel_symbolic
    from tpukk.sparse.gauss_seidel import _point_half_sweep

    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    h = GsHandle()
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, omega=1.0)
    b = jax.device_put(np.random.default_rng(0).standard_normal(A.nrows).astype(np.float32))

    def mk(k):
        def f(x, b):
            def body(i, x):
                x = _point_half_sweep(h, x, b, True)
                return _point_half_sweep(h, x, b, False)
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f)

    t = chain_time(mk, (jnp.zeros(A.nrows, jnp.float32), b), K)
    return {"gs_sym_sweep_400": dict(time_us=t * 1e6,
                                     gnnz_s=2 * A.nnz / t / 1e9)}


def bench_spgemm_dia(K):
    """Banded offset-convolution SpGEMM numeric (values-refresh path)."""
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_banded_csr
    from tpukk.sparse import spgemm_dia

    A = generate_banded_csr(1_000_000, 3, dtype=np.float32, seed=2)
    plan = spgemm_dia.build_dia_spgemm_plan(A, A)
    if plan is None:
        return {}
    spgemm_dia.dia_spgemm_numeric(plan, A, A)
    fn = plan._jit_numeric
    ea, eb = plan.a_refresh._eplan, plan.b_refresh._eplan
    nnzA = A.nnz

    def mk(k):
        def f(v):
            def body(i, c):
                out = fn(c, c, ea, eb)
                return c * 0.5 + out[:nnzA] * 1e-20
            return jax.lax.fori_loop(0, k, body, v)
        return jax.jit(f)

    t = chain_time(mk, (A.values,), K)
    kA = len(plan.a_refresh.offsets)
    return {"spgemm_dia_banded1M": dict(time_us=t * 1e6,
                                        gnnz_s=nnzA * kA / t / 1e9)}


def bench_sptrsv(K):
    """Level-set vs supernodal triangular solve."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    from tpukk.containers import CsrMatrix, generate_structured_laplacian
    from tpukk.sparse import (SptrsvAlgorithm, SptrsvHandle, sptrsv_solve,
                              sptrsv_symbolic)

    A = generate_structured_laplacian(300, 300, dtype=np.float32)
    T = sps.tril(A.to_scipy()).tocsr()
    T.setdiag(np.abs(T.diagonal()) + 2.0)
    T.sort_indices()
    M = CsrMatrix.from_scipy(T.astype(np.float32))
    b = jax.device_put(np.random.default_rng(0).standard_normal(M.nrows).astype(np.float32))
    rows = {}
    for tag, algo in (("lvlsched", SptrsvAlgorithm.SEQLVLSCHD),
                      ("supernodal", SptrsvAlgorithm.SUPERNODAL)):
        h = SptrsvHandle(True, algorithm=algo)
        sptrsv_symbolic(h, M)
        def mk(k, h=h):
            return jax.jit(lambda bb: jax.lax.fori_loop(
                0, k, lambda i, x: sptrsv_solve(h, M, bb + 1e-20 * x), bb))

        t = chain_time(mk, (b,), K)
        rows[f"sptrsv_{tag}_300"] = dict(
            time_us=t * 1e6, gnnz_s=M.nnz / t / 1e9,
            levels=float(h.num_levels))
    return rows


def bench_solvers(K):
    """Solver-level rows — PCG + symmetric-GS preconditioner
    (perf_test/sparse/KokkosSparse_pcg.cpp) and restarted GMRES + ILU(0)
    LUPrec (perf_test/sparse gmres + example/gmres/test_prec).  Per-iteration
    time via chained-in-jit slope; iteration counts from a real tolerance
    solve so convergence behavior is also recorded."""
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvHandle
    from tpukk.sparse.gauss_seidel import GsHandle, gauss_seidel_numeric, gauss_seidel_symbolic
    from tpukk.sparse.gmres import GmresHandle, Ortho, _arnoldi_cycle, gmres
    from tpukk.sparse.pcg import pcg, pcg_initial_state, pcg_iteration_body
    from tpukk.sparse.preconditioner import GsPrec, LUPrec
    from tpukk.sparse.spiluk import SpilukHandle, spiluk_numeric, spiluk_symbolic

    rows = {}
    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    b = jax.device_put(
        np.random.default_rng(1).standard_normal(A.nrows).astype(np.float32))

    # --- PCG + symmetric GS ---
    gh = GsHandle()
    gauss_seidel_symbolic(gh, A)
    gauss_seidel_numeric(gh, A)
    prec = GsPrec(gh, A, sweeps=1)
    Ah = SpmvHandle(A)
    body = pcg_iteration_body(Ah, prec)
    state0 = jax.jit(lambda bb: pcg_initial_state(Ah, prec, bb, jnp.zeros_like(bb)))(b)

    def mk(k):
        return jax.jit(lambda st: jax.lax.scan(body, st, None, length=k)[0])

    t_it = chain_time(mk, (state0,), K)
    _, stats = pcg(Ah, b, tol=1e-6, max_iters=400, prec=prec, check_every=25)
    rows["pcg_gs_400"] = dict(
        time_us=t_it * 1e6, gnnz_s=A.nnz / t_it / 1e9,
        iters=float(stats.num_iters), solve_ms=stats.num_iters * t_it * 1e3)

    # --- PCG + two-stage GS (SpMV-built smoother: no permutations, the
    # whole apply rides the DIA pallas kernel on structured matrices) ---
    from tpukk.sparse.gauss_seidel import GsAlgorithm

    gh2 = GsHandle(algorithm=GsAlgorithm.TWOSTAGE, inner_sweeps=2)
    gauss_seidel_symbolic(gh2, A)
    gauss_seidel_numeric(gh2, A)
    prec2 = GsPrec(gh2, A, sweeps=1)
    body2 = pcg_iteration_body(Ah, prec2)
    state2 = jax.jit(lambda bb: pcg_initial_state(Ah, prec2, bb, jnp.zeros_like(bb)))(b)

    def mk2(k):
        return jax.jit(lambda st: jax.lax.scan(body2, st, None, length=k)[0])

    t2 = chain_time(mk2, (state2,), K)
    _, st2 = pcg(Ah, b, tol=1e-6, max_iters=400, prec=prec2, check_every=25)
    rows["pcg_gs2stage_400"] = dict(
        time_us=t2 * 1e6, gnnz_s=A.nnz / t2 / 1e9,
        iters=float(st2.num_iters), solve_ms=st2.num_iters * t2 * 1e3)

    # --- GMRES(30) + ILU(0) ---
    ih = SpilukHandle(fill_level=0)
    spiluk_symbolic(ih, A)
    L, U = spiluk_numeric(ih, A)
    lu = LUPrec(L, U)
    m = 30
    cyc = lambda xx, bb: _arnoldi_cycle(Ah, lu, bb, xx, m, Ortho.CGS2)[0]

    def mkg(k):
        return jax.jit(lambda xx, bb: jax.lax.fori_loop(
            0, k, lambda i, x: cyc(x, bb), xx))

    Kc = max(2, K // 10)
    t_cyc = chain_time(mkg, (jnp.zeros_like(b), b), Kc)
    ghd = GmresHandle(m=m, tol=1e-6, max_restarts=20)
    gmres(ghd, Ah, b, prec=lu)
    rows["gmres30_ilu0_400"] = dict(
        time_us=t_cyc / m * 1e6, gnnz_s=A.nnz / (t_cyc / m) / 1e9,
        iters=float(ghd.num_iters), solve_ms=ghd.num_iters * t_cyc / m * 1e3)

    # --- GMRES(30) + ILU(0) with inexact Jacobi-sweep triangular solves
    # (the apply is DIA SpMVs instead of two level-scheduled chains) ---
    lu2 = LUPrec(L, U, jacobi_sweeps=2)
    cyc2 = lambda xx, bb: _arnoldi_cycle(Ah, lu2, bb, xx, m, Ortho.CGS2)[0]

    def mkg2(k):
        return jax.jit(lambda xx, bb: jax.lax.fori_loop(
            0, k, lambda i, x: cyc2(x, bb), xx))

    t_cyc2 = chain_time(mkg2, (jnp.zeros_like(b), b), Kc)
    gh2d = GmresHandle(m=m, tol=1e-6, max_restarts=20)
    gmres(gh2d, Ah, b, prec=lu2)
    rows["gmres30_ilu0jac2_400"] = dict(
        time_us=t_cyc2 / m * 1e6, gnnz_s=A.nnz / (t_cyc2 / m) / 1e9,
        iters=float(gh2d.num_iters),
        solve_ms=gh2d.num_iters * t_cyc2 / m * 1e3)
    return rows


def bench_graph():
    """Graph rows — color time / #colors (perf_test/graph/KokkosGraph_color.cpp),
    D2 color, MIS-2, triangle counting (perf_test/graph/_triangle.cpp).
    These are one-shot symbolic-style phases (host planning + device
    iteration), so wall time of a single run is the honest metric."""
    from tpukk.containers import generate_diag_dominant_csr, generate_structured_laplacian
    from tpukk.graph.coloring import ColoringAlgorithm, graph_color, graph_color_d2
    from tpukk.graph.mis2 import graph_mis2
    from tpukk.graph.triangle import triangle_count

    rows = {}
    A = generate_structured_laplacian(400, 400, dtype=np.float32)
    graph_color(A, ColoringAlgorithm.VB)  # warm the jit cache (compile
    # through the remote tunnel is ~50s and is never part of the reference's
    # color-time metric; recoloring same-shaped graphs reuses the executable)
    t0 = time.perf_counter()
    colors = graph_color(A, ColoringAlgorithm.VB)
    t = time.perf_counter() - t0
    rows["color_vb_400"] = dict(time_us=t * 1e6, colors=float(colors.max()),
                                mnnz_s=A.nnz / t / 1e6)
    graph_color_d2(A, ColoringAlgorithm.VB)
    t0 = time.perf_counter()
    d2 = graph_color_d2(A, ColoringAlgorithm.VB)
    t = time.perf_counter() - t0
    rows["color_d2_400"] = dict(time_us=t * 1e6, colors=float(d2.max()))
    t0 = time.perf_counter()
    mis = graph_mis2(A)
    t = time.perf_counter() - t0
    rows["mis2_400"] = dict(time_us=t * 1e6, colors=float(len(mis)))
    R = generate_diag_dominant_csr(30_000, 16, dtype=np.float32, seed=7)
    Rs = R.to_scipy()
    Rsym = ((Rs + Rs.T) != 0).astype(np.float32).tocsr()
    from tpukk.containers import CsrMatrix
    G = CsrMatrix.from_scipy(Rsym)
    t0 = time.perf_counter()
    nt = triangle_count(G)
    t = time.perf_counter() - t0
    rows["triangle_30k"] = dict(time_us=t * 1e6, gnnz_s=G.nnz / t / 1e9,
                                colors=float(nt))
    return rows


def bench_spmv_bsr(K, b=8):
    """BSR SpMV via batched MXU block contraction
    (perf_test/sparse/KokkosSparse_spmv_bsr.cpp role): 2D Laplacian block
    graph, 8x8 blocks, 200k scalar rows."""
    import jax
    import scipy.sparse as sps

    from tpukk.containers import BsrMatrix, generate_structured_laplacian
    from tpukk.sparse import spmv_impl

    G = generate_structured_laplacian(158, 158, dtype=np.float32)  # ~25k block rows
    sp = G.to_scipy().tocsr()
    rng = np.random.default_rng(4)
    nb = sp.nnz
    blocks = (rng.standard_normal((nb, b, b)) * 0.05).astype(np.float32)
    bsr = sps.bsr_matrix((blocks, sp.indices, sp.indptr),
                         shape=(sp.shape[0] * b, sp.shape[1] * b))
    A = BsrMatrix.from_scipy_bsr(bsr)
    x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(np.float32))
    nnz = nb * b * b
    useful = nnz * 4 + nb * 4 + (A.n_block_rows + 1) * 4 + 2 * A.nrows * 4
    out = {}

    # public AUTO route (banded block graph -> scalar-DIA streaming kernel)
    from tpukk.sparse import SpmvHandle

    h = SpmvHandle(A)

    def mkh(k):
        return jax.jit(lambda xx: jax.lax.scan(
            lambda c, _: (h.matvec(c) * 0.125, None), xx, None, length=k)[0])

    t = chain_time(mkh, (x0,), K)
    out["spmv_bsr8_200k"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                 gflops=2 * nnz / t / 1e9)

    # explicit block gather+contract path (the generic unstructured route)
    rows = spmv_impl.build_bsr_rows(A)

    def mk(k):
        return jax.jit(lambda r, xx: jax.lax.scan(
            lambda c, _: (spmv_impl.apply_bsr(A, r, c) * 0.125, None), xx,
            None, length=k)[0])

    t = chain_time(mk, (rows, x0), max(5, K // 5))
    out["spmv_bsr8_block_gather"] = dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                         gflops=2 * nnz / t / 1e9)
    return out


def bench_spmv_struct3d(K):
    """3-D 7-point FD stencil SpMV, 100³ grid (the struct-grid perf case of
    perf_test/sparse/KokkosSparse_spmv_struct.cpp) — routes through
    spmv_struct's stencil check into the fused DIA pallas kernel."""
    import jax
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle, spmv_pallas
    from tpukk.sparse.spmv_struct import spmv_struct, structured_stencil_offsets

    A = generate_structured_laplacian(100, 100, 100, dtype=np.float32)
    # entry-point validation (stencil offsets subset check) once
    x = jnp.ones(A.ncols, jnp.float32)
    jax.block_until_ready(spmv_struct(A, (100, 100, 100), x))
    h = SpmvHandle(A, SpmvAlgorithm.DIA)
    rng = np.random.default_rng(0)
    useful = A.nnz * 8 + (A.nrows + 1) * 4 + 2 * A.nrows * 4
    if spmv_pallas.supports_pallas():
        plan = h._plan("dia_pallas")
        x0 = jax.device_put(
            (rng.standard_normal(plan.n_pad + plan.W) * 0.01).astype(np.float32))

        def body(p, c):
            y = spmv_pallas._dia_call(c, *p.dlist, offsets=p.offsets,
                                      chunk=p.chunk, interpret=False)
            return jnp.pad(y * 0.125, (0, p.W))

        def mk(k):
            return jax.jit(lambda p, xx: jax.lax.scan(
                lambda c, _: (body(p, c), None), xx, None, length=k)[0])

        t = chain_time(mk, (plan, x0), K)
    else:
        from tpukk.sparse import spmv_impl

        plan = h._plan("dia")
        x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01).astype(np.float32))

        def mk(k):
            return jax.jit(lambda p, xx: jax.lax.scan(
                lambda c, _: (spmv_impl.apply_dia(p, c) * 0.125, None), xx,
                None, length=k)[0])

        t = chain_time(mk, (plan, x0), max(10, K // 4))
    return {"spmv_struct3d_7pt_1M": dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                         gflops=2 * A.nnz / t / 1e9)}


def bench_spmv_f64(K):
    """BASELINE config 1 is 'SpMV double CSR' — f64 on TPU is software-
    emulated by XLA (~1/10+ throughput); report the honest rate on the same
    1000x1000 Laplacian through the XLA DIA path (the pallas kernels are
    f32/bf16; f64 correctness parity lives in the CPU test sweep)."""
    import jax

    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpmvAlgorithm, SpmvHandle, spmv_impl

    try:
        A = generate_structured_laplacian(1000, 1000, dtype=np.float64)
        h = SpmvHandle(A, SpmvAlgorithm.DIA)
        plan = h._plan("dia")
        rng = np.random.default_rng(0)
        x0 = jax.device_put((rng.standard_normal(A.ncols) * 0.01))

        def mk(k):
            return jax.jit(lambda p, x: jax.lax.scan(
                lambda c, _: (spmv_impl.apply_dia(p, c) * 0.125, None), x, None,
                length=k)[0])

        t = chain_time(mk, (plan, x0), K)
        useful = A.nnz * 12 + (A.nrows + 1) * 4 + 2 * A.nrows * 8
        return {"spmv_dia_f64": dict(time_us=t * 1e6, gbps=useful / t / 1e9,
                                     gflops=2 * A.nnz / t / 1e9)}
    except Exception as e:  # f64 unsupported on some backends — report, skip
        print(f"spmv_dia_f64 skipped: {type(e).__name__}: {e}")
        return {}


def bench_spgemm(n_side, K=10):
    """Symbolic one-shot (host phase, wall time) + chained numeric reuse —
    the same-sparsity handle-reuse pattern of KokkosSparse_spgemm.cpp."""
    import jax

    from tpukk.containers import generate_structured_laplacian
    from tpukk.sparse import SpgemmHandle, spgemm_numeric, spgemm_symbolic
    from tpukk.sparse import spgemm_pallas, spmv_pallas

    A = generate_structured_laplacian(n_side, n_side, dtype=np.float32)
    h = SpgemmHandle()
    t0 = time.perf_counter()
    spgemm_symbolic(h, A, A)
    t_sym = time.perf_counter() - t0
    C = spgemm_numeric(h, A, A)
    jax.block_until_ready(C.values)
    npairs = int(np.asarray(h.pair_plan.a_idx).shape[0])

    if spmv_pallas.supports_pallas() and h.onehot_plan not in (None, False):
        plan = h.onehot_plan

        def mk(k):
            def body(i, v):
                out = spgemm_pallas.onehot_pair_numeric(plan, v, v)
                return v * 0.5 + out[: v.shape[0]] * 1e-20
            return jax.jit(lambda v: jax.lax.fori_loop(0, k, body, v))

        t_num = chain_time(mk, (A.values,), K)
    else:
        from tpukk.sparse.spgemm import _numeric_pairs

        pp = h.pair_plan

        def mk(k):
            def body(i, v):
                out = _numeric_pairs(pp, v, v)
                return v * 0.5 + out[: v.shape[0]] * 1e-20
            return jax.jit(lambda v: jax.lax.fori_loop(0, k, body, v))

        t_num = chain_time(mk, (A.values,), K)
    return {"spgemm_aa": dict(symbolic_s=t_sym, numeric_s=t_num,
                              gflops=2 * npairs / t_num / 1e9,
                              gpair_s=npairs / t_num / 1e9, nnz_c=h.nnz_c)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--chain", type=int, default=300)
    ap.add_argument("--archive", default=None)
    ap.add_argument("--spgemm-size", type=int, default=200)
    args = ap.parse_args()

    results = {}
    rows, A = bench_spmv(args.size, args.chain)
    results.update(rows)
    results.update(bench_spmm(A, args.chain))
    results.update(bench_blas(4 * 1024 * 1024, args.chain))
    oh_rows, _ = bench_spmv_onehot(max(50, args.chain // 4))
    results.update(oh_rows)
    results.update(bench_gs_sweep(max(25, args.chain // 8)))
    results.update(bench_spgemm(args.spgemm_size))
    results.update(bench_spgemm_dia(max(25, args.chain // 8)))
    results.update(bench_sptrsv(max(10, args.chain // 16)))
    results.update(bench_solvers(max(20, args.chain // 8)))
    results.update(bench_graph())
    results.update(bench_spadd_spiluk(max(20, args.chain // 8)))
    results.update(bench_spmv_bsr(max(25, args.chain // 8)))
    results.update(bench_spmv_struct3d(max(25, args.chain // 8)))
    results.update(bench_spmv_f64(max(10, args.chain // 16)))

    keys = ["time_us", "gbps", "gflops", "tflops", "gnnz_s", "gpair_s", "levels",
            "iters", "solve_ms", "colors"]
    print(f"{'benchmark':24s} " + "  ".join(f"{k:>12s}" for k in keys))
    for name, m in results.items():
        cells = [f"{m.get(k, float('nan')):12.2f}" for k in keys]
        print(f"{name:24s} " + "  ".join(cells))

    if args.archive:
        from tpukk.common import PerfArchive

        arch = PerfArchive(args.archive)
        flat = {f"{k}.time_us": v["time_us"] for k, v in results.items() if "time_us" in v}
        res = arch.run_and_compare("bench_suite", flat)
        print("archive:", {k: r.status for k, r in res.items()})
    print(json.dumps({k: {kk: round(float(vv), 3) for kk, vv in v.items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
