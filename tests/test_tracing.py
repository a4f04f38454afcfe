"""Tracing integration — the Kokkos Tools named-kernel analog
(sparse/src/KokkosSparse_spmv.hpp:261-266 pushRegion; spmv_impl.hpp:331
named parallel_fors).  Verifies region names reach the lowered HLO metadata
and that the profiler attach point works."""
import jax
import jax.numpy as jnp
import numpy as np

from tpukk.common.tracing import profile_region, region_name, trace
from tpukk.containers import generate_structured_laplacian
from tpukk.sparse import SpmvAlgorithm, spmv


def test_region_name_format():
    assert region_name("spmv", "N", "DIA") == "tpukk::spmv<N,DIA>"
    assert region_name("pcg") == "tpukk::pcg"


def test_named_scope_reaches_hlo():
    A = generate_structured_laplacian(12, 12, dtype=np.float32)
    x = jnp.ones(A.nrows, jnp.float32)

    def f(x):
        return spmv(A, x, algorithm=SpmvAlgorithm.ELL)

    hlo = jax.jit(f).lower(x).as_text(debug_info=True)
    assert "tpukk::spmv" in hlo  # scope name embedded in op metadata


def test_profile_region_nests_and_is_jit_safe():
    with profile_region("tpukk::outer"):
        with profile_region("tpukk::inner"):
            y = jax.jit(lambda v: v * 2)(jnp.ones(8))
    assert float(y[0]) == 2.0


def test_profiler_trace_capture(tmp_path):
    """tracing.trace must produce a profile artifact (the 'attach an external
    profiler' capability, cf. Kokkos Tools)."""
    d = str(tmp_path / "trace")
    with trace(d):
        jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    import os

    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no trace artifacts written"


def test_every_public_api_is_instrumented():
    """Coverage gate for MAPPING.md's 'profile_region on every public API'
    claim (the reference names literally every kernel,
    sparse/impl/KokkosSparse_spmv_impl.hpp:331).  Every function exported by
    an op module must carry a region: either the @annotate attribute or an
    inline profile_region (listed explicitly)."""
    import importlib
    import inspect

    OP_MODULES = [
        "tpukk.blas.blas1", "tpukk.blas.blas2", "tpukk.blas.blas3",
        "tpukk.lapack",
        "tpukk.sparse.spmv", "tpukk.sparse.spmv_struct", "tpukk.sparse.spadd",
        "tpukk.sparse.spgemm", "tpukk.sparse.sptrsv", "tpukk.sparse.spiluk",
        "tpukk.sparse.par_ilut", "tpukk.sparse.mdf", "tpukk.sparse.trsv",
        "tpukk.sparse.gmres", "tpukk.sparse.pcg", "tpukk.sparse.gauss_seidel",
        "tpukk.graph.coloring",
        "tpukk.batched.dense", "tpukk.batched.banded", "tpukk.batched.eig",
        "tpukk.batched.sparse",
        "tpukk.ode.runge_kutta", "tpukk.ode.bdf", "tpukk.ode.newton",
        "tpukk.dist.spmv", "tpukk.dist.gt_spmv", "tpukk.dist.gauss_seidel",
        "tpukk.dist.spgemm",
    ]
    # functions that open profile_region inline (handle-dispatch entries) or
    # are pure host-side plan/verification helpers with no kernel body
    INLINE_OR_EXEMPT = {
        ("tpukk.sparse.spmv", "spmv"), ("tpukk.sparse.spmv", "spmm"),
        ("tpukk.graph.coloring", "verify_coloring"),
        ("tpukk.graph.coloring", "color_sets"),
        ("tpukk.ode.runge_kutta", "tableau"),
        ("tpukk.dist.spmv", "shard_partition"),
        ("tpukk.dist.spmv", "shard_halo_plan"),
        ("tpukk.dist.gt_spmv", "shard_dist_gt_plan"),
        ("tpukk.dist.gauss_seidel", "shard_dist_gs_plan"),
    }
    missing = []
    for mod_name in OP_MODULES:
        mod = importlib.import_module(mod_name)
        for name in getattr(mod, "__all__", []):
            obj = getattr(mod, name, None)
            if not inspect.isfunction(obj):
                continue  # classes / enums / handles
            if (mod_name, name) in INLINE_OR_EXEMPT:
                continue
            if not hasattr(obj, "_tpukk_region"):
                missing.append(f"{mod_name}.{name}")
    assert not missing, f"un-instrumented public APIs: {missing}"
