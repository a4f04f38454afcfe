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
