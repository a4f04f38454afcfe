"""Test harness — analog of test_common/Test_Main.cpp + backend headers.

Tests run on the CPU backend with 8 virtual devices so multi-device sharding
paths (dist/) execute without TPU hardware (SURVEY.md §4: the reference has no
distributed tests; we add them via XLA host-device-count simulation).  The
container force-registers a TPU ('axon') platform via sitecustomize, so the
platform must be re-pinned here before any backend is initialized.
"""
import os

# TPUKK_TPU_TESTS=1 keeps the real TPU platform for the `-m tpu` subset
# (the per-backend test-executable analog, sparse/unit_test/backends/):
#   TPUKK_TPU_TESTS=1 python -m pytest tests -m tpu
# Everything else runs on the CPU backend with 8 virtual devices.
_TPU_MODE = os.environ.get("TPUKK_TPU_TESTS", "") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: the suite is compile-bound (many tiny
    # per-level/per-color XLA programs), so warm re-runs drop from ~8.5min
    # to well under the 5-min budget (VERDICT r1 weak #6).  Safe on the CPU
    # backend; keyed by HLO so code changes invalidate naturally.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    # threshold 0: the suite's cost is hundreds of sub-0.1s compiles (e.g.
    # per-level sptrsv programs — profiled round 3: 326 compiles = 7.5s in
    # ONE trsv test), which a nonzero threshold exempts from caching
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# TPU mode: x64 stays OFF — enabling it on the axon backend wedges the
# relay (observed round 2); f64 kernels use host-side numpy splits instead
# (spmv_pallas.ds_split_f64).

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# dtype sweep — the ETI type-combination analog
# (test_common/Test_Common_Test_All_Type_Combos.hpp)
SCALARS = [np.float32, np.float64]


@pytest.fixture(params=SCALARS, ids=["f32", "f64"])
def scalar(request):
    return request.param


def tol_for(dtype, scale=10.0):
    """Scaled-epsilon tolerance — the reference's oracle pattern uses
    eps = 10*ArithTraits::eps() (sparse/unit_test/Test_Sparse_spmv.hpp:76-101)."""
    return scale * np.finfo(dtype).eps


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests run only under TPUKK_TPU_TESTS=1 (real chip);
    everything else is skipped in that mode (the platform is not the CPU
    mesh the regular suite assumes)."""
    import pytest as _pytest

    if _TPU_MODE:
        skip = _pytest.mark.skip(reason="TPU mode: only -m tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = _pytest.mark.skip(reason="needs real TPU (TPUKK_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
