"""Test harness — analog of test_common/Test_Main.cpp + backend headers.

Tests run on the CPU backend with 8 virtual devices so multi-device sharding
paths (dist/) execute without TPU hardware (SURVEY.md §4: the reference has no
distributed tests; we add them via XLA host-device-count simulation).  The
container force-registers a TPU ('axon') platform via sitecustomize, so the
platform must be re-pinned here before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
