import io

import numpy as np
import pytest

from tpukk.common import (
    Controls,
    PerfArchive,
    arith_traits,
    cdiv,
    eager_initialize,
    exclusive_scan,
    inverse_permutation,
    print_configuration,
    round_up,
    segment_offsets_from_sizes,
)


def test_arith_traits():
    t32 = arith_traits(np.float32)
    assert t32.eps == np.finfo(np.float32).eps
    assert not t32.is_complex and not t32.is_integer
    ti = arith_traits(np.int32)
    assert ti.is_integer and ti.eps == 0.0
    tc = arith_traits(np.complex64)
    assert tc.is_complex
    import jax.numpy as jnp

    assert tc.conj(jnp.array(1 + 2j, jnp.complex64)) == 1 - 2j


def test_scans_and_perms():
    s = np.asarray(exclusive_scan(np.array([1, 2, 3])))
    np.testing.assert_array_equal(s, [0, 1, 3, 6])
    perm = np.array([2, 0, 1])
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(inv[perm], [0, 1, 2])
    np.testing.assert_array_equal(segment_offsets_from_sizes(np.array([2, 0, 3])), [0, 2, 2, 5])
    assert round_up(5, 4) == 8 and cdiv(5, 4) == 2


def test_controls_mapping():
    from tpukk.sparse import SpmvAlgorithm

    c = Controls().set("algorithm", "merge")
    assert c.spmv_algorithm() == SpmvAlgorithm.ELL
    assert Controls().spmv_algorithm() == SpmvAlgorithm.AUTO
    assert Controls().set("algorithm", "dia").spmv_algorithm() == SpmvAlgorithm.DIA


def test_print_configuration_and_eager_init():
    buf = io.StringIO()
    text = print_configuration(buf)
    assert "tpukk version" in text and "jax version" in text
    assert buf.getvalue().strip() == text.strip()
    eager_initialize()  # must not raise


def test_perf_archive(tmp_path):
    p = tmp_path / "perf.json"
    arch = PerfArchive(p, machine="testbox", tolerance=0.1)
    r1 = arch.run_and_compare("spmv", {"time_us": 100.0})
    assert r1["time_us"].status == "new"
    arch2 = PerfArchive(p, machine="testbox", tolerance=0.1)
    r2 = arch2.run_and_compare("spmv", {"time_us": 105.0})
    assert r2["time_us"].status == "pass" and arch2.passed(r2)
    r3 = PerfArchive(p, machine="testbox", tolerance=0.1).run_and_compare(
        "spmv", {"time_us": 150.0})
    assert r3["time_us"].status == "fail"
    r4 = PerfArchive(p, machine="testbox", tolerance=0.1).run_and_compare(
        "spmv", {"time_us": 50.0})
    assert r4["time_us"].status == "improved"
    # improvement becomes the new bar
    r5 = PerfArchive(p, machine="testbox", tolerance=0.1).run_and_compare(
        "spmv", {"time_us": 100.0})
    assert r5["time_us"].status == "fail"


def test_permute_route_native():
    """C++ Euler-split routing: applying the 3 phases on host reproduces
    x[src] exactly (Slepian-Duguid middle-stage assignment)."""
    from tpukk import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    for R, C in ((8, 8), (24, 64), (256, 1024)):
        N = R * C
        src = rng.permutation(N).astype(np.int64)
        t1, t2, t3 = native.permute_route(R, C, src)
        x = rng.standard_normal(N).astype(np.float32)
        y1 = x.reshape(R, C)[np.arange(R)[:, None], t1.reshape(R, C)]
        y2 = y1.T[np.arange(C)[:, None], t2.reshape(C, R)]
        out = y2.T[np.arange(R)[:, None], t3.reshape(R, C)]
        np.testing.assert_array_equal(out.reshape(-1), x[src])


def test_static_permute_interpret():
    """Routed permutation through the pallas row-perm kernel (interpret)
    matches the plain gather, including tail padding."""
    from tpukk.common.permute import build_permute_plan, static_permute

    rng = np.random.default_rng(4)
    for n in (1024 * 1024, 1024 * 1024 + 777):
        src = rng.permutation(n).astype(np.int64)
        plan = build_permute_plan(src, _force=True)
        if plan is None:
            pytest.skip("native library unavailable")
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(static_permute(plan, x, interpret=True))
        np.testing.assert_array_equal(y, x[src])


def test_static_permute_fallback_sort():
    """plan=None falls back to permute_via_sort (scatter-by-keys contract)."""
    from tpukk.common.permute import static_permute

    rng = np.random.default_rng(5)
    n = 4096
    keys = rng.permutation(n).astype(np.int32)
    x = rng.standard_normal(n).astype(np.float32)
    import jax.numpy as jnp

    y = np.asarray(static_permute(None, jnp.asarray(x), jnp.asarray(keys)))
    ref = np.empty(n, np.float32)
    ref[keys] = x
    np.testing.assert_array_equal(y, ref)
