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
