"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4: the TPU
build adds distributed tests via XLA host-device-count simulation)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpukk.containers import generate_structured_laplacian
from tpukk.dist import dist_cg_step, dist_dot, dist_spmv, partition_rows, shard_partition


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    assert devs.size >= 4, "conftest must provide >=4 virtual devices"
    return Mesh(devs[:4], ("parts",))


def _pad(v, total):
    out = np.zeros(total, v.dtype)
    out[: v.shape[0]] = v
    return out


def test_dist_spmv_matches_scipy(mesh, rng):
    A = generate_structured_laplacian(20, 15, dtype=np.float64)
    plan = partition_rows(A, mesh.devices.size)
    plan = shard_partition(plan, mesh)
    x = rng.standard_normal(A.ncols)
    xp = _pad(x, plan.padded_rows)
    y = np.asarray(dist_spmv(plan, xp, mesh))[: A.nrows]
    ref = A.to_scipy() @ x
    assert np.abs(y - ref).max() < 1e-12 * max(1, np.abs(ref).max())


def test_dist_dot(mesh, rng):
    x = rng.standard_normal(64)
    y = rng.standard_normal(64)
    got = float(np.asarray(dist_dot(x, y, mesh)))
    assert abs(got - np.dot(x, y)) < 1e-10


def test_dist_cg_converges(mesh, rng):
    # SPD Laplacian: CG on the distributed step must reduce the residual
    A = generate_structured_laplacian(16, 16, dtype=np.float64)
    plan = shard_partition(partition_rows(A, mesh.devices.size), mesh)
    b = rng.standard_normal(A.nrows)
    bp = _pad(b, plan.padded_rows)
    x = np.zeros_like(bp)
    r = bp.copy()
    p = bp.copy()
    rz = float(np.dot(r, r))
    state = (x, r, p, rz)
    step = jax.jit(lambda s: dist_cg_step(plan, s, mesh))
    r0 = np.linalg.norm(b)
    for _ in range(50):
        state = step(state)
    rnorm = float(np.asarray(dist_dot(state[1], state[1], mesh))) ** 0.5
    assert rnorm < 1e-6 * r0
