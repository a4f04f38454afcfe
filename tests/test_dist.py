"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4: the TPU
build adds distributed tests via XLA host-device-count simulation)."""
import jax
import jax.numpy as jnp
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


def _mesh():
    devs = np.array(jax.devices())
    n = 8 if devs.size >= 8 else 4
    return Mesh(devs[:n], ("parts",))


class TestDistPcg:
    def test_full_solve_matches_scipy(self, rng):
        import scipy.sparse.linalg as spla
        from tpukk.containers import generate_structured_laplacian
        from tpukk.dist import dist_pcg, partition_rows, shard_partition
        mesh = _mesh()
        A = generate_structured_laplacian(16, 16, dtype=np.float64)
        plan = shard_partition(partition_rows(A, mesh.devices.size), mesh)
        b = np.zeros(plan.padded_rows)
        b[:A.nrows] = rng.standard_normal(A.nrows)
        x, iters, rel = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-10,
                                 max_iters=500)
        xs = np.asarray(x)[:A.nrows]
        ref = spla.spsolve(A.to_scipy().tocsc(), b[:A.nrows])
        assert float(rel) < 1e-9
        np.testing.assert_allclose(xs, ref, rtol=1e-6, atol=1e-8)

    def test_jacobi_precond_reduces_iters(self, rng):
        from tpukk.containers import generate_diag_dominant_csr
        from tpukk.dist import dist_pcg, partition_rows, shard_partition
        import scipy.sparse as sps
        mesh = _mesh()
        A0 = generate_diag_dominant_csr(200, 4, dtype=np.float64, seed=6)
        # symmetrize to make CG applicable, keep diag dominance
        sp = A0.to_scipy()
        sp = (sp + sp.T) * 0.5 + sps.diags(np.full(200, 4.0))
        sp = sp.tocsr()
        from tpukk.containers import CsrMatrix
        A = CsrMatrix.from_scipy(sp)
        plan = shard_partition(partition_rows(A, mesh.devices.size), mesh)
        b = np.zeros(plan.padded_rows)
        b[:A.nrows] = rng.standard_normal(A.nrows)
        dinv = np.zeros(plan.padded_rows)
        dinv[:A.nrows] = 1.0 / sp.diagonal()
        x1, it1, rel1 = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-10,
                                 max_iters=400)
        x2, it2, rel2 = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-10,
                                 max_iters=400, inv_diag=jnp.asarray(dinv))
        assert float(rel2) < 1e-9
        assert int(it2) <= int(it1)

    def test_halo_plan_variant(self, rng):
        from tpukk.containers import generate_structured_laplacian
        from tpukk.dist import build_halo_plan, dist_pcg, shard_halo_plan
        mesh = _mesh()
        A = generate_structured_laplacian(12, 12, dtype=np.float64)
        plan = shard_halo_plan(build_halo_plan(A, mesh.devices.size), mesh)
        b = np.zeros(plan.padded_rows)
        b[:A.nrows] = rng.standard_normal(A.nrows)
        x, iters, rel = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-9,
                                 max_iters=600)
        assert float(rel) < 1e-8
        r = A.to_scipy() @ np.asarray(x)[:A.nrows] - b[:A.nrows]
        assert np.linalg.norm(r) / np.linalg.norm(b[:A.nrows]) < 1e-7


class TestDistGmres:
    def test_allgather_schedule(self, mesh, rng):
        from tpukk.dist import dist_gmres, partition_rows, shard_partition
        from tpukk.containers import generate_diag_dominant_csr

        A = generate_diag_dominant_csr(120, 6, dtype=np.float64, seed=5)
        plan = shard_partition(partition_rows(A, mesh.devices.size), mesh)
        b = rng.standard_normal(A.nrows)
        bp = _pad(b, plan.padded_rows)
        x, iters, rel = dist_gmres(plan, jnp.asarray(bp), mesh, m=20,
                                   tol=1e-10, max_restarts=30)
        assert rel <= 1e-10
        xr = np.asarray(x)[: A.nrows]
        ref = A.to_scipy() @ xr - b
        assert np.abs(ref).max() < 1e-8 * max(1, np.abs(b).max())

    def test_halo_schedule_jacobi_prec(self, mesh, rng):
        from tpukk.dist import build_halo_plan, dist_gmres, shard_halo_plan

        A = generate_structured_laplacian(16, 12, dtype=np.float64)
        sp = A.to_scipy().tocsr()
        sp.setdiag(sp.diagonal() + 1.0)
        from tpukk.containers import CsrMatrix
        M = CsrMatrix.from_scipy(sp)
        plan = build_halo_plan(M, mesh.devices.size)
        rpp = plan.rows_per_part
        plan = shard_halo_plan(plan, mesh)
        b = rng.standard_normal(M.nrows)
        bp = _pad(b, mesh.devices.size * rpp)
        d = sp.diagonal()
        invd = _pad(1.0 / d, mesh.devices.size * rpp)
        x, iters, rel = dist_gmres(plan, jnp.asarray(bp), mesh, m=25,
                                   tol=1e-9, max_restarts=40,
                                   inv_diag=jnp.asarray(invd))
        assert rel <= 1e-9
        xr = np.asarray(x)[: M.nrows]
        res = sp @ xr - b
        assert np.abs(res).max() < 1e-7 * max(1, np.abs(b).max())


class TestDistGt:
    """Fast distributed SpMV: v9 gather-table Pallas kernels inside
    shard_map (dist/gt_spmv.py) — interpret mode on the CPU mesh."""

    def _plan(self, A, mesh):
        from tpukk.dist import build_dist_gt_plan, shard_dist_gt_plan

        plan = build_dist_gt_plan(A, mesh.devices.size)
        assert plan is not None, "gt plan build fell back unexpectedly"
        return shard_dist_gt_plan(plan, mesh)

    def test_structured_matches_scipy(self, rng):
        from tpukk.dist import dist_spmv_gt

        mesh = _mesh()
        A = generate_structured_laplacian(40, 40, dtype=np.float32)
        plan = self._plan(A, mesh)
        x = rng.standard_normal(A.ncols).astype(np.float32)
        xp = _pad(x, plan.padded_rows)
        y = np.asarray(dist_spmv_gt(plan, jnp.asarray(xp), mesh))[: A.nrows]
        ref = A.to_scipy() @ x
        tol = 20 * np.finfo(np.float32).eps * max(1, np.abs(ref).max())
        assert np.abs(y - ref).max() < tol

    def test_unstructured_matches_scipy(self, rng):
        import scipy.sparse as sps
        from tpukk.containers import CsrMatrix
        from tpukk.dist import dist_spmv_gt

        mesh = _mesh()
        n, deg = 3000, 7
        r = np.repeat(np.arange(n), deg)
        c = rng.integers(0, n, n * deg)
        sp = sps.csr_matrix(
            (rng.standard_normal(n * deg).astype(np.float32), (r, c)),
            shape=(n, n))
        sp.sum_duplicates()
        A = CsrMatrix.from_scipy(sp)
        plan = self._plan(A, mesh)
        x = rng.standard_normal(n).astype(np.float32)
        xp = _pad(x, plan.padded_rows)
        y = np.asarray(dist_spmv_gt(plan, jnp.asarray(xp), mesh))[:n]
        ref = sp @ x
        tol = 40 * np.finfo(np.float32).eps * max(1, np.abs(ref).max()) * deg
        assert np.abs(y - ref).max() < tol

    def test_pcg_through_gt_plan(self, rng):
        from tpukk.dist import dist_pcg

        mesh = _mesh()
        A = generate_structured_laplacian(24, 24, dtype=np.float32)
        plan = self._plan(A, mesh)
        b = np.zeros(plan.padded_rows, np.float32)
        b[: A.nrows] = rng.standard_normal(A.nrows)
        x, iters, rel = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-5,
                                 max_iters=600)
        assert float(rel) < 1e-4
        xr = np.asarray(x)[: A.nrows]
        r = A.to_scipy() @ xr - b[: A.nrows]
        assert np.linalg.norm(r) / np.linalg.norm(b[: A.nrows]) < 1e-3


class TestDistGtUneven:
    """Partition edge cases: n not divisible by n_parts (padded tail rows,
    empty-part tails) through the gather-table dist plans."""

    def test_non_divisible_rows(self, rng):
        from tpukk.dist import (build_dist_gt_plan, dist_spmv_gt,
                                shard_dist_gt_plan)

        mesh = _mesh()
        P_ = mesh.devices.size
        A = generate_structured_laplacian(37, 37, dtype=np.float32)  # 1369
        assert A.nrows % P_ != 0
        plan = build_dist_gt_plan(A, P_)
        assert plan is not None
        plan = shard_dist_gt_plan(plan, mesh)
        x = rng.standard_normal(A.ncols).astype(np.float32)
        xp = _pad(x, plan.padded_rows)
        y = np.asarray(dist_spmv_gt(plan, jnp.asarray(xp), mesh))[: A.nrows]
        ref = A.to_scipy() @ x
        tol = 20 * np.finfo(np.float32).eps * max(1, np.abs(ref).max())
        assert np.abs(y - ref).max() < tol

    def test_gs_gt_non_divisible(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpukk.dist import build_dist_gs_gt_plan, dist_gs_sweep

        mesh = _mesh()
        P_ = mesh.devices.size
        A = generate_structured_laplacian(21, 21, dtype=np.float32)  # 441
        plan = build_dist_gs_gt_plan(A, P_)
        assert plan is not None
        spec = NamedSharding(mesh, P("parts"))
        plan = jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), plan)
        n = A.nrows
        b = np.zeros(plan.padded_rows, np.float32)
        b[:n] = rng.standard_normal(n).astype(np.float32)
        x = dist_gs_sweep(plan, jnp.zeros(plan.padded_rows, jnp.float32),
                          jnp.asarray(b), mesh, num_sweeps=2)
        r = np.linalg.norm(A.to_scipy() @ np.asarray(x)[:n] - b[:n])
        assert r < np.linalg.norm(b[:n])


def test_multipart_accounting_traffic_scales_linearly():
    """Round-4 verdict item 6: the v2 neighbor-ppermute plan's exchange
    traffic must scale O(P*H) (total payload ~ P x per-part halo), NOT the
    padded all_to_all's O(P^2*H_max).  For a 1-D row partition of the 2-D
    Laplacian the per-part halo H is constant in P, so total bytes grow
    ~linearly with P; padding overheads are reported per P."""
    from tpukk.containers import generate_structured_laplacian
    from tpukk.dist import build_dist_gt_plan2, dist_plan_accounting

    A = generate_structured_laplacian(120, 120, dtype=np.float32)
    acc = {}
    for P in (2, 4, 8):
        plan = build_dist_gt_plan2(A, P)
        assert plan is not None
        acc[P] = dist_plan_accounting(plan)
    # per-part halo ~constant (1-D strip partition of a 5-point stencil)
    h4, h8 = acc[4]["halo_per_part"], acc[8]["halo_per_part"]
    assert h8 <= 1.5 * h4
    # total bytes ~ P * H: doubling P at constant H must not quadruple
    b4, b8 = acc[4]["bytes_exchanged"], acc[8]["bytes_exchanged"]
    assert b8 <= 2.8 * b4, (b4, b8)
    assert b8 >= 1.2 * b4          # and it is genuinely growing with P
    # overhead quantities are reported and sane
    for P, a in acc.items():
        assert a["stream_pad_ratio"] >= 1.0
        assert a["row_pad_ratio"] >= 1.0
        assert a["padded_rows"] >= a["real_rows"]


def test_dist_gs_single_part_degenerates_to_single_chip():
    """Round-5: at n_parts=1 the gt GS plan embeds the single-chip colored
    blocks (no stacked streams/shard_map) and must match gauss_seidel_apply
    bit-for-bit under the same coloring."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from tpukk.containers import generate_structured_laplacian
    from tpukk.dist import build_dist_gs_gt_plan, dist_gs_sweep
    from tpukk.graph.coloring import ColoringAlgorithm
    from tpukk.sparse.gauss_seidel import (GsAlgorithm, GsHandle,
                                           gauss_seidel_numeric,
                                           gauss_seidel_symbolic,
                                           gauss_seidel_apply)

    A = generate_structured_laplacian(24, 24, dtype=np.float32)
    gp = build_dist_gs_gt_plan(A, 1)
    assert gp.single is not None and gp.no_remote
    h = GsHandle(algorithm=GsAlgorithm.POINT,
                 coloring=ColoringAlgorithm.SERIAL)
    gauss_seidel_symbolic(h, A)
    gauss_seidel_numeric(h, A, 1.0)
    b = np.linspace(0.0, 1.0, A.nrows).astype(np.float32)
    ref = np.asarray(gauss_seidel_apply(h, A, None, jnp.asarray(b), 2,
                                        "symmetric"))
    mesh = Mesh(np.array(jax.devices()[:1]), ("parts",))
    bpad = jnp.asarray(np.pad(b, (0, gp.padded_rows - A.nrows)))
    xd = dist_gs_sweep(gp, jnp.zeros(gp.padded_rows, jnp.float32), bpad,
                       mesh, num_sweeps=2)
    np.testing.assert_allclose(np.asarray(xd)[:A.nrows], ref,
                               rtol=1e-6, atol=1e-6)
