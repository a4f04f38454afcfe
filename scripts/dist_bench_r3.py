import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from tpukk.containers import generate_structured_laplacian, CsrMatrix
from tpukk.dist import build_dist_gt_plan, dist_spmv_gt, shard_dist_gt_plan
from tpukk.sparse import spmv_pallas

T0=time.perf_counter()
def tlog(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", flush=True)

def timeit(f, n=200):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
import scipy.sparse as sps
def rand100k():
    n=100_000; deg=16
    r=np.repeat(np.arange(n),deg); c=rng.integers(0,n,n*deg)
    A=sps.csr_matrix((rng.standard_normal(n*deg).astype(np.float32),(r,c)),shape=(n,n)); A.sum_duplicates()
    return CsrMatrix.from_scipy(A)

for name, A in [("lap1000", generate_structured_laplacian(1000,1000,dtype=np.float32)),
                ("rand100k", rand100k())]:
    n = A.nrows
    x = rng.standard_normal(n).astype(np.float32)
    p1 = spmv_pallas.GtSpmvPlan(A)
    tlog(f"{name} plan built {p1.layout} pad={p1.pad_ratio:.2f}")
    xd = jnp.asarray(x)
    t1 = timeit(lambda: spmv_pallas.onehot_spmv(p1, xd))
    tlog(f"{name} single {p1.layout}: {t1*1e6:.1f}us {A.nnz/t1/1e9:.2f} Gnnz/s")
    dp = build_dist_gt_plan(A, 1)
    tlog(f"{name} dist plan built {dp.layout}")
    mesh = Mesh(np.array(jax.devices()[:1]), ("parts",))
    dp = shard_dist_gt_plan(dp, mesh)
    xp = jnp.asarray(np.pad(x, (0, dp.padded_rows - n)))
    t2 = timeit(lambda: dist_spmv_gt(dp, xp, mesh))
    tlog(f"{name} dist1 {dp.layout}: {t2*1e6:.1f}us {A.nnz/t2/1e9:.2f} Gnnz/s ratio={t1/t2:.3f}")
