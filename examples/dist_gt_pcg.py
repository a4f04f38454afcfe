"""Fast distributed SpMV + PCG — the gather-table Pallas kernels running
INSIDE shard_map (round 3): per-part v9 plans, one all_to_all halo exchange
per product, Jacobi-PCG fully on device.  Use
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
simulate a pod slice on CPU (the kernels then run in interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpukk.containers import generate_structured_laplacian
from tpukk.dist import (
    build_dist_gt_plan,
    dist_pcg,
    dist_spmv_gt,
    shard_dist_gt_plan,
)


def main():
    devs = np.array(jax.devices())
    n_parts = min(devs.size, 8)
    mesh = Mesh(devs[:n_parts], ("parts",))

    A = generate_structured_laplacian(48, 48, dtype=np.float32)
    n = A.nrows
    plan = build_dist_gt_plan(A, n_parts)
    if plan is None:
        print("gather-table dist plan unavailable (no native lib); "
              "see dist_halo_spmv.py for the portable schedule")
        return
    plan = shard_dist_gt_plan(plan, mesh)
    if hasattr(plan, "offsets"):   # neighbor-ppermute overlap plan (v2)
        print(f"plan: v2 offsets={plan.offsets} parts={n_parts} "
              f"halo_total={plan.halo_total} pad={plan.pad_ratio:.2f}")
    else:
        print(f"plan: layout={plan.layout} parts={n_parts} "
              f"halo={plan.halo} pad={plan.pad_ratio:.2f}")

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    xp = jnp.asarray(np.pad(x, (0, plan.padded_rows - n)))
    y = np.asarray(dist_spmv_gt(plan, xp, mesh))[:n]
    ref = A.to_scipy() @ x
    print(f"dist SpMV rel err: {np.abs(y - ref).max() / np.abs(ref).max():.2e}")

    b = np.zeros(plan.padded_rows, np.float32)
    b[:n] = 1.0
    xs, iters, rel = dist_pcg(plan, jnp.asarray(b), mesh, tol=1e-5,
                              max_iters=500)
    print(f"PCG through the gt plan: {int(iters)} iters, rel {float(rel):.2e}")


if __name__ == "__main__":
    main()
