"""Distributed example — row-partitioned SpMV with halo exchange and a
distributed CG step over a device mesh (runs on any device count; use
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
simulate a pod slice on CPU)."""
import jax
import numpy as np
from jax.sharding import Mesh

from tpukk.containers import generate_structured_laplacian
from tpukk.dist import (
    build_halo_plan,
    dist_cg_step,
    dist_spmv_halo,
    partition_rows,
    shard_halo_plan,
    shard_partition,
)


def main():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("parts",))
    P = devs.size
    print(f"mesh: {P} x {devs[0].platform}")

    A = generate_structured_laplacian(64, 64, dtype=np.float32)
    plan = shard_halo_plan(build_halo_plan(A, P), mesh)
    x = np.ones(plan.padded_rows, np.float32)
    x[A.ncols:] = 0
    y = np.asarray(dist_spmv_halo(plan, x, mesh))
    print(f"halo spmv: ||y|| = {np.linalg.norm(y[:A.nrows]):.4f}, halo width = {plan.halo}")

    cplan = shard_partition(partition_rows(A, P), mesh)
    b = np.zeros(cplan.padded_rows, np.float32)
    b[: A.nrows] = 1.0
    state = (np.zeros_like(b), b.copy(), b.copy(), float(b @ b))
    step = jax.jit(lambda s: dist_cg_step(cplan, s, mesh))
    for it in range(10):
        state = step(state)
    print(f"CG 10 iters: |r|^2 = {float(state[3]):.3e}")


if __name__ == "__main__":
    main()
