from .gauss_seidel import (
    DistGsGtPlan,
    DistGsPlan,
    build_dist_gs_gt_plan,
    build_dist_gs_plan,
    dist_gs_sweep,
    shard_dist_gs_plan,
)
from .gt_spmv import (DistGtPlan, DistGtPlan2, build_dist_gt_plan,
                      build_dist_gt_plan2, dist_plan_accounting,
                      dist_spmv_gt, shard_dist_gt_plan)
from .halo import HaloPlan, build_halo_plan, import_lists
from .partition import RowPartition, partition_rows
from .spgemm import (
    RingSpgemmPlan,
    build_ring_spgemm_plan,
    ring_spgemm_numeric,
    shard_ring_spgemm_plan,
)
from .spmv import (
    dist_cg_step,
    dist_gmres,
    dist_pcg,
    dist_dot,
    dist_spmv,
    dist_spmv_halo,
    shard_halo_plan,
    shard_partition,
)

__all__ = [
    "DistGsGtPlan", "DistGsPlan", "DistGtPlan", "DistGtPlan2", "HaloPlan", "RingSpgemmPlan",
    "RowPartition", "build_dist_gs_gt_plan", "build_dist_gs_plan",
    "build_dist_gt_plan", "build_dist_gt_plan2", "build_halo_plan", "build_ring_spgemm_plan",
    "dist_cg_step", "dist_dot", "dist_gmres", "dist_gs_sweep", "dist_pcg",
    "dist_spmv", "dist_spmv_gt", "dist_spmv_halo", "import_lists",
    "partition_rows", "ring_spgemm_numeric", "shard_dist_gs_plan",
    "shard_dist_gt_plan", "shard_halo_plan", "shard_partition",
    "shard_ring_spgemm_plan",
]
