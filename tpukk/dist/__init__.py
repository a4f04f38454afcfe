from .gauss_seidel import (
    DistGsGtPlan,
    DistGsPlan,
    build_dist_gs_gt_plan,
    build_dist_gs_plan,
    dist_gs_sweep,
    shard_dist_gs_plan,
)
from .gt_spmv import DistGtPlan, build_dist_gt_plan, dist_spmv_gt, shard_dist_gt_plan
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
