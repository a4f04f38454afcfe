from .partition import RowPartition, partition_rows
from .spmv import dist_cg_step, dist_dot, dist_spmv, shard_partition
