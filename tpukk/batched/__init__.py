from . import dense, sparse
from .sparse import BatchedCrsMatrix, JacobiPrec, batched_cg, batched_gmres, batched_spmv
