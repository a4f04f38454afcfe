from . import banded, dense, sparse
from .banded import (gbtrf_banded, gbtrs_banded, pbtrf_banded, pbtrs_banded,
                     tbsv_banded)
from .sparse import BatchedCrsMatrix, JacobiPrec, batched_cg, batched_gmres, batched_spmv
