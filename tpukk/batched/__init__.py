from . import banded, dense, eig as eig_mod, sparse
from .banded import (gbtrf_banded, gbtrs_banded, pbtrf_banded, pbtrs_banded,
                     tbsv_banded)
from .eig import eig, eigendecomposition, eigenvalues, hessenberg, schur
from .sparse import BatchedCrsMatrix, JacobiPrec, batched_cg, batched_gmres, batched_spmv
