from . import blas1, blas2, blas3
from .blas1 import (
    axpby,
    axpy,
    dot,
    fill,
    iamax,
    mult,
    nrm1,
    nrm2,
    nrm2_squared,
    nrm2w,
    nrminf,
    reciprocal,
    rot,
    rotg,
    rotm,
    rotmg,
    scal,
    swap,
    update,
)
from .blas2 import gemv, ger, syr, syr2
from .blas3 import gemm, trmm, trsm
