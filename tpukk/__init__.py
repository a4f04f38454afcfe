"""tpukk — a TPU-native sparse/dense linear-algebra + graph-kernels library.

Brand-new JAX/XLA/Pallas implementation of the capability surface of
kokkos/kokkos-kernels (see SURVEY.md): containers (CSR/BSR/COO/CCS),
BLAS 1/2/3, LAPACK wrappers, batched small-dense kernels, sparse kernels
(SpMV/SpMM, SpGEMM, SpADD, SpTRSV, SpILUK, par_ilut, Gauss-Seidel, GMRES,
PCG, MDF), graph kernels (D1/D2 coloring, MIS2, coarsening, RCM, RCB,
triangle counting), ODE integrators (RK/BDF/Newton), and a multi-device
distribution layer (row partitioning + halo exchange over ICI collectives)
that the single-process reference delegates to its callers.
"""

__version__ = "0.1.0"

from . import batched, blas, common, containers, dist, graph, lapack, ode, sparse
from .containers import BsrMatrix, CcsMatrix, CooMatrix, CsrMatrix
from .sparse import SpmvAlgorithm, SpmvHandle, spmm, spmv
