"""Structured-grid SpMV — analog of the spmv_struct entry points
(sparse/src/KokkosSparse_spmv.hpp struct overloads; impl
sparse/impl/KokkosSparse_spmv_struct_impl.hpp:92-97 with per-stencil
interior/boundary functors for 3/5/9-pt FD and 7/27-pt FE stencils).

On TPU the structured case IS the DIA plan (diagonal offsets = stencil
offsets); this entry point exposes the reference's API shape: the caller
states the grid dimensionality/extents and we verify the matrix matches a
stencil before routing to the DIA/Pallas path.
"""
from __future__ import annotations

import numpy as np

from ..common import check
from ..containers import CsrMatrix
from .spmv import SpmvAlgorithm, SpmvHandle
from .spmv_impl import detect_dia_offsets
from ..common.tracing import annotate

__all__ = ["spmv_struct", "structured_stencil_offsets"]


@annotate("structured_stencil_offsets")
def structured_stencil_offsets(grid, stencil_type: str = "FD"):
    """Expected diagonal offsets for an FD/FE stencil on `grid` (nx[,ny[,nz]])
    — cf. the stencil taxonomy of spmv_struct_impl (3/5/7/9/27-point)."""
    dims = [d for d in grid if d > 1]
    if len(dims) == 1:
        offs = [-1, 0, 1]
    elif len(dims) == 2:
        nx = dims[0]
        offs = [-nx, -1, 0, 1, nx]
        if stencil_type.upper() == "FE":  # 9-point
            offs = sorted(set(offs + [-nx - 1, -nx + 1, nx - 1, nx + 1]))
    else:
        nx, ny = dims[0], dims[1]
        offs = [-nx * ny, -nx, -1, 0, 1, nx, nx * ny]
        if stencil_type.upper() == "FE":  # 27-point
            base = [0, 1, -1, nx, -nx, nx * ny, -nx * ny]
            offs = sorted({a + b + c for a in (0, 1, -1)
                           for b in (0, nx, -nx)
                           for c in (0, nx * ny, -nx * ny)})
    return np.asarray(sorted(offs), dtype=np.int64)


@annotate("spmv_struct")
def spmv_struct(A: CsrMatrix, grid, x, alpha=1.0, beta=0.0, y=None,
                stencil_type: str = "FD", mode: str = "N"):
    """y = beta*y + alpha*op(A)·x for a structured-grid matrix.

    Verifies A's offsets are a subset of the declared stencil, then runs the
    DIA streaming path (Pallas kernel on TPU)."""
    offs = detect_dia_offsets(A)
    check(offs is not None, "spmv_struct: matrix is not a stencil matrix")
    expected = structured_stencil_offsets(grid, stencil_type)
    check(np.isin(offs, expected).all(),
          f"spmv_struct: offsets {offs.tolist()} not within the declared "
          f"{stencil_type} stencil for grid {tuple(grid)}")
    h = SpmvHandle(A, SpmvAlgorithm.DIA)
    return h(x, alpha=alpha, beta=beta, y=y, mode=mode)
