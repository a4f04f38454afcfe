"""Preconditioner interface — analog of
sparse/src/KokkosSparse_Preconditioner.hpp (+ LUPrec in
KokkosSparse_LUPrec.hpp, MatrixPrec in KokkosSparse_MatrixPrec.hpp).

A preconditioner is apply(x) ≈ M⁻¹x.  LUPrec applies two level-scheduled
sptrsv sweeps (the ILU apply); GsPrec wraps a Gauss-Seidel handle as a
smoother-preconditioner.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..containers import CsrMatrix
from .gauss_seidel import GsHandle, gauss_seidel_apply
from .spmv import SpmvHandle
from .sptrsv import SptrsvHandle, sptrsv_solve

__all__ = ["Preconditioner", "IdentityPrec", "MatrixPrec", "JacobiPrec", "LUPrec", "GsPrec"]


class Preconditioner:
    def apply(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def __call__(self, x):
        return self.apply(x)


class IdentityPrec(Preconditioner):
    def apply(self, x):
        return x


class MatrixPrec(Preconditioner):
    """M⁻¹ given explicitly as a matrix (apply = spmv) — cf. MatrixPrec."""

    def __init__(self, M: CsrMatrix):
        self._h = SpmvHandle(M)

    def apply(self, x):
        return self._h(x)


class JacobiPrec(Preconditioner):
    def __init__(self, A: CsrMatrix):
        d = A.to_scipy().diagonal()
        self.inv_diag = jnp.asarray(np.where(d != 0, 1.0 / d, 1.0).astype(A.host_values().dtype))

    def apply(self, x):
        return self.inv_diag * x if x.ndim == 1 else self.inv_diag[:, None] * x


class _JacobiTri:
    """Inexact triangular solve by k Jacobi-Richardson sweeps:
    x_{m+1} = D⁻¹(b − N x_m) with T = D + N — the inner-iteration idea of
    the reference's two-stage GS (twostage_gauss_seidel_impl.hpp:120-256)
    applied to the ILU apply.  The strict part N of an ILU factor of a
    structured matrix is banded, so every sweep is a DIA pallas SpMV
    (~10 us) instead of a level-by-level dependent chain."""

    def __init__(self, T: CsrMatrix, sweeps: int):
        import scipy.sparse as sps

        Ts = T.to_scipy().tocsr()
        d = Ts.diagonal()
        self.inv_diag = jnp.asarray(
            np.where(d != 0, 1.0 / d, 1.0).astype(T.host_values().dtype))
        N = Ts.copy()
        N.setdiag(0.0)
        N.eliminate_zeros()
        N.sort_indices()
        self._hn = SpmvHandle(CsrMatrix.from_scipy(N))
        self.sweeps = sweeps

    def solve(self, b):
        x = self.inv_diag * b
        for _ in range(self.sweeps):
            x = self.inv_diag * (b - self._hn(x))
        return x


class LUPrec(Preconditioner):
    """Apply (LU)⁻¹ via two sptrsv sweeps — cf. KokkosSparse_LUPrec.hpp
    (the ILU-preconditioner composition of example/gmres/test_prec).

    jacobi_sweeps=k switches to INEXACT triangular solves by k fixed
    Jacobi-Richardson sweeps per factor: a fixed linear operator (so plain
    GMRES/CG remain valid) whose apply is a handful of SpMVs instead of two
    level-scheduled dependent chains — on TPU this trades a mild iteration
    increase for a ~10x cheaper apply (see docs/PERF_NOTES.md)."""

    def __init__(self, L: CsrMatrix, U: CsrMatrix,
                 jacobi_sweeps: int | None = None):
        from .sptrsv import sptrsv_symbolic

        self._L, self._U = L, U
        self._jl = self._ju = None
        if jacobi_sweeps:
            self._jl = _JacobiTri(L, jacobi_sweeps)
            self._ju = _JacobiTri(U, jacobi_sweeps)
            return
        self._hl = SptrsvHandle(lower=True)
        sptrsv_symbolic(self._hl, L)
        self._hu = SptrsvHandle(lower=False)
        sptrsv_symbolic(self._hu, U)

    def apply(self, x):
        if self._jl is not None:
            return self._ju.solve(self._jl.solve(x))
        y = sptrsv_solve(self._hl, self._L, x)
        return sptrsv_solve(self._hu, self._U, y)


class GsPrec(Preconditioner):
    """Gauss-Seidel sweeps as a preconditioner (the pcg use in
    perf_test/sparse/KokkosSparse_pcg.cpp)."""

    def __init__(self, handle: GsHandle, A: CsrMatrix, sweeps: int = 1):
        self._h, self._A, self._sweeps = handle, A, sweeps

    def apply(self, x):
        return gauss_seidel_apply(self._h, self._A, None, x,
                                  num_sweeps=self._sweeps, direction="symmetric")
