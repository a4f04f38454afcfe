"""Public SpMV API — analog of sparse/src/KokkosSparse_spmv.hpp:77 and the
handle in sparse/src/KokkosSparse_spmv_handle.hpp.

    y = spmv(A, x)                      # A·x
    y = spmv(A, x, alpha, beta, y)      # beta*y + alpha*op(A)·x
    h = SpmvHandle(A, algorithm=...)    # reusable plan (symbolic phase)
    y = h(x)                            # numeric phase, jit-friendly

Modes follow the reference taxonomy (KokkosSparse_spmv.hpp:126: 'N' no
transpose, 'T' transpose, 'C' conjugate WITHOUT transpose, 'H' conjugate
transpose).  Transpose modes materialize Aᵀ at plan time instead of
scatter+atomics (SURVEY.md §2.10: TPUs have no fast global atomics; the
reference also recommends materialization for repeated use,
KokkosSparse_spmv_impl.hpp:381-511 being the atomics path we reject).
"""
from __future__ import annotations

import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check
from ..common.tracing import profile_region, region_name
from ..containers import BsrMatrix, CsrMatrix
from ..containers.sort_crs import transpose as _transpose
from . import spmv_impl
from .spmv_impl import SpmvAlgorithm

__all__ = ["SpmvAlgorithm", "SpmvHandle", "spmv", "spmm"]


def _choose_algorithm(A: CsrMatrix) -> SpmvAlgorithm:
    """Auto heuristic (the DEFAULT algorithm gate, KokkosSparse_spmv.hpp:222):
    tiny → DENSE; banded/stencil → DIA shifted streaming; otherwise bucketed
    ELL (static load balance)."""
    if A.nrows * A.ncols <= 256 * 256:
        return SpmvAlgorithm.DENSE
    offs = spmv_impl.detect_dia_offsets(A, max_diags=32)
    if offs is not None and len(offs) * A.nrows <= 4 * max(A.nnz, 1):
        # dense-diagonal storage is within 4x of CSR nnz → streaming wins
        return SpmvAlgorithm.DIA
    from . import spmv_pallas

    if spmv_pallas.supports_pallas() and A.values.dtype == jnp.float32:
        # unstructured on TPU: one-hot MXU kernel beats the XLA gather paths
        # ~4-10x (docs/PERF_NOTES.md) — unless the tile-pair chunking pads
        # pathologically (hypersparse rows scattered over many src tiles)
        if spmv_pallas.onehot_cost_estimate(A) < spmv_pallas._XLA_GATHER_STEP_COST:
            return SpmvAlgorithm.ONEHOT
    return SpmvAlgorithm.ELL


class SpmvHandle:
    """Reusable SpMV plan — functional analog of SPMVHandle
    (KokkosSparse_spmv_handle.hpp:91-135, setup caching across calls)."""

    def __init__(self, A, algorithm: SpmvAlgorithm = SpmvAlgorithm.AUTO):
        self.A = A
        # remember whether the caller pinned an algorithm: the f64 auto-route
        # in __call__ must not override an explicit (non-AUTO/DS) choice
        self._user_algorithm = algorithm
        if isinstance(A, BsrMatrix):
            if algorithm == SpmvAlgorithm.AUTO:
                # a banded block graph is a banded SCALAR matrix: each b×b
                # block diagonal contributes 2b-1 dense scalar diagonals, so
                # the streaming DIA pallas kernel serves it at HBM rate —
                # ~20x the gather+segment-sum block path (the MXU analog of
                # the reference's SPMV_BSR_TC special casing,
                # _spmv_bsrmatrix_impl.hpp:71-88, without needing the MXU)
                from ..containers.convert import bsr2crs

                csr = bsr2crs(A)
                offs = spmv_impl.detect_dia_offsets(csr, max_diags=256)
                if offs is not None and len(offs) * csr.nrows <= 4 * max(csr.nnz, 1):
                    self.A = csr
                    algorithm = SpmvAlgorithm.DIA
                else:
                    algorithm = SpmvAlgorithm.BSR
            elif algorithm != SpmvAlgorithm.BSR:
                algorithm = SpmvAlgorithm.BSR
        elif algorithm == SpmvAlgorithm.AUTO:
            algorithm = _choose_algorithm(A)
        self.algorithm = algorithm
        self._plans = {}
        self._transposed: Optional["SpmvHandle"] = None
        self._conjugated: Optional["SpmvHandle"] = None
        self._cpair = None                # complex64 (re, im) real handles
        self._force_complex_pair = False  # tests: engage the pair off-TPU

    # -- plan construction (symbolic phase, host-side, cached) ----------
    def _plan(self, key):
        if key in self._plans:
            return self._plans[key]
        # plans are compile-time constants even when the first call happens
        # inside a jit trace (lazily-built handles must not cache tracers)
        import jax

        with jax.ensure_compile_time_eval():
            return self._build_plan(key)

    def _build_plan(self, key):
        A = self.A
        if key == "ell":
            p = spmv_impl.build_ell_plan(A)
        elif key == "dia":
            p = spmv_impl.build_dia_plan(A)
        elif key == "dia_pallas":
            from . import spmv_pallas

            p = spmv_pallas.build_dia_pallas_plan(self._plan("dia"))
        elif key == "onehot":
            from . import spmv_pallas

            p = spmv_pallas.build_onehot_spmv_plan(A)
        elif key == "segsum":
            p = spmv_impl.build_segsum_plan(A)
        elif key == "dense":
            p = jnp.asarray(A.to_dense())
        elif key == "rcm":
            from .. import native
            from ..containers import CsrMatrix as _Csr

            sp = A.to_scipy().tocsr()
            perm = native.rcm(sp.indptr, sp.indices, A.nrows)
            if perm is None:
                import scipy.sparse.csgraph as csg

                perm = csg.reverse_cuthill_mckee(sp, symmetric_mode=False)
            pm = np.asarray(perm, np.int64)
            spp = sp[pm][:, pm].tocsr()
            spp.sort_indices()
            perm_h = SpmvHandle(_Csr.from_scipy(spp, value_dtype=A.dtype))
            inv = np.empty(A.nrows, np.int64)
            inv[pm] = np.arange(A.nrows)
            # permute_via_sort(x, key): out[i] = x[argsort(key)[i]];
            # to-permuted wants out[i] = x[pm[i]] -> key = inv; back: key = pm
            p = (perm_h, jnp.asarray(inv.astype(np.int32)),
                 jnp.asarray(pm.astype(np.int32)))
        elif key == "ds":
            from . import spmv_pallas

            offs = spmv_impl.detect_dia_offsets(A, max_diags=32)
            p = None
            if offs is not None and len(offs) * A.nrows <= 4 * max(A.nnz, 1):
                # DiaDsPlan refuses diagonal spans wider than its x-chunk
                # (e.g. a 5-pt Laplacian with nx >= chunk): fall through to
                # the unstructured ds plan instead of crashing the auto-route
                try:
                    p = spmv_pallas.DiaDsPlan(spmv_impl.build_dia_plan(A))
                except ValueError:
                    p = None
            if p is None:
                p = spmv_pallas.build_onehot_ds_plan(A)  # may be None
        elif key == "bsr_rows":
            p = spmv_impl.build_bsr_rows(A)
        else:  # pragma: no cover
            raise KeyError(key)
        self._plans[key] = p
        return p

    def transposed(self) -> "SpmvHandle":
        if self._transposed is None:
            check(isinstance(self.A, CsrMatrix), "transpose mode: CSR only for now")
            self._transposed = SpmvHandle(_transpose(self.A), self.algorithm)
        return self._transposed

    def conjugated(self) -> "SpmvHandle":
        """Handle on conj(A) — identical plan shapes, conjugated values."""
        if self._conjugated is None:
            if not jnp.iscomplexobj(self.A.values):
                self._conjugated = self
            elif isinstance(self.A.values, np.ndarray):
                # values deliberately host-resident (attachments that cannot
                # hold complex device arrays): conjugate on host so modes
                # C/H never force a complex device transfer
                cA = CsrMatrix.from_arrays(
                    self.A.host_row_map(), self.A.host_entries(),
                    np.conj(self.A.host_values_full()),
                    nrows=self.A.nrows, ncols=self.A.ncols)
                self._conjugated = SpmvHandle(cA, self.algorithm)
            else:
                self._conjugated = SpmvHandle(
                    self.A.with_values(jnp.conj(self.A.values)), self.algorithm)
        return self._conjugated

    # -- complex via four real fast-kernel products ----------------------
    def _complex_pair(self):
        """(re_handle, im_handle) over A's real/imag parts (same pattern) —
        complex64 SpMV as 4 real products through the Pallas fast paths
        instead of the ~10x-slower XLA-only complex ops (the reference
        treats complex as a first-class ETI scalar; this is the TPU
        equivalent: decompose onto the f32 kernels)."""
        if self._cpair is None:
            # host-side split (from_arrays prefills host mirrors): the plan
            # builders then never read back device arrays
            rm = self.A.host_row_map()
            ent = self.A.host_entries()
            v = np.asarray(self.A.host_values_full())
            Ar = CsrMatrix.from_arrays(rm, ent, np.real(v).astype(np.float32),
                                       nrows=self.A.nrows, ncols=self.A.ncols)
            Ai = CsrMatrix.from_arrays(rm, ent, np.imag(v).astype(np.float32),
                                       nrows=self.A.nrows, ncols=self.A.ncols)
            self._cpair = (SpmvHandle(Ar), SpmvHandle(Ai))
        return self._cpair

    # -- numeric phase --------------------------------------------------
    def matvec(self, x):
        """op-free A·x (or A·X for multivector)."""
        if (jnp.iscomplexobj(self.A.values)
                and jnp.result_type(self.A.values.dtype) == jnp.complex64):
            from . import spmv_pallas

            if spmv_pallas.supports_pallas() or self._force_complex_pair:
                hr, hi = self._complex_pair()
                if isinstance(x, np.ndarray):
                    # host complex in -> f32 planes on device -> host
                    # complex out (some TPU attachments cannot hold
                    # complex64 device arrays at all; mirrors the f64 ds
                    # route's host-ndarray convention)
                    xr = jnp.asarray(np.real(x).astype(np.float32))
                    xi = jnp.asarray(np.imag(x).astype(np.float32))
                    yr = hr.matvec(xr) - hi.matvec(xi)
                    yi = hr.matvec(xi) + hi.matvec(xr)
                    return np.asarray(yr) + 1j * np.asarray(yi)
                xc = x
                xr = jnp.real(xc).astype(jnp.float32)
                xi = jnp.imag(xc).astype(jnp.float32)
                yr = hr.matvec(xr) - hi.matvec(xi)
                yi = hr.matvec(xi) + hi.matvec(xr)
                return jax.lax.complex(yr, yi)
        alg = self.algorithm
        if alg == SpmvAlgorithm.ELL:
            return spmv_impl.apply_ell(self._plan("ell"), x)
        if alg == SpmvAlgorithm.DIA:
            from . import spmv_pallas

            if spmv_pallas.supports_pallas() and (
                    x.ndim == 1 or x.shape[1] <= 64):
                # 2-D: fused multi-RHS kernel (one diagonal pass serves all
                # columns); >64 RHS would not fit the VMEM x window
                return spmv_pallas.apply(self, x)
            return spmv_impl.apply_dia(self._plan("dia"), x)
        if alg == SpmvAlgorithm.ONEHOT:
            from . import spmv_pallas

            if spmv_pallas.supports_pallas():
                if x.ndim == 1:
                    return spmv_pallas.onehot_spmv(self._plan("onehot"), x)
                if 1 < x.shape[1] <= 16:  # VMEM: k x-tiles resident per step
                    return spmv_pallas.onehot_spmm(self._plan("onehot"), x)
            return spmv_impl.apply_ell(self._plan("ell"), x)  # SpMM amortizes gathers
        if alg == SpmvAlgorithm.SEGSUM:
            return spmv_impl.apply_segsum(self._plan("segsum"), self.A, x)
        if alg == SpmvAlgorithm.DENSE:
            return spmv_impl.apply_dense(self._plan("dense"), x)
        if alg == SpmvAlgorithm.BSR:
            return spmv_impl.apply_bsr(self.A, self._plan("bsr_rows"), x)
        if alg == SpmvAlgorithm.PALLAS:
            from . import spmv_pallas

            return spmv_pallas.apply(self, x)
        if alg == SpmvAlgorithm.RCM:
            perm_h, key_in, key_out = self._plan("rcm")
            from ..common import permute_via_sort

            xp = permute_via_sort(x, key_in)
            yp = perm_h.matvec(xp)
            return permute_via_sort(yp, key_out)
        raise NotImplementedError(alg)

    # -- RCM permuted-space interface (solver fast path) ----------------
    def rcm_permuted(self):
        """(handle_on_PAPt, to_permuted, from_permuted): the RCM route's
        kernel handle plus converters.  Iterative solvers should convert
        once, iterate in permuted space (measured fem2d30k: 10.5 us/spmv
        permuted vs 16.3 direct; the two runtime permutes of the public
        RCM matvec cost ~15 us EACH at 30k rows, so the one-shot route
        only wins when vectors stay permuted)."""
        perm_h, key_in, key_out = self._plan("rcm")
        from ..common import permute_via_sort

        return (perm_h, lambda v: permute_via_sort(v, key_in),
                lambda v: permute_via_sort(v, key_out))

    # -- f64 double-single path (x64-free) ------------------------------
    def _narrowed_f64(self) -> bool:
        """True when the matrix was built from f64 data but the device copy
        was narrowed to f32 (x64 off — the TPU situation)."""
        full = getattr(self.A, "host_values_full", None)
        return (full is not None and full().dtype == np.float64
                and jnp.result_type(self.A.values.dtype) == jnp.float32)

    def matvec_f64(self, x):
        """y = A·x at ~1e-13 rel for an f64 matrix on an x64-free device:
        double-single (two-f32) kernels — DIA planes for banded patterns,
        the gi4-locked gather-table kernel otherwise.  Host numpy in/out;
        exact host product as the fallback when no ds plan applies.
        Reference parity: double is the default ETI scalar
        (cmake/KokkosKernels_config.h.in:44-105)."""
        from . import spmv_pallas

        x = np.asarray(x, np.float64)
        if spmv_pallas.supports_pallas():
            p = self._plan("ds")
            if p is not None:
                if isinstance(p, spmv_pallas.DiaDsPlan):
                    return spmv_pallas.dia_spmv_ds(p, x)
                return spmv_pallas.onehot_spmv_ds(p, x)
        if not getattr(self, "_warned_host_f64", False):
            self._warned_host_f64 = True
            import warnings

            warnings.warn(
                "spmv f64: no double-single device plan applies to this "
                "matrix; computing on host (scipy) each call — exact but "
                "device->host synchronous", RuntimeWarning, stacklevel=3)
        return self.A.to_scipy() @ x

    def __call__(self, x, alpha=1.0, beta=0.0, y=None, mode: str = "N"):
        m = mode.upper()
        check(m in ("N", "T", "C", "H"), f"spmv: invalid mode '{mode}'")
        # f64 matrix + host f64 vector on a narrowed device: route through
        # the double-single kernels (silently computing in f32 would be a
        # 1e-8 precision lie; the reference's default scalar is double).
        # NOTE: this route supersedes the handle's AUTO-chosen algorithm and
        # returns a HOST f64 ndarray (a device array cannot hold f64 with
        # x64 off — returning one would round the result and defeat the
        # route).  An explicitly pinned non-DS algorithm is respected.
        if (self.algorithm == SpmvAlgorithm.DS
                or (m == "N" and isinstance(x, np.ndarray)
                    and x.dtype == np.float64 and x.ndim == 1
                    and self._narrowed_f64()
                    and self._user_algorithm in (SpmvAlgorithm.AUTO,
                                                 SpmvAlgorithm.DS))):
            check(m == "N", "spmv ds: mode N only")
            ax = self.matvec_f64(x)
            if y is None or _is_zero(beta):
                return ax if _is_one(alpha) else alpha * ax
            return beta * np.asarray(y, np.float64) + alpha * ax
        h = self
        if m in ("T", "H"):
            h = self.transposed()
        if m in ("C", "H"):
            # materialize conjugated values (cached) to keep one code path
            h = h.conjugated()
        _check_dims(h.A, x, y, m)
        # algorithm-labeled region, the pushRegion analog
        # (sparse/src/KokkosSparse_spmv.hpp:261-266)
        with profile_region(region_name("spmv", m, h.algorithm.name)):
            ax = h.matvec(x)
            if y is None or _is_zero(beta):
                out = ax if _is_one(alpha) else alpha * ax
            else:
                out = beta * y + alpha * ax
            return out.astype(x.dtype)


def _is_zero(c):
    return isinstance(c, (int, float)) and c == 0


def _is_one(c):
    return isinstance(c, (int, float)) and c == 1


def _check_dims(A, x, y, mode):
    nr, nc = A.shape
    check(x.shape[0] == nc, f"spmv: x has {x.shape[0]} rows, expected {nc}")
    if y is not None:
        check(y.shape[0] == nr, f"spmv: y has {y.shape[0]} rows, expected {nr}")
        check(x.ndim == y.ndim, "spmv: x/y rank mismatch")


_handle_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cached_handle(A) -> SpmvHandle:
    try:
        h = _handle_cache.get(A)
    except TypeError:  # unhashable / not weakref-able
        return SpmvHandle(A)
    if h is None:
        h = SpmvHandle(A)
        _handle_cache[A] = h
    return h


def spmv(A, x, alpha=1.0, beta=0.0, y=None, mode: str = "N",
         algorithm: SpmvAlgorithm = SpmvAlgorithm.AUTO):
    """Convenience overload building (and caching) a handle — the analog of
    the handle-less spmv overload (KokkosSparse_spmv.hpp:77)."""
    if algorithm == SpmvAlgorithm.AUTO:
        h = _cached_handle(A)
    else:
        h = SpmvHandle(A, algorithm)
    return h(x, alpha=alpha, beta=beta, y=y, mode=mode)


def spmm(A, X, alpha=1.0, beta=0.0, Y=None, mode: str = "N",
         algorithm: SpmvAlgorithm = SpmvAlgorithm.AUTO):
    """Multivector SpMM (rank-2 X) — the reference folds this into spmv's MV
    overloads; we expose an explicit alias."""
    check(X.ndim == 2, "spmm: X must be rank-2")
    return spmv(A, X, alpha=alpha, beta=beta, y=Y, mode=mode, algorithm=algorithm)
