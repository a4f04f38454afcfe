"""Tracing / profiling integration — the Kokkos Tools analog.

The reference names every kernel (sparse/impl/KokkosSparse_spmv_impl.hpp:331
``"KokkosSparse::spmv<NoTranspose,Static>"``) and wraps each public API in a
profiling region with an algorithm-labeled string
(sparse/src/KokkosSparse_spmv.hpp:261-266 ``pushRegion/popRegion``), so any
externally-attached profiler sees structured names.  The TPU-native
equivalents are:

* :func:`profile_region` — ``jax.named_scope`` (labels ops in the lowered HLO
  so XLA traces / xprof attribute time to the region) combined with
  ``jax.profiler.TraceAnnotation`` (labels host-side dispatch in profiler
  timelines).  Used by every public API entry point, with algorithm-labeled
  strings like ``tpukk::spmv<N,DIA>``.
* every ``pallas_call`` carries a ``name=`` so Mosaic kernels show up as
  named XLA custom-calls.
* :func:`trace` / ``Controls.set("profiler_trace_dir", dir)`` — an opt-in
  ``jax.profiler`` session around a region of user code (the "attach a Kokkos
  Tools profiler" analog).
"""
from __future__ import annotations

import contextlib
import functools

import jax

__all__ = ["profile_region", "annotate", "trace", "region_name"]


def region_name(api: str, *labels) -> str:
    """Build an algorithm-labeled region string, e.g.
    ``region_name('spmv', 'N', 'DIA') == 'tpukk::spmv<N,DIA>'`` — the analog
    of the reference's ``"KokkosSparse::spmv[NATIVE,...]"`` strings."""
    labels = [str(x) for x in labels if x is not None and str(x)]
    return f"tpukk::{api}" + (f"<{','.join(labels)}>" if labels else "")


@contextlib.contextmanager
def profile_region(name: str):
    """Region with both trace-time (named_scope → HLO metadata) and run-time
    (TraceAnnotation → profiler timeline) labels.  Safe inside jit tracing.
    Analog of Kokkos::Profiling::pushRegion/popRegion."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


def annotate(api: str, *labels):
    """Decorator putting a function body inside :func:`profile_region`.
    The wrapped function carries ``_tpukk_region`` (the region string) so
    coverage is testable (tests/test_tracing.py asserts every public API is
    instrumented — the reference names literally every kernel,
    sparse/impl/KokkosSparse_spmv_impl.hpp:331)."""
    name = region_name(api, *labels)

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with profile_region(name):
                return fn(*args, **kwargs)

        wrapper._tpukk_region = name
        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of the enclosed block into
    ``log_dir`` (viewable with xprof/tensorboard).  This is the external
    profiler attach point the reference delegates to Kokkos Tools."""
    with jax.profiler.trace(log_dir):
        yield
