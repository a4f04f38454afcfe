"""Native host runtime — C++ plan builders behind the Python symbolic phases.

Compiled lazily with g++ on first use (cached next to the source, keyed by
source mtime); every entry point has a pure-Python fallback in its caller, so
absence of a toolchain degrades performance, not capability.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "d1_greedy_color", "d2_greedy_color", "gt_assign_lanes", "gt_build", "gt_place", "gt_place2", "iluk_depth", "iluk_symbolic", "ilu_numeric", "csr_transpose", "mdf_order", "permute_route", "permute_route_rows", "rcm", "spgemm_symbolic", "triangle_count"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tpukk_native.cpp")
_SO = os.path.join(_HERE, "libtpukk_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.tpukk_d1_greedy_color.restype = ctypes.c_int32
            lib.tpukk_d1_greedy_color.argtypes = [ctypes.c_int64, i32p, i32p, i32p]
            lib.tpukk_iluk_symbolic.restype = ctypes.c_int64
            lib.tpukk_iluk_symbolic.argtypes = [
                ctypes.c_int64, ctypes.c_int32, i32p, i32p,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.tpukk_ilu_numeric.restype = ctypes.c_int32
            lib.tpukk_ilu_numeric.argtypes = [
                ctypes.c_int64, i32p, i32p, i32p, i32p, f64p, f64p]
            lib.tpukk_mdf_order.restype = None
            lib.tpukk_mdf_order.argtypes = [
                ctypes.c_int64, i32p, i32p, f64p, i32p]
            lib.tpukk_spgemm_symbolic_count.restype = ctypes.c_int64
            lib.tpukk_spgemm_symbolic_count.argtypes = [
                ctypes.c_int64, i32p, i32p, ctypes.c_int64, i32p, i32p, i32p]
            lib.tpukk_spgemm_pairs.restype = None
            lib.tpukk_spgemm_pairs.argtypes = [
                ctypes.c_int64, i32p, i32p, ctypes.c_int64, i32p, i32p,
                i32p, i32p, i32p, i32p, i32p]
            lib.tpukk_csr_transpose.restype = None
            lib.tpukk_csr_transpose.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i32p, i32p, f64p, i32p, i32p, f64p]
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.tpukk_gt_place.restype = ctypes.c_int64
            lib.tpukk_gt_place.argtypes = [
                ctypes.c_int64, i64p, i32p, i32p, i32p,
                ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, i32p,
                ctypes.c_void_p, ctypes.c_int32]
            lib.tpukk_gt_place2.restype = ctypes.c_int64
            lib.tpukk_gt_place2.argtypes = [
                ctypes.c_int64, i64p, i32p, i32p, i32p, i32p, i32p,
                ctypes.c_int32, ctypes.c_int32,
                i32p, i32p, i32p, i32p, i32p]
            i64po = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.tpukk_triangle_count.restype = ctypes.c_int64
            lib.tpukk_triangle_count.argtypes = [ctypes.c_int64, i32p, i32p,
                                                 i64po]
            lib.tpukk_gt_assign_lanes.restype = None
            lib.tpukk_gt_assign_lanes.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i32p, i32p, i32p]
            lib.tpukk_permute_route.restype = ctypes.c_int32
            lib.tpukk_permute_route.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i32p, i32p, i32p]
            lib.tpukk_gt_build.restype = ctypes.c_int64
            lib.tpukk_gt_build.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, i32p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double, i64p]
            lib.tpukk_gt_fetch.restype = ctypes.c_int32
            lib.tpukk_gt_fetch.argtypes = [
                i32p, i32p, ctypes.c_void_p, i32p, i32p, i32p, i32p]
            lib.tpukk_gt_fetch_lane_tab.restype = ctypes.c_int32
            lib.tpukk_gt_fetch_lane_tab.argtypes = [i32p]
            lib.tpukk_permute_route_rows.restype = ctypes.c_int32
            lib.tpukk_permute_route_rows.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, i32p]
            lib.tpukk_iluk_depth.restype = ctypes.c_int32
            lib.tpukk_iluk_depth.argtypes = [ctypes.c_int64, i32p, i32p]
            lib.tpukk_rcm.restype = None
            lib.tpukk_rcm.argtypes = [ctypes.c_int64, i32p, i32p, i32p]
            lib.tpukk_d2_greedy_color.restype = ctypes.c_int32
            lib.tpukk_d2_greedy_color.argtypes = [
                ctypes.c_int64, i32p, i32p, ctypes.c_int64, i32p, i32p,
                ctypes.c_int32, i32p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _i32(x):
    return np.ascontiguousarray(x, dtype=np.int32)


def d1_greedy_color(row_map, entries, n) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    colors = np.zeros(n, np.int32)
    lib.tpukk_d1_greedy_color(n, _i32(row_map), _i32(entries), colors)
    return colors


def iluk_symbolic(indptr, indices, n, k):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    indptr = _i32(indptr)
    indices = _i32(indices)
    nnz = lib.tpukk_iluk_symbolic(n, k, indptr, indices, None, None)
    out_indptr = np.zeros(n + 1, np.int32)
    out_indices = np.zeros(max(nnz, 1), np.int32)
    lib.tpukk_iluk_symbolic(
        n, k, indptr, indices,
        out_indptr.ctypes.data_as(ctypes.c_void_p),
        out_indices.ctypes.data_as(ctypes.c_void_p))
    return out_indptr, out_indices[:nnz]


def ilu_numeric(p_indptr, p_indices, a_indptr, a_indices, a_values, n):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    lu_vals = np.zeros(len(p_indices), np.float64)
    rc = lib.tpukk_ilu_numeric(
        n, _i32(p_indptr), _i32(p_indices), _i32(a_indptr), _i32(a_indices),
        np.ascontiguousarray(a_values, np.float64), lu_vals)
    if rc != 0:
        raise RuntimeError(f"ilu_numeric failed (rc={rc}: "
                           f"{'missing diagonal' if rc == -1 else 'zero pivot'})")
    return lu_vals


def csr_transpose(indptr, indices, values, nrows, ncols):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nnz = len(indices)
    t_indptr = np.zeros(ncols + 1, np.int32)
    t_indices = np.zeros(nnz, np.int32)
    t_values = np.zeros(nnz, np.float64)
    lib.tpukk_csr_transpose(
        nrows, ncols, _i32(indptr), _i32(indices),
        np.ascontiguousarray(values, np.float64), t_indptr, t_indices, t_values)
    return t_indptr, t_indices, t_values


def mdf_order(indptr, indices, values, n):
    """MDF greedy elimination order; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    order = np.empty(n, np.int32)
    lib.tpukk_mdf_order(n, _i32(indptr), _i32(indices),
                        np.ascontiguousarray(values, np.float64), order)
    return order


def gt_place(run_off, lane, lo, hi, T: int, max_grow: int = 4, srow=None):
    """Conflict-aware v7 slot placement (see tpukk_gt_place in the C++);
    None if the native lib is unavailable.  srow locks each element's
    sublane (the identity-scatter layout).  Returns (c, s, ti,
    nch_per_run); c == -1 marks elements the greedy could not place."""
    lib = _load()
    if lib is None:
        return None
    run_off = np.ascontiguousarray(run_off, np.int64)
    n = int(run_off[-1])
    n_runs = len(run_off) - 1
    out_c = np.empty(n, np.int32)
    out_s = np.empty(n, np.int32)
    out_ti = np.empty(n, np.int32)
    out_nch = np.empty(n_runs, np.int32)
    sr = _i32(srow) if srow is not None else None
    lib.tpukk_gt_place(n_runs, run_off, _i32(lane), _i32(lo), _i32(hi),
                       T, max_grow, out_c, out_s, out_ti, out_nch,
                       sr.ctypes.data_as(ctypes.c_void_p) if sr is not None else None,
                       1 if sr is not None else 0)
    return out_c, out_s, out_ti, out_nch


def gt_place2(run_off, lane, loA, hiA, loB, hiB, T: int, max_grow: int = 4):
    """Dual-cell v7 pair placement (see tpukk_gt_place2); None if the
    native lib is unavailable.  Returns (c, s, tiA, tiB, nch_per_run)."""
    lib = _load()
    if lib is None:
        return None
    run_off = np.ascontiguousarray(run_off, np.int64)
    n = int(run_off[-1])
    n_runs = len(run_off) - 1
    out_c = np.empty(n, np.int32)
    out_s = np.empty(n, np.int32)
    out_tiA = np.empty(n, np.int32)
    out_tiB = np.empty(n, np.int32)
    out_nch = np.empty(n_runs, np.int32)
    lib.tpukk_gt_place2(n_runs, run_off, _i32(lane), _i32(loA), _i32(hiA),
                        _i32(loB), _i32(hiB), T, max_grow,
                        out_c, out_s, out_tiA, out_tiB, out_nch)
    return out_c, out_s, out_tiA, out_tiB, out_nch


def triangle_count(row_map, entries, n):
    """Per-row + total triangle count over a strict-lower-triangular CSR;
    None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    per_row = np.zeros(n, np.int64)
    total = lib.tpukk_triangle_count(n, _i32(row_map), _i32(entries), per_row)
    return int(total), per_row


def gt_assign_lanes(nd, ns, pair_off, pair_st, pair_cnt):
    """Balanced per-tile dst-lane assignment (see tpukk_gt_assign_lanes);
    None if the native lib is unavailable.  Returns lane per padded row
    (nd*1024,), a bijection within each (tile, sublane-group)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(nd * 1024, np.int32)
    lib.tpukk_gt_assign_lanes(nd, ns, np.ascontiguousarray(pair_off, np.int64),
                              _i32(pair_st), _i32(pair_cnt), out)
    return out


def permute_route_rows(t_rows, SRR):
    """Batched inner routing + 3-stage packing for n_rows row permutations
    (see tpukk_permute_route_rows); None if unavailable or routing fails."""
    lib = _load()
    if lib is None:
        return None
    t_rows = np.ascontiguousarray(t_rows, np.int64)
    n_rows = t_rows.shape[0]
    out = np.empty((n_rows, SRR * 128), np.int32)
    rc = lib.tpukk_permute_route_rows(n_rows, SRR, t_rows.reshape(-1), out)
    return out if rc == 0 else None


def permute_route(R, C, src):
    """3-phase local-permute routing tables for a static permutation on an
    (R, C) grid (see tpukk_permute_route); None if the native lib is
    unavailable.  Returns (t1 [R*C], t2 [C*R], t3 [R*C]) int32."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    t1 = np.empty(R * C, np.int32)
    t2 = np.empty(C * R, np.int32)
    t3 = np.empty(R * C, np.int32)
    rc = lib.tpukk_permute_route(R, C, src, t1, t2, t3)
    if rc != 0:
        raise ValueError("permute_route: invalid input (C must be a power "
                         "of two, src a permutation)")
    return t1, t2, t3


def gt_build(rm, ent, n, m, td, ts, force_layout=0, max_grow_gi=8,
             max_grow_dl=4, force_batch=0, use_lane_tab=True,
             force_group=0, fix_us=0.235, var_gi4=0.0115, var_dlp=0.022):
    """Full v9 gather-table stream build (see tpukk_gt_build); None when the
    native lib is unavailable or the build must fall back to Python (layout
    overflow, unsupported sizes).  Returns a dict with the packed streams +
    the per-slot element-index map (eidx; -1 = empty) so callers gather any
    value plane without re-running the build."""
    lib = _load()
    if lib is None:
        return None
    rm = np.ascontiguousarray(rm, np.int64)
    ent = _i32(ent)
    meta = np.zeros(9, np.int64)
    rc = lib.tpukk_gt_build(n, m, len(ent), rm, ent, td, ts,
                            force_layout, max_grow_gi, max_grow_dl,
                            force_batch, 1 if use_lane_tab else 0,
                            int(force_group),
                            fix_us, var_gi4, var_dlp, meta)
    if rc != 0:
        return None
    (S, n_ss, B, layout, n_valid, nd, ns, has_tab,
     group) = (int(v) for v in meta[:9])
    pk = np.empty(S * 1024, np.int32)
    eidx = np.empty(S * 1024, np.int32)
    rhi = np.empty(S * 1024, np.int32) if layout == 1 else None
    src_ids = np.empty(S, np.int32)
    dst_ss = np.empty(n_ss, np.int32)
    first_ss = np.empty(n_ss, np.int32)
    cnt_ss = np.empty(n_ss, np.int32)
    lib.tpukk_gt_fetch(
        pk, eidx,
        rhi.ctypes.data_as(ctypes.c_void_p) if rhi is not None else None,
        src_ids, dst_ss, first_ss, cnt_ss)
    lane_tab = None
    if has_tab:
        lane_tab = np.empty(nd * 1024, np.int32)
        lib.tpukk_gt_fetch_lane_tab(lane_tab)
    return {"pk": pk, "eidx": eidx, "rhi": rhi, "src_ids": src_ids,
            "dst_ss": dst_ss, "first_ss": first_ss, "cnt_ss": cnt_ss,
            "S": S, "n_ss": n_ss, "B": B,
            "layout": "gi4" if layout == 0 else "dlp",
            "n_valid": n_valid, "nd": nd, "ns": ns, "lane_tab": lane_tab,
            "G": group}


def iluk_depth(row_map, entries, n):
    """Entry-dependency DAG depth of an ILU(k) pattern (= the exact sweep
    count for the device numeric); None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.tpukk_iluk_depth(n, _i32(row_map), _i32(entries)))


def rcm(row_map, entries, n):
    """Reverse Cuthill-McKee permutation (perm[new] = old) over a symmetric
    pattern; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    perm = np.empty(n, np.int32)
    lib.tpukk_rcm(n, _i32(row_map), _i32(entries), perm)
    return perm


def d2_greedy_color(row_map, entries, n, row_map_t=None, entries_t=None,
                    m=None, include_d1=True):
    """Distance-2 greedy coloring without materializing G²; None if the
    native lib is unavailable.  Square-symmetric mode when no transpose is
    given.  Returns 1-based colors."""
    lib = _load()
    if lib is None:
        return None
    rm = _i32(row_map); ent = _i32(entries)
    if row_map_t is None:
        rm_t, ent_t, m = rm, ent, n
    else:
        rm_t, ent_t = _i32(row_map_t), _i32(entries_t)
    colors = np.zeros(n, np.int32)
    lib.tpukk_d2_greedy_color(n, rm, ent, m, rm_t, ent_t,
                              1 if include_d1 else 0, colors)
    return colors


def spgemm_symbolic(rmA, ciA, n, bcols, rmB, ciB):
    """C pattern + c-sorted pair plan; None if the native lib is unavailable.
    Returns (row_map_c i32, entries_c i32, a_idx, b_idx, c_idx)."""
    lib = _load()
    if lib is None:
        return None
    rmA = _i32(rmA); ciA = _i32(ciA); rmB = _i32(rmB); ciB = _i32(ciB)
    row_map_c = np.empty(n + 1, np.int32)
    nnz_c = lib.tpukk_spgemm_symbolic_count(n, rmA, ciA, bcols, rmB, ciB,
                                            row_map_c)
    blen = (rmB[1:] - rmB[:-1]).astype(np.int64)
    P = int(blen[ciA].sum())
    if P >= 2**31 or int(rmB[-1]) >= 2**31:
        return None  # int32 pair plan would overflow
    entries_c = np.empty(int(nnz_c), np.int32)
    a_idx = np.empty(P, np.int32)
    b_idx = np.empty(P, np.int32)
    c_idx = np.empty(P, np.int32)
    lib.tpukk_spgemm_pairs(n, rmA, ciA, bcols, rmB, ciB, row_map_c,
                           entries_c, a_idx, b_idx, c_idx)
    return row_map_c, entries_c, a_idx, b_idx, c_idx
