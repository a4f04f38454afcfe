"""Error handling — analog of common/src/KokkosKernels_Error.hpp:26
(`throw_runtime_exception`).  API-layer argument validation raises these before
any device work is traced, mirroring the reference's static_asserts + runtime
dim checks at L1 entry points (e.g. sparse/src/KokkosSparse_spmv.hpp:80-141).
"""
from __future__ import annotations

__all__ = ["TpuKKError", "check", "check_rank", "check_same_dtype"]


class TpuKKError(RuntimeError):
    pass


def check(cond: bool, msg: str):
    if not cond:
        raise TpuKKError(msg)


def check_rank(x, rank: int, name: str):
    if x.ndim != rank:
        raise TpuKKError(f"{name}: expected rank-{rank} array, got rank {x.ndim}")


def check_same_dtype(name: str, *arrays):
    dts = {a.dtype for a in arrays}
    if len(dts) > 1:
        raise TpuKKError(f"{name}: mismatched dtypes {sorted(map(str, dts))}")
