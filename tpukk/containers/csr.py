"""CSR sparse matrix container — TPU-native analog of
sparse/src/KokkosSparse_CrsMatrix.hpp:96 (`CrsMatrix`) and
sparse/src/KokkosSparse_StaticCrsGraph.hpp:61-123 (`StaticCrsGraph`).

Design: an immutable pytree of three jnp arrays (row_map, entries, values) plus
static (nrows, ncols).  All nnz-dependent shapes are static once constructed,
so every kernel jit-specializes per sparsity pattern — the functional analog of
the reference's symbolic/numeric handle-reuse contract.  Host-side numpy
mirrors of row_map/entries are kept for plan (symbolic) construction, which the
TPU design deliberately performs on host (SURVEY.md §7.3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check, default_offset, default_ordinal

__all__ = ["StaticCrsGraph", "CsrMatrix"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StaticCrsGraph:
    """row_map (n+1 offsets) + entries (column ids); cf. StaticCrsGraph.hpp:61."""

    row_map: Any  # (nrows+1,) offset dtype
    entries: Any  # (nnz,) ordinal dtype
    nrows: int = dataclasses.field(metadata=dict(static=True))
    ncols: int = dataclasses.field(metadata=dict(static=True))

    def tree_flatten(self):
        return (self.row_map, self.entries), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def nnz(self) -> int:
        return int(self.entries.shape[0])

    def host_row_map(self) -> np.ndarray:
        return _host_mirror(self, "row_map")

    def host_entries(self) -> np.ndarray:
        return _host_mirror(self, "entries")


def _host_mirror(obj, field: str) -> np.ndarray:
    """Device->host copies dominate plan-build time on tunneled TPUs, so host
    mirrors are fetched once and cached (outside the pytree leaves)."""
    cache = obj.__dict__.setdefault("_hcache", {})
    if field not in cache:
        cache[field] = np.asarray(getattr(obj, field))
    return cache[field]


@functools.lru_cache(maxsize=1)
def _complex_on_device_ok() -> bool:
    """Whether the default backend can hold complex64 arrays at all.  The
    axon TPU attachment cannot (every transfer/op is UNIMPLEMENTED, and a
    FAILED complex transfer wedges the relay for subsequent transfers —
    both observed round 3), so the check must be attempt-free: a platform
    test, not a probe.  When unsupported, complex matrix values stay
    HOST-resident; the complex SpMV route decomposes onto f32 device
    kernels anyway."""
    import jax

    d = jax.devices()[0]
    if d.platform == "axon":
        return False
    try:  # the relay registers as 'tpu' but its PJRT version string says axon
        if "axon" in getattr(d.client, "platform_version", "").lower():
            return False
    except Exception:
        pass
    return True


def _values_to_device(values):
    if np.iscomplexobj(np.asarray(values) if not hasattr(values, "dtype")
                       else values) and not _complex_on_device_ok():
        return np.asarray(values)
    return jnp.asarray(values)


def _prefill_host(obj, **arrays) -> None:
    cache = obj.__dict__.setdefault("_hcache", {})
    for field, arr in arrays.items():
        if isinstance(arr, np.ndarray):
            dev_dtype = getattr(obj, field).dtype
            # keep the UN-narrowed original too: with x64 disabled jnp
            # narrows f64 -> f32, but the double-single f64 kernel plan
            # needs the full-precision values (host_values_full)
            if (field == "values" and arr.dtype == np.float64
                    and dev_dtype != np.float64):
                cache["values_full"] = arr
            # match the device dtype (jnp.asarray may have narrowed int64/f64)
            cache[field] = arr.astype(dev_dtype, copy=False)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CsrMatrix:
    """CSR matrix: graph + values (cf. KokkosSparse_CrsMatrix.hpp:96,215).

    ``values`` may be any float dtype; indices are i32 by default.  The object
    is a pytree, so it flows through jit/vmap/shard_map directly.
    """

    row_map: Any
    entries: Any
    values: Any
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.row_map, self.entries, self.values), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls(children[0], children[1], children[2], aux[0], aux[1])
        return obj

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_arrays(cls, row_map, entries, values, nrows=None, ncols=None):
        rm0, en0, va0 = row_map, entries, values
        row_map = jnp.asarray(row_map)
        entries = jnp.asarray(entries)
        values = _values_to_device(values)
        if nrows is None:
            nrows = int(row_map.shape[0]) - 1
        check(ncols is not None, "CsrMatrix.from_arrays: ncols is required")
        check(row_map.shape[0] == nrows + 1, "CsrMatrix: row_map must have nrows+1 entries")
        check(entries.shape == values.shape[:1], "CsrMatrix: entries/values length mismatch")
        obj = cls(row_map, entries, values, int(nrows), int(ncols))
        _prefill_host(obj, row_map=rm0, entries=en0, values=va0)
        return obj

    @classmethod
    def from_scipy(cls, sp, value_dtype=None, ordinal_dtype=default_ordinal, offset_dtype=default_offset):
        csr = sp.tocsr()
        vals = csr.data if value_dtype is None else csr.data.astype(value_dtype)
        obj = cls(
            jnp.asarray(csr.indptr, dtype=offset_dtype),
            jnp.asarray(csr.indices, dtype=ordinal_dtype),
            _values_to_device(vals),
            int(csr.shape[0]),
            int(csr.shape[1]),
        )
        _prefill_host(obj, row_map=csr.indptr, entries=csr.indices, values=vals)
        return obj

    @classmethod
    def from_dense(cls, dense, ordinal_dtype=default_ordinal, offset_dtype=default_offset):
        dense = np.asarray(dense)
        nz = dense != 0
        counts = nz.sum(axis=1)
        row_map = np.zeros(dense.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=row_map[1:])
        rows, cols = np.nonzero(nz)
        obj = cls(
            jnp.asarray(row_map, dtype=offset_dtype),
            jnp.asarray(cols, dtype=ordinal_dtype),
            jnp.asarray(dense[rows, cols]),
            dense.shape[0],
            dense.shape[1],
        )
        _prefill_host(obj, row_map=row_map, entries=cols, values=dense[rows, cols])
        return obj

    # ---- views / exports ---------------------------------------------
    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self) -> int:
        return int(self.entries.shape[0])

    @property
    def graph(self) -> StaticCrsGraph:
        return StaticCrsGraph(self.row_map, self.entries, self.nrows, self.ncols)

    def to_scipy(self):
        import scipy.sparse as sps

        # copies: host mirrors are shared caches and jax views are
        # read-only, while scipy may mutate in place.  Values use the
        # FULL-precision host cache: a matrix built from f64 data keeps its
        # f64 values here even when the device copy was narrowed to f32
        # (x64 off) — oracles built from to_scipy must not be degraded
        # below the double-single kernels they validate (found round 2:
        # the dia ds kernel was MORE accurate than its scipy reference).
        return sps.csr_matrix(
            (self.host_values_full().copy(), self.host_entries().copy(),
             self.host_row_map().copy()),
            shape=self.shape,
        )

    def to_dense(self):
        # scipy's csr_todense rejects ml_dtypes scalars (bf16): widen for
        # the conversion, restore the value dtype on device
        dt = np.asarray(self.host_values_full()).dtype
        if dt in (np.float32, np.float64, np.complex64, np.complex128) \
                or dt.kind in "iu":
            return jnp.asarray(self.to_scipy().toarray())
        import scipy.sparse as sps_

        sp = self.to_scipy()
        sp = sps_.csr_matrix((np.asarray(sp.data).astype(np.float32),
                              sp.indices, sp.indptr), shape=sp.shape)
        return jnp.asarray(sp.toarray()).astype(self.values.dtype)

    def with_values(self, values) -> "CsrMatrix":
        """Same sparsity, new values (the numeric-phase reuse idiom)."""
        obj = CsrMatrix(self.row_map, self.entries, jnp.asarray(values), self.nrows, self.ncols)
        cache = self.__dict__.get("_hcache", {})
        _prefill_host(obj, row_map=cache.get("row_map"), entries=cache.get("entries"),
                      values=values if isinstance(values, np.ndarray) else None)
        return obj

    def astype(self, dtype) -> "CsrMatrix":
        return self.with_values(self.values.astype(dtype))

    # ---- replace/sumInto (KokkosSparse_CrsMatrix.hpp:305-319) ----------
    def _find_positions(self, rows, cols, is_sorted: bool):
        """Value-array position of (row, col), or -1 if absent.  Sorted rows
        use a per-row binary search (findRelOffset's sorted path); unsorted
        rows fall back to an ELL-width scan — both fully vectorized."""
        rows = jnp.asarray(rows)
        cols = jnp.asarray(cols)
        rm = jnp.asarray(self.row_map)
        ent = jnp.asarray(self.entries)
        beg = rm[rows]
        end = rm[rows + 1]
        if is_sorted:
            # per-row binary search: restrict to the row segment by biasing
            # the keys: key = row * (ncols+1) + col over a row-expanded view
            key_ent = jnp.repeat(
                jnp.arange(self.nrows, dtype=jnp.int64),
                jnp.diff(rm).astype(jnp.int64),
                total_repeat_length=self.nnz) * (self.ncols + 1) + ent
            key_q = rows.astype(jnp.int64) * (self.ncols + 1) + cols
            p = jnp.searchsorted(key_ent, key_q, side="left")
            pc = jnp.clip(p, 0, max(self.nnz - 1, 0))
            hit = (key_ent[pc] == key_q) & (p < self.nnz)
            return jnp.where(hit, pc, -1)
        w = int(np.max(self.row_lengths(), initial=1))
        offs = jnp.arange(w)
        cand = jnp.minimum(beg[:, None] + offs[None, :], max(self.nnz - 1, 0))
        ok = (beg[:, None] + offs[None, :] < end[:, None]) & (ent[cand] == cols[:, None])
        found = jnp.argmax(ok, axis=1)
        hit = jnp.any(ok, axis=1)
        return jnp.where(hit, beg + found, -1)

    def replace_values(self, rows, cols, vals, is_sorted: bool = True) -> "CsrMatrix":
        """Functional replaceValues: entries not present are ignored
        (the reference's return-count contract maps to the hit mask)."""
        pos = self._find_positions(rows, cols, is_sorted)
        vals = jnp.asarray(vals, dtype=self.values.dtype)
        safe = jnp.where(pos >= 0, pos, self.nnz)   # miss -> OOB -> dropped
        new = self.values.at[safe].set(vals, mode="drop")
        return self.with_values(new)

    def sum_into_values(self, rows, cols, vals, is_sorted: bool = True) -> "CsrMatrix":
        """Functional sumIntoValues: A[row, col] += val for present entries;
        absent coordinates are ignored (CrsMatrix.hpp:305)."""
        pos = self._find_positions(rows, cols, is_sorted)
        vals = jnp.asarray(vals, dtype=self.values.dtype)
        safe = jnp.where(pos >= 0, pos, self.nnz)   # miss -> OOB -> dropped
        new = self.values.at[safe].add(vals, mode="drop")
        return self.with_values(new)

    # host mirrors for plan construction
    def host_row_map(self) -> np.ndarray:
        return _host_mirror(self, "row_map")

    def host_entries(self) -> np.ndarray:
        return _host_mirror(self, "entries")

    def host_values(self) -> np.ndarray:
        return _host_mirror(self, "values")

    def host_values_full(self) -> np.ndarray:
        """Full-precision host values: the original f64 array when the
        device copy was narrowed (x64 off); otherwise == host_values()."""
        full = self.__dict__.get("_hcache", {}).get("values_full")
        return full if full is not None else self.host_values()

    def row_lengths(self) -> np.ndarray:
        rm = self.host_row_map()
        return rm[1:] - rm[:-1]
