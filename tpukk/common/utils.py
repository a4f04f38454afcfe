"""Shared parallel primitives — analog of common/src/KokkosKernels_Utils.hpp
(exclusive scans, permutation, view copies) and KokkosKernels_Sorting.hpp.

On TPU these are thin XLA compositions: `jnp.cumsum` replaces parallel_scan,
`jnp.sort/argsort` replace the device bitonic/radix sorts, `take` replaces
permutation copies.  Host-side (numpy) variants exist for plan construction,
which is deliberately host-resident (symbolic phases return concrete sizes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "exclusive_scan",
    "inclusive_scan",
    "permute",
    "permute_via_sort",
    "inverse_permutation",
    "segment_offsets_from_sizes",
    "sizes_from_offsets",
    "round_up",
    "cdiv",
]


def exclusive_scan(x, dtype=None):
    """[x0,x1,..] -> [0, x0, x0+x1, ...] with total appended (length n+1)."""
    x = jnp.asarray(x, dtype=dtype)
    zero = jnp.zeros((1,), x.dtype)
    return jnp.concatenate([zero, jnp.cumsum(x)])


def inclusive_scan(x, dtype=None):
    return jnp.cumsum(jnp.asarray(x, dtype=dtype))


def permute(x, perm):
    """y[i] = x[perm[i]] (gather form — TPUs prefer gathers over scatters)."""
    return jnp.take(x, perm, axis=0)


def permute_via_sort(x, inv_perm_keys):
    """y = x[perm] realized as a key-sort: element i carries key
    inv_perm[i], so after sorting position j holds x[perm[j]].

    On TPU a variadic `lax.sort` is ~4.6x faster than `jnp.take` for large
    permutation gathers (no tile locality either way; sort is fully
    vectorized while take scalarizes) — measured on v5e, see
    docs/PERF_NOTES.md and sparse/sptrsv_pallas.py which established the
    trick.  `inv_perm_keys` should be a device i32 array.
    """
    if x.ndim == 1:
        return jax.lax.sort((inv_perm_keys, x), num_keys=1)[1]
    kk = jnp.broadcast_to(inv_perm_keys[:, None], x.shape)
    return jax.lax.sort((kk, x), dimension=0, num_keys=1)[1]


def inverse_permutation(perm):
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def segment_offsets_from_sizes(sizes: np.ndarray) -> np.ndarray:
    """Host-side exclusive scan producing a CSR-style row_map (n+1 offsets)."""
    sizes = np.asarray(sizes)
    out = np.zeros(sizes.shape[0] + 1, dtype=sizes.dtype)
    np.cumsum(sizes, out=out[1:])
    return out


def sizes_from_offsets(offsets) -> np.ndarray:
    offsets = np.asarray(offsets)
    return offsets[1:] - offsets[:-1]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
