"""CCS (compressed column) container — analog of
sparse/src/KokkosSparse_CcsMatrix.hpp (164 LoC)."""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..common import default_offset, default_ordinal

__all__ = ["CcsMatrix"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CcsMatrix:
    col_map: Any   # (ncols+1,)
    entries: Any   # row indices (nnz,)
    values: Any
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.col_map, self.entries, self.values), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @classmethod
    def from_scipy(cls, sp, ordinal_dtype=default_ordinal, offset_dtype=default_offset):
        csc = sp.tocsc()
        return cls(
            jnp.asarray(csc.indptr, dtype=offset_dtype),
            jnp.asarray(csc.indices, dtype=ordinal_dtype),
            jnp.asarray(csc.data),
            int(csc.shape[0]),
            int(csc.shape[1]),
        )

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self) -> int:
        return int(self.entries.shape[0])

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.csc_matrix(
            (np.array(self.values), np.array(self.entries), np.array(self.col_map)),
            shape=self.shape,
        )
