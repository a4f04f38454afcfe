"""COO container — analog of sparse/src/KokkosSparse_CooMatrix.hpp (150 LoC)."""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..common import default_ordinal

__all__ = ["CooMatrix"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CooMatrix:
    row: Any
    col: Any
    data: Any
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.row, self.col, self.data), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @classmethod
    def from_scipy(cls, sp, ordinal_dtype=default_ordinal):
        coo = sp.tocoo()
        return cls(
            jnp.asarray(coo.row, dtype=ordinal_dtype),
            jnp.asarray(coo.col, dtype=ordinal_dtype),
            jnp.asarray(coo.data),
            int(coo.shape[0]),
            int(coo.shape[1]),
        )

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.coo_matrix(
            (np.array(self.data), (np.array(self.row), np.array(self.col))),
            shape=self.shape,
        )
