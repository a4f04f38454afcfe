"""BSR (block CSR) container — analog of sparse/src/KokkosSparse_BsrMatrix.hpp
(1017 LoC).  values are stored as a dense (nnz_blocks, b, b) tensor so block
products map straight onto the TPU MXU (the analog of the reference's
tensor-core BSR path, sparse/impl/KokkosSparse_spmv_bsrmatrix_impl.hpp:71-88).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .csr import _host_mirror, _prefill_host
from ..common import check, default_offset, default_ordinal

__all__ = ["BsrMatrix"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BsrMatrix:
    row_map: Any    # (n_block_rows+1,)
    entries: Any    # (nnz_blocks,) block-column ids
    values: Any     # (nnz_blocks, b, b)
    nrows: int      # scalar rows = n_block_rows * b
    ncols: int
    block_size: int

    def tree_flatten(self):
        return (self.row_map, self.entries, self.values), (self.nrows, self.ncols, self.block_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1], aux[2])

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def n_block_rows(self) -> int:
        return self.nrows // self.block_size

    @property
    def n_block_cols(self) -> int:
        return self.ncols // self.block_size

    @property
    def nnz_blocks(self) -> int:
        return int(self.entries.shape[0])

    @property
    def nnz(self) -> int:
        return self.nnz_blocks * self.block_size * self.block_size

    @classmethod
    def from_scipy_bsr(cls, sp, ordinal_dtype=default_ordinal, offset_dtype=default_offset):
        b = sp.blocksize[0]
        check(sp.blocksize[0] == sp.blocksize[1], "BsrMatrix: square blocks only")
        obj = cls(
            jnp.asarray(sp.indptr, dtype=offset_dtype),
            jnp.asarray(sp.indices, dtype=ordinal_dtype),
            jnp.asarray(sp.data),
            int(sp.shape[0]),
            int(sp.shape[1]),
            int(b),
        )
        _prefill_host(obj, row_map=sp.indptr, entries=sp.indices, values=sp.data)
        return obj

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.bsr_matrix(
            (np.array(self.values), np.array(self.entries), np.array(self.row_map)),
            shape=self.shape,
        )

    def with_values(self, values) -> "BsrMatrix":
        return BsrMatrix(self.row_map, self.entries, jnp.asarray(values), self.nrows, self.ncols, self.block_size)

    def host_row_map(self) -> np.ndarray:
        return _host_mirror(self, "row_map")

    def host_entries(self) -> np.ndarray:
        return _host_mirror(self, "entries")

    def host_values(self) -> np.ndarray:
        return _host_mirror(self, "values")
