"""Scalar arithmetic traits — TPU-native analog of Kokkos::ArithTraits.

Reference: common/src/Kokkos_ArithTraits.hpp (zero/one/eps/abs/conj/isNan and
friends for float/double/half/bhalf/complex/int).  Here a trait is a small
frozen dataclass keyed by jnp dtype; jit specialization over dtype replaces the
reference's template instantiation.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

__all__ = ["ArithTraits", "arith_traits", "is_complex", "mag_dtype"]


@dataclasses.dataclass(frozen=True)
class ArithTraits:
    """Scalar traits for one dtype (cf. Kokkos_ArithTraits.hpp:1-1654)."""

    dtype: Any
    zero: Any
    one: Any
    eps: float
    is_integer: bool
    is_complex: bool
    # magnitude (abs-value) dtype: real part dtype for complex, self otherwise
    mag_dtype: Any

    def abs(self, x):
        return jnp.abs(x)

    def conj(self, x):
        return jnp.conj(x) if self.is_complex else x

    def real(self, x):
        return jnp.real(x) if self.is_complex else x

    def imag(self, x):
        return jnp.imag(x) if self.is_complex else jnp.zeros_like(x)

    def isnan(self, x):
        if self.is_integer:
            return jnp.zeros(jnp.shape(x), bool)
        return jnp.isnan(x)

    def sqrt(self, x):
        return jnp.sqrt(x)

    @property
    def min(self):
        if self.is_integer:
            return np.iinfo(self.dtype).min
        return np.finfo(self.dtype).min

    @property
    def max(self):
        if self.is_integer:
            return np.iinfo(self.dtype).max
        return np.finfo(self.dtype).max


def _make(dtype) -> ArithTraits:
    dtype = jnp.dtype(dtype)
    kind = dtype.kind
    is_int = kind in "iu"
    is_cplx = kind == "c"
    if is_int:
        eps = 0.0
    else:
        eps = float(jnp.finfo(dtype).eps)
    if is_cplx:
        mag = jnp.dtype("float64") if dtype == jnp.dtype("complex128") else jnp.dtype("float32")
    else:
        mag = dtype
    return ArithTraits(
        dtype=dtype,
        zero=np.zeros((), dtype),
        one=np.ones((), dtype),
        eps=eps,
        is_integer=is_int,
        is_complex=is_cplx,
        mag_dtype=mag,
    )


_CACHE: dict = {}


def arith_traits(dtype) -> ArithTraits:
    """Return the ArithTraits for ``dtype`` (cached)."""
    key = jnp.dtype(dtype)
    if key not in _CACHE:
        _CACHE[key] = _make(key)
    return _CACHE[key]


def is_complex(dtype) -> bool:
    return jnp.dtype(dtype).kind == "c"


def mag_dtype(dtype):
    return arith_traits(dtype).mag_dtype
