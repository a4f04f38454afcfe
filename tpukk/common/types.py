"""Default type configuration — analog of common/src/KokkosKernels_default_types.hpp.

The reference maps CMake ETI flags to ``default_scalar/default_lno_t/
default_size_type/default_layout`` (KokkosKernels_default_types.hpp:42-75).
On TPU the natural defaults are f32 scalars and i32 ordinals/offsets; f64 is
supported (slow on TPU, native on CPU) when ``jax_enable_x64`` is on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "default_scalar",
    "default_ordinal",
    "default_offset",
    "supported_scalars",
    "enable_x64",
]

default_scalar = jnp.float32
default_ordinal = jnp.int32   # lno_t: column indices / row ids
default_offset = jnp.int32    # size_type: row_map offsets


def supported_scalars():
    """Scalar dtypes this build specializes for (the ETI axis analog)."""
    scalars = [jnp.float32, jnp.bfloat16]
    if jax.config.jax_enable_x64:
        scalars.append(jnp.float64)
    return scalars


def enable_x64():
    """Opt into float64/int64 support (TPU emulates f64; CPU is native)."""
    jax.config.update("jax_enable_x64", True)
