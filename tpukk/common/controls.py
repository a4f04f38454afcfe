"""Runtime controls + configuration dump — analogs of
sparse/src/KokkosKernels_Controls.hpp:46-70 (string key→value map consumed by
algorithm selection) and common/src/KokkosKernels_PrintConfiguration.hpp /
KokkosKernels_EagerInitialize.hpp (:17-40).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

__all__ = ["Controls", "print_configuration", "eager_initialize"]


@dataclasses.dataclass
class Controls:
    """String key→value tuning map (cf. KokkosKernels_Controls.hpp).

    Recognized keys mirror the reference's: "algorithm" ("native"/"merge"/
    "dia"/"ell"/...) consumed by spmv's deprecated-style overload."""

    params: Dict[str, str] = dataclasses.field(default_factory=dict)

    def set(self, key: str, value: str):
        self.params[key] = str(value)
        return self

    def get(self, key: str, default: str = "") -> str:
        return self.params.get(key, default)

    def spmv_algorithm(self):
        """Translate the "algorithm" control into SpmvAlgorithm (the role of
        sparse/src/KokkosSparse_spmv_deprecated.hpp:151-156)."""
        from ..sparse.spmv import SpmvAlgorithm

        name = self.get("algorithm", "auto").lower()
        mapping = {
            "default": SpmvAlgorithm.AUTO,
            "auto": SpmvAlgorithm.AUTO,
            "native": SpmvAlgorithm.ELL,
            "merge": SpmvAlgorithm.ELL,   # static bucketing replaces merge-path
            "dia": SpmvAlgorithm.DIA,
            "ell": SpmvAlgorithm.ELL,
            "segsum": SpmvAlgorithm.SEGSUM,
            "dense": SpmvAlgorithm.DENSE,
        }
        return mapping.get(name, SpmvAlgorithm.AUTO)


def print_configuration(out=None) -> str:
    """Config dump (cf. KokkosKernels_PrintConfiguration.hpp)."""
    import jax

    from .. import __version__
    from ..common.types import supported_scalars

    lines = [
        f"tpukk version: {__version__}",
        f"jax version: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"x64 enabled: {jax.config.jax_enable_x64}",
        f"scalar dtypes: {[str(s.__name__ if hasattr(s, '__name__') else s) for s in supported_scalars()]}",
    ]
    try:
        from .. import native

        lines.append(f"native host runtime: {'loaded' if native.available() else 'unavailable (python fallbacks)'}")
    except Exception:
        lines.append("native host runtime: unavailable")
    text = "\n".join(lines)
    if out is not None:
        out.write(text + "\n")
    return text


def eager_initialize():
    """Warm the backend and native library upfront
    (cf. KokkosKernels::eager_initialize, KokkosKernels_EagerInitialize.hpp:17-40)."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)  # backend + compile cache
    try:
        from .. import native

        native.available()
    except Exception:
        pass
