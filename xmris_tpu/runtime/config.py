"""Global runtime configuration (precision, devices)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class RuntimeConfig:
    """Framework-wide runtime knobs.

    Attributes
    ----------
    preferred_float : str
        Default real dtype for newly created arrays when the input gives no
        preference ("float32" on TPU; "float64" only meaningful with
        ``jax_enable_x64``).
    interpret_pallas : bool
        Run Pallas kernels in interpreter mode (for CPU testing/debugging).
    """

    preferred_float: str = "float32"
    interpret_pallas: bool = field(default_factory=lambda: _default_interpret())

    @property
    def x64_enabled(self) -> bool:
        return bool(jax.config.read("jax_enable_x64"))


def _default_interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


config = RuntimeConfig()


def default_float_dtype() -> np.dtype:
    if config.preferred_float == "float64" and config.x64_enabled:
        return np.dtype(np.float64)
    return np.dtype(np.float32)


def default_complex_dtype() -> np.dtype:
    return (
        np.dtype(np.complex128)
        if default_float_dtype() == np.float64
        else np.dtype(np.complex64)
    )


def matching_dtypes(dtype) -> tuple[np.dtype, np.dtype]:
    """Return (real, complex) dtypes at the precision of ``dtype``.

    Keeps the framework dtype-preserving: complex128 pipelines (CPU parity
    tests with x64) stay in double precision; complex64 (TPU) stays single.
    """
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.complex128, jnp.float64):
        return np.dtype(np.float64), np.dtype(np.complex128)
    return np.dtype(np.float32), np.dtype(np.complex64)
