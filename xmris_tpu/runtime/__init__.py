"""Runtime configuration: device, precision, and mesh defaults.

The reference framework has no runtime layer (pure single-process NumPy); on
TPU we need a small amount of global state: which precision the numerics run
at, and the default device mesh for sharded pipelines.  This is the only
stateful module in the package.
"""

from xmris_tpu.runtime.config import (
    RuntimeConfig,
    config,
    default_float_dtype,
    default_complex_dtype,
    matching_dtypes,
)
from xmris_tpu.runtime.profiling import stage_timer, trace, Timings

__all__ = [
    "RuntimeConfig",
    "config",
    "default_float_dtype",
    "default_complex_dtype",
    "matching_dtypes",
    "stage_timer",
    "trace",
    "Timings",
]
