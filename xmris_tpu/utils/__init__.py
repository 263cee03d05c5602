"""Cross-cutting utilities: profiling, logging, runtime configuration.

Convenience namespace re-exporting the runtime layer (kept separate so the
package layout mirrors the framework's models/ops/parallel/utils structure).
"""

from xmris_tpu.runtime.config import (
    RuntimeConfig,
    config,
    default_complex_dtype,
    default_float_dtype,
    matching_dtypes,
)
from xmris_tpu.runtime.logging import get_logger, set_log_level
from xmris_tpu.runtime.profiling import Timings, stage_timer, trace

__all__ = [
    "RuntimeConfig",
    "Timings",
    "config",
    "default_complex_dtype",
    "default_float_dtype",
    "get_logger",
    "matching_dtypes",
    "set_log_level",
    "stage_timer",
    "trace",
]
