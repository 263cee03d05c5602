"""xmris_tpu: a TPU-native MRI & MR-spectroscopy framework.

A from-scratch rebuild of the capability surface of ``andrewendlinger/xmris``
designed for TPU hardware: labeled N-dimensional complex MR data processed by
fluent, dimension-name-addressed method chains —

    >>> da.xmr.zero_fill(target_points=2048).xmr.apodize_exp(lb=5) \\
    ...    .xmr.to_spectrum().xmr.autophase()

— where every numeric stage is a jit/vmap-compiled XLA program, whole MRSI
grids batch through fused pipelines (:mod:`xmris_tpu.parallel`), and
prior-knowledge AMARES fitting runs as a batched Levenberg–Marquardt solve,
one voxel per lane, instead of a process pool.

The public API mirrors the reference package one-to-one (vocabulary
singletons, processing free functions, accessors, fitting, vendor I/O,
visualization configs) so reference users can switch directly.
"""

# --- Submodules -------------------------------------------------------------
from xmris_tpu import config, core, fitting, models, ops, processing, runtime, vendor

# --- 1. Vocabulary singletons -----------------------------------------------
from xmris_tpu.core import ATTRS, COORDS, DIMS, VARS

# --- 2. The labeled carrier + accessors --------------------------------------
from xmris_tpu.core.accessor import XmrisAccessor, XmrisDatasetAccessor
from xmris_tpu.core.array import Coord, XmrArray, XmrDataset

# --- 3. Core signal processing & utilities ----------------------------------
from xmris_tpu.ops.baseline import baseline_als
from xmris_tpu.ops.fid import apodize_exp, apodize_lg, to_fid, to_spectrum, zero_fill
from xmris_tpu.ops.fourier import fft, fftc, fftshift, ifft, ifftc, ifftshift
from xmris_tpu.ops.phasing import autophase, phase
from xmris_tpu.ops.utils import to_complex, to_real_imag

# --- 4. Modeling & fitting ---------------------------------------------------
from xmris_tpu.fitting.simulation import simulate_fid

# --- 5. Vendor integrations --------------------------------------------------
from xmris_tpu.vendor.bruker import remove_digital_filter

# --- 6. Optional xarray interop ----------------------------------------------
from xmris_tpu.interop.xarray import register_xarray_accessors

__version__ = "0.1.0"

register_xarray_accessors()


def __getattr__(name):
    # Heavier layers resolve lazily to keep `import xmris_tpu` fast.
    if name == "fit_amares":
        from xmris_tpu.fitting.amares import fit_amares

        return fit_amares
    if name == "DEFAULTS":
        from xmris_tpu.config import DEFAULTS

        return DEFAULTS
    if name in ("WaterfallConfig", "CarpetConfig", "PlotTrajectoryConfig", "PlotQCGridConfig"):
        from xmris_tpu import visualization

        return getattr(visualization.plot, name)
    if name in ("visualization", "parallel", "recon"):
        import importlib

        return importlib.import_module(f"xmris_tpu.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    # --- Submodules ---
    "core",
    "config",
    "fitting",
    "models",
    "ops",
    "processing",
    "parallel",
    "recon",
    "runtime",
    "vendor",
    "visualization",
    # --- 1. Config & singletons ---
    "ATTRS",
    "COORDS",
    "DIMS",
    "VARS",
    "DEFAULTS",
    # --- 2. Carrier & accessors ---
    "Coord",
    "XmrArray",
    "XmrDataset",
    "XmrisAccessor",
    "XmrisDatasetAccessor",
    # --- 3. Core processing & utilities ---
    "to_complex",
    "to_real_imag",
    "apodize_exp",
    "apodize_lg",
    "to_fid",
    "to_spectrum",
    "zero_fill",
    "fft",
    "fftc",
    "fftshift",
    "ifft",
    "ifftc",
    "ifftshift",
    "autophase",
    "phase",
    "baseline_als",
    # --- 4. Fitting ---
    "fit_amares",
    "simulate_fid",
    # --- 5. Vendor ---
    "remove_digital_filter",
    # --- 6. Visualization configs ---
    "WaterfallConfig",
    "CarpetConfig",
    "PlotTrajectoryConfig",
    "PlotQCGridConfig",
    # --- Interop ---
    "register_xarray_accessors",
]
