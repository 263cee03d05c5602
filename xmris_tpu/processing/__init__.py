"""Processing namespace — API-parity alias for ``xmris.processing``.

The TPU implementations live in :mod:`xmris_tpu.ops`; this package re-exports
them under the reference's module layout so imports like
``from xmris.processing.fid import to_spectrum`` translate 1:1.
"""

from xmris_tpu.ops import baseline, fid, fourier, phasing, utils
from xmris_tpu.ops.baseline import baseline_als
from xmris_tpu.ops.fid import apodize_exp, apodize_lg, to_fid, to_spectrum, zero_fill
from xmris_tpu.ops.fourier import fft, fftc, fftshift, ifft, ifftc, ifftshift
from xmris_tpu.ops.phasing import autophase, phase
from xmris_tpu.ops.utils import to_complex, to_real_imag

__all__ = [
    "apodize_exp",
    "apodize_lg",
    "autophase",
    "baseline",
    "baseline_als",
    "fft",
    "fftc",
    "fftshift",
    "fid",
    "fourier",
    "ifft",
    "ifftc",
    "ifftshift",
    "phase",
    "phasing",
    "to_complex",
    "to_fid",
    "to_real_imag",
    "to_spectrum",
    "utils",
    "zero_fill",
]
