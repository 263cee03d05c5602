"""FID-domain operations: spectrum conversion, apodization, zero-filling.

TPU-native rebuild of ``src/xmris/processing/fid.py``.  Formula parity:

* ``to_spectrum`` = ortho FFT + fftshift (``fid.py:9-42``)
* ``to_fid`` = ifftshift + ortho iFFT + time coords ``t = arange(n)/(n*df)``
  (``fid.py:45-102``)
* ``apodize_exp``: weight ``exp(-pi * lb * t)`` (``fid.py:105-144``)
* ``apodize_lg``: weight ``exp(+pi * lb * t) * exp(-t^2 / T_G^2)`` with
  ``T_G = 2*sqrt(ln 2)/(pi*gb)`` (``fid.py:147-198``)
* ``zero_fill``: end/symmetric padding + linear coordinate extrapolation +
  vocabulary-matched coordinate metadata (``fid.py:201-285``)

Apodization weights are tiny 1-D vectors computed host-side from coordinates
and broadcast-multiplied on device; XLA fuses the multiply into neighboring
ops. The fully-fused hot path lives in :mod:`xmris_tpu.parallel.pipeline`.
"""

from __future__ import annotations

import numpy as np

from xmris_tpu.core.array import Coord, XmrArray
from xmris_tpu.core.config import ATTRS, COORDS, DIMS
from xmris_tpu.core.utils import _check_dims, as_coord
from xmris_tpu.ops.fourier import fft, fftshift, ifft, ifftshift
from xmris_tpu.runtime.config import matching_dtypes


def to_spectrum(
    da: XmrArray, dim: str = DIMS.time, out_dim: str = DIMS.frequency
) -> XmrArray:
    """Convert a time-domain FID to a centered frequency-domain spectrum."""
    _check_dims(da, dim, "to_spectrum")
    da_freq = fft(da, dim=dim, out_dim=out_dim)
    return fftshift(da_freq, dim=out_dim)


def to_fid(
    da: XmrArray, dim: str = DIMS.frequency, out_dim: str = DIMS.time
) -> XmrArray:
    """Convert a centered spectrum back to a time-domain FID.

    Inverse-shifts 0 Hz to the array boundary, applies the ortho iFFT, and
    reconstructs strictly positive time coordinates from the sampling theorem
    (``dt = 1/(n*df)``).
    """
    _check_dims(da, dim, "to_fid")

    result = ifft(ifftshift(da, dim=dim), dim=dim, out_dim=out_dim)

    if dim in da.coords:
        f_axis = da.coords[dim].values
        n = len(f_axis)
        if n > 1:
            df = abs(float(f_axis[1] - f_axis[0]))
            rebuilt_t = np.arange(n) / (n * df)
            if out_dim == DIMS.time:
                tick = as_coord(COORDS.time, out_dim, rebuilt_t)
            else:
                tick = Coord(out_dim, rebuilt_t)
            result = result.assign_coords({out_dim: tick})

    return result


def _apply_weight(da: XmrArray, dim: str, weight: np.ndarray) -> XmrArray:
    """Broadcast-multiply a 1-D weight along ``dim``, preserving axis order,
    coords and (explicitly re-attached) attrs."""
    real_dtype, _ = matching_dtypes(da.dtype)
    w = XmrArray(weight.astype(real_dtype), (dim,))
    out = (da * w).transpose(*da.dims)
    # Binary ops drop attrs (xarray default); re-attach them explicitly.
    out = out.assign_attrs(da.attrs)
    out.name = da.name
    # Binary ops also merge coords; da's coords already win. Keep as-is.
    return out


def apodize_exp(da: XmrArray, dim: str = DIMS.time, lb: float = 1.0) -> XmrArray:
    """Exponential line-broadening filter: multiply by ``exp(-pi * lb * t)``.

    Attenuates the noise-dominated FID tail to improve SNR at the cost of
    ``lb`` Hz of Lorentzian line broadening.
    """
    _check_dims(da, dim, "apodize_exp")
    t = da.coords[dim].values.astype(np.float64)
    weight = np.exp(-np.pi * lb * t)
    out = _apply_weight(da, dim, weight)
    out.attrs[ATTRS.apodization_lb] = lb
    return out


def apodize_lg(
    da: XmrArray, dim: str = DIMS.time, lb: float = 1.0, gb: float = 1.0
) -> XmrArray:
    """Lorentz-to-Gauss filter: ``exp(+pi*lb*t) * exp(-t^2/T_G^2)``.

    Cancels ``lb`` Hz of natural Lorentzian broadening and imposes a Gaussian
    lineshape of width ``gb`` Hz (``T_G = 2*sqrt(ln 2)/(pi*gb)``).
    """
    _check_dims(da, dim, "apodize_lg")
    t = da.coords[dim].values.astype(np.float64)

    undo_lorentz = np.exp(np.pi * lb * t)
    if gb != 0:
        gauss_tc = (2.0 * np.sqrt(np.log(2.0))) / (np.pi * gb)
        impose_gauss = np.exp(-((t / gauss_tc) ** 2))
    else:
        impose_gauss = np.ones_like(t)

    out = _apply_weight(da, dim, undo_lorentz * impose_gauss)
    out.attrs[ATTRS.apodization_lb] = lb
    out.attrs[ATTRS.apodization_gb] = gb
    return out


def zero_fill(
    da: XmrArray,
    dim: str = DIMS.time,
    target_points: int = 1024,
    position: str = "end",
) -> XmrArray:
    """Pad ``dim`` with zeros to ``target_points`` total points.

    ``position="end"`` appends (time-domain FIDs); ``position="symmetric"``
    splits the padding (k-space).  Coordinates are linearly extrapolated and
    re-labeled from the vocabulary when the dimension is a known physical
    axis.  No-op (copy) when the target is not larger than the current size.
    """
    _check_dims(da, dim, "zero_fill")

    n_now = da.sizes[dim]
    if target_points <= n_now:
        return da.copy()

    extra = target_points - n_now
    if position == "end":
        margins = (0, extra)
    elif position == "symmetric":
        margins = (extra // 2, extra - extra // 2)
    else:
        raise ValueError("`position` must be either 'end' or 'symmetric'.")

    padded = da.pad({dim: margins}, mode="constant", constant_values=0)

    if dim in da.coords:
        axis_old = da.coords[dim].values
        if len(axis_old) > 1:
            # Extrapolate linearly from the original spacing, shifting the
            # origin left by whatever landed in front.
            step = axis_old[1] - axis_old[0]
            first = axis_old[0] - margins[0] * step
            axis_new = first + np.arange(target_points) * step

            vocab = next(
                (
                    c
                    for c in (COORDS.time, COORDS.frequency, COORDS.chemical_shift)
                    if c == dim
                ),
                None,
            )
            if vocab is not None:
                tick = as_coord(vocab, dim, axis_new)
            else:
                tick = Coord(dim, axis_new, da.coords[dim].attrs)
            padded = padded.assign_coords({dim: tick})

    padded = padded.assign_attrs(da.attrs)
    padded.attrs[ATTRS.zero_fill_target] = target_points
    padded.attrs[ATTRS.zero_fill_position] = position
    return padded
