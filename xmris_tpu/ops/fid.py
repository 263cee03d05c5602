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

    da_unshifted = ifftshift(da, dim=dim)
    da_fid = ifft(da_unshifted, dim=dim, out_dim=out_dim)

    if dim in da.coords:
        freqs = da.coords[dim].values
        n_points = len(freqs)
        if n_points > 1:
            df = abs(float(freqs[1] - freqs[0]))
            dt = 1.0 / (n_points * df)
            t_coords = np.arange(n_points) * dt
            term = COORDS.time if out_dim == DIMS.time else None
            coord = (
                as_coord(term, out_dim, t_coords)
                if term
                else Coord(out_dim, t_coords)
            )
            da_fid = da_fid.assign_coords({out_dim: coord})

    return da_fid


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

    weight_lorentzian = np.exp(np.pi * lb * t)
    if gb != 0:
        t_g = (2.0 * np.sqrt(np.log(2.0))) / (np.pi * gb)
        weight_gaussian = np.exp(-(t**2) / (t_g**2))
    else:
        weight_gaussian = np.ones_like(t)

    out = _apply_weight(da, dim, weight_lorentzian * weight_gaussian)
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

    current_points = da.sizes[dim]
    if target_points <= current_points:
        return da.copy()

    pad_size = target_points - current_points
    if position == "end":
        pad_width = (0, pad_size)
    elif position == "symmetric":
        pad_left = pad_size // 2
        pad_width = (pad_left, pad_size - pad_left)
    else:
        raise ValueError("`position` must be either 'end' or 'symmetric'.")

    da_padded = da.pad({dim: pad_width}, mode="constant", constant_values=0)

    if dim in da.coords:
        old_coords = da.coords[dim].values
        if len(old_coords) > 1:
            delta = old_coords[1] - old_coords[0]
            if position == "end":
                new_coords = old_coords[0] + np.arange(target_points) * delta
            else:
                start_coord = old_coords[0] - (pad_width[0] * delta)
                new_coords = start_coord + np.arange(target_points) * delta

            term = None
            for candidate in (COORDS.time, COORDS.frequency, COORDS.chemical_shift):
                if candidate == dim:
                    term = candidate
                    break

            coord = (
                as_coord(term, dim, new_coords)
                if term
                else Coord(dim, new_coords, da.coords[dim].attrs)
            )
            da_padded = da_padded.assign_coords({dim: coord})

    da_padded = da_padded.assign_attrs(da.attrs)
    da_padded.attrs[ATTRS.zero_fill_target] = target_points
    da_padded.attrs[ATTRS.zero_fill_position] = position
    return da_padded
