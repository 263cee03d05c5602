"""Fourier engine: ortho-normalized N-D FFTs over named dimensions.

TPU-native rebuild of ``src/xmris/processing/fourier.py`` (reference behavior:
``fftshift`` = roll by ``n//2`` with coords, ``ifftshift`` = roll by
``(n+1)//2``; ``fft/ifft`` = ortho-normalized ``fftn/ifftn`` over named dims
with reciprocal coordinates from ``fftfreq(n, d)``; centered variants
``fftc/ifftc`` = ifftshift → transform → fftshift).

Design: all FLOPs go through jitted raw cores (`fftn_ortho`/`ifftn_ortho`)
with static axes so XLA compiles one program per (shape, axes) pair and the
host-side code only does coordinate/metadata bookkeeping.  When the payload is
a host numpy array the ops stay on host (exact-parity CPU path); when it is a
``jax.Array`` they run on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.core.array import Coord, XmrArray, get_namespace
from xmris_tpu.core.config import COORDS, DIMS, XmrTerm
from xmris_tpu.core.utils import _check_dims, as_coord

# ---------------------------------------------------------------------------
# Raw jitted cores (data only, static axes)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("axes",))
def fftn_ortho(data: jax.Array, axes: tuple[int, ...]) -> jax.Array:
    """Ortho-normalized N-D FFT over ``axes`` (jit-compiled)."""
    return jnp.fft.fftn(data, axes=axes, norm="ortho")


@functools.partial(jax.jit, static_argnames=("axes",))
def ifftn_ortho(data: jax.Array, axes: tuple[int, ...]) -> jax.Array:
    """Ortho-normalized N-D inverse FFT over ``axes`` (jit-compiled)."""
    return jnp.fft.ifftn(data, axes=axes, norm="ortho")


def _transform_values(data, axes: tuple[int, ...], inverse: bool):
    """Dispatch host (numpy) or device (jit) transform, dtype-preserving."""
    xp = get_namespace(data)
    if xp is np:
        fn = np.fft.ifftn if inverse else np.fft.fftn
        return fn(data, axes=axes, norm="ortho")
    return (ifftn_ortho if inverse else fftn_ortho)(data, tuple(axes))


# ---------------------------------------------------------------------------
# Shifting utilities
# ---------------------------------------------------------------------------


def fftshift(da: XmrArray, dim: str | list[str]) -> XmrArray:
    """Move the zero-frequency component to the center (rolls data + coords).

    Reference parity: ``processing/fourier.py:10-32``.
    """
    dims = [dim] if isinstance(dim, str) else dim
    _check_dims(da, dims, "fftshift")
    shifts = {d: da.sizes[d] // 2 for d in dims}
    return da.roll(shifts, roll_coords=True)


def ifftshift(da: XmrArray, dim: str | list[str]) -> XmrArray:
    """Exact inverse of :func:`fftshift` (rolls by ``(n+1)//2``).

    Reference parity: ``processing/fourier.py:35-58``.
    """
    dims = [dim] if isinstance(dim, str) else dim
    _check_dims(da, dims, "ifftshift")
    shifts = {d: (da.sizes[d] + 1) // 2 for d in dims}
    return da.roll(shifts, roll_coords=True)


# ---------------------------------------------------------------------------
# Coordinate math
# ---------------------------------------------------------------------------


def _convert_fft_coords(
    da: XmrArray,
    dim: str,
    out_dim: str | None = None,
    term: XmrTerm | None = None,
) -> XmrArray:
    """Assign unshifted reciprocal coordinates to a transformed dimension.

    Reference parity: ``processing/fourier.py:64-111`` — sample spacing from
    the first two coordinate values, reciprocal axis via ``fftfreq(n, d)``,
    optional rename + vocabulary metadata injection.
    """
    n_points = da.sizes[dim]
    if dim in da.coords and len(da.coords[dim].values) > 1:
        old = da.coords[dim].values
        delta = float(old[1] - old[0])
    else:
        delta = 1.0

    new_coords = np.fft.fftfreq(n_points, d=delta)
    target_dim = out_dim if out_dim is not None else dim

    if out_dim is not None and out_dim != dim:
        da = da.rename({dim: out_dim})
        if dim in da.coords:
            da = da.drop_coords(dim)

    coord = (
        as_coord(term, target_dim, new_coords)
        if term is not None
        else Coord(target_dim, new_coords)
    )
    return da.assign_coords({target_dim: coord})


# ---------------------------------------------------------------------------
# Pure transforms
# ---------------------------------------------------------------------------


def _fft_impl(
    da: XmrArray,
    dim: str | list[str],
    out_dim: str | list[str] | None,
    inverse: bool,
    name: str,
) -> XmrArray:
    dims = [dim] if isinstance(dim, str) else list(dim)
    _check_dims(da, dims, name)

    out_dims = [out_dim] if isinstance(out_dim, str) else out_dim
    if out_dims is not None and len(dims) != len(out_dims):
        raise ValueError("`dim` and `out_dim` lists must have the same length.")

    axes = tuple(da.get_axis_num(d) for d in dims)
    transformed = _transform_values(da.data, axes, inverse)
    out = da.copy(data=transformed)

    for i, d in enumerate(dims):
        o_dim = out_dims[i] if out_dims else None
        if not inverse:
            # time -> frequency metadata mapping
            term = (
                COORDS.frequency
                if (d == DIMS.time and o_dim in (None, DIMS.frequency))
                else None
            )
        else:
            # frequency -> time metadata mapping
            term = (
                COORDS.time
                if (d == DIMS.frequency and o_dim in (None, DIMS.time))
                else None
            )
        out = _convert_fft_coords(out, dim=d, out_dim=o_dim, term=term)
    return out


def fft(
    da: XmrArray,
    dim: str | list[str] = DIMS.time,
    out_dim: str | list[str] | None = None,
) -> XmrArray:
    """Ortho-normalized, unshifted N-D FFT over named dimensions.

    Metadata and untouched dimensions are preserved exactly; transformed
    dimensions get unshifted reciprocal coordinates.

    Reference parity: ``processing/fourier.py:117-173``.
    """
    return _fft_impl(da, dim, out_dim, inverse=False, name="fft")


def ifft(
    da: XmrArray,
    dim: str | list[str] = DIMS.frequency,
    out_dim: str | list[str] | None = None,
) -> XmrArray:
    """Ortho-normalized, unshifted N-D inverse FFT over named dimensions.

    Reference parity: ``processing/fourier.py:176-226``.
    """
    return _fft_impl(da, dim, out_dim, inverse=True, name="ifft")


def fftc(
    da: XmrArray,
    dim: str | list[str] = DIMS.time,
    out_dim: str | list[str] | None = None,
) -> XmrArray:
    """Centered N-D FFT: ``ifftshift -> fft -> fftshift``.

    Reference parity: ``processing/fourier.py:232-264``.
    """
    new_dims = out_dim if out_dim is not None else dim
    return fftshift(fft(ifftshift(da, dim=dim), dim=dim, out_dim=out_dim), dim=new_dims)


def ifftc(
    da: XmrArray,
    dim: str | list[str] = DIMS.frequency,
    out_dim: str | list[str] | None = None,
) -> XmrArray:
    """Centered N-D inverse FFT: ``ifftshift -> ifft -> fftshift``.

    Reference parity: ``processing/fourier.py:267-298``.
    """
    new_dims = out_dim if out_dim is not None else dim
    return fftshift(
        ifft(ifftshift(da, dim=dim), dim=dim, out_dim=out_dim), dim=new_dims
    )
