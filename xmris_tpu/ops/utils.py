"""Complex <-> stacked-real conversions.

Rebuild of ``src/xmris/processing/utils.py`` — used for exporters / ML models
that cannot handle complex dtypes.
"""

from __future__ import annotations

import numpy as np

from xmris_tpu.core.array import Coord, XmrArray, get_namespace
from xmris_tpu.core.config import DIMS
from xmris_tpu.core.utils import _check_dims


def to_real_imag(
    da: XmrArray,
    dim: str = DIMS.component,
    coords: tuple[str, str] = ("real", "imag"),
) -> XmrArray:
    """Stack real and imaginary parts along a new trailing ``component`` dim."""
    xp = get_namespace(da.data)
    data = xp.stack([da.data.real, da.data.imag], axis=-1)
    new_coords = {k: c.copy() for k, c in da.coords.items()}
    new_coords[dim] = Coord(dim, np.asarray(list(coords), dtype=object))
    out = XmrArray(
        data,
        dims=tuple(da.dims) + (dim,),
        attrs=da.attrs,
        name=da.name,
    )
    out.coords = new_coords
    return out


def to_complex(
    da: XmrArray,
    dim: str = DIMS.component,
    coords: tuple[str, str] = ("real", "imag"),
) -> XmrArray:
    """Rebuild complex values from a stacked-component array."""
    _check_dims(da, dim, "to_complex")
    real_part = da.sel({dim: coords[0]})
    imag_part = da.sel({dim: coords[1]})
    out = real_part + imag_part * 1j
    out.name = da.name
    return out.assign_attrs(da.attrs)
