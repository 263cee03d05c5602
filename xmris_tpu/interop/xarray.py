"""xarray interop: conversion + optional registration of the ``.xmr`` accessor.

The reference package registers its accessor directly on xarray
(``core/accessor.py:691-710``).  Here xarray is an *optional* dependency: when
present, :func:`register_xarray_accessors` makes ``xr.DataArray.xmr`` work by
converting to the native carrier, running the TPU pipeline, and converting
back; when absent, everything still works through :class:`XmrArray`.
"""

from __future__ import annotations

from xmris_tpu.core.array import Coord, XmrArray

try:
    import xarray as xr

    HAS_XARRAY = True
except ImportError:  # pragma: no cover - exercised in envs with xarray
    xr = None
    HAS_XARRAY = False


def _require_xarray():
    if not HAS_XARRAY:
        raise ImportError(
            "xarray is not installed. Install it to use xarray interop "
            "(`pip install xarray`); the native XmrArray API works without it."
        )


def from_xarray(da) -> XmrArray:
    """Convert an ``xarray.DataArray`` to a native :class:`XmrArray`."""
    _require_xarray()
    out = XmrArray(
        da.values,
        dims=tuple(da.dims),
        attrs=dict(da.attrs),
        name=da.name,
    )
    coords = {}
    for cname, cvar in da.coords.items():
        if cvar.ndim != 1:
            continue  # only 1-D coords are representable
        coords[str(cname)] = Coord(str(cvar.dims[0]), cvar.values, dict(cvar.attrs))
    out.coords = coords
    return out


def to_xarray(da: XmrArray):
    """Convert a native :class:`XmrArray` to an ``xarray.DataArray``."""
    _require_xarray()
    coords = {
        cname: (c.dim, c.values, c.attrs) for cname, c in da.coords.items()
    }
    return xr.DataArray(
        da.values, dims=da.dims, coords=coords, attrs=dict(da.attrs), name=da.name
    )


def register_xarray_accessors() -> bool:
    """Register ``.xmr`` on xarray objects (no-op if xarray missing).

    Returns True when registration happened.
    """
    if not HAS_XARRAY:
        return False

    from xmris_tpu.core.accessor import XmrisAccessor as _Native

    if hasattr(xr.DataArray, "xmr"):
        return True

    @xr.register_dataarray_accessor("xmr")
    class XmrisXarrayAccessor(_Native):  # noqa: D401
        """xarray adapter: converts, delegates, converts back."""

        def __init__(self, xarray_obj):
            super().__init__(from_xarray(xarray_obj))

        def __getattribute__(self, item):
            attr = super().__getattribute__(item)
            if callable(attr) and not item.startswith("_"):
                def wrapper(*args, **kwargs):
                    result = attr(*args, **kwargs)
                    if isinstance(result, XmrArray):
                        return to_xarray(result)
                    return result

                return wrapper
            return attr

    return True
