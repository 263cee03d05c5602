"""Interactive phase-correction widget (Python model side).

Capability parity with the reference phase widget
(``widget/phase/phase.py:11-148``): synced traits for the spectrum payload
and phase state, a factory that validates 1-D complex input, resolves the
spectral dimension by name heuristics, and pivots at the maximum-magnitude
coordinate.  The browser engine (``phase.js``) reproduces the exact phase
math of :func:`xmris_tpu.ops.phasing.phase` per point.
"""

from __future__ import annotations

import pathlib

import numpy as np
import traitlets

from xmris_tpu.core.array import XmrArray
from xmris_tpu.visualization.widget._backend import WidgetBase

_HERE = pathlib.Path(__file__).parent


class PhaseWidget(WidgetBase):
    """Interactive zero/first-order phase correction viewer."""

    _esm = _HERE / "phase.js"
    _css = _HERE / "phase.css"

    width = traitlets.Int(740).tag(sync=True)
    height = traitlets.Int(400).tag(sync=True)
    show_grid = traitlets.Bool(True).tag(sync=True)
    show_pivot = traitlets.Bool(True).tag(sync=True)
    x_coords = traitlets.List().tag(sync=True)
    x_label = traitlets.Unicode("Chemical Shift [ppm]").tag(sync=True)
    reals = traitlets.List().tag(sync=True)
    imags = traitlets.List().tag(sync=True)
    mag = traitlets.List().tag(sync=True)
    p0 = traitlets.Float(0.0).tag(sync=True)
    p1 = traitlets.Float(0.0).tag(sync=True)
    pivot_val = traitlets.Float(0.0).tag(sync=True)


def _resolve_spectral_dim(da) -> tuple[str, str]:
    """Pick the spectral dimension by common naming conventions."""
    for d in da.dims:
        low = str(d).lower()
        if any(k in low for k in ("ppm", "chem", "shift")):
            return str(d), "Chemical Shift [ppm]"
        if any(k in low for k in ("hz", "freq")):
            return str(d), "Frequency [Hz]"
    return str(da.dims[0]), str(da.dims[0])


def phase_spectrum(
    da: XmrArray,
    width: int = 740,
    height: int = 400,
    show_grid: bool = True,
    show_pivot: bool = True,
    **kwargs,
) -> PhaseWidget:
    """Open an interactive phase viewer for a 1-D complex spectrum.

    The pivot defaults to the coordinate of the maximum magnitude; closing
    the widget emits a copyable ``.xmr.phase(p0=..., p1=..., pivot=...)``
    snippet so interactive state becomes reproducible pipeline code.
    """
    if da.ndim != 1:
        raise ValueError(f"Input must be 1-D, but has shape {da.shape}.")
    values = da.values
    if not np.iscomplexobj(values):
        raise ValueError("Phasing requires complex-valued data (Real + Imaginary).")

    spec_dim, x_label = _resolve_spectral_dim(da)
    x_vals = (
        da.coords[spec_dim].values.astype(float)
        if spec_dim in da.coords
        else np.arange(len(values), dtype=float)
    )
    mag_vals = np.abs(values).astype(float)
    pivot = float(x_vals[int(np.argmax(mag_vals))])

    return PhaseWidget(
        width=width,
        height=height,
        show_grid=show_grid,
        show_pivot=show_pivot,
        x_coords=x_vals.tolist(),
        x_label=x_label,
        reals=np.real(values).astype(float).tolist(),
        imags=np.imag(values).astype(float).tolist(),
        mag=mag_vals.tolist(),
        pivot_val=pivot,
        **kwargs,
    )
