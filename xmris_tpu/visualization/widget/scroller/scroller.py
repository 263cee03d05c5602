"""Interactive spectra scroller widget (Python model side).

Capability parity with the reference scroller
(``widget/scroller/scroller.py:11-182``): strict 2-D input, component
selection (real/imag/abs), scroll-dimension auto-detection
(repetitions > averages > time > whatever remains), timeline scrubbing with
playback and fading history trails in the browser engine, and an
"Extract Slice" action that emits the exact ``.isel(...)`` snippet.
"""

from __future__ import annotations

import pathlib

import numpy as np
import traitlets

from xmris_tpu.core.array import XmrArray
from xmris_tpu.visualization.widget._backend import WidgetBase
from xmris_tpu.visualization.widget.phase.phase import _resolve_spectral_dim

_HERE = pathlib.Path(__file__).parent


class ScrollWidget(WidgetBase):
    """Interactive browser for a 2-D series of spectra."""

    _esm = _HERE / "scroller.js"
    _css = _HERE / "scroller.css"

    width = traitlets.Int(740).tag(sync=True)
    height = traitlets.Int(400).tag(sync=True)
    x_coords = traitlets.List().tag(sync=True)
    x_label = traitlets.Unicode("Chemical Shift [ppm]").tag(sync=True)
    spectra = traitlets.List().tag(sync=True)
    scroll_dim = traitlets.Unicode("").tag(sync=True)
    current_index = traitlets.Int(0).tag(sync=True)
    show_trace = traitlets.Bool(True).tag(sync=True)
    trace_count = traitlets.Int(10).tag(sync=True)
    xlim = traitlets.List(default_value=[]).tag(sync=True)
    ylim = traitlets.List(default_value=[]).tag(sync=True)


def scroll_spectra(
    da: XmrArray,
    scroll_axis: str | None = None,
    part: str = "real",
    xlim: tuple[float, float] | None = None,
    ylim: tuple[float, float] | None = None,
    show_trace: bool = True,
    trace_count: int = 10,
    width: int = 740,
    height: int = 400,
    **kwargs,
) -> ScrollWidget:
    """Open an interactive scroller through a 2-D spectra series."""
    if da.ndim != 2:
        raise ValueError(f"Input must be exactly 2-D, but has shape {da.shape}.")

    spec_dim, x_label = _resolve_spectral_dim(da)
    if spec_dim == str(da.dims[0]) and not any(
        k in spec_dim.lower() for k in ("ppm", "chem", "shift", "hz", "freq")
    ):
        # name heuristic found nothing: assume the last dim is spectral
        spec_dim = str(da.dims[-1])
        x_label = spec_dim

    if scroll_axis is not None:
        if scroll_axis not in da.dims:
            raise ValueError(
                f"Requested scroll_axis '{scroll_axis}' not found in dimensions: "
                f"{da.dims}"
            )
        if scroll_axis == spec_dim:
            # Scrolling ALONG the spectral axis would render a silently
            # transposed widget (frames labeled with spectral coords).
            raise ValueError(
                f"scroll_axis '{scroll_axis}' is the spectral dimension; "
                "scroll along the other dimension "
                f"({[str(d) for d in da.dims if str(d) != spec_dim]})."
            )
        scroll_dim = scroll_axis
    else:
        remaining = [str(d) for d in da.dims if str(d) != spec_dim]
        scroll_dim = remaining[0]
        for candidate in ("repetitions", "averages", "time"):
            if candidate in remaining:
                scroll_dim = candidate
                break

    vals = da.values
    if np.iscomplexobj(vals):
        selector = part.lower()
        if selector in ("real", "re"):
            vals = np.real(vals)
        elif selector in ("imag", "im"):
            vals = np.imag(vals)
        elif selector in ("abs", "mag", "magnitude"):
            vals = np.abs(vals)
        else:
            raise ValueError(f"Unknown part '{part}'. Use 'real', 'imag', or 'abs'.")
    vals = vals.astype(float)

    # Arrange as (scroll, spectral)
    if list(da.dims).index(scroll_dim) > list(da.dims).index(spec_dim):
        vals = vals.T

    x_vals = (
        da.coords[spec_dim].values.astype(float)
        if spec_dim in da.coords
        else np.arange(vals.shape[1], dtype=float)
    )

    return ScrollWidget(
        width=width,
        height=height,
        x_coords=x_vals.tolist(),
        x_label=x_label,
        spectra=vals.tolist(),
        scroll_dim=str(scroll_dim),
        current_index=0,
        show_trace=show_trace,
        trace_count=int(trace_count),
        xlim=list(xlim) if xlim is not None else [],
        ylim=list(ylim) if ylim is not None else [],
        **kwargs,
    )
