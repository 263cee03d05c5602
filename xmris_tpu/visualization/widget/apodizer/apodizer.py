"""Interactive apodization widget (Python model side).

Capability parity with the reference apodizer
(``widget/apodizer/apodizer.py:11-130``): the factory zero-fills the FID to
the next power of two, derives the spectral axis through the *real* pipeline
(``to_spectrum`` + ``to_ppm``/``to_hz``), and ships the raw time-domain data
to the browser, whose DSP engine (``apodizer.js``) re-implements the
ortho-normalized radix-2 FFT, fftshift, and the exp / Lorentz-to-Gauss
windows 1:1 with :mod:`xmris_tpu.ops.fid` for live preview.
"""

from __future__ import annotations

import pathlib

import numpy as np
import traitlets

from xmris_tpu.core.array import Coord, XmrArray
from xmris_tpu.visualization.widget._backend import WidgetBase

_HERE = pathlib.Path(__file__).parent


class ApodizerWidget(WidgetBase):
    """Interactive line-broadening / resolution-enhancement viewer."""

    _esm = _HERE / "apodizer.js"
    _css = _HERE / "apodizer.css"

    width = traitlets.Int(740).tag(sync=True)
    height = traitlets.Int(550).tag(sync=True)

    t_coords = traitlets.List().tag(sync=True)
    x_coords = traitlets.List().tag(sync=True)
    x_label = traitlets.Unicode("Chemical Shift [ppm]").tag(sync=True)

    reals_t = traitlets.List().tag(sync=True)
    imags_t = traitlets.List().tag(sync=True)

    lb = traitlets.Float(0.0).tag(sync=True)
    gb = traitlets.Float(0.0).tag(sync=True)

    lb_min = traitlets.Float(0.0).tag(sync=True)
    lb_max = traitlets.Float(50.0).tag(sync=True)
    gb_min = traitlets.Float(0.0).tag(sync=True)
    gb_max = traitlets.Float(50.0).tag(sync=True)

    method = traitlets.Unicode("exp").tag(sync=True)
    display_mode = traitlets.Unicode("real").tag(sync=True)
    show_orig = traitlets.Bool(False).tag(sync=True)
    show_grid = traitlets.Bool(True).tag(sync=True)


def apodize_interactive(
    da: XmrArray,
    dim: str | None = None,
    unit: str = "ppm",
    width: int = 740,
    height: int = 550,
    lb_range: tuple[float, float] = (0.0, 50.0),
    gb_range: tuple[float, float] = (0.0, 50.0),
    **kwargs,
) -> ApodizerWidget:
    """Open an interactive apodization viewer for a 1-D time-domain FID."""
    if da.ndim != 1:
        raise ValueError(f"Input must be 1-D, but has shape {da.shape}.")

    time_dim = dim or str(da.dims[0])

    # Zero-fill to the next power of two (radix-2 engine in the browser).
    n = da.sizes[time_dim]
    n2 = 1 << (n - 1).bit_length()
    if n2 > n:
        pad = n2 - n
        values = np.pad(np.asarray(da.values), (0, pad), constant_values=0)
        t_vals = da.coords[time_dim].values.astype(float)
        dt = t_vals[1] - t_vals[0] if len(t_vals) > 1 else 1.0
        t_full = np.concatenate([t_vals, t_vals[-1] + np.arange(1, pad + 1) * dt])
        da = XmrArray(
            values,
            dims=(time_dim,),
            coords={time_dim: Coord(time_dim, t_full)},
            attrs=da.attrs,
            name=da.name,
        )

    # Spectral axis through the real pipeline so units are exact.
    da_spec = da.xmr.to_spectrum(dim=time_dim)
    if unit.lower() == "ppm":
        da_spec = da_spec.xmr.to_ppm()
        x_label = "Chemical Shift [ppm]"
    else:
        first = str(da_spec.dims[0]).lower()
        if "ppm" in first or "shift" in first:
            da_spec = da_spec.xmr.to_hz()
        x_label = "Frequency [Hz]"

    spec_dim = str(da_spec.dims[0])
    x_vals = da_spec.coords[spec_dim].values.astype(float)

    t_vals = da.coords[time_dim].values.astype(float)
    values = da.values
    if not np.iscomplexobj(values):
        values = values.astype(complex)

    return ApodizerWidget(
        width=width,
        height=height,
        t_coords=t_vals.tolist(),
        x_coords=x_vals.tolist(),
        x_label=x_label,
        reals_t=np.real(values).tolist(),
        imags_t=np.imag(values).tolist(),
        lb_min=lb_range[0],
        lb_max=lb_range[1],
        gb_min=gb_range[0],
        gb_max=gb_range[1],
        **kwargs,
    )
