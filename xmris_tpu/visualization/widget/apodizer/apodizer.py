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

from xmris_tpu.core.array import XmrArray
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


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def _spectral_axis(da: XmrArray, time_dim: str, unit: str):
    """Run the FID through the real framework pipeline to get exact x units.

    The browser engine recomputes spectra live from the time-domain payload;
    only the axis (ppm or Hz) comes from the Python side, so it must agree
    with what ``to_spectrum``/``to_ppm`` would produce.
    """
    spec = da.xmr.to_spectrum(dim=time_dim)
    if unit.lower() == "ppm":
        spec, label = spec.xmr.to_ppm(), "Chemical Shift [ppm]"
    else:
        axis_name = str(spec.dims[0]).lower()
        if "ppm" in axis_name or "shift" in axis_name:
            spec = spec.xmr.to_hz()
        label = "Frequency [Hz]"
    return spec.coords[str(spec.dims[0])].values.astype(float), label


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

    # The browser DSP engine is radix-2, so round the record up to the next
    # power of two with the framework's own zero_fill (end padding + linear
    # coordinate extrapolation — the same op users would chain themselves).
    from xmris_tpu.ops.fid import zero_fill

    da = zero_fill(da, dim=time_dim, target_points=_next_pow2(da.sizes[time_dim]))

    x_vals, x_label = _spectral_axis(da, time_dim, unit)

    payload = np.asarray(da.values)
    if not np.iscomplexobj(payload):
        payload = payload.astype(complex)

    return ApodizerWidget(
        width=width,
        height=height,
        t_coords=da.coords[time_dim].values.astype(float).tolist(),
        x_coords=x_vals.tolist(),
        x_label=x_label,
        reals_t=payload.real.tolist(),
        imags_t=payload.imag.tolist(),
        lb_min=lb_range[0],
        lb_max=lb_range[1],
        gb_min=gb_range[0],
        gb_max=gb_range[1],
        **kwargs,
    )
