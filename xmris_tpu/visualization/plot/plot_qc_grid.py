"""Quality-control grid: spectra + fits with CRLB failure shading.

API/behavior parity with the reference ``plot_qc_grid``
(``visualization/plot/plot_qc_grid.py:11-254``): even downsampling to
``max_plots``, conversion of raw/fit/residual FIDs to spectra through the
accessor pipeline, and shading of subplots whose worst CRLB exceeds the
threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.ticker import MaxNLocator

from xmris_tpu.core.array import XmrDataset
from xmris_tpu.core.config import DIMS
from xmris_tpu.visualization.plot._base_config import BasePlotConfig, PlotParam
from xmris_tpu.visualization.plot._style import plot_context, title_case


@dataclass
class PlotQCGridConfig(BasePlotConfig):
    """Configuration for AMARES fit quality-control grids."""

    # --- Figure & Canvas ---
    style: str = PlotParam(
        "seaborn-v0_8-white", "Figure & Canvas", "Matplotlib style sheet."
    )
    fontfamily: str = PlotParam(
        "sans-serif", "Figure & Canvas", "Font family for all text."
    )

    # --- Grid Layout ---
    max_cols: int = PlotParam(10, "Grid Layout", "Maximum grid columns.")
    max_plots: int | None = PlotParam(
        None,
        "Grid Layout",
        "Max subplots; None plots all spectra, N samples evenly when exceeded.",
    )
    sharey: bool = PlotParam(
        False, "Grid Layout", "Share y-limits to compare absolute amplitudes."
    )

    # --- Quality Control ---
    crlb_threshold: float = PlotParam(
        20.0, "Quality Control", "CRLB %% threshold flagging a bad fit."
    )
    fail_color: str = PlotParam(
        "#ffe6e6", "Quality Control", "Background color of failed-fit panels."
    )

    # --- Aesthetics & Zooming ---
    plot_residuals: bool = PlotParam(
        True, "Aesthetics", "Draw the residual trace below the fit."
    )
    xlim: tuple[float, float] | None = PlotParam(
        None, "Aesthetics", "x-axis zoom limits, e.g. (10.0, -20.0)."
    )
    ylim: tuple[float, float] | None = PlotParam(
        None, "Aesthetics", "y-axis zoom limits, e.g. (-10, 100)."
    )


def plot_qc_grid(
    ds: XmrDataset,
    dim: str,
    config: PlotQCGridConfig | None = None,
) -> plt.Figure:
    """Grid of per-index spectra with fit overlays and CRLB flagging."""
    cfg = config or PlotQCGridConfig()

    for v in ("fit_data", "raw_data", "crlb"):
        if v not in ds:
            raise ValueError(f"Dataset missing required AMARES variable: {v}")
    if dim not in ds.dims:
        raise ValueError(f"Dimension '{dim}' not found in Dataset.")

    n_total = ds.dims[dim]
    if cfg.max_plots is None or n_total <= cfg.max_plots:
        indices = np.arange(n_total)
    else:
        indices = np.linspace(0, n_total - 1, cfg.max_plots, dtype=int)

    n_plots = len(indices)
    cols = min(n_plots, cfg.max_cols)
    rows = int(np.ceil(n_plots / cols))

    freq_dim = DIMS.frequency
    dim_coords = (
        ds.coords[dim].values if dim in ds.coords else np.arange(n_total)
    )
    dim_unit = ds.coords[dim].attrs.get("units", "") if dim in ds.coords else ""

    # Convert the selected FIDs to real spectra once, through the accessor.
    idx_list = indices.tolist()
    raw_sel = ds["raw_data"].isel({dim: idx_list})
    fit_sel = ds["fit_data"].isel({dim: idx_list})
    spec_raw = raw_sel.xmr.to_spectrum(out_dim=freq_dim).real
    spec_fit = fit_sel.xmr.to_spectrum(out_dim=freq_dim).real
    spec_res = None
    if cfg.plot_residuals and "residuals" in ds:
        spec_res = ds["residuals"].isel({dim: idx_list}).xmr.to_spectrum(
            out_dim=freq_dim
        ).real
    crlb_sel = ds["crlb"].isel({dim: idx_list})

    freq_coords = spec_raw.coords[freq_dim].values

    with plot_context(cfg.style, cfg.fontfamily, axes_linewidth=1.0):
        fig, axes = plt.subplots(
            rows, cols,
            figsize=(cols * 3.5, rows * 2.5),
            sharex=True, sharey=cfg.sharey, squeeze=False,
            gridspec_kw={"wspace": 0.0, "hspace": 0.0},
        )
        flat = axes.flatten()

        for i, idx_val in enumerate(indices):
            ax = flat[i]
            raw_i = spec_raw.isel({dim: i}).values
            ax.plot(freq_coords, raw_i, color="black", alpha=0.4, label="Raw")
            ax.plot(
                freq_coords, spec_fit.isel({dim: i}).values,
                color="red", linewidth=1.2, label="Fit",
            )
            if spec_res is not None:
                offset = float(np.max(raw_i)) * 0.2
                ax.plot(
                    freq_coords, spec_res.isel({dim: i}).values - offset,
                    color="green", alpha=0.6, linewidth=1.0,
                )

            crlbs = crlb_sel.isel({dim: i}).values
            worst = np.nanmax(np.nan_to_num(crlbs, nan=np.inf))

            coord_val = dim_coords[idx_val]
            if isinstance(coord_val, (int, np.integer)):
                tag = f"{coord_val}{dim_unit}"
            else:
                tag = f"{coord_val:.1f}{dim_unit}"

            if worst > cfg.crlb_threshold:
                ax.set_facecolor(cfg.fail_color)
                text_color = "darkred"
                tag += "\nCRLB: NaN" if np.isinf(worst) else f"\nCRLB: {worst:.1f}%"
            else:
                text_color = "black"

            ax.text(
                0.04, 0.94, tag,
                transform=ax.transAxes, fontsize=10, fontweight="bold",
                color=text_color, va="top", ha="left",
                bbox=dict(
                    boxstyle="round,pad=0.2", facecolor="white",
                    alpha=0.7, edgecolor="none",
                ),
            )

            if cfg.xlim is not None:
                ax.set_xlim(cfg.xlim)
            elif not ax.xaxis_inverted():
                ax.invert_xaxis()
            if cfg.ylim is not None:
                ax.set_ylim(cfg.ylim)
            ax.set_yticks([])

        for j in range(n_plots, len(flat)):
            flat[j].axis("off")

        for ax in axes[-1, :]:
            ax.xaxis.set_major_locator(MaxNLocator(nbins=4, prune="both"))

        x_unit = spec_raw.coords[freq_dim].attrs.get("units", "Hz")
        fig.supxlabel(
            f"{title_case(freq_dim)} [{x_unit}]", fontweight="bold", fontsize=12
        )
        fig.tight_layout()

    return fig
