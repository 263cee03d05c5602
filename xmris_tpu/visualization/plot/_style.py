"""Shared styling helpers for the plot layer."""

from __future__ import annotations

import contextlib

import matplotlib.pyplot as plt
import numpy as np


def resolve_cmap(name: str):
    """Look up a colormap across matplotlib versions."""
    try:
        return plt.colormaps[name]
    except (AttributeError, TypeError):
        from matplotlib import cm

        return cm.get_cmap(name)


def sampled_colors(cmap_name: str, start: float, end: float, n: int):
    """Sample ``n`` colors from a colormap between two fractional stops."""
    return resolve_cmap(cmap_name)(np.linspace(start, end, n))


@contextlib.contextmanager
def plot_context(style: str, fontfamily: str, axes_linewidth: float = 1.2):
    """Style-sheet + rc context shared by every plot function."""
    rc = {"font.family": fontfamily, "axes.linewidth": axes_linewidth}
    with plt.style.context(style), plt.rc_context(rc):
        yield


def get_or_make_axes(ax, figsize):
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    else:
        fig = ax.get_figure()
    return fig, ax


def title_case(dim: str) -> str:
    return dim.replace("_", " ").title()
