"""Visualization layer tests: configs, input parsing, and headless rendering."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray
from xmris_tpu.visualization.plot import (
    CarpetConfig,
    PlotQCGridConfig,
    PlotTrajectoryConfig,
    WaterfallConfig,
    parse_input_dims_timeseries,
    plot_carpet,
    plot_trajectory,
    plot_waterfall,
)


@pytest.fixture
def series_da():
    """10 repetitions x 256-pt spectra with chemical shift coords."""
    rng = np.random.default_rng(0)
    n, reps = 256, 10
    ppm = np.linspace(10, -10, n)
    data = np.exp(-((ppm[None, :] - 2.0) ** 2)) * np.arange(1, reps + 1)[:, None]
    data = data + rng.normal(0, 0.01, data.shape)
    return XmrArray(
        data,
        dims=("repetitions", DIMS.chemical_shift),
        coords={
            DIMS.chemical_shift: (DIMS.chemical_shift, ppm, {"units": "ppm"}),
            "repetitions": ("repetitions", np.arange(reps) * 2.0, {"units": "s"}),
        },
    )


class TestInputParsing:
    def test_auto_detect_chemical_shift(self, series_da):
        x, stack = parse_input_dims_timeseries(series_da)
        assert x == DIMS.chemical_shift
        assert stack == "repetitions"

    def test_explicit_dims(self, series_da):
        x, stack = parse_input_dims_timeseries(
            series_da, "chemical_shift", "repetitions"
        )
        assert (x, stack) == ("chemical_shift", "repetitions")

    def test_missing_x_raises(self):
        da = XmrArray(np.zeros((2, 3)), dims=("a", "b"))
        with pytest.raises(ValueError, match="chemical_shift"):
            parse_input_dims_timeseries(da)

    def test_one_dim_raises(self):
        da = XmrArray(np.zeros(4), dims=(DIMS.frequency,))
        with pytest.raises(ValueError, match="at least two"):
            parse_input_dims_timeseries(da)

    def test_three_dim_prefers_average(self):
        # This path AttributeErrors in the reference (DIMS.averages bug)
        da = XmrArray(
            np.zeros((2, 3, 4)), dims=("other", DIMS.average, DIMS.frequency)
        )
        x, stack = parse_input_dims_timeseries(da)
        assert x == DIMS.frequency
        assert stack == DIMS.average


class TestConfigs:
    @pytest.mark.parametrize(
        "cfg_cls",
        [WaterfallConfig, CarpetConfig, PlotTrajectoryConfig, PlotQCGridConfig],
    )
    def test_rich_reprs(self, cfg_cls):
        cfg = cfg_cls()
        html = cfg._repr_html_()
        assert cfg_cls.__name__ in html
        md = cfg._repr_markdown_()
        assert "| Parameter |" in md
        s = str(cfg)
        assert "Current Settings" in s

    def test_waterfall_defaults(self):
        cfg = WaterfallConfig()
        assert cfg.cmap == "magma"
        assert cfg.stack_skew == -20.0
        assert cfg.figsize == (8, 6)

    def test_carpet_defaults(self):
        cfg = CarpetConfig()
        assert cfg.cbar_label == "Signal Intensity (a.u.)"
        assert cfg.cmap_start == 0.1


class TestWaterfall:
    def test_renders(self, series_da):
        ax = plot_waterfall(series_da)
        assert len(ax.lines) >= 10
        assert ax.xaxis_inverted()
        plt.close("all")

    def test_accessor_route(self, series_da):
        ax = series_da.xmr.plot.waterfall()
        assert ax is not None
        plt.close("all")

    def test_invalid_skew(self, series_da):
        with pytest.raises(ValueError, match="stack_skew"):
            plot_waterfall(series_da, config=WaterfallConfig(stack_skew=90.0))

    def test_no_cmap(self, series_da):
        ax = plot_waterfall(series_da, config=WaterfallConfig(cmap=None))
        assert len(ax.collections) == 0  # no fills
        plt.close("all")

    def test_renders_without_x_coordinate(self, series_da):
        """A coordinate-less x dim falls back to sample indices, like the
        stack axis already did, instead of a bare KeyError."""
        bare = XmrArray(
            np.asarray(series_da.values),
            dims=("repetitions", DIMS.chemical_shift),
        )
        ax = plot_waterfall(bare)
        assert len(ax.lines) >= 10
        plt.close("all")
        ax = plot_carpet(bare)
        assert len(ax.collections) >= 1
        plt.close("all")


class TestCarpet:
    def test_renders(self, series_da):
        ax = plot_carpet(series_da)
        assert len(ax.collections) >= 1  # the pcolormesh
        assert ax.xaxis_inverted()
        plt.close("all")

    def test_no_colorbar(self, series_da):
        ax = plot_carpet(series_da, config=CarpetConfig(cbar_on=False))
        assert len(ax.get_figure().axes) == 1
        plt.close("all")


class TestTrajectoryAndQC:
    @pytest.fixture
    def fit_ds(self, tmp_path):
        from tests.test_fitting import PK_CSV, make_phantom

        pk = tmp_path / "pk.csv"
        pk.write_text(PK_CSV)
        return make_phantom(n_voxels=4).xmr.fit_amares(pk)

    def test_trajectory(self, fit_ds):
        ax = fit_ds.xmr.plot.trajectory(dim="voxel")
        assert len(ax.lines) == 2  # PCr + ATP
        assert len(ax.collections) == 2  # error bands
        plt.close("all")

    def test_trajectory_metabolite_subset(self, fit_ds):
        ax = fit_ds.xmr.plot.trajectory(dim="voxel", metabolites=["PCr"])
        assert len(ax.lines) == 1
        plt.close("all")

    def test_trajectory_missing_var(self):
        from xmris_tpu import XmrDataset

        with pytest.raises(ValueError, match="amplitude"):
            XmrDataset().xmr.plot.trajectory(dim="voxel")

    def test_qc_grid(self, fit_ds):
        fig = fit_ds.xmr.plot.qc_grid(dim="voxel")
        # 4 voxels -> 4 active axes
        active = [a for a in fig.axes if a.axison]
        assert len(active) == 4
        plt.close("all")

    def test_qc_grid_downsampling(self, fit_ds):
        fig = fit_ds.xmr.plot.qc_grid(
            dim="voxel", config=PlotQCGridConfig(max_plots=2)
        )
        active = [a for a in fig.axes if a.axison]
        assert len(active) == 2
        plt.close("all")
