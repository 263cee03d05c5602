"""Edge-case coverage: multi-dim renames, tied priors end-to-end, widget
payload bounds, fourier term mapping subtleties."""

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray


class TestFourierRenames:
    def test_multi_dim_out_rename(self):
        """k-space style: fft over two dims with simultaneous renames."""
        rng = np.random.default_rng(0)
        da = XmrArray(
            rng.normal(size=(8, 8)) + 0j,
            dims=(DIMS.x, DIMS.y),
            coords={DIMS.x: np.arange(8.0), DIMS.y: np.arange(8.0)},
        )
        out = xmt.fft(da, dim=[DIMS.x, DIMS.y], out_dim=[DIMS.kx, DIMS.ky])
        assert out.dims == (DIMS.kx, DIMS.ky)
        np.testing.assert_allclose(
            out.coords[DIMS.kx].values, np.fft.fftfreq(8, d=1.0)
        )
        expected = np.fft.fftn(da.values, axes=(0, 1), norm="ortho")
        np.testing.assert_allclose(out.values, expected, atol=1e-12)

    def test_time_to_custom_name_skips_frequency_metadata(self):
        da = XmrArray(
            np.ones(16, complex),
            dims=(DIMS.time,),
            coords={DIMS.time: np.arange(16.0)},
        )
        out = xmt.fft(da, dim=DIMS.time, out_dim="weird")
        assert out.dims == ("weird",)
        # no frequency-term metadata injected for non-standard names
        assert out.coords["weird"].attrs.get("units") is None

    def test_fft_without_coords_uses_unit_spacing(self):
        # without out_dim the dim keeps its name; reciprocal coords use d=1
        da = XmrArray(np.ones(16, complex), dims=(DIMS.time,))
        out = xmt.fft(da)
        assert out.dims == (DIMS.time,)
        np.testing.assert_allclose(
            out.coords[DIMS.time].values, np.fft.fftfreq(16, d=1.0)
        )

    def test_ifft_frequency_to_time_metadata(self):
        da = XmrArray(
            np.ones(16, complex),
            dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.fft.fftfreq(16, d=1e-4)},
        )
        out = xmt.ifft(da, dim=DIMS.frequency, out_dim=DIMS.time)
        assert out.coords[DIMS.time].attrs["units"] == "s"


class TestZeroFillCustomDim:
    def test_custom_dim_keeps_old_coord_attrs(self):
        da = XmrArray(
            np.ones(8),
            dims=("custom",),
            coords={"custom": ("custom", np.arange(8.0), {"units": "furlongs"})},
        )
        out = da.xmr.zero_fill(dim="custom", target_points=16)
        assert out.coords["custom"].attrs["units"] == "furlongs"
        np.testing.assert_allclose(out.coords["custom"].values, np.arange(16.0))


class TestTiedPriorEndToEnd:
    def test_amplitude_tie_enforced_in_fit(self, tmp_path):
        """A 2:1 amplitude tie is honored by the fitted parameters."""
        pk = tmp_path / "pk.csv"
        pk.write_text(
            'Index,Big,Half\n'
            'Initial Values,,\n'
            'amplitude,10.0,0.5*Big\n'
            'chemicalshift,0.0,-5.0\n'
            'linewidth,15.0,15.0\n'
            'phase,0,0\n'
            'g,0,0\n'
            'Bounds,,\n'
            'amplitude,"(0, ",\n'
            'chemicalshift,"(-0.5, 0.5)","(-5.5, -4.5)"\n'
            'linewidth,"(5.0, 30.0)","(5.0, 30.0)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            'g,fixed,fixed\n'
        )
        mhz, sw, n = 100.0, 8000.0, 1024
        t = np.arange(n) / sw
        rng = np.random.default_rng(0)
        truth_big = 24.0
        data = (
            truth_big * np.exp(-15 * np.pi * t)
            + 0.5 * truth_big * np.exp((-15 * np.pi + 1j * 2 * np.pi * (-5.0 * mhz)) * t)
        )
        data = data + rng.normal(0, 0.2, n) + 1j * rng.normal(0, 0.2, n)
        da = XmrArray(
            data[None, :], dims=("voxel", "time"),
            coords={"time": t}, attrs={"MHz": mhz},
        )
        ds = da.xmr.fit_amares(pk)
        amps = ds["amplitude"].values[0]
        assert amps[0] == pytest.approx(truth_big, rel=0.05)
        # tie: Half is exactly 0.5 * Big by construction
        assert amps[1] == pytest.approx(0.5 * amps[0], rel=1e-6)

    def test_fixed_g_not_fit(self, tmp_path):
        pk = tmp_path / "pk.csv"
        pk.write_text(
            'Index,P\nInitial Values,\namplitude,5.0\nchemicalshift,0.0\n'
            'linewidth,10.0\nphase,0\ng,0\nBounds,\namplitude,"(0, "\n'
            'chemicalshift,"(-1, 1)"\nlinewidth,"(2, 50)"\n'
            'phase,"(-180, 180)"\ng,fixed\n'
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        p = load_prior_knowledge(pk)
        assert p.n_free == 4
        assert all("g" != lab.split(".")[1] for lab in p.free_labels)


class TestScrollerPayloadBounds:
    def test_xlim_ylim_forwarded(self):
        data = np.random.default_rng(0).normal(size=(3, 32)) + 0j
        da = XmrArray(
            data, dims=("repetitions", DIMS.frequency),
            coords={DIMS.frequency: np.linspace(-50, 50, 32)},
        )
        w = da.xmr.widget.scroll_spectra(xlim=(-20, 20), ylim=(-1, 1))
        assert w.xlim == [-20, 20]
        assert w.ylim == [-1, 1]

    def test_explicit_scroll_axis_validation(self):
        data = np.zeros((3, 8), complex)
        da = XmrArray(
            data, dims=("repetitions", DIMS.frequency),
            coords={DIMS.frequency: np.arange(8.0)},
        )
        with pytest.raises(ValueError, match="scroll_axis"):
            da.xmr.widget.scroll_spectra(scroll_axis="bogus")


class TestPipelineConfigValidation:
    def test_invalid_autophase_rejected(self):
        from xmris_tpu.parallel import PipelineConfig

        with pytest.raises(ValueError, match="autophase"):
            PipelineConfig(autophase="bogus")
