"""Numeric parity tests: every processing op vs its NumPy float64 oracle.

Tolerance contract from BASELINE.md: spectra parity <= 1e-6 relative — on the
CPU/x64 path we assert far tighter (1e-12) since the math is identical.
"""

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray

RTOL = 1e-12


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


class TestShifts:
    def test_fftshift_matches_numpy(self, valid_fid_da):
        out = xmt.fftshift(valid_fid_da, dim=DIMS.time)
        np.testing.assert_array_equal(
            out.values, np.fft.fftshift(valid_fid_da.values)
        )

    def test_ifftshift_matches_numpy(self, valid_fid_da):
        out = xmt.ifftshift(valid_fid_da, dim=DIMS.time)
        np.testing.assert_array_equal(
            out.values, np.fft.ifftshift(valid_fid_da.values)
        )

    def test_roundtrip_odd_length(self):
        da = XmrArray(np.arange(7.0), dims=("t",), coords={"t": np.arange(7.0)})
        rt = xmt.fftshift(xmt.ifftshift(da, dim="t"), dim="t")
        np.testing.assert_array_equal(rt.values, da.values)
        np.testing.assert_array_equal(rt.coords["t"].values, da.coords["t"].values)

    def test_shift_rolls_coords(self, valid_fid_da):
        out = xmt.fftshift(valid_fid_da, dim=DIMS.time)
        np.testing.assert_array_equal(
            out.coords[DIMS.time].values,
            np.roll(valid_fid_da.coords[DIMS.time].values, 2048 // 2),
        )

    def test_missing_dim_raises(self, valid_fid_da):
        with pytest.raises(ValueError, match="missing"):
            xmt.fftshift(valid_fid_da, dim="nope")


class TestFFT:
    def test_fft_ortho_parity(self, valid_fid_da):
        out = xmt.fft(valid_fid_da, dim=DIMS.time)
        expected = np.fft.fftn(valid_fid_da.values, axes=(0,), norm="ortho")
        assert rel_err(out.values, expected) < RTOL

    def test_ifft_ortho_parity(self, valid_fid_da):
        out = xmt.ifft(valid_fid_da, dim=DIMS.time)
        expected = np.fft.ifftn(valid_fid_da.values, axes=(0,), norm="ortho")
        assert rel_err(out.values, expected) < RTOL

    def test_fft_reciprocal_coords(self, valid_fid_da):
        out = xmt.fft(valid_fid_da, dim=DIMS.time, out_dim=DIMS.frequency)
        assert out.dims == (DIMS.frequency,)
        t = valid_fid_da.coords[DIMS.time].values
        expected = np.fft.fftfreq(len(t), d=t[1] - t[0])
        np.testing.assert_allclose(out.coords[DIMS.frequency].values, expected)
        # time->frequency term mapping injects unit metadata
        assert out.coords[DIMS.frequency].attrs["units"] == "Hz"

    def test_fft_multi_dim(self, multi_dim_da):
        out = xmt.fft(multi_dim_da, dim=[DIMS.x, DIMS.y])
        expected = np.fft.fftn(multi_dim_da.values, axes=(0, 1), norm="ortho")
        assert rel_err(out.values, expected) < RTOL

    def test_out_dim_length_mismatch(self, multi_dim_da):
        with pytest.raises(ValueError, match="same length"):
            xmt.fft(multi_dim_da, dim=[DIMS.x, DIMS.y], out_dim=["kx"])

    def test_fftc_centered_parity(self, valid_fid_da):
        out = xmt.fftc(valid_fid_da, dim=DIMS.time)
        v = valid_fid_da.values
        expected = np.fft.fftshift(
            np.fft.fftn(np.fft.ifftshift(v), axes=(0,), norm="ortho")
        )
        assert rel_err(out.values, expected) < RTOL

    def test_ifftc_inverts_fftc(self, valid_fid_da):
        out = xmt.ifftc(xmt.fftc(valid_fid_da, dim=DIMS.time), dim=DIMS.time)
        assert rel_err(out.values, valid_fid_da.values) < 1e-10

    def test_attrs_preserved(self, valid_fid_da):
        out = xmt.fft(valid_fid_da, dim=DIMS.time)
        assert out.attrs == valid_fid_da.attrs


class TestToSpectrum:
    def test_parity(self, valid_fid_da):
        out = valid_fid_da.xmr.to_spectrum()
        expected = np.fft.fftshift(
            np.fft.fftn(valid_fid_da.values, axes=(0,), norm="ortho")
        )
        assert rel_err(out.values, expected) < RTOL
        assert out.dims == (DIMS.frequency,)

    def test_frequency_coords_centered(self, valid_fid_da):
        out = valid_fid_da.xmr.to_spectrum()
        freqs = out.coords[DIMS.frequency].values
        t = valid_fid_da.coords[DIMS.time].values
        expected = np.fft.fftshift(np.fft.fftfreq(len(t), d=t[1] - t[0]))
        np.testing.assert_allclose(freqs, expected)

    def test_roundtrip_to_fid(self, valid_fid_da):
        spec = valid_fid_da.xmr.to_spectrum()
        fid = spec.xmr.to_fid()
        assert rel_err(fid.values, valid_fid_da.values) < 1e-10
        # time coords reconstructed via dt = 1/(n*df)
        np.testing.assert_allclose(
            fid.coords[DIMS.time].values,
            valid_fid_da.coords[DIMS.time].values,
            atol=1e-12,
        )

    def test_peak_at_expected_frequency(self):
        n, sw, f0 = 1024, 4000.0, 250.0
        t = np.arange(n) / sw
        da = XmrArray(
            np.exp((1j * 2 * np.pi * f0 - 20.0) * t),
            dims=(DIMS.time,),
            coords={COORDS.time: (DIMS.time, t)},
        )
        spec = da.xmr.to_spectrum()
        peak = spec.coords[DIMS.frequency].values[int(np.argmax(np.abs(spec.values)))]
        assert abs(peak - f0) <= sw / n


class TestApodize:
    def test_exp_formula(self, valid_fid_da):
        lb = 5.0
        out = valid_fid_da.xmr.apodize_exp(lb=lb)
        t = valid_fid_da.coords[DIMS.time].values
        expected = valid_fid_da.values * np.exp(-np.pi * lb * t)
        assert rel_err(out.values, expected) < RTOL
        assert out.attrs[ATTRS.apodization_lb] == lb

    def test_exp_preserves_attrs_and_coords(self, valid_fid_da):
        out = valid_fid_da.xmr.apodize_exp(lb=2.0)
        for k, v in valid_fid_da.attrs.items():
            assert out.attrs[k] == v
        np.testing.assert_array_equal(
            out.coords[DIMS.time].values, valid_fid_da.coords[DIMS.time].values
        )

    def test_lg_formula(self, valid_fid_da):
        lb, gb = 3.0, 7.0
        out = valid_fid_da.xmr.apodize_lg(lb=lb, gb=gb)
        t = valid_fid_da.coords[DIMS.time].values
        t_g = (2 * np.sqrt(np.log(2))) / (np.pi * gb)
        expected = (
            valid_fid_da.values * np.exp(np.pi * lb * t) * np.exp(-(t**2) / t_g**2)
        )
        assert rel_err(out.values, expected) < RTOL
        assert out.attrs[ATTRS.apodization_gb] == gb

    def test_lg_zero_gb(self, valid_fid_da):
        out = valid_fid_da.xmr.apodize_lg(lb=3.0, gb=0.0)
        t = valid_fid_da.coords[DIMS.time].values
        expected = valid_fid_da.values * np.exp(np.pi * 3.0 * t)
        assert rel_err(out.values, expected) < RTOL

    def test_broadcast_over_voxels(self, multi_dim_da):
        out = multi_dim_da.xmr.apodize_exp(lb=4.0)
        t = multi_dim_da.coords[DIMS.time].values
        expected = multi_dim_da.values * np.exp(-np.pi * 4.0 * t)[None, None, :]
        assert rel_err(out.values, expected) < RTOL
        assert out.dims == multi_dim_da.dims


class TestZeroFill:
    def test_end_padding(self, valid_fid_da):
        out = valid_fid_da.xmr.zero_fill(target_points=4096)
        assert out.sizes[DIMS.time] == 4096
        np.testing.assert_array_equal(out.values[2048:], 0)
        np.testing.assert_array_equal(out.values[:2048], valid_fid_da.values)

    def test_end_coords_extrapolated(self, valid_fid_da):
        out = valid_fid_da.xmr.zero_fill(target_points=4096)
        t = valid_fid_da.coords[DIMS.time].values
        dt = t[1] - t[0]
        np.testing.assert_allclose(
            out.coords[DIMS.time].values, t[0] + np.arange(4096) * dt
        )
        assert out.coords[DIMS.time].attrs["units"] == "s"

    def test_symmetric_padding(self):
        da = XmrArray(
            np.ones(10), dims=("kx",), coords={"kx": np.arange(10.0)}
        )
        out = da.xmr.zero_fill(dim="kx", target_points=16, position="symmetric")
        assert out.sizes["kx"] == 16
        np.testing.assert_array_equal(out.values[:3], 0)
        np.testing.assert_array_equal(out.values[13:], 0)
        np.testing.assert_array_equal(out.values[3:13], 1)
        np.testing.assert_allclose(out.coords["kx"].values, np.arange(16.0) - 3)

    def test_noop_when_target_smaller(self, valid_fid_da):
        out = valid_fid_da.xmr.zero_fill(target_points=100)
        assert out.sizes[DIMS.time] == 2048

    def test_invalid_position(self, valid_fid_da):
        with pytest.raises(ValueError, match="position"):
            valid_fid_da.xmr.zero_fill(target_points=4096, position="middle")

    def test_lineage_attrs(self, valid_fid_da):
        out = valid_fid_da.xmr.zero_fill(target_points=4096)
        assert out.attrs[ATTRS.zero_fill_target] == 4096
        assert out.attrs[ATTRS.zero_fill_position] == "end"
        assert out.attrs[ATTRS.reference_frequency] == pytest.approx(127.6261421)


class TestCoordConversions:
    def test_to_ppm(self, valid_spectrum_da):
        out = valid_spectrum_da.xmr.to_ppm()
        assert out.dims == (DIMS.chemical_shift,)
        hz = valid_spectrum_da.coords[DIMS.frequency].values
        expected = 4.7 + hz / 127.6261421
        np.testing.assert_allclose(out.coords[DIMS.chemical_shift].values, expected)
        # original Hz coords retained as a non-dim coordinate
        assert out.coords[DIMS.frequency].dim == DIMS.chemical_shift

    def test_to_hz_roundtrip(self, valid_spectrum_da):
        back = valid_spectrum_da.xmr.to_ppm().xmr.to_hz()
        assert back.dims == (DIMS.frequency,)
        np.testing.assert_allclose(
            back.coords[DIMS.frequency].values,
            valid_spectrum_da.coords[DIMS.frequency].values,
            atol=1e-9,
        )

    def test_to_ppm_requires_attrs(self, valid_spectrum_da):
        bare = valid_spectrum_da.copy()
        bare.attrs = {}
        with pytest.raises(ValueError, match="reference_frequency"):
            bare.xmr.to_ppm()

    def test_to_ppm_multidim(self, multi_dim_da):
        spec = multi_dim_da.xmr.to_spectrum()
        out = spec.xmr.to_ppm()
        assert out.dims == (DIMS.x, DIMS.y, DIMS.chemical_shift)


class TestComplexUtils:
    def test_roundtrip(self, valid_fid_da):
        split = valid_fid_da.xmr.to_real_imag()
        assert split.dims == (DIMS.time, DIMS.component)
        assert not np.iscomplexobj(split.values)
        back = split.xmr.to_complex()
        assert rel_err(back.values, valid_fid_da.values) < RTOL
        assert back.attrs == valid_fid_da.attrs

    def test_component_labels(self, valid_fid_da):
        split = valid_fid_da.xmr.to_real_imag()
        np.testing.assert_array_equal(
            split.coords[DIMS.component].values, np.array(["real", "imag"], dtype=object)
        )
        np.testing.assert_allclose(
            split.sel({DIMS.component: "real"}).values, valid_fid_da.values.real
        )


class TestChainLineage:
    def test_full_chain_preserves_attrs(self, valid_fid_da):
        out = (
            valid_fid_da.xmr.zero_fill(target_points=4096)
            .xmr.apodize_exp(lb=5.0)
            .xmr.to_spectrum()
            .xmr.phase(p0=30.0)
        )
        assert out.attrs[ATTRS.reference_frequency] == pytest.approx(127.6261421)
        assert out.attrs[ATTRS.zero_fill_target] == 4096
        assert out.attrs[ATTRS.apodization_lb] == 5.0
        assert out.attrs[ATTRS.phase_p0] == 30.0
