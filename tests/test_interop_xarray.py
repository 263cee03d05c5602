"""xarray interop tests against a minimal stub.

Real xarray is absent from this environment and cannot be installed (no
network egress — `pip install xarray` fails at DNS resolution).  The stub
below implements the exact DataArray/Dataset surface the adapter consumes
(constructor signatures, ``.values/.dims/.coords/.attrs/.name``,
``data_vars``, accessor registration hooks); the module under test is
reloaded with the stub installed and restored afterwards.
"""

import importlib
import sys
import types

import numpy as np
import pytest

from xmris_tpu import DIMS, XmrArray


class _StubCoord:
    def __init__(self, dims, values, attrs=None):
        self.dims = dims if isinstance(dims, tuple) else (dims,)
        self.values = np.asarray(values)
        self.attrs = dict(attrs or {})

    @property
    def ndim(self):
        return self.values.ndim


class _StubDataArray:
    def __init__(self, data, dims=None, coords=None, attrs=None, name=None):
        self.values = np.asarray(data)
        self.dims = tuple(dims or ())
        self.coords = {}
        for k, spec in (coords or {}).items():
            if isinstance(spec, tuple):
                d, v = spec[0], spec[1]
                a = spec[2] if len(spec) > 2 else {}
                self.coords[k] = _StubCoord(d, v, a)
            else:
                self.coords[k] = _StubCoord(k, spec)
        self.attrs = dict(attrs or {})
        self.name = name


class _StubDataset:
    def __init__(self, data_vars=None, attrs=None):
        self.data_vars = dict(data_vars or {})
        self.attrs = dict(attrs or {})

    def __getitem__(self, key):
        return self.data_vars[key]

    def __contains__(self, key):
        return key in self.data_vars


def _make_stub():
    stub = types.ModuleType("xarray")
    stub.DataArray = _StubDataArray
    stub.Dataset = _StubDataset
    stub._accessors = {}

    def _register(target_cls):
        def factory(name):
            def deco(cls):
                stub._accessors[name] = cls
                setattr(target_cls, name, property(lambda self: cls(self)))
                return cls

            return deco

        return factory

    stub.register_dataarray_accessor = _register(_StubDataArray)
    stub.register_dataset_accessor = _register(_StubDataset)
    return stub


@pytest.fixture
def xr_interop(monkeypatch):
    stub = _make_stub()
    monkeypatch.setitem(sys.modules, "xarray", stub)
    import xmris_tpu.interop.xarray as iox

    importlib.reload(iox)
    yield iox, stub
    # restore the module to its no-xarray state for the rest of the session
    monkeypatch.delitem(sys.modules, "xarray")
    importlib.reload(iox)


class TestConversions:
    def test_from_xarray(self, xr_interop):
        iox, stub = xr_interop
        da = stub.DataArray(
            np.arange(8.0) + 1j,
            dims=("time",),
            coords={"time": (("time"), np.arange(8.0) / 1e3, {"units": "s"})},
            attrs={"MHz": 100.0},
            name="fid",
        )
        out = iox.from_xarray(da)
        assert isinstance(out, XmrArray)
        assert out.dims == ("time",)
        assert out.attrs == {"MHz": 100.0}
        assert out.coords["time"].attrs["units"] == "s"

    def test_to_xarray(self, xr_interop):
        iox, stub = xr_interop
        native = XmrArray(
            np.ones(4),
            dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.arange(4.0)},
            attrs={"a": 1},
            name="spec",
        )
        out = iox.to_xarray(native)
        assert isinstance(out, stub.DataArray)
        assert out.dims == (DIMS.frequency,)
        assert out.attrs == {"a": 1}

    def test_roundtrip(self, xr_interop):
        iox, stub = xr_interop
        native = XmrArray(
            np.arange(6.0).reshape(2, 3),
            dims=("a", "b"),
            coords={"b": np.arange(3.0)},
            attrs={"k": "v"},
        )
        back = iox.from_xarray(iox.to_xarray(native))
        np.testing.assert_array_equal(back.values, native.values)
        assert back.dims == native.dims
        assert back.attrs == native.attrs

    def test_dataset_roundtrip(self, xr_interop):
        iox, stub = xr_interop
        from xmris_tpu.core.array import XmrDataset

        ds = XmrDataset(attrs={"fit_method": "leastsq"})
        ds["amplitude"] = XmrArray(
            np.ones((2, 3)),
            dims=("voxel", "Metabolite"),
            coords={"Metabolite": np.array(["a", "b", "c"], dtype=object)},
        )
        xds = iox.to_xarray_dataset(ds)
        assert isinstance(xds, stub.Dataset)
        assert xds.attrs["fit_method"] == "leastsq"
        back = iox.from_xarray_dataset(xds)
        assert set(back.keys()) == {"amplitude"}
        np.testing.assert_array_equal(
            back["amplitude"].values, ds["amplitude"].values
        )


def _quickstart_fid(stub, n=256, sw=4000.0, mhz=100.0):
    t = np.arange(n) / sw
    data = 5.0 * np.exp((1j * 2 * np.pi * 500.0 - 30.0) * t)
    return stub.DataArray(
        data,
        dims=("time",),
        coords={"time": (("time"), t, {"units": "s"})},
        attrs={"MHz": mhz, "reference_frequency": mhz, "carrier_ppm": 4.7},
    )


class TestAccessorRegistration:
    def test_registers_and_chains(self, xr_interop):
        iox, stub = xr_interop
        assert iox.register_xarray_accessors() is True
        assert "xmr" in stub._accessors

        da = _quickstart_fid(stub, n=64)
        spec = da.xmr.to_spectrum()
        # results convert back to (stub) xarray objects
        assert isinstance(spec, stub.DataArray)
        assert spec.dims == ("frequency",)
        expected = np.fft.fftshift(np.fft.fft(da.values, norm="ortho"))
        np.testing.assert_allclose(spec.values, expected, atol=1e-9)

    def test_quickstart_chain_on_xarray(self, xr_interop):
        # The reference Quick Start: every link re-enters through `.xmr`
        # on the (stub) xarray object — no double wrapping, no native leaks.
        iox, stub = xr_interop
        iox.register_xarray_accessors()

        da = _quickstart_fid(stub)
        out = (
            da.xmr.zero_fill(target_points=512)
            .xmr.apodize_exp(lb=5.0)
            .xmr.to_spectrum()
            .xmr.autophase()
        )
        assert isinstance(out, stub.DataArray)
        assert out.attrs["apodization_lb"] == 5.0
        assert "phase_p0" in out.attrs
        ppm = out.xmr.to_ppm()
        assert isinstance(ppm, stub.DataArray)
        assert ppm.dims == ("chemical_shift",)
        peak = float(
            ppm.coords["chemical_shift"].values[np.argmax(np.abs(ppm.values))]
        )
        assert peak == pytest.approx(4.7 + 500.0 / 100.0, abs=0.1)

    def test_properties_not_wrapped(self, xr_interop):
        iox, stub = xr_interop
        iox.register_xarray_accessors()
        da = _quickstart_fid(stub, n=64)
        from xmris_tpu.core.accessor import (
            XmrisPlotAccessor,
            XmrisWidgetAccessor,
        )

        assert isinstance(da.xmr.plot, XmrisPlotAccessor)
        assert isinstance(da.xmr.widget, XmrisWidgetAccessor)

    def test_fit_returns_xarray_dataset(self, xr_interop, tmp_path):
        iox, stub = xr_interop
        iox.register_xarray_accessors()
        from tests.test_fitting import PK_CSV

        pk = tmp_path / "pk.csv"
        pk.write_text(PK_CSV)

        n, sw, mhz = 256, 4000.0, 100.0
        t = np.arange(n) / sw
        rows = np.stack(
            [a * np.exp((-np.pi * 10.0) * t) for a in (3.0, 6.0)]
        ).astype(complex)
        da = stub.DataArray(
            rows,
            dims=("voxel", "time"),
            coords={"time": (("time"), t, {})},
            attrs={"MHz": mhz},
        )
        ds = da.xmr.fit_amares(pk, max_iter=25)
        assert isinstance(ds, stub.Dataset)
        assert "amplitude" in ds
        amp = ds["amplitude"]
        assert isinstance(amp, stub.DataArray)
        np.testing.assert_allclose(
            amp.values[:, 0], [3.0, 6.0], rtol=0.05
        )

    def test_dataset_accessor_plots(self, xr_interop, tmp_path):
        # fit_ds.xmr.plot.qc_grid(...) must work on the (stub) Dataset —
        # reference registers a Dataset accessor too (accessor.py:691-704).
        iox, stub = xr_interop
        iox.register_xarray_accessors()
        assert hasattr(stub.Dataset, "xmr")

        import matplotlib

        matplotlib.use("Agg")
        from tests.test_fitting import PK_CSV, make_phantom

        pk = tmp_path / "pk.csv"
        pk.write_text(PK_CSV)
        native_ds = make_phantom(n_voxels=3, n_points=256).xmr.fit_amares(
            pk, max_iter=20
        )
        xds = iox.to_xarray_dataset(native_ds)
        fig = xds.xmr.plot.qc_grid(dim="voxel")
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_registration_without_xarray_is_noop(self):
        import xmris_tpu.interop.xarray as iox

        assert iox.HAS_XARRAY is False
        assert iox.register_xarray_accessors() is False
