"""xarray interop tests against a minimal stub (xarray absent in this env).

The stub implements just enough of the DataArray surface for the conversion
logic; the module under test is reloaded with the stub installed and
restored afterwards.
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


def _make_stub():
    stub = types.ModuleType("xarray")
    stub.DataArray = _StubDataArray
    stub._accessors = {}

    def register_dataarray_accessor(name):
        def deco(cls):
            stub._accessors[name] = cls
            setattr(stub.DataArray, name, property(lambda self: cls(self)))
            return cls

        return deco

    stub.register_dataarray_accessor = register_dataarray_accessor
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


class TestAccessorRegistration:
    def test_registers_and_chains(self, xr_interop):
        iox, stub = xr_interop
        assert iox.register_xarray_accessors() is True
        assert "xmr" in stub._accessors

        n, sw = 64, 4000.0
        t = np.arange(n) / sw
        da = stub.DataArray(
            np.exp((1j * 2 * np.pi * 500.0 - 30.0) * t),
            dims=("time",),
            coords={"time": t},
        )
        spec = da.xmr.to_spectrum()
        # results convert back to (stub) xarray objects
        assert isinstance(spec, stub.DataArray)
        assert spec.dims == ("frequency",)
        expected = np.fft.fftshift(np.fft.fft(da.values, norm="ortho"))
        np.testing.assert_allclose(spec.values, expected, atol=1e-9)

    def test_registration_without_xarray_is_noop(self):
        import xmris_tpu.interop.xarray as iox

        assert iox.HAS_XARRAY is False
        assert iox.register_xarray_accessors() is False
