"""XmrArray carrier contract tests: construction, indexing, broadcasting."""

import numpy as np
import pytest

from xmris_tpu import DIMS, Coord, XmrArray


def _simple():
    return XmrArray(
        np.arange(12.0).reshape(3, 4),
        dims=("a", "b"),
        coords={"a": np.array([10.0, 20.0, 30.0]), "b": ("b", np.arange(4) * 0.5)},
        attrs={"k": 1},
        name="s",
    )


class TestConstruction:
    def test_basic(self):
        da = _simple()
        assert da.dims == ("a", "b")
        assert da.sizes == {"a": 3, "b": 4}
        assert da.coords["a"].dim == "a"
        assert da.attrs == {"k": 1}

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="axes"):
            XmrArray(np.zeros((2, 3)), dims=("a",))

    def test_coord_length_mismatch_raises(self):
        with pytest.raises(ValueError, match="length"):
            XmrArray(np.zeros(4), dims=("t",), coords={"t": np.arange(5)})

    def test_bare_coord_must_be_dim(self):
        with pytest.raises(ValueError, match="not a dimension"):
            XmrArray(np.zeros(4), dims=("t",), coords={"other": np.arange(4)})


class TestIndexing:
    def test_isel_int_drops_dim(self):
        da = _simple()
        row = da.isel({"a": 1})
        assert row.dims == ("b",)
        assert "a" not in row.coords
        np.testing.assert_array_equal(row.values, [4, 5, 6, 7])

    def test_isel_slice_keeps_dim(self):
        da = _simple()
        sub = da.isel({"b": slice(1, 3)})
        assert sub.sizes == {"a": 3, "b": 2}
        np.testing.assert_array_equal(sub.coords["b"].values, [0.5, 1.0])

    def test_sel_by_label(self):
        da = _simple()
        row = da.sel({"a": 20.0})
        np.testing.assert_array_equal(row.values, [4, 5, 6, 7])

    def test_roll_with_coords(self):
        da = _simple()
        rolled = da.roll({"b": 2}, roll_coords=True)
        np.testing.assert_array_equal(rolled.values[:, 0], [2, 6, 10])
        np.testing.assert_array_equal(rolled.coords["b"].values, [1.0, 1.5, 0.0, 0.5])

    def test_roll_without_coords(self):
        da = _simple()
        rolled = da.roll({"b": 2}, roll_coords=False)
        np.testing.assert_array_equal(rolled.coords["b"].values, [0.0, 0.5, 1.0, 1.5])


class TestReshaping:
    def test_transpose(self):
        da = _simple()
        t = da.transpose("b", "a")
        assert t.dims == ("b", "a")
        np.testing.assert_array_equal(t.values, da.values.T)

    def test_pad_drops_padded_coords(self):
        da = _simple()
        padded = da.pad({"b": (0, 4)})
        assert padded.sizes["b"] == 8
        assert "b" not in padded.coords
        assert "a" in padded.coords

    def test_rename_dim_and_coord(self):
        da = _simple()
        r = da.rename({"a": "alpha"})
        assert r.dims == ("alpha", "b")
        assert r.coords["alpha"].dim == "alpha"

    def test_swap_dims(self):
        da = XmrArray(
            np.zeros(4),
            dims=("frequency",),
            coords={
                "frequency": np.arange(4.0),
                "chemical_shift": ("frequency", np.arange(4.0) + 4.7),
            },
        )
        s = da.swap_dims({"frequency": "chemical_shift"})
        assert s.dims == ("chemical_shift",)
        assert s.coords["frequency"].dim == "chemical_shift"
        assert s.coords["chemical_shift"].dim == "chemical_shift"


class TestArithmetic:
    def test_scalar_ops_drop_attrs(self):
        da = _simple()
        out = da * 2.0
        assert out.attrs == {}
        np.testing.assert_array_equal(out.values, da.values * 2)

    def test_broadcast_by_dim_name(self):
        da = _simple()
        w = XmrArray(np.array([1.0, 10.0, 100.0, 1000.0]), dims=("b",))
        out = da * w
        assert out.dims == ("a", "b")
        np.testing.assert_array_equal(out.values, da.values * w.values[None, :])

    def test_broadcast_new_dim_appended(self):
        da = _simple()
        w = XmrArray(np.array([1.0, -1.0]), dims=("c",))
        out = da * w
        assert out.dims == ("a", "b", "c")
        assert out.shape == (3, 4, 2)

    def test_coords_preserved_through_ops(self):
        da = _simple()
        out = da + 1.0
        np.testing.assert_array_equal(out.coords["a"].values, [10.0, 20.0, 30.0])

    def test_reduce(self):
        da = _simple()
        m = da.max(dim="b")
        assert m.dims == ("a",)
        np.testing.assert_array_equal(m.values, [3, 7, 11])
        assert da.max().item() == 11.0


class TestMetadata:
    def test_assign_attrs_functional(self):
        da = _simple()
        out = da.assign_attrs({"new": 2})
        assert "new" not in da.attrs
        assert out.attrs == {"k": 1, "new": 2}

    def test_copy_substitutes_data(self):
        da = _simple()
        out = da.copy(data=np.ones((3, 4)))
        assert out.attrs == da.attrs
        assert out.coords.keys() == da.coords.keys()
        np.testing.assert_array_equal(out.values, 1.0)

    def test_copy_shape_guard(self):
        da = _simple()
        with pytest.raises(ValueError, match="preserve shape"):
            da.copy(data=np.ones((4, 4)))

    def test_assign_coords_with_coord_obj(self):
        da = _simple()
        out = da.assign_coords({"a2": Coord("a", [1, 2, 3], {"units": "mm"})})
        assert out.coords["a2"].attrs["units"] == "mm"


class TestJaxBackend:
    def test_jax_payload_roundtrip(self):
        import jax.numpy as jnp

        da = XmrArray(jnp.arange(6.0).reshape(2, 3), dims=("a", "b"))
        out = (da * 2).transpose("b", "a")
        assert out.shape == (3, 2)
        np.testing.assert_array_equal(out.values, np.arange(6.0).reshape(2, 3).T * 2)

    def test_accessor_available(self):
        da = XmrArray(np.zeros(4, dtype=complex), dims=(DIMS.time,))
        assert hasattr(da.xmr, "to_spectrum")


class TestXmrDataset:
    def make_ds(self):
        from xmris_tpu import XmrDataset

        a = XmrArray(
            np.arange(12.0).reshape(3, 4), dims=("voxel", "time"),
            coords={"voxel": np.arange(3), "time": np.arange(4.0)},
        )
        b = XmrArray(
            np.arange(6.0).reshape(3, 2), dims=("voxel", "Metabolite"),
            coords={"voxel": np.arange(3),
                    "Metabolite": Coord("Metabolite", np.array(["A", "B"], object))},
        )
        return XmrDataset({"data": a, "amp": b}, attrs={"k": 1})

    def test_isel_applies_per_variable(self):
        ds = self.make_ds()
        out = ds.isel({"voxel": 1})
        assert out["data"].dims == ("time",)
        assert out["amp"].dims == ("Metabolite",)
        assert out.attrs == {"k": 1}

    def test_isel_ignores_absent_dims(self):
        ds = self.make_ds()
        out = ds.isel({"time": slice(0, 2)})
        assert out["data"].sizes["time"] == 2
        assert out["amp"].sizes["Metabolite"] == 2  # untouched

    def test_sel_by_label(self):
        ds = self.make_ds()
        out = ds.sel({"Metabolite": "B"})
        np.testing.assert_array_equal(out["amp"].values, [1.0, 3.0, 5.0])
        assert out["data"].dims == ("voxel", "time")
