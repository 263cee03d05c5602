"""XmrArray: the TPU-native labeled complex-array carrier.

The reference framework (`andrewendlinger/xmris`) builds on ``xarray.DataArray``:
N-dimensional complex MR data addressed by *dimension names* with physical
*coordinates* and lineage-recording *attributes*.  This rebuild keeps the same
contract but splits it TPU-first:

* ``data`` is a device array (``jax.Array``) or host ``numpy`` array — it is
  the only "hot" payload and flows through jitted/vmapped kernels untouched.
* ``dims`` / ``coords`` / ``attrs`` are host-side Python metadata — they never
  enter an XLA trace, so labeled bookkeeping costs nothing on device and can
  never trigger recompilation.

Every operation is functional: methods return new ``XmrArray`` objects and the
originals are never mutated (matching both xarray semantics and JAX's purity
requirements).

Reference parity map (behavioral, not line-ported):
* constructor/coords handling  ~ xarray.DataArray(data, dims, coords, attrs)
* ``roll/pad/isel/sel/transpose/rename/swap_dims/assign_*`` ~ the xarray
  methods used throughout ``src/xmris/processing/*`` and ``core/accessor.py``.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

import numpy as np

try:  # jax is a hard dependency of the framework, soft here for import order
    import jax
    import jax.numpy as jnp

    _JAX_ARRAY_TYPES: tuple[type, ...] = (jax.Array,)
except Exception:  # pragma: no cover - jax is always present in practice
    jax = None
    jnp = None
    _JAX_ARRAY_TYPES = ()


def _is_jax(x: Any) -> bool:
    return _JAX_ARRAY_TYPES and isinstance(x, _JAX_ARRAY_TYPES)


def get_namespace(*arrays: Any):
    """Return ``jnp`` if any operand is a jax array, else ``np``.

    Keeps host-side (numpy) pipelines on host and device pipelines on device
    without silent transfers.
    """
    for a in arrays:
        if _is_jax(a):
            return jnp
    return np


class Coord:
    """A coordinate: 1-D (or scalar) values attached to a named dimension."""

    __slots__ = ("dim", "values", "attrs")

    def __init__(self, dim: str, values: Any, attrs: dict | None = None):
        self.dim = str(dim)
        self.values = np.asarray(values)
        self.attrs = dict(attrs) if attrs else {}

    def copy(self) -> "Coord":
        return Coord(self.dim, self.values.copy(), dict(self.attrs))

    def __len__(self) -> int:
        return len(self.values)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"Coord(dim={self.dim!r}, n={self.values.size}, attrs={self.attrs})"


def _coerce_coord(name: str, spec: Any, dims: Sequence[str]) -> Coord:
    """Accept the xarray-style coordinate spec forms."""
    if isinstance(spec, Coord):
        return spec
    if isinstance(spec, tuple):
        if len(spec) == 2:
            dim, values = spec
            return Coord(dim, values)
        if len(spec) == 3:
            dim, values, attrs = spec
            return Coord(dim, values, attrs)
        raise ValueError(f"Coordinate tuple for {name!r} must be (dim, values[, attrs]).")
    # bare array: name must itself be a dimension
    if name not in dims:
        raise ValueError(
            f"Coordinate {name!r} given as a bare array, but {name!r} is not a "
            f"dimension of the array (dims={tuple(dims)}). Pass (dim, values) instead."
        )
    return Coord(name, spec)


class XmrArray:
    """Labeled N-D array: device data + host dims/coords/attrs.

    Parameters
    ----------
    data : array-like
        The payload. ``jax.Array`` stays on device; numpy stays on host.
    dims : sequence of str
        One name per axis of ``data``.
    coords : mapping, optional
        ``{name: values}`` (name must be a dim), ``{name: (dim, values)}``,
        ``{name: (dim, values, attrs)}``, or ``{name: Coord}``.
    attrs : dict, optional
        Free-form metadata; every processing op copies and appends to it
        (lineage recording).
    name : str, optional
    """

    __slots__ = ("data", "dims", "coords", "attrs", "name")

    def __init__(
        self,
        data: Any,
        dims: Sequence[str] | str,
        coords: Mapping[str, Any] | None = None,
        attrs: dict | None = None,
        name: str | None = None,
    ):
        if isinstance(dims, str):
            dims = (dims,)
        self.dims: tuple[str, ...] = tuple(str(d) for d in dims)
        if not _is_jax(data):
            data = np.asarray(data)
        if data.ndim != len(self.dims):
            raise ValueError(
                f"Data has {data.ndim} axes but {len(self.dims)} dims were given: "
                f"{self.dims}."
            )
        self.data = data
        self.coords: dict[str, Coord] = {}
        if coords:
            for cname, spec in coords.items():
                coord = _coerce_coord(cname, spec, self.dims)
                self._validate_coord(cname, coord)
                self.coords[str(cname)] = coord
        self.attrs: dict = dict(attrs) if attrs else {}
        self.name = name

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------
    def _validate_coord(self, name: str, coord: Coord) -> None:
        if coord.dim not in self.dims:
            raise ValueError(
                f"Coordinate {name!r} is defined on dimension {coord.dim!r}, "
                f"which is not in dims {self.dims}."
            )
        n = self.sizes[coord.dim]
        if coord.values.ndim == 0:
            return
        if coord.values.shape != (n,):
            raise ValueError(
                f"Coordinate {name!r} has {coord.values.shape} values but dimension "
                f"{coord.dim!r} has length {n}."
            )

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def size(self) -> int:
        return int(np.prod(self.data.shape)) if self.data.shape else 1

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self) -> dict[str, int]:
        return dict(zip(self.dims, self.data.shape))

    @property
    def values(self) -> np.ndarray:
        """Host numpy view/copy of the data (device→host transfer if needed)."""
        return np.asarray(self.data)

    @property
    def jax(self):
        """The data as a jax array (host→device transfer if needed)."""
        return jnp.asarray(self.data)

    def get_axis_num(self, dim: str) -> int:
        try:
            return self.dims.index(dim)
        except ValueError:
            raise KeyError(f"Dimension {dim!r} not found in dims {self.dims}.")

    def coord_values(self, name: str) -> np.ndarray:
        return self.coords[name].values

    def coord_array(self, name: str) -> "XmrArray":
        """Lift a coordinate into a 1-D :class:`XmrArray` (for dim-aligned math)."""
        c = self.coords[name]
        return XmrArray(c.values, (c.dim,), attrs=dict(c.attrs), name=name)

    # ------------------------------------------------------------------
    # Functional reconstruction helpers
    # ------------------------------------------------------------------
    def copy(self, data: Any | None = None, deep: bool = False) -> "XmrArray":
        """Return a new XmrArray; optionally substituting the payload.

        Mirrors ``xr.DataArray.copy(data=...)`` — the metadata (dims, coords,
        attrs, name) is preserved exactly.
        """
        new_data = self.data if data is None else data
        if data is not None and not _is_jax(new_data):
            new_data = np.asarray(new_data)
        if deep and not _is_jax(new_data):
            new_data = new_data.copy()
        out = XmrArray.__new__(XmrArray)
        out.data = new_data
        out.dims = self.dims
        out.coords = {k: v.copy() for k, v in self.coords.items()}
        out.attrs = dict(self.attrs)
        out.name = self.name
        if tuple(new_data.shape) != self.shape:
            raise ValueError(
                f"copy(data=...) must preserve shape {self.shape}, got "
                f"{tuple(new_data.shape)}. Use XmrArray(...) for reshaping ops."
            )
        return out

    def _rebuild(
        self,
        data: Any,
        dims: tuple[str, ...] | None = None,
        coords: dict[str, Coord] | None = None,
        attrs: dict | None = None,
    ) -> "XmrArray":
        out = XmrArray.__new__(XmrArray)
        out.data = data
        out.dims = self.dims if dims is None else dims
        out.coords = (
            {k: v.copy() for k, v in self.coords.items()} if coords is None else coords
        )
        out.attrs = dict(self.attrs) if attrs is None else attrs
        out.name = self.name
        return out

    # ------------------------------------------------------------------
    # Metadata ops
    # ------------------------------------------------------------------
    def assign_attrs(self, *args, **kwargs) -> "XmrArray":
        new_attrs = dict(self.attrs)
        for a in args:
            new_attrs.update(a)
        new_attrs.update(kwargs)
        return self._rebuild(self.data, attrs=new_attrs)

    def assign_coords(self, coords: Mapping[str, Any]) -> "XmrArray":
        new_coords = {k: v.copy() for k, v in self.coords.items()}
        for cname, spec in coords.items():
            coord = _coerce_coord(cname, spec, self.dims)
            self._validate_coord(cname, coord)
            new_coords[str(cname)] = coord
        return self._rebuild(self.data, coords=new_coords)

    def drop_coords(self, names: str | Iterable[str]) -> "XmrArray":
        if isinstance(names, str):
            names = [names]
        new_coords = {
            k: v.copy() for k, v in self.coords.items() if k not in set(names)
        }
        return self._rebuild(self.data, coords=new_coords)

    def rename(self, mapping: Mapping[str, str]) -> "XmrArray":
        """Rename dimensions and/or coordinates."""
        new_dims = tuple(mapping.get(d, d) for d in self.dims)
        new_coords: dict[str, Coord] = {}
        for cname, c in self.coords.items():
            new_coords[mapping.get(cname, cname)] = Coord(
                mapping.get(c.dim, c.dim), c.values, c.attrs
            )
        return self._rebuild(self.data, dims=new_dims, coords=new_coords)

    def swap_dims(self, mapping: Mapping[str, str]) -> "XmrArray":
        """Promote an existing coordinate to be the dimension (xarray semantics).

        ``da.swap_dims({"frequency": "chemical_shift"})`` renames the axis to
        ``chemical_shift`` while keeping both coordinate arrays attached.
        """
        new_dims = list(self.dims)
        new_coords = {k: v.copy() for k, v in self.coords.items()}
        for old, new in mapping.items():
            if old not in self.dims:
                raise KeyError(f"Dimension {old!r} not found in {self.dims}.")
            if new not in self.coords and new != old:
                raise KeyError(
                    f"swap_dims target {new!r} must be an existing coordinate."
                )
            new_dims[new_dims.index(old)] = new
            for c in new_coords.values():
                if c.dim == old:
                    c.dim = new
        return self._rebuild(self.data, dims=tuple(new_dims), coords=new_coords)

    # ------------------------------------------------------------------
    # Shape / indexing ops
    # ------------------------------------------------------------------
    def transpose(self, *dims: str) -> "XmrArray":
        if not dims:
            dims = tuple(reversed(self.dims))
        if set(dims) != set(self.dims) or len(dims) != len(self.dims):
            raise ValueError(f"transpose dims {dims} must be a permutation of {self.dims}.")
        order = tuple(self.get_axis_num(d) for d in dims)
        xp = get_namespace(self.data)
        return self._rebuild(xp.transpose(self.data, order), dims=tuple(dims))

    def isel(self, indexers: Mapping[str, Any] | None = None, **kw) -> "XmrArray":
        """Integer/slice-based selection by dimension name.

        Integer indexers drop the dimension (and its coordinates); slices keep
        it and slice the coordinates accordingly.
        """
        indexers = dict(indexers or {})
        indexers.update(kw)
        dropped: set[str] = set()
        data = self.data
        # Apply one axis at a time so multiple array indexers select outer
        # products (xarray semantics), not zipped numpy fancy indexing.
        for dim, idx in indexers.items():
            ax = self.get_axis_num(dim) - sum(
                1 for d in dropped if self.get_axis_num(d) < self.get_axis_num(dim)
            )
            sel: list[Any] = [slice(None)] * data.ndim
            sel[ax] = idx
            data = data[tuple(sel)]
            if isinstance(idx, (int, np.integer)):
                dropped.add(dim)
        new_dims = tuple(d for d in self.dims if d not in dropped)
        new_coords: dict[str, Coord] = {}
        for cname, c in self.coords.items():
            if c.dim in dropped:
                continue
            if c.dim in indexers:
                new_coords[cname] = Coord(c.dim, c.values[indexers[c.dim]], c.attrs)
            else:
                new_coords[cname] = c.copy()
        return self._rebuild(data, dims=new_dims, coords=new_coords)

    def sel(self, indexers: Mapping[str, Any] | None = None, **kw) -> "XmrArray":
        """Label-based selection on dimension coordinates (exact match)."""
        indexers = dict(indexers or {})
        indexers.update(kw)
        iidx: dict[str, Any] = {}
        for dim, label in indexers.items():
            if dim not in self.coords:
                raise KeyError(f"No coordinate found for dimension {dim!r}.")
            cvals = self.coords[dim].values
            matches = np.nonzero(cvals == label)[0]
            if matches.size == 0:
                raise KeyError(f"Label {label!r} not found in coordinate {dim!r}.")
            iidx[dim] = int(matches[0])
        return self.isel(iidx)

    def roll(self, shifts: Mapping[str, int], roll_coords: bool = True) -> "XmrArray":
        xp = get_namespace(self.data)
        data = self.data
        for dim, shift in shifts.items():
            data = xp.roll(data, shift, axis=self.get_axis_num(dim))
        new_coords = {}
        for cname, c in self.coords.items():
            if roll_coords and c.dim in shifts:
                new_coords[cname] = Coord(
                    c.dim, np.roll(c.values, shifts[c.dim]), c.attrs
                )
            else:
                new_coords[cname] = c.copy()
        return self._rebuild(data, coords=new_coords)

    def pad(
        self,
        pad_width: Mapping[str, tuple[int, int]],
        mode: str = "constant",
        constant_values: Any = 0,
    ) -> "XmrArray":
        """Pad along named dimensions. Coordinates on padded dims are dropped
        (callers re-derive them — matching how xarray pads coords with NaN and
        the reference immediately reassigns them)."""
        widths = [(0, 0)] * self.ndim
        for dim, w in pad_width.items():
            widths[self.get_axis_num(dim)] = tuple(w)
        xp = get_namespace(self.data)
        if mode == "constant":
            data = xp.pad(self.data, widths, mode=mode, constant_values=constant_values)
        else:
            data = xp.pad(self.data, widths, mode=mode)
        new_coords = {
            k: v.copy()
            for k, v in self.coords.items()
            if v.dim not in pad_width or pad_width[v.dim] == (0, 0)
        }
        return self._rebuild(data, coords=new_coords)

    def expand_dims(self, dim: str, axis: int = 0) -> "XmrArray":
        xp = get_namespace(self.data)
        data = xp.expand_dims(self.data, axis=axis)
        new_dims = list(self.dims)
        new_dims.insert(axis if axis >= 0 else len(new_dims) + axis + 1, dim)
        return self._rebuild(data, dims=tuple(new_dims))

    def squeeze(self, dim: str | None = None) -> "XmrArray":
        if dim is not None:
            dims_to_drop = [dim]
        else:
            dims_to_drop = [d for d, s in self.sizes.items() if s == 1]
        out = self
        for d in dims_to_drop:
            if out.sizes[d] != 1:
                raise ValueError(f"Cannot squeeze dimension {d!r} of size {out.sizes[d]}.")
            out = out.isel({d: 0})
        return out

    # ------------------------------------------------------------------
    # Math
    # ------------------------------------------------------------------
    @property
    def real(self) -> "XmrArray":
        return self._rebuild(self.data.real)

    @property
    def imag(self) -> "XmrArray":
        return self._rebuild(self.data.imag)

    def conj(self) -> "XmrArray":
        return self._rebuild(self.data.conj())

    def astype(self, dtype) -> "XmrArray":
        return self._rebuild(self.data.astype(dtype))

    def item(self):
        return self.values.item()

    def __abs__(self) -> "XmrArray":
        xp = get_namespace(self.data)
        return self._rebuild(xp.abs(self.data))

    def __neg__(self) -> "XmrArray":
        return self._rebuild(-self.data)

    def _align_other(self, other: Any):
        """Broadcast-align ``other`` against self by dimension names.

        Returns (self_data, other_data, result_dims, result_coords).
        Result dims = self dims followed by any extra dims of other (xarray
        union-order behavior for the cases this framework uses).
        """
        if isinstance(other, XmrArray):
            extra = [d for d in other.dims if d not in self.dims]
            result_dims = self.dims + tuple(extra)
            # target axis position for each result dim
            pos = {d: i for i, d in enumerate(result_dims)}
            # arrange other: transpose its dims into result order, then expand
            other_order = sorted(other.dims, key=lambda d: pos[d])
            o = other.transpose(*other_order).data
            # insert axes for result dims missing from other
            xp = get_namespace(self.data, o)
            o_shape = []
            j = 0
            for d in result_dims:
                if d in other.dims:
                    o_shape.append(other.sizes[d])
                    j += 1
                else:
                    o_shape.append(1)
            o = o.reshape(tuple(o_shape))
            s = self.data
            if extra:
                s = s.reshape(self.shape + (1,) * len(extra))
            # merged coords: self's coords win on collision
            merged: dict[str, Coord] = {
                k: v.copy()
                for k, v in other.coords.items()
                if v.dim in result_dims
            }
            merged.update({k: v.copy() for k, v in self.coords.items()})
            return s, o, result_dims, merged
        return self.data, other, self.dims, {k: v.copy() for k, v in self.coords.items()}

    def _binary_op(self, other: Any, op: str, reflexive: bool = False) -> "XmrArray":
        s, o, dims, coords = self._align_other(other)
        xp = get_namespace(s, o if not np.isscalar(o) else s)
        fn = getattr(xp, op)
        data = fn(o, s) if reflexive else fn(s, o)
        out = XmrArray.__new__(XmrArray)
        out.data = data
        out.dims = dims
        out.coords = coords
        out.attrs = {}  # xarray default: binary ops drop attrs
        out.name = None
        return out

    def __add__(self, other):
        return self._binary_op(other, "add")

    def __radd__(self, other):
        return self._binary_op(other, "add", reflexive=True)

    def __sub__(self, other):
        return self._binary_op(other, "subtract")

    def __rsub__(self, other):
        return self._binary_op(other, "subtract", reflexive=True)

    def __mul__(self, other):
        return self._binary_op(other, "multiply")

    def __rmul__(self, other):
        return self._binary_op(other, "multiply", reflexive=True)

    def __truediv__(self, other):
        return self._binary_op(other, "true_divide")

    def __rtruediv__(self, other):
        return self._binary_op(other, "true_divide", reflexive=True)

    def __pow__(self, other):
        return self._binary_op(other, "power")

    def _reduce(self, op: str, dim: str | list[str] | None = None) -> "XmrArray":
        xp = get_namespace(self.data)
        fn = getattr(xp, op)
        if dim is None:
            data = fn(self.data)
            out = XmrArray.__new__(XmrArray)
            out.data = data
            out.dims = ()
            out.coords = {}
            out.attrs = {}
            out.name = self.name
            return out
        dims = [dim] if isinstance(dim, str) else list(dim)
        axes = tuple(self.get_axis_num(d) for d in dims)
        data = fn(self.data, axis=axes)
        new_dims = tuple(d for d in self.dims if d not in dims)
        new_coords = {
            k: v.copy() for k, v in self.coords.items() if v.dim not in dims
        }
        return self._rebuild(data, dims=new_dims, coords=new_coords)

    def max(self, dim=None):
        return self._reduce("max", dim)

    def min(self, dim=None):
        return self._reduce("min", dim)

    def mean(self, dim=None):
        return self._reduce("mean", dim)

    def sum(self, dim=None):
        return self._reduce("sum", dim)

    def std(self, dim=None):
        return self._reduce("std", dim)

    # ------------------------------------------------------------------
    # Interop & ergonomics
    # ------------------------------------------------------------------
    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    def __array__(self, dtype=None):
        v = self.values
        return v.astype(dtype) if dtype is not None else v

    @property
    def xmr(self):
        """The fluent accessor namespace (mirrors ``da.xmr`` in the reference)."""
        from xmris_tpu.core.accessor import XmrisAccessor

        return XmrisAccessor(self)

    def to_xarray(self):
        """Convert to an ``xarray.DataArray`` (requires xarray installed)."""
        from xmris_tpu.interop.xarray import to_xarray

        return to_xarray(self)

    @classmethod
    def from_xarray(cls, da) -> "XmrArray":
        from xmris_tpu.interop.xarray import from_xarray

        return from_xarray(da)

    def block_until_ready(self) -> "XmrArray":
        if _is_jax(self.data):
            self.data.block_until_ready()
        return self

    def device_put(self, sharding=None) -> "XmrArray":
        """Move the payload to device (optionally with a sharding)."""
        data = jax.device_put(self.data, sharding) if sharding is not None else (
            jnp.asarray(self.data)
        )
        return self._rebuild(data)

    def _repr_html_(self) -> str:
        """Rich notebook rendering: dims, backend, coords, and attrs tables."""
        dims_s = ", ".join(f"<b>{d}</b>: {s}" for d, s in self.sizes.items())
        kind = "jax" if _is_jax(self.data) else "numpy"
        coord_rows = "".join(
            f"<tr><td style='padding:2px 8px'><code>{k}</code></td>"
            f"<td style='padding:2px 8px'>({c.dim})</td>"
            f"<td style='padding:2px 8px'>{c.values.dtype}</td>"
            f"<td style='padding:2px 8px'><code>{_summ(c.values)}</code></td>"
            f"<td style='padding:2px 8px'>{c.attrs.get('units', '')}</td></tr>"
            for k, c in self.coords.items()
        )
        attr_rows = "".join(
            f"<tr><td style='padding:2px 8px'><code>{k}</code></td>"
            f"<td style='padding:2px 8px'><code>{str(v)[:80]}</code></td></tr>"
            for k, v in list(self.attrs.items())[:16]
        )
        return (
            "<div style='font-family:monospace;font-size:12px;'>"
            f"<div><b>xmris_tpu.XmrArray</b> {self.name or ''} ({dims_s}) "
            f"&mdash; {kind}, {self.dtype}</div>"
            f"<details open><summary>Coordinates ({len(self.coords)})</summary>"
            f"<table>{coord_rows}</table></details>"
            f"<details><summary>Attributes ({len(self.attrs)})</summary>"
            f"<table>{attr_rows}</table></details></div>"
        )

    def __repr__(self) -> str:
        dims_s = ", ".join(f"{d}: {s}" for d, s in self.sizes.items())
        coord_s = "\n".join(
            f"  * {k:<18} ({c.dim}) {c.values.dtype} "
            f"{_summ(c.values)}"
            for k, c in self.coords.items()
        )
        attr_s = "\n".join(f"    {k}: {v!r}" for k, v in list(self.attrs.items())[:12])
        more = "" if len(self.attrs) <= 12 else f"\n    ... ({len(self.attrs)} attrs total)"
        kind = "jax" if _is_jax(self.data) else "numpy"
        return (
            f"<xmris_tpu.XmrArray {self.name or ''} ({dims_s})>\n"
            f"  backend: {kind}, dtype: {self.dtype}\n"
            f"Coordinates:\n{coord_s or '  (none)'}\n"
            f"Attributes:\n{attr_s or '    (none)'}{more}"
        )


def _summ(v: np.ndarray) -> str:
    if v.size == 0:
        return "[]"
    if v.size <= 4:
        return np.array2string(v, precision=4, separator=", ")
    return (
        f"[{v.flat[0]:.4g} {v.flat[1]:.4g} ... {v.flat[-1]:.4g}]"
        if np.issubdtype(v.dtype, np.number)
        else f"[{v.flat[0]!r} ... {v.flat[-1]!r}]"
    )


class XmrDataset:
    """A dict of aligned :class:`XmrArray` variables (fitting results etc.).

    Mirrors the slice of ``xarray.Dataset`` behavior the reference framework
    relies on: named data variables, shared attrs, ``.xmr`` accessor with the
    plotting namespace.
    """

    __slots__ = ("data_vars", "attrs")

    def __init__(
        self,
        data_vars: Mapping[str, XmrArray] | None = None,
        attrs: dict | None = None,
    ):
        self.data_vars: dict[str, XmrArray] = dict(data_vars) if data_vars else {}
        self.attrs: dict = dict(attrs) if attrs else {}

    def __getitem__(self, key: str) -> XmrArray:
        return self.data_vars[key]

    def __setitem__(self, key: str, value: XmrArray) -> None:
        self.data_vars[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self.data_vars

    def __iter__(self):
        return iter(self.data_vars)

    def keys(self):
        return self.data_vars.keys()

    def items(self):
        return self.data_vars.items()

    @property
    def dims(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for v in self.data_vars.values():
            out.update(v.sizes)
        return out

    @property
    def coords(self) -> dict[str, Coord]:
        out: dict[str, Coord] = {}
        for v in self.data_vars.values():
            for k, c in v.coords.items():
                out.setdefault(k, c)
        return out

    def assign_attrs(self, *args, **kwargs) -> "XmrDataset":
        new_attrs = dict(self.attrs)
        for a in args:
            new_attrs.update(a)
        new_attrs.update(kwargs)
        return XmrDataset(self.data_vars, new_attrs)

    def isel(self, indexers: Mapping[str, Any] | None = None, **kw) -> "XmrDataset":
        """Integer/slice selection applied to every variable carrying the dim."""
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = {}
        for name, var in self.data_vars.items():
            applicable = {d: i for d, i in indexers.items() if d in var.dims}
            out[name] = var.isel(applicable) if applicable else var
        return XmrDataset(out, dict(self.attrs))

    def sel(self, indexers: Mapping[str, Any] | None = None, **kw) -> "XmrDataset":
        """Label selection applied to every variable carrying the dim."""
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = {}
        for name, var in self.data_vars.items():
            applicable = {d: v for d, v in indexers.items() if d in var.dims}
            out[name] = var.sel(applicable) if applicable else var
        return XmrDataset(out, dict(self.attrs))

    @property
    def xmr(self):
        from xmris_tpu.core.accessor import XmrisDatasetAccessor

        return XmrisDatasetAccessor(self)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        vars_s = "\n".join(
            f"    {k:<12} ({', '.join(v.dims)}) {v.dtype}" for k, v in self.data_vars.items()
        )
        return (
            f"<xmris_tpu.XmrDataset ({len(self.data_vars)} variables)>\n"
            f"Data variables:\n{vars_s}\n"
            f"Attributes: {list(self.attrs)[:8]}"
        )
