"""Seeded randomized sweeps: npz I/O round-trips, recon, autophase recovery.

Companion to ``test_fuzz_parity.py`` (op layer) and ``test_fuzz_fit.py``
(fit engine): drives the serialization layer, the k-space recon stack, and
single-spectrum autophase at randomized shapes/dtypes/parameters with
ground truth known by construction.  Every trial is seeded by its
parametrized index so shapes are deterministic across runs (warm persistent
compile cache, exact reproduction on failure).

Oracle conventions: lossless save/load equality for every dtype the package
emits (complex data, object-dtype ``Metabolite``-style string coords, nested
attrs), the RSS formula sqrt(sum |coil image|^2) (reference k-space recon has
no counterpart — BASELINE config 3), matched-filter SENSE exactness with
true maps, and the ACME objective (reference ``processing/phasing.py:100``)
for autophase: the optimizer must land at least as low as the ground-truth
phasing scores.
"""

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray
from xmris_tpu.core.array import XmrDataset
from xmris_tpu.interop.io import (
    load_dataset_npz,
    load_npz,
    save_dataset_npz,
    save_npz,
)
from xmris_tpu.ops.phasing import acme_score_raw
from xmris_tpu.recon import rss_reconstruct
from xmris_tpu.recon.sense import sense_combine

N_TRIALS = 8

DIM_POOL = (DIMS.x, DIMS.y, DIMS.z, DIMS.coil, DIMS.average, "voxel", "rep")
DTYPES = (np.complex128, np.complex64, np.float64, np.float32, np.int32)


def _rng(trial, salt=0):
    return np.random.default_rng(40_000 + 131 * trial + salt)


def _random_array(rng, *, max_ndim=3):
    ndim = int(rng.integers(1, max_ndim + 1))
    picks = list(rng.choice(len(DIM_POOL), size=ndim, replace=False))
    dims = tuple(DIM_POOL[i] for i in sorted(picks))
    shape = tuple(int(rng.integers(1, 6)) for _ in dims)
    dtype = DTYPES[int(rng.integers(0, len(DTYPES)))]
    if np.issubdtype(dtype, np.complexfloating):
        vals = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(dtype)
    elif np.issubdtype(dtype, np.floating):
        vals = rng.normal(size=shape).astype(dtype)
    else:
        vals = rng.integers(-50, 50, size=shape).astype(dtype)
    da = XmrArray(
        vals,
        dims=dims,
        # nested attrs: numbers, strings, lists, sub-dicts — everything the
        # lineage chain actually produces
        attrs={
            "scalar": float(rng.normal()),
            "count": int(rng.integers(0, 99)),
            "tag": f"trial-{rng.integers(0, 1000)}",
            "nested": {"list": [1, 2.5, "x"], "flag": bool(rng.integers(0, 2))},
        },
        # Draw first, keep None unstringified: str(None) would name the
        # array the literal "None" instead of exercising the unnamed case.
        name=(
            (lambda pick: None if pick is None else str(pick))(
                rng.choice(["fid", "spec", None])
            )
            if rng.integers(0, 2)
            else None
        ),
    )
    coords = {}
    for d, n in zip(dims, shape):
        kind = int(rng.integers(0, 3))
        if kind == 0:
            continue  # dim without a coord
        if kind == 1:
            coords[d] = (d, rng.normal(size=n).astype(np.float64))
        else:  # object-dtype string coord (the Metabolite-coord shape)
            coords[d] = (d, np.asarray([f"m{i}" for i in range(n)], dtype=object))
    da = da.assign_coords(coords) if coords else da
    return da


def _assert_arrays_equal(a, b):
    a, b = np.asarray(a), np.asarray(b)
    assert a.dtype == b.dtype or (
        a.dtype.kind == b.dtype.kind == "O"
    ), (a.dtype, b.dtype)
    if a.dtype == object:
        assert a.tolist() == b.tolist()
    else:
        np.testing.assert_array_equal(a, b)


class TestNpzRoundTripFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_array_roundtrip_lossless(self, tmp_path, trial):
        rng = _rng(trial)
        da = _random_array(rng)
        path = tmp_path / "a.npz"
        save_npz(da, path)
        back = load_npz(path)
        assert back.dims == da.dims
        assert back.name == da.name
        _assert_arrays_equal(back.values, da.values)
        assert back.attrs == da.attrs
        assert set(back.coords) == set(da.coords)
        for cname, c in da.coords.items():
            assert back.coords[cname].dim == c.dim
            _assert_arrays_equal(back.coords[cname].values, c.values)

    @pytest.mark.parametrize("trial", range(4))
    def test_dataset_roundtrip_lossless(self, tmp_path, trial):
        rng = _rng(trial, salt=1)
        ds = XmrDataset(attrs={"run": int(rng.integers(0, 9)), "src": "fuzz"})
        # 2-3 variables; force a SHARED coord on the first two so the
        # one-array-per-coord-name storage is exercised with agreement
        n_shared = int(rng.integers(2, 5))
        shared = rng.normal(size=n_shared)
        for v in range(int(rng.integers(2, 4))):
            da = _random_array(rng, max_ndim=2)
            if v < 2:
                vals = rng.normal(size=(n_shared,) + da.shape)
                da = XmrArray(vals, dims=("shared",) + da.dims, attrs=da.attrs)
                da = da.assign_coords({"shared": ("shared", shared)})
            ds[f"v{v}"] = da
        path = tmp_path / "ds.npz"
        save_dataset_npz(ds, path)
        back = load_dataset_npz(path)
        assert back.attrs == ds.attrs
        assert set(back) == set(ds)
        for name in ds:
            assert back[name].dims == ds[name].dims
            _assert_arrays_equal(back[name].values, ds[name].values)
            assert back[name].attrs == ds[name].attrs
            for cname, c in ds[name].coords.items():
                _assert_arrays_equal(
                    back[name].coords[cname].values, c.values
                )


def _random_multicoil(rng, n, n_coils):
    """Random smooth phantom + smooth complex coil maps; returns
    (kspace XmrArray, complex coil images, rss truth)."""
    yy, xx = np.mgrid[0:n, 0:n]
    phantom = np.zeros((n, n))
    for _ in range(int(rng.integers(1, 4))):
        cx, cy = rng.uniform(n * 0.2, n * 0.8, 2)
        r2 = rng.uniform((n * 0.1) ** 2, (n * 0.35) ** 2)
        phantom += rng.uniform(0.5, 2.0) * (
            ((xx - cx) ** 2 + (yy - cy) ** 2) < r2
        )
    coils = []
    for _ in range(n_coils):
        cx, cy = rng.uniform(0, n, 2)
        sens = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (n * 0.9) ** 2)))
        coils.append(sens * np.exp(1j * rng.uniform(0, 2 * np.pi)))
    sens = np.stack(coils)
    imgs = sens * phantom[None]
    ksp = np.fft.fftshift(
        np.fft.fftn(np.fft.ifftshift(imgs, axes=(1, 2)), axes=(1, 2), norm="ortho"),
        axes=(1, 2),
    )
    da = XmrArray(
        ksp,
        dims=(DIMS.coil, DIMS.ky, DIMS.kx),
        coords={
            DIMS.ky: np.fft.fftshift(np.fft.fftfreq(n)),
            DIMS.kx: np.fft.fftshift(np.fft.fftfreq(n)),
        },
    )
    rss_truth = np.sqrt(np.sum(np.abs(imgs) ** 2, axis=0))
    return da, imgs, rss_truth


class TestReconFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_rss_matches_oracle_at_random_geometry(self, trial):
        rng = _rng(trial, salt=2)
        n = int(rng.choice([16, 24, 32]))
        n_coils = int(rng.integers(1, 6))
        da, _, rss_truth = _random_multicoil(rng, n, n_coils)
        out = rss_reconstruct(da)
        assert out.dims == (DIMS.y, DIMS.x)
        np.testing.assert_allclose(out.values, rss_truth, atol=1e-8)

    @pytest.mark.parametrize("trial", range(6))
    def test_sense_exact_recovery_with_true_maps(self, trial):
        """Matched-filter combine with the TRUE maps reproduces the complex
        object exactly wherever the maps have support (no RSS noise bias)."""
        rng = _rng(trial, salt=3)
        n = int(rng.choice([12, 20]))
        n_coils = int(rng.integers(2, 6))
        obj = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        sens = rng.normal(size=(n_coils, n, n)) + 1j * rng.normal(
            size=(n_coils, n, n)
        )
        img = XmrArray(sens * obj[None], dims=(DIMS.coil, DIMS.y, DIMS.x))
        smap = XmrArray(sens, dims=(DIMS.coil, DIMS.y, DIMS.x))
        out = sense_combine(img, smap)
        assert out.dims == (DIMS.y, DIMS.x)
        np.testing.assert_allclose(out.values, obj, atol=1e-9)


class TestSenseReconstructFuzz:
    @pytest.mark.parametrize("trial", range(3))
    def test_full_sense_chain_recovers_object(self, trial):
        """estimate maps -> iFFT -> matched-filter combine at random
        geometry: the combined magnitude tracks the phantom inside the
        object support (coefficient > 0.99)."""
        from xmris_tpu.recon.sense import sense_reconstruct

        rng = _rng(trial, salt=6)
        n = int(rng.choice([24, 32]))
        n_coils = int(rng.integers(3, 6))
        da, imgs, rss_truth = _random_multicoil(rng, n, n_coils)
        out = sense_reconstruct(da)
        assert out.dims == (DIMS.y, DIMS.x)
        mask = rss_truth > 0.25 * rss_truth.max()
        a = np.abs(np.asarray(out.values))[mask]
        b = rss_truth[mask]
        corr = float(np.corrcoef(a, b)[0, 1]) if a.size > 2 else 1.0
        assert corr > 0.99


def _absorptive_spectrum(rng, n=512, sw=4000.0):
    """Multi-peak all-absorptive spectrum + its randomly dephased copy."""
    t = np.arange(n) / sw
    fid = np.zeros(n, dtype=np.complex128)
    n_peaks = int(rng.integers(1, 4))
    for _ in range(n_peaks):
        f0 = rng.uniform(-sw / 2 * 0.7, sw / 2 * 0.7)
        fid += rng.uniform(2.0, 12.0) * np.exp(
            (1j * 2 * np.pi * f0 - rng.uniform(10.0, 35.0)) * t
        )
    fid += rng.normal(0, 1e-3, n) + 1j * rng.normal(0, 1e-3, n)
    da = XmrArray(
        fid,
        dims=(DIMS.time,),
        coords={COORDS.time: (DIMS.time, t)},
        attrs={ATTRS.reference_frequency: 100.0, ATTRS.carrier_ppm: 0.0},
    )
    pristine = da.xmr.to_spectrum()
    p0_true = float(rng.uniform(-170.0, 170.0))
    spec = pristine.xmr.phase(p0=p0_true)
    for k in (
        ATTRS.phase_p0,
        ATTRS.phase_p1,
        ATTRS.phase_pivot,
        ATTRS.phase_pivot_coord,
    ):
        spec.attrs.pop(k, None)
    return pristine, spec


class TestAutophaseFuzz:
    """The optimizer must score <= the ground-truth phasing (ACME is
    invariant-free, so we assert on the objective, not the angle)."""

    @pytest.mark.parametrize("trial", range(4))
    def test_grid_p0_recovery(self, trial):
        rng = _rng(trial, salt=4)
        pristine, spec = _absorptive_spectrum(rng)
        out = xmt.autophase(spec, p0_only=True, optimizer="grid")
        truth_score = float(acme_score_raw(np.asarray(pristine.values).real))
        got_score = float(acme_score_raw(np.asarray(out.values).real))
        assert got_score <= truth_score * (1 + 1e-6) + 1e-12
        # and the recovered spectrum is the absorptive one, not a flipped copy
        a = np.asarray(out.values).real.ravel()
        b = np.asarray(pristine.values).real.ravel()
        corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert corr > 0.99

    @pytest.mark.parametrize("trial", range(2))
    def test_de_p0_recovery(self, trial):
        rng = _rng(trial, salt=5)
        pristine, spec = _absorptive_spectrum(rng)
        out = xmt.autophase(spec, p0_only=True, optimizer="de")
        truth_score = float(acme_score_raw(np.asarray(pristine.values).real))
        got_score = float(acme_score_raw(np.asarray(out.values).real))
        assert got_score <= truth_score * (1 + 1e-6) + 1e-12

    @pytest.mark.bigcompile
    @pytest.mark.parametrize("trial", range(2))
    def test_grid_mode_all_per_voxel_random_phases(self, trial):
        """mode='all' grid+polish: every voxel gets an INDEPENDENT random
        dephase; per-voxel scores must land within the documented 0.2 %
        tail of the ground-truth phasing (r5 quality bound)."""
        rng = _rng(trial, salt=7)
        n_vox = 6
        pristines, specs, freq = [], [], None
        for _ in range(n_vox):
            p, s = _absorptive_spectrum(rng, n=256)
            pristines.append(np.asarray(p.values))
            specs.append(np.asarray(s.values))
            freq = p.coords[DIMS.frequency].values  # sw/n fixed: identical
        stacked = XmrArray(
            np.stack(specs),
            dims=("voxel", DIMS.frequency),
            coords={"voxel": np.arange(n_vox), DIMS.frequency: freq},
        )
        out = xmt.autophase(
            stacked, mode="all", p0_only=True, optimizer="grid"
        )
        for v in range(n_vox):
            truth = float(acme_score_raw(pristines[v].real))
            got = float(acme_score_raw(np.asarray(out.values)[v].real))
            assert got <= truth * 1.002 + 1e-12, f"voxel {v}"
