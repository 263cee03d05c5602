"""Seeded randomized parity sweeps over the op layer.

The rest of the suite pins each op at a handful of hand-picked shapes; this
module drives the same NumPy/SciPy oracles at *randomized* shapes, dim
layouts, and parameters (odd lengths, size-1 axes, negative/zero broadening,
arbitrary pivots) so shape-dependent edge cases can't hide.  Every trial is
seeded by its parametrized index — shapes are deterministic across runs, so
the persistent compile cache stays warm and failures reproduce exactly.

Oracle conventions mirror the reference semantics pinned elsewhere:
ortho-normalized FFTs (reference ``processing/fourier.py:153``), apodization
weights (``processing/fid.py:136,180-188``), the degree-based phase formula
(``processing/phasing.py:62-73``), AsLS via sparse ``spsolve``
(``processing/baseline.py:10-40``), and the Eq.6 forward model
(``fitting/simulation.py:91-96``).
"""

import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.linalg import spsolve

import xmris_tpu as xmt
from xmris_tpu import ATTRS, DIMS, XmrArray
from xmris_tpu.fitting.simulation import _simulate_fid_ndarray, simulate_fid_raw

N_TRIALS = 12

# A pool of dim names: the physical time/frequency pair plus generic voxel
# axes, so transforms hit both vocabulary-mapped and unmapped paths.
VOXEL_DIMS = (DIMS.x, DIMS.y, DIMS.z, DIMS.average, DIMS.coil)


def _rng(trial, salt=0):
    return np.random.default_rng(10_000 + 97 * trial + salt)


def _random_da(rng, *, time_dim=DIMS.time, max_extra=2, max_len=17, complex_=True):
    """Random small N-D complex array with `time_dim` last and real coords."""
    n_extra = int(rng.integers(0, max_extra + 1))
    extra = list(rng.choice(len(VOXEL_DIMS), size=n_extra, replace=False))
    dims = tuple(VOXEL_DIMS[i] for i in sorted(extra)) + (time_dim,)
    shape = tuple(int(rng.integers(1, 5)) for _ in dims[:-1]) + (
        int(rng.integers(2, max_len + 1)),
    )
    vals = rng.normal(size=shape)
    if complex_:
        vals = vals + 1j * rng.normal(size=shape)
    sw = float(rng.uniform(500.0, 20000.0))
    coords = {time_dim: np.arange(shape[-1], dtype=np.float64) / sw}
    for d, n in zip(dims[:-1], shape[:-1]):
        coords[d] = np.arange(n, dtype=np.float64)
    return XmrArray(vals, dims=dims, coords=coords, attrs={"fuzz": True}), sw


class TestFourierFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_fft_matches_numpy_over_random_axes(self, trial):
        rng = _rng(trial)
        da, _ = _random_da(rng, max_extra=2)
        # Transform a random non-empty subset of dims (always include time so
        # at least one axis is length >= 2).
        candidates = [d for d in da.dims]
        k = int(rng.integers(1, len(candidates) + 1))
        chosen = list(rng.choice(len(candidates), size=k, replace=False))
        dims = [candidates[i] for i in sorted(chosen)]
        if DIMS.time not in dims:
            dims.append(DIMS.time)
        axes = tuple(da.get_axis_num(d) for d in dims)

        out = xmt.fft(da, dim=dims)
        expected = np.fft.fftn(np.asarray(da.values), axes=axes, norm="ortho")
        np.testing.assert_allclose(out.values, expected, atol=1e-12)
        # reciprocal coords per transformed dim
        for d in dims:
            n = da.sizes[d]
            spacing = 1.0 if n < 2 else float(
                da.coords[d].values[1] - da.coords[d].values[0]
            )
            np.testing.assert_allclose(
                out.coords[d].values, np.fft.fftfreq(n, d=spacing), atol=1e-12
            )
        # attrs survive
        assert out.attrs["fuzz"] is True

        back = xmt.ifft(out, dim=dims)
        np.testing.assert_allclose(back.values, da.values, atol=1e-10)

    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_shifts_match_numpy(self, trial):
        rng = _rng(trial, salt=1)
        da, _ = _random_da(rng, max_extra=2)
        k = int(rng.integers(1, len(da.dims) + 1))
        chosen = list(rng.choice(len(da.dims), size=k, replace=False))
        dims = [da.dims[i] for i in sorted(chosen)]
        axes = tuple(da.get_axis_num(d) for d in dims)

        shifted = xmt.fftshift(da, dim=dims)
        np.testing.assert_allclose(
            shifted.values, np.fft.fftshift(np.asarray(da.values), axes=axes)
        )
        # coords roll WITH the data (reference roll_coords=True)
        for d in dims:
            np.testing.assert_allclose(
                shifted.coords[d].values,
                np.fft.fftshift(np.asarray(da.coords[d].values)),
            )
        back = xmt.ifftshift(shifted, dim=dims)
        np.testing.assert_allclose(back.values, da.values)

    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_fftc_matches_centered_numpy(self, trial):
        rng = _rng(trial, salt=2)
        da, _ = _random_da(rng, max_extra=1)
        dims = [DIMS.time]
        axes = tuple(da.get_axis_num(d) for d in dims)
        out = xmt.fftc(da, dim=dims)
        arr = np.asarray(da.values)
        expected = np.fft.fftshift(
            np.fft.fftn(np.fft.ifftshift(arr, axes=axes), axes=axes, norm="ortho"),
            axes=axes,
        )
        np.testing.assert_allclose(out.values, expected, atol=1e-12)
        back = xmt.ifftc(out, dim=dims)
        np.testing.assert_allclose(back.values, da.values, atol=1e-10)


class TestFidOpsFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_roundtrip_spectrum_fid(self, trial):
        rng = _rng(trial, salt=3)
        da, sw = _random_da(rng, max_extra=1, max_len=33)
        spec = xmt.to_spectrum(da)
        fid = xmt.to_fid(spec)
        np.testing.assert_allclose(fid.values, da.values, atol=1e-10)
        # dt = 1/(n*df) reconstructs the original uniform grid (dead_time=0)
        np.testing.assert_allclose(
            fid.coords[DIMS.time].values, da.coords[DIMS.time].values, atol=1e-12
        )

    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_apodize_weights(self, trial):
        rng = _rng(trial, salt=4)
        da, _ = _random_da(rng, max_extra=1)
        t = da.coords[DIMS.time].values
        lb = float(rng.uniform(-20.0, 60.0))
        out = xmt.apodize_exp(da, lb=lb)
        w = np.exp(-np.pi * lb * t)
        np.testing.assert_allclose(
            out.values, np.asarray(da.values) * w, rtol=1e-12
        )
        assert out.attrs[ATTRS.apodization_lb] == lb

        gb = float(rng.choice([0.0, rng.uniform(0.5, 40.0)]))
        lb2 = float(rng.uniform(0.0, 30.0))
        out2 = xmt.apodize_lg(da, lb=lb2, gb=gb)
        w2 = np.exp(np.pi * lb2 * t)
        if gb != 0:
            tg = 2.0 * np.sqrt(np.log(2.0)) / (np.pi * gb)
            w2 = w2 * np.exp(-((t / tg) ** 2))
        np.testing.assert_allclose(
            out2.values, np.asarray(da.values) * w2, rtol=1e-12
        )

    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_zero_fill_random_targets(self, trial):
        rng = _rng(trial, salt=5)
        da, _ = _random_da(rng, max_extra=1)
        n = da.sizes[DIMS.time]
        target = int(rng.integers(n + 1, 3 * n + 2))
        position = str(rng.choice(["end", "symmetric"]))
        out = xmt.zero_fill(
            da, dim=DIMS.time, target_points=target, position=position
        )
        assert out.sizes[DIMS.time] == target
        extra = target - n
        lead = 0 if position == "end" else extra // 2
        vals = np.moveaxis(
            np.asarray(out.values), out.get_axis_num(DIMS.time), -1
        )
        orig = np.moveaxis(np.asarray(da.values), da.get_axis_num(DIMS.time), -1)
        np.testing.assert_allclose(vals[..., lead : lead + n], orig)
        assert np.all(vals[..., :lead] == 0)
        assert np.all(vals[..., lead + n :] == 0)
        # linear coordinate extrapolation, origin shifted by the lead pad
        told = da.coords[DIMS.time].values
        step = told[1] - told[0]
        expect = (told[0] - lead * step) + np.arange(target) * step
        np.testing.assert_allclose(
            out.coords[DIMS.time].values, expect, atol=1e-12
        )
        # no-op contract below the current size
        same = xmt.zero_fill(da, dim=DIMS.time, target_points=max(1, n - 1))
        np.testing.assert_allclose(same.values, da.values)


class TestPhaseFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_phase_formula_random_params(self, trial):
        rng = _rng(trial, salt=6)
        da, _ = _random_da(rng, time_dim=DIMS.frequency, max_extra=1, max_len=33)
        x = da.coords[DIMS.frequency].values
        p0 = float(rng.uniform(-360.0, 360.0))
        p1 = float(rng.uniform(-4000.0, 4000.0))
        explicit = bool(rng.integers(0, 2))
        if explicit:
            pivot = float(rng.choice(x))
            out = xmt.phase(da, p0=p0, p1=p1, pivot=pivot)
        else:
            arr = np.asarray(da.values)
            flat = int(np.argmax(np.abs(arr)))
            ax = da.get_axis_num(DIMS.frequency)
            pivot = float(x[np.unravel_index(flat, arr.shape)[ax]])
            out = xmt.phase(da, p0=p0, p1=p1)
        rangex = x.max() - x.min()
        phi = np.deg2rad(p0 + p1 * (x - pivot) / (rangex if rangex else 1.0))
        expected = np.asarray(da.values) * np.exp(1j * phi)
        np.testing.assert_allclose(out.values, expected, atol=1e-10)
        assert out.attrs[ATTRS.phase_p0] == p0
        assert out.attrs[ATTRS.phase_pivot] == pivot


class TestComplexUtilsFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_roundtrip(self, trial):
        rng = _rng(trial, salt=7)
        da, _ = _random_da(rng, max_extra=2)
        planar = xmt.to_real_imag(da)
        assert DIMS.component in planar.dims
        back = xmt.to_complex(planar)
        np.testing.assert_allclose(back.values, da.values)
        assert back.dims == da.dims


def _als_oracle(y, lam, p, n_iter):
    L = len(y)
    D = sparse.diags([1, -2, 1], [0, 1, 2], shape=(L - 2, L), dtype=float)
    DTD = (lam * D.T @ D).tocsc()
    w = np.ones(L)
    z = np.zeros(L)
    for _ in range(n_iter):
        W = sparse.diags(w, 0, format="csc", dtype=float)
        z = spsolve(W + DTD, w * y)
        w = p * (y > z) + (1 - p) * (y < z)
    return z


class TestBaselineFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_random_signals_match_spsolve(self, trial):
        rng = _rng(trial, salt=8)
        n = int(rng.integers(48, 160))
        x = np.linspace(-1, 1, n)
        base = rng.uniform(-3, 3) + rng.uniform(-2, 2) * x + rng.uniform(-1, 1) * x**2
        n_peaks = int(rng.integers(1, 4))
        sig = base.copy()
        for _ in range(n_peaks):
            sig = sig + rng.uniform(1, 6) * np.exp(
                -((x - rng.uniform(-0.8, 0.8)) ** 2) / rng.uniform(1e-4, 1e-2)
            )
        sig = sig + rng.normal(0, 0.02, n)
        lam = float(rng.choice([1e4, 1e5, 1e6]))
        p = float(rng.choice([0.001, 0.01, 0.05]))
        da = XmrArray(
            sig.astype(np.complex128),
            dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.arange(n, dtype=np.float64)},
        )
        out = xmt.baseline_als(da, lam=lam, p=p, n_iter=8)
        oracle = sig - _als_oracle(sig, lam, p, 8)
        scale = max(np.max(np.abs(oracle)), 1.0)
        assert np.max(np.abs(np.asarray(out.values) - oracle)) / scale < 1e-7


class TestSimulationFuzz:
    @pytest.mark.parametrize("trial", range(N_TRIALS))
    def test_device_eq6_matches_host_oracle(self, trial):
        """simulate_fid_raw (jax, models.lineshapes.eq6_fid) vs the float64
        host closed form at random parameter draws."""
        rng = _rng(trial, salt=9)
        k = int(rng.integers(1, 6))
        n = int(rng.integers(16, 257))
        sw = float(rng.uniform(1000.0, 20000.0))
        dead = float(rng.choice([0.0, rng.uniform(0.0, 5e-4)]))
        amps = rng.uniform(0.1, 20.0, size=k)
        freqs = rng.uniform(-sw / 2, sw / 2, size=k)
        damps = rng.uniform(1.0, 200.0, size=k)
        phases = rng.uniform(-np.pi, np.pi, size=k)
        g = rng.uniform(0.0, 1.0, size=k)

        host = _simulate_fid_ndarray(
            amps,
            frequencies=freqs,
            spectral_width=sw,
            n_points=n,
            dampings=damps,
            phases=phases,
            lineshape_g=g,
            dead_time=dead,
        )
        t = np.arange(n, dtype=np.float64) / sw + dead
        dev = np.asarray(simulate_fid_raw(t, amps, freqs, damps, phases, g))
        scale = np.max(np.abs(host))
        assert np.max(np.abs(dev - host)) / scale < 1e-12

    @pytest.mark.parametrize("trial", range(4))
    def test_single_peak_lands_on_its_bin(self, trial):
        """Physics sanity at random draw: an undamped single peak's spectrum
        maximum sits on the FFT bin nearest the requested frequency."""
        rng = _rng(trial, salt=10)
        n = 256
        sw = float(rng.uniform(2000.0, 10000.0))
        f = float(rng.uniform(-sw / 2 * 0.9, sw / 2 * 0.9))
        da = xmt.simulate_fid(
            [5.0], frequencies=[f], spectral_width=sw, n_points=n, dampings=1e-6
        )
        spec = xmt.to_spectrum(da)
        freqs = spec.coords[DIMS.frequency].values
        peak = float(freqs[int(np.argmax(np.abs(np.asarray(spec.values))))])
        assert abs(peak - f) <= sw / n / 2 + 1e-9


class TestChainLineageFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_full_chain_preserves_and_accumulates_attrs(self, trial):
        rng = _rng(trial, salt=11)
        da, _ = _random_da(rng, max_extra=1, max_len=16)
        da = da.assign_attrs({ATTRS.reference_frequency: 120.0})
        target = int(2 ** np.ceil(np.log2(da.sizes[DIMS.time] + 1)))
        lb = float(rng.uniform(0.5, 10.0))
        out = xmt.to_spectrum(xmt.apodize_exp(xmt.zero_fill(da, target_points=target), lb=lb))
        out = xmt.phase(out, p0=float(rng.uniform(-90, 90)), pivot=0.0)
        # every stage's lineage is present simultaneously
        assert out.attrs[ATTRS.zero_fill_target] == target
        assert out.attrs[ATTRS.apodization_lb] == lb
        assert out.attrs[ATTRS.phase_pivot] == 0.0
        assert out.attrs["fuzz"] is True
        assert out.attrs[ATTRS.reference_frequency] == 120.0
        assert out.sizes[DIMS.frequency] == target
