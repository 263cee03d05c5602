"""Randomized vendor-ingest sweeps: synthetic Bruker datasets end to end.

``test_vendor.py`` pins the ingest chain on two fixed fixtures (the real
scanner export and the committed synthetic one); this module *generates* a
fresh synthetic scanner export per trial — randomized geometry (points,
averages, receivers, repetitions), spectral physics (sw, f0, carrier), and
digital-filter delay (zero / integer / fractional) — writes it in the exact
classic-netCDF job0 layout the console uses, and asserts the full pipeline
(``load_dataarray -> to_complex -> reshape_bruker_raw -> build_fid ->
remove_digital_filter -> mean(averages) -> to_spectrum``) recovers the
synthesis parameters in closed form.

Forward model and stream layout mirror ``tests/data/generate_synth_bruker.py``
(itself derived from the reference's scanner-export conventions,
``/root/reference/src/xmris/vendor/bruker.py``): the flat stream is
sample-major with time fastest (reversed-C order over the job0 layout), the
filter prepends ``floor(groupDelay)`` wake-up samples and delays the kept
samples by the fractional remainder.
"""

import numpy as np
import pytest

from xmris_tpu import DIMS
from xmris_tpu.interop.io import load_dataarray
from xmris_tpu.vendor.bruker import (
    build_fid,
    remove_digital_filter,
    reshape_bruker_raw,
)


def _rng(trial, salt=0):
    return np.random.default_rng(60_000 + 173 * trial + salt)


def _forward_filtered(clean, group_delay):
    """Push a clean FID through the console's digital-filter forward model."""
    whole = int(np.floor(group_delay))
    frac = group_delay - whole
    kept = clean[: clean.size - whole] if whole else clean
    if not np.isclose(frac, 0.0):
        ramp = np.exp(-1j * 2 * np.pi * frac * np.fft.fftfreq(kept.size))
        kept = np.fft.ifft(np.fft.fft(kept) * ramp)
    return kept, whole


def _write_synth_nc(
    path,
    *,
    n_points,
    sw,
    f0,
    carrier,
    n_avg,
    n_rcv,
    n_rep,
    group_delay,
    amp,
    phase_deg,
    lb,
    f_hz,
    gains,
    rng,
    tr_ms=750.0,
):
    from scipy.io import netcdf_file

    t = np.arange(n_points) / sw
    clean = (
        amp
        * np.exp(1j * np.deg2rad(phase_deg))
        * np.exp((1j * 2 * np.pi * f_hz - lb) * t)
    )
    delayed, whole = _forward_filtered(clean, group_delay)
    noise_sigma = amp * 5e-4

    # layout order (time, channels, averages, repetitions), time fastest on
    # disk => reversed-axes C-order ravel
    arr = np.zeros((n_points, n_rcv, n_avg, n_rep), dtype=np.complex128)
    for c in range(n_rcv):
        for a in range(n_avg):
            for r in range(n_rep):
                transient = (
                    0.01
                    * amp
                    * rng.standard_normal(whole)
                    * np.exp(1j * rng.uniform(0, 2 * np.pi, whole))
                )
                acq = gains[c] * np.concatenate([transient, delayed])
                acq = acq + noise_sigma * (
                    rng.standard_normal(n_points)
                    + 1j * rng.standard_normal(n_points)
                ) / np.sqrt(2)
                arr[:, c, a, r] = acq
    stream = arr.transpose(3, 2, 1, 0).ravel()

    f = netcdf_file(str(path), "w")
    f.createDimension("raw", stream.size)
    f.createDimension("component", 2)
    f.createDimension("string4", 4)
    comp = f.createVariable("component", "S1", ("component", "string4"))
    comp[0, :] = np.frombuffer(b"real", dtype="S1")
    comp[1, :] = np.frombuffer(b"imag", dtype="S1")
    var = f.createVariable(
        "__xarray_dataarray_variable__", "d", ("raw", "component")
    )
    var[:, 0] = stream.real
    var[:, 1] = stream.imag
    var.PVM_SpecSWH = sw
    var.PVM_RepetitionTime = tr_ms
    var.PVM_FrqRef = f0
    var.PVM_FrqWorkPpm = carrier
    var.PVM_SpecMatrix = n_points
    var.PVM_EncNReceivers = n_rcv
    var.PVM_NAverages = n_avg
    var.PVM_NRepetitions = n_rep
    var.groupDelay = group_delay
    f.close()


def _expected_ortho_peak(amp, lb, sw, n_points, group_delay):
    """Closed-form ortho-DFT |peak| at an on-grid line after filter removal:
    the oscillation cancels against the DFT kernel, leaving the geometric
    decay sum over the kept samples."""
    whole = int(np.floor(group_delay))
    rho = np.exp(-lb / sw)
    return amp * (1 - rho ** (n_points - whole)) / (1 - rho) / np.sqrt(n_points)


def _ingest(path):
    raw = load_dataarray(path)
    cplx = raw.xmr.to_complex()
    data, dims = reshape_bruker_raw(np.asarray(cplx.values), cplx.attrs)
    fid = build_fid(data, dims, cplx.attrs)
    fid = remove_digital_filter(
        fid, group_delay=float(fid.attrs["bruker_group_delay"])
    )
    if "averages" in fid.dims:
        avg = fid.mean(dim="averages")
        avg.attrs = fid.attrs
        fid = avg
    return fid


class TestVendorIngestFuzz:
    @pytest.mark.parametrize("trial", range(5))
    def test_single_channel_recovery(self, tmp_path, trial):
        rng = _rng(trial)
        n = 256  # one shape across trials: warm to_spectrum compile
        sw = float(rng.uniform(2000.0, 12000.0))
        f0 = float(rng.uniform(40.0, 400.0))
        carrier = float(rng.uniform(0.0, 8.0))
        n_avg = int(rng.integers(1, 5))
        # zero / integer / fractional delays all exercised across trials
        group_delay = float(
            rng.choice([0.0, float(rng.integers(1, 40)), 76.125, 68.5 + rng.uniform(0, 0.5)])
        )
        amp = float(rng.uniform(1e4, 1e7))
        phase_deg = float(rng.uniform(-150.0, 150.0))
        lb = float(rng.uniform(8.0, 40.0))
        k = int(rng.integers(-n // 4, n // 4))
        f_hz = k * sw / n  # on-grid line: closed-form peak
        path = tmp_path / "rawdatajob0.nc"
        _write_synth_nc(
            path,
            n_points=n, sw=sw, f0=f0, carrier=carrier,
            n_avg=n_avg, n_rcv=1, n_rep=1,
            group_delay=group_delay, amp=amp, phase_deg=phase_deg,
            lb=lb, f_hz=f_hz, gains=[1.0], rng=rng,
        )

        fid = _ingest(path)
        assert fid.dims == (DIMS.time,)
        spec = fid.xmr.to_spectrum()
        vals = np.asarray(spec.values)
        freqs = spec.coords[DIMS.frequency].values
        i = int(np.argmax(np.abs(vals)))
        assert freqs[i] == pytest.approx(f_hz, abs=1e-3)
        expected = _expected_ortho_peak(amp, lb, sw, n, group_delay)
        assert float(np.abs(vals[i])) == pytest.approx(expected, rel=1e-2)
        # the filter correction must leave the synthesis phase intact at the
        # (on-grid) peak — any residual fractional-delay error shows up here
        got_deg = float(np.rad2deg(np.angle(vals[i])))
        err = (got_deg - phase_deg + 180.0) % 360.0 - 180.0
        assert abs(err) < 1.0

    def test_multichannel_gains_recovered(self, tmp_path):
        rng = _rng(100)
        n, sw, f0 = 256, 5000.0, 120.0
        n_rcv = 3
        gains = (
            rng.uniform(0.5, 1.5, n_rcv)
            * np.exp(1j * rng.uniform(-np.pi, np.pi, n_rcv))
        )
        amp, phase_deg, lb = 2e5, 20.0, 15.0
        f_hz = -8 * sw / n
        path = tmp_path / "rawdatajob0.nc"
        _write_synth_nc(
            path,
            n_points=n, sw=sw, f0=f0, carrier=4.7,
            n_avg=2, n_rcv=n_rcv, n_rep=1,
            group_delay=76.125, amp=amp, phase_deg=phase_deg,
            lb=lb, f_hz=f_hz, gains=gains, rng=rng,
        )
        fid = _ingest(path)
        assert fid.dims == (DIMS.time, "channels")
        spec = fid.xmr.to_spectrum()
        vals = np.asarray(spec.values)
        freqs = spec.coords[DIMS.frequency].values
        base = _expected_ortho_peak(amp, lb, sw, n, 76.125)
        for c in range(n_rcv):
            col = vals[:, c]
            i = int(np.argmax(np.abs(col)))
            assert freqs[i] == pytest.approx(f_hz, abs=1e-3)
            assert float(np.abs(col[i])) == pytest.approx(
                abs(gains[c]) * base, rel=1e-2
            )
            want = phase_deg + np.rad2deg(np.angle(gains[c]))
            got = float(np.rad2deg(np.angle(col[i])))
            err = (got - want + 180.0) % 360.0 - 180.0
            assert abs(err) < 1.0

    def test_repetitions_axis_and_coordinate(self, tmp_path):
        rng = _rng(200)
        n, sw, tr_ms = 256, 4000.0, 1250.0
        n_rep = 3
        path = tmp_path / "rawdatajob0.nc"
        _write_synth_nc(
            path,
            n_points=n, sw=sw, f0=127.6, carrier=4.7,
            n_avg=2, n_rcv=1, n_rep=n_rep,
            group_delay=32.0, amp=1e5, phase_deg=0.0,
            lb=20.0, f_hz=4 * sw / n, gains=[1.0], rng=rng, tr_ms=tr_ms,
        )
        fid = _ingest(path)
        assert fid.dims == (DIMS.time, "repetitions")
        # elapsed-time coordinate: TR * (1..n_rep), seconds
        np.testing.assert_allclose(
            fid.coords["repetitions"].values,
            tr_ms * 1e-3 * (1 + np.arange(n_rep)),
        )
        spec = fid.xmr.to_spectrum()
        vals = np.asarray(spec.values)
        # every repetition carries the same line (identical synthesis)
        peaks = np.abs(vals).max(axis=0)
        np.testing.assert_allclose(peaks, peaks[0], rtol=2e-3)
