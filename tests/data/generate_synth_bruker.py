"""Generate the self-contained synthetic Bruker fixture (committed output).

Writes ``tests/data/synth_nspect_1H/rawdatajob0.nc`` — a classic netCDF-3
file in exactly the layout the reference's real-scanner export uses
(``/root/reference/tests/data/nspect_slab_1H/rawdatajob0.nc``: one
``(raw, component)`` float64 variable named
``__xarray_dataarray_variable__`` with the PVM acquisition parameters as
variable attrs, plus a char 'component' coordinate) — and its hand-derived
``ground_truth.toml``.

The payload is a known water-line FID pushed through the *forward* model of
the console's digital filter (prepend ``whole`` transient samples; apply the
inverse fractional phase ramp), so the repo's full ingest pipeline
(``load_dataarray -> to_complex -> reshape_bruker_raw -> build_fid ->
remove_digital_filter -> mean(averages) -> to_spectrum -> autophase ->
to_ppm``) must recover the synthesis parameters exactly.  Every TOML value
is computed in closed form from the synthesis constants below — nothing is
measured back from the file.

Run from the repo root to regenerate::

    python tests/data/generate_synth_bruker.py
"""

import pathlib

import numpy as np

OUT = pathlib.Path(__file__).parent / "synth_nspect_1H"

# Synthesis constants (the single source of truth for the TOML)
N_POINTS = 1024
SW_HZ = 4000.0
F0_MHZ = 127.6
CARRIER_PPM = 4.7
N_AVERAGES = 4
GROUP_DELAY = 76.125  # matches the console's 1H/13C value
WATER_HZ = -SW_HZ / N_POINTS  # exactly one DFT bin below carrier
AMPLITUDE = 5.0e6
PHASE_DEG = 30.0
LB = 20.0  # s^-1 decay rate
NOISE_SIGMA = AMPLITUDE / 2000.0
SEED = 20260818


def make_stream() -> np.ndarray:
    """The flat job0 stream: N_AVERAGES acquisitions, time fastest."""
    whole = int(np.floor(GROUP_DELAY))
    frac = GROUP_DELAY - whole
    t = np.arange(N_POINTS) / SW_HZ
    clean = (
        AMPLITUDE
        * np.exp(1j * np.deg2rad(PHASE_DEG))
        * np.exp((1j * 2 * np.pi * WATER_HZ - LB) * t)
    )
    # Forward digital-filter model: keep n-whole samples, delay them by the
    # fractional part (ramp with the OPPOSITE sign of the correction), then
    # prepend `whole` wake-up transient samples.
    kept = clean[: N_POINTS - whole]
    ramp = np.exp(-1j * 2 * np.pi * frac * np.fft.fftfreq(kept.size))
    delayed = np.fft.ifft(np.fft.fft(kept) * ramp)
    rng = np.random.default_rng(SEED)
    averages = []
    for _ in range(N_AVERAGES):
        transient = 0.01 * AMPLITUDE * rng.standard_normal(whole) * np.exp(
            1j * rng.uniform(0, 2 * np.pi, whole)
        )
        noise = NOISE_SIGMA * (
            rng.standard_normal(N_POINTS) + 1j * rng.standard_normal(N_POINTS)
        ) / np.sqrt(2)
        averages.append(np.concatenate([transient, delayed]) + noise)
    return np.concatenate(averages)


def expected_ortho_peak() -> float:
    """Closed-form ortho-DFT |peak| at the water bin after filter removal.

    After ``remove_digital_filter`` the time signal is the clean FID's first
    ``n - whole`` samples followed by zeros; at an on-grid frequency the
    oscillation cancels against the DFT kernel exactly, leaving the
    geometric decay sum.
    """
    whole = int(np.floor(GROUP_DELAY))
    rho = np.exp(-LB / SW_HZ)
    return AMPLITUDE * (1 - rho ** (N_POINTS - whole)) / (1 - rho) / np.sqrt(N_POINTS)


def write_netcdf(stream: np.ndarray) -> None:
    from scipy.io import netcdf_file

    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "rawdatajob0.nc"
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
    var.PVM_SpecSWH = SW_HZ
    var.PVM_RepetitionTime = 1000.0
    var.PVM_FrqRef = F0_MHZ
    var.PVM_FrqWorkPpm = CARRIER_PPM
    var.PVM_SpecMatrix = N_POINTS
    var.PVM_EncNReceivers = 1
    var.PVM_NAverages = N_AVERAGES
    var.PVM_NRepetitions = 1
    var.groupDelay = GROUP_DELAY
    f.close()
    print("wrote", path, path.stat().st_size, "bytes")


def write_toml() -> None:
    water_ppm = float(CARRIER_PPM + WATER_HZ / F0_MHZ)
    peak = float(expected_ortho_peak())
    toml = f"""\
# Synthetic 1H NSPECT fixture — ground truth derived in closed form from
# the synthesis constants in generate_synth_bruker.py (NOT measured back
# from the netCDF).  Mirrors the reference's real-scanner TOML layout.
[synth_1h]
dataset_name = "Synthetic NSPECT slab 1H (water line)"
vendor = "Bruker (synthetic)"
generator = "tests/data/generate_synth_bruker.py"

[synth_1h.spectrum_view]
# ortho-normalized DFT peak magnitude after digital-filter removal
water_main = {{ hz = {float(WATER_HZ)!r}, ppm = {water_ppm!r}, amplitude_ortho = {peak!r} }}
true_phase_deg = {{ deg = {PHASE_DEG!r} }}

[synth_1h.synthesis]
amplitude = {AMPLITUDE!r}
phase_deg = {PHASE_DEG!r}
decay_rate = {{ value = {LB!r}, unit = "1/s" }}
noise_sigma = {NOISE_SIGMA!r}
seed = {SEED}

[synth_1h.parameters.general]
tr         = {{ value = 1000.0, unit = "ms", pv_key = "PVM_RepetitionTime" }}
acq_points = {{ value = {N_POINTS}, pv_key = "PVM_SpecMatrix" }}
acq_bw     = {{ value = {SW_HZ!r}, unit = "Hz", pv_key = "PVM_SpecSWH" }}
averages   = {{ value = {N_AVERAGES}, pv_key = "PVM_NAverages" }}

[synth_1h.parameters.frequency]
reference_frequency    = {{ value = {F0_MHZ!r}, unit = "MHz", pv_key = "PVM_FrqRef" }}
working_chemical_shift = {{ value = {CARRIER_PPM!r}, unit = "ppm", pv_key = "PVM_FrqWorkPpm" }}

[synth_1h.parameters.rx_filter_info]
groupDelay = {{ value = {GROUP_DELAY!r} }}
"""
    (OUT / "ground_truth.toml").write_text(toml)
    print("wrote", OUT / "ground_truth.toml")


if __name__ == "__main__":
    write_netcdf(make_stream())
    write_toml()
