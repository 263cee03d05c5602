"""Randomized prior/phantom sweeps through the full AMARES fit engine.

``test_fitting.py`` pins the fitter on the reference's seeded 31P phantom;
this module drives `fit_amares` end to end at *randomized* prior
configurations — peak count, amplitudes, shifts, linewidths, phases, ties,
fixed Voigt g — on noiseless-ish synthetic data whose ground truth is known
by construction, asserting parameter recovery, tie enforcement, convergence
flags, and CRLB sanity.  Seeds are fixed per trial so shapes and compiles
are deterministic (warm persistent cache, exact reproduction on failure).

Model conventions under test (reference ``fitting/simulation.py:91-96``):
damping ``d = pi * linewidth``, frequency ``cs_ppm * MHz`` Hz, phase in
degrees at the prior/API boundary.
"""

import numpy as np
import pytest

from xmris_tpu import DIMS, XmrArray

MHZ = 120.0
SW = 4000.0
N_POINTS = 256
N_VOXELS = 3


def _metab_names(k):
    return [f"M{i}" for i in range(k)]


def _prior_csv(names, init, bounds):
    """Build a pyAMARES-style prior CSV from per-param dicts."""
    lines = ["Index," + ",".join(names), "Initial Values," + "," * (len(names) - 1)]
    for pname in ("amplitude", "chemicalshift", "linewidth", "phase", "g"):
        lines.append(pname + "," + ",".join(str(v) for v in init[pname]))
    lines.append("Bounds," + "," * (len(names) - 1))
    for pname in ("amplitude", "chemicalshift", "linewidth", "phase", "g"):
        lines.append(pname + "," + ",".join(f'"{b}"' for b in bounds[pname]))
    return "\n".join(lines) + "\n"


def _truth(rng, k, g_value=0.0):
    """Random well-separated ground-truth parameters for k peaks."""
    # shifts separated by >= 2.5 ppm so the problem stays identifiable
    base = rng.uniform(-8.0, -2.0)
    cs = base + np.arange(k) * rng.uniform(2.5, 4.0)
    return {
        "amplitude": rng.uniform(8.0, 30.0, size=k),
        "chemicalshift": cs,
        "linewidth": rng.uniform(10.0, 25.0, size=k),
        "phase": np.full(k, float(rng.uniform(-25.0, 25.0))),
        "g": np.full(k, g_value),
    }


def _make_data(rng, truth, noise=0.02):
    t = np.arange(N_POINTS) / SW
    fid = np.zeros(N_POINTS, dtype=complex)
    k = len(truth["amplitude"])
    for i in range(k):
        a = truth["amplitude"][i]
        f_hz = truth["chemicalshift"][i] * MHZ
        d = np.pi * truth["linewidth"][i]
        g = truth["g"][i]
        phi = np.deg2rad(truth["phase"][i])
        envelope = np.exp(-d * (1.0 - g + g * t) * t)
        fid += a * envelope * np.exp(1j * (phi + 2 * np.pi * f_hz * t))
    data = np.stack(
        [
            fid
            + noise
            * (rng.normal(size=N_POINTS) + 1j * rng.normal(size=N_POINTS))
            for _ in range(N_VOXELS)
        ]
    )
    return XmrArray(
        data,
        dims=("voxel", DIMS.time),
        coords={"voxel": np.arange(N_VOXELS), DIMS.time: (DIMS.time, t)},
        attrs={"MHz": MHZ, "sw": SW},
    )


def _prior_from_truth(rng, truth, *, tie=None, fix_g=True):
    """Perturbed initial values + truth-containing bounds; optional tie."""
    k = len(truth["amplitude"])
    names = _metab_names(k)
    init = {
        "amplitude": np.round(truth["amplitude"] * rng.uniform(0.5, 1.5, k), 3),
        "chemicalshift": np.round(
            truth["chemicalshift"] + rng.uniform(-0.2, 0.2, k), 3
        ),
        "linewidth": np.round(
            np.clip(truth["linewidth"] * rng.uniform(0.7, 1.4, k), 6, 50), 3
        ),
        "phase": np.zeros(k),
        "g": np.round(truth["g"], 3),
    }
    bounds = {
        "amplitude": ["(0, "] * k,
        "chemicalshift": [
            f"({c - 1.0:.3f}, {c + 1.0:.3f})" for c in init["chemicalshift"]
        ],
        "linewidth": ["(5.0, 60.0)"] * k,
        "phase": ["(-180, 180)"] * k,
        "g": ["fixed"] * k if fix_g else ["(0, 1)"] * k,
    }
    init = {p: list(v) for p, v in init.items()}
    if tie is not None:
        child, parent, factor = tie
        init["amplitude"][child] = f"{factor}*{names[parent]}"
    return names, _prior_csv(names, init, bounds)


def _run_trial(tmp_path, rng, k, *, tie=None, g_value=0.0):
    truth = _truth(rng, k, g_value=g_value)
    if tie is not None:
        child, parent, factor = tie
        truth["amplitude"][child] = factor * truth["amplitude"][parent]
    da = _make_data(rng, truth)
    names, csv = _prior_from_truth(rng, truth, tie=tie)
    pk = tmp_path / "pk.csv"
    pk.write_text(csv)
    ds = da.xmr.fit_amares(pk, engine="xla", max_iter=80)
    return truth, names, ds


class TestFitFuzz:
    @pytest.mark.parametrize("trial,k", [(0, 1), (1, 2), (2, 3)])
    def test_lorentzian_recovery(self, tmp_path, trial, k):
        rng = np.random.default_rng(20_000 + trial)
        truth, names, ds = _run_trial(tmp_path, rng, k)

        assert bool(np.all(ds["fit_converged"].values))
        amp = ds["amplitude"].values  # (voxel, Metabolite)
        cs = ds["chem_shift"].values
        lw = ds["linewidth"].values
        ph = ds["phase"].values
        for i in range(k):
            np.testing.assert_allclose(
                amp[:, i], truth["amplitude"][i], rtol=0.03
            )
            np.testing.assert_allclose(
                cs[:, i], truth["chemicalshift"][i], atol=0.05
            )
            np.testing.assert_allclose(
                lw[:, i], truth["linewidth"][i], rtol=0.10
            )
            np.testing.assert_allclose(ph[:, i], truth["phase"][i], atol=5.0)
        crlb = ds["crlb"].values
        assert np.all(np.isfinite(crlb)) and np.all(crlb > 0)
        # model reconstruction actually explains the data
        resid = np.abs(ds["residuals"].values)
        assert np.max(resid) < 0.2 * np.max(np.abs(ds["raw_data"].values))

    def test_tied_amplitude_random_factor(self, tmp_path):
        rng = np.random.default_rng(21_000)
        factor = round(float(rng.uniform(0.25, 0.75)), 3)
        truth, names, ds = _run_trial(tmp_path, rng, 2, tie=(1, 0, factor))
        amp = ds["amplitude"].values
        # the tie is enforced exactly, voxel by voxel
        np.testing.assert_allclose(amp[:, 1], factor * amp[:, 0], rtol=1e-9)
        np.testing.assert_allclose(amp[:, 0], truth["amplitude"][0], rtol=0.03)

    def test_nd_grid_layout_matches_flat(self, tmp_path):
        """Fitting an (x, y, time) grid == fitting the same voxels flat:
        the N-D packing/unpacking around the batched engine is layout-
        transparent, and the output dims mirror the input voxel dims."""
        rng = np.random.default_rng(23_000)
        truth = _truth(rng, 2)
        da_flat = _make_data(rng, truth)  # (voxel=3, time)
        names, csv = _prior_from_truth(rng, truth)
        pk = tmp_path / "pk.csv"
        pk.write_text(csv)

        nx, ny = 3, 1
        vals = np.asarray(da_flat.values).reshape(nx, ny, -1)
        from xmris_tpu import DIMS as _D

        da_grid = XmrArray(
            vals,
            dims=(_D.x, _D.y, DIMS.time),
            coords={
                _D.x: np.arange(nx),
                _D.y: np.arange(ny),
                DIMS.time: da_flat.coords[DIMS.time].values,
            },
            attrs=dict(da_flat.attrs),
        )
        ds_flat = da_flat.xmr.fit_amares(pk, engine="xla", max_iter=80)
        ds_grid = da_grid.xmr.fit_amares(pk, engine="xla", max_iter=80)
        amp_grid = ds_grid["amplitude"]
        assert amp_grid.dims[:-1] == (_D.x, _D.y)
        np.testing.assert_allclose(
            np.asarray(amp_grid.values).reshape(nx * ny, -1),
            np.asarray(ds_flat["amplitude"].values),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ds_grid["crlb"].values).reshape(nx * ny, -1),
            np.asarray(ds_flat["crlb"].values),
            rtol=1e-5,
        )

    def test_fixed_voigt_g_recovery(self, tmp_path):
        rng = np.random.default_rng(22_000)
        g = round(float(rng.uniform(0.2, 0.6)), 2)
        truth, names, ds = _run_trial(tmp_path, rng, 2, g_value=g)
        assert bool(np.all(ds["fit_converged"].values))
        amp = ds["amplitude"].values
        for i in range(2):
            np.testing.assert_allclose(
                amp[:, i], truth["amplitude"][i], rtol=0.05
            )
            np.testing.assert_allclose(
                ds["chem_shift"].values[:, i],
                truth["chemicalshift"][i],
                atol=0.05,
            )
