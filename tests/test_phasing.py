"""Phasing parity: phase formula, scoring objectives, autophase recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray
from xmris_tpu.ops.phasing import _np_objective, acme_score_raw


def build_spectrum(p0_true=0.0, p1_true=0.0, n=1024, sw=4000.0, seed=3, noise=1e-3):
    """A dominant-peak spectrum (reference-style water data) plus satellites.

    Returns (pristine, dephased): the dephased copy has lineage attrs stripped
    so autophase sees an unknown phase error.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sw
    fid = np.zeros(n, dtype=np.complex128)
    for f0, amp in [(-120.0, 10.0), (300.0, 0.4), (700.0, 0.25)]:
        fid += amp * np.exp((1j * 2 * np.pi * f0 - 20.0) * t)
    fid += rng.normal(0, noise, n) + 1j * rng.normal(0, noise, n)
    da = XmrArray(
        fid,
        dims=(DIMS.time,),
        coords={COORDS.time: (DIMS.time, t)},
        attrs={ATTRS.reference_frequency: 100.0, ATTRS.carrier_ppm: 0.0},
    )
    pristine = da.xmr.to_spectrum()
    if p0_true or p1_true:
        spec = pristine.xmr.phase(p0=p0_true, p1=p1_true)
    else:
        spec = pristine
    for k in (
        ATTRS.phase_p0,
        ATTRS.phase_p1,
        ATTRS.phase_pivot,
        ATTRS.phase_pivot_coord,
    ):
        spec.attrs.pop(k, None)
    return pristine, spec


def real_corr(a, b):
    a, b = np.asarray(a).real.ravel(), np.asarray(b).real.ravel()
    return np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))


class TestPhase:
    def test_formula_parity(self, valid_spectrum_da):
        p0, p1, pivot = 37.0, -120.0, 250.0
        out = valid_spectrum_da.xmr.phase(p0=p0, p1=p1, pivot=pivot)
        x = valid_spectrum_da.coords[DIMS.frequency].values
        x_range = x.max() - x.min()
        phi = np.radians(p0) + np.radians(p1) * (x - pivot) / x_range
        expected = valid_spectrum_da.values * np.exp(1j * phi)
        np.testing.assert_allclose(out.values, expected, rtol=1e-12)

    def test_default_pivot_is_max_magnitude(self, valid_spectrum_da):
        out = valid_spectrum_da.xmr.phase(p0=10.0)
        x = valid_spectrum_da.coords[DIMS.frequency].values
        expected_pivot = x[int(np.argmax(np.abs(valid_spectrum_da.values)))]
        assert out.attrs[ATTRS.phase_pivot] == pytest.approx(expected_pivot)

    def test_lineage_attrs(self, valid_spectrum_da):
        out = valid_spectrum_da.xmr.phase(p0=5.0, p1=10.0, pivot=0.0)
        assert out.attrs[ATTRS.phase_p0] == 5.0
        assert out.attrs[ATTRS.phase_p1] == 10.0
        assert out.attrs[ATTRS.phase_pivot] == 0.0
        assert out.attrs[ATTRS.phase_pivot_coord] == DIMS.frequency

    def test_cross_coordinate_warning(self, valid_spectrum_da):
        first = valid_spectrum_da.xmr.phase(p0=5.0)
        renamed = first.xmr.to_ppm()
        with pytest.warns(UserWarning, match="previous phase operations"):
            renamed.xmr.phase(dim=DIMS.chemical_shift, p0=3.0)

    def test_zero_coordinate_range(self):
        """A single-point (or constant-coord) axis has zero range: the p1
        term vanishes and the scalar p0 factor broadcasts (the reference
        handles this by scalar broadcast; we previously crashed wrapping
        the 0-d factor as a 1-dim XmrArray)."""
        from xmris_tpu import XmrArray
        from xmris_tpu.ops.phasing import phase

        da = XmrArray(
            np.asarray([1.0 + 0.0j]), dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.asarray([0.0])},
        )
        out = phase(da, p0=90.0)
        np.testing.assert_allclose(
            out.values, [np.exp(1j * np.pi / 2)], rtol=1e-12
        )

    def test_nd_broadcast(self, multi_dim_da):
        spec = multi_dim_da.xmr.to_spectrum()
        out = spec.xmr.phase(p0=45.0, pivot=0.0)
        assert out.dims == spec.dims
        x = spec.coords[DIMS.frequency].values
        x_range = x.max() - x.min()
        phi = np.radians(45.0) + 0.0 * (x - 0.0) / x_range
        expected = spec.values * np.exp(1j * phi)[None, None, :]
        np.testing.assert_allclose(out.values, expected, rtol=1e-12)


class TestScores:
    def test_acme_jax_matches_numpy_objective(self):
        _, spec = build_spectrum(p0_true=40.0, p1_true=200.0)
        data = spec.values
        x = spec.coords[DIMS.frequency].values
        x_range = x.max() - x.min()
        pivot = x[int(np.argmax(np.abs(data)))]
        np_obj = _np_objective("acme", data, x, pivot, x_range, 0, 1)
        for ph in ([10.0, 50.0], [-90.0, 1000.0], [0.0, 0.0]):
            phi = np.radians(ph[0]) + np.radians(ph[1]) * (x - pivot) / x_range
            d = np.real(data * np.exp(1j * phi))
            jax_val = float(acme_score_raw(jnp.asarray(d)))
            assert jax_val == pytest.approx(np_obj(ph), rel=1e-9)

    def test_acme_guard_rejects_all_negative(self):
        # the jit objective scores all-negative spectra +inf instead of the
        # reference's divergent negative values (degenerate-basin guard)
        d = -np.abs(np.random.default_rng(0).normal(size=128)) - 0.1
        assert np.isinf(float(acme_score_raw(jnp.asarray(d))))

    def test_masked_scores_match_sliced(self):
        from xmris_tpu.ops.phasing import (
            peak_minima_score_raw,
            roi_positivity_score_raw,
        )

        rng = np.random.default_rng(0)
        d = rng.normal(size=256)
        ti, iw = 100, 30
        start, end = max(0, ti - iw), min(len(d), ti + iw)
        expected_pm = abs(np.min(d[start:ti]) - np.min(d[ti:end]))
        assert float(peak_minima_score_raw(jnp.asarray(d), ti, iw)) == pytest.approx(
            expected_pm
        )
        roi = d[start:end]
        expected_pos = np.sum(np.abs(roi[roi < 0])) * 5.0 - np.sum(roi[roi > 0])
        assert float(
            roi_positivity_score_raw(jnp.asarray(d), ti, iw)
        ) == pytest.approx(expected_pos)


class TestAutophase:
    @pytest.mark.parametrize("optimizer", ["de", "scipy", "grid"])
    def test_recovers_p0(self, optimizer):
        pristine, spec = build_spectrum(p0_true=-55.0)
        out = xmt.autophase(spec, p0_only=True, optimizer=optimizer)
        assert real_corr(out.values, pristine.values) > 0.98
        assert out.attrs[ATTRS.phase_p1] == 0.0

    @pytest.mark.parametrize("optimizer", ["de", "scipy", "grid"])
    def test_recovers_p0_p1(self, optimizer):
        pristine, spec = build_spectrum(p0_true=30.0, p1_true=-400.0)
        out = xmt.autophase(spec, optimizer=optimizer)
        assert real_corr(out.values, pristine.values) > 0.98

    def test_de_matches_scipy_optimum(self):
        _, spec = build_spectrum(p0_true=-55.0)
        out_de = xmt.autophase(spec, p0_only=True, optimizer="de")
        out_sp = xmt.autophase(spec, p0_only=True, optimizer="scipy")
        # Same basin, agreeing to well under a degree of p0
        d = abs(out_de.attrs[ATTRS.phase_p0] - out_sp.attrs[ATTRS.phase_p0])
        assert d < 0.5

    def test_single_grid_matches_de_optimum(self):
        """mode='single' optimizer='grid' lands in the DE basin (same ACME
        objective, deterministic candidate scan + polish)."""
        _, spec = build_spectrum(p0_true=-55.0)
        out_g = xmt.autophase(spec, p0_only=True, optimizer="grid")
        out_de = xmt.autophase(spec, p0_only=True, optimizer="de")
        d = abs(out_g.attrs[ATTRS.phase_p0] - out_de.attrs[ATTRS.phase_p0])
        assert d < 1.0

    def test_mode_all_per_voxel(self):
        # two voxels with different true phase errors
        builds = [build_spectrum(p0_true=p, seed=s) for p, s in [(40.0, 1), (-70.0, 2)]]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        out = xmt.autophase(stacked, mode="all", p0_only=True)
        for v, (pristine, _) in enumerate(builds):
            assert real_corr(out.values[v], pristine.values) > 0.98
        p0s = out.attrs[ATTRS.phase_p0]
        assert p0s.shape == (2,)

    def test_mode_all_grid_optimizer(self):
        """grid (candidate mesh + polish) matches the per-voxel DE answer."""
        builds = [
            build_spectrum(p0_true=p, seed=s)
            for p, s in [(40.0, 1), (-70.0, 2), (160.0, 3)]
        ]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        out_g = xmt.autophase(stacked, mode="all", p0_only=True,
                              optimizer="grid")
        out_d = xmt.autophase(stacked, mode="all", p0_only=True,
                              optimizer="de")
        for v, (pristine, _) in enumerate(builds):
            assert real_corr(out_g.values[v], pristine.values) > 0.98
        np.testing.assert_allclose(
            out_g.attrs[ATTRS.phase_p0], out_d.attrs[ATTRS.phase_p0], atol=1.0
        )

    def test_mode_all_grid_p0_p1(self):
        """grid optimizer recovers per-voxel zero- AND first-order errors."""
        builds = [
            build_spectrum(p0_true=p, p1_true=q, seed=s)
            for p, q, s in [(40.0, 300.0, 1), (-70.0, -800.0, 2)]
        ]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        out = xmt.autophase(stacked, mode="all", optimizer="grid")
        for v, (pristine, _) in enumerate(builds):
            assert real_corr(out.values[v], pristine.values) > 0.98

    @pytest.mark.parametrize("polish", ["newton", "bfgs"])
    def test_mode_all_grid_second_order_polish(self, polish):
        """newton/bfgs polish lands in the same optimum as the gd polish
        for both the 1-D (p0) and 2-D (p0, p1) searches."""
        builds = [
            build_spectrum(p0_true=p, p1_true=q, seed=s)
            for p, q, s in [(40.0, 300.0, 1), (-70.0, -800.0, 2), (160.0, 0.0, 3)]
        ]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        out = xmt.autophase(
            stacked, mode="all", optimizer="grid", polish_optimizer=polish
        )
        out_gd = xmt.autophase(stacked, mode="all", optimizer="grid")
        for v, (pristine, _) in enumerate(builds):
            assert real_corr(out.values[v], pristine.values) > 0.98
        # same basin as the measured gd default
        np.testing.assert_allclose(
            out.attrs[ATTRS.phase_p0], out_gd.attrs[ATTRS.phase_p0], atol=2.0
        )
        # contract: p0 wrapped, p1 boxed
        assert np.all(np.abs(out.attrs[ATTRS.phase_p0]) <= 180.0)
        assert np.all(np.abs(out.attrs[ATTRS.phase_p1]) <= 4000.0)

    def test_mode_all_grid_polish_p0_only_second_order(self):
        builds = [
            build_spectrum(p0_true=p, seed=s) for p, s in [(40.0, 1), (-70.0, 2)]
        ]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        for polish in ("newton", "bfgs"):
            out = xmt.autophase(
                stacked, mode="all", p0_only=True, optimizer="grid",
                polish_optimizer=polish,
            )
            for v, (pristine, _) in enumerate(builds):
                assert real_corr(out.values[v], pristine.values) > 0.98
            assert np.all(out.attrs[ATTRS.phase_p1] == 0.0)

    def test_mode_all_grid_rejects_bad_polish(self):
        builds = [build_spectrum(p0_true=40.0, seed=1)]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        with pytest.raises(ValueError, match="polish_optimizer"):
            xmt.autophase(
                stacked, mode="all", optimizer="grid",
                polish_optimizer="adam",
            )

    def test_mode_all_grid_roi_method(self):
        """ROI methods (peak_minima) scan at full resolution under the
        grid optimizer — decimation would shift/collapse the flank
        windows."""
        builds = [
            build_spectrum(p0_true=p, seed=s) for p, s in [(-45.0, 1), (90.0, 2)]
        ]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        out = xmt.autophase(
            stacked, mode="all", method="peak_minima", peak_width=200.0,
            p0_only=True, optimizer="grid",
        )
        for v, (pristine, _) in enumerate(builds):
            assert real_corr(out.values[v], pristine.values) > 0.95

    def test_mode_all_rejects_scipy_optimizer(self):
        builds = [build_spectrum(p0_true=40.0, seed=1)]
        stacked = XmrArray(
            np.stack([s.values for _, s in builds]),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: builds[0][1].coords[DIMS.frequency].values},
        )
        with pytest.raises(ValueError, match="single-mode"):
            xmt.autophase(stacked, mode="all", optimizer="scipy")

    def test_lb_smoothing_path(self):
        pristine, spec = build_spectrum(p0_true=-30.0)
        out = xmt.autophase(spec, lb=2.0, p0_only=True)
        assert real_corr(out.values, pristine.values) > 0.97

    def test_target_coord_pivot(self):
        _, spec = build_spectrum(p0_true=20.0)
        out = xmt.autophase(spec, target_coord=-200.0, p0_only=True)
        assert out.attrs[ATTRS.phase_pivot] == pytest.approx(-200.0)

    def test_positivity_method(self):
        pristine, spec = build_spectrum(p0_true=-45.0)
        out = xmt.autophase(spec, method="positivity", peak_width=200.0, p0_only=True)
        assert real_corr(out.values, pristine.values) > 0.95

    def test_invalid_mode(self, valid_spectrum_da):
        with pytest.raises(ValueError, match="single"):
            xmt.autophase(valid_spectrum_da, mode="bogus")

    def test_invalid_method(self, valid_spectrum_da):
        with pytest.raises(ValueError, match="acme"):
            xmt.autophase(valid_spectrum_da, method="bogus")
