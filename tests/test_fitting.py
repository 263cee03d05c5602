"""Fitting engine tests: simulator parity, prior parsing, batched LM accuracy.

The headline oracle is the reference docs' seeded 31P phantom
(``docs/notebooks/fitting/pyamares.md``): PCr amplitudes 10..50 across 5
voxels, ATP constant at 5.0 — the fitted amplitudes must recover the truth.
"""

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import DIMS, XmrArray
from xmris_tpu.fitting.prior import load_prior_knowledge

PK_CSV = """Index,PCr,ATP
Initial Values,,
amplitude,10.0,5.0
chemicalshift,0.0,-7.5
linewidth,15.0,20.0
phase,0,0
g,0,0
Bounds,,
amplitude,"(0, ","(0, "
chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"
linewidth,"(5.0, 30.0)","(10.0, 40.0)"
phase,"(-180, 180)","(-180, 180)"
g,"(0, 1)","(0, 1)"
"""


@pytest.fixture
def pk_file(tmp_path):
    p = tmp_path / "pk.csv"
    p.write_text(PK_CSV)
    return p


def make_phantom(n_voxels=5, n_points=1024, sw=10000.0, mhz=120.0, noise=0.5):
    """The reference notebook's seeded 31P phantom (rng seed 42)."""
    dt = 1.0 / sw
    time = np.arange(n_points) * dt
    data = np.zeros((n_voxels, n_points), dtype=complex)
    rng = np.random.default_rng(seed=42)
    for v in range(n_voxels):
        amp_pcr = 10.0 * (v + 1)
        fid_pcr = amp_pcr * np.exp(-15.0 * np.pi * time)
        fid_atp = (
            5.0
            * np.exp(-20.0 * np.pi * time)
            * np.exp(1j * 2 * np.pi * (-7.5 * mhz) * time)
        )
        noise_c = rng.normal(0, noise, n_points) + 1j * rng.normal(0, noise, n_points)
        data[v, :] = fid_pcr + fid_atp + noise_c
    return XmrArray(
        data,
        dims=("voxel", DIMS.time),
        coords={"voxel": np.arange(n_voxels), DIMS.time: (DIMS.time, time)},
        attrs={"MHz": mhz, "sw": sw},
    )


class TestSimulator:
    def test_eq6_formula_parity(self):
        """simulate_fid must match a direct Eq.6 evaluation."""
        fid = xmt.simulate_fid(
            amplitudes=[2.0, 1.0],
            frequencies=[100.0, -250.0],
            spectral_width=5000.0,
            n_points=512,
            dampings=[30.0, 50.0],
            phases=[0.3, -0.1],
            lineshape_g=[0.0, 0.4],
        )
        t = np.arange(512) / 5000.0
        expected = np.zeros(512, dtype=complex)
        for a, f, d, p, g in [
            (2.0, 100.0, 30.0, 0.3, 0.0),
            (1.0, -250.0, 50.0, -0.1, 0.4),
        ]:
            expected += (
                a
                * np.exp(1j * p)
                * np.exp(-d * (1 - g + g * t) * t)
                * np.exp(1j * 2 * np.pi * f * t)
            )
        np.testing.assert_allclose(fid.values, expected, rtol=1e-12)

    def test_ppm_to_hz_conversion(self):
        fid = xmt.simulate_fid(
            amplitudes=[1.0],
            chemical_shifts=[5.7],
            reference_frequency=100.0,
            carrier_ppm=4.7,
            spectral_width=2000.0,
            n_points=1024,
            dampings=10.0,
        )
        spec = fid.xmr.to_spectrum()
        peak_hz = spec.coords[DIMS.frequency].values[
            int(np.argmax(np.abs(spec.values)))
        ]
        # (5.7 - 4.7) * 100 MHz = 100 Hz
        assert abs(peak_hz - 100.0) < 2000.0 / 1024

    def test_noise_snr(self):
        fid = xmt.simulate_fid(
            amplitudes=[10.0],
            frequencies=[0.0],
            spectral_width=5000.0,
            n_points=4096,
            dampings=1.0,
            target_snr=20.0,
            seed=0,
        )
        ideal = xmt.simulate_fid(
            amplitudes=[10.0],
            frequencies=[0.0],
            spectral_width=5000.0,
            n_points=4096,
            dampings=1.0,
        )
        noise = fid.values - ideal.values
        sig = np.mean(np.abs(ideal.values[:10]))
        measured_snr = sig / np.std(noise)
        assert measured_snr == pytest.approx(20.0, rel=0.15)
        assert fid.attrs["target_snr"] == 20.0

    def test_requires_frequency_info(self):
        with pytest.raises(ValueError, match="frequencies"):
            xmt.simulate_fid(amplitudes=[1.0])
        with pytest.raises(ValueError, match="reference_frequency"):
            xmt.simulate_fid(amplitudes=[1.0], chemical_shifts=[1.0])
        with pytest.raises(ValueError, match="not both"):
            xmt.simulate_fid(
                amplitudes=[1.0], frequencies=[1.0], chemical_shifts=[1.0]
            )


class TestPriorKnowledge:
    def test_parse_basic(self, pk_file):
        pk = load_prior_knowledge(pk_file)
        assert pk.metabolites == ["PCr", "ATP"]
        assert pk.n_peaks == 2
        assert pk.n_free == 10
        assert "PCr.amplitude" in pk.free_labels

    def test_bounds(self, pk_file):
        pk = load_prior_knowledge(pk_file)
        i = pk.free_labels.index("PCr.amplitude")
        assert pk.lower[i] == 0.0 and np.isinf(pk.upper[i])
        j = pk.free_labels.index("ATP.chemicalshift")
        assert (pk.lower[j], pk.upper[j]) == (-8.0, -7.0)

    def test_fixed_parameter(self, tmp_path):
        csv = PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed")
        p = tmp_path / "pk_fixed.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        assert pk.n_free == 8  # both g parameters pinned
        assert not any("g" in lab.split(".")[1] for lab in pk.free_labels)

    def test_tied_parameter(self, tmp_path):
        csv = PK_CSV.replace(
            "amplitude,10.0,5.0", 'amplitude,10.0,0.5*PCr'
        )
        p = tmp_path / "pk_tied.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        assert pk.n_free == 9
        # ATP amplitude maps to PCr amplitude slot with factor 0.5
        atp_amp_flat = 1 * 5 + 0
        pcr_slot = pk.free_labels.index("PCr.amplitude")
        assert pk.pmap.idx[atp_amp_flat] == pcr_slot
        assert pk.pmap.scale[atp_amp_flat] == 0.5

    def test_empty_file_raises(self, tmp_path):
        p = tmp_path / "empty.csv"
        p.write_text("Index\n")
        with pytest.raises(ValueError, match="no metabolite"):
            load_prior_knowledge(p)


class TestFitAmares:
    def test_tied_amplitude_crlb_scaled(self, tmp_path):
        """A tied amplitude (0.5*LacA) shares LacA's free slot: its CRLB%
        must scale the shared sd by the tie factor, which cancels against
        the amplitude ratio — identical CRLB% for both lines."""
        prior = (
            "Index,LacA,LacB\n"
            "Initial Values,,\n"
            "amplitude,10.0,0.5*LacA\n"
            "chemicalshift,1.25,1.45\n"
            "linewidth,8.0,8.0\n"
            "phase,0,0\n"
            "g,0,0\n"
            "Bounds,,\n"
            'amplitude,"(0, ",\n'
            'chemicalshift,"(1.0, 1.5)","(1.2, 1.7)"\n'
            'linewidth,"(2, 30)","(2, 30)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            "g,fixed,fixed\n"
        )
        p = tmp_path / "tied.csv"
        p.write_text(prior)
        mhz, sw, n = 120.0, 4000.0, 512
        t = np.arange(n) / sw
        rng = np.random.default_rng(0)
        sig = (
            12.0 * np.exp((-np.pi * 8 + 1j * 2 * np.pi * (1.25 * mhz)) * t)
            + 6.0 * np.exp((-np.pi * 8 + 1j * 2 * np.pi * (1.45 * mhz)) * t)
        )
        da = XmrArray(
            (sig + rng.normal(0, 0.05, n) + 1j * rng.normal(0, 0.05, n))[None],
            dims=("voxel", "time"), coords={"time": t}, attrs={"MHz": mhz},
        )
        ds = da.xmr.fit_amares(p)
        crlb = ds["crlb"].values[0]
        # amp_B = 0.5 * amp_A and sd_B = 0.5 * sd_A  =>  CRLB% identical
        assert crlb[1] == pytest.approx(crlb[0], rel=1e-6)

    def test_template_seeded_voxel_counts_as_converged(self, tmp_path):
        """Regression: a voxel seeded exactly at its optimum (the template
        voxel itself, with scale_init_amplitudes=False) accepts zero LM
        steps and exits via the rejection plateau — that must report
        converged=True with the fitted (non-zero) parameters, not be
        zeroed as a failed fit."""
        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        da = make_phantom(n_voxels=1, n_points=512, noise=0.05)
        ds = da.xmr.fit_amares(p, scale_init_amplitudes=False)
        assert ds["fit_converged"].values.all()
        assert (np.abs(ds["amplitude"].values) > 1.0).all()
    def test_prestaged_device_fids_bit_identical(self, pk_file):
        """fit_amares(device_fids=stage_device_fids(da)) must match the
        self-uploading path bit-for-bit — the serve prefetch thread relies
        on the staged planes lining up with the fit's own flattening."""
        from xmris_tpu.fitting.amares import stage_device_fids

        da = make_phantom(n_voxels=3, n_points=512)
        ds_ref = da.xmr.fit_amares(pk_file)
        ds_pre = da.xmr.fit_amares(
            pk_file, device_fids=stage_device_fids(da)
        )
        for key in ("amplitude", "chem_shift", "linewidth", "phase",
                    "crlb", "fit_converged"):
            np.testing.assert_array_equal(
                ds_pre[key].values, ds_ref[key].values, err_msg=key
            )

    def test_prestaged_device_fids_shape_mismatch_raises(self, pk_file):
        from xmris_tpu.fitting.amares import stage_device_fids

        da = make_phantom(n_voxels=3, n_points=512)
        wrong = stage_device_fids(make_phantom(n_voxels=2, n_points=512))
        with pytest.raises(ValueError, match="stage_device_fids"):
            da.xmr.fit_amares(pk_file, device_fids=wrong)

    def test_prestaged_device_fids_wrong_dim_raises(self, pk_file):
        """A square grid staged along the WRONG dim has planes whose
        flattened shape coincides with the fit's — shape checks pass and
        the fit would silently run on transposed data.  The StagedFids
        layout tag must reject it."""
        from xmris_tpu.fitting.amares import stage_device_fids

        da = make_phantom(n_voxels=16, n_points=16)
        transposed = stage_device_fids(da, dim="voxel")
        with pytest.raises(ValueError, match="staged for layout"):
            da.xmr.fit_amares(pk_file, device_fids=transposed)

    def test_31p_phantom_amplitude_recovery(self, pk_file):
        """The reference docs' headline example: PCr gradient + constant ATP."""
        da = make_phantom()
        ds = da.xmr.fit_amares(pk_file, num_workers=1)

        amp = ds["amplitude"]
        assert amp.dims == ("voxel", "Metabolite")
        pcr = amp.sel({"Metabolite": "PCr"}).values
        atp = amp.sel({"Metabolite": "ATP"}).values

        np.testing.assert_allclose(pcr, 10.0 * np.arange(1, 6), rtol=0.05)
        np.testing.assert_allclose(atp, np.full(5, 5.0), rtol=0.25)

    def test_output_dataset_structure(self, pk_file):
        da = make_phantom(n_voxels=2)
        ds = da.xmr.fit_amares(pk_file)
        for name in ("raw_data", "fit_data", "residuals"):
            assert ds[name].dims == ("voxel", DIMS.time)
        for name in ("amplitude", "chem_shift", "linewidth", "phase", "crlb", "snr"):
            assert ds[name].dims == ("voxel", "Metabolite")
        np.testing.assert_allclose(
            ds["residuals"].values,
            ds["raw_data"].values - ds["fit_data"].values,
        )
        assert ds.attrs["fit_method"] == "leastsq"
        assert "prior_knowledge_file" in ds.attrs
        assert ds["fit_converged"].values.all()

    def test_return_curves_false_lean_dataset(self, pk_file):
        """return_curves=False drops only the time-domain curve variables;
        every map/mask/attr is bit-identical to the full dataset."""
        from xmris_tpu.fitting.amares import fit_amares

        da = make_phantom(n_voxels=2)
        full = da.xmr.fit_amares(pk_file)
        lean = fit_amares(da, pk_file, return_curves=False)
        for name in ("raw_data", "fit_data", "residuals"):
            assert name not in lean.data_vars
        for name in ("amplitude", "chem_shift", "linewidth", "phase",
                     "crlb", "snr", "fit_converged"):
            np.testing.assert_array_equal(
                lean[name].values, full[name].values
            )
            assert lean[name].dims == full[name].dims
        assert lean.attrs == full.attrs

    def test_fit_quality(self, pk_file):
        """Residuals after the fit should be noise-level."""
        da = make_phantom(n_voxels=3)
        ds = da.xmr.fit_amares(pk_file)
        res_std = np.std(ds["residuals"].values.real)
        assert res_std == pytest.approx(0.5, rel=0.2)  # injected noise sigma

    def test_crlb_reasonable(self, pk_file):
        da = make_phantom()
        ds = da.xmr.fit_amares(pk_file)
        crlb = ds["crlb"].values
        assert np.all(crlb > 0)
        assert np.all(crlb < 50)
        # stronger PCr signal => lower relative CRLB in later voxels
        pcr_crlb = ds["crlb"].sel({"Metabolite": "PCr"}).values
        assert pcr_crlb[-1] < pcr_crlb[0]

    def test_chem_shift_recovery(self, pk_file):
        da = make_phantom()
        ds = da.xmr.fit_amares(pk_file)
        atp_cs = ds["chem_shift"].sel({"Metabolite": "ATP"}).values
        np.testing.assert_allclose(atp_cs, -7.5, atol=0.05)

    def test_linewidth_recovery(self, pk_file):
        # Noise sigma=0.5 induces genuine ~10-15% linewidth variance (verified
        # against scipy.least_squares, which lands on identical optima).
        da = make_phantom()
        ds = da.xmr.fit_amares(pk_file)
        np.testing.assert_allclose(
            ds["linewidth"].sel({"Metabolite": "PCr"}).values, 15.0, rtol=0.2
        )

    def test_matches_scipy_least_squares_optimum(self, pk_file):
        """The batched LM must land on the same bounded-LS optimum as scipy."""
        from scipy.optimize import least_squares

        da = make_phantom(n_voxels=1)
        ds = da.xmr.fit_amares(pk_file, initialize_with_lm=False, max_iter=200)

        y = np.asarray(da.values)[0]
        t = da.coords[DIMS.time].values

        def resid(th):
            m = np.zeros_like(y)
            for i in range(2):
                a, cs, lw, ph, g = th[5 * i : 5 * i + 5]
                m = m + (
                    a
                    * np.exp(1j * np.deg2rad(ph))
                    * np.exp(-np.pi * lw * (1 - g + g * t) * t)
                    * np.exp(1j * 2 * np.pi * cs * 120.0 * t)
                )
            r = y - m
            return np.concatenate([r.real, r.imag])

        th0 = [10, 0, 15, 0, 0, 5, -7.5, 20, 0, 0]
        lb = [0, -0.5, 5, -180, 0, 0, -8, 10, -180, 0]
        ub = [np.inf, 0.5, 30, 180, 1, np.inf, -7, 40, 180, 1]
        sol = least_squares(resid, th0, bounds=(lb, ub))

        # The (amplitude, linewidth, g) subspace has a nearly flat valley at
        # this SNR; the robust parity statement is the achieved cost plus the
        # well-conditioned parameters.
        scipy_cost = float(np.sum(sol.fun**2))
        r = ds["residuals"].values
        our_cost = float(np.sum(r.real**2 + r.imag**2))
        assert our_cost == pytest.approx(scipy_cost, rel=1e-3)

        ours_amp = ds["amplitude"].values[0]  # (1, Metabolite) -> (Metabolite,)
        np.testing.assert_allclose(ours_amp, [sol.x[0], sol.x[5]], rtol=0.02)
        np.testing.assert_allclose(
            ds["chem_shift"].values[0], [sol.x[1], sol.x[6]], atol=0.01
        )

    def test_1d_input(self, pk_file):
        da = make_phantom(n_voxels=1).isel({"voxel": 0})
        ds = da.xmr.fit_amares(pk_file)
        assert ds["amplitude"].dims == ("Metabolite",)
        assert ds["raw_data"].dims == (DIMS.time,)

    def test_missing_dim_raises(self, pk_file):
        da = make_phantom().rename({"time": "zeit"})
        with pytest.raises(ValueError, match="missing"):
            da.xmr.fit_amares(pk_file)

    def test_missing_mhz_raises(self, pk_file):
        da = make_phantom()
        da.attrs.pop("MHz")
        with pytest.raises(ValueError, match="MHz"):
            da.xmr.fit_amares(pk_file)


class TestFitParity1e6:
    """BASELINE claim: fitted parameters <= 1e-6 relative vs the reference
    optimizer family, on a well-conditioned problem in float64."""

    def test_float64_parameter_parity(self, tmp_path):
        from scipy.optimize import least_squares

        from xmris_tpu.fitting.lm import (
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_planar,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        # fixed g removes the flat Voigt direction; high SNR conditions it
        pk_path = tmp_path / "pk.csv"
        pk_path.write_text(
            'Index,PCr,ATP\n'
            'Initial Values,,\n'
            'amplitude,10.0,5.0\n'
            'chemicalshift,0.0,-7.5\n'
            'linewidth,15.0,20.0\n'
            'phase,0,0\n'
            'g,0,0\n'
            'Bounds,,\n'
            'amplitude,"(0, ","(0, "\n'
            'chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"\n'
            'linewidth,"(5.0, 30.0)","(10.0, 40.0)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            'g,fixed,fixed\n'
        )
        pk = load_prior_knowledge(pk_path)

        mhz, sw, n = 120.0, 10000.0, 1024
        t = np.arange(n) / sw
        rng = np.random.default_rng(3)
        y = (
            23.0 * np.exp((-16.0 * np.pi + 1j * 0.15) * t)
            + 6.0 * np.exp((-22.0 * np.pi + 1j * 2 * np.pi * (-7.5 * mhz)) * t)
        )
        y = y + (rng.normal(0, 0.01, n) + 1j * rng.normal(0, 0.01, n))

        import jax.numpy as jnp

        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        res = lm_fit_batched_planar(
            jnp.asarray(y.real[None, :]),  # float64 under the test config
            jnp.asarray(y.imag[None, :]),
            jnp.asarray(t),
            u0,
            jnp.asarray(pk.lower),
            jnp.asarray(pk.upper),
            jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap),
            mhz,
            max_iter=200,
            ftol=1e-14,
        )
        ours = np.asarray(res.x_free)[0]
        assert res.x_free.dtype == np.float64

        def resid(th):
            m = np.zeros_like(y)
            for i in range(2):
                a, cs, lw, ph = th[4 * i : 4 * i + 4]
                m = m + (
                    a
                    * np.exp(1j * np.deg2rad(ph))
                    * np.exp(-np.pi * lw * t)
                    * np.exp(1j * 2 * np.pi * cs * mhz * t)
                )
            r = y - m
            return np.concatenate([r.real, r.imag])

        sol = least_squares(
            resid,
            [10, 0, 15, 0, 5, -7.5, 20, 0],
            bounds=(
                [0, -0.5, 5, -180, 0, -8, 10, -180],
                [np.inf, 0.5, 30, 180, np.inf, -7, 40, 180],
            ),
            xtol=1e-15, ftol=1e-15, gtol=1e-15,
        )
        # free-param layout matches [amp, cs, lw, ph] x 2 (g fixed)
        for i, ref_val in enumerate(sol.x):
            # near-zero parameters (true phase = 0 here, fitted ~0.01 deg)
            # compare on a fraction of their natural scale, not on their own
            # vanishing magnitude
            scale = max(abs(ref_val), 0.1)
            assert abs(ours[i] - ref_val) / scale < 1e-6, (
                f"param {pk.free_labels[i]}: {ours[i]} vs {ref_val}"
            )


class TestLinearSeed:
    """Linear LS amplitude/phase seeding at the template optimum."""

    def test_seed_recovers_known_amplitudes(self, pk_file):
        from xmris_tpu.fitting.amares import (
            _linear_amp_phase_seed,
            template_seeded_x0,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        pk = load_prior_knowledge(pk_file)
        da = make_phantom(n_voxels=4, n_points=1024, noise=0.1)
        fids = np.asarray(
            da.transpose("voxel", DIMS.time).values
        ).astype(np.complex64)
        import jax.numpy as jnp

        t = jnp.asarray((np.arange(1024) / 10000.0).astype(np.float32))
        # template = true parameters: seed should nail amplitudes
        # free-slot order: amp, cs, lw, phase, g per peak
        x_t = np.array([10.0, 0.0, 15.0, 0.0, 0.0, 5.0, -7.5, 20.0, 0.0, 0.0],
                       dtype=np.float64)[: pk.n_free]
        amp, ph = _linear_amp_phase_seed(fids, x_t, pk, t, 120.0)
        np.testing.assert_allclose(
            amp[:, 0], [10.0, 20.0, 30.0, 40.0], rtol=0.02
        )
        np.testing.assert_allclose(amp[:, 1], [5.0] * 4, rtol=0.1)
        assert np.all(np.abs(ph) < 5.0)  # phantom is zero-phase

        # integrated: template_seeded_x0 seeds per-voxel amplitudes
        x0 = template_seeded_x0(fids, pk, t, 120.0)
        amp_slot = int(pk.pmap.idx[0])
        np.testing.assert_allclose(
            x0[:, amp_slot], [10.0, 20.0, 30.0, 40.0], rtol=0.1
        )

    def test_fit_accuracy_unchanged_with_seed(self, pk_file):
        """fit_amares with the linear seed still recovers ground truth."""
        da = make_phantom(n_voxels=3, n_points=512)
        ds = da.xmr.fit_amares(pk_file, engine="xla", max_iter=40)
        pcr = ds["amplitude"].sel({"Metabolite": "PCr"}).values
        np.testing.assert_allclose(pcr, [10.0, 20.0, 30.0], rtol=0.1)
        assert ds["fit_converged"].values.all()

    def test_wrap_phase_window(self):
        """Seeded phases wrap into the prior's 360-degree window instead of
        clipping at a bound edge ~360 degrees from the optimum."""
        import jax.numpy as jnp

        from xmris_tpu.fitting.amares import (
            _wrap_phase_window,
            _wrap_phase_window_jax,
        )

        vals = np.array([-90.0, 10.0, 350.0, 365.0, -170.0])
        # (0, 360) window: principal-branch negatives map to +270 etc.
        out = _wrap_phase_window(vals, 0.0, 360.0)
        np.testing.assert_allclose(out, [270.0, 10.0, 350.0, 5.0, 190.0])
        # (-180, 180) window: already-principal values unchanged, others wrap
        out = _wrap_phase_window(vals, -180.0, 180.0)
        np.testing.assert_allclose(out, [-90.0, 10.0, -10.0, 5.0, -170.0])
        # unbounded: untouched
        np.testing.assert_array_equal(
            _wrap_phase_window(vals, -np.inf, np.inf), vals
        )
        # half-bounded "(0, ": wrap up into [lo, lo+360)
        out = _wrap_phase_window(vals, 0.0, np.inf)
        np.testing.assert_allclose(out, [270.0, 10.0, 350.0, 5.0, 190.0])
        assert np.all(out >= 0.0)
        # half-bounded ", 0)": wrap down into (hi-360, hi]
        out = _wrap_phase_window(vals, -np.inf, 0.0)
        np.testing.assert_allclose(out, [-90.0, -350.0, -10.0, -355.0, -170.0])
        assert np.all(out <= 0.0)
        # traced variants agree on the half-bounded windows too
        for lo, hi in ((0.0, np.inf), (-np.inf, 0.0)):
            np.testing.assert_allclose(
                np.asarray(_wrap_phase_window_jax(jnp.asarray(vals), lo, hi)),
                _wrap_phase_window(vals, lo, hi),
                atol=1e-5,
            )
        # traced variant agrees with the host variant
        np.testing.assert_allclose(
            np.asarray(_wrap_phase_window_jax(jnp.asarray(vals), 0.0, 360.0)),
            _wrap_phase_window(vals, 0.0, 360.0),
            atol=1e-5,
        )

    def test_seed_wraps_phase_into_positive_window(self, tmp_path):
        """A (0, 360) phase prior with the LS optimum at 270 degrees seeds
        ~270, not the clipped lower edge (arctan2 returns -90)."""
        import jax.numpy as jnp

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.prior import load_prior_knowledge

        csv = PK_CSV.replace(
            '"(-180, 180)","(-180, 180)"', '"(0, 360)","(0, 360)"'
        ).replace("phase,0,0", "phase,180,180")
        p = tmp_path / "pk360.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)

        sw, mhz, n = 10000.0, 120.0, 512
        t = np.arange(n) / sw
        phi = np.deg2rad(270.0)
        data = np.zeros((3, n), complex)
        for v in range(3):
            amp = 10.0 * (v + 1)
            data[v] = amp * np.exp(-15.0 * np.pi * t) * np.exp(1j * phi)
            data[v] += 5.0 * np.exp(-20.0 * np.pi * t) * np.exp(
                1j * (2 * np.pi * (-7.5 * mhz) * t + phi)
            )
        fids = data.astype(np.complex64)
        x0 = template_seeded_x0(
            fids, pk, jnp.asarray(t.astype(np.float32)), mhz,
            fit_template=False,
        )
        ph_slot = int(pk.pmap.idx[3])  # PCr phase free slot
        np.testing.assert_allclose(x0[:, ph_slot], 270.0, atol=2.0)

    def test_device_fid_planes_interleaved_matches_fallback(self):
        """complex64 grids upload as ONE interleaved transfer; the split
        planes must be bit-identical to the host-deinterleave fallback."""
        from xmris_tpu.fitting.amares import _device_fid_planes

        rng = np.random.default_rng(7)
        fids = (
            rng.standard_normal((5, 64)) + 1j * rng.standard_normal((5, 64))
        ).astype(np.complex64)
        re_i, im_i = _device_fid_planes(fids)
        assert re_i.dtype == np.float32 and im_i.dtype == np.float32
        np.testing.assert_array_equal(np.asarray(re_i), fids.real)
        np.testing.assert_array_equal(np.asarray(im_i), fids.imag)
        # non-contiguous views take the same path safely
        re_s, im_s = _device_fid_planes(fids[::2])
        np.testing.assert_array_equal(np.asarray(re_s), fids[::2].real)
        np.testing.assert_array_equal(np.asarray(im_s), fids[::2].imag)
        # other dtypes fall back to host plane copies (preserving f64)
        re_d, im_d = _device_fid_planes(fids.astype(np.complex128))
        np.testing.assert_allclose(np.asarray(re_d), fids.real, atol=0)
        np.testing.assert_allclose(np.asarray(im_d), fids.imag, atol=0)

    def test_device_fid_planes_surfaces_transfer_errors(self, monkeypatch):
        """An async transfer/split error must RAISE out of staging, not be
        swallowed by the staging-buffer cleanup guard — the serve loader's
        staging-failed fallback only fires on a raised exception."""
        import jax

        from xmris_tpu.fitting import amares

        def boom(_):
            raise RuntimeError("transfer failed")

        monkeypatch.setattr(jax, "block_until_ready", boom)
        fids = np.ones((2, 8), dtype=np.complex64)
        with pytest.raises(RuntimeError, match="transfer failed"):
            amares._device_fid_planes(fids)
