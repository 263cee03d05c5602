"""Cartesian k-space reconstruction tests (BASELINE config 3)."""

import numpy as np
import pytest

from xmris_tpu import DIMS, XmrArray
from xmris_tpu.recon import kspace_to_image, rss_combine, rss_reconstruct
from xmris_tpu.recon.kspace import rss_reconstruct_raw


def make_kspace(n=64, n_coils=4, seed=5):
    """Synthetic multi-coil Cartesian k-space of a known phantom image."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    phantom = ((xx - n / 2) ** 2 + (yy - n / 2) ** 2 < (n / 4) ** 2).astype(float)
    phantom = phantom + 0.3 * ((np.abs(xx - n / 4) < 3) & (np.abs(yy - n / 4) < 5))

    # smooth complex coil sensitivities
    coils = []
    for c in range(n_coils):
        cx, cy = rng.uniform(0, n, 2)
        sens = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (n * 0.8) ** 2)))
        sens = sens * np.exp(1j * rng.uniform(0, 2 * np.pi))
        coils.append(sens)
    sens = np.stack(coils)  # (coil, y, x)

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
        attrs={"scan": "phantom"},
    )
    rss_truth = np.sqrt(np.sum(np.abs(sens * phantom[None]) ** 2, axis=0))
    return da, phantom, rss_truth


class TestKspaceToImage:
    def test_roundtrip_dims(self):
        da, _, _ = make_kspace()
        img = kspace_to_image(da)
        assert img.dims == (DIMS.coil, DIMS.y, DIMS.x)

    def test_recovers_coil_images(self):
        da, phantom, _ = make_kspace(n_coils=1)
        img = kspace_to_image(da)
        # single unit-phase-free coil: |image| ~ sens * phantom
        assert np.corrcoef(
            np.abs(img.values[0]).ravel(), phantom.ravel()
        )[0, 1] > 0.99

    def test_requires_kspace_dims(self):
        da = XmrArray(np.zeros((4, 4), complex), dims=("a", "b"))
        with pytest.raises(ValueError, match="k-space"):
            kspace_to_image(da)

    def test_explicit_dims(self):
        da = XmrArray(np.random.default_rng(0).normal(size=(8, 8)) + 0j, dims=("a", "b"))
        img = kspace_to_image(da, dims=["a"], out_dims=["a_img"])
        assert img.dims == ("a_img", "b")


class TestRSS:
    def test_rss_combine_formula(self):
        da, _, _ = make_kspace()
        img = kspace_to_image(da)
        rss = rss_combine(img)
        expected = np.sqrt(np.sum(np.abs(img.values) ** 2, axis=0))
        np.testing.assert_allclose(rss.values, expected, rtol=1e-10)
        assert rss.dims == (DIMS.y, DIMS.x)
        assert rss.attrs["coil_combine"] == "rss"

    def test_full_recon_matches_truth(self):
        da, _, rss_truth = make_kspace(n=64, n_coils=4)
        out = rss_reconstruct(da)
        np.testing.assert_allclose(out.values, rss_truth, atol=1e-8)

    def test_raw_matches_labeled(self):
        da, _, _ = make_kspace(n=32, n_coils=8)
        out_labeled = rss_reconstruct(da)
        out_raw = rss_reconstruct_raw(
            np.asarray(da.values), axes=(1, 2), coil_axis=0
        )
        np.testing.assert_allclose(
            np.asarray(out_raw), out_labeled.values, rtol=1e-8, atol=1e-10
        )


class TestPlanarRecon:
    def test_planar_matches_complex(self):
        from xmris_tpu.recon.kspace import rss_reconstruct_planar_raw

        da, _, _ = make_kspace(n=32, n_coils=4)
        k = np.asarray(da.values)
        ref = np.asarray(rss_reconstruct_raw(k, axes=(1, 2), coil_axis=0))
        planar = np.asarray(
            rss_reconstruct_planar_raw(
                np.ascontiguousarray(k.real),
                np.ascontiguousarray(k.imag),
                axes=(1, 2),
                coil_axis=0,
            )
        )
        np.testing.assert_allclose(planar, ref, rtol=1e-8, atol=1e-10)


def make_kspace_with_sens(n=64, n_coils=4, seed=5, noise=0.0):
    """Like make_kspace but also returns the true sensitivities."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    phantom = ((xx - n / 2) ** 2 + (yy - n / 2) ** 2 < (n / 4) ** 2).astype(float)
    phantom = phantom + 0.3 * ((np.abs(xx - n / 4) < 3) & (np.abs(yy - n / 4) < 5))

    coils = []
    for _ in range(n_coils):
        cx, cy = rng.uniform(0, n, 2)
        sens = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (n * 0.8) ** 2)))
        sens = sens * np.exp(1j * rng.uniform(0, 2 * np.pi))
        coils.append(sens)
    sens = np.stack(coils)

    imgs = sens * phantom[None]
    ksp = np.fft.fftshift(
        np.fft.fftn(np.fft.ifftshift(imgs, axes=(1, 2)), axes=(1, 2), norm="ortho"),
        axes=(1, 2),
    )
    if noise:
        ksp = ksp + noise * (
            rng.normal(size=ksp.shape) + 1j * rng.normal(size=ksp.shape)
        )
    da = XmrArray(
        ksp,
        dims=(DIMS.coil, DIMS.ky, DIMS.kx),
        coords={
            DIMS.ky: np.fft.fftshift(np.fft.fftfreq(n)),
            DIMS.kx: np.fft.fftshift(np.fft.fftfreq(n)),
        },
        attrs={"scan": "phantom"},
    )
    return da, phantom, sens


class TestSensitivityEstimation:
    def test_maps_match_truth_inside_object(self):
        from xmris_tpu.recon import estimate_sensitivities

        da, phantom, sens = make_kspace_with_sens(n=64, n_coils=4)
        est = estimate_sensitivities(da, calib_frac=0.4)
        assert est.dims == da.dims
        assert est.attrs["sensitivity_calib_frac"] == 0.4

        truth = sens / np.sqrt(np.sum(np.abs(sens) ** 2, axis=0, keepdims=True))
        # compare where the phantom has signal, away from edges
        mask = phantom > 0.5
        yy, xx = np.mgrid[0 : phantom.shape[0], 0 : phantom.shape[1]]
        n = phantom.shape[0]
        interior = mask & (np.abs(xx - n / 2) ** 2 + (yy - n / 2) ** 2 < (n / 5) ** 2)
        err = np.abs(est.values - truth)[:, interior]
        assert err.mean() < 0.05

    def test_planar_matches_complex(self):
        from xmris_tpu.recon.sense import (
            estimate_sensitivities_planar_raw,
            estimate_sensitivities_raw,
        )

        da, _, _ = make_kspace_with_sens(n=32, n_coils=3)
        k = np.asarray(da.values)
        ref = np.asarray(
            estimate_sensitivities_raw(k, axes=(1, 2), coil_axis=0, calib_frac=0.3)
        )
        s_re, s_im = estimate_sensitivities_planar_raw(
            np.ascontiguousarray(k.real),
            np.ascontiguousarray(k.imag),
            axes=(1, 2), coil_axis=0, calib_frac=0.3,
        )
        np.testing.assert_allclose(np.asarray(s_re), ref.real, atol=1e-8)
        np.testing.assert_allclose(np.asarray(s_im), ref.imag, atol=1e-8)


class TestSenseCombine:
    def test_exact_recovery_with_true_maps(self):
        from xmris_tpu.recon import sense_combine
        from xmris_tpu.recon.kspace import kspace_to_image

        da, phantom, sens = make_kspace_with_sens(n=64, n_coils=4)
        img = kspace_to_image(da)
        sens_da = XmrArray(sens, dims=img.dims)
        out = sense_combine(img, sens_da)
        # I = S * p  =>  sum conj(S) I / sum |S|^2 == p exactly
        np.testing.assert_allclose(out.values.real, phantom, atol=1e-8)
        np.testing.assert_allclose(out.values.imag, 0.0, atol=1e-8)
        assert out.attrs["coil_combine"] == "sense"
        assert DIMS.coil not in out.dims

    def test_planar_matches_complex(self):
        from xmris_tpu.recon.sense import (
            sense_combine_planar_raw,
            sense_combine_raw,
        )

        rng = np.random.default_rng(0)
        img = rng.normal(size=(3, 16, 16)) + 1j * rng.normal(size=(3, 16, 16))
        sens = rng.normal(size=(3, 16, 16)) + 1j * rng.normal(size=(3, 16, 16))
        ref = np.asarray(sense_combine_raw(img, sens, 0))
        o_re, o_im = sense_combine_planar_raw(
            np.ascontiguousarray(img.real), np.ascontiguousarray(img.imag),
            np.ascontiguousarray(sens.real), np.ascontiguousarray(sens.imag), 0,
        )
        np.testing.assert_allclose(np.asarray(o_re), ref.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(o_im), ref.imag, atol=1e-10)

    def test_full_sense_reconstruct(self):
        from xmris_tpu.recon import sense_reconstruct

        da, phantom, sens = make_kspace_with_sens(n=64, n_coils=4)
        out = sense_reconstruct(da, calib_frac=0.4)
        # with estimated unit-RSS maps, |x| ~= phantom * RSS(sens)
        expected = phantom * np.sqrt(np.sum(np.abs(sens) ** 2, axis=0))
        mask = phantom > 0.5
        rel = np.abs(np.abs(out.values) - expected)[mask] / expected[mask].max()
        assert rel.mean() < 0.05

    def test_noise_bias_beats_rss(self):
        """In empty background, RSS has a positive noise floor; the matched
        filter does not amplify it — SENSE background < RSS background."""
        from xmris_tpu.recon import rss_reconstruct, sense_reconstruct

        da, phantom, _ = make_kspace_with_sens(n=64, n_coils=8, noise=0.02)
        rss = rss_reconstruct(da)
        sense = sense_reconstruct(da, calib_frac=0.4)
        background = phantom == 0
        assert (
            np.abs(sense.values[background]).mean()
            < 0.8 * np.abs(rss.values[background]).mean()
        )


class TestAdaptiveCombine:
    def test_magnitude_matches_rss_in_object(self):
        from xmris_tpu.recon.kspace import kspace_to_image
        from xmris_tpu.recon.sense import adaptive_combine_planar_raw

        da, phantom, sens = make_kspace_with_sens(n=48, n_coils=4)
        img = np.asarray(kspace_to_image(da).values)
        o_re, o_im = adaptive_combine_planar_raw(
            np.ascontiguousarray(img.real),
            np.ascontiguousarray(img.imag),
            coil_axis=0,
        )
        mag = np.sqrt(np.asarray(o_re) ** 2 + np.asarray(o_im) ** 2)
        rss = np.sqrt(np.sum(np.abs(img) ** 2, axis=0))
        mask = phantom > 0.5
        np.testing.assert_allclose(mag[mask], rss[mask], rtol=0.02)

    def test_phase_is_smooth(self):
        from xmris_tpu.recon.kspace import kspace_to_image
        from xmris_tpu.recon.sense import adaptive_combine_planar_raw

        da, phantom, _ = make_kspace_with_sens(n=48, n_coils=4)
        img = np.asarray(kspace_to_image(da).values)
        o_re, o_im = adaptive_combine_planar_raw(
            np.ascontiguousarray(img.real),
            np.ascontiguousarray(img.imag),
            coil_axis=0,
        )
        phase = np.angle(np.asarray(o_re) + 1j * np.asarray(o_im))
        mask = phantom > 0.5
        # within the object, adjacent-pixel phase jumps stay small
        dphase = np.abs(np.diff(np.unwrap(phase[mask])))
        assert np.median(dphase) < 0.1
