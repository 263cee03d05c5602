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
