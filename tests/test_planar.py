"""Planar-complex engine tests: matmul-DFT parity vs numpy FFT."""

import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.ops.kernels.dft import (
    _factorize,
    dft_planar,
    fft_ortho_planar,
    ifft_ortho_planar,
    plan_dft,
)
from xmris_tpu.parallel.pipeline import PipelineConfig, spectral_pipeline_raw
from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw


def rand_planar(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape), rng.normal(size=shape)


class TestFactorization:
    def test_balanced(self):
        assert _factorize(2048) == (64, 32)
        assert _factorize(1024) == (32, 32)
        assert _factorize(100) == (10, 10)

    def test_prime_falls_back(self):
        n1, n2 = _factorize(13)
        assert n1 * n2 == 13

    def test_plan_cached(self):
        assert plan_dft(256) is plan_dft(256)


class TestDFTParity:
    @pytest.mark.parametrize("n", [16, 100, 256, 1024, 2048, 13])
    def test_forward_matches_numpy(self, n):
        xr, xi = rand_planar((4, n), seed=n)
        outr, outi = dft_planar(jnp.asarray(xr), jnp.asarray(xi), n, ortho=True)
        expected = np.fft.fft(xr + 1j * xi, axis=-1, norm="ortho")
        np.testing.assert_allclose(np.asarray(outr), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outi), expected.imag, atol=1e-9)

    @pytest.mark.parametrize("n", [64, 1024])
    def test_inverse_matches_numpy(self, n):
        xr, xi = rand_planar((3, n), seed=n + 1)
        outr, outi = ifft_ortho_planar(jnp.asarray(xr), jnp.asarray(xi))
        expected = np.fft.ifft(xr + 1j * xi, axis=-1, norm="ortho")
        np.testing.assert_allclose(np.asarray(outr), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outi), expected.imag, atol=1e-9)

    def test_roundtrip(self):
        xr, xi = rand_planar((2, 512))
        fr, fi = fft_ortho_planar(jnp.asarray(xr), jnp.asarray(xi))
        br, bi = ifft_ortho_planar(fr, fi)
        np.testing.assert_allclose(np.asarray(br), xr, atol=1e-9)
        np.testing.assert_allclose(np.asarray(bi), xi, atol=1e-9)

    @pytest.mark.parametrize("variant", ["einsum", "flat", "block", "full"])
    @pytest.mark.parametrize("n", [16, 100, 256, 2048, 13])
    def test_variants_match_numpy(self, variant, n):
        xr, xi = rand_planar((4, n), seed=n)
        outr, outi = dft_planar(
            jnp.asarray(xr), jnp.asarray(xi), n, ortho=True, variant=variant
        )
        expected = np.fft.fft(xr + 1j * xi, axis=-1, norm="ortho")
        np.testing.assert_allclose(np.asarray(outr), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outi), expected.imag, atol=1e-9)

    @pytest.mark.parametrize("variant", ["einsum", "flat", "block", "full"])
    def test_variants_inverse(self, variant):
        n = 512
        xr, xi = rand_planar((3, n), seed=7)
        outr, outi = dft_planar(
            jnp.asarray(xr), jnp.asarray(xi), n, inverse=True, ortho=True,
            variant=variant,
        )
        expected = np.fft.ifft(xr + 1j * xi, axis=-1, norm="ortho")
        np.testing.assert_allclose(np.asarray(outr), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outi), expected.imag, atol=1e-9)

    @pytest.mark.parametrize("n_in,n_out", [(100, 256), (256, 512), (64, 64)])
    def test_rect_shifted_fused(self, n_in, n_out):
        # zero-fill + ortho DFT + fftshift as one matmul
        from xmris_tpu.ops.kernels.dft import dft_rect_shifted_planar

        xr, xi = rand_planar((3, n_in), seed=n_in)
        outr, outi = dft_rect_shifted_planar(
            jnp.asarray(xr), jnp.asarray(xi), n_out
        )
        padded = np.zeros((3, n_out), complex)
        padded[:, :n_in] = xr + 1j * xi
        expected = np.fft.fftshift(
            np.fft.fft(padded, axis=-1, norm="ortho"), axes=-1
        )
        np.testing.assert_allclose(np.asarray(outr), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outi), expected.imag, atol=1e-9)

    def test_fused_pipeline_matches_einsum_pipeline(self):
        rng = np.random.default_rng(3)
        n_vox, n_time, zf = 6, 128, 256
        re = rng.normal(size=(n_vox, n_time)).astype(np.float64)
        im = rng.normal(size=(n_vox, n_time)).astype(np.float64)
        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=1 / 4000.0))

        base = PipelineConfig(zero_fill_to=zf, lb=5.0, autophase="single")
        fused = PipelineConfig(
            zero_fill_to=zf, lb=5.0, autophase="single", dft_variant="fused"
        )
        a = spectral_pipeline_planar_raw(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
            jnp.asarray(freqs), base,
        )
        b = spectral_pipeline_planar_raw(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
            jnp.asarray(freqs), fused,
        )
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), atol=1e-9)

    def test_float32_accuracy(self):
        # The TPU path runs float32: relative accuracy should be ~1e-6
        xr, xi = rand_planar((2, 2048))
        outr, outi = dft_planar(
            jnp.asarray(xr, jnp.float32), jnp.asarray(xi, jnp.float32), 2048
        )
        expected = np.fft.fft(xr + 1j * xi, axis=-1, norm="ortho")
        scale = np.max(np.abs(expected))
        err = np.max(
            np.abs((np.asarray(outr) + 1j * np.asarray(outi)) - expected)
        )
        assert err / scale < 5e-6


class TestPlanarPipelineParity:
    def test_matches_complex_pipeline(self):
        rng = np.random.default_rng(5)
        n_vox, n_time, zf = 8, 256, 512
        t = np.arange(n_time) / 4000.0
        fids = (
            rng.uniform(1, 4, (n_vox, 1))
            * np.exp((1j * 2 * np.pi * rng.uniform(-1e3, 1e3, (n_vox, 1)) - 30) * t)
        )
        fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)

        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=t[1] - t[0]))

        cfg = PipelineConfig(zero_fill_to=zf, lb=5.0, autophase="single")
        spec_c, (p0_c, p1_c, piv_c) = spectral_pipeline_raw(
            jnp.asarray(fids), jnp.asarray(weight), jnp.asarray(freqs), cfg
        )
        re, im, (p0_p, p1_p, piv_p) = spectral_pipeline_planar_raw(
            jnp.asarray(fids.real),
            jnp.asarray(fids.imag),
            jnp.asarray(weight),
            jnp.asarray(freqs),
            cfg,
        )
        planar = np.asarray(re) + 1j * np.asarray(im)
        complexp = np.asarray(spec_c)
        # identical DE seeds and identical math => same optimum
        assert float(p0_c) == pytest.approx(float(p0_p), abs=1e-6)
        np.testing.assert_allclose(planar, complexp, atol=1e-8)

    def test_single_grid_optimizer_matches_de(self):
        """ap_optimizer='grid' on the single-mode pivot-row solve lands on
        the DE optimum (same ACME objective; far fewer sequential steps)."""
        rng = np.random.default_rng(21)
        n_vox, n_time, zf = 6, 256, 512
        t = np.arange(n_time) / 4000.0
        fids = (
            rng.uniform(1, 4, (n_vox, 1))
            * np.exp((1j * 2 * np.pi * rng.uniform(-1e3, 1e3, (n_vox, 1)) - 30) * t)
        )
        fids *= np.exp(1j * np.deg2rad(35.0))
        fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)
        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=t[1] - t[0]))

        outs = {}
        for opt in ("de", "grid"):
            cfg = PipelineConfig(
                zero_fill_to=zf, lb=5.0, autophase="single", ap_optimizer=opt
            )
            re, im, (p0, p1, piv) = spectral_pipeline_planar_raw(
                jnp.asarray(fids.real), jnp.asarray(fids.imag),
                jnp.asarray(weight), jnp.asarray(freqs), cfg,
            )
            outs[opt] = (float(p0), float(p1), float(piv))
        assert outs["grid"][2] == outs["de"][2]  # same pivot election
        assert abs(outs["grid"][0] - outs["de"][0]) < 2.0
        # p1 agrees on the ramp scale (same basin)
        assert abs(outs["grid"][1] - outs["de"][1]) < 100.0

    def test_phase_barrier_is_identity(self):
        """phase_barrier=True pins cos/sin behind an optimization_barrier
        (a TPU-fusion dedup; see r13 session) — bit-identical outputs."""
        rng = np.random.default_rng(33)
        n_vox, n_time, zf = 6, 256, 512
        t = np.arange(n_time) / 4000.0
        fids = (
            rng.uniform(1, 4, (n_vox, 1))
            * np.exp((1j * 2 * np.pi * rng.uniform(-1e3, 1e3, (n_vox, 1)) - 30) * t)
        )
        fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)
        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=t[1] - t[0]))

        outs = {}
        for barrier in (False, True):
            cfg = PipelineConfig(
                zero_fill_to=zf, lb=5.0, autophase="single",
                phase_barrier=barrier,
            )
            re, im, (p0, p1, piv) = spectral_pipeline_planar_raw(
                jnp.asarray(fids.real), jnp.asarray(fids.imag),
                jnp.asarray(weight), jnp.asarray(freqs), cfg,
            )
            outs[barrier] = (np.asarray(re), np.asarray(im), float(p0))
        assert outs[True][2] == outs[False][2]
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_array_equal(outs[True][1], outs[False][1])

    def test_no_autophase_mode(self):
        xr, xi = rand_planar((4, 128), seed=9)
        weight = np.ones(128)
        freqs = np.fft.fftshift(np.fft.fftfreq(128))
        cfg = PipelineConfig(zero_fill_to=128, lb=0.0, autophase="none")
        re, im, _ = spectral_pipeline_planar_raw(
            jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(weight), jnp.asarray(freqs), cfg
        )
        expected = np.fft.fftshift(
            np.fft.fft(xr + 1j * xi, axis=-1, norm="ortho"), axes=-1
        )
        np.testing.assert_allclose(np.asarray(re), expected.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(im), expected.imag, atol=1e-9)


class TestPlanarAutophaseAll:
    def test_matches_complex_all_mode(self):
        rng = np.random.default_rng(7)
        n_vox, n_time, zf = 4, 256, 256
        t = np.arange(n_time) / 4000.0
        fids = (
            rng.uniform(3, 8, (n_vox, 1))
            * np.exp((1j * 2 * np.pi * rng.uniform(-800, 800, (n_vox, 1)) - 25) * t)
        )
        fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)
        weight = np.ones(zf)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=t[1] - t[0]))
        cfg = PipelineConfig(
            zero_fill_to=zf, lb=0.0, autophase="all", p0_only=True, de_maxiter=100
        )
        spec_c, (p0_c, _, _) = spectral_pipeline_raw(
            jnp.asarray(fids), jnp.asarray(weight), jnp.asarray(freqs), cfg
        )
        re, im, (p0_p, _, _) = spectral_pipeline_planar_raw(
            jnp.asarray(fids.real), jnp.asarray(fids.imag),
            jnp.asarray(weight), jnp.asarray(freqs), cfg,
        )
        np.testing.assert_allclose(np.asarray(p0_p), np.asarray(p0_c), atol=0.2)
        np.testing.assert_allclose(
            np.asarray(re) + 1j * np.asarray(im), np.asarray(spec_c), atol=1e-4
        )

    def test_grid_optimizer_matches_de(self):
        """ap_optimizer='grid' lands on the DE answer (deterministic mesh +
        polish vs stochastic search), planar and complex engines agree."""
        rng = np.random.default_rng(11)
        n_vox, n_time, zf = 4, 256, 256
        t = np.arange(n_time) / 4000.0
        fids = (
            rng.uniform(3, 8, (n_vox, 1))
            * np.exp((1j * 2 * np.pi * rng.uniform(-800, 800, (n_vox, 1)) - 25) * t)
        )
        fids *= np.exp(1j * np.deg2rad(rng.uniform(-170, 170, (n_vox, 1))))
        fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)
        weight = np.ones(zf)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=t[1] - t[0]))
        cfg_g = PipelineConfig(
            zero_fill_to=zf, lb=0.0, autophase="all", p0_only=True,
            ap_optimizer="grid",
        )
        cfg_d = PipelineConfig(
            zero_fill_to=zf, lb=0.0, autophase="all", p0_only=True,
            de_maxiter=100,
        )
        re_g, im_g, (p0_g, _, _) = spectral_pipeline_planar_raw(
            jnp.asarray(fids.real), jnp.asarray(fids.imag),
            jnp.asarray(weight), jnp.asarray(freqs), cfg_g,
        )
        spec_cg, (p0_cg, _, _) = spectral_pipeline_raw(
            jnp.asarray(fids), jnp.asarray(weight), jnp.asarray(freqs), cfg_g
        )
        _, _, (p0_d, _, _) = spectral_pipeline_planar_raw(
            jnp.asarray(fids.real), jnp.asarray(fids.imag),
            jnp.asarray(weight), jnp.asarray(freqs), cfg_d,
        )
        # The ACME landscape is flat near its optimum: independent
        # optimizers settle within ~2 degrees (phased spectra agree to
        # ~1e-3 relative there).
        np.testing.assert_allclose(np.asarray(p0_g), np.asarray(p0_d), atol=2.0)
        np.testing.assert_allclose(np.asarray(p0_g), np.asarray(p0_cg), atol=0.1)
        np.testing.assert_allclose(
            np.asarray(re_g) + 1j * np.asarray(im_g), np.asarray(spec_cg),
            atol=1e-4,
        )
        # second-order polish (ap_polish="bfgs") lands in the same optimum
        cfg_b = PipelineConfig(
            zero_fill_to=zf, lb=0.0, autophase="all", p0_only=True,
            ap_optimizer="grid", ap_polish="bfgs",
        )
        _, _, (p0_b, _, _) = spectral_pipeline_planar_raw(
            jnp.asarray(fids.real), jnp.asarray(fids.imag),
            jnp.asarray(weight), jnp.asarray(freqs), cfg_b,
        )
        # same flat ACME basin as the other optimizers (~2 degree spread)
        np.testing.assert_allclose(np.asarray(p0_b), np.asarray(p0_g), atol=2.0)

    def test_pipeline_config_rejects_bad_ap_polish(self):
        with pytest.raises(ValueError, match="ap_polish"):
            PipelineConfig(ap_polish="adam")
