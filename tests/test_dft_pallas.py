"""Fused spectral Pallas kernel tests (interpret mode on CPU).

Pins ``spectrum_pallas`` — window + zero-fill + ortho DFT + fftshift in one
VMEM-resident kernel — against the numpy reference the labeled ops follow
(``/root/reference/src/xmris/processing/fourier.py:117-173``, ``fid.py:9-42``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas


def host_oracle(xr, xi, n_out, window=None, shifted=True):
    x = xr.astype(np.float64) + 1j * xi.astype(np.float64)
    if window is not None:
        x = x * window.astype(np.float64)
    spec = np.fft.fft(x, n=n_out, axis=-1, norm="ortho")
    if shifted:
        spec = np.fft.fftshift(spec, axes=-1)
    return spec


class TestSpectrumPallas:
    @pytest.mark.parametrize("s2", ["loop", "stacked", "stacked2"])
    @pytest.mark.parametrize(
        "n_in,n_out,shifted", [(1024, 2048, True), (512, 512, False),
                               (256, 1024, True)]
    )
    def test_matches_numpy(self, n_in, n_out, shifted, s2):
        rng = np.random.default_rng(n_in)
        b = 5
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        sr, si = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, shifted=shifted,
            v_tile=2, interpret=True, s2=s2,
        )
        ref = host_oracle(xr, xi, n_out, shifted=shifted)
        got = np.asarray(sr) + 1j * np.asarray(si)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 2e-6, err

    @pytest.mark.parametrize("s2", ["loop", "stacked2"])
    @pytest.mark.parametrize("n2", [16, 32, 64])
    def test_pre_relayout_and_n2(self, s2, n2):
        """The XLA-prebuilt stage-1 panel path and non-default Cooley-Tukey
        splits match the oracle (window folded either way)."""
        rng = np.random.default_rng(n2)
        b, n_in, n_out = 5, 1024, 2048
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        w = np.exp(-np.arange(n_in) / 300.0).astype(np.float32)
        sr, si = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, window=jnp.asarray(w),
            n2=n2, v_tile=2, interpret=True, s2=s2, pre_relayout=True,
        )
        ref = host_oracle(xr, xi, n_out, window=w)
        got = np.asarray(sr) + 1j * np.asarray(si)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 2e-6, err
        # and without pre_relayout at the same split
        sr2, si2 = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, window=jnp.asarray(w),
            n2=n2, v_tile=2, interpret=True, s2=s2,
        )
        got2 = np.asarray(sr2) + 1j * np.asarray(si2)
        err2 = np.max(np.abs(got2 - ref)) / np.max(np.abs(ref))
        assert err2 < 2e-6, err2

    def test_window_fused(self):
        rng = np.random.default_rng(1)
        b, n_in, n_out = 3, 1024, 2048
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        w = np.exp(-np.arange(n_in) / 200.0).astype(np.float32)
        sr, si = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out,
            window=jnp.asarray(w), v_tile=4, interpret=True,
        )
        ref = host_oracle(xr, xi, n_out, window=w)
        got = np.asarray(sr) + 1j * np.asarray(si)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 2e-6, err

    def test_nd_batch_and_padding(self):
        """N-D batch shapes round-trip; batch padding never leaks."""
        rng = np.random.default_rng(2)
        xr = rng.normal(size=(3, 5, 256)).astype(np.float32)
        xi = rng.normal(size=(3, 5, 256)).astype(np.float32)
        sr, si = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), 512, v_tile=8, interpret=True
        )
        assert sr.shape == (3, 5, 512)
        ref = host_oracle(xr.reshape(15, 256), xi.reshape(15, 256), 512)
        got = (np.asarray(sr) + 1j * np.asarray(si)).reshape(15, 512)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 2e-6, err


class TestSpectrumPallasGuards:
    def test_rejects_truncation(self):
        """n_out < n_in would alias the folded sequence, not truncate."""
        xr = jnp.zeros((2, 512), jnp.float32)
        with pytest.raises(ValueError, match="zero-fills"):
            spectrum_pallas(xr, xr, 256, v_tile=2, interpret=True)

    def test_rejects_odd_n2_shift(self):
        """fftshift folds into the k2 digit only for even n2."""
        xr = jnp.zeros((2, 36), jnp.float32)
        with pytest.raises(ValueError, match="even n2"):
            spectrum_pallas(
                xr, xr, 36, n2=9, shifted=True, v_tile=2, interpret=True
            )
        # unshifted odd n2 is fine
        sr, si = spectrum_pallas(
            xr, xr, 36, n2=9, shifted=False, v_tile=2, interpret=True
        )
        assert sr.shape == (2, 36)


class TestPipelinePallasVariant:
    def test_pipeline_matches_einsum_variant(self):
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        rng = np.random.default_rng(3)
        n_vox, n_time, zf = 6, 128, 256
        re = rng.normal(size=(n_vox, n_time)).astype(np.float32)
        im = rng.normal(size=(n_vox, n_time)).astype(np.float32)
        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full).astype(np.float32)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=1 / 4000.0)).astype(
            np.float32
        )

        base = PipelineConfig(zero_fill_to=zf, lb=5.0, autophase="single")
        pallas = PipelineConfig(
            zero_fill_to=zf, lb=5.0, autophase="single", dft_variant="pallas"
        )
        a = spectral_pipeline_planar_raw(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
            jnp.asarray(freqs), base,
        )
        b = spectral_pipeline_planar_raw(
            jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
            jnp.asarray(freqs), pallas,
        )
        scale = float(np.max(np.abs(np.asarray(a[0]))))
        np.testing.assert_allclose(
            np.asarray(b[0]), np.asarray(a[0]), atol=3e-6 * scale
        )
        np.testing.assert_allclose(
            np.asarray(b[1]), np.asarray(a[1]), atol=3e-6 * scale
        )
        # identical autophase solution (same objective, same seed)
        np.testing.assert_allclose(
            float(b[2][0]), float(a[2][0]), atol=0.5
        )


class TestInKernelMaxMag:
    def test_maxmag_matches_xla_argmax(self):
        """with_maxmag returns each voxel's peak |spectrum|^2 + frequency
        index, equal to the XLA magnitude+argmax over the same output."""
        rng = np.random.default_rng(9)
        b, n_in, n_out = 7, 1024, 2048
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        w = np.exp(-np.arange(n_in) / 250.0).astype(np.float32)
        sr, si, mv, mi = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, window=jnp.asarray(w),
            v_tile=4, interpret=True, with_maxmag=True,
        )
        m2 = np.asarray(sr) ** 2 + np.asarray(si) ** 2
        np.testing.assert_allclose(
            np.asarray(mv), m2.max(axis=1), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(mi), m2.argmax(axis=1)
        )

    def test_maxmag_rejects_stacked(self):
        xr = jnp.zeros((4, 64), jnp.float32)
        with pytest.raises(ValueError, match="with_maxmag"):
            spectrum_pallas(
                xr, xr, 128, v_tile=2, interpret=True, s2="stacked",
                with_maxmag=True,
            )


class TestStackedOut:
    def test_stacked_out_is_reshape_of_flat(self):
        """stacked_out returns batch + (n2, n1) blocks whose C-order reshape
        IS the flat spectrum (bit-identical: same kernel, no relayout)."""
        from xmris_tpu.ops.kernels.dft_pallas import stacked_spec_shape

        rng = np.random.default_rng(11)
        b, n_in, n_out = 5, 1024, 2048
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        w = np.exp(-np.arange(n_in) / 250.0).astype(np.float32)
        flat = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, window=jnp.asarray(w),
            v_tile=2, interpret=True,
        )
        stk = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, window=jnp.asarray(w),
            v_tile=2, interpret=True, stacked_out=True,
        )
        n2, n1 = stacked_spec_shape(n_in, n_out)
        assert stk[0].shape == (b, n2, n1)
        np.testing.assert_array_equal(
            np.asarray(stk[0]).reshape(b, n_out), np.asarray(flat[0])
        )
        np.testing.assert_array_equal(
            np.asarray(stk[1]).reshape(b, n_out), np.asarray(flat[1])
        )

    def test_stacked_out_with_maxmag(self):
        """The in-kernel peak extras compose with the stacked return."""
        rng = np.random.default_rng(12)
        b, n_in, n_out = 3, 256, 512
        xr = rng.normal(size=(b, n_in)).astype(np.float32)
        xi = rng.normal(size=(b, n_in)).astype(np.float32)
        sr, si, mv, mi = spectrum_pallas(
            jnp.asarray(xr), jnp.asarray(xi), n_out, v_tile=4,
            interpret=True, with_maxmag=True, stacked_out=True,
        )
        m2 = (np.asarray(sr) ** 2 + np.asarray(si) ** 2).reshape(b, n_out)
        np.testing.assert_allclose(np.asarray(mv), m2.max(axis=1), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(mi), m2.argmax(axis=1))

    def test_stacked_out_rejects_stacked_s2(self):
        xr = jnp.zeros((4, 64), jnp.float32)
        with pytest.raises(ValueError, match="stacked_out"):
            spectrum_pallas(
                xr, xr, 128, v_tile=2, interpret=True, s2="stacked",
                stacked_out=True,
            )

    def test_pipeline_stacked_layout_parity(self):
        """spec_layout='stacked' matches the flat pallas pipeline exactly
        (same kernel output, same autophase solution) after a host reshape."""
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        rng = np.random.default_rng(13)
        n_vox, n_time, zf = 6, 128, 256
        re = rng.normal(size=(n_vox, n_time)).astype(np.float32)
        im = rng.normal(size=(n_vox, n_time)).astype(np.float32)
        t_full = np.arange(zf) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t_full).astype(np.float32)
        freqs = np.fft.fftshift(np.fft.fftfreq(zf, d=1 / 4000.0)).astype(
            np.float32
        )

        for autophase in ("single", "none"):
            flat_cfg = PipelineConfig(
                zero_fill_to=zf, lb=5.0, autophase=autophase,
                dft_variant="pallas",
            )
            stk_cfg = PipelineConfig(
                zero_fill_to=zf, lb=5.0, autophase=autophase,
                dft_variant="pallas", spec_layout="stacked",
            )
            a = spectral_pipeline_planar_raw(
                jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
                jnp.asarray(freqs), flat_cfg,
            )
            s = spectral_pipeline_planar_raw(
                jnp.asarray(re), jnp.asarray(im), jnp.asarray(weight),
                jnp.asarray(freqs), stk_cfg,
            )
            assert s[0].ndim == 3
            np.testing.assert_allclose(
                np.asarray(s[0]).reshape(n_vox, zf), np.asarray(a[0]),
                rtol=0, atol=1e-6 * float(np.max(np.abs(np.asarray(a[0])))),
            )
            np.testing.assert_allclose(
                np.asarray(s[1]).reshape(n_vox, zf), np.asarray(a[1]),
                rtol=0, atol=1e-6 * float(np.max(np.abs(np.asarray(a[1])))),
            )
            for k in range(3):  # identical (p0, p1, pivot)
                np.testing.assert_allclose(
                    float(s[2][k]), float(a[2][k]), atol=1e-5
                )

    def test_config_rejects_stacked_with_all(self):
        from xmris_tpu.parallel.pipeline import PipelineConfig

        with pytest.raises(ValueError, match="stacked"):
            PipelineConfig(autophase="all", spec_layout="stacked")

