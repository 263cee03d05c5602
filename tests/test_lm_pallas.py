"""Pallas LM kernel tests (interpret mode on CPU; exact math parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.fitting.lm import (
    eq6_basis_planar,
    eq6_jacobian_planar,
    external_to_internal,
    hashable_pmap,
    lm_fit_batched_pallas,
    lm_fit_batched_planar,
)
from xmris_tpu.fitting.prior import load_prior_knowledge
from xmris_tpu.ops.kernels.lm_pallas import (
    eq6_normal_equations_pallas,
    eq6_normal_equations_pallas_v2,
    eq6_normal_equations_pallas_v3,
)

KERNELS = {
    1: eq6_normal_equations_pallas,
    2: eq6_normal_equations_pallas_v2,
    3: eq6_normal_equations_pallas_v3,
}

MHZ = 120.0


def sane_grids(b, k, seed=0):
    rng = np.random.default_rng(seed)
    cols = []
    for _ in range(b):
        peaks = []
        for _ in range(k):
            peaks.extend(
                [
                    rng.uniform(1, 30),
                    rng.uniform(-8, 1),
                    rng.uniform(5, 40),
                    rng.uniform(-90, 90),
                    rng.uniform(0, 1),
                ]
            )
        cols.append(peaks)
    return np.asarray(cols, dtype=np.float32)


class TestNormalEquationsKernel:
    @pytest.mark.parametrize("version", [1, 2, 3])
    @pytest.mark.parametrize("n_t,k", [(256, 2), (512, 3)])
    def test_matches_xla_reference(self, n_t, k, version):
        b = 5
        rng = np.random.default_rng(n_t)
        grids = sane_grids(b, k, seed=n_t)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        cost, g, h = KERNELS[version](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )

        tj = jnp.asarray(t)
        for i in range(b):
            grid = jnp.asarray(grids[i].reshape(k, 5))
            m_re, m_im, b_re, b_im = eq6_basis_planar(tj, grid, MHZ)
            jre = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[0].reshape(n_t, -1)
            jim = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[1].reshape(n_t, -1)
            rre = yre[i] - np.asarray(m_re)
            rim = yim[i] - np.asarray(m_im)
            c_ref = float(np.sum(rre**2 + rim**2))
            g_ref = np.asarray(jre).T @ rre + np.asarray(jim).T @ rim
            h_ref = (
                np.asarray(jre).T @ np.asarray(jre)
                + np.asarray(jim).T @ np.asarray(jim)
            )
            assert float(cost[i]) == pytest.approx(c_ref, rel=1e-5)
            np.testing.assert_allclose(
                np.asarray(g[i]), g_ref, rtol=1e-4, atol=1e-3 * np.abs(g_ref).max()
            )
            np.testing.assert_allclose(
                np.asarray(h[i]), h_ref, rtol=1e-4, atol=1e-3 * np.abs(h_ref).max()
            )

    def test_batch_padding(self):
        # batch not divisible by the tile: padding rows must not leak
        b, n_t, k = 3, 128, 1
        rng = np.random.default_rng(1)
        grids = sane_grids(b, k)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)
        cost, g, h = eq6_normal_equations_pallas(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        assert cost.shape == (3,)
        assert g.shape == (3, 5)
        assert h.shape == (3, 5, 5)
        assert np.isfinite(np.asarray(cost)).all()


class TestPallasLMDriver:
    def test_converges_like_xla_driver(self, tmp_path):
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom()
        fids = np.asarray(da.transpose("voxel", "time").values).astype(np.complex64)
        t = jnp.asarray((np.arange(1024) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r_xla = lm_fit_batched_planar(re, im, *args, max_iter=40)
        r_pal = lm_fit_batched_pallas(
            re, im, *args, max_iter=40, v_tile=1, interpret=True
        )
        # Same optima basin: amplitudes agree to a few percent, costs close
        np.testing.assert_allclose(
            np.asarray(r_pal.x_free[:, 0]),
            np.asarray(r_xla.x_free[:, 0]),
            rtol=0.05,
        )
        assert np.all(np.asarray(r_pal.cost) < np.asarray(r_xla.cost) * 1.1)
        assert np.asarray(r_pal.converged).all()


class TestKernelSelection:
    def test_invalid_kernel_version_raises_value_error(self):
        """Nonexistent versions (0, 4) get a descriptive ValueError, not a
        bare KeyError from the legacy-version dict lookup."""
        from xmris_tpu.fitting.lm import _select_pallas_kernel

        for bad in (0, 4):
            with pytest.raises(ValueError, match="1-3 and 5-10"):
                _select_pallas_kernel(bad, None, 256)


class TestActiveRowsKernel:
    """v5: fixed params' Jacobian rows are never computed — math identical."""

    def test_v5_matches_v3_subset(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v5,
        )

        b, n_t, k = 4, 128, 3
        grids = sane_grids(b, k, seed=4)
        rng = np.random.default_rng(4)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        # pretend g (col 4) and one phase are fixed
        active = tuple(
            j for j in range(k * 5) if j % 5 != 4 and j != 8
        )
        c3, g3, h3 = KERNELS[3](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        c5, g5, h5 = eq6_normal_equations_pallas_v5(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active, v_tile=2,
            interpret=True,
        )
        sel = list(active)
        np.testing.assert_allclose(np.asarray(c5), np.asarray(c3), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g5), np.asarray(g3)[:, sel], rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(h5), np.asarray(h3)[:, sel][:, :, sel],
            rtol=1e-5, atol=1e-3 * np.abs(np.asarray(h3)).max(),
        )

    def test_v5_driver_matches_v3(self, tmp_path):
        """Full LM with kernel_version=5 on a g-fixed prior == version 3."""
        # reuse the 5-peak fixed-g prior builder from TestLargerPriors
        mhz, sw, n = 120.0, 10000.0, 256
        shifts = [0.0, -2.4, -7.5]
        rows = ["Index," + ",".join(f"M{i}" for i in range(3)),
                "Initial Values," + "," * 2,
                "amplitude,8.0,5.0,4.0",
                "chemicalshift," + ",".join(str(s) for s in shifts),
                "linewidth,15.0,15.0,15.0",
                "phase,0,0,0",
                "g,0,0,0",
                "Bounds," + "," * 2,
                "amplitude," + ",".join('"(0, "' for _ in range(3))]
        rows.append(
            "chemicalshift,"
            + ",".join(f'"({s - 0.4}, {s + 0.4})"' for s in shifts)
        )
        rows.append("linewidth," + ",".join('"(5, 40)"' for _ in range(3)))
        rows.append("phase," + ",".join('"(-180, 180)"' for _ in range(3)))
        rows.append("g," + ",".join("fixed" for _ in range(3)))
        pk_path = tmp_path / "pk3.csv"
        pk_path.write_text("\n".join(rows) + "\n")
        pk = load_prior_knowledge(pk_path)
        assert pk.n_free == 12  # g fixed: 3 peaks x 4 free

        t_np = np.arange(n) / sw
        rng = np.random.default_rng(2)
        y = sum(
            a * np.exp((-15 * np.pi + 1j * 2 * np.pi * (s * mhz)) * t_np)
            for a, s in zip([8.0, 5.0, 4.0], shifts)
        ) + rng.normal(0, 0.05, n) + 1j * rng.normal(0, 0.05, n)
        fids = np.stack([y, 0.5 * y]).astype(np.complex64)

        t = jnp.asarray(t_np.astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), mhz,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r3 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=1, interpret=True,
            kernel_version=3,
        )
        r5 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=1, interpret=True,
            kernel_version=5,
        )
        np.testing.assert_allclose(
            np.asarray(r5.x_free), np.asarray(r3.x_free), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(r5.cost), np.asarray(r3.cost), rtol=1e-5
        )
        assert np.asarray(r5.converged).all()

        # CRLB agrees too
        from xmris_tpu.fitting.lm import crlb_batched_pallas

        sds3, s23 = crlb_batched_pallas(
            re, im, t, r3.x_free, hashable_pmap(pk.pmap), mhz,
            v_tile=1, interpret=True, kernel_version=3,
        )
        sds5, s25 = crlb_batched_pallas(
            re, im, t, r5.x_free, hashable_pmap(pk.pmap), mhz,
            v_tile=1, interpret=True, kernel_version=5,
        )
        np.testing.assert_allclose(
            np.asarray(sds5), np.asarray(sds3), rtol=1e-2
        )


class TestStackedKernel:
    """v6: stacked-voxel MXU Gram dots + converged-tile skipping."""

    def _inputs(self, b=4, n_t=128, k=3, seed=4):
        grids = sane_grids(b, k, seed=seed)
        rng = np.random.default_rng(seed)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)
        return grids, yre, yim, t

    def test_v6_matches_v3_subset(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v6,
        )

        b, n_t, k = 4, 128, 3
        grids, yre, yim, t = self._inputs(b, n_t, k)
        active = tuple(j for j in range(k * 5) if j % 5 != 4 and j != 8)

        c3, g3, h3 = KERNELS[3](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        # v_tile=2 with a_pad=16 stacks both voxels into one Gram dot
        c6, g6, h6 = eq6_normal_equations_pallas_v6(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active, v_tile=2,
            interpret=True,
        )
        sel = list(active)
        np.testing.assert_allclose(np.asarray(c6), np.asarray(c3), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g6), np.asarray(g3)[:, sel], rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(h6), np.asarray(h3)[:, sel][:, :, sel],
            rtol=1e-5, atol=1e-3 * np.abs(np.asarray(h3)).max(),
        )

    def test_v6_voxel_mask_skips_tiles(self):
        """Masked-out tiles are skipped; active tiles stay exact."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v6,
        )

        b, n_t, k = 4, 128, 2
        grids, yre, yim, t = self._inputs(b, n_t, k, seed=7)
        active = tuple(range(k * 5))

        full = eq6_normal_equations_pallas_v6(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active, v_tile=2,
            interpret=True,
        )
        # Second tile (voxels 2, 3) inactive; first tile must be untouched.
        mask = jnp.asarray([True, False, False, False])
        part = eq6_normal_equations_pallas_v6(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            voxel_mask=mask, v_tile=2, interpret=True,
        )
        for f_arr, p_arr in zip(full, part):
            np.testing.assert_allclose(
                np.asarray(p_arr)[:2], np.asarray(f_arr)[:2], rtol=1e-6
            )
        # Skipped-tile outputs are unspecified: only shape is guaranteed
        assert part[0].shape == full[0].shape

    def test_v6_driver_matches_v5(self, tmp_path):
        """Full LM with kernel_version=6 (tile skipping live in the loop)."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=4, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r5 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=5,
        )
        r6 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=6,
        )
        # The stacked dot's different accumulation blocking makes LM
        # trajectories bit-diverge; assert same-basin optima, not identical
        # paths: amplitudes (free slots 0 and 5 for the 2-peak prior) agree
        # and neither engine's final cost is worse.
        for amp_col in (0, 5):
            np.testing.assert_allclose(
                np.asarray(r6.x_free[:, amp_col]),
                np.asarray(r5.x_free[:, amp_col]),
                rtol=0.05,
            )
        assert np.all(
            np.asarray(r6.cost) < np.asarray(r5.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r6.converged).all()

        # CRLB path (all tiles active): same evaluation point, so this is a
        # pure kernel comparison
        from xmris_tpu.fitting.lm import crlb_batched_pallas

        sds5, _ = crlb_batched_pallas(
            re, im, t, r5.x_free, hashable_pmap(pk.pmap), 120.0,
            v_tile=2, interpret=True, kernel_version=5,
        )
        sds6, _ = crlb_batched_pallas(
            re, im, t, r5.x_free, hashable_pmap(pk.pmap), 120.0,
            v_tile=2, interpret=True, kernel_version=6,
        )
        # f32 accumulation-order differences in the stacked dot get
        # amplified by the inversion along near-flat directions (same 2%
        # tolerance as TestCRLBKernel)
        np.testing.assert_allclose(
            np.asarray(sds6), np.asarray(sds5), rtol=0.02
        )


class TestFactoredBasisKernel:
    """v7: block-factored transcendental basis (uniform t, n_t % 128 == 0)."""

    def test_v7_matches_v3_subset(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v7,
        )

        b, n_t, k = 4, 256, 3
        grids = sane_grids(b, k, seed=11)
        # Peak 0: pure Lorentzian (g = 0) -> fast envelope path; peaks 1-2
        # keep random g -> classic envelope with factored angles.
        grids[:, 4] = 0.0
        rng = np.random.default_rng(11)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        active = tuple(j for j in range(k * 5) if j != 4)  # g0 fixed
        env_fast = (True, False, False)
        c3, g3, h3 = KERNELS[3](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        c7, g7, h7 = eq6_normal_equations_pallas_v7(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            env_fast=env_fast, v_tile=2, interpret=True,
        )
        sel = list(active)
        np.testing.assert_allclose(np.asarray(c7), np.asarray(c3), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g7), np.asarray(g3)[:, sel], rtol=1e-4,
            atol=1e-3 * np.abs(np.asarray(g3)).max(),
        )
        np.testing.assert_allclose(
            np.asarray(h7), np.asarray(h3)[:, sel][:, :, sel], rtol=1e-4,
            atol=1e-3 * np.abs(np.asarray(h3)).max(),
        )

    def test_v7_driver_on_lorentzian_prior(self, tmp_path):
        """Full LM with kernel_version=7 lands in the v5 basin (the 2-peak
        prior frees g, so v7 runs factored angles + classic envelope)."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=4, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r5 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=5,
        )
        r7 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=7,
        )
        for amp_col in (0, 5):
            np.testing.assert_allclose(
                np.asarray(r7.x_free[:, amp_col]),
                np.asarray(r5.x_free[:, amp_col]),
                rtol=0.05,
            )
        assert np.all(
            np.asarray(r7.cost) < np.asarray(r5.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r7.converged).all()

    def test_v7_rejects_nonuniform_t(self):
        """The block factorization is wrong for non-uniform sampling; a
        concrete non-uniform time axis must be rejected eagerly."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v7,
        )

        b, n_t, k = 2, 256, 1
        grids = sane_grids(b, k)
        yre = np.zeros((b, n_t), np.float32)
        t_bad = np.cumsum(
            np.random.default_rng(0).uniform(0.5, 1.5, n_t)
        ).astype(np.float32)
        with pytest.raises(ValueError, match="uniform"):
            eq6_normal_equations_pallas_v7(
                jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yre),
                jnp.asarray(t_bad), n_peaks=k, mhz=MHZ,
                active=tuple(range(5)), env_fast=(False,), v_tile=2,
                interpret=True,
            )

    def test_v7_tolerance_matches_driver(self):
        """The eager v7 guard shares _t_is_uniform with the LM driver.

        The old inline check (rtol 1e-4 on adjacent steps = ~4e-8 absolute
        here) and the driver's eps-scaled predicate (16*eps(f32)*max|t| =
        ~9.7e-8 here) disagreed in BOTH directions depending on n_t; an
        axis with f32-quantization-scale wobble the driver accepts (and
        fits with the factored basis) must not be rejected at the eager
        boundary."""
        from xmris_tpu.fitting.lm import _t_is_uniform
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v7,
        )

        b, n_t, k = 2, 256, 1
        grids = sane_grids(b, k)
        yre = np.zeros((b, n_t), np.float32)
        t_w = (np.arange(n_t, dtype=np.float64) / 5000.0).astype(np.float32)
        t_w[10] += np.float32(6e-8)  # below the driver tolerance,
        #                              above the old inline one
        assert _t_is_uniform(t_w)  # the driver treats this as uniform
        c, g, h = eq6_normal_equations_pallas_v7(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yre),
            jnp.asarray(t_w), n_peaks=k, mhz=MHZ,
            active=tuple(range(5)), env_fast=(False,), v_tile=2,
            interpret=True,
        )
        assert np.all(np.isfinite(np.asarray(c)))

    def test_v7_rejects_unaligned_length(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v7,
        )

        b, n_t, k = 2, 200, 1
        grids = sane_grids(b, k)
        yre = np.zeros((b, n_t), np.float32)
        with pytest.raises(ValueError, match="n_t % 128"):
            eq6_normal_equations_pallas_v7(
                jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yre),
                jnp.asarray(np.arange(n_t, dtype=np.float32)),
                n_peaks=k, mhz=MHZ, active=tuple(range(5)),
                env_fast=(False,), v_tile=2, interpret=True,
            )

    def test_driver_v7_falls_back_on_unaligned_length(self, tmp_path):
        """lm_fit_batched_pallas(kernel_version=7) on n_t=200 uses v6."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=2, n_points=200)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(200) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        res = lm_fit_batched_pallas(
            jnp.asarray(fids.real), jnp.asarray(fids.imag), t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0, max_iter=20, v_tile=2,
            interpret=True, kernel_version=7,
        )
        assert np.asarray(res.converged).all()


class TestMomentKernel:
    """v8: moment-based H for purely Lorentzian (g-fixed) priors."""

    def test_v8_matches_v3_subset(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v8,
        )

        b, n_t, k = 4, 256, 3
        grids = sane_grids(b, k, seed=21)
        grids[:, 4::5] = 0.0  # purely Lorentzian
        rng = np.random.default_rng(21)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        active = tuple(j for j in range(k * 5) if j % 5 != 4)  # g fixed
        c3, g3, h3 = KERNELS[3](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        c8, g8, h8 = eq6_normal_equations_pallas_v8(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active, v_tile=2,
            interpret=True,
        )
        sel = list(active)
        np.testing.assert_allclose(np.asarray(c8), np.asarray(c3), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g8), np.asarray(g3)[:, sel], rtol=1e-4,
            atol=1e-3 * np.abs(np.asarray(g3)).max(),
        )
        np.testing.assert_allclose(
            np.asarray(h8), np.asarray(h3)[:, sel][:, :, sel], rtol=1e-4,
            atol=1e-3 * np.abs(np.asarray(h3)).max(),
        )

    def test_v8_rejects_free_g(self):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v8,
        )

        grids = sane_grids(2, 1)
        y = np.zeros((2, 128), np.float32)
        with pytest.raises(ValueError, match="Lorentzian"):
            eq6_normal_equations_pallas_v8(
                jnp.asarray(grids), jnp.asarray(y), jnp.asarray(y),
                jnp.asarray(np.arange(128, dtype=np.float32)),
                n_peaks=1, mhz=MHZ, active=tuple(range(5)),
                v_tile=2, interpret=True,
            )

    def test_v8_rejects_fixed_nonzero_g(self):
        """g fixed at a NONZERO value is just as non-Lorentzian as free g:
        the kernel hardcodes exp(-pi*lw*t), so accepting it silently
        corrupts cost/gradient/Hessian (verified 17% cost error)."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v8,
        )

        grids = sane_grids(2, 1)
        grids[:, 4] = 0.5  # fixed (not in active), but nonzero
        y = np.zeros((2, 128), np.float32)
        with pytest.raises(ValueError, match="AT 0"):
            eq6_normal_equations_pallas_v8(
                jnp.asarray(grids), jnp.asarray(y), jnp.asarray(y),
                jnp.asarray(np.arange(128, dtype=np.float32)),
                n_peaks=1, mhz=MHZ, active=tuple(range(4)),
                v_tile=2, interpret=True,
            )

    def test_v8_driver_on_lorentzian_prior(self, tmp_path):
        """Full LM with kernel_version=8 on a g-fixed 3-peak prior lands in
        the v6 basin; non-Lorentzian priors silently fall back to v6."""
        mhz, sw, n = 120.0, 10000.0, 256
        shifts = [0.0, -2.4, -7.5]
        rows = ["Index," + ",".join(f"M{i}" for i in range(3)),
                "Initial Values," + "," * 2,
                "amplitude,8.0,5.0,4.0",
                "chemicalshift," + ",".join(str(s) for s in shifts),
                "linewidth,15.0,15.0,15.0",
                "phase,0,0,0",
                "g,0,0,0",
                "Bounds," + "," * 2,
                "amplitude," + ",".join('"(0, "' for _ in range(3))]
        rows.append(
            "chemicalshift,"
            + ",".join(f'"({s - 0.4}, {s + 0.4})"' for s in shifts)
        )
        rows.append("linewidth," + ",".join('"(5, 40)"' for _ in range(3)))
        rows.append("phase," + ",".join('"(-180, 180)"' for _ in range(3)))
        rows.append("g," + ",".join("fixed" for _ in range(3)))
        pk_path = tmp_path / "pk3.csv"
        pk_path.write_text("\n".join(rows) + "\n")
        pk = load_prior_knowledge(pk_path)

        t_np = np.arange(n) / sw
        rng = np.random.default_rng(2)
        y = sum(
            a * np.exp((-15 * np.pi + 1j * 2 * np.pi * (s * mhz)) * t_np)
            for a, s in zip([8.0, 5.0, 4.0], shifts)
        ) + rng.normal(0, 0.05, n) + 1j * rng.normal(0, 0.05, n)
        fids = np.stack([y, 0.5 * y]).astype(np.complex64)

        t = jnp.asarray(t_np.astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), mhz,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r6 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=6,
        )
        r8 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=8,
        )
        amp_cols = [0, 4, 8]  # 4 free per peak, amp first
        for c in amp_cols:
            np.testing.assert_allclose(
                np.asarray(r8.x_free[:, c]), np.asarray(r6.x_free[:, c]),
                rtol=0.05,
            )
        assert np.all(
            np.asarray(r8.cost) < np.asarray(r6.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r8.converged).all()

        # Voigt prior (free g) silently falls back to v6
        from tests.test_fitting import PK_CSV, make_phantom

        p2 = tmp_path / "pk.csv"
        p2.write_text(PK_CSV)
        pk2 = load_prior_knowledge(p2)
        da = make_phantom(n_voxels=2, n_points=256)
        f2 = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        res = lm_fit_batched_pallas(
            jnp.asarray(f2.real), jnp.asarray(f2.imag),
            jnp.asarray((np.arange(256) / 10000.0).astype(np.float32)),
            jnp.asarray(
                external_to_internal(
                    pk2.init_free, pk2.lower, pk2.upper, pk2.kind
                )
            ),
            jnp.asarray(pk2.lower), jnp.asarray(pk2.upper),
            jnp.asarray(pk2.kind), hashable_pmap(pk2.pmap), 120.0,
            max_iter=20, v_tile=2, interpret=True, kernel_version=8,
        )
        assert np.asarray(res.converged).all()


class TestMomentKernelTies:
    def test_v8_driver_with_tied_amplitude(self, tmp_path):
        """v8 + tied amplitude (0.5*PCr) + fixed g: the kernel's
        physical-space H must compose correctly with the driver's
        scatter-matrix tie folding — compare against the v3 path."""
        from tests.test_fitting import PK_CSV, make_phantom

        csv = PK_CSV.replace(
            "amplitude,10.0,5.0", 'amplitude,10.0,0.5*PCr'
        ).replace('"(0, 1)","(0, 1)"', "fixed,fixed")
        p = tmp_path / "pk_tied.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        assert pk.n_free == 7  # 2 peaks x 4 free, minus the tied amplitude
        # Phantom with ATP = 0.5 * PCr so the tie is consistent with truth
        mhz, sw, n = 120.0, 10000.0, 256
        t_np = np.arange(n) / sw
        rng = np.random.default_rng(5)
        data = []
        for a in (10.0, 24.0):
            y = a * np.exp((-15 * np.pi) * t_np)
            y = y + 0.5 * a * np.exp(
                (-20 * np.pi + 1j * 2 * np.pi * (-7.5 * mhz)) * t_np
            )
            data.append(y + rng.normal(0, 0.05, n) + 1j * rng.normal(0, 0.05, n))
        fids = np.stack(data).astype(np.complex64)

        t = jnp.asarray(t_np.astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), mhz,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r3 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=3,
        )
        r8 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=8,
        )
        # PCr amplitude is free slot 0; both engines recover the truth
        np.testing.assert_allclose(
            np.asarray(r8.x_free[:, 0]), [10.0, 24.0], rtol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(r8.x_free[:, 0]), np.asarray(r3.x_free[:, 0]),
            rtol=0.02,
        )
        assert np.all(
            np.asarray(r8.cost) < np.asarray(r3.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r8.converged).all()


class TestFitAmaresEngines:
    def test_pallas_engine_through_accessor(self, tmp_path):
        """fit_amares(engine='pallas') runs in interpret mode off-TPU."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        da = make_phantom(n_voxels=2, n_points=512)
        ds = da.xmr.fit_amares(p, engine="pallas", max_iter=30)
        pcr = ds["amplitude"].sel({"Metabolite": "PCr"}).values
        np.testing.assert_allclose(pcr, [10.0, 20.0], rtol=0.1)
        assert ds["fit_converged"].values.all()

    def test_engines_agree(self, tmp_path):
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        da = make_phantom(n_voxels=2, n_points=512)
        ds_x = da.xmr.fit_amares(p, engine="xla", max_iter=30)
        ds_p = da.xmr.fit_amares(p, engine="pallas", max_iter=30)
        np.testing.assert_allclose(
            ds_p["amplitude"].values, ds_x["amplitude"].values, rtol=0.05
        )


class TestHessianReuse:
    def test_crlb_from_carried_hessian_matches_recompute(self, tmp_path):
        """return_hessian=True hands back the GN Hessian at the optimum;
        CRLBs derived from it match the dedicated CRLB kernel pass."""
        from tests.test_fitting import PK_CSV, make_phantom
        from xmris_tpu.fitting.lm import (
            crlb_batched_pallas,
            crlb_from_hessian,
        )

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        res, h_ext = lm_fit_batched_pallas(
            re, im, t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0, max_iter=30, v_tile=1,
            interpret=True, return_hessian=True,
        )
        assert h_ext.shape == (3, pk.n_free, pk.n_free)

        sds_h, s2_h = crlb_from_hessian(h_ext, res.cost, 256)
        sds_k, s2_k = crlb_batched_pallas(
            re, im, t, res.x_free, hashable_pmap(pk.pmap), 120.0,
            v_tile=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(s2_h), np.asarray(s2_k), rtol=1e-5
        )
        # identical information up to the dxdu divide round-trip and the
        # f32 inversion along near-flat directions
        np.testing.assert_allclose(
            np.asarray(sds_h), np.asarray(sds_k), rtol=0.02
        )


class TestCRLBKernel:
    def test_unidentifiable_rows_are_inf(self, tmp_path):
        """A zero-amplitude peak's cs/lw/phase Fisher rows are
        structurally zero: the standalone CRLB kernel must report inf —
        the same contract as crlb_from_hessian — not the huge-but-finite
        1/1e-12 ridge artifact."""
        from xmris_tpu.fitting.lm import crlb_batched_pallas

        csv = (
            "Index,PCr\n"
            "Initial Values,\n"
            "amplitude,8.0\n"
            "chemicalshift,0.0\n"
            "linewidth,15.0\n"
            "phase,10\n"
            "g,0\n"
            "Bounds,\n"
            'amplitude,"(0, "\n'
            'chemicalshift,"(-0.5, 0.5)"\n'
            'linewidth,"(2, 40)"\n'
            'phase,"(-180, 180)"\n'
            "g,fixed\n"
        )
        p = tmp_path / "pk1.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        n_t = 128
        rng = np.random.default_rng(3)
        re = jnp.asarray(rng.normal(size=(2, n_t)).astype(np.float32))
        im = jnp.asarray(rng.normal(size=(2, n_t)).astype(np.float32))
        t = jnp.asarray((np.arange(n_t) / 5000.0).astype(np.float32))
        x = np.tile(np.asarray(pk.init_free, np.float32), (2, 1))
        amp_slot = int(pk.pmap.idx[0])
        x[0, amp_slot] = 0.0  # voxel 0: zero-amplitude peak
        sds, _ = crlb_batched_pallas(
            re, im, t, jnp.asarray(x), hashable_pmap(pk.pmap), 120.0,
            v_tile=1, interpret=True,
        )
        sds = np.asarray(sds)
        # At amp=0 every row of the peak's Fisher block is structurally
        # zero in the v9 moment formulation (all J rows carry the
        # amplitude factor; amp=0 also sits ON its lower bound, where the
        # LM driver's carried-Hessian path reports inf too).
        assert np.all(np.isinf(sds[0]))
        assert np.all(np.isfinite(sds[1]))

    def test_matches_xla_crlb(self, tmp_path):
        from tests.test_fitting import PK_CSV, make_phantom
        from xmris_tpu.fitting.lm import (
            crlb_batched_pallas,
            crlb_batched_planar,
            lm_fit_batched_planar,
        )

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=512)
        fids = np.asarray(da.transpose("voxel", "time").values).astype(np.complex64)
        t = jnp.asarray((np.arange(512) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        ps = hashable_pmap(pk.pmap)
        res = lm_fit_batched_planar(
            re, im, t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            ps, 120.0, max_iter=40,
        )
        sds_xla, s2_xla = crlb_batched_planar(re, im, t, res.x_free, ps, 120.0)
        sds_pal, s2_pal = crlb_batched_pallas(
            re, im, t, res.x_free, ps, 120.0, v_tile=1, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(s2_pal), np.asarray(s2_xla), rtol=1e-4
        )
        # f32 inversion along near-flat directions: ~0.6% scatter is
        # immaterial for an uncertainty estimate
        np.testing.assert_allclose(
            np.asarray(sds_pal), np.asarray(sds_xla), rtol=0.02
        )


class TestLargerPriors:
    def test_five_peak_fit(self, tmp_path):
        """P=25 free params exercises kernel padding (p_pad=32) and the
        solver at realistic 31P prior sizes."""
        mhz, sw, n = 120.0, 10000.0, 256
        shifts = [0.0, -2.4, -7.5, -16.0, 5.2]
        amps = [20.0, 8.0, 6.0, 4.0, 10.0]
        lws = [12.0, 18.0, 22.0, 25.0, 15.0]

        rows = ["Index," + ",".join(f"M{i}" for i in range(5)),
                "Initial Values," + "," * 4]
        rows.append("amplitude," + ",".join("5.0" for _ in range(5)))
        rows.append("chemicalshift," + ",".join(str(s) for s in shifts))
        rows.append("linewidth," + ",".join("15.0" for _ in range(5)))
        rows.append("phase," + ",".join("0" for _ in range(5)))
        rows.append("g," + ",".join("0" for _ in range(5)))
        rows.append("Bounds," + "," * 4)
        rows.append("amplitude," + ",".join('"(0, "' for _ in range(5)))
        rows.append(
            "chemicalshift,"
            + ",".join(f'"({s - 0.4}, {s + 0.4})"' for s in shifts)
        )
        rows.append("linewidth," + ",".join('"(5, 40)"' for _ in range(5)))
        rows.append("phase," + ",".join('"(-180, 180)"' for _ in range(5)))
        rows.append("g," + ",".join("fixed" for _ in range(5)))
        pk_path = tmp_path / "pk5.csv"
        pk_path.write_text("\n".join(rows) + "\n")

        t = np.arange(n) / sw
        rng = np.random.default_rng(1)
        y = sum(
            a * np.exp((-lw * np.pi + 1j * 2 * np.pi * (s * mhz)) * t)
            for a, s, lw in zip(amps, shifts, lws)
        )
        y = y + rng.normal(0, 0.1, n) + 1j * rng.normal(0, 0.1, n)

        from xmris_tpu import XmrArray

        da = XmrArray(y[None, :], dims=("voxel", "time"),
                      coords={"time": t}, attrs={"MHz": mhz})
        # full fit through the fast engine; the pallas kernel's P=25 padding
        # is covered by test_kernel_p25_padding below
        ds_p = da.xmr.fit_amares(pk_path, engine="xla", max_iter=40,
                                 initialize_with_lm=False)
        fitted = ds_p["amplitude"].values[0]
        order = np.argsort([f"M{i}" for i in range(5)])  # metabolite order
        np.testing.assert_allclose(fitted, amps, rtol=0.1)
        cs = ds_p["chem_shift"].values[0]
        np.testing.assert_allclose(cs, shifts, atol=0.05)


    @pytest.mark.parametrize("version", [2, 3])
    def test_kernel_p25_padding(self, version):
        """K=5 (P=25 -> p_pad=32) kernel parity vs the XLA reference."""
        from xmris_tpu.fitting.lm import eq6_basis_planar, eq6_jacobian_planar

        b, n_t, k = 2, 128, 5
        grids = sane_grids(b, k, seed=9)
        rng = np.random.default_rng(9)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        cost, g, h = KERNELS[version](
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, v_tile=2, interpret=True,
        )
        assert g.shape == (b, 25)
        assert h.shape == (b, 25, 25)

        tj = jnp.asarray(t)
        for i in range(b):
            grid = jnp.asarray(grids[i].reshape(k, 5))
            m_re, m_im, b_re, b_im = eq6_basis_planar(tj, grid, MHZ)
            jre = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[0].reshape(n_t, -1)
            jim = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[1].reshape(n_t, -1)
            h_ref = (
                np.asarray(jre).T @ np.asarray(jre)
                + np.asarray(jim).T @ np.asarray(jim)
            )
            np.testing.assert_allclose(
                np.asarray(h[i]), h_ref, rtol=1e-4,
                atol=1e-3 * np.abs(h_ref).max(),
            )


class TestRound3Guards:
    """Round-3 hardening: v7 uniform-t guard, zero-cost voxels, pinned CRLBs."""

    def _pk_and_data(self, tmp_path, n_t=256):
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=2, n_points=n_t)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        return pk, jnp.asarray(fids.real), jnp.asarray(fids.imag)

    def test_v7_rejects_nonuniform_concrete_t(self, tmp_path):
        pk, re, im = self._pk_and_data(tmp_path)
        # quadratic warp: clearly non-uniform spacing
        t_bad = jnp.asarray(
            ((np.arange(256) / 10000.0) ** 2 * 50.0).astype(np.float32)
        )
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        with pytest.raises(ValueError, match="uniformly sampled"):
            lm_fit_batched_pallas(
                re, im, t_bad, u0,
                jnp.asarray(pk.lower), jnp.asarray(pk.upper),
                jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
                max_iter=5, v_tile=2, interpret=True, kernel_version=7,
            )

    def test_v7_traced_t_requires_flag(self, tmp_path):
        import jax

        pk, re, im = self._pk_and_data(tmp_path)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
        )

        def run(tt, **kw):
            return lm_fit_batched_pallas(
                re, im, tt, u0, *args,
                max_iter=5, v_tile=2, interpret=True, kernel_version=7, **kw
            ).cost

        # Traced t cannot be validated -> must be explicitly vouched for
        with pytest.raises(ValueError, match="require_uniform_t"):
            jax.jit(run)(t)
        cost = jax.jit(
            lambda tt: run(tt, require_uniform_t=True)
        )(t)
        assert np.all(np.isfinite(np.asarray(cost)))

    def test_zero_cost_voxel_converges_f32(self, tmp_path):
        """A voxel whose cost is exactly 0 (all-zero FID perfectly fit by a
        zero-amplitude model) must converge instead of NaN-ing the
        predicted-decrease ratio and burning the max_iter budget (the old
        1e-300 divisor guard underflowed to 0.0 in float32)."""
        csv = (
            "Index,PCr\n"
            "Initial Values,\n"
            "amplitude,0.0\n"
            "chemicalshift,0.0\n"
            "linewidth,15.0\n"
            "phase,10\n"
            "g,0\n"
            "Bounds,\n"
            "amplitude,fixed\n"
            "chemicalshift,fixed\n"
            "linewidth,fixed\n"
            'phase,"(-180, 180)"\n'
            "g,fixed\n"
        )
        p = tmp_path / "pk0.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        n_t = 128
        re = jnp.zeros((2, n_t), jnp.float32)
        im = jnp.zeros((2, n_t), jnp.float32)
        t = jnp.asarray((np.arange(n_t) / 5000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        ).astype(jnp.float32)
        res = lm_fit_batched_planar(
            re, im, t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
            max_iter=10,
        )
        assert np.asarray(res.cost).tolist() == [0.0, 0.0]
        assert np.asarray(res.converged).all()
        # exits via the rejection plateau in ~3 iterations, not max_iter
        assert np.asarray(res.n_iter).max() == 0

    def test_crlb_from_hessian_flags_unidentifiable(self):
        """A zero Hessian row (pinned-at-bound or structurally dead
        parameter) reports an infinite CRLB, not a huge-but-finite ridge
        artifact."""
        from xmris_tpu.fitting.lm import crlb_from_hessian

        h = np.zeros((1, 3, 3), np.float32)
        h[0, 0, 0] = 4.0
        h[0, 1, 1] = 9.0
        # row/col 2 zeroed: unidentifiable
        cost = jnp.asarray([2.0], jnp.float32)
        sds, s2 = crlb_from_hessian(jnp.asarray(h), cost, 64)
        sds = np.asarray(sds)
        assert np.isfinite(sds[0, 0]) and np.isfinite(sds[0, 1])
        assert np.isinf(sds[0, 2])


class TestGeneralizedMomentKernel:
    """v9: moment-based normal equations valid for every Eq.6 prior."""

    def _xla_reference(self, grids, yre, yim, t, k):
        """Brute-force (cost, g, H) over ALL K*5 physical rows."""
        from xmris_tpu.fitting.lm import eq6_basis_planar, eq6_jacobian_planar

        tj = jnp.asarray(t)
        outs = []
        for i in range(grids.shape[0]):
            grid = jnp.asarray(grids[i].reshape(k, 5))
            m_re, m_im, b_re, b_im = eq6_basis_planar(tj, grid, MHZ)
            jre = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[0].reshape(
                len(t), -1
            )
            jim = eq6_jacobian_planar(tj, grid, b_re, b_im, MHZ)[1].reshape(
                len(t), -1
            )
            rre = yre[i] - np.asarray(m_re)
            rim = yim[i] - np.asarray(m_im)
            c = float(np.sum(rre**2 + rim**2))
            g = np.asarray(jre).T @ rre + np.asarray(jim).T @ rim
            h = (
                np.asarray(jre).T @ np.asarray(jre)
                + np.asarray(jim).T @ np.asarray(jim)
            )
            outs.append((c, g, h))
        return outs

    @pytest.mark.parametrize("n_t,k", [(256, 2), (512, 3)])
    def test_voigt_free_g_parity(self, n_t, k):
        """Voigt grids (g in (0,1)) with ALL rows active — incl. the g rows
        and the degree-2 linewidth rows — match the XLA Jacobian reference."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v9,
        )

        b = 5
        rng = np.random.default_rng(n_t)
        grids = sane_grids(b, k, seed=n_t)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)

        active = tuple(range(k * 5))  # every row, g included
        cost, g, h = eq6_normal_equations_pallas_v9(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            g_zero=(False,) * k, v_tile=2, interpret=True,
        )
        for i, (c_ref, g_ref, h_ref) in enumerate(
            self._xla_reference(grids, yre, yim, t, k)
        ):
            assert float(cost[i]) == pytest.approx(c_ref, rel=1e-5)
            np.testing.assert_allclose(
                np.asarray(g[i]), g_ref, rtol=1e-4,
                atol=1e-4 * np.abs(g_ref).max(),
            )
            np.testing.assert_allclose(
                np.asarray(h[i]), h_ref, rtol=1e-4,
                atol=1e-3 * np.abs(h_ref).max(),
            )

    def test_matches_v8_on_lorentzian(self):
        """On a purely Lorentzian prior v9 reduces exactly to v8's math."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v8,
            eq6_normal_equations_pallas_v9,
        )

        b, n_t, k = 4, 256, 2
        rng = np.random.default_rng(7)
        grids = sane_grids(b, k, seed=7)
        grids[:, 4::5] = 0.0  # Lorentzian: g = 0
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)
        active = tuple(j for j in range(k * 5) if j % 5 != 4)

        out8 = eq6_normal_equations_pallas_v8(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            v_tile=2, interpret=True,
        )
        out9 = eq6_normal_equations_pallas_v9(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            g_zero=(True,) * k, v_tile=2, interpret=True,
        )
        for a8, a9 in zip(out8, out9):
            # identical math, different accumulation order -> f32 rounding
            np.testing.assert_allclose(
                np.asarray(a9), np.asarray(a8), rtol=2e-5, atol=1e-5
            )

    def test_accept_gate_cost_always_valid(self):
        """With cost_prev below every achievable cost the moment work is
        skipped, but the cost output stays exact."""
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v9,
        )

        b, n_t, k = 4, 256, 2
        rng = np.random.default_rng(3)
        grids = sane_grids(b, k, seed=3)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)
        active = tuple(range(k * 5))

        c_open, g_open, h_open = eq6_normal_equations_pallas_v9(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            g_zero=(False,) * k, v_tile=2, interpret=True,
        )
        c_gated, _, _ = eq6_normal_equations_pallas_v9(
            jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
            jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
            g_zero=(False,) * k, v_tile=2, interpret=True,
            cost_prev=jnp.zeros((b,), jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(c_gated), np.asarray(c_open), rtol=1e-6
        )

    def test_driver_v9_on_voigt_prior(self, tmp_path):
        """kernel_version=9 fits the free-g prior (no v6 fallback) and
        matches the all-rows v3 baseline."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)  # g free in (0, 1) for both peaks
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=512)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(512) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r3 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=3,
        )
        r9 = lm_fit_batched_pallas(
            re, im, *args, max_iter=30, v_tile=2, interpret=True,
            kernel_version=9,
        )
        np.testing.assert_allclose(
            np.asarray(r9.x_free[:, 0]), [10.0, 20.0, 30.0], rtol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(r9.x_free), np.asarray(r3.x_free), rtol=0.05, atol=0.05
        )
        assert np.all(
            np.asarray(r9.cost) < np.asarray(r3.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r9.converged).all()

    def test_driver_v9_matches_v8_on_lorentzian_prior(self, tmp_path):
        from tests.test_fitting import make_phantom

        csv = (
            "Index,PCr,ATP\n"
            "Initial Values,,\n"
            "amplitude,10.0,5.0\n"
            "chemicalshift,0.0,-7.5\n"
            "linewidth,15.0,20.0\n"
            "phase,0,0\n"
            "g,0,0\n"
            "Bounds,,\n"
            'amplitude,"(0, ","(0, "\n'
            'chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"\n'
            'linewidth,"(5.0, 30.0)","(10.0, 40.0)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            "g,fixed,fixed\n"
        )
        p = tmp_path / "pk.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=512)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(512) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r8 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=8,
        )
        r9 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=9,
        )
        np.testing.assert_allclose(
            np.asarray(r9.x_free), np.asarray(r8.x_free), rtol=0.02, atol=0.02
        )
        assert np.all(
            np.asarray(r9.cost) < np.asarray(r8.cost) * 1.02 + 1e-12
        )
        assert np.asarray(r9.converged).all()


class TestV9FactoredBasis:
    """v9's block-factored basis (uniform t) matches the direct basis."""

    @pytest.mark.parametrize("lorentzian", [True, False])
    def test_factored_matches_direct(self, lorentzian):
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v9,
        )

        b, n_t, k = 4, 256, 3
        rng = np.random.default_rng(11)
        grids = sane_grids(b, k, seed=11)
        if lorentzian:
            grids[:, 4::5] = 0.0
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = (np.arange(n_t) / 5000.0).astype(np.float32)
        active = tuple(
            j for j in range(k * 5) if (j % 5 != 4 or not lorentzian)
        )
        g_zero = (lorentzian,) * k

        outs = {}
        for fac in (False, True):
            outs[fac] = eq6_normal_equations_pallas_v9(
                jnp.asarray(grids), jnp.asarray(yre), jnp.asarray(yim),
                jnp.asarray(t), n_peaks=k, mhz=MHZ, active=active,
                g_zero=g_zero, v_tile=2, interpret=True, factored_t=fac,
            )
        for name, a, b_ in zip(("cost", "g", "h"), outs[False], outs[True]):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=2e-4,
                atol=2e-4 * float(np.max(np.abs(np.asarray(a)))) + 1e-6,
                err_msg=name,
            )

    def test_driver_autoselects_factored_on_uniform_t(self, tmp_path):
        """A concrete uniform t with n_t % 128 == 0 silently enables the
        factored basis; fit results match the direct-basis path."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=2, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t_uniform = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        # a non-uniform axis silently falls back to the direct basis
        t_warped = jnp.asarray(
            ((np.arange(256) / 10000.0) ** 1.5).astype(np.float32)
        )
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r_fac = lm_fit_batched_pallas(
            re, im, t_uniform, u0, *args, max_iter=25, v_tile=2,
            interpret=True, kernel_version=9,
        )
        assert np.asarray(r_fac.converged).all()
        np.testing.assert_allclose(
            np.asarray(r_fac.x_free[:, 0]), [10.0, 20.0], rtol=0.05
        )
        # warped axis: must not raise, still converges (direct basis)
        r_warp = lm_fit_batched_pallas(
            re, im, t_warped, u0, *args, max_iter=25, v_tile=2,
            interpret=True, kernel_version=9,
        )
        assert np.isfinite(np.asarray(r_warp.cost)).all()


class TestV9FreeFold:
    """v9's in-kernel free-space fold matches the einsum fold."""

    def test_folded_matches_einsum_fold(self, tmp_path):
        """cost/g/h from the folded kernel == smat-einsum of the physical
        outputs (including a TIED parameter so rows merge)."""
        from tests.test_fitting import PK_CSV
        from xmris_tpu.fitting.lm import _scatter_matrix
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v9,
        )

        p = tmp_path / "pk.csv"
        # tie ATP amplitude to PCr amplitude at half scale if supported;
        # otherwise the plain prior still pins the fold path
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        ps = hashable_pmap(pk.pmap)
        active = tuple(j for j, ix in enumerate(ps[0]) if ix >= 0)
        g_zero = tuple(
            ps[0][k * 5 + 4] < 0 and float(ps[2][k * 5 + 4]) == 0.0
            for k in range(ps[3])
        )
        n_free = pk.n_free
        b, n_t = 4, 256
        rng = np.random.default_rng(5)
        x = np.column_stack([
            rng.uniform(2, 20, b), rng.uniform(-0.3, 0.3, b),
            rng.uniform(8, 25, b), rng.uniform(-40, 40, b),
            rng.uniform(0.1, 0.9, b),
            rng.uniform(2, 10, b), rng.uniform(-7.9, -7.1, b),
            rng.uniform(12, 35, b), rng.uniform(-40, 40, b),
            rng.uniform(0.1, 0.9, b),
        ]).astype(np.float32)[:, :n_free]
        from xmris_tpu.fitting.lm import _expand_params_batched

        grids = _expand_params_batched(jnp.asarray(x), ps, jnp.float32)
        yre = rng.normal(size=(b, n_t)).astype(np.float32)
        yim = rng.normal(size=(b, n_t)).astype(np.float32)
        t = jnp.asarray((np.arange(n_t) / 5000.0).astype(np.float32))
        dxdu = jnp.asarray(
            rng.uniform(0.5, 2.0, size=(b, n_free)).astype(np.float32)
        )

        c_p, g_p, h_p = eq6_normal_equations_pallas_v9(
            grids, jnp.asarray(yre), jnp.asarray(yim), t,
            n_peaks=ps[3], mhz=120.0, active=active, g_zero=g_zero,
            v_tile=2, interpret=True,
        )
        c_f, g_f, h_f = eq6_normal_equations_pallas_v9(
            grids, jnp.asarray(yre), jnp.asarray(yim), t,
            n_peaks=ps[3], mhz=120.0, active=active, g_zero=g_zero,
            v_tile=2, interpret=True,
            fold_slots=tuple(int(ps[0][j]) for j in active),
            fold_scales=tuple(float(ps[1][j]) for j in active),
            n_free=n_free, dxdu=dxdu,
        )
        smat = jnp.asarray(
            _scatter_matrix(ps, n_free)[list(active), :], jnp.float32
        )
        g_ref = jnp.einsum("bp,pf->bf", g_p, smat) * dxdu
        h_ref = jnp.einsum("pf,bpq,qh->bfh", smat, h_p, smat)
        h_ref = h_ref * dxdu[:, :, None] * dxdu[:, None, :]
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_p), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_ref), rtol=2e-5,
            atol=1e-4 * float(np.max(np.abs(np.asarray(g_ref)))),
        )
        np.testing.assert_allclose(
            np.asarray(h_f), np.asarray(h_ref), rtol=2e-5,
            atol=1e-4 * float(np.max(np.abs(np.asarray(h_ref)))),
        )

    def test_driver_folded_matches_v8(self, tmp_path):
        """End-to-end: the folded v9 driver reproduces the v8 fit."""
        from tests.test_fitting import make_phantom

        csv = (
            "Index,PCr,ATP\n"
            "Initial Values,,\n"
            "amplitude,10.0,5.0\n"
            "chemicalshift,0.0,-7.5\n"
            "linewidth,15.0,20.0\n"
            "phase,0,0\n"
            "g,0,0\n"
            "Bounds,,\n"
            'amplitude,"(0, ","(0, "\n'
            'chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"\n'
            'linewidth,"(5.0, 30.0)","(10.0, 40.0)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            "g,fixed,fixed\n"
        )
        p = tmp_path / "pk.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=512)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(512) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r8 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=8,
        )
        r9, h_ext = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=9, return_hessian=True,
        )
        np.testing.assert_allclose(
            np.asarray(r9.x_free), np.asarray(r8.x_free), rtol=0.02, atol=0.02
        )
        assert np.asarray(r9.converged).all()
        # zero-cost CRLB path stays consistent with the dedicated recompute
        from xmris_tpu.fitting.lm import crlb_batched_pallas, crlb_from_hessian

        sds_h, _ = crlb_from_hessian(h_ext, r9.cost, 512)
        sds_k, _ = crlb_batched_pallas(
            re, im, t, r9.x_free, hashable_pmap(pk.pmap), 120.0,
            v_tile=2, interpret=True, kernel_version=9,
        )
        np.testing.assert_allclose(
            np.asarray(sds_h), np.asarray(sds_k), rtol=0.05
        )


class TestVarpro:
    """The Kaufman variable-projection override (``lm._varpro_override``)."""

    def test_override_reaches_linear_optimum(self, tmp_path):
        """From any state, the override must land the amplitude/phase
        families on the EXACT complex-LS optimum at the current cs/lw/g —
        recovered purely from the carried normal equations."""
        from tests.test_fitting import PK_CSV, make_phantom
        from xmris_tpu.fitting.lm import (
            _pmap_jax,
            _scatter_matrix,
            _varpro_override,
            expand_params,
            internal_to_external_jax,
            varpro_plan,
        )

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)  # g bounds (0, 1): free-g prior
        pk = load_prior_knowledge(p)
        ps = hashable_pmap(pk.pmap)
        plan = varpro_plan(ps)
        assert plan is not None and len(plan["sa"]) == 2

        b, n_t, mhz = 4, 512, 120.0
        da = make_phantom(n_voxels=b, n_points=n_t)
        data = np.asarray(da.transpose("voxel", "time").values)
        yre = data.real.astype(np.float32)
        yim = data.imag.astype(np.float32)
        t = jnp.asarray((np.arange(n_t) / 10000.0).astype(np.float32))

        # a deliberately mis-seeded state: amplitudes and phases knocked off
        rng = np.random.default_rng(0)
        x0 = np.tile(pk.init_free, (b, 1)).astype(np.float64)
        x0[:, plan["sa"]] *= rng.uniform(0.5, 2.0, size=(b, 2))
        x0[:, plan["sp"]] += rng.uniform(-60, 60, size=(b, 2))
        u = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )

        lower = jnp.asarray(pk.lower.astype(np.float32))
        upper = jnp.asarray(pk.upper.astype(np.float32))
        kind = jnp.asarray(pk.kind)
        x, dxdu = internal_to_external_jax(
            u, lower[None, :], upper[None, :], kind[None, :]
        )
        smat = _scatter_matrix(ps, pk.n_free).astype(np.float32)
        pmj = _pmap_jax(ps, jnp.float32)

        gs, hs, costs = [], [], []
        for i in range(b):
            grid = expand_params(x[i], pmj)
            m_re, m_im, b_re, b_im = eq6_basis_planar(t, grid, mhz)
            jre_p, jim_p = eq6_jacobian_planar(t, grid, b_re, b_im, mhz)
            jre = np.asarray(jre_p).reshape(n_t, -1) @ smat
            jim = np.asarray(jim_p).reshape(n_t, -1) @ smat
            jre = jre * np.asarray(dxdu[i])[None, :]
            jim = jim * np.asarray(dxdu[i])[None, :]
            rre = yre[i] - np.asarray(m_re)
            rim = yim[i] - np.asarray(m_im)
            gs.append(jre.T @ rre + jim.T @ rim)
            hs.append(jre.T @ jre + jim.T @ jim)
            costs.append(float(np.sum(rre**2 + rim**2)))
        g = jnp.asarray(np.stack(gs), jnp.float32)
        h = jnp.asarray(np.stack(hs), jnp.float32)

        lam = jnp.full((b,), 1e-3, jnp.float32)
        u_t = _varpro_override(u, u, g, h, lam, lower, upper, kind, plan, 1e-3)
        x_new = internal_to_external_jax(
            u_t, lower[None, :], upper[None, :], kind[None, :]
        )[0]

        for i in range(b):
            # nonlinear slots untouched
            nl = [
                s for s in range(pk.n_free)
                if s not in set(plan["sa"]) | set(plan["sp"])
            ]
            np.testing.assert_allclose(
                np.asarray(x_new[i, nl]), np.asarray(x[i, nl]), rtol=1e-6
            )
            grid = expand_params(x_new[i], pmj)
            m_re, m_im, _, _ = eq6_basis_planar(t, grid, mhz)
            cost_new = float(
                np.sum((yre[i] - np.asarray(m_re)) ** 2)
                + np.sum((yim[i] - np.asarray(m_im)) ** 2)
            )
            # explicit complex LS oracle at the same nonlinear params
            grid0 = np.asarray(expand_params(x[i], pmj)).copy()
            grid0[:, 0] = 1.0
            grid0[:, 3] = 0.0
            _, _, b_re, b_im = eq6_basis_planar(t, jnp.asarray(grid0), mhz)
            bc = np.asarray(b_re) + 1j * np.asarray(b_im)
            y = yre[i] + 1j * yim[i]
            c = np.linalg.lstsq(bc, y, rcond=None)[0]
            cost_ls = float(np.sum(np.abs(y - bc @ c) ** 2))
            assert cost_new <= costs[i] * (1 + 1e-4)
            assert cost_new == pytest.approx(cost_ls, rel=1e-3)

    def test_driver_free_g_matches_novarpro_optimum(self, tmp_path):
        """varpro=True (the free-g auto default) must reach an optimum at
        least as good as the plain driver's at full convergence (the paths
        differ, so per-voxel trajectories and iteration counts may)."""
        from tests.test_fitting import PK_CSV, make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        b, n_t = 6, 512
        da = make_phantom(n_voxels=b, n_points=n_t)
        fids = np.asarray(da.transpose("voxel", "time").values)
        t = jnp.asarray((np.arange(n_t) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real.astype(np.float32))
        im = jnp.asarray(fids.imag.astype(np.float32))
        r_off = lm_fit_batched_pallas(
            re, im, *args, max_iter=120, v_tile=2, interpret=True,
            varpro=False,
        )
        r_on = lm_fit_batched_pallas(
            re, im, *args, max_iter=120, v_tile=2, interpret=True,
        )  # auto: free-g prior -> varpro on
        assert np.asarray(r_on.converged).all()
        assert np.asarray(r_on.done).all()
        cost_on = np.asarray(r_on.cost)
        cost_off = np.asarray(r_off.cost)
        # never materially worse, per voxel and in total
        assert (cost_on <= cost_off * 1.005).all()
        assert cost_on.sum() <= cost_off.sum() * 1.002

    def test_plan_excludes_tied_and_fixed(self, tmp_path):
        from tests.test_fitting import PK_CSV
        from xmris_tpu.fitting.lm import varpro_plan

        # tied amplitude: ATP amp = 0.5*PCr -> only PCr qualifies... the
        # tie makes BOTH slots multi-referenced, so only untied pairs stay.
        csv = PK_CSV.replace("amplitude,10.0,5.0", "amplitude,10.0,0.5*PCr")
        p = tmp_path / "pk_tied.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        # The tie makes the shared amplitude slot multi-referenced for
        # BOTH peaks, so no peak qualifies and the plan is empty.
        assert varpro_plan(hashable_pmap(pk.pmap)) is None

        # fixed phases: no qualifying pair at all
        csv2 = PK_CSV.replace(
            'phase,"(-180, 180)","(-180, 180)"', "phase,fixed,fixed"
        )
        p2 = tmp_path / "pk_fixed_ph.csv"
        p2.write_text(csv2)
        pk2 = load_prior_knowledge(p2)
        assert varpro_plan(hashable_pmap(pk2.pmap)) is None

    def test_override_wraps_phase_across_the_bound(self, tmp_path):
        """An optimum phase just past +/-180 must be reached via its
        in-range periodic equivalent, not clipped at the bound edge
        (current phase +170, true phase -150: the +40-degree linear
        correction lands at 210 == -150)."""
        from tests.test_fitting import PK_CSV
        from xmris_tpu.fitting.lm import (
            _pmap_jax,
            _scatter_matrix,
            _varpro_override,
            expand_params,
            internal_to_external_jax,
            varpro_plan,
        )

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        ps = hashable_pmap(pk.pmap)
        plan = varpro_plan(ps)
        n_t, mhz = 512, 120.0
        t = jnp.asarray((np.arange(n_t) / 10000.0).astype(np.float32))
        pmj = _pmap_jax(ps, jnp.float32)

        # data synthesized at the init values except phase = -150 deg
        x_true = pk.init_free.copy().astype(np.float64)
        x_true[plan["sp"]] = -150.0
        grid_true = expand_params(jnp.asarray(x_true, jnp.float32), pmj)
        m_re, m_im, _, _ = eq6_basis_planar(t, grid_true, mhz)
        yre = np.asarray(m_re, np.float32)[None, :]
        yim = np.asarray(m_im, np.float32)[None, :]

        # current state: phase +170 (20 degrees away through the cut,
        # 320 away going the clipped way)
        x0 = x_true.copy()
        x0[plan["sp"]] = 170.0
        u = jnp.asarray(
            external_to_internal(
                x0[None, :], pk.lower, pk.upper, pk.kind
            ).astype(np.float32)
        )
        lower = jnp.asarray(pk.lower.astype(np.float32))
        upper = jnp.asarray(pk.upper.astype(np.float32))
        kind = jnp.asarray(pk.kind)
        x, dxdu = internal_to_external_jax(
            u, lower[None, :], upper[None, :], kind[None, :]
        )
        smat = _scatter_matrix(ps, pk.n_free).astype(np.float32)
        grid = expand_params(x[0], pmj)
        mr, mi, b_re, b_im = eq6_basis_planar(t, grid, mhz)
        jre_p, jim_p = eq6_jacobian_planar(t, grid, b_re, b_im, mhz)
        jre = np.asarray(jre_p).reshape(n_t, -1) @ smat * np.asarray(dxdu[0])
        jim = np.asarray(jim_p).reshape(n_t, -1) @ smat * np.asarray(dxdu[0])
        rre = yre[0] - np.asarray(mr)
        rim = yim[0] - np.asarray(mi)
        g = jnp.asarray((jre.T @ rre + jim.T @ rim)[None, :], jnp.float32)
        h = jnp.asarray(
            (jre.T @ jre + jim.T @ jim)[None, :, :], jnp.float32
        )

        lam = jnp.full((1,), 1e-3, jnp.float32)
        u_t = _varpro_override(u, u, g, h, lam, lower, upper, kind, plan, 1e-3)
        x_new = internal_to_external_jax(
            u_t, lower[None, :], upper[None, :], kind[None, :]
        )[0]
        ph = np.asarray(x_new[0, plan["sp"]])
        # the periodic equivalent -150, NOT a clip at ~+180
        np.testing.assert_allclose(ph, [-150.0, -150.0], atol=2.0)
