"""Unrolled tiny-SPD solver tests (ops/kernels/spd.py)."""

import numpy as np
import pytest

from xmris_tpu.ops.kernels.spd import spd_inverse_diag, spd_solve_small


def make_spd(b=6, f=10, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(b, f, f))
    h = a @ np.transpose(a, (0, 2, 1)) + f * np.eye(f)
    g = rng.normal(size=(b, f))
    return h, g


class TestSolve:
    @pytest.mark.parametrize("f", [3, 10, 20])
    def test_matches_numpy_solve(self, f):
        h, g = make_spd(f=f, seed=f)
        x = np.asarray(spd_solve_small(h, g))
        expected = np.stack([np.linalg.solve(h[i], g[i]) for i in range(len(h))])
        np.testing.assert_allclose(x, expected, rtol=1e-8)

    def test_non_spd_produces_nan(self):
        # Contract: non-SPD input -> NaN (the LM driver rejects non-finite
        # steps); a finite-but-wrong answer would be silently accepted.
        h = np.array([[[1.0, 2.0], [2.0, 1.0]]])  # indefinite
        g = np.array([[1.0, 1.0]])
        x = np.asarray(spd_solve_small(h, g))
        assert np.isnan(x).any()

    def test_spd_batch_with_one_bad_matrix(self):
        h, g = make_spd(b=3, f=4, seed=1)
        h[1] = [[1, 2, 0, 0], [2, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        x = np.asarray(spd_solve_small(h, g))
        # good rows stay exact, the indefinite row goes NaN
        for i in (0, 2):
            np.testing.assert_allclose(
                x[i], np.linalg.solve(h[i], g[i]), rtol=1e-8
            )
        assert np.isnan(x[1]).any()


class TestSolvePallas:
    """VMEM-resident Pallas variant (interpret mode on CPU)."""

    @pytest.mark.parametrize("f", [3, 10, 20])
    def test_matches_xla_form_with_damping(self, f):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_solve_damped_pallas

        h, g = make_spd(b=13, f=f, seed=f)
        lam = np.random.default_rng(f).uniform(1e-5, 1e-2, size=13)
        h32 = h.astype(np.float32)
        eye = np.eye(f, dtype=np.float32)[None]
        diag = np.einsum("bii->bi", h32)
        damped = (
            h32
            + lam[:, None, None].astype(np.float32)
            * np.maximum(diag, 1e-12)[:, None, :] * eye
            + 1e-12 * eye
        )
        ref = np.asarray(spd_solve_small(jnp.asarray(damped), g.astype(np.float32)))
        got = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h32), jnp.asarray(g.astype(np.float32)),
                jnp.asarray(lam.astype(np.float32)), v_tile=8, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-7)

    def test_batch_padding_and_nan_rows(self):
        # b=5 with v_tile=8 exercises the pad tail; one indefinite system
        # must go NaN without contaminating its lane neighbours.
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_solve_damped_pallas

        h, g = make_spd(b=5, f=4, seed=3)
        h[2] = [[1, 2, 0, 0], [2, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        lam = np.zeros(5)
        x = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h.astype(np.float32)),
                jnp.asarray(g.astype(np.float32)),
                jnp.asarray(lam.astype(np.float32)), v_tile=8, interpret=True,
            )
        )
        assert x.shape == (5, 4)
        assert np.isnan(x[2]).any()
        for i in (0, 1, 3, 4):
            np.testing.assert_allclose(
                x[i], np.linalg.solve(h[i], g[i]), rtol=2e-4
            )

    def test_inverse_diag_pallas_matches(self):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_inverse_diag_pallas

        h, _ = make_spd(b=9, f=12, seed=7)
        ref = np.stack([np.diagonal(np.linalg.inv(h[i])) for i in range(9)])
        got = np.asarray(
            spd_inverse_diag_pallas(
                jnp.asarray(h.astype(np.float32)), v_tile=8, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4)


class TestSlabForms:
    """Kernel-native padded-slab inputs — the LM loop's zero-relayout path
    (H goes moment kernel -> SPD kernel without ever materializing
    (B, F, F); see lm.py slab_mode)."""

    @staticmethod
    def _to_slab(h, f_pad, v_tile):
        """(B, F, F) -> (n_tiles, f_pad², v_tile) with NaN padding rows —
        the slab consumers must never read the pad region."""
        b, f, _ = h.shape
        hp = np.full((b, f_pad, f_pad), np.nan, np.float32)
        hp[:, :f, :f] = h
        b_pad = -(-b // v_tile) * v_tile
        hp = np.pad(hp, ((0, b_pad - b), (0, 0), (0, 0)))
        return (
            hp.reshape(b_pad // v_tile, v_tile, f_pad * f_pad)
            .transpose(0, 2, 1)
        )

    def test_solve_slab_matches_dense(self):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import (
            spd_solve_damped_pallas,
            spd_solve_damped_pallas_slab,
        )

        f, f_pad, v_tile = 5, 8, 8
        h, g = make_spd(b=13, f=f, seed=11)
        h = h.astype(np.float32)
        g = g.astype(np.float32)
        lam = (
            np.random.default_rng(11).uniform(1e-5, 1e-2, 13)
            .astype(np.float32)
        )
        ref = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h), jnp.asarray(g), jnp.asarray(lam),
                v_tile=v_tile, interpret=True,
            )
        )
        got = np.asarray(
            spd_solve_damped_pallas_slab(
                jnp.asarray(self._to_slab(h, f_pad, v_tile)),
                jnp.asarray(g), jnp.asarray(lam),
                f=f, f_pad=f_pad, interpret=True,
            )
        )
        # identical arithmetic on identical values: bit parity, and the
        # NaN padding rows must never leak in
        np.testing.assert_array_equal(got, ref)

    def test_solve_slab_no_padding_rows(self):
        """f == f_pad: the in-kernel pad-row compaction short-circuits."""
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import (
            spd_solve_damped_pallas,
            spd_solve_damped_pallas_slab,
        )

        f = 8  # exactly the sublane multiple
        h, g = make_spd(b=9, f=f, seed=17)
        h = h.astype(np.float32)
        g = g.astype(np.float32)
        lam = (
            np.random.default_rng(17).uniform(1e-5, 1e-2, 9)
            .astype(np.float32)
        )
        ref = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h), jnp.asarray(g), jnp.asarray(lam),
                v_tile=8, interpret=True,
            )
        )
        got = np.asarray(
            spd_solve_damped_pallas_slab(
                jnp.asarray(self._to_slab(h, f, 8)),
                jnp.asarray(g), jnp.asarray(lam),
                f=f, f_pad=f, interpret=True,
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_inverse_diag_slab_matches_dense(self):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import (
            spd_inverse_diag_pallas,
            spd_inverse_diag_pallas_slab,
        )

        f, f_pad, v_tile = 6, 8, 8
        h, _ = make_spd(b=10, f=f, seed=21)
        h = h.astype(np.float32)
        tik = 1e-6
        ref = np.asarray(
            spd_inverse_diag_pallas(
                jnp.asarray(h + tik * np.eye(f, dtype=np.float32)),
                v_tile=v_tile, interpret=True,
            )
        )
        got = np.asarray(
            spd_inverse_diag_pallas_slab(
                jnp.asarray(self._to_slab(h, f_pad, v_tile)),
                f=f, f_pad=f_pad, tikhonov=tik, interpret=True,
            )
        )[:10]
        np.testing.assert_array_equal(got, ref)

    def test_lm_driver_slab_free_g_varpro_matches_xla(self, tmp_path):
        """Free-g priors (VARPRO override auto-on) ride the slab too: the
        override's Gram entries come off static slab rows instead of a
        (B, F, F) gather.  Slab vs XLA-SPD parity on params/cost."""
        import jax.numpy as jnp

        from tests.test_fitting import make_phantom
        from xmris_tpu.fitting.lm import (
            auto_varpro,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        csv = (
            "Index,PCr,ATP\n"
            "Initial Values,,\n"
            "amplitude,10.0,5.0\n"
            "chemicalshift,0.0,-7.5\n"
            "linewidth,15.0,20.0\n"
            "phase,0,0\n"
            "g,0.1,0.1\n"
            "Bounds,,\n"
            'amplitude,"(0, ","(0, "\n'
            'chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"\n'
            'linewidth,"(5.0, 30.0)","(10.0, 40.0)"\n'
            'phase,"(-180, 180)","(-180, 180)"\n'
            'g,"(0, 1)","(0, 1)"\n'
        )
        p = tmp_path / "pk_free_g.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        assert auto_varpro(hashable_pmap(pk.pmap))  # the case under test
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
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r_slab = lm_fit_batched_pallas(
            re, im, *args, max_iter=12, v_tile=2, interpret=True,
            kernel_version=9, spd_pallas=True,
        )
        r_xla = lm_fit_batched_pallas(
            re, im, *args, max_iter=12, v_tile=2, interpret=True,
            kernel_version=9, spd_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(r_slab.x_free), np.asarray(r_xla.x_free),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r_slab.cost), np.asarray(r_xla.cost), rtol=1e-5
        )

    def test_crlb_from_hessian_slab_matches_dense(self):
        import jax.numpy as jnp

        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            crlb_from_hessian_slab,
        )

        f, f_pad, v_tile = 5, 8, 8
        h, _ = make_spd(b=13, f=f, seed=31)
        h = h.astype(np.float32)
        # one unidentifiable parameter: zeroed row/col -> inf CRLB
        h[3, 2, :] = 0.0
        h[3, :, 2] = 0.0
        cost = (
            np.random.default_rng(31).uniform(1.0, 10.0, 13)
            .astype(np.float32)
        )
        ref_sds, ref_s2 = crlb_from_hessian(
            jnp.asarray(h), jnp.asarray(cost), 512, use_pallas=True,
            interpret=True,
        )
        got_sds, got_s2 = crlb_from_hessian_slab(
            jnp.asarray(self._to_slab(h, f_pad, v_tile)),
            jnp.asarray(cost), 512, f=f, f_pad=f_pad, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_s2), np.asarray(ref_s2))
        np.testing.assert_array_equal(
            np.asarray(got_sds), np.asarray(ref_sds)
        )

    def test_lm_driver_slab_matches_xla_spd(self, tmp_path):
        """The v9 LM driver in slab mode (spd_pallas=True) reproduces the
        XLA-SPD fit: same parameters, cost, and zero-cost CRLB Hessian."""
        import jax.numpy as jnp

        from tests.test_fitting import make_phantom
        from xmris_tpu.fitting.lm import (
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

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
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r_slab, h_slab = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=9, return_hessian=True, spd_pallas=True,
        )
        r_xla, h_xla = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=9, return_hessian=True, spd_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(r_slab.x_free), np.asarray(r_xla.x_free),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r_slab.cost), np.asarray(r_xla.cost), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(r_slab.converged), np.asarray(r_xla.converged)
        )
        np.testing.assert_allclose(
            np.asarray(h_slab), np.asarray(h_xla),
            rtol=1e-4,
            atol=1e-5 * float(np.max(np.abs(np.asarray(h_xla)))),
        )


class TestInverseDiag:
    @pytest.mark.parametrize("f", [4, 12])
    def test_matches_numpy_inverse(self, f):
        h, _ = make_spd(f=f, seed=2 * f)
        d = np.asarray(spd_inverse_diag(h))
        expected = np.stack(
            [np.diagonal(np.linalg.inv(h[i])) for i in range(len(h))]
        )
        np.testing.assert_allclose(d, expected, rtol=1e-7)

    def test_non_spd_produces_nan(self):
        h = np.array([[[0.0, 1.0], [1.0, 0.0]]])
        d = np.asarray(spd_inverse_diag(h))
        assert np.isnan(d).any()
