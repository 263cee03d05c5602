"""Fused end-to-end grid program tests.

``seeded_fit_grid_raw`` must reproduce the host-staged path
(``template_seeded_x0`` -> bound transform -> batched LM -> CRLB) inside one
jitted program, and ``process_grid_planar_raw`` must bolt the spectral
pipeline on without changing either stage's results.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xmris_tpu.fitting.amares import (
    seed_plan,
    seeded_fit_grid_raw,
    template_seeded_x0,
)
from xmris_tpu.fitting.lm import (
    crlb_from_hessian,
    external_to_internal,
    hashable_pmap,
    lm_fit_batched_pallas,
)
from xmris_tpu.fitting.prior import load_prior_knowledge

from test_fitting import PK_CSV, make_phantom


@pytest.fixture
def pk(tmp_path):
    p = tmp_path / "pk.csv"
    p.write_text(PK_CSV)
    return load_prior_knowledge(p)


def _inputs(pk, n_voxels=24):
    da = make_phantom(n_voxels=n_voxels, n_points=256)
    fids = np.asarray(da.data, dtype=np.complex64)
    t = np.asarray(da.coords["time"].values, dtype=np.float32)
    re = jnp.asarray(np.ascontiguousarray(fids.real, dtype=np.float32))
    im = jnp.asarray(np.ascontiguousarray(fids.imag, dtype=np.float32))
    return fids, re, im, jnp.asarray(t), 120.0


class TestSeededFitGrid:
    def test_matches_host_staged_path(self, pk):
        """Fused seeding+fit+CRLB == template_seeded_x0 + LM + CRLB."""
        fids, re, im, t, mhz = _inputs(pk)
        pmap_static = hashable_pmap(pk.pmap)
        amp_slots, ls_plan = seed_plan(pk)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        x_template = jnp.asarray(pk.init_free, jnp.float32)

        x_fused, cost_fused, conv_fused, sds_fused = seeded_fit_grid_raw(
            re, im, t, x_template, lower, upper, kind,
            pmap_static=pmap_static, mhz=mhz, amp_slots=amp_slots,
            ls_plan=ls_plan, interpret=True, uniform_t_ok=True,
        )

        x0 = template_seeded_x0(fids, pk, t, mhz, fit_template=False)
        u0 = external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
            np.float32
        )
        res, h_ext = lm_fit_batched_pallas(
            re, im, t, jnp.asarray(u0), lower, upper, kind, pmap_static,
            mhz, max_iter=24, interpret=True, return_hessian=True,
            require_uniform_t=True,
        )
        sds, _ = crlb_from_hessian(h_ext, res.cost, re.shape[-1])

        assert bool(np.all(np.asarray(conv_fused)))
        # identical seeds up to the f32 bound transform; both converge to
        # the same optimum
        np.testing.assert_allclose(
            np.asarray(cost_fused), np.asarray(res.cost), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(x_fused), np.asarray(res.x_free), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(sds_fused), np.asarray(sds), rtol=2e-2, atol=1e-4
        )

    def test_amplitude_recovery(self, pk):
        """The fused program recovers the phantom's known amplitudes."""
        fids, re, im, t, mhz = _inputs(pk, n_voxels=5)
        amp_slots, ls_plan = seed_plan(pk)
        x_free, cost, conv, sds = seeded_fit_grid_raw(
            re, im, t, jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), pmap_static=hashable_pmap(pk.pmap),
            mhz=mhz, amp_slots=amp_slots, ls_plan=ls_plan,
            interpret=True, uniform_t_ok=True,
        )
        x = np.asarray(x_free)
        truth = 10.0 * np.arange(1, 6)
        # PCr amplitude is free slot 0 (first free parameter of peak 0)
        slot = int(pk.pmap.idx[0])
        np.testing.assert_allclose(x[:, slot], truth, rtol=0.05)
        assert bool(np.all(np.asarray(conv)))

    def test_planar_engine_variant(self, pk):
        """engine='planar' runs the XLA driver inside the same program."""
        fids, re, im, t, mhz = _inputs(pk, n_voxels=5)
        amp_slots, ls_plan = seed_plan(pk)
        x_free, cost, conv, sds = seeded_fit_grid_raw(
            re, im, t, jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), pmap_static=hashable_pmap(pk.pmap),
            mhz=mhz, amp_slots=amp_slots, ls_plan=ls_plan,
            engine="planar",
        )
        slot = int(pk.pmap.idx[0])
        np.testing.assert_allclose(
            np.asarray(x_free)[:, slot], 10.0 * np.arange(1, 6), rtol=0.05
        )


PK_CSV_FREE_G = PK_CSV.replace('g,0,0', 'g,0.1,0.1').replace(
    'g,"(0, 1)","(0, 1)"', 'g,"(0, 1)","(0, 1)"'
)


class TestGScanSeed:
    def _voigt_phantom(self, g_true=0.5, n_voxels=8, n_points=256,
                       sw=10000.0, mhz=120.0, noise=0.3):
        """Two-peak Eq.6 phantom with a Gaussian mixing fraction g."""
        t = np.arange(n_points) / sw
        rng = np.random.default_rng(7)
        data = np.zeros((n_voxels, n_points), complex)
        for v in range(n_voxels):
            amp = 10.0 * (1 + v % 4)
            for a, cs, lw in ((amp, 0.0, 15.0), (5.0, -7.5, 20.0)):
                d = lw * np.pi
                env = np.exp(-d * (1 - g_true + g_true * t) * t)
                data[v] += a * env * np.exp(1j * 2 * np.pi * (cs * mhz) * t)
            data[v] += rng.normal(0, noise, n_points) + 1j * rng.normal(
                0, noise, n_points
            )
        return data.astype(np.complex64), t.astype(np.float32)

    def test_scan_seeds_g_near_truth(self, tmp_path):
        from xmris_tpu.fitting.amares import g_seed_plan, template_seeded_x0

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV_FREE_G)
        pk = load_prior_knowledge(p)
        g_plan = g_seed_plan(pk)
        assert len(g_plan) == 2  # both peaks' g free

        fids, t = self._voigt_phantom()
        x0 = template_seeded_x0(
            fids, pk, jnp.asarray(t), 120.0, fit_template=False,
            g_scan=(0.0, 0.25, 0.5, 0.75),
        )
        for slot, offset, lo, hi in g_plan:
            np.testing.assert_allclose(x0[:, slot], 0.5, atol=0.26)
        # most voxels should pick exactly the 0.5 candidate
        slot0 = g_plan[0][0]
        assert np.mean(np.isclose(x0[:, slot0], 0.5, atol=1e-3)) >= 0.75

    def test_fused_g_scan_converges(self, tmp_path):
        from xmris_tpu.fitting.amares import g_seed_plan

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV_FREE_G)
        pk = load_prior_knowledge(p)
        # g is weakly identified against noise on short FIDs — use a
        # cleaner phantom so the assertion tests the seeding/fit wiring,
        # not the CRLB of g itself.
        fids, t = self._voigt_phantom(n_voxels=6, n_points=512, noise=0.05)
        re = jnp.asarray(fids.real.copy())
        im = jnp.asarray(fids.imag.copy())
        amp_slots, ls_plan = seed_plan(pk)
        x_free, cost, conv, sds = seeded_fit_grid_raw(
            re, im, jnp.asarray(t), jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), pmap_static=hashable_pmap(pk.pmap),
            mhz=120.0, amp_slots=amp_slots, ls_plan=ls_plan,
            g_scan=(0.0, 0.25, 0.5, 0.75), g_plan=g_seed_plan(pk),
            interpret=True, uniform_t_ok=True,
        )
        assert bool(np.all(np.asarray(conv)))
        x = np.asarray(x_free)
        slot = int(pk.pmap.idx[0])
        truth = 10.0 * (1 + np.arange(6) % 4)
        np.testing.assert_allclose(x[:, slot], truth, rtol=0.06)
        g_slot = int(pk.pmap.idx[4])
        np.testing.assert_allclose(x[:, g_slot], 0.5, atol=0.15)


class TestGOnlySeed:
    def test_fused_stages_g_without_ls_plan(self, tmp_path):
        """A prior with every amplitude/phase fixed but free g still gets
        the per-voxel scanned g seed in the FUSED path (the g scan must
        not be gated behind a non-empty amplitude/phase plan)."""
        from xmris_tpu.fitting.amares import g_seed_plan

        csv = (
            PK_CSV_FREE_G
            .replace('amplitude,"(0, ","(0, "', "amplitude,fixed,fixed")
            .replace('phase,"(-180, 180)","(-180, 180)"', "phase,fixed,fixed")
        )
        p = tmp_path / "pk.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        amp_slots, ls_plan = seed_plan(pk)
        assert ls_plan == ()  # nothing for the LS amplitude/phase seed
        g_plan = g_seed_plan(pk)
        assert g_plan  # ... but g is free

        fids, t = TestGScanSeed()._voigt_phantom(
            n_voxels=4, n_points=512, noise=0.05
        )
        re = jnp.asarray(fids.real.copy())
        im = jnp.asarray(fids.imag.copy())
        # max_iter=0: the LM loop never runs, so x_free IS the seed (up to
        # the f32 bound-transform round trip).
        x_free, _, _, _ = seeded_fit_grid_raw(
            re, im, jnp.asarray(t), jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), pmap_static=hashable_pmap(pk.pmap),
            mhz=120.0, amp_slots=amp_slots, ls_plan=ls_plan,
            g_scan=(0.0, 0.25, 0.5, 0.75), g_plan=g_plan,
            max_iter=0, interpret=True, uniform_t_ok=True,
        )
        x = np.asarray(x_free)
        for slot, offset, lo, hi in g_plan:
            # the scan (not the 0.1 template) seeds g: winner ~0.5
            np.testing.assert_allclose(x[:, slot], 0.5, atol=0.26)


class TestProcessGrid:
    def test_end_to_end_matches_stages(self, pk):
        """One fused dispatch == spectral pipeline + seeded fit run apart."""
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )
        from xmris_tpu.parallel.process import process_grid_planar_raw

        fids, re, im, t, mhz = _inputs(pk)
        n_time = re.shape[-1]
        zf = 2 * n_time
        sw = 10000.0
        t_full = np.arange(zf) / sw
        weight = jnp.asarray(np.exp(-np.pi * 5.0 * t_full), jnp.float32)
        freqs = jnp.asarray(
            np.fft.fftshift(np.fft.fftfreq(zf, d=1.0 / sw)), jnp.float32
        )
        cfg = PipelineConfig(zero_fill_to=zf, lb=5.0, autophase="single")
        pmap_static = hashable_pmap(pk.pmap)
        amp_slots, ls_plan = seed_plan(pk)
        args = (
            re, im, weight, freqs, t,
            jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind),
        )
        sr, si, phases, x_free, cost, conv, sds = process_grid_planar_raw(
            *args, cfg=cfg, pmap_static=pmap_static, mhz=mhz,
            amp_slots=amp_slots, ls_plan=ls_plan, interpret=True,
            uniform_t_ok=True,
        )
        sr2, si2, phases2 = spectral_pipeline_planar_raw(
            re, im, weight, freqs, cfg
        )
        x2, _, _, sds2 = seeded_fit_grid_raw(
            re, im, t, jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind), pmap_static=pmap_static, mhz=mhz,
            amp_slots=amp_slots, ls_plan=ls_plan, interpret=True,
            uniform_t_ok=True,
        )
        np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr2))
        np.testing.assert_array_equal(np.asarray(si), np.asarray(si2))
        np.testing.assert_array_equal(np.asarray(x_free), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(sds), np.asarray(sds2))
        assert float(phases[0]) == float(phases2[0])

    def test_pinned_wrapper_matches_raw(self, pk):
        """pinned_grid_program == process_grid_planar_raw bit-for-bit.

        On TPU the wrapper pins the result-spectra entry layouts row-major
        (kills XLA's per-plane auto-layout copy, r11/r12); off-TPU it must
        degrade to the plain jitted program with identical outputs."""
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import (
            pinned_grid_program,
            process_grid_planar_raw,
        )

        fids, re, im, t, mhz = _inputs(pk)
        n_time = re.shape[-1]
        zf = 2 * n_time
        sw = 10000.0
        t_full = np.arange(zf) / sw
        weight = jnp.asarray(np.exp(-np.pi * 5.0 * t_full), jnp.float32)
        freqs = jnp.asarray(
            np.fft.fftshift(np.fft.fftfreq(zf, d=1.0 / sw)), jnp.float32
        )
        cfg = PipelineConfig(zero_fill_to=zf, lb=5.0, autophase="single")
        kw = dict(
            cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=mhz,
            amp_slots=seed_plan(pk)[0], ls_plan=seed_plan(pk)[1],
            interpret=True, uniform_t_ok=True,
        )
        args = (
            re, im, weight, freqs, t,
            jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind),
        )
        got = pinned_grid_program(**kw)(*args)
        ref = process_grid_planar_raw(*args, **kw)
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ref)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
