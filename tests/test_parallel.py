"""Fused pipeline parity + multi-device sharding tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray
from xmris_tpu.parallel import PipelineConfig, make_mesh, mrsi_pipeline, shard_voxels


def make_grid(nx=4, ny=2, n=256, sw=4000.0, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sw
    freqs = rng.uniform(-1000, 1000, size=(nx, ny))
    amps = rng.uniform(1.0, 5.0, size=(nx, ny))
    data = amps[..., None] * np.exp(
        (1j * 2 * np.pi * freqs[..., None] - 30.0) * t[None, None, :]
    )
    data += rng.normal(0, 1e-3, data.shape) + 1j * rng.normal(0, 1e-3, data.shape)
    return XmrArray(
        data,
        dims=(DIMS.x, DIMS.y, DIMS.time),
        coords={COORDS.time: (DIMS.time, t)},
        attrs={ATTRS.reference_frequency: 100.0, ATTRS.carrier_ppm: 0.0},
    )


class TestFusedPipelineParity:
    def test_matches_op_chain_no_autophase(self):
        da = make_grid()
        cfg = PipelineConfig(zero_fill_to=512, lb=5.0, autophase="none")
        fused = mrsi_pipeline(da, cfg=cfg)
        chained = (
            da.xmr.zero_fill(target_points=512)
            .xmr.apodize_exp(lb=5.0)
            .xmr.to_spectrum()
        )
        np.testing.assert_allclose(
            np.asarray(fused.values), chained.values, rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            fused.coords[DIMS.frequency].values,
            chained.coords[DIMS.frequency].values,
        )

    def test_matches_op_chain_lg(self):
        da = make_grid()
        cfg = PipelineConfig(zero_fill_to=512, lb=2.0, gb=8.0, autophase="none")
        fused = mrsi_pipeline(da, cfg=cfg)
        chained = (
            da.xmr.zero_fill(target_points=512)
            .xmr.apodize_lg(lb=2.0, gb=8.0)
            .xmr.to_spectrum()
        )
        np.testing.assert_allclose(
            np.asarray(fused.values), chained.values, rtol=1e-10, atol=1e-12
        )

    def test_single_autophase_matches_op_chain(self):
        da = make_grid(nx=2, ny=2)
        cfg = PipelineConfig(zero_fill_to=512, lb=3.0, autophase="single")
        fused = mrsi_pipeline(da, cfg=cfg)
        chained = (
            da.xmr.zero_fill(target_points=512)
            .xmr.apodize_exp(lb=3.0)
            .xmr.to_spectrum()
            .xmr.autophase()
        )
        # Optimizers may settle sub-degree apart; compare phased spectra loosely
        num = np.max(np.abs(np.asarray(fused.values) - chained.values))
        den = np.max(np.abs(chained.values))
        assert num / den < 0.05
        assert ATTRS.phase_p0 in fused.attrs

    def test_autophase_all_shapes(self):
        da = make_grid(nx=2, ny=2, n=128)
        cfg = PipelineConfig(zero_fill_to=256, lb=3.0, autophase="all", p0_only=True)
        fused = mrsi_pipeline(da, cfg=cfg)
        assert np.shape(fused.attrs[ATTRS.phase_p0]) == (2, 2)
        assert fused.sizes[DIMS.frequency] == 256

    def test_lineage_attrs(self):
        da = make_grid(nx=2, ny=1)
        cfg = PipelineConfig(zero_fill_to=512, lb=4.0, autophase="none")
        out = mrsi_pipeline(da, cfg=cfg)
        assert out.attrs[ATTRS.zero_fill_target] == 512
        assert out.attrs[ATTRS.apodization_lb] == 4.0
        assert out.attrs[ATTRS.reference_frequency] == 100.0


class TestSharding:
    def test_eight_device_mesh(self):
        assert len(jax.devices()) >= 8

    @pytest.mark.bigcompile
    def test_sharded_matches_single_device(self):
        da = make_grid(nx=8, ny=2)
        cfg = PipelineConfig(zero_fill_to=512, lb=5.0, autophase="single")
        mesh = make_mesh(8)
        out_sharded = mrsi_pipeline(da, cfg=cfg, mesh=mesh)
        out_single = mrsi_pipeline(da, cfg=cfg, mesh=make_mesh(1))
        np.testing.assert_allclose(
            np.asarray(out_sharded.values),
            np.asarray(out_single.values),
            rtol=1e-8,
            atol=1e-10,
        )

    def test_shard_voxels_placement(self):
        mesh = make_mesh(8)
        arr = shard_voxels(np.zeros((16, 64), dtype=np.complex128), mesh)
        assert len(arr.sharding.device_set) == 8

    @pytest.mark.bigcompile
    def test_raw_pipeline_output_keeps_sharding(self):
        from xmris_tpu.parallel.pipeline import spectral_pipeline_raw

        mesh = make_mesh(8)
        rows = shard_voxels(np.ones((16, 128), dtype=np.complex128), mesh)
        t = np.arange(256) / 4000.0
        weight = np.exp(-np.pi * 5.0 * t)
        freqs = np.fft.fftshift(np.fft.fftfreq(256, d=t[1] - t[0]))
        cfg = PipelineConfig(zero_fill_to=256, lb=5.0, autophase="none")
        spec, _ = spectral_pipeline_raw(rows, weight, freqs, cfg)
        assert spec.shape == (16, 256)
        # output still distributed over all 8 devices
        assert len(spec.sharding.device_set) == 8


class TestEngineSelection:
    # Compiles the whole mrsi_pipeline twice (complex + planar engines,
    # in-graph DE autophase) — big enough that even its compile-cache
    # READ segfaults late in a long in-process compile history on a
    # 1-CPU host (2026-08-18, docs/xla_cpu_segfault.md).
    @pytest.mark.bigcompile
    def test_planar_engine_labeled_front_end(self):
        da = make_grid(nx=4, ny=2)
        cfg = PipelineConfig(zero_fill_to=512, lb=5.0, autophase="single")
        out_c = mrsi_pipeline(da, cfg=cfg, engine="complex", mesh=make_mesh(1))
        out_p = mrsi_pipeline(da, cfg=cfg, engine="planar", mesh=make_mesh(1))
        np.testing.assert_allclose(
            np.asarray(out_p.values), np.asarray(out_c.values), atol=1e-8
        )
        assert out_p.attrs[ATTRS.phase_p0] == pytest.approx(
            out_c.attrs[ATTRS.phase_p0], abs=1e-6
        )


class TestIselOuterSemantics:
    def test_two_list_indexers_are_outer(self):
        from xmris_tpu import XmrArray

        da = XmrArray(np.arange(24.0).reshape(4, 6), dims=("a", "b"))
        out = da.isel({"a": [0, 2], "b": [1, 3, 5]})
        assert out.shape == (2, 3)  # outer product, not zipped
        np.testing.assert_array_equal(
            out.values, np.arange(24.0).reshape(4, 6)[np.ix_([0, 2], [1, 3, 5])]
        )

    def test_int_plus_list(self):
        from xmris_tpu import XmrArray

        da = XmrArray(np.arange(24.0).reshape(4, 6), dims=("a", "b"))
        out = da.isel({"a": 1, "b": [0, 5]})
        assert out.dims == ("b",)
        np.testing.assert_array_equal(out.values, [6.0, 11.0])


class TestShardedPallasFit:
    @pytest.mark.bigcompile
    def test_sharded_matches_single_launch(self, tmp_path):
        """shard_map'd fused-kernel LM over 8 devices == one launch.

        Converged voxels stop updating (ok & ~done masking), so per-shard
        loop-length differences cannot change any voxel's solution.
        """
        import jax.numpy as jnp

        from tests.test_fitting import PK_CSV, make_phantom
        from xmris_tpu.fitting.lm import (
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel import lm_fit_batched_pallas_sharded, make_mesh

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=16, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            np.broadcast_to(
                external_to_internal(
                    pk.init_free, pk.lower, pk.upper, pk.kind
                ).astype(np.float32)[None, :],
                (16, pk.n_free),
            ).copy()
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)

        single = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True
        )
        mesh = make_mesh(8)
        sharded = lm_fit_batched_pallas_sharded(
            re, im, *args, mesh=mesh, max_iter=25, v_tile=2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(sharded.x_free), np.asarray(single.x_free),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.cost), np.asarray(single.cost), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.converged), np.asarray(single.converged)
        )
        # results actually shard over all 8 devices
        assert len(sharded.x_free.sharding.device_set) == 8

    @pytest.mark.bigcompile
    def test_sharded_return_hessian(self, tmp_path):
        """Sharded return_hessian hands back the same voxel-sharded GN
        Hessian the single launch computes."""
        import jax.numpy as jnp

        from tests.test_fitting import PK_CSV, make_phantom
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel import lm_fit_batched_pallas_sharded, make_mesh

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=16, n_points=256)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            np.broadcast_to(
                external_to_internal(
                    pk.init_free, pk.lower, pk.upper, pk.kind
                ).astype(np.float32)[None, :],
                (16, pk.n_free),
            ).copy()
        )
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)

        single, h_single = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            return_hessian=True,
        )
        mesh = make_mesh(8)
        sharded, h_sharded = lm_fit_batched_pallas_sharded(
            re, im, *args, mesh=mesh, max_iter=25, v_tile=2, interpret=True,
            return_hessian=True,
        )
        np.testing.assert_allclose(
            np.asarray(h_sharded), np.asarray(h_single), rtol=1e-6, atol=1e-6
        )
        assert len(h_sharded.sharding.device_set) == 8

        sds_s, _ = crlb_from_hessian(h_sharded, sharded.cost, 256)
        sds_1, _ = crlb_from_hessian(h_single, single.cost, 256)
        np.testing.assert_allclose(
            np.asarray(sds_s), np.asarray(sds_1), rtol=1e-5
        )

    def test_sharded_rejects_slab_hessian(self, tmp_path):
        """return_hessian="slab" must be rejected: shard_map concatenation
        of per-shard (n_tiles, f_pad^2, v_tile) slabs puts each shard's
        lane padding mid-batch, silently misattributing voxels in
        slab_to_bff / crlb_from_hessian_slab."""
        import jax.numpy as jnp

        from tests.test_fitting import PK_CSV
        from xmris_tpu.fitting.lm import external_to_internal, hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel import lm_fit_batched_pallas_sharded, make_mesh

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        )
        u0 = jnp.broadcast_to(u0[None, :], (8, pk.n_free))
        z = jnp.zeros((8, 256), jnp.float32)
        t = jnp.asarray((np.arange(256) / 10000.0).astype(np.float32))
        with pytest.raises(ValueError, match="slab"):
            lm_fit_batched_pallas_sharded(
                z, z, t, u0,
                jnp.asarray(pk.lower), jnp.asarray(pk.upper),
                jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
                mesh=make_mesh(8), max_iter=2, v_tile=1, interpret=True,
                return_hessian="slab",
            )

    def test_batch_must_divide_mesh(self, tmp_path):
        import jax.numpy as jnp

        from tests.test_fitting import PK_CSV
        from xmris_tpu.fitting.lm import external_to_internal, hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel import lm_fit_batched_pallas_sharded, make_mesh

        p = tmp_path / "pk.csv"
        p.write_text(PK_CSV)
        pk = load_prior_knowledge(p)
        u0 = jnp.asarray(
            external_to_internal(
                pk.init_free, pk.lower, pk.upper, pk.kind
            ).astype(np.float32)
        )
        with pytest.raises(ValueError, match="divide"):
            lm_fit_batched_pallas_sharded(
                jnp.zeros((6, 64), jnp.float32), jnp.zeros((6, 64), jnp.float32),
                jnp.linspace(0, 1, 64), u0,
                jnp.asarray(pk.lower), jnp.asarray(pk.upper),
                jnp.asarray(pk.kind), hashable_pmap(pk.pmap), 120.0,
                mesh=make_mesh(8), interpret=True,
            )


class TestShardedFlagship:
    """The FUSED per-grid program (spectra + single-pivot autophase + LS
    seeding + pallas LM fit + CRLB — what BENCH measures) over the 8-device
    mesh, parity-checked against the single-device program.  The only
    collective is the autophase pivot election
    (``process._autophase_single_collective``)."""

    FIXED_G_CSV = (
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

    def _setup(self, tmp_path, n_vox=16, n_points=256, zf=512, sw=10000.0):
        import jax.numpy as jnp

        from tests.test_fitting import make_phantom
        from xmris_tpu.fitting.amares import seed_plan, template_optimum
        from xmris_tpu.fitting.lm import hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge

        p = tmp_path / "pk.csv"
        p.write_text(self.FIXED_G_CSV)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=n_vox, n_points=n_points, sw=sw)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t_np = (np.arange(n_points) / sw).astype(np.float32)
        t = jnp.asarray(t_np)
        x_template = jnp.asarray(
            template_optimum(fids, pk, t, 120.0).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)

        t_full = np.arange(zf) / sw
        weight = jnp.asarray(np.exp(-np.pi * 5.0 * t_full), dtype=jnp.float32)
        freqs = jnp.asarray(
            np.fft.fftshift(np.fft.fftfreq(zf, d=1 / sw)), dtype=jnp.float32
        )
        args = (
            jnp.asarray(np.ascontiguousarray(fids.real)),
            jnp.asarray(np.ascontiguousarray(fids.imag)),
            weight, freqs, t, x_template,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
        )
        kwargs = dict(
            pmap_static=hashable_pmap(pk.pmap), mhz=120.0,
            amp_slots=amp_slots, ls_plan=ls_plan, max_iter=16,
            v_tile=2, interpret=True, uniform_t_ok=True,
        )
        return args, kwargs

    @pytest.mark.bigcompile
    def test_sharded_matches_single_device(self, tmp_path):
        from xmris_tpu.parallel import make_mesh
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import (
            process_grid_planar_raw,
            process_grid_sharded,
        )

        args, kwargs = self._setup(tmp_path)
        cfg = PipelineConfig(
            zero_fill_to=512, lb=5.0, autophase="single", de_maxiter=30
        )
        single = process_grid_planar_raw(*args, cfg=cfg, **kwargs)
        sharded = process_grid_sharded(
            *args, mesh=make_mesh(8), cfg=cfg, **kwargs
        )

        s_sr, s_si, (s_p0, s_p1, s_piv), s_x, s_cost, s_conv, s_sds = single
        d_sr, d_si, (d_p0, d_p1, d_piv), d_x, d_cost, d_conv, d_sds = sharded

        # pivot election: same winning bin, same phases (deterministic DE)
        assert float(d_piv) == float(s_piv)
        assert abs(float(d_p0) - float(s_p0)) < 0.1
        assert abs(float(d_p1) - float(s_p1)) < 2.0
        scale = float(np.abs(np.asarray(s_sr)).max())
        np.testing.assert_allclose(
            np.asarray(d_sr), np.asarray(s_sr), atol=5e-3 * scale
        )
        np.testing.assert_allclose(
            np.asarray(d_si), np.asarray(s_si), atol=5e-3 * scale
        )
        np.testing.assert_allclose(
            np.asarray(d_x), np.asarray(s_x), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(d_cost), np.asarray(s_cost), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(d_conv), np.asarray(s_conv)
        )
        np.testing.assert_allclose(
            np.asarray(d_sds), np.asarray(s_sds), rtol=1e-3, atol=1e-5
        )
        # outputs really shard over all 8 devices
        assert len(d_sr.sharding.device_set) == 8
        assert len(d_x.sharding.device_set) == 8

    @pytest.mark.bigcompile
    def test_sharded_no_autophase_and_all(self, tmp_path):
        """autophase='none' shards trivially; 'all' stays fully per-voxel
        (phases come back voxel-sharded)."""
        from xmris_tpu.parallel import make_mesh
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import (
            process_grid_planar_raw,
            process_grid_sharded,
        )

        args, kwargs = self._setup(tmp_path)
        mesh = make_mesh(8)

        cfg = PipelineConfig(zero_fill_to=512, lb=5.0, autophase="none")
        single = process_grid_planar_raw(*args, cfg=cfg, **kwargs)
        sharded = process_grid_sharded(*args, mesh=mesh, cfg=cfg, **kwargs)
        scale = float(np.abs(np.asarray(single[0])).max())
        np.testing.assert_allclose(
            np.asarray(sharded[0]), np.asarray(single[0]), atol=1e-4 * scale
        )
        np.testing.assert_allclose(
            np.asarray(sharded[3]), np.asarray(single[3]), rtol=1e-4, atol=1e-4
        )

        cfg_all = PipelineConfig(
            zero_fill_to=512, lb=5.0, autophase="all",
            ap_optimizer="grid", p0_only=True,
        )
        sh_all = process_grid_sharded(*args, mesh=mesh, cfg=cfg_all, **kwargs)
        p0s = np.asarray(sh_all[2][0])
        assert p0s.shape == (16,)
        assert len(sh_all[2][0].sharding.device_set) == 8

    @pytest.mark.bigcompile
    def test_sharded_stacked_grid_matches_single_device(self, tmp_path):
        """The bench-default combo — stacked spectral layout + grid
        single-mode autophase + Pallas SPD — shards with exact pivot
        election parity (the stacked (B, n2, n1) blocks stay kernel-native
        per shard; only the candidate row and the phase ramp reshape)."""
        from xmris_tpu.parallel import make_mesh
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import (
            process_grid_planar_raw,
            process_grid_sharded,
        )

        args, kwargs = self._setup(tmp_path)
        cfg = PipelineConfig(
            zero_fill_to=512, lb=5.0, autophase="single",
            dft_variant="pallas", spec_layout="stacked",
            ap_optimizer="grid",
        )
        single = process_grid_planar_raw(*args, cfg=cfg, **kwargs)
        sharded = process_grid_sharded(
            *args, mesh=make_mesh(8), cfg=cfg, **kwargs
        )

        s_sr, s_si, (s_p0, s_p1, s_piv), s_x, _, s_conv, s_sds = single
        d_sr, d_si, (d_p0, d_p1, d_piv), d_x, _, d_conv, d_sds = sharded

        assert d_sr.shape == s_sr.shape and d_sr.ndim == 3  # stacked blocks
        assert float(d_piv) == float(s_piv)
        assert abs(float(d_p0) - float(s_p0)) < 0.1
        assert abs(float(d_p1) - float(s_p1)) < 2.0
        scale = float(np.abs(np.asarray(s_sr)).max())
        np.testing.assert_allclose(
            np.asarray(d_sr), np.asarray(s_sr), atol=5e-3 * scale
        )
        np.testing.assert_allclose(
            np.asarray(d_si), np.asarray(s_si), atol=5e-3 * scale
        )
        np.testing.assert_allclose(
            np.asarray(d_x), np.asarray(s_x), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(d_conv), np.asarray(s_conv))
        np.testing.assert_allclose(
            np.asarray(d_sds), np.asarray(s_sds), rtol=1e-3, atol=1e-5
        )
        assert len(d_sr.sharding.device_set) == 8

    def test_batch_must_divide_mesh(self, tmp_path):
        from xmris_tpu.parallel import make_mesh
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import process_grid_sharded

        args, kwargs = self._setup(tmp_path, n_vox=6)
        cfg = PipelineConfig(zero_fill_to=512, lb=5.0, autophase="none")
        with pytest.raises(ValueError, match="divide"):
            process_grid_sharded(*args, mesh=make_mesh(8), cfg=cfg, **kwargs)
