"""Round-2 TPU measurement session: DFT variants, pipeline stages, LM kernels.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r2.jsonl``, so a wedge mid-run loses nothing already measured.

Run on the default (axon) platform:   python scripts/tpu_experiments.py
Select experiment groups:             XMT_EXP=dft,pipeline python ...
Groups: dft, pipeline, fit2 (2-peak kernels), fit5 (5-peak kernels).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r2.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp

    for k, v in (
        ("jax_compilation_cache_dir", "/root/.cache/jax_xmt"),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
    ):
        try:
            jax.config.update(k, v)
        except Exception:
            pass

    backend = jax.default_backend()
    report("session", backend=backend, devices=len(jax.devices()))

    def timeit(fn, iters=5):
        t0 = time.perf_counter()
        fn()  # compile + witness
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), compile_s

    # ---- shared inputs (bench scale) -------------------------------------
    import bench

    B = int(os.environ.get("XMT_SCALE_B", "16384"))  # reduce for CPU smoke
    NT, ZF, SW, MHZ = bench.N_TIME, bench.ZERO_FILL, bench.SW, bench.MHZ
    fids, weight, freqs = bench.make_inputs()
    fids = fids[:B]
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))

    groups = set(
        (os.environ.get("XMT_EXP") or "dft,pipeline,fit5,fit2").split(",")
    )

    # ---- 1. DFT variants --------------------------------------------------
    if "dft" in groups:
        from xmris_tpu.ops.kernels.dft import dft_planar

        # zero-filled input (what the pipeline feeds the DFT)
        pad = np.zeros((B, ZF - NT), np.float32)
        zre = jnp.asarray(np.concatenate([re_h, pad], axis=1))
        zim = jnp.asarray(np.concatenate([im_h, pad], axis=1))
        # host oracle on a slice for accuracy measurement
        sl = slice(0, 64)
        host = np.fft.fft(
            (np.asarray(zre[sl]) + 1j * np.asarray(zim[sl])).astype(np.complex128),
            axis=-1, norm="ortho",
        )
        host_scale = np.max(np.abs(host))

        for variant in ("einsum", "flat", "block", "full"):
            for prec_name in ("highest", "default"):
                prec = (
                    jax.lax.Precision.HIGHEST
                    if prec_name == "highest"
                    else jax.lax.Precision.DEFAULT
                )

                @jax.jit
                def run(r, i, _v=variant, _p=prec):
                    orr, oii = dft_planar(r, i, ZF, variant=_v, precision=_p)
                    return orr, oii

                def go(run=run):
                    orr, oii = run(zre, zim)
                    return float(jnp.sum(orr[0]) + jnp.sum(oii[0]))

                try:
                    t_med, t_comp = timeit(go)
                    orr, oii = run(zre, zim)
                    got = np.asarray(orr[sl]) + 1j * np.asarray(oii[sl])
                    err = float(np.max(np.abs(got - host)) / host_scale)
                    report(
                        f"dft/{variant}/{prec_name}",
                        ms=round(t_med * 1e3, 3),
                        compile_s=round(t_comp, 1),
                        max_rel_err=err,
                    )
                except Exception as e:  # noqa: BLE001
                    report(f"dft/{variant}/{prec_name}", error=repr(e)[:300])
        del zre, zim

    # ---- 2. pipeline stage attribution ------------------------------------
    if "pipeline" in groups:
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)

        combos = [
            ("none/einsum", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                           autophase="none")),
            ("single/einsum", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                             autophase="single")),
            ("none/block", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                          autophase="none", dft_variant="block")),
            ("single/block", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                            autophase="single",
                                            dft_variant="block")),
            ("single/block/de60", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                                 autophase="single",
                                                 dft_variant="block",
                                                 de_maxiter=60)),
            ("none/full", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                         autophase="none", dft_variant="full")),
            ("none/flat", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                         autophase="none", dft_variant="flat")),
        ]
        for tag, cfg in combos:
            def go(cfg=cfg):
                sr, si, _ = spectral_pipeline_planar_raw(re_j, im_j, w_j, f_j, cfg)
                return float(jnp.sum(sr[0]) + jnp.sum(si[0]))

            try:
                t_med, t_comp = timeit(go)
                report(f"pipeline/{tag}", ms=round(t_med * 1e3, 3),
                       compile_s=round(t_comp, 1))
            except Exception as e:  # noqa: BLE001
                report(f"pipeline/{tag}", error=repr(e)[:300])

    # ---- 3/4. LM kernels on 2-peak and 5-peak priors ----------------------
    def fit_group(pk_csv: str, tag: str, kernel_versions=(2, 3)):
        import tempfile

        from xmris_tpu.fitting.lm import (
            crlb_batched_pallas,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(pk_csv)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        ps = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))

        chunk = min(4096, B)
        re_c = jnp.asarray(re_h[:chunk])
        im_c = jnp.asarray(im_h[:chunk])

        # template-seeded inits via the shared fit_amares helper
        from xmris_tpu.fitting.amares import template_seeded_x0

        x0 = template_seeded_x0(fids[:chunk], pk, t, MHZ)
        u0_seeded = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        u0_naive = jnp.asarray(
            np.broadcast_to(
                external_to_internal(
                    pk.init_free, pk.lower, pk.upper, pk.kind
                ).astype(np.float32)[None, :],
                (chunk, pk.n_free),
            ).copy()
        )

        for kv in kernel_versions:
            for init_tag, u0 in (("seeded", u0_seeded), ("naive", u0_naive)):
                for max_iter in (32, 16) if init_tag == "seeded" else (32,):
                    def go(kv=kv, u0=u0, max_iter=max_iter):
                        res = lm_fit_batched_pallas(
                            re_c, im_c, t, u0, lower, upper, kind, ps, MHZ,
                            max_iter=max_iter, kernel_version=kv,
                        )
                        return res

                    try:
                        t0 = time.perf_counter()
                        res = go()
                        cost = float(jnp.sum(res.cost))
                        comp = time.perf_counter() - t0
                        ts = []
                        for _ in range(3):
                            t0 = time.perf_counter()
                            res = go()
                            float(jnp.sum(res.cost))
                            ts.append(time.perf_counter() - t0)
                        n_it = np.asarray(res.n_iter)
                        report(
                            f"fit/{tag}/v{kv}/{init_tag}/mi{max_iter}",
                            ms=round(float(np.median(ts)) * 1e3, 1),
                            compile_s=round(comp, 1),
                            total_cost=cost,
                            done_frac=float(np.mean(np.asarray(res.done))),
                            n_iter_p50=float(np.percentile(n_it, 50)),
                            n_iter_p90=float(np.percentile(n_it, 90)),
                            n_iter_max=int(n_it.max()),
                        )
                    except Exception as e:  # noqa: BLE001
                        report(
                            f"fit/{tag}/v{kv}/{init_tag}/mi{max_iter}",
                            error=repr(e)[:300],
                        )

            # CRLB kernel timing
            def go_crlb(kv=kv):
                res = lm_fit_batched_pallas(
                    re_c, im_c, t, u0_seeded, lower, upper, kind, ps, MHZ,
                    max_iter=16, kernel_version=kv,
                )
                sds, _ = crlb_batched_pallas(
                    re_c, im_c, t, res.x_free, ps, MHZ, kernel_version=kv
                )
                return float(jnp.sum(sds))

            try:
                t_med, t_comp = timeit(go_crlb, iters=3)
                report(f"fit+crlb/{tag}/v{kv}", ms=round(t_med * 1e3, 1),
                       compile_s=round(t_comp, 1))
            except Exception as e:  # noqa: BLE001
                report(f"fit+crlb/{tag}/v{kv}", error=repr(e)[:300])

    # ---- 5. dispatch floor + chained device-time measurements -------------
    if "floor" in groups:
        tiny = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def noop(x):
            return x + 1.0

        def go():
            return float(jnp.sum(noop(tiny)))

        t_med, t_comp = timeit(go, iters=10)
        report("floor/noop_roundtrip", ms=round(t_med * 1e3, 3))

    if "chain" in groups:
        # Queue K async executions, readback once: per-call device time with
        # the tunnel latency amortized (what a local-TPU deployment sees).
        from xmris_tpu.ops.kernels.dft import dft_planar
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw

        K = 10
        pad = np.zeros((B, ZF - NT), np.float32)
        zre = jnp.asarray(np.concatenate([re_h, pad], axis=1))
        zim = jnp.asarray(np.concatenate([im_h, pad], axis=1))

        for variant, prec_name in (
            ("einsum", "highest"), ("einsum", "default"),
            ("block", "highest"), ("full", "highest"), ("full", "default"),
        ):
            prec = (
                jax.lax.Precision.HIGHEST
                if prec_name == "highest"
                else jax.lax.Precision.DEFAULT
            )

            @jax.jit
            def run(r, i, _v=variant, _p=prec):
                return dft_planar(r, i, ZF, variant=_v, precision=_p)

            try:
                orr, oii = run(zre, zim)
                float(jnp.sum(orr[0]))  # compile + witness
                t0 = time.perf_counter()
                for _ in range(K):
                    orr, oii = run(zre, zim)
                float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
                per = (time.perf_counter() - t0) / K
                report(f"chain/dft/{variant}/{prec_name}",
                       ms_per_call=round(per * 1e3, 3))
            except Exception as e:  # noqa: BLE001
                report(f"chain/dft/{variant}/{prec_name}", error=repr(e)[:300])

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        for tag, cfg in (
            ("none/einsum", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                           autophase="none")),
            ("single/einsum", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                             autophase="single")),
            ("none/full", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                         autophase="none", dft_variant="full")),
            ("single/full", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                           autophase="single",
                                           dft_variant="full")),
        ):
            try:
                sr, si, _ = spectral_pipeline_planar_raw(re_j, im_j, w_j, f_j, cfg)
                float(jnp.sum(sr[0]))
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, _ = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                per = (time.perf_counter() - t0) / K
                report(f"chain/pipeline/{tag}", ms_per_call=round(per * 1e3, 3))
            except Exception as e:  # noqa: BLE001
                report(f"chain/pipeline/{tag}", error=repr(e)[:300])

    if "prec" in groups:
        # HIGH = bf16_3x passes; is it accurate enough (<=1e-6 rel) and how
        # fast?  Plus the fused rect-DFT variant and the chained recon.
        from xmris_tpu.ops.kernels.dft import (
            dft_planar,
            dft_rect_shifted_planar,
        )
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw

        K = 10
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)

        # accuracy oracle for the fused transform (first 64 rows)
        sl = slice(0, 64)
        padded = np.zeros((64, ZF), complex)
        padded[:, :NT] = (re_h[sl] + 1j * im_h[sl]).astype(np.complex128)
        host = np.fft.fftshift(
            np.fft.fft(padded, axis=-1, norm="ortho"), axes=-1
        )
        host_scale = np.max(np.abs(host))

        PRECS = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }
        for prec_name, prec in PRECS.items():
            @jax.jit
            def run(r, i, _p=prec):
                return dft_rect_shifted_planar(r, i, ZF, precision=_p)

            try:
                orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]))
                got = np.asarray(orr[sl]) + 1j * np.asarray(oii[sl])
                err = float(np.max(np.abs(got - host)) / host_scale)
                t0 = time.perf_counter()
                for _ in range(K):
                    orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
                per = (time.perf_counter() - t0) / K
                report(f"prec/fused/{prec_name}",
                       ms_per_call=round(per * 1e3, 3), max_rel_err=err)
            except Exception as e:  # noqa: BLE001
                report(f"prec/fused/{prec_name}", error=repr(e)[:300])

        # einsum standalone at HIGH (is the 49.8ms highest -> ~25 at high?)
        @jax.jit
        def run_e(r, i):
            pad = jnp.zeros((r.shape[0], ZF - NT), r.dtype)
            return dft_planar(
                jnp.concatenate([r, pad], 1), jnp.concatenate([i, pad], 1),
                ZF, precision=jax.lax.Precision.HIGH,
            )

        try:
            orr, oii = run_e(re_j, im_j)
            float(jnp.sum(orr[0]))
            t0 = time.perf_counter()
            for _ in range(K):
                orr, oii = run_e(re_j, im_j)
            float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
            report("prec/einsum/high",
                   ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            report("prec/einsum/high", error=repr(e)[:300])

        # fused pipeline end-to-end (with autophase), chained
        for tag, cfg in (
            ("single/fused", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                            autophase="single",
                                            dft_variant="fused")),
            ("none/fused", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                          autophase="none",
                                          dft_variant="fused")),
        ):
            try:
                sr, si, _ = spectral_pipeline_planar_raw(re_j, im_j, w_j, f_j, cfg)
                float(jnp.sum(sr[0]))
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, _ = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                report(f"prec/pipeline/{tag}",
                       ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3))
            except Exception as e:  # noqa: BLE001
                report(f"prec/pipeline/{tag}", error=repr(e)[:300])

        # recon (8-coil 256^2 iFFT + RSS) chained
        from xmris_tpu.recon.kspace import rss_reconstruct_planar_raw

        rng = np.random.default_rng(0)
        kr = jnp.asarray(rng.normal(size=(8, 256, 256)).astype(np.float32))
        ki = jnp.asarray(rng.normal(size=(8, 256, 256)).astype(np.float32))

        @jax.jit
        def run_recon(a, b):
            return rss_reconstruct_planar_raw(a, b, axes=(1, 2), coil_axis=0)

        try:
            out = run_recon(kr, ki)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(K):
                out = run_recon(kr, ki)
            float(jnp.sum(out))
            report("prec/recon/chained",
                   ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            report("prec/recon/chained", error=repr(e)[:300])

    if "fitprof" in groups:
        # Attribute fit time: fused kernel alone vs full LM iterations.
        import tempfile

        from xmris_tpu.fitting.lm import (
            _expand_params_batched,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v3,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        ps = hashable_pmap(pk.pmap)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_all = jnp.asarray(re_h)
        im_all = jnp.asarray(im_h)
        grids = jnp.asarray(
            _expand_params_batched(
                jnp.asarray(
                    np.broadcast_to(
                        pk.init_free.astype(np.float32)[None, :],
                        (B, pk.n_free),
                    ).copy()
                ),
                ps, jnp.float32,
            )
        )

        K = 20
        for vt in (8, 16):
            try:
                c, g, h = eq6_normal_equations_pallas_v3(
                    grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                    v_tile=vt,
                )
                float(jnp.sum(c))
                t0 = time.perf_counter()
                for _ in range(K):
                    c, g, h = eq6_normal_equations_pallas_v3(
                        grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                        v_tile=vt,
                    )
                float(jnp.sum(c))
                report(f"fitprof/kernel_only/v3/vt{vt}",
                       ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 2))
            except Exception as e:  # noqa: BLE001
                report(f"fitprof/kernel_only/v3/vt{vt}", error=repr(e)[:300])

        # full LM: 1 vs 5 iterations -> per-iteration driver cost by diff
        from xmris_tpu.fitting.amares import template_seeded_x0

        x0 = template_seeded_x0(fids, pk, t, MHZ)
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        for mi in (1, 5):
            try:
                res = lm_fit_batched_pallas(
                    re_all, im_all, t, u0, lower, upper, kind, ps, MHZ,
                    max_iter=mi, kernel_version=3,
                )
                float(jnp.sum(res.cost))
                t0 = time.perf_counter()
                for _ in range(6):
                    res = lm_fit_batched_pallas(
                        re_all, im_all, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=mi, kernel_version=3,
                    )
                float(jnp.sum(res.cost))
                report(f"fitprof/lm/mi{mi}",
                       ms_per_call=round((time.perf_counter() - t0) / 6 * 1e3, 2))
            except Exception as e:  # noqa: BLE001
                report(f"fitprof/lm/mi{mi}", error=repr(e)[:300])

    if "fitbig" in groups:
        # Full 16384-voxel grid in ONE pallas launch with the rejection-
        # streak termination: the loop should now exit at ~n_iter_max+6.
        import tempfile

        from xmris_tpu.fitting.lm import (
            crlb_batched_pallas,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        ps = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))

        from xmris_tpu.fitting.amares import template_seeded_x0

        x0 = template_seeded_x0(fids, pk, t, MHZ)
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        re_all = jnp.asarray(re_h)
        im_all = jnp.asarray(im_h)

        kv_list = [
            int(v)
            for v in os.environ.get("XMT_FITBIG_KV", "6,5").split(",")
        ]
        fit_vt = int(os.environ.get("XMT_FITBIG_VT", "8"))
        for kv, mi in [(kv, 24) for kv in kv_list]:
            def go(kv=kv, mi=mi):
                res = lm_fit_batched_pallas(
                    re_all, im_all, t, u0, lower, upper, kind, ps, MHZ,
                    max_iter=mi, kernel_version=kv, v_tile=fit_vt,
                )
                sds, _ = crlb_batched_pallas(
                    re_all, im_all, t, res.x_free, ps, MHZ, kernel_version=kv,
                    v_tile=fit_vt,
                )
                return res, float(jnp.sum(sds))

            try:
                t0 = time.perf_counter()
                res, _ = go()
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    res, _ = go()
                    ts.append(time.perf_counter() - t0)
                n_it = np.asarray(res.n_iter)
                report(
                    f"fitbig/5peak/v{kv}/mi{mi}/vt{fit_vt}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=float(jnp.sum(res.cost)),
                    done_frac=float(np.mean(np.asarray(res.done))),
                    n_iter_p50=float(np.percentile(n_it, 50)),
                    n_iter_max=int(n_it.max()),
                )
            except Exception as e:  # noqa: BLE001
                report(f"fitbig/5peak/v{kv}/mi{mi}/vt{fit_vt}", error=repr(e)[:300])

    PK2 = """Index,PCr,ATP
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

    if "spect" in groups:
        # Fused spectral Pallas kernel: accuracy + chained timing vs the
        # einsum pipeline, standalone and end-to-end, over v_tile choices.
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        K = 10

        # accuracy oracle (first 64 rows)
        sl = slice(0, 64)
        xw = (re_h[sl] + 1j * im_h[sl]).astype(np.complex128) * weight[:NT]
        host = np.fft.fftshift(
            np.fft.fft(xw, n=ZF, axis=-1, norm="ortho"), axes=-1
        )
        host_scale = np.max(np.abs(host))

        for vt, s2 in ((32, "loop"), (32, "stacked"), (64, "loop")):
            @jax.jit
            def run(r, i, _vt=vt, _s2=s2):
                return spectrum_pallas(
                    r, i, ZF, window=w_j[:NT], v_tile=_vt, s2=_s2
                )

            try:
                orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]))
                got = np.asarray(orr[sl]) + 1j * np.asarray(oii[sl])
                err = float(np.max(np.abs(got - host)) / host_scale)
                t0 = time.perf_counter()
                for _ in range(K):
                    orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
                report(
                    f"spect/kernel/vt{vt}/{s2}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                    max_rel_err=err,
                )
            except Exception as e:  # noqa: BLE001
                report(f"spect/kernel/vt{vt}/{s2}", error=repr(e)[:300])

        for tag, cfg in (
            ("none/pallas", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                           autophase="none",
                                           dft_variant="pallas")),
            ("single/pallas", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                             autophase="single",
                                             dft_variant="pallas")),
            ("none/flat", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                         autophase="none",
                                         dft_variant="flat")),
            ("none/block", PipelineConfig(zero_fill_to=ZF, lb=5.0,
                                          autophase="none",
                                          dft_variant="block")),
        ):
            try:
                sr, si, _ = spectral_pipeline_planar_raw(
                    re_j, im_j, w_j, f_j, cfg
                )
                float(jnp.sum(sr[0]))
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, _ = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                report(
                    f"spect/pipeline/{tag}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                )
            except Exception as e:  # noqa: BLE001
                report(f"spect/pipeline/{tag}", error=repr(e)[:300])

    if "prec2" in groups:
        # Pipeline at Precision.HIGH: the CT stages contract only 32-64
        # elements, so 3-pass bf16 may stay under the 1e-6 parity bar at
        # roughly half the MXU passes of HIGHEST.
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        K = 10

        sl = slice(0, 64)
        xw = (re_h[sl] + 1j * im_h[sl]).astype(np.complex128) * weight[:NT]
        host = np.fft.fftshift(
            np.fft.fft(xw, n=ZF, axis=-1, norm="ortho"), axes=-1
        )
        host_scale = np.max(np.abs(host))

        for prec in ("high", "highest", "default"):
            cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="none",
                                 dft_precision=prec)
            try:
                sr, si, _ = spectral_pipeline_planar_raw(
                    re_j, im_j, w_j, f_j, cfg
                )
                float(jnp.sum(sr[0]))
                got = np.asarray(sr[sl]) + 1j * np.asarray(si[sl])
                err = float(np.max(np.abs(got - host)) / host_scale)
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, _ = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                report(
                    f"prec2/pipeline/none/einsum/{prec}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                    max_rel_err=err,
                )
            except Exception as e:  # noqa: BLE001
                report(f"prec2/pipeline/none/einsum/{prec}",
                       error=repr(e)[:300])

    if "devtime" in groups:
        # True device time: K pipeline iterations inside ONE jit (single
        # dispatch), feeding each output back as the next input — the
        # chained-dispatch floor through the relay is ~4.5 ms/call, which
        # buries sub-10ms kernels.
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        K = 20

        for tag in ("einsum", "pallas", "fused", "flat"):
            cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="none",
                                 dft_variant=tag)

            @jax.jit
            def loop(r, i, _cfg=cfg):
                def body(_, carry):
                    rr, ii = carry
                    sr, si, _ = spectral_pipeline_planar_raw(
                        rr, ii, w_j, f_j, _cfg
                    )
                    # feed back the first half, renormalized to stay finite
                    s = 1.0 / jnp.maximum(jnp.max(jnp.abs(sr)), 1e-6)
                    return (sr[:, :NT] * s, si[:, :NT] * s)

                return jax.lax.fori_loop(0, K, body, (r, i))

            try:
                out = loop(re_j, im_j)
                float(jnp.sum(out[0]))  # compile + witness
                t0 = time.perf_counter()
                out = loop(re_j, im_j)
                float(jnp.sum(out[0]) + jnp.sum(out[1]))
                per = (time.perf_counter() - t0 - 0.042) / K  # minus floor
                report(f"devtime/pipeline/{tag}",
                       ms_per_iter=round(per * 1e3, 3))
            except Exception as e:  # noqa: BLE001
                report(f"devtime/pipeline/{tag}", error=repr(e)[:300])

    if "fit6" in groups:
        # v6 stacked-Gram kernel: kernel-only timing vs v5, plus the
        # converged-tile skip benefit at representative done fractions.
        import tempfile

        from xmris_tpu.fitting.lm import (
            _expand_params_batched,
            hashable_pmap,
        )
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v5,
            eq6_normal_equations_pallas_v6,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        ps = hashable_pmap(pk.pmap)
        from xmris_tpu.fitting.lm import active_param_rows, lorentzian_env_flags

        active = active_param_rows(ps)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_all = jnp.asarray(re_h)
        im_all = jnp.asarray(im_h)
        grids = jnp.asarray(
            _expand_params_batched(
                jnp.asarray(
                    np.broadcast_to(
                        pk.init_free.astype(np.float32)[None, :],
                        (B, pk.n_free),
                    ).copy()
                ),
                ps, jnp.float32,
            )
        )

        K = 20

        def chain(fn, tag):
            try:
                c, g, h = fn()
                float(jnp.sum(c))
                t0 = time.perf_counter()
                for _ in range(K):
                    c, g, h = fn()
                float(jnp.sum(c))
                report(tag,
                       ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 2))
            except Exception as e:  # noqa: BLE001
                report(tag, error=repr(e)[:300])

        chain(
            lambda: eq6_normal_equations_pallas_v5(
                grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                active=active,
            ),
            "fit6/kernel_only/v5",
        )
        for vt in (8, 16, 32):
            chain(
                lambda vt=vt: eq6_normal_equations_pallas_v6(
                    grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                    active=active, v_tile=vt,
                ),
                f"fit6/kernel_only/v6/vt{vt}",
            )
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v7,
        )

        env_fast = lorentzian_env_flags(ps)
        chain(
            lambda: eq6_normal_equations_pallas_v7(
                grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                active=active, env_fast=env_fast,
            ),
            "fit6/kernel_only/v7",
        )
        rng = np.random.default_rng(0)
        for frac in (0.5, 0.9):
            mask = jnp.asarray(rng.random(B) > frac)  # ~<frac done
            chain(
                lambda mask=mask: eq6_normal_equations_pallas_v6(
                    grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                    active=active, voxel_mask=mask,
                ),
                f"fit6/kernel_only/v6/done{frac}",
            )
        # Spatially-clustered done mask (tile-aligned: the realistic best case)
        tile_mask = np.zeros(B, bool)
        tile_mask[: B // 10] = True
        chain(
            lambda: eq6_normal_equations_pallas_v6(
                grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                active=active, voxel_mask=jnp.asarray(tile_mask),
            ),
            "fit6/kernel_only/v6/tiles10pct",
        )

    if "fitattr" in groups:
        # Attribute the v6 kernel's ~8 ms: scale n_t (per-element work
        # halves; fixed per-program cost doesn't) and n_peaks (basis/
        # Jacobian VPU work scales ~K; Gram dots scale with A_pad).
        import tempfile

        from xmris_tpu.fitting.lm import (
            _expand_params_batched,
            active_param_rows,
            hashable_pmap,
        )
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v6,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        PK1 = """Index,PCr
Initial Values,
amplitude,10.0
chemicalshift,0.0
linewidth,15.0
phase,0
g,0
Bounds,
amplitude,"(0, "
chemicalshift,"(-0.5, 0.5)"
linewidth,"(5.0, 30.0)"
phase,"(-180, 180)"
g,fixed
"""

        def kernel_chain(pk_csv, tag, n_t):
            with tempfile.NamedTemporaryFile(
                "w", suffix=".csv", delete=False
            ) as f:
                f.write(pk_csv)
                pk_path = f.name
            pk = load_prior_knowledge(pk_path)
            ps = hashable_pmap(pk.pmap)
            active = active_param_rows(ps)
            t = jnp.asarray((np.arange(n_t) / SW).astype(np.float32))
            re_all = jnp.asarray(re_h[:, :n_t])
            im_all = jnp.asarray(im_h[:, :n_t])
            grids = jnp.asarray(
                _expand_params_batched(
                    jnp.asarray(
                        np.broadcast_to(
                            pk.init_free.astype(np.float32)[None, :],
                            (B, pk.n_free),
                        ).copy()
                    ),
                    ps, jnp.float32,
                )
            )
            K = 20
            try:
                c, g, h = eq6_normal_equations_pallas_v6(
                    grids, re_all, im_all, t, n_peaks=pk.n_peaks, mhz=MHZ,
                    active=active,
                )
                float(jnp.sum(c))
                t0 = time.perf_counter()
                for _ in range(K):
                    c, g, h = eq6_normal_equations_pallas_v6(
                        grids, re_all, im_all, t, n_peaks=pk.n_peaks,
                        mhz=MHZ, active=active,
                    )
                float(jnp.sum(c))
                report(tag,
                       ms_per_call=round(
                           (time.perf_counter() - t0) / K * 1e3, 2))
            except Exception as e:  # noqa: BLE001
                report(tag, error=repr(e)[:300])

        kernel_chain(bench.PK_CSV, "fitattr/k5/nt1024", 1024)
        kernel_chain(bench.PK_CSV, "fitattr/k5/nt512", 512)
        kernel_chain(PK1, "fitattr/k1/nt1024", 1024)

    if "fit5" in groups:
        fit_group(bench.PK_CSV, "5peak")
    if "fit2" in groups:
        fit_group(PK2, "2peak")

    report("done")


if __name__ == "__main__":
    main()
