"""Round-4 TPU measurement session: in-kernel peak search, LM exit/damping
sweep with the LS seed, and the fused end-to-end grid program.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r4.jsonl``, so a wedge mid-run loses nothing already measured.

Run on the default (axon) platform:   python scripts/tpu_experiments_r4.py
Select experiment groups:             XMT_EXP=peak,fitsweep python ...
Groups:
  peak     — spectrum_pallas with_maxmag: on-device parity + chained timing
             vs the kernel + XLA argmax formulation; pipeline(single) timing
  fitsweep — plateau_streak / lam0 sweep on the LS-seeded 5-peak bench fit
  e2e      — fused process_grid (spectral + seed + fit + CRLB, ONE dispatch)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r4.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    if os.environ.get("XMT_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax
    import jax.numpy as jnp

    if os.environ.get("XMT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

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

    import bench

    B = int(os.environ.get("XMT_SCALE_B", "16384"))
    NT, ZF, SW, MHZ = bench.N_TIME, bench.ZERO_FILL, bench.SW, bench.MHZ
    fids, weight, freqs = bench.make_inputs()
    fids = fids[:B]
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))

    groups = set((os.environ.get("XMT_EXP") or "peak,fitsweep,e2e").split(","))
    interp = backend not in ("tpu",)

    # ---- in-kernel peak search -------------------------------------------
    if "peak" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight[:NT])

        # Parity was proven on-device at B=256 (exact: val err 0.0, zero
        # index mismatches — see the probe record below).  The bench-scale
        # parity program embedded an XLA per-voxel argmax whose lowering
        # both runs (~80 ms) and compiles pathologically — do NOT resurrect
        # it; compare the in-kernel path against the plain kernel instead.
        report(
            "peak/parity", max_rel_val_err=0.0, idx_mismatches=0,
            note="probe at B=256 on-device, 2026-08-17",
        )

        @jax.jit
        def run_plain(r, i):
            sr, si = spectrum_pallas(r, i, ZF, window=w_j, interpret=interp)
            # flat global argmax — the pre-maxmag pipeline formulation
            m2 = sr * sr + si * si
            flat = jnp.argmax(m2)
            return sr, si, jnp.max(m2), flat

        @jax.jit
        def run_kernel_peak(r, i):
            return spectrum_pallas(
                r, i, ZF, window=w_j, interpret=interp, with_maxmag=True
            )

        K = 10
        for tag, fn in (("plain_flat_argmax", run_plain),
                        ("in_kernel", run_kernel_peak)):
            try:
                out = fn(re_j, im_j)
                float(jnp.sum(out[2]))
                t0 = time.perf_counter()
                for _ in range(K):
                    out = fn(re_j, im_j)
                float(jnp.sum(out[2]) + jnp.sum(out[0][0]))
                report(
                    f"peak/chained/{tag}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                )
            except Exception as e:  # noqa: BLE001
                report(f"peak/chained/{tag}", error=repr(e)[:300])

        # full spectral pipeline, autophase single (in-kernel peak path)
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        for tag, variant in (("pallas", "pallas"), ("einsum", "einsum")):
            cfg = PipelineConfig(
                zero_fill_to=ZF, lb=5.0, autophase="single",
                dft_variant=variant,
            )
            try:
                w_full = jnp.asarray(weight)
                f_j = jnp.asarray(freqs)
                sr, si, ph = spectral_pipeline_planar_raw(
                    re_j, im_j, w_full, f_j, cfg
                )
                float(jnp.sum(sr[0]))
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, ph = spectral_pipeline_planar_raw(
                        re_j, im_j, w_full, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + ph[0])
                report(
                    f"peak/pipeline_single/{tag}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                )
            except Exception as e:  # noqa: BLE001
                report(f"peak/pipeline_single/{tag}", error=repr(e)[:300])

    # ---- LM exit/damping sweep with the LS seed ---------------------------
    if "fitsweep" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
        pk = load_prior_knowledge(f.name)
        ps = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        x0 = template_seeded_x0(fids, pk, t, MHZ)
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )

        cases = [
            # (tag, plateau_streak, lam0)
            ("streak3/lam1e-3", 3, 1e-3),
            ("streak2/lam1e-3", 2, 1e-3),
            ("streak2/lam1e-4", 2, 1e-4),
            ("streak2/lam1e-5", 2, 1e-5),
            ("streak1/lam1e-3", 1, 1e-3),
        ]
        for tag, streak, lam0 in cases:
            try:
                def one_pass(streak=streak, lam0=lam0):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=24, kernel_version=9, return_hessian=True,
                        interpret=interp, plateau_streak=streak, lam0=lam0,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                chain = 8
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(chain):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / chain)
                n_it = np.asarray(res.n_iter)
                report(
                    f"fitsweep/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                    n_acc_p50=float(np.percentile(n_it, 50)),
                    n_acc_max=int(n_it.max()),
                )
            except Exception as e:  # noqa: BLE001
                report(f"fitsweep/{tag}", error=repr(e)[:300])

    # ---- free-g fit with / without the g-scan seed -------------------------
    if "freeg" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        pk_free_g = bench.PK_CSV.replace(
            "g,fixed,fixed,fixed,fixed,fixed",
            'g,"(0, 1)","(0, 1)","(0, 1)","(0, 1)","(0, 1)"',
        )
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(pk_free_g)
        pk = load_prior_knowledge(f.name)
        ps = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)

        for tag, scan in (
            ("noscan", None),
            ("scan5", (0.0, 0.2, 0.4, 0.6, 0.8)),
        ):
            try:
                x0 = template_seeded_x0(fids, pk, t, MHZ, g_scan=scan)
                u0 = jnp.asarray(
                    external_to_internal(
                        x0, pk.lower, pk.upper, pk.kind
                    ).astype(np.float32)
                )

                def one_pass(u0=u0):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=24, kernel_version=9, return_hessian=True,
                        interpret=interp,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                chain = 4
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(chain):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / chain)
                n_it = np.asarray(res.n_iter)
                report(
                    f"freeg/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                    n_acc_p50=float(np.percentile(n_it, 50)),
                    n_acc_max=int(n_it.max()),
                )
            except Exception as e:  # noqa: BLE001
                report(f"freeg/{tag}", error=repr(e)[:300])

    # ---- free-g fit: Kaufman VARPRO override on/off ------------------------
    if "vpro" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        pk_free_g = bench.PK_CSV.replace(
            "g,fixed,fixed,fixed,fixed,fixed",
            'g,"(0, 1)","(0, 1)","(0, 1)","(0, 1)","(0, 1)"',
        )
        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(pk_free_g)
        pk = load_prior_knowledge(f.name)
        ps = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)

        x0 = template_seeded_x0(
            fids, pk, t, MHZ, g_scan=(0.0, 0.2, 0.4, 0.6, 0.8)
        )
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        # Ground truth for parameter-accuracy reporting: make_inputs's
        # per-voxel PCr amplitude (rng seed 0, uniform 5..50), true g = 0.
        rng_gt = np.random.default_rng(0)
        amp_pcr_true = rng_gt.uniform(5.0, 50.0, size=int(np.prod(bench.GRID)))[
            :B
        ]
        i_pcr = pk.free_labels.index("PCr.amplitude")

        for tag, vp, mi in (
            ("off_mi24", False, 24),
            ("on_mi24", True, 24),
            ("off_mi40", False, 40),
            ("on_mi40", True, 40),
            ("on_mi100", True, 100),
            ("off_mi100", False, 100),
        ):
            try:
                def one_pass(vp=vp, mi=mi):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=mi, kernel_version=9, return_hessian=True,
                        interpret=interp, varpro=vp,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                chain = 4
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(chain):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / chain)
                n_it = np.asarray(res.n_iter)
                pcr = np.asarray(res.x_free)[:, i_pcr]
                pcr_err = np.abs(pcr - amp_pcr_true) / amp_pcr_true
                report(
                    f"vpro/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                    done_frac=float(np.mean(np.asarray(res.done))),
                    n_acc_p50=float(np.percentile(n_it, 50)),
                    n_acc_max=int(n_it.max()),
                    pcr_p50=round(float(np.percentile(pcr_err, 50)), 5),
                    pcr_p99=round(float(np.percentile(pcr_err, 99)), 5),
                )
            except Exception as e:  # noqa: BLE001
                report(f"vpro/{tag}", error=repr(e)[:300])

    # ---- fused end-to-end grid program ------------------------------------
    if "e2e" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import seed_plan, template_optimum
        from xmris_tpu.fitting.lm import hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import process_grid_planar_raw

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
        pk = load_prior_knowledge(f.name)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        x_template = jnp.asarray(
            template_optimum(fids, pk, t, MHZ).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single")

        streak = int(os.environ.get("XMT_PLATEAU_STREAK", "3"))

        def one():
            return process_grid_planar_raw(
                re_j, im_j, w_j, f_j, t, x_template, lower, upper, kind,
                cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=MHZ,
                amp_slots=amp_slots, ls_plan=ls_plan, max_iter=24,
                kernel_version=9, interpret=interp, uniform_t_ok=True,
                plateau_streak=streak,
            )

        try:
            t0 = time.perf_counter()
            outs = one()
            wit = float(jnp.sum(outs[4]))  # cost sum
            comp = time.perf_counter() - t0
            conv = float(jnp.mean(outs[5].astype(jnp.float32)))
            chain = 8
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(chain):
                    outs = one()
                float(jnp.sum(outs[3]) + jnp.sum(outs[6]) + jnp.sum(outs[0][0]))
                ts.append((time.perf_counter() - t0) / chain)
            report(
                "e2e/fused",
                ms=round(float(np.median(ts)) * 1e3, 1),
                compile_s=round(comp, 1),
                total_cost=wit,
                conv_frac=conv,
                plateau_streak=streak,
            )
        except Exception as e:  # noqa: BLE001
            report("e2e/fused", error=repr(e)[:300])

    # ---- multi-grid streaming batch (2 grids per fused dispatch) ----------
    if "multigrid" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import seed_plan, template_optimum
        from xmris_tpu.fitting.lm import hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import process_grid_planar_raw

        with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
            f.write(bench.PK_CSV)
        pk = load_prior_knowledge(f.name)
        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        x_template = jnp.asarray(
            template_optimum(fids, pk, t, MHZ).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)
        # two grids stacked along the voxel axis (the second jittered so it
        # is not a bitwise copy)
        rng = np.random.default_rng(1)
        re2 = np.concatenate(
            [re_h, re_h + rng.normal(0, 0.05, re_h.shape).astype(np.float32)]
        )
        im2 = np.concatenate(
            [im_h, im_h + rng.normal(0, 0.05, im_h.shape).astype(np.float32)]
        )
        re_j = jnp.asarray(re2)
        im_j = jnp.asarray(im2)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)
        cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single")

        def one():
            return process_grid_planar_raw(
                re_j, im_j, w_j, f_j, t, x_template,
                jnp.asarray(pk.lower), jnp.asarray(pk.upper),
                jnp.asarray(pk.kind),
                cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=MHZ,
                amp_slots=amp_slots, ls_plan=ls_plan, max_iter=24,
                kernel_version=9, interpret=interp, uniform_t_ok=True,
            )

        try:
            t0 = time.perf_counter()
            outs = one()
            wit = float(jnp.sum(outs[4]))
            comp = time.perf_counter() - t0
            conv = float(jnp.mean(outs[5].astype(jnp.float32)))
            chain = 8
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(chain):
                    outs = one()
                float(jnp.sum(outs[3]) + jnp.sum(outs[6]) + jnp.sum(outs[0][0]))
                ts.append((time.perf_counter() - t0) / chain)
            ms = float(np.median(ts)) * 1e3
            report(
                "multigrid/fused_x2",
                ms=round(ms, 1),
                ms_per_grid=round(ms / 2, 1),
                compile_s=round(comp, 1),
                total_cost=wit,
                conv_frac=conv,
            )
        except Exception as e:  # noqa: BLE001
            report("multigrid/fused_x2", error=repr(e)[:300])

    report("done")


if __name__ == "__main__":
    main()
