"""Round-5 TPU measurement session: grid-vs-DE per-voxel autophase at
grid scale, plus a fused-headline confirmation.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r5.jsonl``, so a wedge mid-run loses nothing already
measured.

Run on the default (axon) platform:   python scripts/tpu_experiments_r5.py
Select experiment groups:             XMT_EXP=apgrid python ...
Groups:
  apgrid — autophase mode="all" through the planar pipeline at 16384
           voxels: per-voxel DE (the r3 baseline: 1.68 s / 0.67 s
           p0-only) vs the deterministic candidate-mesh + gradient
           polish (ap_optimizer="grid")
  e2e    — fused process_grid headline re-confirmation (one config)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r5.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    # CPU smoke mode: the container sitecustomize force-sets
    # jax_platforms="axon,cpu" AFTER import, so both the env var and the
    # post-import config update are required (see CLAUDE.md).
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
    NT, ZF = bench.N_TIME, bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()
    fids = fids[:B]
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))

    groups = set((os.environ.get("XMT_EXP") or "apgrid").split(","))
    interp = backend not in ("tpu",)

    # ---- grid-vs-DE per-voxel autophase ----------------------------------
    if "apgrid" in groups:
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)

        runs = []
        for opt in ("grid", "de"):
            for p0_only in (True, False):
                runs.append(
                    (
                        f"{opt}{'_p0' if p0_only else ''}",
                        PipelineConfig(
                            zero_fill_to=ZF, lb=5.0, autophase="all",
                            p0_only=p0_only, ap_optimizer=opt,
                        ),
                    )
                )
        from xmris_tpu.ops.phasing import acme_score_raw

        @jax.jit
        def voxel_scores(sr):
            # ACME score of the ALREADY-PHASED spectra: the solution
            # quality each optimizer actually achieved, per voxel.
            return jax.vmap(acme_score_raw)(sr)

        sols = {}
        scores = {}
        for tag, cfg in runs:
            try:
                t0 = time.perf_counter()
                sr, si, ph = spectral_pipeline_planar_raw(
                    re_j, im_j, w_j, f_j, cfg
                )
                float(jnp.sum(sr[0]))
                comp = time.perf_counter() - t0
                K = 3
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, ph = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                ms = (time.perf_counter() - t0) / K * 1e3
                sols[tag] = np.asarray(ph[0])
                scores[tag] = np.asarray(voxel_scores(sr))
                report(
                    f"apgrid/{tag}",
                    ms_per_call=round(ms, 1),
                    compile_s=round(comp, 1),
                    p0_sample=[round(float(x), 2) for x in sols[tag][:4]],
                )
            except Exception as e:  # noqa: BLE001
                report(f"apgrid/{tag}", error=repr(e)[:300])

        # agreement between the two optimizers (wrapped p0 difference) and
        # achieved-score comparison (grid <= de + tol => equal-or-better)
        for suffix in ("_p0", ""):
            a, b = sols.get("grid" + suffix), sols.get("de" + suffix)
            if a is not None and b is not None:
                d = np.abs(np.mod(a - b + 180.0, 360.0) - 180.0)
                sg, sd = scores["grid" + suffix], scores["de" + suffix]
                tol = 1e-3 * np.abs(sd)
                report(
                    f"apgrid/agree{suffix or '_p0p1'}",
                    p50_deg=round(float(np.percentile(d, 50)), 2),
                    p99_deg=round(float(np.percentile(d, 99)), 2),
                    grid_score_leq_frac=round(
                        float(np.mean(sg <= sd + tol)), 4
                    ),
                    score_gap_p99=round(
                        float(np.percentile((sg - sd) / np.abs(sd), 99)), 5
                    ),
                )

    # ---- fused headline confirmation -------------------------------------
    if "e2e" in groups:
        from xmris_tpu.fitting.amares import seed_plan
        from xmris_tpu.fitting.lm import hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.process import process_grid_planar_raw

        import tempfile

        with tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False
        ) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        pmap_static = hashable_pmap(pk.pmap)
        amp_slots, ls_plan = seed_plan(pk)
        t_ax = jnp.asarray((np.arange(NT) / bench.SW).astype(np.float32))
        cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single")
        args = (
            jnp.asarray(re_h), jnp.asarray(im_h), jnp.asarray(weight),
            jnp.asarray(freqs), t_ax,
            jnp.asarray(pk.init_free, jnp.float32),
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind),
        )
        try:
            t0 = time.perf_counter()
            out = process_grid_planar_raw(
                *args, cfg=cfg, pmap_static=pmap_static, mhz=bench.MHZ,
                amp_slots=amp_slots, ls_plan=ls_plan, uniform_t_ok=True,
                interpret=interp,
            )
            float(jnp.sum(out[3]))
            comp = time.perf_counter() - t0
            K = 6
            t0 = time.perf_counter()
            for _ in range(K):
                out = process_grid_planar_raw(
                    *args, cfg=cfg, pmap_static=pmap_static, mhz=bench.MHZ,
                    amp_slots=amp_slots, ls_plan=ls_plan, uniform_t_ok=True,
                    interpret=interp,
                )
            float(jnp.sum(out[3]) + jnp.sum(out[0][0]))
            ms = (time.perf_counter() - t0) / K * 1e3
            report(
                "e2e/fused",
                ms_per_grid=round(ms, 1),
                voxels_per_s=round(B / (ms / 1e3)),
                compile_s=round(comp, 1),
                conv_frac=float(np.mean(np.asarray(out[5]))),
            )
        except Exception as e:  # noqa: BLE001
            report("e2e/fused", error=repr(e)[:300])

    report("done")


if __name__ == "__main__":
    main()
