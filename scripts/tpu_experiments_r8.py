"""Round-8 TPU measurement session: second-order polish for the grid
autophase (mode="all") at bench scale.

The r7 split showed the polish stage dominating the grid optimizer
(p0p1: scan 47 ms vs polish ~239 of 267 ms; p0-only: 141 ms total), and
the polish was a first-order backtracking descent.  This session
measures the new Levenberg-damped second-order modes
(``ap_polish="newton"``/``"bfgs"``, ops/phasing.py) against the gd
default at 16384 voxels, with per-voxel achieved-ACME-score parity.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r8.jsonl``, so a wedge mid-run loses nothing already
measured.

Run on the default (axon) platform:   python scripts/tpu_experiments_r8.py
Select groups:                        XMT_EXP=appolish python ...
Groups:
  appolish — grid autophase with gd/newton/bfgs polish, p0-only and
             p0+p1, at 16384 voxels through the planar pipeline
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r8.jsonl"
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
    ZF = bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()
    fids = fids[:B]
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))

    groups = set((os.environ.get("XMT_EXP") or "appolish").split(","))

    if "appolish" in groups:
        from xmris_tpu.ops.phasing import acme_score_raw
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)

        @jax.jit
        def voxel_scores(sr):
            # ACME score of the ALREADY-PHASED spectra: the quality each
            # polish actually achieved, per voxel.
            return jax.vmap(acme_score_raw)(sr)

        polishes = tuple(
            (os.environ.get("XMT_POLISHES") or "gd,bfgs,newton").split(",")
        )
        sols: dict[str, np.ndarray] = {}
        scores: dict[str, np.ndarray] = {}
        for p0_only in (True, False):
            for pol in polishes:
                tag = f"{pol}{'_p0' if p0_only else '_p0p1'}"
                cfg = PipelineConfig(
                    zero_fill_to=ZF, lb=5.0, autophase="all",
                    p0_only=p0_only, ap_optimizer="grid", ap_polish=pol,
                )
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
                        f"appolish/{tag}",
                        ms_per_call=round(ms, 1),
                        compile_s=round(comp, 1),
                        p0_sample=[
                            round(float(x), 2) for x in sols[tag][:4]
                        ],
                    )
                except Exception as e:  # noqa: BLE001
                    report(f"appolish/{tag}", error=repr(e)[:300])

        # achieved-score parity vs the gd default (equal-or-better
        # fraction + tail), and wrapped-p0 agreement
        for suffix in ("_p0", "_p0p1"):
            base = scores.get("gd" + suffix)
            if base is None:
                continue
            for pol in polishes:
                if pol == "gd" or (pol + suffix) not in scores:
                    continue
                sg = scores[pol + suffix]
                tol = 1e-3 * np.abs(base)
                d = np.abs(
                    np.mod(
                        sols[pol + suffix] - sols["gd" + suffix] + 180.0,
                        360.0,
                    )
                    - 180.0
                )
                report(
                    f"appolish/parity_{pol}{suffix}",
                    score_leq_gd_frac=round(
                        float(np.mean(sg <= base + tol)), 4
                    ),
                    score_gap_p99=round(
                        float(
                            np.percentile((sg - base) / np.abs(base), 99)
                        ),
                        6,
                    ),
                    p0_diff_p50=round(float(np.percentile(d, 50)), 2),
                    p0_diff_p99=round(float(np.percentile(d, 99)), 2),
                )

    report("done")


if __name__ == "__main__":
    main()
