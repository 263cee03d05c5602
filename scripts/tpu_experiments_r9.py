"""Round-9 TPU measurement session: fused-program op attribution + the
stacked spectral layout.

One consolidated batch (the remote backend wedges under hammering); every
experiment prints a JSON line immediately and appends to
``results/tpu_r9.jsonl``.

Run on the default (axon) platform:   python scripts/tpu_experiments_r9.py
Select experiment groups:             XMT_EXP=stacked python ...
Groups:
  stacked  — spectrum_pallas stacked_out and the spectral pipeline with
             cfg.spec_layout="stacked" vs the flat baseline: does skipping
             the XLA lane-merge relayout (r7 trace: ~0.6 ms/plane) pay?
  apsingle — single-mode autophase pivot-row solve: ap_optimizer="grid"
             (deterministic scan+polish, ~60 sequential steps) vs the DE
             (up to 200 generations + 60 polish) — the single-row solve is
             sequential-latency-bound, so step count is the cost model.
             Reports p0/p1 agreement and the achieved ACME score.
  e2e      — fused per-grid program over the {flat,stacked} x {de,grid}
             matrix: the headline composition.
  e2etrace — jax.profiler device trace of the FUSED per-grid program
             (flat/de baseline + the best new combo), parsed into per-op
             device-time totals: ground truth on where the ~30 ms/grid
             goes (spectral kernel, relayouts, DE autophase, LS seeding,
             LM launches, inter-launch glue).  Run LAST: tracing triggers
             recompiles that pollute chained timings.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r9.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


class Budget:
    def __init__(self, seconds: int):
        self.seconds = seconds

    def __enter__(self):
        def _alarm(signum, frame):
            raise TimeoutError(f"stage exceeded {self.seconds}s budget")

        self._old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)


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
    interp = backend != "tpu"

    import bench
    from xmris_tpu.parallel.pipeline import PipelineConfig

    NT, ZF = bench.N_TIME, bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()
    re_j = jnp.asarray(np.ascontiguousarray(fids.real.astype(np.float32)))
    im_j = jnp.asarray(np.ascontiguousarray(fids.imag.astype(np.float32)))
    w_j = jnp.asarray(weight[:NT].astype(np.float32))

    groups = set(
        (os.environ.get("XMT_EXP") or "stacked,apsingle,e2e,e2etrace")
        .split(",")
    )
    chain = int(os.environ.get("XMT_CHAIN", "16"))

    from xmris_tpu.ops.phasing import acme_score_raw

    @jax.jit
    def pivot_acme(sr, si):
        """ACME score of the (flat-layout) phased pivot row — the quality
        witness for optimizer comparisons (lower is better)."""
        mag2 = sr * sr + si * si
        flat_idx = jnp.argmax(mag2)
        voxel_idx = flat_idx // sr.shape[-1]
        row_re = jax.lax.dynamic_index_in_dim(
            sr, voxel_idx, axis=0, keepdims=False
        )
        return acme_score_raw(row_re)

    # ---- stacked: kernel-level + fused-program-level layout comparison ----
    if "stacked" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        # Kernel-level: production shape (with_maxmag, like the pipeline).
        for tag, stacked in (("flat", False), ("stacked", True)):
            try:
                with Budget(int(os.environ.get("XMT_SPEC_BUDGET", "900"))):
                    t0 = time.perf_counter()
                    out = spectrum_pallas(
                        re_j, im_j, ZF, window=w_j, interpret=interp,
                        with_maxmag=True, stacked_out=stacked,
                    )
                    wit = float(jnp.sum(out[0][0]) + jnp.sum(out[2]))
                    comp = time.perf_counter() - t0
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            out = spectrum_pallas(
                                re_j, im_j, ZF, window=w_j, interpret=interp,
                                with_maxmag=True, stacked_out=stacked,
                            )
                        float(jnp.sum(out[0][0]) + jnp.sum(out[2]))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"stacked/kernel_{tag}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        compile_s=round(comp, 1),
                        witness=wit,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"stacked/kernel_{tag}", error=repr(e)[:800])

        # Spectral-pipeline level (DFT + in-graph DE autophase single).
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        f_j = jnp.asarray(freqs)
        for tag, layout in (("flat", "flat"), ("stacked", "stacked")):
            cfg = PipelineConfig(
                zero_fill_to=ZF, lb=5.0, autophase="single",
                spec_layout=layout,
            )
            try:
                with Budget(900):
                    sr, si, ph = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                    wit = float(jnp.sum(sr) + jnp.sum(si))
                    p0 = float(ph[0])
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            sr, si, ph = spectral_pipeline_planar_raw(
                                re_j, im_j, w_j, f_j, cfg
                            )
                        float(jnp.sum(sr) + jnp.sum(si))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"stacked/pipeline_{tag}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        witness=wit,
                        p0=round(p0, 3),
                    )
            except Exception as e:  # noqa: BLE001
                report(f"stacked/pipeline_{tag}", error=repr(e)[:800])

    # ---- apsingle: pivot-row solve, grid vs DE ----------------------------
    if "apsingle" in groups:
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        f_j = jnp.asarray(freqs)
        for tag, opt in (("de", "de"), ("grid", "grid")):
            cfg = PipelineConfig(
                zero_fill_to=ZF, lb=5.0, autophase="single",
                ap_optimizer=opt,
            )
            try:
                with Budget(900):
                    sr, si, ph = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                    score = float(pivot_acme(sr, si))
                    p0 = float(ph[0])
                    p1 = float(ph[1])
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            sr, si, ph = spectral_pipeline_planar_raw(
                                re_j, im_j, w_j, f_j, cfg
                            )
                        float(jnp.sum(sr[0]))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"apsingle/{tag}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        p0=round(p0, 3),
                        p1=round(p1, 3),
                        acme_score=score,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"apsingle/{tag}", error=repr(e)[:800])

    # ---- e2e: fused program over the {layout} x {optimizer} matrix --------
    if "e2e" in groups:
        for layout in ("flat", "stacked"):
            for opt in ("de", "grid"):
                tag = f"{layout}_{opt}"
                try:
                    with Budget(
                        int(os.environ.get("XMT_E2E_BUDGET", "2400"))
                    ):
                        cfg = PipelineConfig(
                            zero_fill_to=ZF, lb=5.0, autophase="single",
                            spec_layout=layout, ap_optimizer=opt,
                        )
                        ms = bench.run_e2e_fused(fids, weight, freqs, cfg)
                        report(
                            f"e2e/{tag}",
                            ms_per_grid=round(1e3 * ms, 1),
                            voxels_per_s=round(fids.shape[0] / ms),
                        )
                except Exception as e:  # noqa: BLE001
                    report(f"e2e/{tag}", error=repr(e)[:800])

    # ---- e2etrace: per-op device attribution of the fused program ---------
    if "e2etrace" in groups:
        import tempfile

        from trace_analyze import canon, device_pids, load_events
        from xmris_tpu.fitting.amares import seed_plan, template_optimum
        from xmris_tpu.fitting.lm import hashable_pmap
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.parallel.process import process_grid_planar_raw

        with tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False
        ) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        t_np = (np.arange(NT) / bench.SW).astype(np.float32)
        t_j = jnp.asarray(t_np)
        x_template = jnp.asarray(
            template_optimum(fids, pk, t_j, bench.MHZ).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)
        f_j = jnp.asarray(freqs)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)

        for tag, layout, opt in (
            ("flat_de", "flat", "de"),
            ("stacked_grid", "stacked", "grid"),
        ):
            cfg = PipelineConfig(
                zero_fill_to=ZF, lb=5.0, autophase="single",
                spec_layout=layout, ap_optimizer=opt,
            )
            kwargs = dict(
                cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=bench.MHZ,
                amp_slots=amp_slots, ls_plan=ls_plan, max_iter=24,
                uniform_t_ok=True,
            )

            def one():
                return process_grid_planar_raw(
                    re_j, im_j, jnp.asarray(weight), f_j, t_j, x_template,
                    lower, upper, kind, **kwargs
                )

            @jax.jit
            def checksum(outs):
                sr, si, _, x_free, cost, _, sds = outs
                return (
                    jnp.sum(sr) + jnp.sum(si) + jnp.sum(x_free)
                    + jnp.sum(sds)
                )

            trace_dir = f"/tmp/jax_trace_r9_{tag}"
            try:
                with Budget(int(os.environ.get("XMT_TRACE_BUDGET", "1200"))):
                    float(checksum(one()))  # compile + warm
                    with jax.profiler.trace(trace_dir):
                        for _ in range(3):
                            outs = one()
                        float(checksum(outs))
                    events, meta = load_events(trace_dir)
                    dpids = device_pids(meta["pid_names"])
                    from collections import defaultdict

                    per_op = defaultdict(lambda: [0.0, 0])
                    busy = 0.0
                    for e in events:
                        if e.get("ph") != "X" or e.get("pid") not in dpids:
                            continue
                        dur = float(e.get("dur", 0.0))
                        nm = canon(str(e.get("name", "?")))
                        per_op[nm][0] += dur
                        per_op[nm][1] += 1
                        busy += dur
                    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
                    report(
                        f"e2etrace/{tag}",
                        device_busy_ms_per_call=round(busy / 3e3, 3),
                        n_ops=len(rows),
                        top=[
                            {
                                "op": nm,
                                "ms_per_call": round(v[0] / 3e3, 3),
                                "calls": v[1] // 3,
                            }
                            for nm, v in rows[:30]
                        ],
                    )
            except Exception as e:  # noqa: BLE001
                report(f"e2etrace/{tag}", error=repr(e)[:800])


if __name__ == "__main__":
    main()
