"""Round-11 TPU measurement session: slab-mode LM loop + slab CRLB.

r10 traced the fused program at 22.46 ms/call with `copy` 1.86 ms and
`reshape` 1.38 ms rows — the (B, F, F) <-> slab relayout pairs the LM
driver paid per iteration around the Pallas SPD solve, plus the final
CRLB re-tiling.  Slab mode (commits after 8b5133d) keeps H in the moment
kernel's native (n_tiles, f_pad^2, v_tile) layout from the first
eq6_normal_equations_pallas_v9 launch through the SPD solve, the accept
masking, the bound-transform unscaling, and the CRLB inverse diagonal —
zero (B, F, F) materializations in the fused seeded path.  This session
measures what that buys on-chip.

One consolidated batch (the remote backend wedges under hammering); every
experiment prints a JSON line immediately and appends to
``results/tpu_r11.jsonl``.

Run on the default (axon) platform:   python scripts/tpu_experiments_r11.py
Select experiment groups:             XMT_EXP=slabfit python ...
Groups:
  slabfit   — fit+CRLB stage chained (template-seeded
              lm_fit_batched_pallas + crlb_from_hessian), spd_pallas on
              (slab loop, one final materialization) vs off, with
              witnesses.  Directly comparable to r10's spdfit group.
  slabe2e   — fused per-grid program, spd on (full slab: loop AND CRLB)
              vs off, flat/de and the bench-default stacked/grid combos.
              Comparable to r10's spde2e group.
  slabtrace — jax.profiler device trace of the fused spd-on program:
              confirm the copy/reshape rows shrank.  Run LAST (tracing
              recompiles pollute chained timings).
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

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r11.jsonl"
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

    import tempfile

    import bench
    from xmris_tpu.parallel.pipeline import PipelineConfig

    if os.environ.get("XMT_SMOKE_GRID"):
        # CPU smoke runs only: shrink the phantom so interpret-mode kernels
        # finish; never set on the real chip (timings become meaningless).
        bench.GRID = tuple(
            int(s) for s in os.environ["XMT_SMOKE_GRID"].split(",")
            if s.strip()
        )
    NT, ZF = bench.N_TIME, bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()

    groups = set(
        (os.environ.get("XMT_EXP") or "slabfit,slabe2e,slabtrace").split(",")
    )
    chain = int(os.environ.get("XMT_CHAIN", "16"))

    # ---- slabfit: fit+CRLB stage, slab-mode Pallas SPD vs XLA Cholesky ----
    if "slabfit" in groups:
        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        with tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False
        ) as f:
            f.write(bench.PK_CSV)
            pk_path = f.name
        pk = load_prior_knowledge(pk_path)
        pmap_static = hashable_pmap(pk.pmap)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)
        t = jnp.asarray((np.arange(NT) / bench.SW).astype(np.float32))
        x0 = template_seeded_x0(fids, pk, t, bench.MHZ)
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        re = jnp.asarray(np.ascontiguousarray(fids.real.astype(np.float32)))
        im = jnp.asarray(np.ascontiguousarray(fids.imag.astype(np.float32)))

        @jax.jit
        def witness(res_x, sds, cost):
            return (
                jnp.sum(res_x),
                jnp.sum(jnp.where(jnp.isfinite(sds), sds, 0.0)),
                jnp.sum(cost),
            )

        outs = {}
        for tag, spd in (("slab", True), ("xla", False)):
            try:
                with Budget(int(os.environ.get("XMT_FIT_BUDGET", "1800"))):

                    def one(spd=spd):
                        res, h_ext = lm_fit_batched_pallas(
                            re, im, t, u0, lower, upper, kind, pmap_static,
                            bench.MHZ, max_iter=24, return_hessian=True,
                            spd_pallas=spd, interpret=interp,
                        )
                        sds, _ = crlb_from_hessian(
                            h_ext, res.cost, re.shape[-1], use_pallas=spd,
                            interpret=interp if spd else None,
                        )
                        return res.x_free, sds, res.cost

                    t0 = time.perf_counter()
                    x, sds, cost = one()
                    wx, ws, wc = (float(v) for v in witness(x, sds, cost))
                    comp = time.perf_counter() - t0
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            x, sds, cost = one()
                        float(witness(x, sds, cost)[0])
                        times.append((time.perf_counter() - t0) / chain)
                    outs[tag] = (wx, ws, wc)
                    report(
                        f"slabfit/{tag}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        compile_s=round(comp, 1),
                        sum_x=wx,
                        sum_sds=ws,
                        sum_cost=wc,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"slabfit/{tag}", error=repr(e)[:800])
        if len(outs) == 2:
            dx = abs(outs["slab"][0] - outs["xla"][0]) / (
                abs(outs["xla"][0]) + 1e-30
            )
            dc = abs(outs["slab"][2] - outs["xla"][2]) / (
                abs(outs["xla"][2]) + 1e-30
            )
            report("slabfit/parity", rel_dx=dx, rel_dcost=dc)

    # ---- slabe2e: fused per-grid program, spd on/off x config -------------
    if "slabe2e" in groups and backend != "tpu":
        report("slabe2e/skip", reason="run_e2e_fused is TPU-only")
    elif "slabe2e" in groups:
        for layout, opt in (("flat", "de"), ("stacked", "grid")):
            for tag, spd in (("slab", "1"), ("xla", "0")):
                os.environ["XMT_SPD_PALLAS"] = spd
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
                            f"slabe2e/{layout}_{opt}_{tag}",
                            ms_per_grid=round(1e3 * ms, 1),
                            voxels_per_s=round(fids.shape[0] / ms),
                        )
                except Exception as e:  # noqa: BLE001
                    report(
                        f"slabe2e/{layout}_{opt}_{tag}",
                        error=repr(e)[:800],
                    )
        os.environ["XMT_SPD_PALLAS"] = "1"

    # ---- slabtrace: device trace of the fused slab program ----------------
    if "slabtrace" in groups:
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
        re_j = jnp.asarray(np.ascontiguousarray(fids.real.astype(np.float32)))
        im_j = jnp.asarray(np.ascontiguousarray(fids.imag.astype(np.float32)))
        x_template = jnp.asarray(
            template_optimum(fids, pk, t_j, bench.MHZ).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)
        f_j = jnp.asarray(freqs)
        lower = jnp.asarray(pk.lower)
        upper = jnp.asarray(pk.upper)
        kind = jnp.asarray(pk.kind)

        for tag, spd in (("slab", True),):
            cfg = PipelineConfig(
                zero_fill_to=ZF, lb=5.0, autophase="single",
            )
            kwargs = dict(
                cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=bench.MHZ,
                amp_slots=amp_slots, ls_plan=ls_plan, max_iter=24,
                uniform_t_ok=True, spd_pallas=spd, interpret=interp,
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
                    + jnp.sum(jnp.where(jnp.isfinite(sds), sds, 0.0))
                )

            trace_dir = f"/tmp/jax_trace_r11_{tag}"
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
                        f"slabtrace/{tag}",
                        device_busy_ms_per_call=round(busy / 3e3, 3),
                        n_ops=len(rows),
                        top=[
                            {
                                "op": nm,
                                "ms_per_call": round(tot / 3e3, 3),
                                "calls": cnt // 3,
                            }
                            for nm, (tot, cnt) in rows[:24]
                        ],
                    )
            except Exception as e:  # noqa: BLE001
                report(f"slabtrace/{tag}", error=repr(e)[:800])

    report("done", groups=sorted(groups))


if __name__ == "__main__":
    main()
