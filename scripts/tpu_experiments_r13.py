"""Round-13 TPU measurement session: the phase-apply fusion's ~1 ms gap.

The r12 pinned-program trace put the single-mode phase application at
1.65 ms/call — one XLA fusion touching the two (B, n2, n1) spectrum
planes (read + write ≈ 536 MB ≈ 0.65 ms at 819 GB/s).  The 2.5× gap to
the bandwidth floor is suspicious: the rotation's cos/sin factors are
computed on the tiny (n_freq,) phase ramp, and XLA fusions DUPLICATE
cheap producers into consumers — if the cosine lands inside the big
fusion it is re-evaluated per spectrum point (~134 M transcendental
pairs at bench scale where ~2048 suffice).  ``PipelineConfig(
phase_barrier=True)`` pins the cos/sin vectors behind a
``jax.lax.optimization_barrier`` so they materialize once.

Groups (one consolidated batch; JSON lines appended to
``results/tpu_r13.jsonl``):
  phmicro — isolated phase rotation on bench-shaped planes, barrier
            off/on, chained with one witness readback + value parity.
  phe2e   — fused per-grid program (bench-default stacked/grid combo,
            pinned layouts), phase_barrier off/on, chained + witness
            parity.  Decides the bench default.
  phhlo   — compile-only (no execution): grep the optimized HLO for
            cosine ops and report the shapes they're evaluated at in
            each variant — direct evidence for/against the recompute
            theory.  Run LAST.
  fresh   — fit+CRLB slab-mode re-confirm (chain 4, short).

Run on the default (axon) platform:   python scripts/tpu_experiments_r13.py
Select groups:                        XMT_EXP=phmicro,phe2e python ...
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

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r13.jsonl"
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
        bench.GRID = tuple(
            int(s) for s in os.environ["XMT_SMOKE_GRID"].split(",")
            if s.strip()
        )
    NT, ZF = bench.N_TIME, bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()
    chain = int(os.environ.get("XMT_CHAIN", "32"))

    groups = set(
        (os.environ.get("XMT_EXP") or "phmicro,phe2e,fresh,phhlo").split(",")
    )

    # ---- phmicro: isolated rotation fusion, barrier off/on ---------------
    # Per-iteration DEVICE time via in-jit fori_loop differencing
    # ((t_K40 - t_K8)/32): a single rotation is ~1 ms, far below the
    # ~4.5 ms chained relay floor, so chained per-call timing cannot
    # resolve it.  The phase ramp varies with the loop index so XLA
    # cannot hoist the cos/sin out of the loop in either variant.
    if "phmicro" in groups:
        from xmris_tpu.parallel.planar_pipeline import _apply_phase_planar

        b = fids.shape[0]
        n2, n1 = 32, ZF // 32
        rng = np.random.default_rng(1)
        re_j = jnp.asarray(rng.normal(size=(b, n2, n1)).astype(np.float32))
        im_j = jnp.asarray(rng.normal(size=(b, n2, n1)).astype(np.float32))
        phi0 = jnp.asarray(
            np.linspace(-3.0, 3.0, ZF).astype(np.float32).reshape(1, n2, n1)
        )

        def make_loop(k, barrier):
            @jax.jit
            def run(r, i, p):
                def body(j, carry):
                    cr, ci = carry
                    pj = p * (1.0 + 1e-6 * j.astype(jnp.float32))
                    return _apply_phase_planar(cr, ci, pj, barrier=barrier)

                cr, ci = jax.lax.fori_loop(0, k, body, (r, i))
                return jnp.sum(cr) + jnp.sum(ci * 0.5)

            return run

        per_iter = {}
        for tag, barrier in (("direct", False), ("barrier", True)):
            try:
                with Budget(900):
                    times_by_k = {}
                    for k in (8, 40):
                        fn = make_loop(k, barrier)
                        w = float(fn(re_j, im_j, phi0))  # compile+witness
                        times = []
                        for _ in range(3):
                            t0 = time.perf_counter()
                            for _ in range(4):
                                v = fn(re_j, im_j, phi0)
                            float(v)
                            times.append((time.perf_counter() - t0) / 4)
                        times_by_k[k] = float(np.median(times))
                    ms_iter = 1e3 * (times_by_k[40] - times_by_k[8]) / 32
                    per_iter[tag] = ms_iter
                    report(
                        f"phmicro/{tag}",
                        ms_per_rotation=round(ms_iter, 3),
                        ms_k8=round(1e3 * times_by_k[8], 3),
                        ms_k40=round(1e3 * times_by_k[40], 3),
                        witness=w,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"phmicro/{tag}", error=repr(e)[:800])
        if len(per_iter) == 2:
            report(
                "phmicro/summary",
                direct_ms=round(per_iter["direct"], 3),
                barrier_ms=round(per_iter["barrier"], 3),
                hbm_floor_ms=0.65,
            )

    # ---- phe2e: fused per-grid program, barrier off/on -------------------
    if "phe2e" in groups and backend != "tpu":
        report("phe2e/skip", reason="run_e2e_fused is TPU-only")
    elif "phe2e" in groups:
        for tag, barrier in (("direct", False), ("barrier", True)):
            try:
                with Budget(int(os.environ.get("XMT_E2E_BUDGET", "2400"))):
                    cfg = PipelineConfig(
                        zero_fill_to=ZF, lb=5.0, autophase="single",
                        spec_layout="stacked", ap_optimizer="grid",
                        phase_barrier=barrier,
                    )
                    ms = bench.run_e2e_fused(fids, weight, freqs, cfg)
                    report(
                        f"phe2e/{tag}",
                        ms_per_grid=round(1e3 * ms, 2),
                        voxels_per_s=round(fids.shape[0] / ms),
                    )
            except Exception as e:  # noqa: BLE001
                report(f"phe2e/{tag}", error=repr(e)[:800])

    # ---- fresh: slab fit+CRLB re-confirm ---------------------------------
    if "fresh" in groups:
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
                jnp.sum(res_x)
                + jnp.sum(jnp.where(jnp.isfinite(sds), sds, 0.0))
                + jnp.sum(cost)
            )

        def one():
            res, h_ext = lm_fit_batched_pallas(
                re, im, t, u0, lower, upper, kind, pmap_static,
                bench.MHZ, max_iter=24, return_hessian=True,
                spd_pallas=True, interpret=interp,
            )
            sds, _ = crlb_from_hessian(
                h_ext, res.cost, re.shape[-1], use_pallas=True,
                interpret=interp,
            )
            return res.x_free, sds, res.cost

        try:
            with Budget(int(os.environ.get("XMT_FIT_BUDGET", "1800"))):
                x, sds, cost = one()
                w = float(witness(x, sds, cost))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        x, sds, cost = one()
                    float(witness(x, sds, cost))
                    times.append((time.perf_counter() - t0) / 4)
                report(
                    "fresh/slabfit",
                    ms_chained=round(1e3 * float(np.median(times)), 2),
                    witness=w,
                )
        except Exception as e:  # noqa: BLE001
            report("fresh/slabfit", error=repr(e)[:800])

    # ---- phhlo: compile-only evidence for the recompute theory -----------
    if "phhlo" in groups:
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
        t_j = jnp.asarray((np.arange(NT) / bench.SW).astype(np.float32))
        re_j = jnp.asarray(np.ascontiguousarray(fids.real.astype(np.float32)))
        im_j = jnp.asarray(np.ascontiguousarray(fids.imag.astype(np.float32)))
        x_template = jnp.asarray(
            template_optimum(fids, pk, t_j, bench.MHZ).astype(np.float32)
        )
        amp_slots, ls_plan = seed_plan(pk)

        import re as re_mod

        for tag, barrier in (("direct", False), ("barrier", True)):
            try:
                with Budget(int(os.environ.get("XMT_HLO_BUDGET", "1800"))):
                    cfg = PipelineConfig(
                        zero_fill_to=ZF, lb=5.0, autophase="single",
                        spec_layout="stacked", ap_optimizer="grid",
                        phase_barrier=barrier,
                    )
                    lowered = process_grid_planar_raw.lower(
                        re_j, im_j, jnp.asarray(weight),
                        jnp.asarray(freqs), t_j, x_template,
                        jnp.asarray(pk.lower), jnp.asarray(pk.upper),
                        jnp.asarray(pk.kind),
                        cfg=cfg, pmap_static=hashable_pmap(pk.pmap),
                        mhz=bench.MHZ, amp_slots=amp_slots,
                        ls_plan=ls_plan, max_iter=24, uniform_t_ok=True,
                        spd_pallas=True, interpret=interp,
                    )
                    txt = lowered.compile().as_text()
                    out = Path(f"/tmp/fused_hlo_r13_{tag}.txt")
                    out.write_text(txt)
                    # Count cosine evaluations by output shape: big-shape
                    # cosines == per-element recompute inside the fusion.
                    shapes = {}
                    for line in txt.splitlines():
                        m = re_mod.search(
                            r"=\s*(f32|bf16)\[([0-9,]*)\][^ ]*\s+cosine",
                            line,
                        )
                        if m:
                            shapes[m.group(2)] = shapes.get(m.group(2), 0) + 1
                    report(
                        f"phhlo/{tag}",
                        cosine_shapes=shapes,
                        hlo_lines=len(txt.splitlines()),
                        dump=str(out),
                    )
            except Exception as e:  # noqa: BLE001
                report(f"phhlo/{tag}", error=repr(e)[:800])

    report("done", groups=sorted(groups))


if __name__ == "__main__":
    main()
