"""Round-6 TPU measurement session: the v10 whole-loop LM kernel.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r6.jsonl``, so a wedge mid-run loses nothing already
measured.

Run on the default (axon) platform:   python scripts/tpu_experiments_r6.py
Select experiment groups:             XMT_EXP=smoke,fit python ...
Groups:
  smoke — v10 compile + on-device parity vs v9 at a reduced batch
          (2048 voxels; same per-tile kernel shape as the full grid)
  fit   — chained fit+CRLB at bench scale (16384 voxels, 5-peak 31P):
          kernel_version 9 (control) vs 10
  e2e   — fused per-grid program with kernel_version 9 vs 10
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
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r6.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


class Budget:
    """SIGALRM deadline for a stage: remote Mosaic compiles through a
    wedged relay hang rather than fail."""

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
    from xmris_tpu.fitting.amares import template_seeded_x0
    from xmris_tpu.fitting.lm import (
        crlb_from_hessian,
        external_to_internal,
        hashable_pmap,
        lm_fit_batched_pallas,
    )
    from xmris_tpu.fitting.prior import load_prior_knowledge

    fids, weight, freqs = bench.make_inputs()
    pk_path = "/tmp/xmt_r6_pk.csv"
    Path(pk_path).write_text(bench.PK_CSV)
    pk = load_prior_knowledge(pk_path)
    pmap_static = hashable_pmap(pk.pmap)
    t = jnp.asarray((np.arange(bench.N_TIME) / bench.SW).astype(np.float32))
    lower = jnp.asarray(pk.lower)
    upper = jnp.asarray(pk.upper)
    kind = jnp.asarray(pk.kind)

    groups = set((os.environ.get("XMT_EXP") or "smoke,fit,e2e").split(","))

    # ---- smoke: compile + on-device parity at 2048 voxels ---------------
    if "smoke" in groups:
        b_small = int(os.environ.get("XMT_SMOKE_B", "2048"))
        sub = fids[:b_small]
        x0 = template_seeded_x0(sub, pk, t, bench.MHZ)
        u0 = jnp.asarray(
            external_to_internal(x0, pk.lower, pk.upper, pk.kind).astype(
                np.float32
            )
        )
        re = jnp.asarray(np.ascontiguousarray(sub.real.astype(np.float32)))
        im = jnp.asarray(np.ascontiguousarray(sub.imag.astype(np.float32)))

        results = {}
        for kv in (9, 10):
            try:
                with Budget(int(os.environ.get("XMT_SMOKE_BUDGET", "2400"))):
                    t0 = time.perf_counter()
                    res, h = lm_fit_batched_pallas(
                        re, im, t, u0, lower, upper, kind, pmap_static,
                        bench.MHZ, max_iter=24, kernel_version=kv,
                        return_hessian=True, interpret=interp,
                    )
                    sds, _ = crlb_from_hessian(h, res.cost, re.shape[-1])
                    w = float(jnp.sum(res.x_free) + jnp.sum(sds))
                    compile_s = time.perf_counter() - t0
                    # steady-state chained (skipped on CPU interpret mode,
                    # where every call re-executes the interpreter)
                    times = [0.0] if interp else []
                    for _ in range(0 if interp else 3):
                        s0 = time.perf_counter()
                        for _ in range(4):
                            res, h = lm_fit_batched_pallas(
                                re, im, t, u0, lower, upper, kind,
                                pmap_static, bench.MHZ, max_iter=24,
                                kernel_version=kv, return_hessian=True,
                                interpret=interp,
                            )
                            sds, _ = crlb_from_hessian(
                                h, res.cost, re.shape[-1]
                            )
                        float(jnp.sum(res.x_free) + jnp.sum(sds))
                        times.append((time.perf_counter() - s0) / 4)
                    results[kv] = (res, sds)
                    report(
                        f"smoke/v{kv}",
                        b=b_small,
                        compile_s=round(compile_s, 1),
                        ms_per_call=round(1e3 * float(np.median(times)), 2),
                        conv_frac=float(
                            np.mean(np.asarray(res.converged))
                        ),
                        n_acc_max=int(np.max(np.asarray(res.n_iter))),
                        witness=w,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"smoke/v{kv}", error=str(e)[:2000])
        if 9 in results and 10 in results:
            x9 = np.asarray(results[9][0].x_free)
            x10 = np.asarray(results[10][0].x_free)
            c9 = np.asarray(results[9][0].cost)
            c10 = np.asarray(results[10][0].cost)
            s9 = np.asarray(results[9][1])
            s10 = np.asarray(results[10][1])
            denom = np.maximum(np.abs(x9), 1e-3)
            fin = np.isfinite(s9) & np.isfinite(s10)
            report(
                "smoke/parity",
                x_rel_p99=float(
                    np.percentile(np.abs(x10 - x9) / denom, 99)
                ),
                cost_rel_max=float(
                    np.max(np.abs(c10 - c9) / np.maximum(c9, 1e-6))
                ),
                sds_rel_p99=float(
                    np.percentile(
                        np.abs(s10[fin] - s9[fin])
                        / np.maximum(np.abs(s9[fin]), 1e-6),
                        99,
                    )
                ),
            )

    # ---- fit: bench-scale chained fit+CRLB ------------------------------
    if "fit" in groups:
        for kv in (9, 10):
            try:
                with Budget(int(os.environ.get("XMT_FIT_BUDGET", "2400"))):
                    os.environ["XMT_KERNEL_VERSION"] = str(kv)
                    fit_s = bench.run_fit_planar(fids)
                    report(
                        f"fit/v{kv}", ms=round(1e3 * fit_s, 2), b=fids.shape[0]
                    )
            except Exception as e:  # noqa: BLE001
                report(f"fit/v{kv}", error=str(e)[:2000])

    # ---- e2e: fused per-grid program ------------------------------------
    if "e2e" in groups:
        from xmris_tpu.parallel.pipeline import PipelineConfig

        cfg = PipelineConfig(
            zero_fill_to=bench.ZERO_FILL, lb=5.0, autophase="single"
        )
        e2e_kvs = tuple(
            int(s)
            for s in os.environ.get("XMT_E2E_KV", "9,10").split(",")
            if s.strip()
        )
        for kv in e2e_kvs:
            try:
                with Budget(int(os.environ.get("XMT_E2E_BUDGET", "2400"))):
                    os.environ["XMT_KERNEL_VERSION"] = str(kv)
                    os.environ["XMT_E2E_COMPILE_BUDGET_S"] = "2000"
                    e2e_s = bench.run_e2e_fused(fids, weight, freqs, cfg)
                    report(f"e2e/v{kv}", ms=round(1e3 * e2e_s, 2))
            except Exception as e:  # noqa: BLE001
                report(f"e2e/v{kv}", error=str(e)[:2000])

    report("done")


if __name__ == "__main__":
    main()
