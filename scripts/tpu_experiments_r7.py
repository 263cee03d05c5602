"""Round-7 TPU measurement session: roofline attribution + autophase split.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r7.jsonl``.

Run on the default (axon) platform:   python scripts/tpu_experiments_r7.py
Select experiment groups:             XMT_EXP=specprec python ...
Groups:
  specprec — spectrum_pallas precision ablation (1/3/6 bf16 passes) at
             bench scale: pins the MXU-pass share of the kernel's device
             time for the roofline table in docs/performance.md
  apsplit  — grid-autophase stage attribution at 16384 voxels: candidate
             scan vs gradient polish wall-time split (decides VERDICT
             item 7: in-kernel p0 scan worth building, or recorded
             negative)
  profiler — attempt a jax.profiler device trace through the relay;
             record whether device-side timelines are available at all
  e2e      — fused per-grid program fresh-backend re-measure (r5 saw a
             post-compile-session 34.9 ms outlier; r4 recorded 29.7)
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r7.jsonl"
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

    NT, ZF = bench.N_TIME, bench.ZERO_FILL
    fids, weight, freqs = bench.make_inputs()
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))
    re_j = jnp.asarray(re_h)
    im_j = jnp.asarray(im_h)
    w_j = jnp.asarray(weight[:NT].astype(np.float32))
    f_j = jnp.asarray(freqs)

    groups = set((os.environ.get("XMT_EXP") or "specprec,apsplit,e2e").split(","))
    chain = int(os.environ.get("XMT_CHAIN", "16"))

    # ---- specprec: MXU-pass attribution of spectrum_pallas ---------------
    if "specprec" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        for prec, passes in (("highest", 6), ("high", 3), ("default", 1)):
            try:
                with Budget(int(os.environ.get("XMT_SPEC_BUDGET", "1200"))):
                    t0 = time.perf_counter()
                    sr, si = spectrum_pallas(
                        re_j, im_j, ZF, window=w_j, interpret=interp,
                        precision=prec,
                    )
                    wit = float(jnp.sum(sr[0]))
                    comp = time.perf_counter() - t0
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            sr, si = spectrum_pallas(
                                re_j, im_j, ZF, window=w_j,
                                interpret=interp, precision=prec,
                            )
                        float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"specprec/{prec}",
                        passes=passes,
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        compile_s=round(comp, 1),
                        witness=wit,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"specprec/{prec}", error=repr(e)[:1000])

    # ---- apsplit: scan-vs-polish attribution of the grid autophase -------
    if "apsplit" in groups:
        from xmris_tpu.ops.phasing import _grid_phase_search
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        cfg0 = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="none")
        sr, si, _ = spectral_pipeline_planar_raw(re_j, im_j, w_j, f_j, cfg0)
        # pivot bins once, outside the timed region (production computes
        # them in-graph; this isolates the search stages)
        mag2 = sr * sr + si * si
        t_idx = jnp.argmax(mag2, axis=1)
        pivots = f_j[t_idx]
        sr.block_until_ready()

        @functools.partial(
            jax.jit,
            static_argnames=("n_p0", "n_p1", "polish_iters", "p0_only"),
        )
        def gps(sr, si, f, pivots, t_idx, *, n_p0, n_p1, polish_iters,
                p0_only):
            x_range = f[-1] - f[0]
            return _grid_phase_search(
                sr, si, f, x_range, pivots, t_idx, 1, "acme", p0_only,
                n_p0=n_p0, n_p1=n_p1, polish_iters=polish_iters,
            )

        cases = [
            # (tag, n_p0, n_p1, polish, p0_only)
            ("p0_full", 36, 41, 40, True),
            ("p0_scan_only", 36, 41, 0, True),
            ("p0_polish_only", 2, 2, 40, True),
            ("p0p1_full", 36, 41, 40, False),
            ("p0p1_scan_only", 36, 41, 0, False),
            ("p0p1_polish_only", 2, 2, 40, False),
        ]
        for tag, n_p0, n_p1, pol, p0_only in cases:
            try:
                with Budget(int(os.environ.get("XMT_AP_BUDGET", "1200"))):
                    t0 = time.perf_counter()
                    xs = gps(
                        sr, si, f_j, pivots, t_idx, n_p0=n_p0, n_p1=n_p1,
                        polish_iters=pol, p0_only=p0_only,
                    )
                    wit = float(jnp.sum(xs[:, 0]))
                    comp = time.perf_counter() - t0
                    K = 3
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(K):
                            xs = gps(
                                sr, si, f_j, pivots, t_idx, n_p0=n_p0,
                                n_p1=n_p1, polish_iters=pol,
                                p0_only=p0_only,
                            )
                        float(jnp.sum(xs[:, 0]))
                        times.append((time.perf_counter() - t0) / K)
                    report(
                        f"apsplit/{tag}",
                        ms_per_call=round(1e3 * float(np.median(times)), 1),
                        compile_s=round(comp, 1),
                        witness=wit,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"apsplit/{tag}", error=repr(e)[:1000])

        # the production pipeline also pays the per-voxel pivot argmax —
        # time it alone (XLA axis=-1 argmax was pathological at ~80 ms in
        # r4; record what the pipeline actually pays today)
        try:
            with Budget(600):
                @jax.jit
                def pivot_only(sr, si):
                    m2 = sr * sr + si * si
                    return jnp.argmax(m2, axis=1)

                ti = pivot_only(sr, si)
                int(ti[0])
                K = 3
                t0 = time.perf_counter()
                for _ in range(K):
                    ti = pivot_only(sr, si)
                int(ti[0])
                report(
                    "apsplit/pivot_argmax",
                    ms_per_call=round(
                        1e3 * (time.perf_counter() - t0) / K, 1
                    ),
                )
        except Exception as e:  # noqa: BLE001
            report("apsplit/pivot_argmax", error=repr(e)[:500])

    # ---- n2sweep: kernel split sweep incl. the untested aligned n2=128 ----
    # The r7 profiler trace showed ~1.7 ms of the 5.7 ms jit program is XLA
    # layout passes AROUND the kernel (two 0.6 ms lane-split reshapes + a
    # 0.54 ms copy).  n2=128 makes the input split vreg-aligned (free) and
    # the stage-2 contraction full-MXU-width, at identical normalized MXU
    # cost by the occupancy model — never measured (r3 swept 16/64 only).
    if "n2sweep" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        ref = None
        for n2 in (32, 128, 16, 256):
            try:
                with Budget(int(os.environ.get("XMT_SPEC_BUDGET", "1200"))):
                    t0 = time.perf_counter()
                    sr, si = spectrum_pallas(
                        re_j, im_j, ZF, window=w_j, interpret=interp, n2=n2
                    )
                    wit = float(jnp.sum(sr[0]))
                    comp = time.perf_counter() - t0
                    if ref is None:
                        ref = (np.asarray(sr[:64]), np.asarray(si[:64]))
                        err = 0.0
                    else:
                        err = float(
                            np.max(np.abs(np.asarray(sr[:64]) - ref[0]))
                            / max(1e-30, np.max(np.abs(ref[0])))
                        )
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            sr, si = spectrum_pallas(
                                re_j, im_j, ZF, window=w_j,
                                interpret=interp, n2=n2,
                            )
                        float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"n2sweep/n2_{n2}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                        compile_s=round(comp, 1),
                        rel_err_vs_n2_32=err,
                        witness=wit,
                    )
            except Exception as e:  # noqa: BLE001
                report(f"n2sweep/n2_{n2}", error=repr(e)[:600])

        # and the production variant: with_maxmag at the best two splits
        for n2 in (32, 128):
            try:
                with Budget(900):
                    out = spectrum_pallas(
                        re_j, im_j, ZF, window=w_j, interpret=interp,
                        n2=n2, with_maxmag=True,
                    )
                    float(jnp.sum(out[0][0]))
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(chain):
                            out = spectrum_pallas(
                                re_j, im_j, ZF, window=w_j,
                                interpret=interp, n2=n2, with_maxmag=True,
                            )
                        float(jnp.sum(out[0][0]) + jnp.sum(out[2]))
                        times.append((time.perf_counter() - t0) / chain)
                    report(
                        f"n2sweep/maxmag_n2_{n2}",
                        ms_chained=round(1e3 * float(np.median(times)), 2),
                    )
            except Exception as e:  # noqa: BLE001
                report(f"n2sweep/maxmag_n2_{n2}", error=repr(e)[:600])

    # ---- profiler: is a device trace available through the relay? --------
    if "profiler" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        trace_dir = "/tmp/jax_trace_r7"
        try:
            with Budget(600):
                with jax.profiler.trace(trace_dir):
                    sr, si = spectrum_pallas(
                        re_j, im_j, ZF, window=w_j, interpret=interp
                    )
                    float(jnp.sum(sr[0]))
                produced = []
                for root, _, files in os.walk(trace_dir):
                    produced += [
                        os.path.join(root, f)
                        for f in files
                    ]
                has_device = any(
                    "xplane" in f or "trace" in f for f in produced
                )
                report(
                    "profiler/trace",
                    files=len(produced),
                    sample=[os.path.basename(f) for f in produced[:5]],
                    device_timeline=bool(has_device),
                )
        except Exception as e:  # noqa: BLE001
            report("profiler/trace", error=repr(e)[:1000])

    # ---- e2e: fused headline fresh-backend re-measure ---------------------
    if "e2e" in groups:
        from xmris_tpu.parallel.pipeline import PipelineConfig

        cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single")
        try:
            with Budget(int(os.environ.get("XMT_E2E_BUDGET", "2400"))):
                ms = bench.run_e2e_fused(fids, weight, freqs, cfg)
                report(
                    "e2e/fused_v9",
                    ms_per_grid=round(1e3 * ms, 1),
                    voxels_per_s=round(fids.shape[0] / ms),
                )
        except Exception as e:  # noqa: BLE001
            report("e2e/fused_v9", error=repr(e)[:1000])


if __name__ == "__main__":
    main()
