"""Round-14 TPU measurement session: serve-loop pipeline throughput.

The r13 commit pipelined ``xmris-tpu-serve``'s three per-grid stages
(loader thread prefetches grid N+1, writer thread saves grid N-1 while
the device fits grid N) with the claim that host I/O on production-scale
archives rivals the device program, so the overlap should roughly double
steady-state throughput.  This session measures it on the real chip with
bench-scale inputs (16384 voxels x 1024 pts complex64 ~ 134 MB npz per
grid, the 5-peak 31P phantom from bench.py).

Group ``servebench``: for each mode (serial / pipeline) run
``serve_main`` IN-PROCESS over a 2-file warmup dir (pays the compile /
program-load cost once; the jit caches are shared by both modes, so
ordering cannot bias the comparison) and then time repeated ``--once``
drains of an N-file batch.  Reads hit the OS page cache after the first
pass — recorded as such; a cold-disk deployment would favor the pipeline
MORE (larger load times to hide).

JSON lines appended to ``results/tpu_r14.jsonl``.

Run on the default (axon) platform:   python scripts/tpu_experiments_r14.py
CPU smoke:  XMT_FORCE_CPU=1 XMT_SERVE_FILES=2 XMT_SERVE_REPS=1 \
            XMT_SMOKE_GRID=8,4 XMT_SMOKE_NT=256 python scripts/...
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import signal
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r14.jsonl"
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
    from xmris_tpu.core.array import XmrArray
    from xmris_tpu.interop.io import save_npz
    from xmris_tpu.runtime.cli import serve_main

    if os.environ.get("XMT_SMOKE_GRID"):
        bench.GRID = tuple(
            int(s) for s in os.environ["XMT_SMOKE_GRID"].split(",") if s.strip()
        )
    if os.environ.get("XMT_SMOKE_NT"):
        bench.N_TIME = int(os.environ["XMT_SMOKE_NT"])

    groups = set(
        (os.environ.get("XMT_EXP") or "servebench,xfer,fitstages").split(",")
    )

    n_files = int(os.environ.get("XMT_SERVE_FILES", "6"))
    reps = int(os.environ.get("XMT_SERVE_REPS", "2"))
    max_iter = int(os.environ.get("XMT_SERVE_MAX_ITER", "24"))

    fids, _, _ = bench.make_inputs()

    def as_da():
        t = np.arange(fids.shape[1]) / bench.SW
        return XmrArray(
            fids,
            dims=("voxel", "time"),
            coords={
                "voxel": np.arange(fids.shape[0]),
                "time": ("time", t),
            },
            attrs={"MHz": bench.MHZ, "sw": bench.SW},
            name="fid",
        )

    # ---- xfer: relay host<->device bandwidth at production sizes ----------
    if "xfer" in groups:
        import jax.numpy as jnp

        try:
            with Budget(900):
                for mb_shape in ((16384, 1024), (16384, 2048)):
                    x_np = np.ones(mb_shape, np.float32)
                    nbytes = x_np.nbytes
                    # Upload: host -> device, witnessed by a scalar readback.
                    ups = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        xj = jax.device_put(x_np)
                        float(jnp.sum(xj[0, :8]))
                        ups.append(time.perf_counter() - t0)
                    # Readback: device -> host (full array).  Must be a
                    # COMPUTED array: device_put keeps the host buffer, so
                    # np.asarray of it never touches the wire.
                    yj = jax.jit(lambda a: a * 1.000001)(xj)
                    float(jnp.sum(yj[0, :8]))  # ensure computed
                    downs = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        _ = np.asarray(yj)
                        downs.append(time.perf_counter() - t0)
                    report(
                        "xfer/f32",
                        shape=list(mb_shape),
                        mb=round(nbytes / 1e6, 1),
                        up_s=round(float(np.median(ups)), 3),
                        down_s=round(float(np.median(downs)), 3),
                        up_mb_s=round(nbytes / 1e6 / float(np.median(ups)), 1),
                        down_mb_s=round(
                            nbytes / 1e6 / float(np.median(downs)), 1
                        ),
                    )
        except Exception as e:  # noqa: BLE001
            report("xfer/f32", error=repr(e)[:800])

    # ---- fitstages: where does a serve-style fit_amares grid go? ----------
    if "fitstages" in groups:
        import contextlib as _ctx

        from xmris_tpu.fitting.amares import fit_amares
        from xmris_tpu.fitting.prior import load_prior_knowledge

        os.environ["XMT_FIT_STAGE_TIMERS"] = "1"
        pk_tmp = Path("/tmp/xmt_fitstages_pk.csv")
        pk_tmp.write_text(bench.PK_CSV)
        prior = load_prior_knowledge(pk_tmp)
        da = as_da()
        try:
            with Budget(int(os.environ.get("XMT_FITSTAGES_BUDGET", "2400"))):
                stage_lines = []
                for rep in range(3):
                    buf = io.StringIO()
                    t0 = time.perf_counter()
                    with _ctx.redirect_stdout(buf):
                        ds = fit_amares(
                            da, prior, dim="time", mhz=bench.MHZ,
                            sw=bench.SW, max_iter=max_iter,
                        )
                    wall = time.perf_counter() - t0
                    stages = None
                    for ln in buf.getvalue().splitlines():
                        if ln.startswith("{"):
                            stages = json.loads(ln)["fit_amares_stages_s"]
                    conv = float(
                        np.asarray(ds["fit_converged"].values).mean()
                    )
                    stage_lines.append(stages)
                    report(
                        "fitstages/rep",
                        rep=rep,
                        wall_s=round(wall, 2),
                        converged_frac=round(conv, 4),
                        stages=stages,
                    )
        except Exception as e:  # noqa: BLE001
            report("fitstages/rep", error=repr(e)[:800])
        finally:
            os.environ.pop("XMT_FIT_STAGE_TIMERS", None)

    if "servebench" not in groups:
        report("done", groups=sorted(groups))
        return

    base = Path("/tmp/xmt_servebench")
    if base.exists():
        shutil.rmtree(base)
    warm_dir = base / "warm"
    batch_dir = base / "batch"
    warm_dir.mkdir(parents=True)
    batch_dir.mkdir()
    pk_path = base / "pk.csv"
    pk_path.write_text(bench.PK_CSV)

    da = as_da()
    t0 = time.perf_counter()
    for i in range(2):
        save_npz(da, warm_dir / f"w{i}.npz")
    for i in range(n_files):
        save_npz(da, batch_dir / f"g{i}.npz")
    write_s = time.perf_counter() - t0
    size_mb = (batch_dir / "g0.npz").stat().st_size / 1e6
    report(
        "servebench/inputs",
        n_files=n_files,
        file_mb=round(size_mb, 1),
        gen_s=round(write_s, 1),
        voxels=int(fids.shape[0]),
        n_time=int(fids.shape[1]),
        max_iter=max_iter,
    )

    def run_serve(watch: Path, out: Path, extra: list[str]) -> tuple[int, list]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = serve_main(
                [
                    str(watch), str(pk_path), "-o", str(out), "--once",
                    "--max-iter", str(max_iter),
                    "--mhz", str(bench.MHZ), "--sw", str(bench.SW),
                ]
                + extra
            )
        records = [
            json.loads(ln)
            for ln in buf.getvalue().strip().splitlines()
            if ln.startswith("{")
        ]
        return rc, records

    # Warmup: pays jit compile / remote program load once; caches are
    # in-process and shared by every timed run below.
    try:
        with Budget(int(os.environ.get("XMT_WARM_BUDGET", "2400"))):
            t0 = time.perf_counter()
            rc, recs = run_serve(warm_dir, base / "out_warm", [])
            report(
                "servebench/warmup",
                rc=rc,
                wall_s=round(time.perf_counter() - t0, 2),
                n_records=len(recs),
                statuses=sorted({r.get("status") for r in recs}),
            )
    except Exception as e:  # noqa: BLE001
        report("servebench/warmup", error=repr(e)[:800])
        return

    modes_env = os.environ.get("XMT_SERVE_MODES", "lean,curves,pipeline")
    all_modes = {
        "lean": [],  # new default: serial, no curves
        "curves": ["--curves"],  # the pre-r14 output contract
        "pipeline": ["--pipeline"],  # threaded overlap, lean results
    }
    modes = tuple(
        (m, all_modes[m]) for m in modes_env.split(",") if m in all_modes
    )
    per_grid = {}
    for tag, extra in modes:
        walls = []
        try:
            with Budget(int(os.environ.get("XMT_MODE_BUDGET", "1800"))):
                for rep in range(reps):
                    out = base / f"out_{tag}_{rep}"
                    t0 = time.perf_counter()
                    rc, recs = run_serve(batch_dir, out, extra)
                    wall = time.perf_counter() - t0
                    walls.append(wall)
                    n_ok = sum(r.get("status") == "ok" for r in recs)
                    if rc != 0 or n_ok != n_files:
                        report(
                            f"servebench/{tag}",
                            rep=rep,
                            rc=rc,
                            n_ok=n_ok,
                            error="bad batch",
                            records=recs[:3],
                        )
                        break
                else:
                    best = min(walls)
                    per_grid[tag] = best / n_files
                    report(
                        f"servebench/{tag}",
                        wall_s=[round(w, 2) for w in walls],
                        ms_per_grid=round(1e3 * best / n_files, 1),
                        grids_per_s=round(n_files / best, 2),
                    )
        except Exception as e:  # noqa: BLE001
            report(f"servebench/{tag}", error=repr(e)[:800])
    if per_grid:
        report(
            "servebench/summary",
            **{f"{k}_ms": round(1e3 * v, 1) for k, v in per_grid.items()},
            page_cache="hot (cold disk would favor the pipeline more)",
        )

    shutil.rmtree(base, ignore_errors=True)
    report("done", groups=sorted(groups))


if __name__ == "__main__":
    main()
