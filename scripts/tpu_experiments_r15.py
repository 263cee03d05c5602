"""Round-15 TPU measurement session: decompose fit_amares' seed stage.

r14 measured the lean serve wall at 6.0 s/grid with the ``seed`` stage
at 3.9 s — of which only ~1.6 s is the unavoidable ~85 MB/s relay upload
of the grid planes.  This session attributes the remaining ~2.3 s by
timing each sub-step of the seed path in isolation at bench scale
(16384 voxels x 1024 pts), warm (3 reps after a warmup rep):

  host_planes   np.ascontiguousarray of the real/imag planes
  upload        device_put of both planes, witnessed by scalar readback
  template_fit  single-voxel planar LM (one jitted dispatch + readback)
  ls_seed       _linear_amp_phase_seed given device planes
  x0_assembly   template broadcast + first-point rescale + staging writes
  to_internal   external_to_internal + device upload of u0

JSON lines appended to ``results/tpu_r15.jsonl``.

Run on the default (axon) platform:   python scripts/tpu_experiments_r15.py
CPU smoke:  XMT_FORCE_CPU=1 XMT_SMOKE_GRID=8,4 XMT_SMOKE_NT=256 \
            python scripts/tpu_experiments_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r15.jsonl"
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

    import jax.numpy as jnp

    report("session", backend=jax.default_backend(), devices=len(jax.devices()))

    import bench
    from xmris_tpu.fitting.amares import (
        _linear_amp_phase_seed,
        select_template_fid,
        template_optimum,
        template_seeded_x0,
    )
    from xmris_tpu.fitting.lm import external_to_internal
    from xmris_tpu.fitting.prior import load_prior_knowledge

    if os.environ.get("XMT_SMOKE_GRID"):
        bench.GRID = tuple(
            int(s) for s in os.environ["XMT_SMOKE_GRID"].split(",") if s.strip()
        )
    if os.environ.get("XMT_SMOKE_NT"):
        bench.N_TIME = int(os.environ["XMT_SMOKE_NT"])

    fids, _, _ = bench.make_inputs()
    pk_tmp = Path("/tmp/xmt_r15_pk.csv")
    pk_tmp.write_text(bench.PK_CSV)
    pk = load_prior_knowledge(pk_tmp)
    n_time = fids.shape[1]
    sw = bench.SW
    timeaxis = np.arange(n_time, dtype=np.float64) * (1.0 / sw)
    t_j = jnp.asarray(timeaxis)

    reps = int(os.environ.get("XMT_REPS", "3"))
    group = os.environ.get("XMT_GROUP", "seedsplit")

    if group == "servepre":
        # Serial-lean vs pipeline serve walls now that the pipeline's
        # loader thread ALSO prefetches the next grid's device upload
        # (stage_device_fids) — the r15 attribution says that upload is
        # the per-grid wall, so overlapping it with the previous grid's
        # fit is the one remaining serve lever.  r14 baseline: lean 6.0,
        # pipeline 6.9 s/grid (pipeline net-negative pre-prefetch).
        import contextlib
        import io
        import shutil

        from xmris_tpu.core.array import XmrArray
        from xmris_tpu.interop.io import save_npz
        from xmris_tpu.runtime.cli import serve_main

        n_files = int(os.environ.get("XMT_SERVE_FILES", "4"))
        max_iter = int(os.environ.get("XMT_SERVE_MAX_ITER", "24"))
        base = Path("/tmp/xmt_servepre")
        if base.exists():
            shutil.rmtree(base)
        warm_dir = base / "warm"
        batch_dir = base / "batch"
        warm_dir.mkdir(parents=True)
        batch_dir.mkdir()
        pk_path = base / "pk.csv"
        pk_path.write_text(bench.PK_CSV)

        t_axis = np.arange(fids.shape[1]) / bench.SW
        da = XmrArray(
            fids, dims=("voxel", "time"),
            coords={"voxel": np.arange(fids.shape[0]),
                    "time": ("time", t_axis)},
            attrs={"MHz": bench.MHZ, "sw": bench.SW}, name="fid",
        )
        for i in range(2):
            save_npz(da, warm_dir / f"w{i}.npz")
        for i in range(n_files):
            save_npz(da, batch_dir / f"g{i}.npz")
        report("servepre/inputs", n_files=n_files,
               file_mb=round((batch_dir / "g0.npz").stat().st_size / 1e6, 1),
               voxels=int(fids.shape[0]), n_time=int(fids.shape[1]),
               max_iter=max_iter)

        def run_serve(watch, out, extra):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = serve_main(
                    [str(watch), str(pk_path), "-o", str(out), "--once",
                     "--max-iter", str(max_iter),
                     "--mhz", str(bench.MHZ), "--sw", str(bench.SW)] + extra
                )
            recs = [json.loads(ln)
                    for ln in buf.getvalue().strip().splitlines()
                    if ln.startswith("{")]
            return rc, recs

        t0 = time.perf_counter()
        rc, recs = run_serve(warm_dir, base / "out_warm", [])
        report("servepre/warmup", rc=rc,
               wall_s=round(time.perf_counter() - t0, 2),
               statuses=sorted({r.get("status") for r in recs}))

        for rep in range(reps):
            for tag, extra in (("lean", []), ("pipeline", ["--pipeline"])):
                out = base / f"out_{tag}_{rep}"
                t0 = time.perf_counter()
                rc, recs = run_serve(batch_dir, out, extra)
                wall = time.perf_counter() - t0
                n_ok = sum(r.get("status") == "ok" for r in recs)
                report(f"servepre/{tag}", rep=rep, rc=rc,
                       wall_s=round(wall, 2),
                       per_grid_s=round(wall / max(n_ok, 1), 2),
                       n_ok=n_ok)
        report("done")
        return

    if group == "uploadab":
        # A/B the grid upload: (a) host deinterleave + two device_puts
        # (the pre-r15 path) vs (b) one zero-copy interleaved transfer +
        # on-device split (_device_fid_planes).  Both witnessed by a
        # scalar readback so the async relay dispatch can't hide.
        from xmris_tpu.fitting.amares import _device_fid_planes

        assert fids.dtype == np.complex64
        for rep in range(-1, reps):
            tag = "warmup" if rep < 0 else f"rep{rep}"
            t0 = time.perf_counter()
            re_a = jnp.asarray(np.ascontiguousarray(fids.real))
            im_a = jnp.asarray(np.ascontiguousarray(fids.imag))
            float(jnp.sum(re_a[0, :8]) + jnp.sum(im_a[0, :8]))
            t_two = time.perf_counter() - t0

            t0 = time.perf_counter()
            re_b, im_b = _device_fid_planes(fids)
            float(jnp.sum(re_b[0, :8]) + jnp.sum(im_b[0, :8]))
            t_one = time.perf_counter() - t0

            ok = bool(
                np.array_equal(np.asarray(re_b[:2]), np.asarray(re_a[:2]))
                and np.array_equal(np.asarray(im_b[:2]), np.asarray(im_a[:2]))
            )
            report(
                f"uploadab/{tag}",
                two_puts=round(t_two, 3),
                interleaved=round(t_one, 3),
                parity=ok,
            )
        report("done")
        return

    # Warmup rep compiles everything once; then timed reps.
    for rep in range(-1, reps):
        tag = "warmup" if rep < 0 else f"rep{rep}"
        steps: dict[str, float] = {}
        t0 = time.perf_counter()

        def mark(name: str) -> None:
            nonlocal t0
            now = time.perf_counter()
            steps[name] = round(now - t0, 3)
            t0 = now

        re_np = np.ascontiguousarray(fids.real)
        im_np = np.ascontiguousarray(fids.imag)
        mark("host_planes")

        re_all = jnp.asarray(re_np)
        im_all = jnp.asarray(im_np)
        float(jnp.sum(re_all[0, :8]) + jnp.sum(im_all[0, :8]))  # witness
        mark("upload")

        template_fid = fids[select_template_fid(fids, announce=False)]
        mark("template_select")

        x_t = template_optimum(
            fids, pk, t_j, bench.MHZ, template_fid=template_fid, max_iter=24
        )
        mark("template_fit")

        amp, ph = _linear_amp_phase_seed(
            fids, x_t, pk, t_j, bench.MHZ, device_fids=(re_all, im_all)
        )
        mark("ls_seed")

        # Full seed path (includes everything above except the upload) for
        # cross-checking that the parts sum to the whole.
        x0 = template_seeded_x0(
            fids, pk, t_j, bench.MHZ,
            template_fid=template_fid, fit_template=True,
            scale_amplitudes=True, max_iter=24,
            device_fids=(re_all, im_all),
        )
        mark("full_template_seeded_x0")

        u0 = external_to_internal(x0, pk.lower, pk.upper, pk.kind)
        u0_j = jnp.asarray(u0)
        float(jnp.sum(u0_j[0]))
        mark("to_internal")

        report(f"seedsplit/{tag}", **steps)

    report("done")


if __name__ == "__main__":
    main()
