"""Round-5 (continuation session r19) TPU measurement batch.

Groups (XMT_GROUP):
  asls     — AsLS baseline at grid scale (VERDICT r4 item 5): 16384x2048,
             n_iter sweep, chained timing with witnessed readback.
  appolish — fused ACME polish kernel vs the XLA gd polish at grid scale
             (VERDICT r4 item 4), plus trace attribution of the gd polish.

One careful batch per session (the remote backend wedges under hammering);
every experiment prints a JSON line immediately and appends to
``results/tpu_r19.jsonl``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r19.jsonl"
RESULTS.parent.mkdir(exist_ok=True)


def report(name: str, **kw) -> None:
    rec = {"name": name, **kw}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp

    for k, v in (
        ("jax_compilation_cache_dir", "/root/.cache/jax_xmt"),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
    ):
        try:
            jax.config.update(k, v)
        except Exception:
            pass

    report("session", backend=jax.default_backend(), devices=len(jax.devices()))

    reps = int(os.environ.get("XMT_REPS", "3"))
    group = os.environ.get("XMT_GROUP", "asls")

    B = int(os.environ.get("XMT_B", "16384"))
    NF = int(os.environ.get("XMT_NF", "2048"))

    def chained(fn, witness, chain=4, iters=None):
        """Steady-state per-call seconds: `chain` calls + ONE witnessing
        scalar readback per timed pass (dispatch-floor methodology)."""
        if iters is None:
            iters = reps
        witness(fn())  # compile + execution witness
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(chain):
                out = fn()
            witness(out)
            times.append((time.perf_counter() - t0) / chain)
        return float(np.median(times))

    if group == "asls":
        from xmris_tpu.ops.baseline import als_baseline_batched

        rng = np.random.default_rng(0)
        # Realistic absorption spectra: peaks + smooth broad baseline + noise
        f = np.linspace(-1.0, 1.0, NF, dtype=np.float32)
        rows = (
            40.0 * np.exp(-((f[None, :] - rng.uniform(-0.5, 0.5, (B, 1))) ** 2) / 1e-4)
            + 20.0 * np.exp(-((f[None, :] + 0.3) ** 2) / 0.3)  # broad baseline
            + rng.normal(0, 0.5, (B, NF))
        ).astype(np.float32)
        rows_j = jnp.asarray(rows)

        solvers = tuple(
            s for s in os.environ.get("XMT_ASLS_SOLVERS", "scan,cr").split(",")
            if s
        )
        for solver in solvers:
            for n_iter in (1, 10):
                def run(n_iter=n_iter, solver=solver):
                    return als_baseline_batched(
                        rows_j, 1e5, 0.001, n_iter, solver=solver
                    )

                def wit(z):
                    return float(jnp.sum(z[:, ::256]))

                try:
                    t0 = time.perf_counter()
                    s = chained(run, wit, chain=2)
                    report(
                        "asls_grid", B=B, NF=NF, n_iter=n_iter, solver=solver,
                        chained_ms=round(s * 1e3, 2),
                        total_first_s=round(time.perf_counter() - t0, 1),
                    )
                except Exception as e:
                    report(
                        "asls_grid", B=B, NF=NF, n_iter=n_iter, solver=solver,
                        error=f"{type(e).__name__}: {e}"[:300],
                    )

    if group == "appolish":
        _run_appolish(report, B, NF, reps)


def _run_appolish(report, B, NF, reps):
    """Grid-autophase: XLA gd polish vs the fused whole-loop Pallas polish.

    Times the full _grid_phase_search (scan + polish) AND the isolated
    polish stages, plus achieved-score quality comparison per voxel.
    """
    import jax
    import jax.numpy as jnp

    from xmris_tpu.ops.kernels.acme_pallas import acme_polish_pallas
    from xmris_tpu.ops.phasing import (
        _grid_phase_search,
        _phased_real_planar,
        acme_score_raw,
    )

    rng = np.random.default_rng(1)
    f = np.linspace(-2500.0, 2500.0, NF).astype(np.float32)
    xr = float(f[-1] - f[0])
    re = np.zeros((B, NF), np.float32)
    for _ in range(3):
        center = rng.uniform(-2000, 2000, (B, 1)).astype(np.float32)
        lw = rng.uniform(20, 80, (B, 1)).astype(np.float32)
        amp = rng.uniform(5, 30, (B, 1)).astype(np.float32)
        re += amp / (1.0 + ((f[None, :] - center) / lw) ** 2)
    p0 = rng.uniform(-120, 120, (B, 1)).astype(np.float32)
    p1 = rng.uniform(-600, 600, (B, 1)).astype(np.float32)
    u = (f[None, :] - 0.0) / xr
    phi = np.deg2rad(p0 + p1 * u)
    re_r = (re * np.cos(phi) + rng.normal(0, 0.2, (B, NF))).astype(np.float32)
    im_r = (-re * np.sin(phi) + rng.normal(0, 0.2, (B, NF))).astype(np.float32)

    re_j = jnp.asarray(re_r)
    im_j = jnp.asarray(im_r)
    f_j = jnp.asarray(f)
    piv_idx = np.argmax(re_r**2 + im_r**2, axis=1)
    pivots = jnp.asarray(f[piv_idx])
    t_idx = jnp.asarray(piv_idx)

    def scores(p):
        def one(pv, rr, ri, pivot):
            d = _phased_real_planar(rr, ri, f_j, pv[0], pv[1], pivot, xr)
            return acme_score_raw(d)

        return np.asarray(jax.vmap(one)(p, re_j, im_j, pivots))

    for p0_only in (False, True):
        results = {}
        for variant in ("gd", "fused"):
            # Arrays must be jit ARGUMENTS: a no-arg closure embeds the
            # 134 MB planes as HLO constants and the remote compile
            # endpoint rejects the request body (HTTP 413).
            run = jax.jit(
                lambda rj, ij, pv, ti, po=p0_only, va=variant: (
                    _grid_phase_search(
                        rj, ij, f_j, xr, pv, ti, 8, "acme", po,
                        polish_optimizer=va,
                    )
                )
            )
            try:
                t0 = time.perf_counter()
                out = jax.block_until_ready(run(re_j, im_j, pivots, t_idx))
                first = time.perf_counter() - t0
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    out = jax.block_until_ready(
                        run(re_j, im_j, pivots, t_idx)
                    )
                    times.append(time.perf_counter() - t0)
            except Exception as e:
                report(
                    "appolish", variant=variant, B=B, NF=NF, p0_only=p0_only,
                    error=f"{type(e).__name__}: {e}"[:300],
                )
                continue
            sc = scores(out)
            results[variant] = sc
            report(
                "appolish", variant=variant, B=B, NF=NF, p0_only=p0_only,
                warm_ms=round(float(np.median(times)) * 1e3, 1),
                first_s=round(first, 1),
                score_p50=float(np.median(sc)),
            )
            time.sleep(5)  # space remote Mosaic compiles
        if "gd" not in results or "fused" not in results:
            continue
        gd, fu = results["gd"], results["fused"]
        ok = np.isfinite(gd) & np.isfinite(fu)
        frac_le = float(np.mean(fu[ok] <= gd[ok] + 1e-9))
        rel_p99 = float(
            np.percentile((fu[ok] - gd[ok]) / np.maximum(np.abs(gd[ok]), 1e-12), 99)
        )
        report(
            "appolish_quality", p0_only=p0_only, frac_fused_le_gd=round(frac_le, 4),
            rel_excess_p99=rel_p99,
        )

    # Isolated polish-stage timing at a shared seed (kernel-only cost).
    p_seed = jnp.zeros((B, 2), jnp.float32)
    interp = jax.default_backend() != "tpu"
    vts = (8, 16, 32) if not interp else (8,)
    for vt in vts:
        kern = jax.jit(
            lambda rj, ij, pv, ps, vt=vt: acme_polish_pallas(
                rj, ij, f_j, pv, ps, xr, n_iter=40,
                p0_only=False, v_tile=vt, interpret=interp,
            )[0]
        )
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(kern(re_j, im_j, pivots, p_seed))
            first = time.perf_counter() - t0
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(kern(re_j, im_j, pivots, p_seed))
                times.append(time.perf_counter() - t0)
            report(
                "appolish_kernel_only", B=B, NF=NF, n_iter=40, v_tile=vt,
                warm_ms=round(float(np.median(times)) * 1e3, 1),
                first_s=round(first, 1),
            )
        except Exception as e:
            report(
                "appolish_kernel_only", B=B, NF=NF, n_iter=40, v_tile=vt,
                error=f"{type(e).__name__}: {e}"[:300],
            )
        time.sleep(5)  # space remote Mosaic compiles (r7: back-to-back 500s)


if __name__ == "__main__":
    main()
