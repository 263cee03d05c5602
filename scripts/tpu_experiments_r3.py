"""Round-3 TPU measurement session: spectral kernel variants, v9 LM kernel,
grid-scale per-voxel autophase.

One careful batch (the remote backend wedges under hammering): every
experiment prints a JSON line immediately and appends to
``results/tpu_r3.jsonl``, so a wedge mid-run loses nothing already measured.

Run on the default (axon) platform:   python scripts/tpu_experiments_r3.py
Select experiment groups:             XMT_EXP=spec3,fit9 python ...
Groups:
  spec3  — spectrum_pallas stage-2/split/pre-relayout sweep (chained)
  fit9   — v9 vs v8 full-grid fit+CRLB (Lorentzian), v9 Voigt-fixed,
           v9 free-g (each chained x4 like bench)
  apall  — autophase mode="all" (per-voxel in-graph DE) at grid scale
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "results" / "tpu_r3.jsonl"
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
    NT, ZF, SW, MHZ = bench.N_TIME, bench.ZERO_FILL, bench.SW, bench.MHZ
    fids, weight, freqs = bench.make_inputs()
    fids = fids[:B]
    re_h = np.ascontiguousarray(fids.real.astype(np.float32))
    im_h = np.ascontiguousarray(fids.imag.astype(np.float32))

    groups = set((os.environ.get("XMT_EXP") or "spec3,fit9,apall").split(","))
    interp = backend not in ("tpu",)

    # ---- v9 kernel at bench scale ----------------------------------------
    if "fit9" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)

        pk_voigt_fixed = bench.PK_CSV.replace(
            "g,0,0,0,0,0", "g,0.2,0.2,0.2,0.2,0.2"
        )
        pk_free_g = bench.PK_CSV.replace(
            "g,fixed,fixed,fixed,fixed,fixed",
            'g,"(0, 1)","(0, 1)","(0, 1)","(0, 1)","(0, 1)"',
        )

        fit_cases = [
            ("lorentzian/v9", bench.PK_CSV, 9),
            ("lorentzian/v8", bench.PK_CSV, 8),
            ("voigt_fixed/v9", pk_voigt_fixed, 9),
            ("voigt_fixed/v6", pk_voigt_fixed, 6),
            ("free_g/v9", pk_free_g, 9),
        ]
        only = os.environ.get("XMT_FIT9_ONLY")
        if only:
            fit_cases = [c for c in fit_cases if c[0] in only.split(",")]

        for tag, csv, kv in fit_cases:
            try:
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".csv", delete=False
                ) as f:
                    f.write(csv)
                pk = load_prior_knowledge(f.name)
                ps = hashable_pmap(pk.pmap)
                lower = jnp.asarray(pk.lower)
                upper = jnp.asarray(pk.upper)
                kind = jnp.asarray(pk.kind)
                x0 = template_seeded_x0(fids, pk, t, MHZ)
                u0 = jnp.asarray(
                    external_to_internal(
                        x0, pk.lower, pk.upper, pk.kind
                    ).astype(np.float32)
                )

                def one_pass(kv=kv, ps=ps, lower=lower, upper=upper,
                             kind=kind, u0=u0):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=24, kernel_version=kv, return_hessian=True,
                        interpret=interp,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost)) + float(jnp.sum(res.x_free))
                comp = time.perf_counter() - t0
                chain = 4
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(chain):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / chain)
                n_it = np.asarray(res.n_iter)
                report(
                    f"fit9/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                    n_iter_p50=float(np.percentile(n_it, 50)),
                    n_iter_max=int(n_it.max()),
                )
            except Exception as e:  # noqa: BLE001
                report(f"fit9/{tag}", error=repr(e)[:300])

    # ---- spectral kernel variant sweep -----------------------------------
    if "spec3" in groups:
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight[:NT])
        K = 10

        sl = slice(0, 64)
        xw = (re_h[sl] + 1j * im_h[sl]).astype(np.complex128) * weight[:NT]
        host = np.fft.fftshift(
            np.fft.fft(xw, n=ZF, axis=-1, norm="ortho"), axes=-1
        )
        host_scale = np.max(np.abs(host))

        cases = [
            # (tag, n2, s2, pre, v_tile)
            ("base/loop/n2_32/vt64", 32, "loop", False, 64),
            ("stacked2/n2_32/vt64", 32, "stacked2", False, 64),
            ("pre/loop/n2_32/vt64", 32, "loop", True, 64),
            ("pre/stacked2/n2_32/vt64", 32, "stacked2", True, 64),
            ("loop/n2_64/vt64", 64, "loop", False, 64),
            ("stacked2/n2_64/vt64", 64, "stacked2", False, 64),
            ("stacked2/n2_32/vt128", 32, "stacked2", False, 128),
        ]
        for tag, n2, s2, pre, vt in cases:
            @jax.jit
            def run(r, i, _n2=n2, _s2=s2, _p=pre, _vt=vt):
                return spectrum_pallas(
                    r, i, ZF, window=w_j, n2=_n2, v_tile=_vt, s2=_s2,
                    pre_relayout=_p, interpret=interp,
                )

            try:
                t0 = time.perf_counter()
                orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]))
                comp = time.perf_counter() - t0
                got = np.asarray(orr[sl]) + 1j * np.asarray(oii[sl])
                err = float(np.max(np.abs(got - host)) / host_scale)
                t0 = time.perf_counter()
                for _ in range(K):
                    orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
                report(
                    f"spec3/{tag}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                    compile_s=round(comp, 1),
                    max_rel_err=err,
                )
            except Exception as e:  # noqa: BLE001
                report(f"spec3/{tag}", error=repr(e)[:300])

    # ---- round-3b: ungated v9, v_tile sweep, fixed stacked2 --------------
    if "r3b" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)

        pk_voigt_fixed = bench.PK_CSV.replace(
            "g,0,0,0,0,0", "g,0.2,0.2,0.2,0.2,0.2"
        )
        cases = [
            # (tag, csv, kv, v_tile, gate)
            ("lorentzian/v9ungated/vt64", bench.PK_CSV, 9, None, False),
            ("lorentzian/v9ungated/vt128", bench.PK_CSV, 9, 128, False),
            ("lorentzian/v8/vt128", bench.PK_CSV, 8, 128, False),
            ("voigt_fixed/v9ungated/vt64", pk_voigt_fixed, 9, None, False),
        ]
        for tag, csv, kv, vt, gate in cases:
            try:
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".csv", delete=False
                ) as f:
                    f.write(csv)
                pk = load_prior_knowledge(f.name)
                ps = hashable_pmap(pk.pmap)
                lower = jnp.asarray(pk.lower)
                upper = jnp.asarray(pk.upper)
                kind = jnp.asarray(pk.kind)
                x0 = template_seeded_x0(fids, pk, t, MHZ)
                u0 = jnp.asarray(
                    external_to_internal(
                        x0, pk.lower, pk.upper, pk.kind
                    ).astype(np.float32)
                )

                def one_pass(kv=kv, ps=ps, lower=lower, upper=upper,
                             kind=kind, u0=u0, vt=vt, gate=gate):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=24, kernel_version=kv, return_hessian=True,
                        interpret=interp, v_tile=vt, gate_rejects=gate,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / 4)
                report(
                    f"r3b/fit/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                )
            except Exception as e:  # noqa: BLE001
                report(f"r3b/fit/{tag}", error=repr(e)[:300])

        w_j = jnp.asarray(weight[:NT])
        sl = slice(0, 64)
        xw = (re_h[sl] + 1j * im_h[sl]).astype(np.complex128) * weight[:NT]
        host = np.fft.fftshift(
            np.fft.fft(xw, n=ZF, axis=-1, norm="ortho"), axes=-1
        )
        host_scale = np.max(np.abs(host))
        for tag, n2, s2, vt in (
            ("stacked2/n2_32/vt64", 32, "stacked2", 64),
            ("stacked2/n2_32/vt128", 32, "stacked2", 128),
            ("loop/n2_32/vt128", 32, "loop", 128),
        ):
            @jax.jit
            def run(r, i, _n2=n2, _s2=s2, _vt=vt):
                return spectrum_pallas(
                    r, i, ZF, window=w_j, n2=_n2, v_tile=_vt, s2=_s2,
                    interpret=interp,
                )

            try:
                t0 = time.perf_counter()
                orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]))
                comp = time.perf_counter() - t0
                got = np.asarray(orr[sl]) + 1j * np.asarray(oii[sl])
                err = float(np.max(np.abs(got - host)) / host_scale)
                t0 = time.perf_counter()
                for _ in range(10):
                    orr, oii = run(re_j, im_j)
                float(jnp.sum(orr[0]) + jnp.sum(oii[0]))
                report(
                    f"r3b/spec/{tag}",
                    ms_per_call=round(
                        (time.perf_counter() - t0) / 10 * 1e3, 3
                    ),
                    compile_s=round(comp, 1),
                    max_rel_err=err,
                )
            except Exception as e:  # noqa: BLE001
                report(f"r3b/spec/{tag}", error=repr(e)[:300])

    # ---- round-3c: factored-basis v9 (auto-selected on uniform t) --------
    if "r3c" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        pk_voigt_fixed = bench.PK_CSV.replace(
            "g,0,0,0,0,0", "g,0.2,0.2,0.2,0.2,0.2"
        )

        # (tag, csv, max_iter) — v9/vt128, factored basis auto-on
        for tag, csv, mi in (
            ("lorentzian/v9fac/vt128/mi24", bench.PK_CSV, 24),
            ("lorentzian/v9fac/vt128/mi8", bench.PK_CSV, 8),
            ("voigt_fixed/v9fac/vt128/mi24", pk_voigt_fixed, 24),
        ):
            try:
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".csv", delete=False
                ) as f:
                    f.write(csv)
                pk = load_prior_knowledge(f.name)
                ps = hashable_pmap(pk.pmap)
                lower = jnp.asarray(pk.lower)
                upper = jnp.asarray(pk.upper)
                kind = jnp.asarray(pk.kind)
                x0 = template_seeded_x0(fids, pk, t, MHZ)
                u0 = jnp.asarray(
                    external_to_internal(
                        x0, pk.lower, pk.upper, pk.kind
                    ).astype(np.float32)
                )

                def one_pass(ps=ps, lower=lower, upper=upper, kind=kind,
                             u0=u0, mi=mi):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=mi, kernel_version=9, return_hessian=True,
                        interpret=interp,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / 4)
                report(
                    f"r3c/fit/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                    n_iter_max=int(np.asarray(res.n_iter).max()),
                )
            except Exception as e:  # noqa: BLE001
                report(f"r3c/fit/{tag}", error=repr(e)[:300])

    # ---- round-3d: in-kernel free-fold + per-launch kernel cost ----------
    if "r3d" in groups:
        import tempfile

        from xmris_tpu.fitting.amares import template_seeded_x0
        from xmris_tpu.fitting.lm import (
            crlb_from_hessian,
            external_to_internal,
            hashable_pmap,
            lm_fit_batched_pallas,
        )
        from xmris_tpu.fitting.prior import load_prior_knowledge
        from xmris_tpu.ops.kernels.lm_pallas import (
            eq6_normal_equations_pallas_v9,
        )

        t = jnp.asarray((np.arange(NT) / SW).astype(np.float32))
        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        pk_voigt_fixed = bench.PK_CSV.replace(
            "g,0,0,0,0,0", "g,0.2,0.2,0.2,0.2,0.2"
        )

        for tag, csv in (
            ("lorentzian/v9fold/vt128", bench.PK_CSV),
            ("voigt_fixed/v9fold/vt128", pk_voigt_fixed),
        ):
            try:
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".csv", delete=False
                ) as f:
                    f.write(csv)
                pk = load_prior_knowledge(f.name)
                ps = hashable_pmap(pk.pmap)
                lower = jnp.asarray(pk.lower)
                upper = jnp.asarray(pk.upper)
                kind = jnp.asarray(pk.kind)
                x0 = template_seeded_x0(fids, pk, t, MHZ)
                u0 = jnp.asarray(
                    external_to_internal(
                        x0, pk.lower, pk.upper, pk.kind
                    ).astype(np.float32)
                )

                def one_pass(ps=ps, lower=lower, upper=upper, kind=kind,
                             u0=u0):
                    res, h_ext = lm_fit_batched_pallas(
                        re_j, im_j, t, u0, lower, upper, kind, ps, MHZ,
                        max_iter=24, kernel_version=9, return_hessian=True,
                        interpret=interp,
                    )
                    sds, _ = crlb_from_hessian(h_ext, res.cost, NT)
                    return res, sds

                t0 = time.perf_counter()
                res, sds = one_pass()
                wit = float(jnp.sum(res.cost))
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        res, sds = one_pass()
                    float(jnp.sum(res.x_free) + jnp.sum(sds))
                    ts.append((time.perf_counter() - t0) / 4)
                report(
                    f"r3d/fit/{tag}",
                    ms=round(float(np.median(ts)) * 1e3, 1),
                    compile_s=round(comp, 1),
                    total_cost=wit,
                    conv_frac=float(np.mean(np.asarray(res.converged))),
                )

                # Per-launch kernel cost: one folded normal-equations call
                # chained x10 (the LM loop's dominant unit)
                active = tuple(
                    j for j, ix in enumerate(ps[0]) if ix >= 0
                )
                g_zero = tuple(
                    ps[0][k * 5 + 4] < 0 and float(ps[2][k * 5 + 4]) == 0.0
                    for k in range(ps[3])
                )
                from xmris_tpu.fitting.lm import (
                    _expand_params_batched,
                    internal_to_external_jax,
                )

                @jax.jit
                def kernel_once(u):
                    x, dxdu = internal_to_external_jax(
                        u, lower[None, :], upper[None, :], kind[None, :]
                    )
                    grids = _expand_params_batched(x, ps, jnp.float32)
                    return eq6_normal_equations_pallas_v9(
                        grids, re_j, im_j, t, n_peaks=ps[3], mhz=MHZ,
                        active=active, g_zero=g_zero, v_tile=128,
                        fold_slots=tuple(int(ps[0][j]) for j in active),
                        fold_scales=tuple(float(ps[1][j]) for j in active),
                        n_free=pk.n_free, dxdu=dxdu,
                    )

                c, g_, h_ = kernel_once(u0)
                float(jnp.sum(c))
                t0 = time.perf_counter()
                for _ in range(10):
                    c, g_, h_ = kernel_once(u0)
                float(jnp.sum(c) + jnp.sum(h_[0]))
                report(
                    f"r3d/kernel_once/{tag}",
                    ms_per_call=round(
                        (time.perf_counter() - t0) / 10 * 1e3, 3
                    ),
                )
            except Exception as e:  # noqa: BLE001
                report(f"r3d/fit/{tag}", error=repr(e)[:300])

    # ---- grid-scale per-voxel autophase ----------------------------------
    if "apall" in groups:
        from xmris_tpu.parallel.pipeline import PipelineConfig
        from xmris_tpu.parallel.planar_pipeline import (
            spectral_pipeline_planar_raw,
        )

        re_j = jnp.asarray(re_h)
        im_j = jnp.asarray(im_h)
        w_j = jnp.asarray(weight)
        f_j = jnp.asarray(freqs)

        for tag, cfg, K in (
            (
                "all",
                PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="all"),
                4,
            ),
            (
                "all_p0",
                PipelineConfig(
                    zero_fill_to=ZF, lb=5.0, autophase="all", p0_only=True
                ),
                4,
            ),
            (
                "single",
                PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single"),
                10,
            ),
        ):
            try:
                t0 = time.perf_counter()
                sr, si, _ = spectral_pipeline_planar_raw(
                    re_j, im_j, w_j, f_j, cfg
                )
                float(jnp.sum(sr[0]))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(K):
                    sr, si, _ = spectral_pipeline_planar_raw(
                        re_j, im_j, w_j, f_j, cfg
                    )
                float(jnp.sum(sr[0]) + jnp.sum(si[0]))
                report(
                    f"apall/pipeline/{tag}",
                    ms_per_call=round((time.perf_counter() - t0) / K * 1e3, 3),
                    compile_s=round(comp, 1),
                )
            except Exception as e:  # noqa: BLE001
                report(f"apall/pipeline/{tag}", error=repr(e)[:300])

    report("done")


if __name__ == "__main__":
    main()
