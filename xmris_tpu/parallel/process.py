"""Fused end-to-end MRSI grid program: spectra + phases + fit + CRLB in ONE
device dispatch.

The reference runs its pipeline as separate host-driven stages — numpy FFT
chain (``/root/reference/src/xmris/processing/fourier.py:117-173``), then a
joblib pool of per-voxel AMARES fits (``src/xmris/fitting/amares.py:118-204``).
Here the whole per-grid workload — window/zero-fill/ortho-DFT/fftshift, the
in-graph ACME autophase, the per-voxel linear LS seeding, the batched
bounded LM, and the CRLBs — compiles into a single XLA program, so a
production stream pays exactly one dispatch (and, through a remote relay,
one ~4.5 ms launch floor) per incoming grid instead of one per stage.

Everything is planar float32 (no complex dtype on device; see CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from xmris_tpu.fitting.amares import seeded_fit_grid_raw
from xmris_tpu.parallel.mesh import GRID_AXIS
from xmris_tpu.parallel.pipeline import PipelineConfig
from xmris_tpu.parallel.planar_pipeline import (
    _apply_phase_planar,
    _solve_phase_on_row,
    spectral_pipeline_planar_raw,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "pmap_static", "mhz", "amp_slots", "ls_plan", "max_iter",
        "lam0", "kernel_version", "v_tile", "interpret", "plateau_streak",
        "uniform_t_ok", "engine", "spd_pallas",
    ),
)
def process_grid_planar_raw(
    fids_re,
    fids_im,
    weight,
    freqs,
    t,
    x_template,
    lower,
    upper,
    kind,
    *,
    cfg: PipelineConfig,
    pmap_static,
    mhz: float,
    amp_slots: tuple,
    ls_plan: tuple,
    max_iter: int = 24,
    lam0: float = 1e-3,
    kernel_version: int = 9,
    v_tile: int | None = None,
    interpret: bool = False,
    plateau_streak: int = 3,
    uniform_t_ok: bool = False,
    engine: str = "pallas",
    spd_pallas: bool = True,
):
    """One compiled program per grid: spectral pipeline + seeded fit + CRLB.

    Inputs are the planar (B, n_time) FID planes plus the spectral-stage
    constants (``weight``, ``freqs``) and the fit-stage prior data (time
    axis ``t`` — the first ``n_time`` points of the spectral axis —
    template optimum ``x_template``, bound arrays, and the static seeding
    plan from :func:`xmris_tpu.fitting.amares.seed_plan`).

    Returns ``(spec_re, spec_im, (p0, p1, pivot), x_free, cost, converged,
    crlb_sds)``.  The spectral stage and the fit both consume the raw FIDs,
    so neither waits on the other's results; XLA schedules them inside one
    program with no host round-trip in between.
    """
    spec_re, spec_im, phases = spectral_pipeline_planar_raw(
        fids_re, fids_im, weight, freqs, cfg
    )
    x_free, cost, converged, sds = seeded_fit_grid_raw(
        fids_re, fids_im, t, x_template, lower, upper, kind,
        pmap_static=pmap_static, mhz=mhz, amp_slots=amp_slots,
        ls_plan=ls_plan, max_iter=max_iter, lam0=lam0,
        kernel_version=kernel_version, v_tile=v_tile, interpret=interpret,
        plateau_streak=plateau_streak, uniform_t_ok=uniform_t_ok,
        engine=engine, spd_pallas=spd_pallas,
    )
    return spec_re, spec_im, phases, x_free, cost, converged, sds


def pinned_grid_program(device=None, **static_kwargs):
    """jit of :func:`process_grid_planar_raw` with row-major result spectra.

    XLA's auto entry-layout assignment prefers the voxel-minor transposed
    layout for the returned spectral planes (it is physically denser when
    the spectral lane dim is < 128) and inserts a full-tensor copy per
    plane to reach it — ~0.3 ms/grid more device time than the tiling
    padding it saves (r11 HLO audit, ``scripts/hlo_attrib.py``).  Entry
    layouts can only be set at the jit boundary (in-graph
    ``with_layout_constraint`` does not override the entry choice —
    measured: the copy just moves to the root), hence this wrapper: the
    two spectra outputs are pinned row-major, everything else stays
    auto.  Off-TPU it degrades to the plain jitted program.

    ``static_kwargs`` are the keyword arguments of
    :func:`process_grid_planar_raw` (``cfg``, ``pmap_static``, ``mhz``,
    seeding plans, LM knobs); positional arrays flow through unchanged.
    """

    def run(fids_re, fids_im, weight, freqs, t, x_template, lower, upper,
            kind):
        return process_grid_planar_raw(
            fids_re, fids_im, weight, freqs, t, x_template, lower, upper,
            kind, **static_kwargs,
        )

    if jax.default_backend() != "tpu":
        return jax.jit(run)
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = device if device is not None else jax.devices()[0]
    cfg = static_kwargs["cfg"]
    nd = 3 if getattr(cfg, "spec_layout", "flat") == "stacked" else 2
    fmt = Format(
        Layout(major_to_minor=tuple(range(nd))), SingleDeviceSharding(dev)
    )
    out_fmts = (fmt, fmt, (None, None, None), None, None, None, None)
    return jax.jit(run, out_shardings=out_fmts)


def _autophase_single_collective(spec_re, spec_im, freqs, cfg, axis_name):
    """Grid-global single-pivot autophase across voxel shards.

    Each shard reduces its block to one candidate (its loudest spectrum row
    + peak bin); one ``all_gather`` of those n_dev candidates elects the
    grid-global pivot, and every shard then runs the SAME deterministic
    phase solve (DE or grid scan, per ``cfg.ap_optimizer``) on the winning
    row (replicated compute — far cheaper than shipping the phases
    around).  The election preserves the unsharded ``jnp.argmax``
    tie-breaking (first occurrence in voxel-major order), so the result
    matches the single-device program.

    Accepts flat ``(B, n_freq)`` spectra or the stacked ``(B, n2, n1)``
    Pallas block layout: both linearize voxel-major with the flat
    frequency as the intra-voxel order (stacked flat k = k1 + n1*k2 IS the
    C-order index k2*n1 + k1), so the argmax decomposition is
    layout-agnostic; only the candidate row and the phase ramp need a
    (cheap, single-row / single-ramp) reshape.
    """
    stacked = spec_re.ndim == 3
    n_freq = freqs.shape[0]
    mag2 = spec_re * spec_re + spec_im * spec_im
    flat_idx = jnp.argmax(mag2)
    local_max = jnp.reshape(mag2, (-1,))[flat_idx]
    voxel_idx = flat_idx // n_freq
    freq_idx = flat_idx % n_freq
    row_re = jax.lax.dynamic_index_in_dim(
        spec_re, voxel_idx, axis=0, keepdims=False
    )
    row_im = jax.lax.dynamic_index_in_dim(
        spec_im, voxel_idx, axis=0, keepdims=False
    )
    if stacked:
        row_re = row_re.reshape(n_freq)
        row_im = row_im.reshape(n_freq)

    maxs = jax.lax.all_gather(local_max, axis_name)          # (n_dev,)
    rows_re = jax.lax.all_gather(row_re, axis_name)          # (n_dev, n_freq)
    rows_im = jax.lax.all_gather(row_im, axis_name)
    freq_idxs = jax.lax.all_gather(freq_idx, axis_name)
    winner = jnp.argmax(maxs)  # first max wins, like the flat argmax

    g_row_re = rows_re[winner]
    g_row_im = rows_im[winner]
    pivot = freqs[freq_idxs[winner]]

    p0, p1 = _solve_phase_on_row(g_row_re, g_row_im, freqs, pivot, cfg)

    x_range = freqs[-1] - freqs[0]
    phi = (
        jnp.deg2rad(p0) + jnp.deg2rad(p1) * ((freqs - pivot) / x_range)
    ).astype(spec_re.dtype)
    if stacked:
        phi = phi.reshape(spec_re.shape[-2:])[None]
    else:
        phi = phi[None, :]
    spec_re, spec_im = _apply_phase_planar(
        spec_re, spec_im, phi, barrier=cfg.phase_barrier
    )
    return spec_re, spec_im, (p0, p1, pivot)


def process_grid_sharded(
    fids_re,
    fids_im,
    weight,
    freqs,
    t,
    x_template,
    lower,
    upper,
    kind,
    *,
    mesh: Mesh,
    axis_name: str = GRID_AXIS,
    cfg: PipelineConfig,
    pmap_static,
    mhz: float,
    amp_slots: tuple,
    ls_plan: tuple,
    max_iter: int = 24,
    lam0: float = 1e-3,
    kernel_version: int = 9,
    v_tile: int | None = None,
    interpret: bool = False,
    plateau_streak: int = 3,
    uniform_t_ok: bool = False,
    engine: str = "pallas",
    spd_pallas: bool = True,
):
    """The flagship fused per-grid program over a multi-chip voxel mesh.

    Same contract as :func:`process_grid_planar_raw`, executed under
    ``shard_map`` with the voxel axis split across ``mesh``:

    * spectral transform, LS seeding, LM fit, CRLB — all per-voxel or
      replicated-template work, so each chip runs them on its shard with
      zero communication (the Pallas kernels launch per-shard, which is
      how they partition at all);
    * the ONLY collective is the single-mode autophase pivot election —
      one ``all_gather`` of n_dev candidate rows, after which every chip
      runs the identical deterministic phase solve
      (:func:`_autophase_single_collective`; DE or grid scan per
      ``cfg.ap_optimizer``).

    Both spectral layouts shard: ``spec_layout="stacked"`` keeps the
    kernel-native per-shard (B/n_dev, n2, n1) blocks end-to-end (the
    election handles either layout).  Parity with the single-device
    program is exact up to per-voxel float reassociation (asserted in
    ``tests/test_parallel.py``).
    """
    n_dev = mesh.shape[axis_name]
    b = fids_re.shape[0]
    if b % n_dev:
        raise ValueError(
            f"Voxel batch ({b}) must divide by the mesh axis ({n_dev}); "
            "pad with pad_to_multiple first."
        )
    if cfg.autophase == "single":
        # The pivot election is the collective; run the stage pipeline
        # unphased and phase inside the body.
        stage_cfg = dataclasses.replace(cfg, autophase="none")
    else:
        stage_cfg = cfg  # "all"/"none": per-voxel or no work — shards freely

    fit_kwargs = dict(
        pmap_static=pmap_static, mhz=mhz, amp_slots=amp_slots,
        ls_plan=ls_plan, max_iter=max_iter, lam0=lam0,
        kernel_version=kernel_version, v_tile=v_tile, interpret=interpret,
        plateau_streak=plateau_streak, uniform_t_ok=uniform_t_ok,
        engine=engine, spd_pallas=spd_pallas,
    )

    def body(re, im, weight, freqs, t, x_template, lower, upper, kind):
        spec_re, spec_im, phases = spectral_pipeline_planar_raw(
            re, im, weight, freqs, stage_cfg
        )
        if cfg.autophase == "single":
            spec_re, spec_im, phases = _autophase_single_collective(
                spec_re, spec_im, freqs, cfg, axis_name
            )
        x_free, cost, converged, sds = seeded_fit_grid_raw(
            re, im, t, x_template, lower, upper, kind, **fit_kwargs
        )
        return spec_re, spec_im, phases, x_free, cost, converged, sds

    sh = P(axis_name)
    rep = P()
    phase_spec = (sh, sh, sh) if cfg.autophase == "all" else (rep, rep, rep)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh, sh, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(sh, sh, phase_spec, sh, sh, sh, sh),
        check_vma=False,
    )
    return fn(
        fids_re, fids_im, weight, freqs, t, x_template, lower, upper, kind
    )
