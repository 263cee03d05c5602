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

import functools

import jax
import jax.numpy as jnp

from xmris_tpu.fitting.amares import seeded_fit_grid_raw
from xmris_tpu.parallel.pipeline import PipelineConfig
from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "pmap_static", "mhz", "amp_slots", "ls_plan", "max_iter",
        "lam0", "kernel_version", "v_tile", "interpret", "plateau_streak",
        "uniform_t_ok", "engine",
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
        engine=engine,
    )
    return spec_re, spec_im, phases, x_free, cost, converged, sds
