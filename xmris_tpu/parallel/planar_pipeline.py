"""Planar (split real/imag) variant of the fused MRSI spectral pipeline.

Numerically identical to :func:`xmris_tpu.parallel.pipeline.spectral_pipeline_raw`
but with no complex dtype anywhere on device: the FFT runs as MXU matmuls
(:mod:`xmris_tpu.ops.kernels.dft`), apodization/phase factors are real
cos/sin pairs, and the in-graph ACME differential-evolution autophase
operates on the real plane directly.  This is the default TPU execution path:
it keeps the transform on the systolic array and avoids backends with
incomplete complex lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from xmris_tpu.ops.kernels.dft import dft_planar
from xmris_tpu.ops.optim import differential_evolution
from xmris_tpu.ops.phasing import _phased_real_planar, acme_score_raw
from xmris_tpu.parallel.pipeline import PipelineConfig


def _apply_phase_planar(re, im, phi, barrier: bool = False):
    c, s = jnp.cos(phi), jnp.sin(phi)
    if barrier:
        # Force the per-frequency cos/sin vectors to materialize instead
        # of letting XLA duplicate them INTO the (B, n_freq) elementwise
        # fusion: fusions recompute cheap producers per output element,
        # which would evaluate two transcendentals per spectrum point
        # across the whole grid (~134 M evals at bench scale) where ~2k
        # suffice.  The barrier costs two tiny (n_freq,) buffers.
        c, s = jax.lax.optimization_barrier((c, s))
    return re * c - im * s, re * s + im * c


def _solve_phase_on_row(row_re, row_im, freqs, pivot, cfg: PipelineConfig):
    """ACME (p0, p1) solve on one pivot spectrum row.

    ``cfg.ap_optimizer`` selects the search: ``"de"`` (default) runs the
    in-graph differential evolution; ``"grid"`` runs the deterministic
    candidate scan + polish of :func:`xmris_tpu.ops.phasing._grid_phase_search`
    with a batch of one — far fewer *sequential* device steps (the
    single-row solve is latency-bound, not throughput-bound), same ACME
    objective.  Both are deterministic in their inputs, so replicated
    callers (every shard of the sharded fused program) all land on the
    same phases with zero extra communication.
    """
    x_range = freqs[-1] - freqs[0]

    if cfg.ap_optimizer == "grid":
        from xmris_tpu.ops.phasing import _grid_phase_search

        # t_idx feeds only the ROI scores; the pipeline objective is ACME.
        xs = _grid_phase_search(
            row_re[None, :], row_im[None, :], freqs, x_range,
            pivot[None], jnp.zeros((1,), jnp.int32), 1, "acme",
            cfg.p0_only, cand_chunk=16,
            polish_optimizer=cfg.ap_polish,
        )
        p0 = xs[0, 0]
        p1 = xs[0, 1] if not cfg.p0_only else jnp.asarray(0.0, xs.dtype)
        return p0, p1

    def objective(ph):
        p0 = ph[0]
        p1 = ph[1] if not cfg.p0_only else jnp.asarray(0.0, ph.dtype)
        d = _phased_real_planar(row_re, row_im, freqs, p0, p1, pivot, x_range)
        return acme_score_raw(d)

    bounds = (
        jnp.asarray([(-180.0, 180.0)])
        if cfg.p0_only
        else jnp.asarray([(-180.0, 180.0), (-4000.0, 4000.0)])
    )
    result = differential_evolution(
        objective,
        bounds,
        seed=cfg.de_seed,
        popsize=cfg.de_popsize,
        maxiter=cfg.de_maxiter,
        tol=0.01,
        polish_iters=60,
    )
    p0 = result.x[0]
    p1 = result.x[1] if not cfg.p0_only else jnp.asarray(0.0, result.x.dtype)
    return p0, p1


def _autophase_single_planar(re, im, freqs, cfg: PipelineConfig, peak=None):
    """Accepts flat ``(B, n_freq)`` spectra or the stacked ``(B, n2, n1)``
    Pallas block layout (flat frequency k = k1 + n1*k2, so a C-order
    reshape of a voxel's trailing dims IS its flat spectrum)."""
    stacked = re.ndim == 3
    n_freq = freqs.shape[0]
    if peak is None:
        mag2 = re * re + im * im
        flat_idx = jnp.argmax(mag2)
        # Both layouts linearize voxel-major with the flat frequency as
        # the intra-voxel order, so the decomposition is layout-agnostic.
        voxel_idx = flat_idx // n_freq
        freq_idx = flat_idx % n_freq
    else:
        # Pivot search already done while the spectrum was VMEM-resident
        # (spectrum_pallas with_maxmag) — only the B-long voxel reduction
        # remains, so the full-grid magnitude pass over HBM never runs.
        voxel_idx, freq_idx = peak
    pivot = freqs[freq_idx]
    x_range = freqs[-1] - freqs[0]

    row_re = jax.lax.dynamic_index_in_dim(re, voxel_idx, axis=0, keepdims=False)
    row_im = jax.lax.dynamic_index_in_dim(im, voxel_idx, axis=0, keepdims=False)
    if stacked:
        # One voxel's (n2, n1) block -> flat row; tiny, so the relayout
        # the full-grid flat return would pay never touches the batch.
        row_re = row_re.reshape(n_freq)
        row_im = row_im.reshape(n_freq)

    p0, p1 = _solve_phase_on_row(row_re, row_im, freqs, pivot, cfg)

    phi = (jnp.deg2rad(p0) + jnp.deg2rad(p1) * ((freqs - pivot) / x_range)).astype(
        re.dtype
    )
    if stacked:
        phi = phi.reshape(re.shape[-2:])[None]
    else:
        phi = phi[None, :]
    re, im = _apply_phase_planar(re, im, phi, barrier=cfg.phase_barrier)
    return re, im, p0, p1, pivot


def _autophase_all_planar(re, im, freqs, cfg: PipelineConfig):
    """In-jit per-voxel ACME autophase, vmapped over the planar batch."""
    x_range = freqs[-1] - freqs[0]
    n_voxels = re.shape[0]
    t_idx = jnp.argmax(re * re + im * im, axis=1)
    pivots = freqs[t_idx]

    if cfg.ap_optimizer == "grid":
        from xmris_tpu.ops.phasing import _grid_phase_search

        xs = _grid_phase_search(
            re, im, freqs, x_range, pivots, t_idx, 1, "acme", cfg.p0_only,
            polish_optimizer=cfg.ap_polish,
        )
    else:
        keys = jax.random.split(jax.random.PRNGKey(cfg.de_seed), n_voxels)

        bounds = (
            jnp.asarray([(-180.0, 180.0)])
            if cfg.p0_only
            else jnp.asarray([(-180.0, 180.0), (-4000.0, 4000.0)])
        )

        def solve_one(row_re, row_im, pivot, key):
            def objective(ph):
                p0 = ph[0]
                p1 = ph[1] if not cfg.p0_only else jnp.asarray(0.0, ph.dtype)
                return acme_score_raw(
                    _phased_real_planar(
                        row_re, row_im, freqs, p0, p1, pivot, x_range
                    )
                )

            res = differential_evolution(
                objective,
                bounds,
                seed=key,
                popsize=cfg.de_popsize,
                maxiter=cfg.de_maxiter,
                tol=0.01,
                polish_iters=60,
            )
            return res.x

        xs = jax.vmap(solve_one)(re, im, pivots, keys)
    p0s = xs[:, 0]
    p1s = xs[:, 1] if not cfg.p0_only else jnp.zeros_like(p0s)

    phi = (
        jnp.deg2rad(p0s)[:, None]
        + jnp.deg2rad(p1s)[:, None] * ((freqs[None, :] - pivots[:, None]) / x_range)
    ).astype(re.dtype)
    re, im = _apply_phase_planar(re, im, phi)
    return re, im, p0s, p1s, pivots


@functools.partial(jax.jit, static_argnames=("cfg",))
def spectral_pipeline_planar_raw(fids_re, fids_im, weight, freqs, cfg: PipelineConfig):
    """Fused pipeline on planar (B, n_time) float batches.

    Same contract as ``spectral_pipeline_raw`` but inputs/outputs are
    (real, imag) pairs; returns ``(spec_re, spec_im, (p0, p1, pivot))``.

    With ``cfg.spec_layout == "stacked"`` (pallas variant only) the spectra
    come back in the kernel's native ``(B, n2, n1)`` block layout — flat
    frequency ``k = k1 + n1*k2``, i.e. a C-order reshape of the trailing
    dims recovers the flat spectrum (free on host) — skipping the XLA
    lane-merge relayout of the flat return.
    """
    b, n_time = fids_re.shape

    precision = {
        None: None,
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[cfg.dft_precision]

    variant = cfg.dft_variant
    if (
        variant is None
        and cfg.dft_precision is None
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
    ):
        # On a single TPU chip the fused Pallas kernel beats the einsum
        # formulation by ~25% (8.5 vs 11.1 ms chained at bench scale —
        # in-kernel window + relayout skip two full HBM passes) whenever
        # the shapes divide its Cooley-Tukey split.  Multi-chip keeps the
        # einsum path: GSPMD partitions it over the voxel axis, while
        # pl.pallas_call has no partitioning rule (an explicit
        # dft_variant="pallas" remains available under shard_map).  The
        # kernel hardcodes HIGHEST precision, so a dft_precision request
        # also disables the auto-upgrade.
        from xmris_tpu.ops.kernels.dft_pallas import pallas_split_ok

        if pallas_split_ok(n_time, cfg.zero_fill_to):
            variant = "pallas"

    stacked = cfg.spec_layout == "stacked"
    if stacked and variant != "pallas":
        raise ValueError(
            "spec_layout='stacked' requires the pallas DFT variant "
            f"(resolved variant: {variant!r}; shapes must satisfy "
            "pallas_split_ok and the backend must select/force it)."
        )

    peak = None
    if variant == "pallas":
        # Window + zero-fill + ortho DFT + fftshift in ONE Pallas kernel
        # with the transform VMEM-resident per voxel tile (the XLA
        # formulations round-trip every Cooley-Tukey stage through HBM).
        # For single-mode autophase the per-voxel peak search also runs
        # in-kernel (with_maxmag), leaving only a B-long voxel argmax.
        from xmris_tpu.ops.kernels.dft_pallas import spectrum_pallas

        want_peak = cfg.autophase == "single"
        out = spectrum_pallas(
            fids_re, fids_im, cfg.zero_fill_to,
            window=weight[:n_time].astype(fids_re.dtype),
            interpret=jax.default_backend() not in ("tpu",),
            with_maxmag=want_peak,
            stacked_out=stacked,
        )
        if want_peak:
            spec_re, spec_im, mv, mi = out
            voxel_idx = jnp.argmax(mv)
            peak = (voxel_idx, mi[voxel_idx])
        else:
            spec_re, spec_im = out
    elif variant == "fused":
        # Zero-fill + ortho DFT + fftshift as ONE matmul against a constant
        # rectangular block-complex matrix; the window multiply below is the
        # only elementwise prologue and XLA fuses it into the matmul.
        from xmris_tpu.ops.kernels.dft import dft_rect_shifted_planar

        w = weight[:n_time][None, :].astype(fids_re.dtype)
        spec_re, spec_im = dft_rect_shifted_planar(
            fids_re * w, fids_im * w, cfg.zero_fill_to, precision=precision
        )
    else:
        if cfg.zero_fill_to > n_time:
            pad = ((0, 0), (0, cfg.zero_fill_to - n_time))
            fids_re = jnp.pad(fids_re, pad)
            fids_im = jnp.pad(fids_im, pad)

        w = weight[None, :].astype(fids_re.dtype)
        fids_re = fids_re * w
        fids_im = fids_im * w

        spec_re, spec_im = dft_planar(
            fids_re, fids_im, cfg.zero_fill_to, ortho=True,
            variant=variant, precision=precision,
        )
        shift = cfg.zero_fill_to // 2
        spec_re = jnp.roll(spec_re, shift, axis=-1)
        spec_im = jnp.roll(spec_im, shift, axis=-1)

    if cfg.autophase == "single":
        spec_re, spec_im, p0, p1, pivot = _autophase_single_planar(
            spec_re, spec_im, freqs, cfg, peak=peak
        )
    elif cfg.autophase == "all":
        spec_re, spec_im, p0, p1, pivot = _autophase_all_planar(
            spec_re, spec_im, freqs, cfg
        )
    else:
        zero = jnp.zeros((), fids_re.dtype)
        p0 = p1 = pivot = zero
    return spec_re, spec_im, (p0, p1, pivot)
