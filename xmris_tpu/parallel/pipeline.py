"""Fused batched MRSI spectral pipeline: the framework's hot path.

The reference processes MRSI grids by chaining per-op xarray calls —
``da.xmr.zero_fill(...).xmr.apodize_exp(...).xmr.to_spectrum().xmr.autophase()``
— each materializing a full N-D array in host memory.  Here the entire chain
compiles to ONE XLA program over a ``(n_voxels, n_time)`` batch:

    pad -> apodization multiply -> ortho FFT -> fftshift -> autophase -> phase

XLA fuses the pad/window/shift elementwise work around the batched FFT, and
the batch axis shards over a device mesh (:mod:`xmris_tpu.parallel.mesh`) so
grids larger than one chip's HBM scale across ICI with zero code change.  The
only cross-voxel communication in the whole pipeline is single-mode
autophase's global argmax — exactly the "final gather" structure of the
reference's process pool, expressed as an XLA collective.

The labeled front-end (:func:`mrsi_pipeline`) takes/returns
:class:`~xmris_tpu.core.array.XmrArray` with the same coordinate and lineage
semantics as the op-by-op chain.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.core.array import XmrArray
from xmris_tpu.core.config import ATTRS, DIMS
from xmris_tpu.core.utils import _check_dims, as_coord
from xmris_tpu.core.config import COORDS
from xmris_tpu.ops.optim import differential_evolution
from xmris_tpu.ops.phasing import _phased_real, acme_score_raw
from xmris_tpu.parallel.mesh import make_mesh, shard_voxels
from xmris_tpu.runtime.config import matching_dtypes


@dataclass(frozen=True)
class PipelineConfig:
    """Static configuration of the fused spectral pipeline (hashable: it is
    part of the jit cache key)."""

    zero_fill_to: int = 2048
    lb: float = 5.0
    gb: float = 0.0  # 0 => pure exponential apodization; >0 => Lorentz-to-Gauss
    autophase: str = "single"  # "single" | "all" | "none"
    p0_only: bool = False
    de_popsize: int = 15
    de_maxiter: int = 200
    de_seed: int = 42
    # Phase-search strategy for autophase "all" AND "single": "de" (one
    # differential evolution per voxel / on the pivot row) or "grid"
    # (shared candidate mesh scored on decimated spectra + vectorized
    # polish — several times cheaper at grid scale, and far fewer
    # sequential steps for the latency-bound single-row solve; see
    # ops.phasing._grid_phase_search).
    ap_optimizer: str = "de"
    # Polish stage for ap_optimizer="grid": "gd" (backtracking gradient
    # descent), "newton" (damped per-voxel Newton), or "bfgs" (one exact
    # Hessian + rank-2 updates; fewest full-resolution objective passes —
    # see ops.phasing._grid_phase_search).
    ap_polish: str = "auto"
    # Planar-engine DFT formulation (None -> ops.kernels.dft.DEFAULT_VARIANT);
    # see dft_planar for the menu.  Only the planar pipeline consumes this.
    dft_variant: str | None = None
    # Matmul precision for the planar DFT stages (None -> the module default,
    # HIGHEST).  "high" = 3-pass bf16: the Cooley-Tukey stages contract only
    # 32-64 elements so the dropped lo*lo term stays ~1e-7 relative (unlike
    # the dense rect matmul, where K=2048 pushed it to 8.6e-6); "default"
    # (one bf16 pass, ~1.3e-3) is for throughput experiments only.
    dft_precision: str | None = None
    # Spectral output layout (planar Pallas path only).  "flat" returns
    # (B, n_out) spectra; "stacked" keeps the kernel's native
    # (B, n2, n1) block layout (flat k = k1 + n1*k2 — a C-order reshape of
    # the last two dims, free on host) and skips the XLA lane-merge
    # relayout the flat return pays.  Requires the pallas DFT variant and
    # autophase in ("single", "none").
    spec_layout: str = "flat"
    # Single-mode phase application: materialize the per-frequency
    # cos/sin vectors (jax.lax.optimization_barrier) instead of letting
    # XLA recompute them per element inside the (B, n_freq) rotation
    # fusion — two transcendentals per spectrum point across the grid
    # where ~2·n_freq evaluations suffice.  A/B knob for the r13 TPU
    # session; numerically identity.
    phase_barrier: bool = False

    def __post_init__(self):
        if self.autophase not in ("single", "all", "none"):
            raise ValueError(
                f"autophase must be 'single', 'all', or 'none', got "
                f"{self.autophase!r}."
            )
        if self.ap_optimizer not in ("de", "grid"):
            raise ValueError(
                f"ap_optimizer must be 'de' or 'grid', got "
                f"{self.ap_optimizer!r}."
            )
        if self.ap_polish not in ("auto", "gd", "newton", "bfgs", "fused"):
            raise ValueError(
                f"ap_polish must be 'auto', 'gd', 'newton', 'bfgs', "
                f"or 'fused', got "
                f"{self.ap_polish!r}."
            )
        if self.spec_layout not in ("flat", "stacked"):
            raise ValueError(
                f"spec_layout must be 'flat' or 'stacked', got "
                f"{self.spec_layout!r}."
            )
        if self.spec_layout == "stacked" and self.autophase == "all":
            raise ValueError(
                "spec_layout='stacked' supports autophase 'single'/'none' "
                "only (per-voxel autophase needs flat spectra)."
            )


def _apodization_weight(t: np.ndarray, lb: float, gb: float) -> np.ndarray:
    """Host-computed apodization window (formulas of ops.fid)."""
    if gb and gb != 0.0:
        t_g = (2.0 * np.sqrt(np.log(2.0))) / (np.pi * gb)
        return np.exp(np.pi * lb * t) * np.exp(-(t**2) / t_g**2)
    return np.exp(-np.pi * lb * t)


def _autophase_single_raw(spec, freqs, cfg: PipelineConfig):
    """In-jit single-mode ACME autophase: optimize on the global-max row,
    apply the result to every voxel."""
    mag = jnp.abs(spec)
    flat_idx = jnp.argmax(mag)
    n_freq = spec.shape[-1]
    voxel_idx = flat_idx // n_freq
    freq_idx = flat_idx % n_freq
    pivot = freqs[freq_idx]
    x_range = freqs[-1] - freqs[0]

    row = jax.lax.dynamic_index_in_dim(spec, voxel_idx, axis=0, keepdims=False)

    def objective(ph):
        p0 = ph[0]
        p1 = ph[1] if not cfg.p0_only else jnp.asarray(0.0, ph.dtype)
        d = _phased_real(row, freqs, p0, p1, pivot, x_range)
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

    real_dtype, _ = matching_dtypes(spec.dtype)
    phi = (jnp.deg2rad(p0) + jnp.deg2rad(p1) * ((freqs - pivot) / x_range)).astype(
        real_dtype
    )
    factor = jnp.cos(phi) + 1j * jnp.sin(phi)
    return spec * factor[None, :], p0, p1, pivot


def _autophase_all_raw(spec, freqs, cfg: PipelineConfig):
    """In-jit per-voxel ACME autophase, vmapped over the batch."""
    x_range = freqs[-1] - freqs[0]
    n_voxels = spec.shape[0]
    t_idx = jnp.argmax(jnp.abs(spec), axis=1)
    pivots = freqs[t_idx]

    if cfg.ap_optimizer == "grid":
        from xmris_tpu.ops.phasing import _grid_phase_search

        xs = _grid_phase_search(
            jnp.real(spec), jnp.imag(spec), freqs, x_range, pivots, t_idx,
            1, "acme", cfg.p0_only, polish_optimizer=cfg.ap_polish,
        )
    else:
        keys = jax.random.split(jax.random.PRNGKey(cfg.de_seed), n_voxels)

        bounds = (
            jnp.asarray([(-180.0, 180.0)])
            if cfg.p0_only
            else jnp.asarray([(-180.0, 180.0), (-4000.0, 4000.0)])
        )

        def solve_one(row, pivot, key):
            def objective(ph):
                p0 = ph[0]
                p1 = ph[1] if not cfg.p0_only else jnp.asarray(0.0, ph.dtype)
                return acme_score_raw(
                    _phased_real(row, freqs, p0, p1, pivot, x_range)
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

        xs = jax.vmap(solve_one)(spec, pivots, keys)
    p0s = xs[:, 0]
    p1s = xs[:, 1] if not cfg.p0_only else jnp.zeros_like(p0s)

    real_dtype, _ = matching_dtypes(spec.dtype)
    phi = (
        jnp.deg2rad(p0s)[:, None]
        + jnp.deg2rad(p1s)[:, None] * ((freqs[None, :] - pivots[:, None]) / x_range)
    ).astype(real_dtype)
    factor = jnp.cos(phi) + 1j * jnp.sin(phi)
    return spec * factor, p0s, p1s, pivots


@functools.partial(jax.jit, static_argnames=("cfg",))
def spectral_pipeline_raw(fids, weight, freqs, cfg: PipelineConfig):
    """The fused pipeline on a ``(n_voxels, n_time)`` complex batch.

    Parameters
    ----------
    fids : (B, n_time) complex
        Batched time-domain FIDs (sharded over the leading axis for
        multi-chip runs).
    weight : (zero_fill_to,) real
        Precomputed apodization window on the zero-filled time axis.
    freqs : (zero_fill_to,) real
        Centered (fftshifted) frequency coordinates.
    cfg : PipelineConfig
        Static pipeline configuration.

    Returns
    -------
    (spectrum, (p0, p1, pivot)) — phased centered spectra plus the applied
    phase parameters (arrays for ``autophase="all"``, scalars for "single",
    zeros for "none").
    """
    b, n_time = fids.shape
    real_dtype, complex_dtype = matching_dtypes(fids.dtype)

    # 1. Zero-fill (static target => single compiled shape)
    if cfg.zero_fill_to > n_time:
        fids = jnp.pad(fids, ((0, 0), (0, cfg.zero_fill_to - n_time)))

    # 2. Apodize (broadcast multiply; fused by XLA into the FFT prologue)
    fids = fids * weight[None, :].astype(real_dtype)

    # 3. Ortho FFT + fftshift along the spectral axis
    spec = jnp.fft.fft(fids, axis=-1, norm="ortho")
    spec = jnp.roll(spec, cfg.zero_fill_to // 2, axis=-1).astype(complex_dtype)

    # 4. Autophase
    if cfg.autophase == "single":
        spec, p0, p1, pivot = _autophase_single_raw(spec, freqs, cfg)
    elif cfg.autophase == "all":
        spec, p0, p1, pivot = _autophase_all_raw(spec, freqs, cfg)
    else:
        zero = jnp.zeros((), real_dtype)
        p0 = p1 = pivot = zero
    return spec, (p0, p1, pivot)


def mrsi_pipeline(
    da: XmrArray,
    dim: str = DIMS.time,
    cfg: PipelineConfig = PipelineConfig(),
    mesh=None,
    out_dim: str = DIMS.frequency,
    engine: str = "auto",
) -> XmrArray:
    """Labeled front-end: run the fused pipeline over every voxel of ``da``.

    Equivalent (to numerical parity) to the op-by-op chain
    ``zero_fill -> apodize -> to_spectrum -> autophase`` but compiled as one
    XLA program.  When ``mesh`` is given (or more than one device exists) the
    voxel batch is sharded over it.

    ``engine``: ``"complex"`` (native complex dtypes), ``"planar"`` (split
    real/imag planes, FFT as MXU matmuls — the TPU path), or ``"auto"``
    (planar on TPU, complex elsewhere).
    """
    _check_dims(da, dim, "mrsi_pipeline")

    if engine == "auto":
        engine = "planar" if jax.default_backend() == "tpu" else "complex"

    order = [d for d in da.dims if d != dim] + [dim]
    da_t = da.transpose(*order)
    n_time = da.sizes[dim]
    voxel_shape = tuple(da_t.shape[:-1])

    # Host-side staging: the planar engine needs the complex->planes split to
    # happen before anything touches the device (complex dtypes never reach
    # an accelerator on the planar path).
    rows_host = np.asarray(da_t.values).reshape(-1, n_time)
    real_dtype, complex_dtype = matching_dtypes(rows_host.dtype)
    n_rows = rows_host.shape[0]

    # Host-side coordinate math (identical to ops.fid/ops.fourier)
    t = da.coords[dim].values.astype(np.float64)
    dt = float(t[1] - t[0]) if len(t) > 1 else 1.0
    n_out = max(cfg.zero_fill_to, n_time)
    t_full = t[0] + np.arange(n_out) * dt
    weight = _apodization_weight(t_full, cfg.lb, cfg.gb)
    freqs = np.fft.fftshift(np.fft.fftfreq(n_out, d=dt))

    weight_j = jnp.asarray(weight, dtype=real_dtype)
    freqs_j = jnp.asarray(freqs, dtype=real_dtype)

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    pad_rows = 0
    if mesh is not None:
        n_dev = mesh.devices.size
        pad_rows = (-n_rows) % n_dev
        if pad_rows:
            # Zero rows are inert through the linear pipeline; sliced off below.
            rows_host = np.pad(rows_host, ((0, pad_rows), (0, 0)))

    def place(arr):
        arr = jnp.asarray(arr)
        return shard_voxels(arr, mesh) if mesh is not None else arr

    cfg = PipelineConfig(**{**cfg.__dict__, "zero_fill_to": n_out})
    if engine == "planar":
        from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw

        re = place(np.ascontiguousarray(rows_host.real).astype(real_dtype))
        im = place(np.ascontiguousarray(rows_host.imag).astype(real_dtype))
        sr, si, (p0, p1, pivot) = spectral_pipeline_planar_raw(
            re, im, weight_j, freqs_j, cfg
        )
        # Combine planes on host: complex may be unsupported on this backend.
        spec = np.asarray(sr).astype(complex_dtype)
        spec += 1j * np.asarray(si).astype(complex_dtype)
    else:
        rows = place(rows_host.astype(complex_dtype))
        spec, (p0, p1, pivot) = spectral_pipeline_raw(rows, weight_j, freqs_j, cfg)

    if pad_rows:
        spec = spec[:n_rows]
        if cfg.autophase == "all":
            p0, p1, pivot = p0[:n_rows], p1[:n_rows], pivot[:n_rows]
    out_data = spec.reshape(voxel_shape + (n_out,))
    out = XmrArray(
        out_data,
        dims=tuple(order[:-1]) + (out_dim,),
        attrs=da.attrs,
        name=da.name,
    )
    out.coords = {
        k: c.copy() for k, c in da.coords.items() if c.dim != dim
    }
    out = out.assign_coords({out_dim: as_coord(COORDS.frequency, out_dim, freqs)})
    out = out.transpose(*[d if d != dim else out_dim for d in da.dims])

    # Lineage: mirror the op-by-op chain's attrs
    if cfg.zero_fill_to > n_time:
        out.attrs[ATTRS.zero_fill_target] = cfg.zero_fill_to
        out.attrs[ATTRS.zero_fill_position] = "end"
    out.attrs[ATTRS.apodization_lb] = cfg.lb
    if cfg.gb:
        out.attrs[ATTRS.apodization_gb] = cfg.gb
    if cfg.autophase != "none":
        to_host = (
            lambda v: np.asarray(v).reshape(voxel_shape) if np.ndim(v) else float(v)
        )
        out.attrs[ATTRS.phase_p0] = to_host(p0)
        out.attrs[ATTRS.phase_p1] = to_host(p1)
        out.attrs[ATTRS.phase_pivot] = to_host(pivot)
        out.attrs[ATTRS.phase_pivot_coord] = out_dim
    return out
