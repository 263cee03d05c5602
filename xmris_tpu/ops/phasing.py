"""Spectral phasing: manual phase application and automatic phase search.

TPU-native rebuild of ``src/xmris/processing/phasing.py``:

* ``phase``: zero/first-order correction in **degrees**, phase array
  ``p0 + p1 * (coord - pivot) / (max - min)`` applied as ``da * exp(+1j*phi)``
  with default pivot at the global maximum-magnitude coordinate and lineage
  attrs (reference ``phasing.py:10-96``).
* Scoring objectives: ACME entropy-of-derivative with negative-area penalty
  (``phasing.py:100-122``), peak-minima balance (``:125-139``), and ROI
  positivity (``:142-157``) — implemented as pure JAX kernels so the whole
  search jits and vmaps.
* ``autophase``: ``mode="single"`` optimizes on the 1-D slice containing the
  global maximum and applies the result globally (reference ``:219-290``);
  ``mode="all"`` — unimplemented in the reference — runs an independent
  XLA-compiled differential-evolution search *per voxel* in a single vmapped
  launch, the idiomatic TPU formulation.

Optimizer choices: ``optimizer="de"`` (default) uses the XLA-compiled
differential evolution in :mod:`xmris_tpu.ops.optim`; ``optimizer="scipy"``
reproduces the reference's exact ``scipy.optimize.differential_evolution``
trajectory (strategy best1bin, tol 0.01, seed 42) on a NumPy objective for
bit-level reproduction runs.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.core.array import XmrArray
from xmris_tpu.core.config import ATTRS, DIMS
from xmris_tpu.core.utils import _check_dims
from xmris_tpu.ops.fid import apodize_exp, to_fid, to_spectrum
from xmris_tpu.ops.optim import differential_evolution
from xmris_tpu.runtime.config import matching_dtypes

# ---------------------------------------------------------------------------
# Raw kernels
# ---------------------------------------------------------------------------


def phase_factor_raw(coords, p0_deg, p1_deg, pivot, x_range):
    """Complex phase factor ``exp(1j * (p0 + p1*(x-pivot)/range))`` (radians
    from degrees).  ``coords`` may be host numpy or a traced jnp array."""
    xp = jnp if isinstance(coords, jax.Array) or any(
        isinstance(v, jax.Array) for v in (p0_deg, p1_deg, pivot)
    ) else np
    p0_rad = xp.deg2rad(p0_deg)
    p1_rad = xp.deg2rad(p1_deg)
    if isinstance(x_range, (int, float)) and x_range == 0:
        phi = p0_rad
    else:
        phi = p0_rad + p1_rad * ((coords - pivot) / x_range)
    return xp.exp(1.0j * phi)


def _phased_real(data, coords, p0, p1, pivot, x_range):
    """Real part of the phased 1-D spectrum (traced)."""
    phi = jnp.deg2rad(p0) + jnp.deg2rad(p1) * ((coords - pivot) / x_range)
    return jnp.real(data) * jnp.cos(phi) - jnp.imag(data) * jnp.sin(phi)


def _phased_real_planar(re, im, coords, p0, p1, pivot, x_range):
    """Real part of the phased spectrum from split planes (traced).

    Planar formulation so the objective never materializes a complex dtype
    on device — required on the axon TPU backend (no complex execution).
    """
    phi = jnp.deg2rad(p0) + jnp.deg2rad(p1) * ((coords - pivot) / x_range)
    return re * jnp.cos(phi) - im * jnp.sin(phi)


def acme_score_raw(real_data):
    """ACME objective: entropy of |first derivative| + negative-area penalty,
    normalized by length and the maximum of the real part.

    Formula parity with reference ``phasing.py:100-122`` wherever
    ``max(real) > 0`` — i.e. every physically sensible spectrum.  The
    reference divides by the *signed* maximum, which makes the objective
    diverge to ``-inf`` as a fully-negative spectrum's maximum crosses zero;
    scipy's stochastic search rarely lands in that needle-thin basin, but the
    XLA-compiled optimizer reliably finds it.  Candidates in the degenerate
    region are therefore scored ``+inf`` (rejected); the ``optimizer="scipy"``
    path keeps the raw formula for bit-level reference reproduction.
    """
    ds1 = jnp.abs((real_data[1:] - real_data[:-1]) / 2.0)
    p1_prob = ds1 / jnp.sum(ds1)
    p1_prob = jnp.where(p1_prob == 0, 1.0, p1_prob)
    h1s = jnp.sum(-p1_prob * jnp.log(p1_prob))

    as_ = real_data - jnp.abs(real_data)
    sumas = jnp.sum(as_)
    pfun = jnp.where(sumas < 0, jnp.sum((as_ / 2.0) ** 2), 0.0)

    denom = jnp.max(real_data)
    score = (h1s + 1000.0 * pfun) / real_data.shape[-1] / denom
    return jnp.where(denom > 0, score, jnp.inf)


def peak_minima_score_raw(real_data, target_idx, index_width):
    """|min(left flank) - min(right flank)| around the target peak.

    Masked formulation (identical to slicing) so ``target_idx`` may be traced
    — required for vmapped per-voxel autophase.  Parity: ``phasing.py:125-139``.
    """
    n = real_data.shape[-1]
    idx = jnp.arange(n)
    start = jnp.maximum(0, target_idx - index_width)
    end = jnp.minimum(n, target_idx + index_width)

    big = jnp.asarray(jnp.inf, real_data.dtype)
    left_mask = (idx >= start) & (idx < target_idx)
    right_mask = (idx >= target_idx) & (idx < end)
    at_target = real_data[target_idx]

    mina = jnp.where(
        jnp.any(left_mask), jnp.min(jnp.where(left_mask, real_data, big)), at_target
    )
    minb = jnp.where(
        jnp.any(right_mask), jnp.min(jnp.where(right_mask, real_data, big)), at_target
    )
    return jnp.abs(mina - minb)


def roi_positivity_score_raw(real_data, target_idx, index_width):
    """Negative-signal penalty minus positive-signal reward within the ROI.

    Parity: ``phasing.py:142-157``.
    """
    n = real_data.shape[-1]
    idx = jnp.arange(n)
    start = jnp.maximum(0, target_idx - index_width)
    end = jnp.minimum(n, target_idx + index_width)
    roi_mask = (idx >= start) & (idx < end)

    pos_reward = jnp.sum(jnp.where(roi_mask & (real_data > 0), real_data, 0.0))
    neg_penalty = jnp.sum(jnp.where(roi_mask & (real_data < 0), -real_data, 0.0)) * 5.0
    return neg_penalty - pos_reward


_SCORES = {
    "acme": lambda data, ti, iw: acme_score_raw(data),
    "peak_minima": peak_minima_score_raw,
    "positivity": roi_positivity_score_raw,
}


# ---------------------------------------------------------------------------
# NumPy objective (scipy-trajectory reproduction + test oracle)
# ---------------------------------------------------------------------------


def _np_objective(method, data, coords, pivot, x_range, target_idx, index_width):
    def objective(ph):
        p0 = ph[0]
        p1 = ph[1] if len(ph) > 1 else 0.0
        phi = np.radians(p0) + np.radians(p1) * ((coords - pivot) / x_range)
        d = np.real(data * np.exp(1.0j * phi))
        if method == "acme":
            ds1 = np.abs((d[1:] - d[:-1]) / 2.0)
            p = ds1 / np.sum(ds1)
            p[p == 0] = 1
            h1s = np.sum(-p * np.log(p))
            as_ = d - np.abs(d)
            pfun = np.sum((as_ / 2) ** 2) if np.sum(as_) < 0 else 0.0
            return (h1s + 1000 * pfun) / d.shape[-1] / np.max(d)
        start = max(0, target_idx - index_width)
        end = min(len(d), target_idx + index_width)
        if method == "peak_minima":
            mina = np.min(d[start:target_idx]) if start < target_idx else d[target_idx]
            minb = np.min(d[target_idx:end]) if end > target_idx else d[target_idx]
            return np.abs(mina - minb)
        if method == "positivity":
            roi = d[start:end]
            return np.sum(np.abs(roi[roi < 0])) * 5.0 - np.sum(roi[roi > 0])
        raise ValueError(f"Unknown method {method!r}")

    return objective


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def phase(
    da: XmrArray,
    dim: str = DIMS.frequency,
    p0: float = 0.0,
    p1: float = 0.0,
    pivot: float | None = None,
) -> XmrArray:
    """Apply zero- and first-order phase correction (degrees) to a spectrum.

    ``p1`` is the total phase twist across the full coordinate range, anchored
    at ``pivot`` (default: the coordinate of the global maximum magnitude).
    Phase parameters are appended to ``attrs`` to preserve lineage, and a
    warning is raised when phasing in a different coordinate space than a
    previous phase operation.
    """
    _check_dims(da, dim, "phase")

    coords = da.coords[dim].values.astype(np.float64)

    if pivot is None:
        # The max-magnitude pivot search is the only consumer of the data
        # on host — with an explicit pivot (autophase always passes one,
        # as does the phase widget's snippet) no device readback happens.
        values = da.values
        flat_idx = int(np.argmax(np.abs(values)))
        dim_axis = da.get_axis_num(dim)
        target_idx = np.unravel_index(flat_idx, da.shape)[dim_axis]
        pivot = float(coords[target_idx])

    x_min = float(coords.min())
    x_max = float(coords.max())
    x_range = x_max - x_min

    factor = phase_factor_raw(coords, float(p0), float(p1), float(pivot), x_range)
    _, cplx = matching_dtypes(da.dtype)
    factor = np.asarray(factor, dtype=cplx)
    if factor.ndim == 0:
        # Zero coordinate range (single-point or constant-coord axis):
        # the p1 term vanishes and the scalar p0 factor broadcasts, as in
        # the reference (phasing.py:65-72).
        factor = np.full(coords.shape, factor, dtype=cplx)

    w = XmrArray(factor, (dim,))
    da_phased = (da * w).transpose(*da.dims)
    da_phased.name = da.name
    da_phased.attrs = da.attrs.copy()

    if ATTRS.phase_pivot_coord in da_phased.attrs:
        old_coord = da_phased.attrs[ATTRS.phase_pivot_coord]
        if old_coord != dim:
            warnings.warn(
                f"Applying phase in '{dim}', but previous phase operations "
                f"were recorded in '{old_coord}'. Ensure your pivot value "
                f"({pivot}) matches the current dimension's units."
            )

    da_phased.attrs[ATTRS.phase_p0] = p0
    da_phased.attrs[ATTRS.phase_p1] = p1
    da_phased.attrs[ATTRS.phase_pivot] = pivot
    da_phased.attrs[ATTRS.phase_pivot_coord] = dim
    return da_phased


def autophase(
    da: XmrArray,
    dim: str = DIMS.frequency,
    method: str = "acme",
    mode: str = "single",
    peak_width: float = 0.5,
    target_coord: float | None = None,
    p0_only: bool = False,
    lb: float = 0.0,
    temp_time_dim: str = DIMS.time,
    optimizer: str = "de",
    seed: int = 42,
    polish_optimizer: str = "auto",
    **kwargs,
) -> XmrArray:
    """Automatically find and apply phase correction.

    Parameters mirror the reference API; additional TPU-native controls:

    * ``optimizer="de"`` (default): XLA-compiled differential evolution with a
      vmapped population — the entire search runs on device.
    * ``optimizer="scipy"``: the reference's exact scipy differential
      evolution (best1bin, tol 0.01, seeded) on a NumPy objective, for
      bit-level reproduction of reference results.  Single mode only.
    * ``optimizer="grid"`` (either mode): deterministic candidate scan +
      polish (:func:`_grid_phase_search`).  In single mode the solve is
      sequential-latency-bound on device, and the grid search runs ~5×
      fewer sequential steps than the DE generations.
    * ``mode="all"``: per-voxel independent searches, vmapped across the
      entire grid in one launch (reference raises NotImplementedError here).
      ``optimizer="de"`` runs one DE search per voxel; ``optimizer="grid"``
      scores a deterministic candidate mesh on decimated spectra and
      polishes the per-voxel winner at full resolution — several
      times cheaper at grid scale (see :func:`_grid_phase_search`).
    * ``polish_optimizer`` (grid mode only): ``"auto"`` (default —
      the fused whole-loop Pallas polish for the ACME objective on TPU,
      exact gd score parity at ~1.7x the speed; gd elsewhere),
      ``"fused"`` (force the Pallas kernel), ``"gd"`` (backtracking
      gradient descent), ``"newton"`` (damped per-voxel Newton), or
      ``"bfgs"`` (one exact Hessian + rank-2 updates — second-order
      steps at gradient-descent per-iteration cost).

    Bounds: p0 in [-180, 180] degrees; p1 in [-4000, 4000] degrees unless
    ``p0_only`` locks p1 = 0.
    """
    _check_dims(da, dim, "autophase")
    kwargs.setdefault("disp", False)

    if mode not in ("single", "all"):
        raise ValueError("Mode must be 'single' or 'all'.")
    if method not in _SCORES:
        raise ValueError("Method must be 'acme', 'peak_minima', or 'positivity'")

    coords = da.coords[dim].values.astype(np.float64)
    x_range = float(coords.max() - coords.min())
    step_size = float(np.abs(coords[1] - coords[0]))
    index_width = max(1, int(round((peak_width / 2.0) / step_size)))

    if mode == "all":
        if optimizer not in ("de", "grid"):
            raise ValueError(
                "mode='all' supports optimizer='de' (per-voxel differential "
                "evolution) or optimizer='grid' (candidate grid + gradient "
                "polish); the scipy path is single-mode only."
            )
        return _autophase_all(
            da, dim, method, target_coord, p0_only, index_width, seed, lb,
            temp_time_dim, optimizer=optimizer,
            polish_optimizer=polish_optimizer,
        )

    # ---- mode == "single" ----
    values = da.values
    flat_idx = int(np.argmax(np.abs(values)))
    unraveled = np.unravel_index(flat_idx, da.shape)
    dim_axis = da.get_axis_num(dim)

    if target_coord is not None:
        target_idx = int(np.argmin(np.abs(coords - target_coord)))
        pivot = float(target_coord)
    else:
        target_idx = int(unraveled[dim_axis])
        pivot = float(coords[target_idx])

    slice_dict = {d: int(unraveled[i]) for i, d in enumerate(da.dims) if d != dim}
    opt_da = da.isel(slice_dict)

    if lb > 0:
        temp_fid = to_fid(opt_da, dim=dim, out_dim=temp_time_dim)
        temp_apodized = apodize_exp(temp_fid, dim=temp_time_dim, lb=lb)
        work_da = to_spectrum(temp_apodized, dim=temp_time_dim, out_dim=dim)
    else:
        work_da = opt_da

    bounds_list = [(-180.0, 180.0)] if p0_only else [(-180.0, 180.0), (-4000.0, 4000.0)]

    if optimizer == "scipy":
        import scipy.optimize

        objective = _np_objective(
            method, work_da.values, coords, pivot, x_range, target_idx, index_width
        )
        opt = scipy.optimize.differential_evolution(
            objective,
            bounds=bounds_list,
            strategy="best1bin",
            tol=0.01,
            seed=seed,
            disp=kwargs.get("disp"),
        )
        p0_opt = float(opt.x[0])
        p1_opt = float(opt.x[1]) if not p0_only else 0.0
    elif optimizer in ("de", "grid"):
        # Split planes host-side: the device graph stays real-only (the axon
        # TPU backend cannot execute complex programs).
        vals = np.asarray(work_da.values)
        real_dtype, _ = matching_dtypes(vals.dtype)
        re_j = jnp.asarray(np.ascontiguousarray(vals.real), dtype=real_dtype)
        im_j = jnp.asarray(np.ascontiguousarray(vals.imag), dtype=real_dtype)
        coords_j = jnp.asarray(coords, dtype=real_dtype)

        if optimizer == "grid":
            # Deterministic candidate scan + polish with a batch of one —
            # the same search mode="all" uses; far fewer sequential device
            # steps than the DE generations on this latency-bound solve.
            xs = _grid_phase_search(
                re_j[None, :], im_j[None, :], coords_j, x_range,
                jnp.asarray([pivot], real_dtype),
                jnp.asarray([target_idx], jnp.int32),
                index_width, method, p0_only, cand_chunk=16,
                polish_optimizer=polish_optimizer,
            )
            x = np.asarray(xs[0])
        else:
            score = _SCORES[method]

            def objective(ph):
                p0 = ph[0]
                p1 = ph[1] if not p0_only else jnp.asarray(0.0, ph.dtype)
                d = _phased_real_planar(
                    re_j, im_j, coords_j, p0, p1, pivot, x_range
                )
                return score(d, target_idx, index_width)

            result = differential_evolution(
                objective,
                jnp.asarray(bounds_list),
                seed=seed,
                tol=0.01,
                polish_iters=60,
            )
            x = np.asarray(result.x)
        p0_opt = float(x[0])
        p1_opt = float(x[1]) if not p0_only else 0.0
    else:
        raise ValueError("optimizer must be 'de', 'grid', or 'scipy'.")

    return phase(da, dim=dim, p0=p0_opt, p1=p1_opt, pivot=pivot)


def _grid_phase_search(
    rows_re,
    rows_im,
    coords_j,
    x_range: float,
    pivots,
    t_idx,
    index_width: int,
    method: str,
    p0_only: bool,
    n_p0: int = 36,
    n_p1: int = 41,
    grid_decimate: int | None = None,
    polish_iters: int = 40,
    cand_chunk: int = 4,
    polish_optimizer: str = "auto",
    newton_iters: int | None = None,
):
    """Per-voxel phase search: coarse candidate scan + gradient polish.

    A deterministic, TPU-friendly alternative to the per-voxel DE of
    ``_autophase_all``: shared candidate values are scored for ALL voxels
    in batched evaluations (sequential ``lax.scan`` over candidate chunks
    — no cross-candidate data dependence, so each step is a single fused
    elementwise+reduction kernel), then the per-voxel winner is refined
    by a vectorized backtracking gradient descent with per-voxel step
    sizes.  For ``p0 + p1`` the scan is a coordinate descent (marginal
    p0, p1 given p0, one p0 refinement) rather than a full 2-D mesh —
    see the inline rationale.  ``p0`` is periodic (wrapped into
    [-180, 180)); ``p1`` is clipped to [-4000, 4000].

    The grid stage scores a ``grid_decimate``-strided copy of the spectra
    (default for ACME: stride chosen so ~512 points survive; the ROI
    methods default to full resolution) — candidate RANKING is stable
    under decimation while the cost drops by the stride; the polish runs
    at full resolution, so the final optimum is evaluated on the exact
    objective.

    Unlike the stochastic DE (whose vmapped ``while_loop`` runs lockstep
    until the LAST voxel's population converges), the cost here is static:
    ``n_p0`` (p0-only) or ``n_p0 + n_p1 + 7`` (p0 + p1) decimated
    evaluations plus ``polish_iters`` full ones.
    """
    if polish_optimizer == "auto":
        # Measured on the v5e (results/tpu_r19.jsonl appolish): the fused
        # whole-loop Pallas polish at exact gd score parity runs p0p1
        # 120.8 vs 211 ms and p0-only 72 vs 128 ms at 16384x2048 —
        # default for the ACME objective on TPU at GRID scale.  The
        # single-pivot search (1 row) keeps gd: its polish is ~2 ms of a
        # 22 ms fused flagship program, and swapping a Mosaic kernel into
        # that proven program for a ~1 ms delta is pure compile risk.
        polish_optimizer = (
            "fused"
            if method == "acme"
            and jax.default_backend() == "tpu"
            and rows_re.shape[0] > 1
            else "gd"
        )
    score = _SCORES[method]
    dtype = rows_re.dtype
    v = rows_re.shape[0]
    n_f = rows_re.shape[1]
    if grid_decimate is None:
        # ACME's entropy ranking is stable under decimation; the ROI
        # methods (peak_minima / positivity) score a window of
        # ``index_width`` bins around ``t_idx`` — striding would shift the
        # window by up to ``stride-1`` bins and can collapse it to nothing,
        # turning the candidate ranking into noise, so they scan at full
        # resolution.
        grid_decimate = max(1, n_f // 512) if method == "acme" else 1

    rows_re_d = rows_re[:, ::grid_decimate]
    rows_im_d = rows_im[:, ::grid_decimate]
    coords_d = coords_j[::grid_decimate]
    t_idx_d = t_idx // grid_decimate
    iw_d = max(1, index_width // grid_decimate)

    def scan_axis(values, p0_base, p1_base, axis):
        """Scan scalar candidate offsets along one parameter axis.

        Evaluates ``p0 = p0_base + c`` (axis 0) or ``p1 = p1_base + c``
        (axis 1) for every candidate ``c`` in ``values``, holding the
        other axis at its per-voxel base — shared by the marginal-p0,
        p1-given-p0, and p0-refinement stages.  Candidates are chunked so
        each ``lax.scan`` step scores ``cand_chunk`` of them in one fused
        batch (amortizes per-step loop overhead at small decimated
        widths).  Returns the per-voxel winning absolute value.
        """
        n_c = values.shape[0]
        pad = (-n_c) % cand_chunk
        if pad:
            values = jnp.concatenate([values, jnp.tile(values[-1:], (pad,))])
        chunks = values.reshape(-1, cand_chunk)

        def eval_c(cval):
            p0v = p0_base + cval if axis == 0 else p0_base
            p1v = p1_base + cval if axis == 1 else p1_base

            def one(p0_, p1_, row_re, row_im, pivot, ti_):
                d = _phased_real_planar(
                    row_re, row_im, coords_d, p0_, p1_, pivot, x_range
                )
                return score(d, ti_, iw_d)

            return jax.vmap(one)(
                jnp.broadcast_to(p0v, (v,)), jnp.broadcast_to(p1v, (v,)),
                rows_re_d, rows_im_d, pivots, t_idx_d,
            )

        def body(carry, chunk):  # chunk: (C,)
            best_e, best_v = carry
            e = jax.vmap(eval_c)(chunk)  # (C, v)
            i = jnp.argmin(e, axis=0)
            e_min = jnp.take_along_axis(e, i[None, :], axis=0)[0]
            base = p0_base if axis == 0 else p1_base
            v_min = base + chunk[i]
            better = e_min < best_e
            return (
                jnp.where(better, e_min, best_e),
                jnp.where(better, v_min, best_v),
            ), None

        init = (jnp.full((v,), jnp.inf, dtype), jnp.zeros((v,), dtype))
        (_, best_v), _ = jax.lax.scan(body, init, chunks)
        return best_v

    zero_v = jnp.zeros((v,), dtype)
    p0_c = jnp.linspace(-180.0, 180.0, n_p0, endpoint=False, dtype=dtype)
    if p0_only:
        best_p0 = scan_axis(p0_c, zero_v, zero_v, 0)
        best_p = jnp.stack([best_p0, zero_v], axis=1)
    else:
        # Coordinate-descent staging instead of the full n_p0*n_p1 mesh
        # (~4x fewer evaluations): the pivot sits at each voxel's dominant
        # peak, where the p1 ramp vanishes — so the marginal-p0 scan (p1 =
        # 0) already ranks p0 by the dominant peak's phase; p1 then scans
        # against that per-voxel p0, and one p0 refinement pass absorbs
        # the p0/p1 cross-talk before the joint polish.  Achieved-score
        # parity vs the per-voxel DE is measured on-chip
        # (results/tpu_r5.jsonl apgrid/agree).
        p0_a = scan_axis(p0_c, zero_v, zero_v, 0)
        p1_c = jnp.linspace(-4000.0, 4000.0, n_p1, dtype=dtype)
        p1_b = scan_axis(p1_c, p0_a, zero_v, 1)
        step = 360.0 / n_p0
        dp0 = jnp.linspace(
            -1.5 * step, 1.5 * step, 7, dtype=dtype
        )
        p0_r = scan_axis(dp0, p0_a, p1_b, 0)
        best_p = jnp.stack([p0_r, p1_b], axis=1)

    # ---- two-phase vectorized polish ----
    # Unit-space scaling so one learning rate serves both parameters.
    # Most iterations run on the decimated spectra (the landscape's shape
    # is preserved under striding for ACME; ROI methods have stride 1);
    # the final phase runs at full resolution so the returned optimum is
    # evaluated on the exact objective.
    span = jnp.asarray([360.0, 8000.0], dtype)

    def wrap_params(p):
        p0 = jnp.mod(p[:, 0] + 180.0, 360.0) - 180.0
        p1 = jnp.clip(p[:, 1], -4000.0, 4000.0)
        return jnp.stack([p0, p1], axis=1)

    def polish(best_p, re_, im_, crd, ti, iw, iters):
        vg_obj = jax.vmap(
            jax.value_and_grad(
                lambda pv, row_re, row_im, pivot, ti_: (
                    lambda p1: score(
                        _phased_real_planar(
                            row_re, row_im, crd, pv[0], p1, pivot, x_range
                        ),
                        ti_,
                        iw,
                    )
                )(jnp.asarray(0.0, dtype) if p0_only else pv[1])
            )
        )

        # One value_and_grad per iteration at the trial point, carrying the
        # accepted point's gradient — the EXACT same trajectory as the
        # grad-at-current + value-at-trial form (a rejected trial leaves
        # the current point, whose gradient is the carried one) at half
        # the objective passes over the (voxels, points) planes.
        def polish_body(_, carry):
            p, f, g_raw, lr = carry
            # Guard non-finite gradients (inf-scored degenerate
            # candidates): a zero step simply halves the rate and retries.
            g = jnp.where(jnp.isfinite(g_raw), g_raw, 0.0) * span[None, :]
            p_new = wrap_params(p - (lr[:, None] * g) * span[None, :])
            f_new, g_new = vg_obj(p_new, re_, im_, pivots, ti)
            better = f_new < f
            return (
                jnp.where(better[:, None], p_new, p),
                jnp.where(better, f_new, f),
                jnp.where(better[:, None], g_new, g_raw),
                jnp.where(better, lr * 1.2, lr * 0.5),
            )

        f0, g0_raw = vg_obj(best_p, re_, im_, pivots, ti)
        # Normalize the initial per-voxel rate so the FIRST trial step
        # spans about half a mesh cell (the winner is within half a cell
        # of the true basin): a fixed rate would burn ~20 growth
        # iterations warming up on flat objectives before making progress.
        g0 = jnp.where(jnp.isfinite(g0_raw), g0_raw, 0.0) * span[None, :]
        half_cell = 0.5 / max(n_p0, 2)  # unit-space half mesh spacing
        gmax = jnp.max(jnp.abs(g0), axis=1)
        lr0 = half_cell / jnp.maximum(gmax, jnp.finfo(dtype).tiny)
        lr0 = jnp.where(gmax > 0, lr0, 1e-2)
        best_p, _, _, _ = jax.lax.fori_loop(
            0, iters, polish_body, (best_p, f0, g0_raw, lr0)
        )
        return best_p

    def polish_second_order(best_p, re_, im_, crd, ti, iw, iters, mode):
        """Second-order polish on the exact objective (Levenberg-damped).

        The polish is HBM-bandwidth-bound in passes over the
        (voxels, points) planes, so the figure of merit is objective-pass
        count, not iteration count.  Two modes:

        * ``"newton"``: the exact 1x1/2x2 Hessian every iteration (one
          forward-over-reverse AD pass, ~2x a gradient) + a trial
          evaluation.  Quadratic convergence from within half a mesh cell.
        * ``"bfgs"``: the exact Hessian ONCE at the seed, then rank-2
          BFGS updates from the gradient pairs the trial evaluations
          already produce — each iteration costs one ``value_and_grad``
          (same passes as one backtracking-GD iteration) but takes a
          curvature-aware step.

        All algebra is per-voxel closed form (damped 2x2 solve); rejected
        trials raise the per-voxel damping until the step degenerates into
        a small, well-scaled gradient step, so indefinite curvature (the
        ROI scores are piecewise linear) can never ascend.
        """
        n_par = 1 if p0_only else 2
        sp = span[:n_par]
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        eye = jnp.eye(n_par, dtype=dtype)

        def one_obj(u, row_re, row_im, pivot, ti_):
            p0_ = u[0] * sp[0]
            p1_ = jnp.asarray(0.0, dtype) if p0_only else u[1] * sp[1]
            d = _phased_real_planar(row_re, row_im, crd, p0_, p1_, pivot, x_range)
            return score(d, ti_, iw)

        obj_b = jax.vmap(one_obj)
        vg_b = jax.vmap(jax.value_and_grad(one_obj))
        hess_b = jax.vmap(jax.jacfwd(jax.grad(one_obj)))

        def clip_u(u):
            # p0 is periodic (wrap so reported phases stay in [-180, 180));
            # p1 keeps the DE search box.
            p0u = (jnp.mod(u[:, 0] * sp[0] + 180.0, 360.0) - 180.0) / sp[0]
            if p0_only:
                return p0u[:, None]
            p1u = jnp.clip(u[:, 1], -4000.0 / sp[1], 4000.0 / sp[1])
            return jnp.stack([p0u, p1u], axis=1)

        def sanitize_h(h):
            bad = ~jnp.all(jnp.isfinite(h), axis=(1, 2))
            return jnp.where(bad[:, None, None], eye[None], h)

        def damped_step(g, h, lam):
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            # Marquardt scaling: damp with the diagonal's magnitude so a
            # large lam yields a small gradient step in unit space.
            dmag = jnp.maximum(
                jnp.abs(jnp.diagonal(h, axis1=1, axis2=2)), 1e-6
            )
            hd = h + lam[:, None, None] * (dmag[:, :, None] * eye[None])
            if n_par == 1:
                return -g / hd[:, :, 0]
            a = hd[:, 0, 0]
            b = hd[:, 0, 1]
            c = hd[:, 1, 0]
            e = hd[:, 1, 1]
            det = a * e - b * c
            safe = jnp.abs(det) > tiny
            det = jnp.where(safe, det, 1.0)
            s = jnp.stack(
                [
                    -(e * g[:, 0] - b * g[:, 1]) / det,
                    -(a * g[:, 1] - c * g[:, 0]) / det,
                ],
                axis=1,
            )
            return jnp.where(safe[:, None], s, 0.0)

        u0 = clip_u(best_p[:, :n_par] / sp[None, :])
        lam0 = jnp.full((v,), jnp.asarray(1e-2, dtype))

        if mode == "newton":

            def body(_, carry):
                u, f, lam = carry
                h = sanitize_h(hess_b(u, re_, im_, pivots, ti))
                g = jax.vmap(jax.grad(one_obj))(u, re_, im_, pivots, ti)
                u_new = clip_u(u + damped_step(g, h, lam))
                f_new = obj_b(u_new, re_, im_, pivots, ti)
                better = f_new < f
                return (
                    jnp.where(better[:, None], u_new, u),
                    jnp.where(better, f_new, f),
                    jnp.where(better, lam * 0.33, lam * 4.0),
                )

            f0 = obj_b(u0, re_, im_, pivots, ti)
            u_fin, _, _ = jax.lax.fori_loop(0, iters, body, (u0, f0, lam0))
        else:  # bfgs

            def body(_, carry):
                u, f, g, bmat, lam = carry
                u_new = clip_u(u + damped_step(g, bmat, lam))
                f_new, g_new = vg_b(u_new, re_, im_, pivots, ti)
                ok = jnp.isfinite(f_new) & (f_new < f)
                s_vec = u_new - u
                y = g_new - g
                sy = jnp.sum(s_vec * y, axis=1)
                bs = jnp.einsum("vij,vj->vi", bmat, s_vec)
                sbs = jnp.sum(s_vec * bs, axis=1)
                upd = (
                    ok
                    & (sy > 1e-12)
                    & (sbs > 1e-12)
                    & jnp.all(jnp.isfinite(y), axis=1)
                )
                sy_s = jnp.where(upd, sy, 1.0)
                sbs_s = jnp.where(upd, sbs, 1.0)
                b_new = (
                    bmat
                    + y[:, :, None] * y[:, None, :] / sy_s[:, None, None]
                    - bs[:, :, None] * bs[:, None, :] / sbs_s[:, None, None]
                )
                return (
                    jnp.where(ok[:, None], u_new, u),
                    jnp.where(ok, f_new, f),
                    jnp.where(ok[:, None], g_new, g),
                    jnp.where(upd[:, None, None], b_new, bmat),
                    jnp.where(ok, lam * 0.33, lam * 4.0),
                )

            f0, g0 = vg_b(u0, re_, im_, pivots, ti)
            g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
            b0 = sanitize_h(hess_b(u0, re_, im_, pivots, ti))
            u_fin, _, _, _, _ = jax.lax.fori_loop(
                0, iters, body, (u0, f0, g0, b0, lam0)
            )
        p0f = jnp.mod(u_fin[:, 0] * sp[0] + 180.0, 360.0) - 180.0
        p1f = jnp.zeros_like(p0f) if p0_only else u_fin[:, 1] * sp[1]
        return jnp.stack([p0f, p1f], axis=1)

    if polish_optimizer == "fused":
        # Whole-loop Pallas polish: the spectrum rows stay VMEM-resident
        # across every gradient iteration (one HBM read total) instead of
        # ~2*polish_iters full-plane passes — the ACME analytic gradient
        # and the exact gd step rule live in ops/kernels/acme_pallas.py.
        if method != "acme":
            raise ValueError(
                "polish_optimizer='fused' implements the ACME objective "
                "only; use 'gd'/'newton'/'bfgs' for the ROI methods."
            )
        from xmris_tpu.ops.kernels.acme_pallas import acme_polish_pallas

        interpret = jax.default_backend() != "tpu"
        half_cell = 0.5 / max(n_p0, 2)
        if p0_only and grid_decimate > 1:
            fine_iters = max(polish_iters // 3, 8)
            best_p, _ = acme_polish_pallas(
                rows_re_d, rows_im_d, coords_d, pivots, best_p, x_range,
                n_iter=polish_iters - fine_iters, p0_only=True,
                half_cell=half_cell, interpret=interpret,
            )
        else:
            fine_iters = polish_iters
        best_p, _ = acme_polish_pallas(
            rows_re, rows_im, coords_j, pivots, best_p, x_range,
            n_iter=fine_iters, p0_only=p0_only, half_cell=half_cell,
            interpret=interpret,
        )
        return best_p

    if polish_optimizer in ("newton", "bfgs"):
        # Few superlinearly-converging iterations from within half a mesh
        # cell: runs entirely on the exact objective (no decimated phase).
        # Defaults measured on the 24-voxel CPU oracle: newton-18 and
        # bfgs-28 both dominate gd-40 voxel-for-voxel.
        if newton_iters is None:
            newton_iters = 18 if polish_optimizer == "newton" else 28
        return polish_second_order(
            best_p, rows_re, rows_im, coords_j, t_idx, index_width,
            newton_iters, polish_optimizer,
        )
    if polish_optimizer != "gd":
        raise ValueError(
            f"polish_optimizer must be 'gd', 'newton', 'bfgs', or "
            f"'fused', got "
            f"{polish_optimizer!r}."
        )

    # Two-phase polish is QUALITY-NEUTRAL only for the 1-D p0 search
    # (measured 99.99 % of voxels at-or-below the DE score,
    # results/tpu_r5.jsonl).  For p0 + p1 the decimated phase walks to a
    # decimated optimum whose (p0, p1) basin measurably disagrees — the
    # stride coarsens the derivative entropy along p1 — and the local
    # full-res phase cannot recover (~25 % of voxels landed slightly
    # above the DE score regardless of the split), so the 2-D search
    # polishes entirely on the exact objective.
    if p0_only and grid_decimate > 1:
        fine_iters = max(polish_iters // 3, 8)
        best_p = polish(
            best_p, rows_re_d, rows_im_d, coords_d, t_idx_d, iw_d,
            polish_iters - fine_iters,
        )
    else:
        fine_iters = polish_iters
    best_p = polish(
        best_p, rows_re, rows_im, coords_j, t_idx, index_width, fine_iters
    )
    return best_p


def _autophase_all(
    da: XmrArray,
    dim: str,
    method: str,
    target_coord: float | None,
    p0_only: bool,
    index_width: int,
    seed: int,
    lb: float,
    temp_time_dim: str,
    optimizer: str = "de",
    polish_optimizer: str = "auto",
) -> XmrArray:
    """Per-voxel autophase: one DE search per 1-D spectrum, vmapped.

    The reference declares this unimplemented (``phasing.py:219-222``); on TPU
    it is the natural formulation — every voxel's population evaluates in the
    same XLA launch.
    """
    if lb > 0:
        work = to_spectrum(
            apodize_exp(to_fid(da, dim=dim, out_dim=temp_time_dim), dim=temp_time_dim, lb=lb),
            dim=temp_time_dim,
            out_dim=dim,
        )
    else:
        work = da

    dim_axis = da.get_axis_num(dim)
    coords = np.asarray(da.coords[dim].values, dtype=np.float64)
    x_range = float(coords.max() - coords.min())

    # Flatten to (n_voxels, n_points), split planes host-side: the device
    # graph stays real-only (the axon TPU backend cannot execute complex
    # programs; dispatch is async so failures would surface late).
    order = [d for d in da.dims if d != dim] + [dim]
    work_t = work.transpose(*order)
    n_points = da.sizes[dim]
    rows_np = np.asarray(work_t.values).reshape(-1, n_points)
    n_voxels = rows_np.shape[0]

    real_dtype, _ = matching_dtypes(rows_np.dtype)
    rows_re = jnp.asarray(np.ascontiguousarray(rows_np.real), dtype=real_dtype)
    rows_im = jnp.asarray(np.ascontiguousarray(rows_np.imag), dtype=real_dtype)
    coords_j = jnp.asarray(coords, dtype=real_dtype)

    if target_coord is not None:
        pivots = jnp.full((n_voxels,), float(target_coord), dtype=real_dtype)
        t_idx = jnp.full((n_voxels,), int(np.argmin(np.abs(coords - target_coord))))
    else:
        t_idx = jnp.argmax(rows_re**2 + rows_im**2, axis=1)
        pivots = coords_j[t_idx]

    if optimizer == "grid":

        @jax.jit
        def solve_grid(rows_re, rows_im, pivots, t_idx):
            return _grid_phase_search(
                rows_re, rows_im, coords_j, x_range, pivots, t_idx,
                index_width, method, p0_only,
                polish_optimizer=polish_optimizer,
            )

        solutions = solve_grid(rows_re, rows_im, pivots, t_idx)
    else:
        bounds = (
            jnp.asarray([(-180.0, 180.0)])
            if p0_only
            else jnp.asarray([(-180.0, 180.0), (-4000.0, 4000.0)])
        )
        score = _SCORES[method]
        keys = jax.random.split(jax.random.PRNGKey(seed), n_voxels)

        @jax.jit
        def solve_all(rows_re, rows_im, pivots, t_idx, keys):
            def solve_one(row_re, row_im, pivot, ti, key):
                def objective(ph):
                    p0 = ph[0]
                    p1 = ph[1] if not p0_only else jnp.asarray(0.0, ph.dtype)
                    d = _phased_real_planar(
                        row_re, row_im, coords_j, p0, p1, pivot, x_range
                    )
                    return score(d, ti, index_width)

                res = differential_evolution(
                    objective, bounds, seed=key, tol=0.01, polish_iters=60
                )
                return res.x

            return jax.vmap(solve_one)(rows_re, rows_im, pivots, t_idx, keys)

        solutions = solve_all(rows_re, rows_im, pivots, t_idx, keys)
    p0s = solutions[:, 0]
    p1s = jnp.zeros_like(p0s) if p0_only else solutions[:, 1]

    # Apply per-voxel phase to the *original* data (not the lb-smoothed copy):
    # planar rotation on device, complex combine on the host.  With lb == 0
    # the search input IS the original data — reuse its staged planes
    # instead of re-transposing and re-uploading the whole grid.
    if work is da:
        orig_re, orig_im = rows_re, rows_im
    else:
        orig_np = np.asarray(da.transpose(*order).values).reshape(-1, n_points)
        orig_re = jnp.asarray(
            np.ascontiguousarray(orig_np.real), dtype=real_dtype
        )
        orig_im = jnp.asarray(
            np.ascontiguousarray(orig_np.imag), dtype=real_dtype
        )

    @jax.jit
    def apply_all(orig_re, orig_im, p0s, p1s, pivots):
        phi = jnp.deg2rad(p0s)[:, None] + jnp.deg2rad(p1s)[:, None] * (
            (coords_j[None, :] - pivots[:, None]) / x_range
        )
        c, s = jnp.cos(phi), jnp.sin(phi)
        return orig_re * c - orig_im * s, orig_re * s + orig_im * c

    out_re, out_im = apply_all(orig_re, orig_im, p0s, p1s, pivots)
    _, cplx = matching_dtypes(rows_np.dtype if work is da else orig_np.dtype)
    phased = np.asarray(out_re).astype(cplx)
    phased += 1j * np.asarray(out_im)

    # Restore the original layout.
    voxel_shape = tuple(da.sizes[d] for d in order[:-1])
    phased_nd = phased.reshape(voxel_shape + (n_points,))
    out_t = da.transpose(*order).copy(data=phased_nd)
    out = out_t.transpose(*da.dims)
    out.attrs = da.attrs.copy()
    out.attrs[ATTRS.phase_p0] = np.asarray(p0s).reshape(voxel_shape)
    out.attrs[ATTRS.phase_p1] = np.asarray(p1s).reshape(voxel_shape)
    out.attrs[ATTRS.phase_pivot] = np.asarray(pivots).reshape(voxel_shape)
    out.attrs[ATTRS.phase_pivot_coord] = dim
    return out
