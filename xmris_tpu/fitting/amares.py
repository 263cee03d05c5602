"""AMARES prior-knowledge batch fitting: every voxel in one XLA launch.

TPU-native rebuild of the reference's ``fit_amares``
(``src/xmris/fitting/amares.py:207-488``) with the same API and output
contract, but none of its process machinery: where the reference pickles one
voxel per joblib/loky task into pyAMARES+lmfit (``amares.py:118-204``), this
implementation flattens the grid once and runs a **batched bounded
Levenberg-Marquardt** (:mod:`xmris_tpu.fitting.lm`) over the closed-form Eq.6
model — every voxel iterates in the same compiled program, normal equations
on the MXU, one program for the whole MRSI grid.

Behavioral parity:
* parameter inference (``MHz`` attr, sw from coords, deadtime from t[0]) —
  ``amares.py:269-281``
* highest-SNR template auto-selection message — ``amares.py:295-312``
  (here the "template" seeds every voxel's initial values)
* failure semantics: voxels whose fit fails keep zeros in the parameter
  arrays (``amares.py:369-373``); a ``fit_converged`` variable additionally
  exposes per-voxel convergence, the batched analog of the NaN-DataFrame
  worker guard (``amares.py:91-115``)
* output dataset: ``raw_data``/``fit_data``/``residuals`` over the original
  dims and ``amplitude``/``chem_shift``/``linewidth``/``phase``/``crlb``/
  ``snr`` over original dims x ``Metabolite`` — ``amares.py:387-472``
"""

from __future__ import annotations

import functools
import time
import typing
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu import __version__ as _xmt_version
from xmris_tpu.core.array import Coord, XmrArray, XmrDataset
from xmris_tpu.fitting.lm import (
    crlb_batched,
    external_to_internal,
    hashable_pmap,
)
from xmris_tpu.fitting.prior import PriorKnowledge, load_prior_knowledge


def select_template_fid(fid_arrs: np.ndarray, announce: bool = True) -> int:
    """Index of the highest-SNR FID (reference ``amares.py:295-312``).

    Signal = mean |first 10 points|, noise = std of the last fifth.
    """
    n_time = fid_arrs.shape[-1]
    signal_region = np.mean(np.abs(fid_arrs[:, 0:10]), axis=1)
    noise_pts = max(10, n_time // 5)
    noise_region = np.std(fid_arrs[:, -noise_pts:], axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        snr_array = np.where(noise_region == 0, 0, signal_region / noise_region)
    best_idx = int(np.nanargmax(snr_array))
    if announce:
        print(
            f"Auto-selected FID index {best_idx} for initialization "
            f"(SNR: {snr_array[best_idx]:.2f})"
        )
    return best_idx


def _ls_amp_phase_for_grid(y_re, y_im, grid, t, mhz):
    """Shared-basis linear LS of complex amplitudes against a (K, 5) grid.

    Returns ``(a_r, a_i, cost)`` with the coefficient planes shaped (K, B)
    and the per-voxel optimal residual cost ``||y||^2 - Re(N^H a)`` (B,).
    """
    from xmris_tpu.fitting.lm import eq6_basis_planar

    _, _, b_re, b_im = eq6_basis_planar(t, grid, mhz)  # (n_t, K)
    # G = B^H B (K, K) complex, shared across voxels
    g_r = b_re.T @ b_re + b_im.T @ b_im
    g_i = b_re.T @ b_im - b_im.T @ b_re
    # N = B^H y per voxel: (K, B)
    n_r = b_re.T @ y_re.T + b_im.T @ y_im.T
    n_i = b_re.T @ y_im.T - b_im.T @ y_re.T
    k = g_r.shape[0]
    ridge = 1e-8 * jnp.trace(g_r) / k
    g_r = g_r + ridge * jnp.eye(k, dtype=g_r.dtype)
    # complex solve as the real 2K x 2K block system
    top = jnp.concatenate([g_r, -g_i], axis=1)
    bot = jnp.concatenate([g_i, g_r], axis=1)
    block = jnp.concatenate([top, bot], axis=0)
    rhs = jnp.concatenate([n_r, n_i], axis=0)  # (2K, B)
    sol = jnp.linalg.solve(block, rhs)
    a_r, a_i = sol[:k], sol[k:]
    yy = jnp.sum(y_re * y_re + y_im * y_im, axis=1)  # (B,)
    cost = yy - jnp.sum(sol * rhs, axis=0)
    return a_r, a_i, cost


@functools.partial(jax.jit, static_argnames=("pmap_static", "mhz"))
def _linear_seed_solve(y_re, y_im, x_t, t, pmap_static, mhz):
    """Jitted core of :func:`_linear_amp_phase_seed` (module level so the
    jit cache persists across calls — a closure-local jit would retrace
    and remote-compile on every ``fit_amares`` invocation)."""
    from xmris_tpu.fitting.lm import _pmap_jax, expand_params

    pmap = _pmap_jax(pmap_static, y_re.dtype)
    grid = expand_params(x_t, pmap)
    grid = grid.at[:, 0].set(1.0).at[:, 3].set(0.0)  # unit amp, 0 phase
    a_r, a_i, _ = _ls_amp_phase_for_grid(y_re, y_im, grid, t, mhz)
    amp = jnp.sqrt(a_r * a_r + a_i * a_i)
    phase = jnp.arctan2(a_i, a_r) * (180.0 / jnp.pi)
    return amp.T, phase.T  # (B, K)


@functools.partial(
    jax.jit, static_argnames=("pmap_static", "mhz", "g_values")
)
def _linear_seed_scan_g(y_re, y_im, x_t, t, pmap_static, mhz, g_values):
    """Per-voxel lineshape-mixing seed: LS amplitudes/phases at the
    template's cs/lw for each static candidate ``g`` in ``g_values``, then
    the per-voxel argmin-cost winner.

    Free-g priors (reference Eq.6 with the Gaussian fraction fitted,
    ``/root/reference/src/xmris/fitting/simulation.py`` Eq.6) converge
    slowly from a shared template g — each candidate costs one shared
    (2K, 2K) solve plus per-voxel projections, and the winning candidate
    seeds both g and the matching amplitudes/phases.  Peaks whose g is
    FIXED by the prior keep their template value in every candidate basis.

    Returns ``(amp, phase_deg, g_best, best_cost)`` with shapes
    (B, K), (B, K), (B,), (B,).
    """
    from xmris_tpu.fitting.lm import _pmap_jax, expand_params

    pmap = _pmap_jax(pmap_static, y_re.dtype)
    base = expand_params(x_t, pmap)
    base = base.at[:, 0].set(1.0).at[:, 3].set(0.0)
    idx = pmap_static[0]
    n_peaks = pmap_static[3]
    free_g = jnp.asarray(
        [idx[k * 5 + 4] >= 0 for k in range(n_peaks)], bool
    )

    sols = []
    for g_cand in g_values:
        grid = base.at[:, 4].set(
            jnp.where(free_g, jnp.asarray(g_cand, base.dtype), base[:, 4])
        )
        sols.append(_ls_amp_phase_for_grid(y_re, y_im, grid, t, mhz))
    costs = jnp.stack([c for _, _, c in sols], axis=0)  # (C, B)
    best = jnp.argmin(costs, axis=0)  # (B,)
    a_r = jnp.stack([a for a, _, _ in sols], axis=0)  # (C, K, B)
    a_i = jnp.stack([a for _, a, _ in sols], axis=0)
    onehot = jax.nn.one_hot(best, len(g_values), dtype=a_r.dtype)  # (B, C)
    a_r_b = jnp.einsum("ckb,bc->bk", a_r, onehot)
    a_i_b = jnp.einsum("ckb,bc->bk", a_i, onehot)
    amp = jnp.sqrt(a_r_b * a_r_b + a_i_b * a_i_b)
    phase = jnp.arctan2(a_i_b, a_r_b) * (180.0 / jnp.pi)
    g_best = jnp.take(jnp.asarray(g_values, base.dtype), best)
    best_cost = jnp.min(costs, axis=0)
    return amp, phase, g_best, best_cost


@jax.jit
def _split_interleaved(buf):
    """(B, n, 2) interleaved buffer -> ((B, n) re, (B, n) im) on device."""
    return buf[..., 0], buf[..., 1]


class StagedFids(typing.NamedTuple):
    """Pre-uploaded planar FID planes plus the layout they were staged in.

    ``re``/``im`` sit at indices 0/1 so existing ``planes[0]``/``planes[1]``
    consumers keep working; ``dims``/``shape`` record the time-last
    transposed layout of the source array so :func:`fit_amares` can reject
    planes staged with a different ``dim`` even when the flattened
    ``(n_spectra, n_time)`` shapes coincide (e.g. a square grid staged
    along the wrong axis would otherwise fit transposed data silently).
    """

    re: jax.Array
    im: jax.Array
    dims: tuple = ()
    shape: tuple = ()


def _device_fid_planes(fid_arrs: np.ndarray):
    """Upload the grid's FID planes with ONE device transfer.

    complex64 grids ship as the zero-copy interleaved float32 view of the
    complex buffer — no host-side deinterleave copies, one ``device_put``
    instead of two — and split into (re, im) planes in a single tiny
    device program.  Other dtypes fall back to host plane copies (which
    also preserve float64 planes under x64).  Measured on the remote-TPU
    relay the upload dominates the whole seed stage (~0.3-0.9 s of host
    deinterleave + the 134 MB transfer at the relay's session-dependent
    20-90 MB/s; ``results/tpu_r15.jsonl``), so both the copies and the
    second transfer round-trip are worth removing.
    """
    if fid_arrs.dtype == np.complex64:
        inter = np.ascontiguousarray(fid_arrs).view(np.float32)
        buf = jnp.asarray(inter.reshape(*fid_arrs.shape, 2))
        re, im = _split_interleaved(buf)
        # Free the interleaved staging buffer deterministically: the split
        # transiently holds buf + both planes (2x one grid) in device
        # memory, and leaving buf to the GC would let several grids'
        # staging buffers stack up under a prefetching serve loop.  The
        # block is immaterial next to the transfer this call just paid.
        # It must NOT be inside the delete() guard: an async transfer or
        # execution error surfaces here, and swallowing it would hand a
        # poisoned "success" to stage_device_fids — the serve loader's
        # staging-failed fallback never fires on poisoned planes.
        jax.block_until_ready((re, im))
        try:
            buf.delete()
        except Exception:  # pragma: no cover — backend without delete()
            pass
        return re, im
    return (
        jnp.asarray(np.ascontiguousarray(fid_arrs.real)),
        jnp.asarray(np.ascontiguousarray(fid_arrs.imag)),
    )


def _flatten_to_spectra(da: XmrArray, dim: str):
    """Time-last transpose + row-major flatten to ``(n_spectra, n_time)``.

    The single definition of the voxel ordering shared by ``fit_amares``
    and ``stage_device_fids`` — pre-staged device planes line up with the
    fit's flattening because both run through here.
    """
    if dim not in da.dims:
        raise ValueError(f"Dimension '{dim}' missing in DataArray.")
    other_dims = [d for d in da.dims if d != dim]
    da_t = da.transpose(*(other_dims + [dim]))
    n_time = da.sizes[dim]
    fid_arrs = np.asarray(da_t.values).reshape(-1, n_time)
    return fid_arrs, tuple(da_t.shape[:-1]), other_dims


def stage_device_fids(da: XmrArray, dim: str = "time"):
    """Pre-upload a grid's planar FID planes for ``fit_amares(device_fids=)``.

    Returns the ``(re, im)`` device arrays, flattened exactly the way
    ``fit_amares`` flattens the grid (time-last transpose, row-major voxel
    order).  Through the remote-TPU relay the device upload IS the seed
    wall (3.9-6.5 s for a production 134 MB grid at the relay's
    session-dependent 20-90 MB/s; ``results/tpu_r15.jsonl``), so a serving
    loop can stage grid N+1's planes from a prefetch thread while grid N
    fits — ``xmris-tpu-serve --pipeline`` does exactly this.  For
    complex64 grids (the production path) the call BLOCKS until the
    planes are device-resident (the staging buffer is freed
    deterministically once the split lands), so any transfer error raises
    here, in the staging thread — exactly where a prefetching caller's
    fall-back-to-in-fit-upload handler lives; other dtypes dispatch
    asynchronously and surface errors when the fit consumes the planes.

    Returns a :class:`StagedFids` tagged with the staged layout so the
    consuming ``fit_amares`` call can verify the planes really match its
    own ``(da, dim)`` flattening, not just its flattened shape.
    """
    fid_arrs, voxel_shape, other_dims = _flatten_to_spectra(da, dim)
    re, im = _device_fid_planes(fid_arrs)
    return StagedFids(
        re, im,
        dims=tuple(other_dims) + (dim,),
        shape=tuple(voxel_shape) + (fid_arrs.shape[1],),
    )


def _seed_planes(fid_arrs, device_fids):
    """float32 device planes of the grid for the LS seed solves.

    Reuses already-uploaded planes when the caller provides them (the
    cast runs on device); otherwise pays the upload here.
    """
    if device_fids is not None:
        return (
            device_fids[0].astype(jnp.float32),
            device_fids[1].astype(jnp.float32),
        )
    return (
        jnp.asarray(np.ascontiguousarray(fid_arrs.real, dtype=np.float32)),
        jnp.asarray(np.ascontiguousarray(fid_arrs.imag, dtype=np.float32)),
    )


def _linear_amp_phase_seed(fid_arrs, x_template, pk, t_j, mhz,
                           device_fids=None):
    """Per-voxel LS amplitudes/phases given the template's cs/lw/g.

    With frequencies, linewidths and g frozen at the template optimum, the
    complex amplitude ``a_k e^{i phi_k}`` of every peak enters Eq.6
    LINEARLY, so the whole grid's optimal amplitudes and phases come from
    ONE shared (2K, 2K) normal-equations solve against each voxel's data —
    a near-exact seed for 2 of the 4 parameter families per peak, which
    cuts the batched LM's accepted steps (the reference's initializer
    scales amplitudes by a single scalar instead, ``amares.py:314-324``).

    Returns ``(amp, phase_deg)`` numpy arrays of shape (B, K).
    """
    re, im = _seed_planes(fid_arrs, device_fids)
    amp, ph = _linear_seed_solve(
        re, im, jnp.asarray(x_template, dtype=jnp.float32),
        t_j.astype(jnp.float32), hashable_pmap(pk.pmap), float(mhz),
    )
    return np.asarray(amp), np.asarray(ph)


def _wrap_phase_window(vals, lo, hi):
    """Map seeded phase values (free space; the seed plans only admit
    scale == 1 slots, so units are degrees) into the 360-degree window
    centred on the bound interval.  Without this, a phase whose arctan2
    principal branch falls outside the prior's window (e.g. bounds
    (0, 360) with the LS optimum at -90 == 270) would be CLIPPED at a
    bound edge ~360 degrees from the optimum instead of wrapped to its
    periodic equivalent.  Half-bounded windows (e.g. ``"(0, "``) wrap to
    the first period above/below the finite edge; unbounded phases keep
    the principal branch."""
    if np.isfinite(lo) and np.isfinite(hi):
        c = 0.5 * (lo + hi)
        return c + np.mod(vals - c + 180.0, 360.0) - 180.0
    if np.isfinite(lo):
        return lo + np.mod(vals - lo, 360.0)
    if np.isfinite(hi):
        return hi - np.mod(hi - vals, 360.0)
    return vals


def _wrap_phase_window_jax(vals, lo: float, hi: float):
    """Traced :func:`_wrap_phase_window` for one slot (static bounds)."""
    if np.isfinite(lo) and np.isfinite(hi):
        c = 0.5 * (lo + hi)
        return c + jnp.mod(vals - c + 180.0, 360.0) - 180.0
    if np.isfinite(lo):
        return lo + jnp.mod(vals - lo, 360.0)
    if np.isfinite(hi):
        return hi - jnp.mod(hi - vals, 360.0)
    return vals


def _nudge_into_bounds(vals, lo, hi):
    """Clip seeded values INSIDE the bounds with the same off-edge margin
    as prior parsing (``prior.py``): the MINPACK bound transform has zero
    slope at the edge, which freezes the parameter and ill-conditions the
    first LM steps."""
    if np.isfinite(lo) and np.isfinite(hi) and hi > lo:
        m = 1e-3 * (hi - lo)
        return np.clip(vals, lo + m, hi - m)
    if np.isfinite(lo):
        return np.maximum(vals, lo + max(1e-3, abs(lo) * 1e-3))
    if np.isfinite(hi):
        return np.minimum(vals, hi - max(1e-3, abs(hi) * 1e-3))
    return vals


def template_optimum(
    fid_arrs: np.ndarray,
    pk: PriorKnowledge,
    t_j,
    mhz: float,
    template_fid: np.ndarray | None = None,
    max_iter: int = 60,
    verbose: bool = False,
) -> np.ndarray:
    """Fit the (auto-selected) highest-SNR voxel once with the cheap XLA
    planar engine and return its free-parameter optimum — the shared
    template every voxel's seed starts from (reference
    ``pyAMARES.initialize_FID``, ``amares.py:314-324``).  Falls back to the
    prior's initial values when the template fit diverges."""
    from xmris_tpu.fitting.lm import lm_fit_batched_planar

    if template_fid is None:
        template_fid = fid_arrs[select_template_fid(fid_arrs, announce=False)]
    u0_t = jnp.asarray(
        external_to_internal(
            pk.init_free[None, :], pk.lower, pk.upper, pk.kind
        )
    )
    res_t = lm_fit_batched_planar(
        jnp.asarray(np.ascontiguousarray(template_fid.real)[None, :]),
        jnp.asarray(np.ascontiguousarray(template_fid.imag)[None, :]),
        t_j, u0_t,
        jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
        hashable_pmap(pk.pmap), mhz, max_iter=max_iter,
    )
    x_t = np.asarray(res_t.x_free)[0]
    if bool(np.asarray(res_t.converged)[0]) and np.isfinite(x_t).all():
        if verbose:
            print(
                f"Template fit converged (cost "
                f"{float(np.asarray(res_t.cost)[0]):.3e}); seeding grid."
            )
        return x_t
    return pk.init_free


def template_seeded_x0(
    fid_arrs: np.ndarray,
    pk: PriorKnowledge,
    t_j,
    mhz: float,
    template_fid: np.ndarray | None = None,
    fit_template: bool = True,
    scale_amplitudes: bool = True,
    max_iter: int = 60,
    verbose: bool = False,
    linear_seed: bool = True,
    g_scan: tuple | None = None,
    device_fids: tuple | None = None,
) -> np.ndarray:
    """Per-voxel initial values seeded from a template-voxel fit.

    The single shared implementation of the reference's
    ``pyAMARES.initialize_FID`` scheme (``amares.py:314-324``) used by
    :func:`fit_amares`, ``bench.py``, and the TPU experiment scripts: fit
    ``template_fid`` (default: the auto-selected highest-SNR voxel) once
    with the cheap XLA planar engine, start every voxel from its optimum,
    and rescale amplitudes by each voxel's first-point magnitude over the
    template total.  Falls back to the prior's initial values when the
    template fit diverges or goes non-finite.

    ``g_scan`` (a tuple of candidate mixing fractions, e.g. ``(0.0, 0.2,
    0.5, 0.8)``) additionally seeds every FREE g slot per voxel: the
    linear LS solve runs once per candidate against a basis with that g,
    and each voxel keeps the argmin-cost candidate's g + amplitudes +
    phases.  Ignored when the prior fixes every g.

    ``device_fids``: optional already-uploaded ``(re, im)`` device planes
    of ``fid_arrs`` — the LS seed casts and reuses them instead of paying
    a second host→device transfer of the whole grid.

    Returns the (B, n_free) array of *external* initial values.
    """
    n_spectra = fid_arrs.shape[0]
    x_template = pk.init_free
    if fit_template:
        x_template = template_optimum(
            fid_arrs, pk, t_j, mhz, template_fid=template_fid,
            max_iter=max_iter, verbose=verbose,
        )

    x0 = np.broadcast_to(x_template[None, :], (n_spectra, pk.n_free)).copy()
    # The single source of slot-eligibility truth: the same static plans
    # the fused in-graph seeder (seeded_fit_grid_raw) consumes.
    amp_slots, ls_plan = seed_plan(pk)
    if scale_amplitudes:
        slots = list(amp_slots)
        template_total = float(
            np.sum(np.abs(x_template[slots])) if slots else 0.0
        )
        if slots and template_total > 0:
            y0_mag = np.abs(fid_arrs[:, 0])
            factor = np.clip(y0_mag / template_total, 0.1, 100.0)
            x0[:, slots] *= factor[:, None]

    if linear_seed:
        # Per-voxel LS amplitudes + phases at the template's cs/lw/g: a
        # near-exact seed for the linear parameter families.  Values are
        # nudged INSIDE the bounds (a clamped seed at the exact edge sits
        # in the bound transform's zero-slope region); non-finite entries
        # keep the scaled-template seed.  Writes are staged and applied
        # all-or-nothing so a failure cannot leave a half-seeded grid.
        if isinstance(g_scan, str):
            raise TypeError(
                "g_scan must be a tuple of candidate mixing fractions or "
                "None; the 'auto' policy is resolved by fit_amares, not "
                "here"
            )
        try:
            g_slots = g_seed_plan(pk) if g_scan else ()
            amp = ph = None
            if g_slots:
                # Free-g prior: scan static g candidates, seed the winning
                # per-voxel mixing fraction alongside its amp/phase LS
                # solution (a shared template g converges slowly).
                re, im = _seed_planes(fid_arrs, device_fids)
                amp_j, ph_j, g_best_j, _ = _linear_seed_scan_g(
                    re, im, jnp.asarray(x_template, jnp.float32),
                    t_j.astype(jnp.float32), hashable_pmap(pk.pmap),
                    float(mhz), tuple(float(g) for g in g_scan),
                )
                amp, ph = np.asarray(amp_j), np.asarray(ph_j)
                g_best = np.asarray(g_best_j)
            elif ls_plan:
                amp, ph = _linear_amp_phase_seed(
                    fid_arrs, x_template, pk, t_j, mhz,
                    device_fids=device_fids,
                )
            staged: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for slot, offset, lo, hi in g_slots:
                vals = _nudge_into_bounds(g_best - offset, lo, hi)
                staged[slot] = (np.isfinite(vals), vals)
            if amp is not None:
                for slot, k, col, offset, lo, hi in ls_plan:
                    if slot in staged:
                        continue
                    # physical = offset + scale*x => x = physical - offset
                    vals = (amp[:, k] if col == 0 else ph[:, k]) - offset
                    if col == 3:
                        vals = _wrap_phase_window(vals, lo, hi)
                    vals = _nudge_into_bounds(vals, lo, hi)
                    staged[slot] = (np.isfinite(vals), vals)
            for slot, (ok, vals) in staged.items():
                x0[ok, slot] = vals[ok]
        except Exception as exc:  # pragma: no cover — seed quality only
            warnings.warn(
                f"linear seed skipped ({exc!r}); using template seed",
                RuntimeWarning,
                stacklevel=2,
            )
    return x0


def g_seed_plan(pk: PriorKnowledge):
    """Static description of the free-g seeding writes for a g scan.

    Returns a tuple of ``(slot, offset, lo, hi)`` — one per distinct free
    untied (scale == 1) g slot — empty when the prior fixes every g (the
    scan is then pointless and callers skip it)."""
    plan = []
    seen: set[int] = set()
    for k in range(pk.n_peaks):
        j = k * 5 + 4
        slot = int(pk.pmap.idx[j])
        if slot < 0 or slot in seen or pk.pmap.scale[j] != 1.0:
            continue
        seen.add(slot)
        plan.append(
            (
                slot,
                float(pk.pmap.offset[j]),
                float(pk.lower[slot]),
                float(pk.upper[slot]),
            )
        )
    return tuple(plan)


def seed_plan(pk: PriorKnowledge):
    """Static (hashable) description of the per-voxel seeding writes.

    Returns ``(amp_slots, ls_plan)``: ``amp_slots`` are the free amplitude
    slots rescaled by each voxel's first-point magnitude, ``ls_plan`` is a
    tuple of ``(slot, peak, col, offset, lo, hi)`` entries — one per free
    untied amplitude (col 0) / phase (col 3) slot — that receive the linear
    LS seed (mirrors the staging loop in :func:`template_seeded_x0`).
    """
    amp_slots = tuple(
        int(pk.pmap.idx[k * 5])
        for k in range(pk.n_peaks)
        if pk.pmap.idx[k * 5] >= 0 and pk.pmap.scale[k * 5] == 1.0
    )
    plan = []
    staged: set[int] = set()
    for k in range(pk.n_peaks):
        for col in (0, 3):
            j = k * 5 + col
            slot = int(pk.pmap.idx[j])
            if slot < 0 or slot in staged or pk.pmap.scale[j] != 1.0:
                continue
            staged.add(slot)
            plan.append(
                (
                    slot,
                    k,
                    col,
                    float(pk.pmap.offset[j]),
                    float(pk.lower[slot]),
                    float(pk.upper[slot]),
                )
            )
    return amp_slots, tuple(plan)


def _nudge_into_bounds_jax(vals, lo: float, hi: float):
    """Traced :func:`_nudge_into_bounds` for one slot (static bounds)."""
    if np.isfinite(lo) and np.isfinite(hi) and hi > lo:
        m = 1e-3 * (hi - lo)
        return jnp.clip(vals, lo + m, hi - m)
    if np.isfinite(lo):
        return jnp.maximum(vals, lo + max(1e-3, abs(lo) * 1e-3))
    if np.isfinite(hi):
        return jnp.minimum(vals, hi - max(1e-3, abs(hi) * 1e-3))
    return vals


@functools.partial(
    jax.jit,
    static_argnames=(
        "pmap_static", "mhz", "amp_slots", "ls_plan", "max_iter", "lam0",
        "kernel_version", "v_tile", "interpret", "plateau_streak",
        "uniform_t_ok", "engine", "g_scan", "g_plan", "spd_pallas",
    ),
)
def seeded_fit_grid_raw(
    re,
    im,
    t,
    x_template,
    lower,
    upper,
    kind,
    *,
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
    g_scan: tuple = (),
    g_plan: tuple = (),
    spd_pallas: bool = True,
):
    """Whole-grid seeding + batched LM + CRLB as ONE device program.

    In-graph equivalent of ``template_seeded_x0`` (minus the host-side
    one-voxel template fit, whose optimum arrives as ``x_template``)
    followed by the fused-kernel LM and the zero-cost CRLB: per-voxel
    amplitude rescaling, the shared linear LS amplitude/phase seed, the
    bound transform, the LM loop, and ``crlb_from_hessian`` all execute in
    a single dispatch — nothing but the template optimum crosses the host
    boundary.  (One semantic difference from the host-side seeder: a
    non-finite LS value falls back per-entry rather than all-or-nothing.)

    Returns ``(x_free, cost, converged, crlb_sds)``.
    """
    from xmris_tpu.fitting.lm import (
        _lm_fit_batched_pallas_impl,
        _pmap_jax,
        crlb_from_hessian,
        external_to_internal_jax,
        lm_fit_batched_planar,
    )

    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    t = t.astype(jnp.float32)
    x_template = x_template.astype(jnp.float32)
    b = re.shape[0]
    n_free = x_template.shape[-1]

    x0 = jnp.broadcast_to(x_template[None, :], (b, n_free))
    if amp_slots:
        slots = list(amp_slots)
        total = jnp.sum(jnp.abs(x_template[jnp.asarray(slots)]))
        y0_mag = jnp.sqrt(re[:, 0] ** 2 + im[:, 0] ** 2)
        factor = jnp.where(
            total > 0,
            jnp.clip(y0_mag / jnp.maximum(total, 1e-30), 0.1, 100.0),
            1.0,
        )
        x0 = x0.at[:, slots].multiply(factor[:, None])

    # The g scan stages independently of the amplitude/phase plan — a
    # prior with every amplitude/phase fixed or tied but a free g still
    # gets its per-voxel scanned mixing fraction (mirrors the host
    # seeder, which stages g whenever g_slots is non-empty).
    amp = ph = None
    if g_scan and g_plan:
        # Free-g prior: per-voxel lineshape-mixing scan (see
        # _linear_seed_scan_g); the winning candidate seeds g and the
        # matching amplitudes/phases.
        amp, ph, g_best, _ = _linear_seed_scan_g(
            re, im, x_template, t, pmap_static, mhz, g_scan
        )
        for slot, offset, lo, hi in g_plan:
            vals = _nudge_into_bounds_jax(g_best - offset, lo, hi)
            x0 = x0.at[:, slot].set(
                jnp.where(jnp.isfinite(vals), vals, x0[:, slot])
            )
    elif ls_plan:
        amp, ph = _linear_seed_solve(
            re, im, x_template, t, pmap_static, mhz
        )
    if ls_plan and amp is not None:
        for slot, k, col, offset, lo, hi in ls_plan:
            vals = (amp[:, k] if col == 0 else ph[:, k]) - offset
            if col == 3:
                vals = _wrap_phase_window_jax(vals, lo, hi)
            vals = _nudge_into_bounds_jax(vals, lo, hi)
            x0 = x0.at[:, slot].set(
                jnp.where(jnp.isfinite(vals), vals, x0[:, slot])
            )

    u0 = external_to_internal_jax(
        x0, lower[None, :], upper[None, :], kind[None, :]
    ).astype(jnp.float32)

    if engine == "pallas":
        from xmris_tpu.fitting.lm import auto_varpro

        vp = auto_varpro(pmap_static)
        # On the slab-mode path (v9 + Pallas SPD; VARPRO included — the
        # override reads its Gram entries off static slab rows) the
        # Hessian stays in the moment kernel's native column-slab layout
        # from the LM loop all the way into the CRLB inverse-diagonal
        # kernel — zero (B, F, F) materializations in the fused program.
        from xmris_tpu.fitting.lm import uses_slab_hessian

        slab = uses_slab_hessian(spd_pallas, kernel_version)
        res, h_ext = _lm_fit_batched_pallas_impl(
            re, im, t, u0, lower, upper, kind, pmap_static, mhz,
            max_iter=max_iter, lam0=lam0, v_tile=v_tile,
            interpret=interpret, kernel_version=kernel_version,
            return_hessian="slab" if slab else True,
            plateau_streak=plateau_streak,
            uniform_t_ok=uniform_t_ok, varpro=vp, spd_pallas=spd_pallas,
        )
        if slab:
            from xmris_tpu.fitting.lm import crlb_from_hessian_slab

            # f_pad comes from the slab's own shape (single source of
            # truth for the kernel's sublane rounding).
            sds, _ = crlb_from_hessian_slab(
                h_ext, res.cost, re.shape[-1], f=n_free,
                interpret=interpret,
            )
        else:
            sds, _ = crlb_from_hessian(
                h_ext, res.cost, re.shape[-1], use_pallas=spd_pallas,
                interpret=interpret if spd_pallas else None,
            )
    else:
        from xmris_tpu.fitting.lm import crlb_batched_planar

        res = lm_fit_batched_planar(
            re, im, t, u0, lower, upper, kind, pmap_static, mhz,
            max_iter=max_iter,
        )
        sds, _ = crlb_batched_planar(re, im, t, res.x_free, pmap_static, mhz)
    return res.x_free, res.cost, res.converged, sds


def fit_amares(
    da: XmrArray,
    prior_knowledge_file: str | Path | PriorKnowledge,
    dim: str = "time",
    mhz: float | None = None,
    sw: float | None = None,
    deadtime: float | None = None,
    method: str = "leastsq",
    initialize_with_lm: bool = True,
    num_workers: int = 4,
    init_fid: np.ndarray | None = None,
    verbose: bool = False,
    max_iter: int = 60,
    chunk_size: int | None = None,
    engine: str = "auto",
    scale_init_amplitudes: bool = True,
    kernel_version: int = 9,
    g_scan: tuple | str | None = "auto",
    return_curves: bool = True,
    device_fids: tuple | None = None,
    mesh=None,
) -> XmrDataset:
    """Fit the AMARES Eq.6 model to every voxel of an N-D FID array.

    Parameters mirror the reference API.  ``num_workers`` is accepted for
    compatibility and ignored (parallelism is the device batch);
    ``initialize_with_lm=True`` first solves the template FID (``init_fid``
    or the auto-selected highest-SNR voxel) with a fast planar LM pass and
    seeds every voxel's initial values from that optimum — the batched
    analog of ``pyAMARES.initialize_FID``'s LM initializer
    (reference ``amares.py:314-324``) — and then runs a second refinement
    pass seeded from each voxel's own first solution.  ``max_iter`` and
    ``chunk_size`` control the batched solver; ``chunk_size=None`` (default)
    runs the whole grid in one launch on the pallas path and 4096-voxel
    chunks on the XLA path (whose Jacobian workspace scales with the batch).

    ``engine`` selects the device solver: ``"xla"`` (vmapped planar LM),
    ``"pallas"`` (fused normal-equations kernel, Jacobians never leave VMEM),
    or ``"auto"`` (pallas on TPU, xla elsewhere); ``kernel_version`` picks
    the pallas formulation (10 = the whole LM loop fused into ONE kernel
    launch around the v9 evaluation — solve, bound transforms and
    accept/reject state live in VMEM; VARPRO priors fall back to 9;
    9 = generalized moment-based H for EVERY
    Eq.6 prior — Lorentzian, Voigt and free-g at the same speed — with
    the free-parameter fold done in-kernel;
    8 = moment-based H for purely Lorentzian priors only,
    auto-falling back to 6 for Voigt; 6 = active rows + stacked-voxel
    MXU Gram dots + converged-tile skipping; 5 = active rows only;
    3 = all rows; 2/1 earlier formulations).

    ``scale_init_amplitudes`` rescales each voxel's initial amplitudes by its
    own first-point magnitude relative to the prior's total (the analog of
    pyAMARES initializing from the data), which sharply reduces iterations on
    grids with wide concentration ranges.

    ``g_scan`` seeds free lineshape-mixing fractions per voxel by scanning
    LS amplitude solves over candidate g values (``"auto"``: a default
    ladder when the prior leaves any g free, skipped otherwise; a tuple:
    explicit candidates; ``None``: off).

    ``return_curves=False`` omits the per-voxel time-domain curves
    (``raw_data``/``fit_data``/``residuals``) from the result — the
    parameter/CRLB/SNR maps and convergence mask are unchanged.  The
    curves triple the result's footprint (3 full-grid complex arrays) and
    their device reconstruction + transfer dominate a remote-accelerator
    deployment's per-grid wall (results/tpu_r14.jsonl), so streaming
    servers that only consume maps should turn them off
    (``xmris-tpu-serve --curves`` re-enables them there).

    ``device_fids`` accepts the grid's pre-uploaded ``(re, im)`` device
    planes from :func:`stage_device_fids` — a serving loop can start the
    dominant device upload (results/tpu_r15.jsonl) for the NEXT grid from
    a prefetch thread while the current grid fits.  The planes must match
    this call's flattening, i.e. come from ``stage_device_fids(da, dim)``
    on the same array.

    ``mesh`` scales the fit over multiple devices — the user-facing analog
    of the reference's ``num_workers`` process pool (reference
    ``amares.py:118-204``), realized as SPMD over a
    :class:`jax.sharding.Mesh` voxel axis instead of host processes.
    Accepts a 1-D ``Mesh``, a device count (``make_mesh(n)`` is built for
    you), or ``"auto"`` (all visible devices when more than one, else
    single-device).  The voxel batch shards over the mesh axis (padded by
    edge-repetition when not divisible, results trimmed — per-voxel
    solutions are unaffected); the pallas engine runs the fused LM under
    ``shard_map`` (:func:`xmris_tpu.parallel.fit.lm_fit_batched_pallas_sharded`),
    the XLA engine auto-shards under GSPMD from the sharded inputs.
    Results are bit-identical to ``mesh=None``.
    """
    if dim not in da.dims:
        raise ValueError(f"Dimension '{dim}' missing in DataArray.")

    # Opt-in stage decomposition (XMT_FIT_STAGE_TIMERS=1): one JSON line
    # with host-wall seconds per stage.  Production serving is dominated
    # by host/transfer work, not device compute (results/tpu_r14.jsonl),
    # so the split is the first thing to look at when a deployment is
    # slower than the device-time arithmetic predicts.
    import os as _os

    stage_t: dict[str, float] | None = (
        {} if _os.environ.get("XMT_FIT_STAGE_TIMERS") else None
    )
    _mark = time.perf_counter()

    def _stage(name: str) -> None:
        nonlocal _mark
        if stage_t is not None:
            now = time.perf_counter()
            stage_t[name] = round(now - _mark, 3)
            _mark = now

    # 1. Physical parameter inference (reference: amares.py:269-281)
    if mhz is None:
        mhz = da.attrs.get("MHz")
        if mhz is None:
            raise ValueError("mhz must be provided or present in da.attrs['MHz']")
    mhz = float(mhz)

    t_coords = da.coords[dim].values.astype(np.float64)
    if sw is None:
        sw = 1.0 / float(t_coords[1] - t_coords[0])
    if deadtime is None:
        deadtime = float(t_coords[0])

    # 2. Flatten N-D -> (n_spectra, n_time)
    fid_arrs, voxel_shape, other_dims = _flatten_to_spectra(da, dim)
    n_time = fid_arrs.shape[1]
    n_spectra = fid_arrs.shape[0]

    # 3. Template FID selection (reference: amares.py:295-312).  Either the
    # caller's ``init_fid`` or the highest-SNR voxel of the grid.
    if init_fid is not None:
        template_fid = np.asarray(init_fid).reshape(-1)
        if template_fid.shape[0] != n_time:
            raise ValueError(
                f"init_fid has {template_fid.shape[0]} points, expected {n_time}."
            )
    else:
        template_fid = fid_arrs[select_template_fid(fid_arrs)]
    _stage("ingest")

    # 4. Prior knowledge
    pk = (
        prior_knowledge_file
        if isinstance(prior_knowledge_file, PriorKnowledge)
        else load_prior_knowledge(prior_knowledge_file)
    )
    pmap_static = hashable_pmap(pk.pmap)

    timeaxis = np.arange(n_time, dtype=np.float64) * (1.0 / sw) + deadtime
    t_j = jnp.asarray(timeaxis)
    lower_j = jnp.asarray(pk.lower)
    upper_j = jnp.asarray(pk.upper)
    kind_j = jnp.asarray(pk.kind)

    # ONE device upload of the planar FID planes, shared by the seed and
    # fit stages: through the remote-TPU relay a production grid uploads
    # at ~100 MB/s (results/tpu_r14.jsonl), so every avoided re-upload is
    # worth more than the entire device fit.  complex64 grids ship as a
    # single zero-copy interleaved transfer (results/tpu_r15.jsonl).
    # Callers that staged the planes ahead of time (serve's prefetch
    # thread) hand them in and skip the upload entirely.
    if device_fids is not None:
        re_all, im_all = device_fids[0], device_fids[1]
        expected = (n_spectra, n_time)
        if tuple(re_all.shape) != expected or tuple(im_all.shape) != expected:
            raise ValueError(
                f"device_fids planes have shapes {tuple(re_all.shape)} / "
                f"{tuple(im_all.shape)}, expected {expected}; stage them "
                f"with stage_device_fids(da, dim={dim!r})."
            )
        # Shape alone cannot catch planes staged along the WRONG dim of a
        # grid whose sizes coincide (the fit would silently run on
        # transposed data); StagedFids carries the staged layout, so
        # verify it against this call's own flattening when present.
        staged_dims = getattr(device_fids, "dims", ())
        staged_shape = getattr(device_fids, "shape", ())
        this_layout = (tuple(other_dims) + (dim,),
                       tuple(voxel_shape) + (n_time,))
        if staged_dims and (staged_dims, staged_shape) != this_layout:
            raise ValueError(
                f"device_fids were staged for layout dims={staged_dims} "
                f"shape={staged_shape}, but this fit flattens to "
                f"dims={this_layout[0]} shape={this_layout[1]}; stage them "
                f"with stage_device_fids(da, dim={dim!r}) on the same array."
            )
    else:
        re_all, im_all = _device_fid_planes(fid_arrs)

    # Per-voxel initial values: template fit + amplitude rescaling (the
    # shared implementation of pyAMARES.initialize_FID's scheme).  The
    # template solves on the cheap XLA engine deliberately — a batch-1
    # pallas launch would cost an extra Mosaic compile on TPU.
    if g_scan == "auto":
        # Free-g priors converge slowly from a shared template g; the
        # default candidate ladder costs a handful of shared LS solves and
        # seeds each voxel's mixing fraction near its optimum.  No-op for
        # fixed-g priors (g_seed_plan is empty).
        g_scan = (0.0, 0.2, 0.4, 0.6, 0.8) if g_seed_plan(pk) else None
    x0 = template_seeded_x0(
        fid_arrs, pk, t_j, mhz,
        template_fid=template_fid,
        fit_template=initialize_with_lm,
        scale_amplitudes=scale_init_amplitudes,
        max_iter=max_iter,
        verbose=verbose,
        g_scan=g_scan,
        device_fids=(re_all, im_all),
    )
    u0 = external_to_internal(x0, pk.lower, pk.upper, pk.kind)
    u0_j = jnp.asarray(u0)
    _stage("seed")

    # 5. Batched bounded LM over voxel chunks
    if engine == "auto":
        import jax as _jax

        engine = "pallas" if _jax.default_backend() == "tpu" else "xla"

    # Multi-device routing (the public analog of the reference's
    # ``num_workers`` pool): normalize ``mesh`` to a jax.sharding.Mesh.
    if isinstance(mesh, str):
        if mesh != "auto":
            raise ValueError(
                f"mesh={mesh!r}: expected a jax.sharding.Mesh, a device "
                "count, 'auto', or None."
            )
        import jax as _jax

        mesh = len(_jax.devices()) if len(_jax.devices()) > 1 else None
    if isinstance(mesh, int):
        from xmris_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(mesh)
    if mesh is not None:
        from jax.sharding import Mesh as _Mesh

        if not isinstance(mesh, _Mesh):
            raise ValueError(
                f"mesh={mesh!r}: expected a jax.sharding.Mesh, a device "
                "count, 'auto', or None."
            )
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"mesh has axes {mesh.axis_names}; fit_amares shards the "
                "voxel batch over a 1-D mesh — pass make_mesh(n) or a "
                "single-axis Mesh."
            )
    mesh_axis = mesh.axis_names[0] if mesh is not None else None

    if chunk_size is None:
        # One launch for the whole grid on the fused-kernel path (VMEM per
        # tile is fixed; every extra dispatch through a remote relay costs
        # ~40 ms of pure latency); bounded chunks on the XLA path, whose
        # Jacobian workspace scales with the batch.
        chunk_size = n_spectra if engine == "pallas" else 4096

    def run_lm(re_c, im_c, u_init, iters):
        """Returns (LMResult, h_ext-or-None): the pallas driver hands back
        the Gauss-Newton Hessian at the optimum for free (the CRLB pass
        then needs zero extra kernel evaluations).

        With ``mesh`` set, the chunk is edge-padded to a multiple of the
        mesh size, fitted sharded over the voxel axis, and trimmed back —
        pad voxels are copies whose solutions are discarded, so results
        are identical to the single-device launch.
        """
        import jax as _jax

        b = re_c.shape[0]
        if mesh is not None:
            from xmris_tpu.parallel.mesh import (
                edge_pad_rows,
                pad_to_multiple,
                voxel_sharding,
            )

            n_pad = pad_to_multiple(b, mesh.shape[mesh_axis])
            re_c = edge_pad_rows(re_c, n_pad)
            im_c = edge_pad_rows(im_c, n_pad)
            u_init = edge_pad_rows(u_init, n_pad)

        if engine == "pallas":
            from xmris_tpu.fitting.lm import lm_fit_batched_pallas

            if mesh is not None:
                from xmris_tpu.parallel.fit import lm_fit_batched_pallas_sharded

                res, h = lm_fit_batched_pallas_sharded(
                    re_c, im_c, t_j, u_init, lower_j, upper_j, kind_j,
                    pmap_static, mhz, mesh=mesh, axis_name=mesh_axis,
                    max_iter=iters,
                    interpret=_jax.default_backend() != "tpu",
                    kernel_version=kernel_version,
                    return_hessian=True,
                )
                return type(res)(*(f[:b] for f in res)), h[:b]
            return lm_fit_batched_pallas(
                re_c, im_c, t_j, u_init, lower_j, upper_j, kind_j,
                pmap_static, mhz, max_iter=iters,
                interpret=_jax.default_backend() != "tpu",
                kernel_version=kernel_version,
                return_hessian=True,
            )
        from xmris_tpu.fitting.lm import lm_fit_batched_planar

        if mesh is not None:
            # GSPMD path: sharded inputs partition the vmapped program.
            sh = voxel_sharding(mesh, 2, mesh_axis)
            re_c = _jax.device_put(re_c, sh)
            im_c = _jax.device_put(im_c, sh)
            u_init = _jax.device_put(u_init, sh)
        res = lm_fit_batched_planar(
            re_c, im_c, t_j, u_init, lower_j, upper_j, kind_j,
            pmap_static, mhz, max_iter=iters,
        )
        if mesh is not None and res.x_free.shape[0] != b:
            res = type(res)(*(f[:b] for f in res))
        return res, None

    t_before = time.perf_counter()
    x_parts, conv_parts, h_parts, cost_parts = [], [], [], []
    for start in range(0, n_spectra, chunk_size):
        re_c = re_all[start : start + chunk_size]
        im_c = im_all[start : start + chunk_size]
        res, h1 = run_lm(re_c, im_c, u0_j[start : start + chunk_size], max_iter)
        x = res.x_free
        cost_pick = res.cost
        h_pick = h1
        if initialize_with_lm:
            # Refinement pass: restart every voxel from its own optimum with a
            # fresh damping schedule (the batched analog of lmfit's LM
            # initializer pass); keep whichever solution is better per voxel.
            # Same static max_iter as the first pass: it reuses the compiled
            # program (max_iter is a jit cache key) and the exit-by-rejection
            # test stops converged voxels after a handful of iterations anyway.
            u_refined = jnp.asarray(
                external_to_internal(np.asarray(x), pk.lower, pk.upper, pk.kind)
            )
            res2, h2 = run_lm(re_c, im_c, u_refined, max_iter)
            better = res2.cost < res.cost
            x = jnp.where(better[:, None], res2.x_free, x)
            cost_pick = jnp.where(better, res2.cost, res.cost)
            if h1 is not None:
                h_pick = jnp.where(better[:, None, None], h2, h1)
            conv = res.converged | res2.converged
        else:
            conv = res.converged
        x_parts.append(np.asarray(x))
        conv_parts.append(np.asarray(conv))
        cost_parts.append(np.asarray(cost_pick))
        if h_pick is not None:
            # Device-resident: the CRLB pass consumes H per chunk as-is —
            # a host round trip of the (B, F, F) Hessian buys nothing.
            h_parts.append(h_pick)

    x_free = np.concatenate(x_parts, axis=0)
    converged = np.concatenate(conv_parts, axis=0)
    cost_final = np.concatenate(cost_parts, axis=0)

    elapsed = time.perf_counter() - t_before
    print(
        f"Fitting {n_spectra} spectra with batched device LM took "
        f"{elapsed:.2f} seconds."
    )
    _stage("fit")

    # 6. Expand parameters, CRLBs, reconstructed fits
    metabolites = np.asarray(pk.metabolites, dtype=object)
    n_metab = pk.n_peaks

    # Vectorized affine expansion free vector -> (B, K, 5) physical grids
    pm = pk.pmap
    safe_idx = np.maximum(pm.idx, 0)
    full_flat = pm.offset[None, :] + np.where(
        pm.idx[None, :] >= 0, pm.scale[None, :] * x_free[:, safe_idx], 0.0
    )
    grids = full_flat.reshape(n_spectra, n_metab, 5)

    sds_parts, sigma_parts, fit_parts = [], [], []
    for ci, start in enumerate(range(0, n_spectra, chunk_size)):
        xs = jnp.asarray(x_free[start : start + chunk_size])
        if h_parts:
            # Zero-cost CRLB: the LM driver already returned the GN Hessian
            # (= Fisher information, identity prior) at each voxel's chosen
            # optimum — no extra kernel evaluation needed, and the chunk's
            # H is still device-resident from the fit loop.
            from xmris_tpu.fitting.lm import crlb_from_hessian

            sds, sigma2 = crlb_from_hessian(
                h_parts[ci],
                jnp.asarray(cost_final[start : start + chunk_size]),
                n_time,
            )
        else:
            sds, sigma2 = crlb_batched(
                jnp.asarray(fid_arrs[start : start + chunk_size]),
                t_j, xs, pmap_static, mhz,
            )
        sds_parts.append(np.asarray(sds))
        sigma_parts.append(np.asarray(sigma2))
        if return_curves:
            fit_parts.append(_reconstruct_batch(xs, t_j, pk, mhz))

    sds_free = np.concatenate(sds_parts, axis=0)  # (B, F)
    sigma2 = np.concatenate(sigma_parts, axis=0)  # (B,)
    fit_data = (
        np.concatenate(fit_parts, axis=0) if return_curves else None
    )  # (B, n_time)
    _stage("crlb_model")

    # Per-metabolite quantities
    amplitudes = grids[:, :, 0]
    chem_shifts = grids[:, :, 1]
    linewidths = grids[:, :, 2]
    phases = grids[:, :, 3]

    # CRLB(%) of the amplitude, per metabolite (identity prior matrix).
    # A tied amplitude (amp_k = scale * x_slot) has sd(amp_k) =
    # |scale| * sd(x_slot): the tie factor must scale the free-parameter
    # bound before normalizing by the metabolite's own amplitude.
    crlbs = np.zeros((n_spectra, n_metab))
    for k in range(n_metab):
        j = k * 5
        slot = int(pk.pmap.idx[j])
        if slot >= 0:
            sd_amp = np.abs(pk.pmap.scale[j]) * sds_free[:, slot]
            with np.errstate(divide="ignore", invalid="ignore"):
                crlbs[:, k] = np.where(
                    amplitudes[:, k] != 0,
                    100.0 * sd_amp / np.abs(amplitudes[:, k]),
                    0.0,
                )

    # SNR per metabolite: fitted amplitude over the per-real-channel noise
    # std (sigma2 from the CRLB pass is already the per-channel variance:
    # sum of both channels' squared residuals over 2*n_t - F dof).
    noise_std = np.sqrt(np.maximum(sigma2, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        snrs = np.where(
            noise_std[:, None] > 0, np.abs(amplitudes) / noise_std[:, None], 0.0
        )

    # Failure masking: reference keeps zeros for failed voxels (amares.py:369-373)
    failed = ~converged | ~np.isfinite(grids).all(axis=(1, 2))
    for arr in (amplitudes, chem_shifts, linewidths, phases, crlbs, snrs):
        arr[failed] = 0.0
    if return_curves:
        fit_data[failed] = 0.0

    # 7. Pack the dataset in the original layout
    def to_voxel_shape(arr, extra=()):
        return arr.reshape(voxel_shape + extra)

    ds = XmrDataset()
    param_dims = tuple(other_dims) + ("Metabolite",)
    metab_coord = {"Metabolite": Coord("Metabolite", metabolites)}

    def voxel_coords(dims):
        out = {}
        for cname, c in da.coords.items():
            if c.dim in dims:
                out[cname] = Coord(c.dim, c.values, c.attrs)
        return out

    time_dims = tuple(other_dims) + (dim,)

    def back(arr, dims):
        x = XmrArray(arr, dims=dims)
        x.coords = voxel_coords(dims)
        return x.transpose(*(d for d in da.dims if d in dims)) if set(dims) == set(
            da.dims
        ) else x

    if return_curves:
        raw_nd = to_voxel_shape(fid_arrs, (n_time,))
        fit_nd = to_voxel_shape(fit_data, (n_time,))
        ds["raw_data"] = back(raw_nd, time_dims)
        ds["fit_data"] = back(fit_nd, time_dims)
        ds["residuals"] = back(raw_nd - fit_nd, time_dims)

    for name, arr in (
        ("amplitude", amplitudes),
        ("chem_shift", chem_shifts),
        ("linewidth", linewidths),
        ("phase", phases),
        ("crlb", crlbs),
        ("snr", snrs),
    ):
        v = XmrArray(to_voxel_shape(arr, (n_metab,)), dims=param_dims)
        v.coords = {**voxel_coords(other_dims), **{k: c.copy() for k, c in metab_coord.items()}}
        ds[name] = v

    conv_var = XmrArray(
        to_voxel_shape(converged.astype(bool)), dims=tuple(other_dims) or ("spectrum",)
    ) if other_dims else XmrArray(np.asarray(converged[:1]), dims=("spectrum",))
    if other_dims:
        conv_var.coords = voxel_coords(other_dims)
    ds["fit_converged"] = conv_var

    # 8. Lineage (reference: amares.py:474-487)
    ds.attrs = da.attrs.copy()
    ds.attrs.update(
        {
            "fit_method": method,
            "prior_knowledge_file": str(
                pk.source if isinstance(prior_knowledge_file, PriorKnowledge)
                else prior_knowledge_file
            ),
            "amares_version": f"xmris_tpu-{_xmt_version}",
        }
    )
    _stage("pack")
    if stage_t is not None:
        import json as _json

        print(_json.dumps({"fit_amares_stages_s": stage_t}), flush=True)
    return ds


@functools.partial(jax.jit, static_argnames=("pmap_static", "mhz"))
def _reconstruct_planar(xs, t_j, pmap_static, mhz):
    """Jitted core of :func:`_reconstruct_batch` (module level so the jit
    cache persists across calls — a closure-local jit would retrace and
    remote-compile on every ``fit_amares`` invocation, which dominated the
    warm per-grid wall through the TPU relay; results/tpu_r14.jsonl)."""
    from xmris_tpu.fitting.lm import _pmap_jax, eq6_basis_planar, expand_params

    pmap = _pmap_jax(pmap_static, xs.dtype)

    def one(x):
        grid = expand_params(x, pmap)
        m_re, m_im, _, _ = eq6_basis_planar(t_j, grid, mhz)
        return m_re, m_im

    return jax.vmap(one)(xs)


def _reconstruct_batch(x_free, t_j, pk: PriorKnowledge, mhz: float):
    """Time-domain model reconstruction for a batch of solutions.

    Planar on device (no complex dtype); combined to complex on the host.
    """
    m_re, m_im = _reconstruct_planar(
        jnp.asarray(x_free), t_j, hashable_pmap(pk.pmap), float(mhz)
    )
    return np.asarray(m_re) + 1j * np.asarray(m_im)


