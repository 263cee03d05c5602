"""Batched bounded Levenberg-Marquardt for AMARES Eq.6 models (planar core).

This is the TPU-native replacement for the reference's per-voxel
pyAMARES/lmfit fits shipped through a joblib process pool
(``src/xmris/fitting/amares.py:118-204``): instead of one Python LM per
process, ONE XLA program runs the full LM iteration for every voxel in the
batch simultaneously — model evaluation, analytic Jacobian, normal equations
as batched real matmuls on the MXU, damped solve, and accept/reject — with a
fixed trip count and per-voxel convergence masks.

All device math is **planar**: complex FIDs are carried as (real, imag)
float planes, so no complex dtype ever reaches the accelerator (same design
as :mod:`xmris_tpu.ops.kernels.dft`).  The complex->planar split happens on
the host at the API boundary.

Bounds use the MINPACK/lmfit parameter transform (``x = lo + (sin u + 1)/2 *
(hi - lo)`` for two-sided bounds, shifted-hyperbola for one-sided), so the
internal optimization is unconstrained, matching lmfit's ``leastsq`` behavior
the reference inherits.

The Jacobian is analytic: every Eq.6 partial is a cheap reweighting of the
per-peak basis ``B_k = a_k e^{i phi_k} E_k(t)``, so the full Jacobian costs
about one model evaluation instead of P finite-difference passes.

Failure semantics mirror the reference's NaN-masking contract
(``amares.py:91-115``): voxels whose solve goes non-finite keep iterating on
their last good state and are flagged in the returned ``converged`` mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Bound transforms (lmfit/MINPACK style)
# ---------------------------------------------------------------------------

_BOTH, _LOWER, _UPPER, _FREE = 0, 1, 2, 3


def classify_bounds(lower: np.ndarray, upper: np.ndarray) -> np.ndarray:
    kind = np.full(lower.shape, _FREE, dtype=np.int32)
    has_lo = np.isfinite(lower)
    has_hi = np.isfinite(upper)
    kind[has_lo & has_hi] = _BOTH
    kind[has_lo & ~has_hi] = _LOWER
    kind[~has_lo & has_hi] = _UPPER
    return kind


def external_to_internal(x, lower, upper, kind):
    """Map bounded external values to unbounded internal coordinates."""
    lo = np.where(np.isfinite(lower), lower, 0.0)
    hi = np.where(np.isfinite(upper), upper, 0.0)
    x = np.asarray(x, dtype=np.float64)

    frac = np.clip(
        np.where(hi > lo, (x - lo) / np.where(hi > lo, hi - lo, 1.0), 0.5),
        1e-8,
        1 - 1e-8,
    )
    u_both = np.arcsin(2.0 * frac - 1.0)
    v = np.maximum(x - lo + 1.0, 1.0 + 1e-12)
    u_lower = np.sqrt(v * v - 1.0)
    w = np.maximum(hi - x + 1.0, 1.0 + 1e-12)
    u_upper = np.sqrt(w * w - 1.0)

    return np.select(
        [kind == _BOTH, kind == _LOWER, kind == _UPPER], [u_both, u_lower, u_upper], x
    )


def external_to_internal_jax(x, lower, upper, kind):
    """Traced counterpart of :func:`external_to_internal` (same formulas,
    jnp ops) so grid seeding can run inside a fused device program."""
    lo = jnp.where(jnp.isfinite(lower), lower, 0.0)
    hi = jnp.where(jnp.isfinite(upper), upper, 0.0)

    span_ok = hi > lo
    frac = jnp.clip(
        jnp.where(span_ok, (x - lo) / jnp.where(span_ok, hi - lo, 1.0), 0.5),
        1e-8,
        1.0 - 1e-8,
    )
    u_both = jnp.arcsin(2.0 * frac - 1.0)
    v = jnp.maximum(x - lo + 1.0, 1.0 + 1e-12)
    u_lower = jnp.sqrt(v * v - 1.0)
    w = jnp.maximum(hi - x + 1.0, 1.0 + 1e-12)
    u_upper = jnp.sqrt(w * w - 1.0)

    return jnp.select(
        [kind == _BOTH, kind == _LOWER, kind == _UPPER],
        [u_both, u_lower, u_upper],
        x,
    )


def internal_to_external_jax(u, lower, upper, kind):
    """Traced bounded transform + its diagonal Jacobian dx/du."""
    lo = jnp.where(jnp.isfinite(lower), lower, 0.0)
    hi = jnp.where(jnp.isfinite(upper), upper, 0.0)

    s = jnp.sin(u)
    x_both = lo + (s + 1.0) * 0.5 * (hi - lo)
    d_both = 0.5 * (hi - lo) * jnp.cos(u)

    root = jnp.sqrt(u * u + 1.0)
    x_lower = lo - 1.0 + root
    d_lower = u / root
    x_upper = hi + 1.0 - root
    d_upper = -u / root

    x = jnp.select(
        [kind == _BOTH, kind == _LOWER, kind == _UPPER, kind == _FREE],
        [x_both, x_lower, x_upper, u],
    )
    dxdu = jnp.select(
        [kind == _BOTH, kind == _LOWER, kind == _UPPER, kind == _FREE],
        [d_both, d_lower, d_upper, jnp.ones_like(u)],
    )
    return x, dxdu


# ---------------------------------------------------------------------------
# Eq.6 model + analytic Jacobian, planar arithmetic
# ---------------------------------------------------------------------------


class ParamMap(NamedTuple):
    """Affine map from the free parameter vector to the (K, 5) physical grid.

    ``full[j] = offset[j] + scale[j] * x_free[idx[j]]`` with ``idx[j] = -1``
    for fixed parameters.  Column order: amplitude, chemical shift [ppm],
    linewidth [Hz], phase [deg], g.
    """

    idx: np.ndarray  # (K*5,) int32
    scale: np.ndarray  # (K*5,) float
    offset: np.ndarray  # (K*5,) float
    n_peaks: int


def expand_params(x_free, pmap: ParamMap):
    """(F,) free vector -> (K, 5) physical parameter grid (traced)."""
    safe_idx = jnp.maximum(pmap.idx, 0)
    gathered = x_free[safe_idx]
    full = pmap.offset + jnp.where(pmap.idx >= 0, pmap.scale * gathered, 0.0)
    return full.reshape(pmap.n_peaks, 5)


def eq6_basis_planar(t, grid, mhz: float):
    """Per-peak planar basis B_k = a_k e^{i phi} E_k(t) and the planar model.

    Returns (m_re, m_im, b_re, b_im) with b_* of shape (n_t, K).
    """
    amp = grid[:, 0]
    f_hz = grid[:, 1] * mhz
    d = jnp.pi * grid[:, 2]
    phi = jnp.deg2rad(grid[:, 3])
    g = grid[:, 4]

    t_col = t[:, None]
    envelope = amp * jnp.exp(-d * (1.0 - g + g * t_col) * t_col)
    angle = 2.0 * jnp.pi * f_hz * t_col + phi
    b_re = envelope * jnp.cos(angle)
    b_im = envelope * jnp.sin(angle)
    return jnp.sum(b_re, axis=1), jnp.sum(b_im, axis=1), b_re, b_im


def eq6_jacobian_planar(t, grid, b_re, b_im, mhz: float):
    """Analytic planar Jacobian d(model)/d(physical params), two (n_t, K, 5)
    planes.  Every partial reweights the basis:

      d/d amp   = B_k / a_k                    (real factor)
      d/d cs    = i * 2*pi*MHz*t * B_k          (i * real factor)
      d/d lw    = -pi*(1-g+g*t)*t * B_k         (real factor)
      d/d phase = i * (pi/180) * B_k            (i * real factor)
      d/d g     = -d*(t^2 - t) * B_k            (real factor)

    where multiplying by ``i*c`` maps planes (re, im) -> (-c*im, c*re).
    """
    amp = grid[:, 0]
    d = jnp.pi * grid[:, 2]
    g = grid[:, 4]
    t_col = t[:, None]

    safe_amp = jnp.where(amp == 0, 1.0, amp)
    w_cs = 2.0 * jnp.pi * mhz * t_col
    w_lw = -jnp.pi * (1.0 - g + g * t_col) * t_col
    w_ph = jnp.pi / 180.0
    w_g = -d * (t_col * t_col - t_col)

    j_re = jnp.stack(
        [b_re / safe_amp, -w_cs * b_im, w_lw * b_re, -w_ph * b_im, w_g * b_re],
        axis=2,
    )
    j_im = jnp.stack(
        [b_im / safe_amp, w_cs * b_re, w_lw * b_im, w_ph * b_re, w_g * b_im],
        axis=2,
    )
    return j_re, j_im  # (n_t, K, 5) each


@functools.lru_cache(maxsize=64)
def _scatter_matrix(pmap_static, n_free: int) -> np.ndarray:
    """Dense (K*5, F) matrix folding scale factors + free-slot routing.

    Turns the physical->free column reduction into a single matmul (MXU)
    instead of an XLA scatter, which is slow on TPU.
    """
    idx = np.asarray(pmap_static[0])
    scale = np.asarray(pmap_static[1])
    s = np.zeros((len(idx), n_free), dtype=np.float64)
    for j, (slot, sc) in enumerate(zip(idx, scale)):
        if slot >= 0:
            s[j, slot] += sc
    return s


def _fold_free_columns(flat, smat):
    """(n_t, K*5) physical-param columns -> (n_t, F) free columns (matmul)."""
    return jnp.matmul(flat, smat, preferred_element_type=flat.dtype)


# ---------------------------------------------------------------------------
# The batched LM driver
# ---------------------------------------------------------------------------


class LMResult(NamedTuple):
    x_free: jax.Array  # (B, F) final external free parameters
    cost: jax.Array  # (B,) final sum-of-squares
    n_iter: jax.Array  # (B,) accepted steps
    converged: jax.Array  # (B,) bool (finite cost + at least one accept)
    done: jax.Array  # (B,) bool (ftol convergence in the near-GN regime)


def _pmap_jax(pmap_static, dtype=None) -> ParamMap:
    return ParamMap(
        idx=jnp.asarray(pmap_static[0]),
        scale=jnp.asarray(pmap_static[1], dtype),
        offset=jnp.asarray(pmap_static[2], dtype),
        n_peaks=pmap_static[3],
    )


@functools.partial(jax.jit, static_argnames=("pmap_static", "max_iter", "mhz"))
def lm_fit_batched_planar(
    fids_re,  # (B, n_t) real
    fids_im,  # (B, n_t) real
    t,  # (n_t,) float
    u0,  # (F,) shared or (B, F) per-voxel initial internal params
    lower,
    upper,
    kind,
    pmap_static,  # hashable ParamMap tuple (see hashable_pmap)
    mhz: float,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
):
    """Run bounded LM on every row of the planar batch in one program."""
    real_dtype = fids_re.dtype
    pmap = _pmap_jax(pmap_static, real_dtype)
    t = t.astype(real_dtype)
    lower = lower.astype(real_dtype)
    upper = upper.astype(real_dtype)
    u0 = u0.astype(real_dtype)
    if u0.ndim == 1:
        u0 = jnp.broadcast_to(u0[None, :], (fids_re.shape[0], u0.shape[0]))
    n_free = u0.shape[-1]
    smat = jnp.asarray(_scatter_matrix(pmap_static, n_free), real_dtype)

    def solve_one(y_re, y_im, u_init):
        def evaluate(u):
            """Full state at u: bounded params, basis planes, model, cost."""
            x, dxdu, = internal_to_external_jax(u, lower, upper, kind)[:2]
            grid = expand_params(x, pmap)
            m_re, m_im, b_re, b_im = eq6_basis_planar(t, grid, mhz)
            cost = jnp.sum((y_re - m_re) ** 2 + (y_im - m_im) ** 2)
            return dict(
                u=u, dxdu=dxdu, grid=grid, m_re=m_re, m_im=m_im,
                b_re=b_re, b_im=b_im, cost=cost,
            )

        def cond(carry):
            st, lam, n_acc, streak, done, i = carry
            return (i < max_iter) & ~done

        def step(carry):
            st, lam, n_acc, streak, done, i = carry
            # Jacobian from the basis carried with the accepted state — one
            # transcendental-heavy basis evaluation per iteration total.
            j_re_p, j_im_p = eq6_jacobian_planar(
                t, st["grid"], st["b_re"], st["b_im"], mhz
            )
            j_re = _fold_free_columns(
                j_re_p.reshape(j_re_p.shape[0], -1), smat
            ) * st["dxdu"][None, :]
            j_im = _fold_free_columns(
                j_im_p.reshape(j_im_p.shape[0], -1), smat
            ) * st["dxdu"][None, :]

            r_re = y_re - st["m_re"]
            r_im = y_im - st["m_im"]

            # Normal equations: H = J_re^T J_re + J_im^T J_im (MXU matmuls)
            h = jnp.matmul(j_re.T, j_re, preferred_element_type=real_dtype)
            h = h + jnp.matmul(j_im.T, j_im, preferred_element_type=real_dtype)
            grad = j_re.T @ r_re + j_im.T @ r_im

            diag = jnp.diagonal(h)
            damped = h + lam * jnp.diag(jnp.maximum(diag, 1e-12)) + 1e-12 * jnp.eye(
                h.shape[0], dtype=h.dtype
            )
            chol = jnp.linalg.cholesky(damped)
            delta = jax.scipy.linalg.cho_solve((chol, True), grad)

            # Predicted-decrease exit (see the pallas driver): in the
            # near-GN regime a predicted relative decrease (~ g . delta)
            # at float resolution means the voxel is finished before the
            # trial.
            # Guard divisor must be representable in the working dtype:
            # 1e-300 underflows to 0.0 in float32 and a perfectly fit
            # all-zero voxel would produce 0/0 = NaN, fail every done
            # comparison, and burn the whole max_iter budget.
            eps_p = jnp.finfo(real_dtype).eps
            tiny = jnp.asarray(jnp.finfo(real_dtype).tiny, real_dtype)
            solve_ok = jnp.all(jnp.isfinite(delta))
            delta = jnp.where(solve_ok, delta, 0.0)
            pred_rel = jnp.dot(grad, delta) / jnp.maximum(st["cost"], tiny)
            # pred_rel >= 0 excludes the finite-yet-negative case (an f32
            # ascent direction from a near-indefinite damped solve) from
            # reading as convergence.
            done = done | (
                (pred_rel >= 0.0) & (pred_rel <= 64.0 * eps_p)
                & (lam < lam0) & solve_ok
            )

            trial = evaluate(st["u"] + delta)
            # Gate on ~done so a voxel retired by the predicted-decrease
            # exit discards this trial — matching the pallas driver, whose
            # tile mask drops the evaluation entirely.
            ok = (
                jnp.isfinite(trial["cost"])
                & (trial["cost"] < st["cost"])
                & ~done
            )
            rel_drop = (st["cost"] - trial["cost"]) / jnp.maximum(st["cost"], tiny)

            st_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), trial, st
            )
            lam = jnp.clip(jnp.where(ok, lam * 0.33, lam * 2.5), 1e-12, 1e12)
            n_acc = n_acc + ok.astype(jnp.int32)
            # Converged when (a) an accepted step's improvement vanishes in
            # the near-Gauss-Newton regime (small damping — a tiny drop under
            # heavy damping just means the trust region is small), or (b)
            # three consecutive rejected trials whose cost change sits at
            # float resolution: at the optimum every trial lands back on the
            # same cost (classic LM exit-by-rejection, which the accept-only
            # test never detects — without it the loop always burns the full
            # max_iter budget).  An overshooting rejection has a LARGE cost
            # change and does not count toward the plateau.
            eps = jnp.finfo(real_dtype).eps
            plateau = ~ok & (jnp.abs(rel_drop) <= 64.0 * eps)
            streak = jnp.where(plateau, streak + 1, 0)
            done = done | (ok & (rel_drop < ftol) & (lam < lam0)) | (streak >= 3)
            return (st_new, lam, n_acc, streak, done, i + 1)

        st0 = evaluate(u_init)
        carry = (
            st0,
            jnp.asarray(lam0, real_dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        st, _, n_acc, _, done, _ = jax.lax.while_loop(cond, step, carry)
        x_final, _ = internal_to_external_jax(st["u"], lower, upper, kind)
        # A voxel that STARTS at its optimum (e.g. template-seeded) accepts
        # zero steps and exits via the rejection plateau: that is success,
        # not failure — count plateau-done voxels as converged.
        converged = jnp.isfinite(st["cost"]) & ((n_acc > 0) | done)
        return x_final, st["cost"], n_acc, converged, done

    x, cost, n_iter, conv, done = jax.vmap(solve_one)(fids_re, fids_im, u0)
    return LMResult(x_free=x, cost=cost, n_iter=n_iter, converged=conv, done=done)


def lm_fit_batched(
    fids,  # (B, n_t) complex (host or device)
    t,
    u0,
    lower,
    upper,
    kind,
    pmap_static,
    mhz: float,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
):
    """Complex-input convenience wrapper: splits planes on the host and runs
    the planar core (keeps complex dtypes off the device)."""
    f = np.asarray(fids)
    re = jnp.asarray(np.ascontiguousarray(f.real))
    im = jnp.asarray(np.ascontiguousarray(f.imag))
    return lm_fit_batched_planar(
        re, im, t, u0, lower, upper, kind, pmap_static, mhz,
        max_iter=max_iter, lam0=lam0, ftol=ftol,
    )


def hashable_pmap(pmap: ParamMap):
    """ParamMap as a hashable static argument for jit."""
    return (
        tuple(int(v) for v in pmap.idx),
        tuple(float(v) for v in pmap.scale),
        tuple(float(v) for v in pmap.offset),
        int(pmap.n_peaks),
    )


# ---------------------------------------------------------------------------
# CRLB from the Fisher information at the optimum
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pmap_static", "mhz"))
def crlb_batched_planar(fids_re, fids_im, t, x_free, pmap_static, mhz: float):
    """Cramer-Rao lower bounds (standard deviations) of the free parameters.

    sigma^2 comes from the final residuals (per real channel); the covariance
    is ``sigma^2 * (J_re^T J_re + J_im^T J_im)^-1`` at the optimum — the
    standard AMARES CRLB with an identity prior matrix, computed in
    *external* parameter space (no bound-transform Jacobian involved).
    """
    real_dtype = fids_re.dtype
    pmap = _pmap_jax(pmap_static, real_dtype)
    t = t.astype(real_dtype)
    x_free = x_free.astype(real_dtype)
    n_free = x_free.shape[-1]
    smat = jnp.asarray(_scatter_matrix(pmap_static, n_free), real_dtype)

    def one(y_re, y_im, x):
        grid = expand_params(x, pmap)
        m_re, m_im, b_re, b_im = eq6_basis_planar(t, grid, mhz)
        j_re_p, j_im_p = eq6_jacobian_planar(t, grid, b_re, b_im, mhz)
        j_re = _fold_free_columns(j_re_p.reshape(j_re_p.shape[0], -1), smat)
        j_im = _fold_free_columns(j_im_p.reshape(j_im_p.shape[0], -1), smat)

        r2 = jnp.sum((y_re - m_re) ** 2 + (y_im - m_im) ** 2)
        dof = jnp.maximum(2.0 * t.shape[0] - n_free, 1.0)
        sigma2 = r2 / dof

        h = j_re.T @ j_re + j_im.T @ j_im
        cov = sigma2 * jnp.linalg.inv(h + 1e-12 * jnp.eye(n_free, dtype=h.dtype))
        return jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 0.0)), sigma2

    sds, sigma2 = jax.vmap(one)(fids_re, fids_im, x_free)
    return sds, sigma2


def crlb_batched(fids, t, x_free, pmap_static, mhz: float):
    """Complex-input wrapper over :func:`crlb_batched_planar`."""
    f = np.asarray(fids)
    re = jnp.asarray(np.ascontiguousarray(f.real))
    im = jnp.asarray(np.ascontiguousarray(f.imag))
    return crlb_batched_planar(re, im, t, x_free, pmap_static, mhz)


# Backwards-compatible aliases for the complex-facing model helpers used by
# the simulator path (CPU-side only).
def eq6_model_and_basis(t, grid, mhz: float):
    """Complex model + basis (host/CPU convenience; device code uses planar)."""
    m_re, m_im, b_re, b_im = eq6_basis_planar(t, grid, mhz)
    return m_re + 1j * m_im, b_re + 1j * b_im


# ---------------------------------------------------------------------------
# Pallas-accelerated LM driver (TPU hot path)
# ---------------------------------------------------------------------------


def _expand_params_batched(x, pmap_static, dtype):
    """(B, F) free vectors -> (B, K*5) physical grids (traced, batched)."""
    idx = jnp.asarray(pmap_static[0])
    scale = jnp.asarray(pmap_static[1], dtype)
    offset = jnp.asarray(pmap_static[2], dtype)
    safe_idx = jnp.maximum(idx, 0)
    gathered = x[:, safe_idx]
    return offset[None, :] + jnp.where(idx[None, :] >= 0, scale[None, :] * gathered, 0.0)


def active_param_rows(pmap_static) -> tuple[int, ...]:
    """Flat physical-parameter indices with a nonzero scatter-matrix row
    (free or tied) — the Jacobian rows the active-rows kernels compute."""
    return tuple(int(j) for j, ix in enumerate(pmap_static[0]) if ix >= 0)


def lorentzian_env_flags(pmap_static) -> tuple[bool, ...]:
    """Per-peak flags: g fixed at exactly 0 (purely Lorentzian), enabling
    the v7 kernel's block-factored envelope for that peak."""
    idx, _, offset, n_peaks = pmap_static
    return tuple(
        idx[k * 5 + 4] < 0 and float(offset[k * 5 + 4]) == 0.0
        for k in range(n_peaks)
    )


@functools.lru_cache(maxsize=64)
def varpro_plan(pmap_static):
    """Trace-time plan for the VARPRO linear re-solve (see
    :func:`_varpro_override`): the peaks whose amplitude AND phase are both
    free and UNTIED (their free slot is referenced by exactly one physical
    parameter), for which the model is exactly linear in the complex
    amplitude ``c_k = a_k e^{i phi_k}``.

    Returns ``None`` when no peak qualifies, else a dict of numpy arrays:
    ``sa``/``sp`` (free-slot indices of amp/phase), ``scale_a``/``offset_a``
    and ``scale_p``/``offset_p`` (free->physical affine maps).
    """
    idx, scale, offset, n_peaks = pmap_static
    counts: dict[int, int] = {}
    for s in idx:
        if s >= 0:
            counts[int(s)] = counts.get(int(s), 0) + 1
    rows = []
    for k in range(n_peaks):
        ja, jp = 5 * k, 5 * k + 3
        sa, sp = int(idx[ja]), int(idx[jp])
        if sa < 0 or sp < 0 or sa == sp:
            continue
        if counts[sa] != 1 or counts[sp] != 1:
            continue
        if float(scale[ja]) == 0.0 or float(scale[jp]) == 0.0:
            continue
        rows.append(
            (sa, sp, float(scale[ja]), float(offset[ja]),
             float(scale[jp]), float(offset[jp]))
        )
    if not rows:
        return None
    arr = np.asarray(rows, np.float64)
    return {
        "sa": arr[:, 0].astype(np.int32),
        "sp": arr[:, 1].astype(np.int32),
        "scale_a": arr[:, 2], "offset_a": arr[:, 3],
        "scale_p": arr[:, 4], "offset_p": arr[:, 5],
    }


def uses_slab_hessian(spd_pallas: bool, kernel_version: int) -> bool:
    """THE slab-mode rule, shared by the LM driver and the fused seeded
    path (``amares.seeded_fit_grid_raw``) so the two cannot drift: the
    Hessian stays in the v9 moment kernel's native column-slab layout
    exactly when the Pallas SPD solve consumes it."""
    return spd_pallas and kernel_version == 9


def auto_varpro(pmap_static) -> bool:
    """The shared auto-enable rule for the Kaufman VARPRO override: on
    exactly when the prior fits a lineshape-mixing fraction (any free g —
    the slow-converging case) AND some amplitude/phase pair qualifies for
    the linear re-solve (:func:`varpro_plan`).  Used by both the public
    driver wrapper and the fused grid path (``amares.seeded_fit_grid_raw``)
    so the two cannot drift."""
    idx = pmap_static[0]
    has_free_g = any(
        idx[k * 5 + 4] >= 0 for k in range(pmap_static[3])
    )
    return has_free_g and varpro_plan(pmap_static) is not None


def _varpro_override(u_t, u, g, h, lam, lower, upper, kind, plan, lam0,
                     slab_meta=None):
    """Kaufman-style variable-projection step: override the trial's
    amplitude/phase slots with the EXACT linear optimum recovered from the
    carried normal equations — zero extra kernel work.

    With frequencies/linewidths/g momentarily frozen, Eq.6 is linear in
    each untied complex amplitude ``c_k = a_k e^{i phi_k}``, so the LS
    optimum over those families solves a tiny per-voxel Hermitian system.
    Both the Gram ``Z_kl = <e^{i phi_k} P_k, e^{i phi_l} P_l>`` (``P_k`` =
    unit-amplitude zero-phase basis) and the residual projections are
    already inside the carried Gauss-Newton ``h``/``g`` at the accepted
    point: with ``row_a(k) = m_a e^{i phi_k} P_k`` and ``row_p(k) =
    m_p i c_k P_k`` (``m_*`` = scale * dx/du bound-transform factors),

      h[sa_k, sa_l] = m_a(k) m_a(l) Re Z_kl
      h[sa_k, sp_l] = -m_a(k) m_p(l) a_l Im Z_kl
      g[sa_k] = m_a Re v_k,  g[sp_k] = m_p a_k Im v_k,  v_k = <e^{i phi_k} P_k, r>

    Solving ``Z c' = v + Z a`` (phase-relative coordinates) yields the new
    amplitudes ``|c'|`` and phase corrections ``arg(c')`` directly — the
    Gram never needs de-rotating.  The linear families are thus optimal
    w.r.t. the PREVIOUS linearization while the nonlinear LM step moves
    cs/lw/g (Kaufman's approximation); at full convergence the reached
    optimum is equal or better per voxel (pinned by
    tests/test_lm_pallas.py::TestVarpro).  The reference has no analog —
    pyAMARES iterates
    all 5 families jointly (``/root/reference/src/xmris/fitting/amares.py:74-81``).

    Per-voxel fallbacks (keep the plain LM trial): non-finite solve, any
    amplitude below 1e-5 or pinned-at-bound transform factor (the Im
    recovery divides by ``m_p a``), or ``lam > 10 * lam0`` (a voxel stuck
    rejecting falls back to undamped-free LM semantics).

    ``slab_meta=f_pad`` accepts ``h`` in the kernel-native slab layout
    ``(n_tiles, f_pad·f_pad, v_tile)``: the S² Gram entries the re-solve
    needs come straight off STATIC slab rows (``sa[k]·f_pad + sa[l]``) —
    no (B, F, F) materialization, so slab mode carries free-g/VARPRO
    fits too.
    """
    from xmris_tpu.ops.kernels.spd import spd_solve_small

    real_dtype = u.dtype
    sa = jnp.asarray(plan["sa"])
    sp = jnp.asarray(plan["sp"])
    scale_a = jnp.asarray(plan["scale_a"], real_dtype)
    offset_a = jnp.asarray(plan["offset_a"], real_dtype)
    scale_p = jnp.asarray(plan["scale_p"], real_dtype)
    offset_p = jnp.asarray(plan["offset_p"], real_dtype)

    x, dxdu = internal_to_external_jax(
        u, lower[None, :], upper[None, :], kind[None, :]
    )
    a = offset_a[None, :] + scale_a[None, :] * x[:, sa]  # (B, S) amplitudes
    m_a = scale_a[None, :] * dxdu[:, sa]
    m_p = scale_p[None, :] * dxdu[:, sp] * (jnp.pi / 180.0)
    mpa = m_p * a

    s = sa.shape[0]
    if slab_meta is None:
        h_aa = h[:, sa[:, None], sa[None, :]]
        h_ap = h[:, sa[:, None], sp[None, :]]
    else:
        f_pad = int(slab_meta)
        n_tiles, _, v_tile = h.shape
        b = u.shape[0]
        sa_np = [int(v) for v in plan["sa"]]
        sp_np = [int(v) for v in plan["sp"]]

        def slab_entries(pairs):
            rows = jnp.stack(
                [h[:, i * f_pad + j, :] for (i, j) in pairs], axis=1
            )  # (n_tiles, S*S, v_tile)
            return (
                rows.transpose(0, 2, 1)
                .reshape(n_tiles * v_tile, len(pairs))[:b]
                .reshape(b, s, s)
            )

        h_aa = slab_entries([(i, j) for i in sa_np for j in sa_np])
        h_ap = slab_entries([(i, j) for i in sa_np for j in sp_np])
    re_z = h_aa / (m_a[:, :, None] * m_a[:, None, :])
    im_z = -h_ap / (m_a[:, :, None] * mpa[:, None, :])
    # Hermitian symmetrization kills f32 recovery noise (Im Z diag is 0
    # in exact arithmetic).
    re_z = 0.5 * (re_z + jnp.swapaxes(re_z, 1, 2))
    im_z = 0.5 * (im_z - jnp.swapaxes(im_z, 1, 2))

    v_re = g[:, sa] / m_a
    v_im = g[:, sp] / mpa
    n_re = v_re + jnp.einsum("bkl,bl->bk", re_z, a)
    n_im = v_im + jnp.einsum("bkl,bl->bk", im_z, a)

    ridge = (1e-6 / s) * jnp.trace(re_z, axis1=1, axis2=2)
    eye2 = jnp.eye(2 * s, dtype=real_dtype)
    top = jnp.concatenate([re_z, -im_z], axis=2)
    bot = jnp.concatenate([im_z, re_z], axis=2)
    block = jnp.concatenate([top, bot], axis=1)
    block = block + ridge[:, None, None] * eye2[None, :, :]
    rhs = jnp.concatenate([n_re, n_im], axis=1)
    sol = spd_solve_small(block, rhs)
    cr, ci = sol[:, :s], sol[:, s:]

    amp_new = jnp.sqrt(cr * cr + ci * ci)
    dphi = jnp.arctan2(ci, cr) * (180.0 / jnp.pi)
    ph_new = offset_p[None, :] + scale_p[None, :] * x[:, sp] + dphi
    xp_new = (ph_new - offset_p[None, :]) / scale_p[None, :]
    # Phase is periodic: map the free-space value into the 360-degree
    # window centred on the bound interval (or, for unbounded phases, on
    # the current value) — otherwise an optimum just past a bound edge
    # (e.g. 210 with bounds (-180, 180), equivalent to -150) would be
    # CLIPPED at the edge by the bound transform instead of reached.
    period = 360.0 / jnp.abs(scale_p)[None, :]
    lo_p, hi_p = lower[sp][None, :], upper[sp][None, :]
    center = jnp.where(
        jnp.isfinite(lo_p) & jnp.isfinite(hi_p),
        0.5 * (lo_p + hi_p),
        x[:, sp],
    )
    xp_new = center + jnp.remainder(
        xp_new - center + 0.5 * period, period
    ) - 0.5 * period
    x_new = x.at[:, sa].set((amp_new - offset_a[None, :]) / scale_a[None, :])
    x_new = x_new.at[:, sp].set(xp_new)
    u_new = external_to_internal_jax(
        x_new, lower[None, :], upper[None, :], kind[None, :]
    )

    ok = (
        jnp.all(jnp.isfinite(sol), axis=1)
        & jnp.all(a > 1e-5, axis=1)
        & jnp.all(jnp.abs(m_a) > 1e-10, axis=1)
        & jnp.all(jnp.abs(mpa) > 1e-10, axis=1)
        & (lam <= 10.0 * lam0)
    )
    okc = ok[:, None]
    u_t = u_t.at[:, sa].set(jnp.where(okc, u_new[:, sa], u_t[:, sa]))
    u_t = u_t.at[:, sp].set(jnp.where(okc, u_new[:, sp], u_t[:, sp]))
    return u_t


def _select_pallas_kernel(
    kernel_version: int, pmap_static, n_t: int, factored_ok: bool = False
):
    """Resolve a kernel_version to (callable, active rows, default v_tile).

    5/6/7 are active-rows kernels: fixed params' Jacobian rows (zero rows
    of the scatter matrix) are never computed or contracted.  6 adds
    stacked-voxel MXU Gram dots + converged-tile skipping; 7 adds the
    block-factored transcendental basis (requires n_t % 128 == 0 and
    uniform t — every fit_amares time axis qualifies; falls back to 6).
    8 is the moment-based formulation for purely Lorentzian priors
    (falls back to 6 otherwise); its per-program work is small enough
    that larger tiles amortize the fixed grid cost (measured end-to-end:
    v_tile 64 = 41.0 ms, 32 = 42.4, 8 = 50.4), so it carries default
    v_tile 64 while
    the Jacobian-materializing kernels keep 8 (their VMEM scratch scales
    with the tile and larger tiles measured no better).
    9 (the default) generalizes the moment formulation to EVERY Eq.6
    prior (Voigt / free-g included — coefficient polynomials up to t^2,
    moments up to t^4) and adds accept gating: rejected LM trials skip
    the moment/H/g work per tile (the driver only consumes their cost).
    """
    from xmris_tpu.ops.kernels.lm_pallas import (
        eq6_normal_equations_pallas,
        eq6_normal_equations_pallas_v2,
        eq6_normal_equations_pallas_v3,
        eq6_normal_equations_pallas_v5,
        eq6_normal_equations_pallas_v6,
        eq6_normal_equations_pallas_v7,
        eq6_normal_equations_pallas_v8,
        eq6_normal_equations_pallas_v9,
    )

    if kernel_version >= 10:
        # v10 is the whole-loop kernel; per-evaluation callers (CRLB
        # recompute) use its v9 evaluation core.
        kernel_version = 9

    if kernel_version == 9:
        # v_tile 128 measured best for the moment kernels (33.0 ms vs
        # 37.3 at 64 on the 5-peak bench fit — fewer programs amortize the
        # fixed per-launch grid cost; VMEM per tile stays small because
        # nothing (V, n_t)-sized beyond the basis is materialized).
        active = active_param_rows(pmap_static)
        return (
            functools.partial(
                eq6_normal_equations_pallas_v9,
                active=active,
                g_zero=lorentzian_env_flags(pmap_static),
                factored_t=factored_ok and n_t % 128 == 0,
            ),
            active,
            128,
        )

    if kernel_version == 8:
        # Moment-based H: valid only for purely Lorentzian priors (every
        # g fixed at 0); anything else falls back to v6.
        active = active_param_rows(pmap_static)
        if all(lorentzian_env_flags(pmap_static)):
            return (
                functools.partial(
                    eq6_normal_equations_pallas_v8, active=active
                ),
                active,
                64,
            )
        return (
            functools.partial(eq6_normal_equations_pallas_v6, active=active),
            active,
            8,
        )

    if kernel_version not in (5, 6, 7):
        legacy = {
            1: eq6_normal_equations_pallas,
            2: eq6_normal_equations_pallas_v2,
            3: eq6_normal_equations_pallas_v3,
        }
        if kernel_version not in legacy:
            raise ValueError(
                f"kernel_version={kernel_version!r} does not exist; "
                "valid versions are 1-3 and 5-10 (9 is the default)"
            )
        return (legacy[kernel_version], None, 8)

    active = active_param_rows(pmap_static)
    if kernel_version == 7 and n_t % 128 == 0:
        return (
            functools.partial(
                eq6_normal_equations_pallas_v7,
                active=active,
                env_fast=lorentzian_env_flags(pmap_static),
            ),
            active,
            8,
        )
    if kernel_version >= 6:
        return (
            functools.partial(eq6_normal_equations_pallas_v6, active=active),
            active,
            8,
        )
    return (
        functools.partial(eq6_normal_equations_pallas_v5, active=active),
        active,
        8,
    )


def _check_uniform_t_v7(t, require_uniform_t: bool) -> None:
    """Hard guard for the v7 kernel's uniform-sampling precondition.

    v7's block-factored basis assumes ``t[q*128 + r] = t[r] + t_q``; a
    non-uniform axis silently computes wrong Jacobians.  Concrete axes are
    validated here (eagerly, before tracing erases the values); a traced
    axis cannot be checked and must be explicitly vouched for with
    ``require_uniform_t=True``.
    """
    if isinstance(t, jax.core.Tracer):
        if not require_uniform_t:
            raise ValueError(
                "kernel_version=7 requires a uniformly sampled time axis, "
                "but t is traced and cannot be validated. Pass "
                "require_uniform_t=True to assert uniformity, or use "
                "kernel_version=6/8."
            )
        return
    if not _t_is_uniform(t):
        raise ValueError(
            "kernel_version=7 requires a uniformly sampled time axis; "
            "got non-uniform spacing. Use kernel_version=6/8 instead."
        )


def _t_is_uniform(t) -> bool:
    """Eager uniformity test of a CONCRETE time axis, with tolerance
    scaled to the axis dtype (a float32 uniform axis carries ~eps*max|t|
    quantization per sample, so adjacent diffs wobble by up to ~2x that
    even when genuinely uniform)."""
    eps = float(np.finfo(getattr(t, "dtype", np.float64)).eps)
    t_np = np.asarray(t, dtype=np.float64)
    if t_np.size < 3:
        return True
    dt = np.diff(t_np)
    tol = 16.0 * eps * max(float(np.max(np.abs(t_np))), 1e-30)
    return float(np.max(np.abs(dt - dt[0]))) <= tol


def lm_fit_batched_pallas(
    fids_re,
    fids_im,
    t,
    u0,
    lower,
    upper,
    kind,
    pmap_static,
    mhz: float,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
    v_tile: int | None = None,
    interpret: bool = False,
    kernel_version: int = 9,
    return_hessian: bool = False,
    require_uniform_t: bool = False,
    gate_rejects: bool = False,
    plateau_streak: int = 3,
    varpro: bool | None = None,
    spd_pallas: bool = True,
):
    """Public entry: validates v7's uniform-t precondition eagerly, then
    dispatches to the jitted implementation (see
    :func:`_lm_fit_batched_pallas_impl` for the full docstring).

    ``varpro=None`` (auto) enables the Kaufman variable-projection
    override (:func:`_varpro_override`) exactly when the prior fits a
    lineshape-mixing fraction (any free g) — the slow-converging case it
    was built for; fixed-g fits already retire in ~2 accepted steps from
    the linear LS seed and measured neutral with it.  Pass True/False to
    force.

    ``gate_rejects=True`` enables v9's per-tile accept gate (rejected
    trials skip the moment/H/g work).  Measured SLOWER on v5e at bench
    conditions — the dynamic ``pl.when`` serializes more than the skipped
    work saves — so it defaults off; kept for non-seeded workloads with
    long rejection phases.

    ``kernel_version=10`` fuses the ENTIRE LM loop into one kernel launch
    (see :func:`xmris_tpu.ops.kernels.lm_pallas.lm_loop_pallas_v10`);
    configurations that need driver-side per-iteration work (the VARPRO
    override, ``gate_rejects``) transparently fall back to the v9 launch
    loop.  Measured SLOWER than the default on v5e (81.9 vs 22.4 ms at
    bench scale, results/tpu_r6.jsonl) at bit-identical parameters: the
    relay dispatch floor is per jitted program, not per launch inside
    it, so the fused loop only stood to save XLA glue while its
    in-kernel per-trip overhead costs ~3x the evaluation itself.
    """
    # Only guard when v7 will actually run: on n_t % 128 != 0 the selector
    # falls back to v6, which has no uniformity precondition.
    if kernel_version == 7 and fids_re.shape[-1] % 128 == 0:
        _check_uniform_t_v7(t, require_uniform_t)
    # v9's block-factored basis has the same uniform-t precondition but
    # falls back to the direct basis instead of raising: enable it when
    # the axis is vouched for (require_uniform_t) or concretely uniform.
    uniform_t_ok = require_uniform_t or (
        not isinstance(t, jax.core.Tracer) and _t_is_uniform(t)
    )
    if varpro is None:
        varpro = auto_varpro(pmap_static)
    else:
        varpro = bool(varpro) and varpro_plan(pmap_static) is not None
    return _lm_fit_batched_pallas_impl(
        fids_re, fids_im, t, u0, lower, upper, kind, pmap_static, mhz,
        max_iter=max_iter, lam0=lam0, ftol=ftol, v_tile=v_tile,
        interpret=interpret, kernel_version=kernel_version,
        return_hessian=return_hessian, gate_rejects=gate_rejects,
        uniform_t_ok=uniform_t_ok, plateau_streak=plateau_streak,
        varpro=varpro, spd_pallas=spd_pallas,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pmap_static", "max_iter", "mhz", "v_tile", "interpret",
        "kernel_version", "return_hessian", "gate_rejects", "uniform_t_ok",
        "plateau_streak", "varpro", "spd_pallas",
    ),
)
def _lm_fit_batched_pallas_impl(
    fids_re,
    fids_im,
    t,
    u0,
    lower,
    upper,
    kind,
    pmap_static,
    mhz: float,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
    v_tile: int | None = None,
    interpret: bool = False,
    kernel_version: int = 9,
    return_hessian: bool = False,
    gate_rejects: bool = False,
    uniform_t_ok: bool = False,
    plateau_streak: int = 3,
    varpro: bool = False,
    spd_pallas: bool = True,
):
    """Bounded LM with the fused Pallas normal-equations kernel.

    One kernel evaluation per iteration for the whole batch: the kernel
    returns (cost, g, H) at the trial point; rejected steps reuse the carried
    accepted-state H/g and only re-damp, so no extra model evaluations are
    spent on failed steps.  Semantics match :func:`lm_fit_batched_planar`.

    With ``return_hessian=True`` returns ``(LMResult, h_ext)`` where
    ``h_ext`` is the (B, F, F) Gauss-Newton Hessian at the optimum in
    EXTERNAL free-parameter space — the Fisher information the CRLB pass
    needs, recovered from the loop's carried state for free (the carried H
    is the external one scaled by the bound-transform diagonal, which we
    divide back out).
    """
    # The whole-loop kernel replaces the jit-level while loop outright; the
    # VARPRO override and the accept gate are launch-loop concepts, so
    # either one falls back to the per-iteration v9 path.
    whole_loop = kernel_version >= 10 and not varpro and not gate_rejects
    if kernel_version >= 10 and not whole_loop:
        kernel_version = 9
    kernel_fn, active, vt_default = _select_pallas_kernel(
        kernel_version, pmap_static, fids_re.shape[-1],
        factored_ok=uniform_t_ok,
    )
    if v_tile is None:
        v_tile = vt_default

    real_dtype = jnp.float32  # the kernel is float32
    fids_re = fids_re.astype(real_dtype)
    fids_im = fids_im.astype(real_dtype)
    t = t.astype(real_dtype)
    lower = lower.astype(real_dtype)
    upper = upper.astype(real_dtype)
    u0 = u0.astype(real_dtype)
    b = fids_re.shape[0]
    if u0.ndim == 1:
        u0 = jnp.broadcast_to(u0[None, :], (b, u0.shape[0]))
    n_free = u0.shape[-1]

    if whole_loop:
        if return_hessian == "slab":
            raise ValueError(
                "return_hessian='slab' requires the per-iteration v9 path"
            )
        from xmris_tpu.ops.kernels.lm_pallas import lm_loop_pallas_v10

        active = active_param_rows(pmap_static)
        u, cost, n_acc, done, h_fin = lm_loop_pallas_v10(
            u0, fids_re, fids_im, t, lower, upper, kind,
            n_peaks=pmap_static[3],
            mhz=mhz,
            active=active,
            g_zero=lorentzian_env_flags(pmap_static),
            n_free=n_free,
            fold_slots=tuple(int(pmap_static[0][j]) for j in active),
            fold_scales=tuple(float(pmap_static[1][j]) for j in active),
            pmap_idx=tuple(int(v) for v in pmap_static[0]),
            pmap_scale=tuple(float(v) for v in pmap_static[1]),
            pmap_offset=tuple(float(v) for v in pmap_static[2]),
            max_iter=max_iter,
            lam0=lam0,
            ftol=ftol,
            plateau_streak=plateau_streak,
            v_tile=v_tile,
            interpret=interpret,
            factored_t=uniform_t_ok and fids_re.shape[-1] % 128 == 0,
        )
        return _pallas_result_tail(
            u, cost, n_acc, done, h_fin, lower, upper, kind, return_hessian
        )
    n_peaks = pmap_static[3]
    smat_np = _scatter_matrix(pmap_static, n_free)
    if active is not None:
        smat_np = smat_np[list(active), :]
    smat = jnp.asarray(smat_np, real_dtype)

    if kernel_version >= 9:
        # Free-space fold inside the kernel: per-active-row free slot +
        # scatter scale; the bound-transform diagonal rides in as dxdu.
        fold_slots = tuple(int(pmap_static[0][j]) for j in active)
        fold_scales = tuple(float(pmap_static[1][j]) for j in active)
    vp_plan = varpro_plan(pmap_static) if varpro else None

    # Slab mode: keep H in the moment kernel's native (n_tiles, a_pad²,
    # v_tile) column-slab layout through the WHOLE loop — the Pallas SPD
    # solve consumes it directly, so the (B, F, F) materialization and
    # spd's re-tiling (two full-tensor HBM relayouts per LM iteration)
    # both disappear.  The VARPRO override reads its S² Gram entries off
    # static slab rows, so free-g fits ride the slab too.
    slab_mode = uses_slab_hessian(spd_pallas, kernel_version)
    if return_hessian == "slab" and not slab_mode:
        raise ValueError(
            "return_hessian='slab' requires the slab-mode path "
            "(spd_pallas=True, kernel_version=9)"
        )
    a_pad = -(-n_free // 8) * 8
    b_pad = -(-b // v_tile) * v_tile
    n_tiles = b_pad // v_tile

    def full_eval(u, voxel_mask=None, cost_prev=None):
        x, dxdu = internal_to_external_jax(u, lower[None, :], upper[None, :],
                                           kind[None, :])
        grids = _expand_params_batched(x, pmap_static, real_dtype)
        extra = (
            {"voxel_mask": voxel_mask} if kernel_version >= 6 else {}
        )
        if kernel_version >= 9:
            if gate_rejects:
                # Accept gate: tiles where no voxel improves on its
                # previous accepted cost skip the moment/H/g work (the
                # driver discards rejected trials' H/g anyway).  Opt-in:
                # measured slower at bench conditions (see the public
                # wrapper's docstring).
                extra["cost_prev"] = cost_prev
            # The kernel emits the FREE-parameter system directly — no
            # per-iteration batched einsums over HBM.
            return kernel_fn(
                grids, fids_re, fids_im, t,
                n_peaks=n_peaks, mhz=mhz, v_tile=v_tile,
                interpret=interpret,
                fold_slots=fold_slots, fold_scales=fold_scales,
                n_free=n_free, dxdu=dxdu, slab_h=slab_mode,
                **extra,
            )
        cost, g_phys, h_phys = kernel_fn(
            grids, fids_re, fids_im, t,
            n_peaks=n_peaks, mhz=mhz, v_tile=v_tile, interpret=interpret,
            **extra,
        )
        g = jnp.einsum("bp,pf->bf", g_phys, smat) * dxdu
        h = jnp.einsum("pf,bpq,qh->bfh", smat, h_phys, smat)
        h = h * dxdu[:, :, None] * dxdu[:, None, :]
        return cost, g, h

    def cond(carry):
        _, _, _, _, _, _, _, done, i = carry
        return (i < max_iter) & ~jnp.all(done)

    def step(carry):
        u, cost, g, h, lam, n_acc, streak, done, i = carry
        if slab_mode:
            # H never leaves the kernel-native slab layout: the moment
            # kernel emitted it as (n_tiles, a_pad², v_tile) column slabs
            # and the SPD solve reads that form directly — no (B, F, F)
            # materialization, no re-tiling (two full-tensor HBM
            # relayouts per iteration in the r10 trace's `copy` rows).
            from xmris_tpu.ops.kernels.spd import (
                spd_solve_damped_pallas_slab,
            )

            delta_raw = spd_solve_damped_pallas_slab(
                h, g, lam, f=n_free, f_pad=a_pad, interpret=interpret
            )
        elif spd_pallas:
            # Damping + Cholesky + both substitutions in ONE VMEM-resident
            # Pallas launch (voxels on lanes; see ops/kernels/spd.py).  The
            # unrolled XLA form re-materializes the (B, F, F) tensor through
            # HBM on every rank-1 update — measured ~1.9 ms/LM-iteration at
            # bench scale (r9 fused-program trace), vs one read + one write
            # here.
            from xmris_tpu.ops.kernels.spd import spd_solve_damped_pallas

            delta_raw = spd_solve_damped_pallas(
                h, g, lam, interpret=interpret
            )
        else:
            diag = jnp.diagonal(h, axis1=1, axis2=2)
            damped = h + (
                lam[:, None, None] * jnp.maximum(diag, 1e-12)[:, None, :]
                * jnp.eye(n_free, dtype=real_dtype)[None, :, :]
            ) + 1e-12 * jnp.eye(n_free, dtype=real_dtype)[None, :, :]
            # Unrolled tiny-SPD solve: XLA's batched cholesky dominates the
            # whole LM iteration on TPU (see ops/kernels/spd.py).
            from xmris_tpu.ops.kernels.spd import spd_solve_small

            delta_raw = spd_solve_small(damped, g)
        solve_ok = jnp.all(jnp.isfinite(delta_raw), axis=-1)
        delta = jnp.where(solve_ok[:, None], delta_raw, 0.0)
        u_t = u + delta
        if vp_plan is not None:
            # Kaufman VARPRO: the trial's amplitude/phase slots jump to
            # the exact linear optimum of the carried linearization while
            # the LM delta moves cs/lw/g (see _varpro_override).
            u_t = _varpro_override(
                u_t, u, g, h, lam, lower, upper, kind, vp_plan, lam0,
                slab_meta=a_pad if slab_mode else None,
            )

        # Predicted-decrease exit: for the GN model cost(u+d) ~= cost -
        # 2 g.d + d.H d with (H + lam D) d = g, the predicted decrease is
        # g.d + lam d.D d >= g.d.  In the near-GN regime (small lam — a
        # damped-short step predicts little by construction), a predicted
        # RELATIVE decrease at f32 resolution means further iteration
        # cannot improve the fit: mark done BEFORE paying the kernel call
        # for the trial.  This retires stragglers ~3 iterations earlier
        # than the rejection-plateau path (3 consecutive no-op trials).
        # Gated on a finite solve: a transiently failed f32 Cholesky
        # zeroes delta, and the zero step must fall through to the
        # reject/re-damp path, not read as convergence.
        eps = jnp.finfo(real_dtype).eps
        pred_rel = jnp.einsum("bf,bf->b", g, delta) / jnp.maximum(
            cost, 1e-30
        )
        # pred_rel >= 0 excludes a finite-yet-negative prediction (f32
        # ascent direction from a near-indefinite damped solve) from
        # reading as convergence; such a step falls through to the
        # reject/re-damp path instead.
        done = done | (
            (pred_rel >= 0.0) & (pred_rel <= 64.0 * eps)
            & (lam < lam0) & solve_ok
        )

        # v6 skips tiles whose 8 voxels are all converged: their (stale)
        # outputs are filtered below because ``ok`` is gated on ``~done``.
        cost_t, g_t, h_t = full_eval(u_t, voxel_mask=~done, cost_prev=cost)
        ok = jnp.isfinite(cost_t) & (cost_t < cost) & ~done
        rel_drop = (cost - cost_t) / jnp.maximum(cost, 1e-30)

        sel = lambda new, old: jnp.where(
            ok.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        u = sel(u_t, u)
        cost = jnp.where(ok, cost_t, cost)
        g = sel(g_t, g)
        if slab_mode:
            # Voxels sit on LANES in the slab: the accept mask broadcasts
            # as (n_tiles, 1, v_tile) instead of leading-axis rows.
            ok_lanes = jnp.pad(ok, (0, b_pad - b)).reshape(
                n_tiles, 1, v_tile
            )
            h = jnp.where(ok_lanes, h_t, h)
        else:
            h = sel(h_t, h)
        lam = jnp.clip(jnp.where(ok, lam * 0.33, lam * 2.5), 1e-12, 1e12)
        n_acc = n_acc + ok.astype(jnp.int32)
        # See the planar driver: stop on vanishing accepted improvement in
        # the near-Gauss-Newton regime, OR on three consecutive rejections
        # whose cost change sits at float resolution (exit-by-rejection at
        # the numerical optimum).  Without the latter the loop always burns
        # the full max_iter budget — measured done_frac was 0.0 on fully
        # converged grids.
        plateau = ~ok & ~done & (jnp.abs(rel_drop) <= 64.0 * eps)
        streak = jnp.where(plateau, streak + 1, 0)
        done = (
            done
            | (ok & (rel_drop < ftol) & (lam < lam0))
            | (streak >= plateau_streak)
        )
        return (u, cost, g, h, lam, n_acc, streak, done, i + 1)

    cost0, g0, h0 = full_eval(u0)
    carry0 = (
        u0,
        cost0,
        g0,
        h0,
        jnp.full((b,), lam0, real_dtype),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool),
        jnp.asarray(0, jnp.int32),
    )
    u, cost, _, h_fin, _, n_acc, _, done, _ = jax.lax.while_loop(
        cond, step, carry0
    )
    if return_hessian == "slab":  # implies slab_mode (guarded above)
        # Zero materializations: the scaled slab goes straight to
        # crlb_from_hessian_slab (the fused grid path).
        return _pallas_result_tail(
            u, cost, n_acc, done, h_fin, lower, upper, kind,
            return_hessian, slab_meta=(b, n_free, a_pad),
        )
    if slab_mode and return_hessian:
        # One materialization at the end (the CRLB consumer wants
        # (B, F, F)) instead of two relayouts per LM iteration.
        from xmris_tpu.ops.kernels.lm_pallas import slab_to_bff

        h_fin = slab_to_bff(h_fin, b, n_free, a_pad)
    return _pallas_result_tail(
        u, cost, n_acc, done, h_fin, lower, upper, kind, return_hessian
    )


def _pallas_result_tail(
    u, cost, n_acc, done, h_fin, lower, upper, kind, return_hessian,
    slab_meta=None,
):
    """Shared epilogue of the pallas LM drivers (per-iteration and v10
    whole-loop): bound back-transform, convergence flags, and external-space
    Hessian recovery for the zero-cost CRLB.

    ``return_hessian="slab"`` (with ``slab_meta=(b, f, f_pad)``): ``h_fin``
    arrives in the kernel-native ``(n_tiles, f_pad·f_pad, v_tile)`` slab
    layout and stays there — the bound-transform unscaling is applied
    elementwise on a 4-D view (lanes untouched, so no relayout), and the
    scaled slab feeds :func:`crlb_from_hessian_slab` directly."""
    x_final, dxdu_fin = internal_to_external_jax(
        u, lower[None, :], upper[None, :], kind[None, :]
    )
    # See the planar driver: a voxel seeded at its optimum exits by
    # rejection plateau with zero accepted steps — that is convergence.
    converged = jnp.isfinite(cost) & ((n_acc > 0) | done)
    result = LMResult(
        x_free=x_final, cost=cost, n_iter=n_acc, converged=converged, done=done
    )
    if not return_hessian:
        return result
    # The carried H is D @ H_ext @ D with D = diag(dx/du) at the final
    # (accepted) state; divide the diagonal scaling back out.  A parameter
    # pinned exactly at a bound has dx/du -> 0: its external Fisher row is
    # unrecoverable from the carried H, so instead of leaving a bound-scaled
    # near-zero row (which reads as a huge-but-finite CRLB), zero the
    # row/column outright — crlb_from_hessian maps a zero diagonal to an
    # infinite CRLB, explicitly flagging the parameter as unidentifiable.
    pinned = jnp.abs(dxdu_fin) < 1e-12
    safe_d = jnp.where(pinned, 1.0, dxdu_fin)
    if return_hessian == "slab":
        # Same unscale-and-zero, expressed on the slab: the combined
        # factor keep/d is padded into the slab's (b_pad, f_pad) frame
        # (pad entries 0 — the pad region is never read downstream, and a
        # 0·NaN there is harmless) and applied on the free (n_tiles,
        # f_pad, f_pad, v_tile) view.
        b, f, f_pad = slab_meta
        n_tiles, _, v_tile = h_fin.shape
        b_pad = n_tiles * v_tile
        inv = jnp.where(pinned, 0.0, 1.0 / safe_d).astype(h_fin.dtype)
        inv_p = jnp.zeros((b_pad, f_pad), h_fin.dtype).at[:b, :f].set(inv)
        d_slab = inv_p.reshape(n_tiles, v_tile, f_pad).transpose(0, 2, 1)
        h4 = h_fin.reshape(n_tiles, f_pad, f_pad, v_tile)
        h4 = h4 * d_slab[:, :, None, :] * d_slab[:, None, :, :]
        return result, h4.reshape(n_tiles, f_pad * f_pad, v_tile)
    h_ext = h_fin / (safe_d[:, :, None] * safe_d[:, None, :])
    keep = (~pinned).astype(h_ext.dtype)
    h_ext = h_ext * keep[:, :, None] * keep[:, None, :]
    return result, h_ext


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def crlb_from_hessian(h_ext, cost, n_t, use_pallas=True, interpret=None):
    """CRLB standard deviations from an already-available GN Hessian.

    Same math as :func:`crlb_batched_pallas` (sigma^2 from the final
    residuals per real channel, identity prior) but with ZERO model
    evaluations: the LM driver's ``return_hessian=True`` output feeds this
    directly, saving the whole CRLB kernel pass.

    A zero diagonal entry of ``h_ext`` marks an unidentifiable parameter
    (the LM driver zeroes the rows of parameters pinned at a bound, and a
    structurally zero Jacobian row lands here too): its CRLB is reported as
    ``inf`` rather than a misleading huge-but-finite ridge artifact.

    ``use_pallas`` selects the VMEM-resident Pallas inverse-diagonal
    (:func:`~xmris_tpu.ops.kernels.spd.spd_inverse_diag_pallas`; the XLA
    unrolled form pays ~F HBM re-materializations of the (B, F, F)
    tensor).  ``interpret=None`` resolves to interpret mode off-TPU at
    trace time, matching the kernel call sites elsewhere.
    """
    from xmris_tpu.ops.kernels.spd import (
        spd_inverse_diag,
        spd_inverse_diag_pallas,
    )

    n_free = h_ext.shape[-1]
    h = h_ext + 1e-12 * jnp.eye(n_free, dtype=h_ext.dtype)[None, :, :]
    dof = jnp.maximum(2.0 * n_t - n_free, 1.0)
    sigma2 = cost / dof
    if use_pallas:
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        diag_inv = spd_inverse_diag_pallas(h, interpret=interpret)
    else:
        diag_inv = spd_inverse_diag(h)
    sds = jnp.sqrt(jnp.maximum(sigma2[:, None] * diag_inv, 0.0))
    unident = jnp.diagonal(h_ext, axis1=1, axis2=2) <= 0.0
    sds = jnp.where(unident, jnp.inf, sds)
    return sds, sigma2


@functools.partial(jax.jit, static_argnames=("f", "f_pad", "interpret"))
def crlb_from_hessian_slab(h_slab, cost, n_t, *, f, f_pad=None,
                           interpret=None):
    """:func:`crlb_from_hessian` taking H in kernel-native slab form.

    ``h_slab``: ``(n_tiles, f_pad·f_pad, v_tile)`` external-space Hessian
    slabs as returned by the LM driver with ``return_hessian="slab"`` —
    the fused grid path's zero-relayout CRLB: the Hessian never leaves the
    layout the moment kernel produced it in (the 1e-12 Tikhonov floor is
    applied in-kernel).  The unidentifiable-parameter check reads H's
    diagonal straight off the slab rows ``k·(f_pad+1)``.  ``f_pad``
    defaults to the slab's own row count (``isqrt(h_slab.shape[1])``) —
    the single source of truth for the kernel's sublane rounding.
    """
    import math

    from xmris_tpu.ops.kernels.spd import spd_inverse_diag_pallas_slab

    if f_pad is None:
        f_pad = math.isqrt(h_slab.shape[1])
    b = cost.shape[0]
    dof = jnp.maximum(2.0 * n_t - f, 1.0)
    sigma2 = cost / dof
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    diag_inv = spd_inverse_diag_pallas_slab(
        h_slab, f=f, f_pad=f_pad, tikhonov=1e-12, interpret=interpret
    )[:b]
    n_tiles, _, v_tile = h_slab.shape
    diag_rows = jnp.stack(
        [h_slab[:, k * (f_pad + 1), :] for k in range(f)], axis=1
    )  # (n_tiles, f, v_tile)
    diag_h = diag_rows.transpose(0, 2, 1).reshape(n_tiles * v_tile, f)[:b]
    sds = jnp.sqrt(jnp.maximum(sigma2[:, None] * diag_inv, 0.0))
    sds = jnp.where(diag_h <= 0.0, jnp.inf, sds)
    return sds, sigma2


@functools.partial(
    jax.jit,
    static_argnames=("pmap_static", "mhz", "v_tile", "interpret", "kernel_version"),
)
def crlb_batched_pallas(
    fids_re,
    fids_im,
    t,
    x_free,  # (B, F) external free parameters at the optimum
    pmap_static,
    mhz: float,
    v_tile: int | None = None,
    interpret: bool = False,
    kernel_version: int = 9,
):
    """CRLBs from ONE fused-kernel evaluation at the optimum.

    The Gauss-Newton Hessian the kernel already produces IS the Fisher
    information (identity prior); folding to free space and taking
    ``sqrt(diag(sigma^2 * H^-1))`` via the unrolled Cholesky avoids the XLA
    Jacobian materialization of :func:`crlb_batched_planar` entirely.

    A zero Fisher diagonal (e.g. every row of a zero-amplitude peak's
    block — all of its Jacobian rows carry the amplitude factor) is
    reported as ``inf``, matching :func:`crlb_from_hessian`'s contract
    for unidentifiable/bound-pinned parameters rather than surfacing the
    huge-but-finite 1/1e-12 ridge artifact.
    """
    from xmris_tpu.ops.kernels.spd import spd_inverse_diag_pallas

    kernel_fn, active, vt_default = _select_pallas_kernel(
        kernel_version, pmap_static, fids_re.shape[-1]
    )
    if v_tile is None:
        v_tile = vt_default
    real_dtype = jnp.float32
    fids_re = fids_re.astype(real_dtype)
    fids_im = fids_im.astype(real_dtype)
    x_free = x_free.astype(real_dtype)
    n_free = x_free.shape[-1]
    smat_np = _scatter_matrix(pmap_static, n_free)
    if active is not None:
        smat_np = smat_np[list(active), :]
    smat = jnp.asarray(smat_np, real_dtype)

    grids = _expand_params_batched(x_free, pmap_static, real_dtype)
    if kernel_version >= 9:
        # Folded kernel with a unit bound-transform diagonal: H arrives in
        # EXTERNAL free-parameter space directly.
        fold_slots = tuple(int(pmap_static[0][j]) for j in active)
        fold_scales = tuple(float(pmap_static[1][j]) for j in active)
        cost, _, h = kernel_fn(
            grids, fids_re, fids_im, t.astype(real_dtype),
            n_peaks=pmap_static[3], mhz=mhz, v_tile=v_tile,
            interpret=interpret,
            fold_slots=fold_slots, fold_scales=fold_scales,
            n_free=n_free,
            dxdu=jnp.ones((fids_re.shape[0], n_free), real_dtype),
        )
    else:
        cost, _, h_phys = kernel_fn(
            grids, fids_re, fids_im, t.astype(real_dtype),
            n_peaks=pmap_static[3], mhz=mhz, v_tile=v_tile,
            interpret=interpret,
        )
        h = jnp.einsum("pf,bpq,qh->bfh", smat, h_phys, smat)
    # A zero Fisher diagonal marks an unidentifiable parameter (e.g. a
    # zero-amplitude peak's phase/cs/lw rows): report inf, not the
    # huge-but-finite 1/1e-12 ridge artifact — same contract as
    # crlb_from_hessian / crlb_from_hessian_slab.
    unident = jnp.diagonal(h, axis1=1, axis2=2) <= 0.0
    h = h + 1e-12 * jnp.eye(n_free, dtype=real_dtype)[None, :, :]

    dof = jnp.maximum(2.0 * t.shape[0] - n_free, 1.0)
    sigma2 = cost / dof
    diag_inv = spd_inverse_diag_pallas(h, interpret=interpret)
    sds = jnp.sqrt(jnp.maximum(sigma2[:, None] * diag_inv, 0.0))
    sds = jnp.where(unident, jnp.inf, sds)
    return sds, sigma2
