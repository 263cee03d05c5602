"""Batched bounded Levenberg-Marquardt for AMARES Eq.6 models.

This is the TPU-native replacement for the reference's per-voxel
pyAMARES/lmfit fits shipped through a joblib process pool
(``src/xmris/fitting/amares.py:118-204``): instead of one Python LM per
process, ONE XLA program runs the full LM iteration for every voxel in the
batch simultaneously — model evaluation, analytic Jacobian, normal equations
(``Re(J^H J)`` via batched matmuls on the MXU), damped Cholesky solve, and
accept/reject — with fixed trip count and per-voxel convergence masks.

Bounds use the MINPACK/lmfit parameter transform (``x = lo + (sin u + 1)/2 *
(hi - lo)`` for two-sided bounds, shifted-hyperbola for one-sided), so the
internal optimization is unconstrained and differentiable, matching lmfit's
``leastsq`` behavior the reference inherits.

The Jacobian is analytic: every Eq.6 partial is a cheap reweighting of the
per-peak basis ``B_k = a_k e^{i phi_k} E_k(t)``, so the full (2*n_time x P)
Jacobian costs ~one model evaluation instead of P finite-difference passes.

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

    # two-sided: u = arcsin(2*(x-lo)/(hi-lo) - 1)
    frac = np.clip(
        np.where(hi > lo, (x - lo) / np.where(hi > lo, hi - lo, 1.0), 0.5), 1e-8, 1 - 1e-8
    )
    u_both = np.arcsin(2.0 * frac - 1.0)
    # lower only: x = lo - 1 + sqrt(u^2+1)  =>  u = sqrt((x-lo+1)^2 - 1)
    v = np.maximum(x - lo + 1.0, 1.0 + 1e-12)
    u_lower = np.sqrt(v * v - 1.0)
    # upper only: x = hi + 1 - sqrt(u^2+1)  =>  u = sqrt((hi-x+1)^2 - 1)
    w = np.maximum(hi - x + 1.0, 1.0 + 1e-12)
    u_upper = np.sqrt(w * w - 1.0)

    return np.select(
        [kind == _BOTH, kind == _LOWER, kind == _UPPER], [u_both, u_lower, u_upper], x
    )


def internal_to_external_jax(u, lower, upper, kind):
    """Traced map from internal coordinates to bounded external values,
    plus the diagonal Jacobian dx/du (for the chain rule)."""
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
# Eq.6 model + analytic Jacobian in physical parameter space
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


def eq6_model_and_basis(t, grid, mhz: float):
    """Model FID and the per-peak complex basis B_k = a_k e^{i phi} E_k(t).

    grid: (K, 5) physical parameters [amp, cs_ppm, lw_hz, phase_deg, g].
    Returns (model (n_t,) complex, basis (n_t, K) complex, decay_args).
    """
    amp = grid[:, 0]
    f_hz = grid[:, 1] * mhz
    d = jnp.pi * grid[:, 2]
    phi = jnp.deg2rad(grid[:, 3])
    g = grid[:, 4]

    t_col = t[:, None]  # (n_t, 1)
    damp_arg = d * (1.0 - g + g * t_col) * t_col  # (n_t, K)
    angle = 2.0 * jnp.pi * f_hz * t_col + phi
    basis = amp * jnp.exp(-damp_arg) * (jnp.cos(angle) + 1j * jnp.sin(angle))
    model = jnp.sum(basis, axis=1)
    return model, basis


def eq6_jacobian_physical(t, grid, basis, mhz: float):
    """Analytic complex Jacobian d(model)/d(physical params), (n_t, K, 5).

    Every partial reweights the basis:
      d/d amp   = B_k / a_k
      d/d cs    = i*2*pi*MHz*t * B_k
      d/d lw    = -pi*(1-g+g*t)*t * B_k
      d/d phase = i*(pi/180) * B_k
      d/d g     = -d*(t^2 - t) * B_k
    """
    amp = grid[:, 0]
    d = jnp.pi * grid[:, 2]
    g = grid[:, 4]
    t_col = t[:, None]

    safe_amp = jnp.where(amp == 0, 1.0, amp)
    j_amp = basis / safe_amp
    j_cs = (1j * 2.0 * jnp.pi * mhz) * t_col * basis
    j_lw = -jnp.pi * (1.0 - g + g * t_col) * t_col * basis
    j_ph = (1j * jnp.pi / 180.0) * basis
    j_g = -d * (t_col * t_col - t_col) * basis
    return jnp.stack([j_amp, j_cs, j_lw, j_ph, j_g], axis=2)  # (n_t, K, 5)


# ---------------------------------------------------------------------------
# The batched LM driver
# ---------------------------------------------------------------------------


class LMResult(NamedTuple):
    x_free: jax.Array  # (B, F) final external free parameters
    cost: jax.Array  # (B,) final sum-of-squares
    n_iter: jax.Array  # (B,) accepted steps
    converged: jax.Array  # (B,) bool


def _residual_jacobian(u, y, t, pmap, lower, upper, kind, mhz):
    """Complex residual r = y - model and complex Jacobian w.r.t. internal u."""
    x, dxdu = internal_to_external_jax(u, lower, upper, kind)
    grid = expand_params(x, pmap)
    model, basis = eq6_model_and_basis(t, grid, mhz)
    jac_phys = eq6_jacobian_physical(t, grid, basis, mhz)  # (n_t, K, 5)

    # Chain: d model / d u_f = sum_j jac_phys[j] * scale[j] * dxdu[f] [idx[j]==f]
    n_free = u.shape[0]
    flat = jac_phys.reshape(jac_phys.shape[0], -1)  # (n_t, K*5)
    scaled = flat * pmap.scale[None, :]
    seg = jnp.where(pmap.idx >= 0, pmap.idx, n_free)  # route fixed to a dump slot
    # scatter-add columns into free slots
    jac_u = jnp.zeros((flat.shape[0], n_free + 1), dtype=flat.dtype)
    jac_u = jac_u.at[:, seg].add(scaled)
    jac_u = jac_u[:, :n_free] * dxdu[None, :]
    r = y - model
    return r, jac_u, model


@functools.partial(
    jax.jit, static_argnames=("pmap_static", "max_iter", "mhz")
)
def lm_fit_batched(
    fids,  # (B, n_t) complex
    t,  # (n_t,) float
    u0,  # (F,) shared or (B, F) per-voxel initial internal params
    lower,
    upper,
    kind,
    pmap_static,  # hashable ParamMap-like tuple (see hashable_pmap)
    mhz: float,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
):
    """Run bounded LM on every row of ``fids`` in one compiled program."""
    pmap = ParamMap(
        idx=jnp.asarray(pmap_static[0]),
        scale=jnp.asarray(pmap_static[1]),
        offset=jnp.asarray(pmap_static[2]),
        n_peaks=pmap_static[3],
    )
    real_dtype = jnp.real(fids).dtype
    t = t.astype(real_dtype)
    lower = lower.astype(real_dtype)
    upper = upper.astype(real_dtype)
    u0 = u0.astype(real_dtype)
    if u0.ndim == 1:
        u0 = jnp.broadcast_to(u0[None, :], (fids.shape[0], u0.shape[0]))

    def solve_one(y, u0):
        def cost_of(u):
            x, _ = internal_to_external_jax(u, lower, upper, kind)
            grid = expand_params(x, pmap)
            model, _ = eq6_model_and_basis(t, grid, mhz)
            r = y - model
            return jnp.sum(jnp.real(r) ** 2 + jnp.imag(r) ** 2)

        def step(carry, _):
            u, cost, lam, n_acc, done = carry
            r, jac, _ = _residual_jacobian(u, y, t, pmap, lower, upper, kind, mhz)
            # Normal equations in real arithmetic via complex products:
            # H = Re(J^H J), g = Re(J^H r)
            h = jnp.real(jac.conj().T @ jac)
            grad = jnp.real(jac.conj().T @ r)
            diag = jnp.diagonal(h)
            damped = h + lam * jnp.diag(jnp.maximum(diag, 1e-12))
            # Solve; guard non-finite systems
            delta = jnp.linalg.solve(
                damped + 1e-12 * jnp.eye(h.shape[0], dtype=h.dtype), grad
            )
            u_new = u + delta
            new_cost = cost_of(u_new)
            ok = jnp.isfinite(new_cost) & (new_cost < cost)
            improved = ok & ~done
            rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-300)
            u = jnp.where(improved, u_new, u)
            cost_out = jnp.where(improved, new_cost, cost)
            lam = jnp.where(improved, lam * 0.33, lam * 2.5)
            lam = jnp.clip(lam, 1e-12, 1e12)
            n_acc = n_acc + improved.astype(jnp.int32)
            done = done | (improved & (rel_drop < ftol))
            return (u, cost_out, lam, n_acc, done), None

        init_cost = cost_of(u0)
        carry0 = (
            u0,
            init_cost,
            jnp.asarray(lam0, real_dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )
        (u, cost, lam, n_acc, done), _ = jax.lax.scan(
            step, carry0, None, length=max_iter
        )
        x_final, _ = internal_to_external_jax(u, lower, upper, kind)
        converged = jnp.isfinite(cost) & (n_acc > 0)
        return x_final, cost, n_acc, converged

    x, cost, n_iter, conv = jax.vmap(solve_one)(fids, u0)
    return LMResult(x_free=x, cost=cost, n_iter=n_iter, converged=conv)


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
def crlb_batched(fids, t, x_free, lower, upper, kind, pmap_static, mhz: float):
    """Cramer-Rao lower bounds (standard deviations) of the free parameters.

    sigma^2 is estimated from the final residuals (per real channel); the
    covariance is ``sigma^2 * Re(J^H J)^-1`` evaluated at the optimum —
    matching the standard AMARES CRLB definition (identity prior matrix).
    """
    pmap = ParamMap(
        idx=jnp.asarray(pmap_static[0]),
        scale=jnp.asarray(pmap_static[1]),
        offset=jnp.asarray(pmap_static[2]),
        n_peaks=pmap_static[3],
    )
    real_dtype = jnp.real(fids).dtype
    t = t.astype(real_dtype)

    def one(y, x):
        # Jacobian w.r.t. the *external* free params (identity transform).
        grid = expand_params(x, pmap)
        model, basis = eq6_model_and_basis(t, grid, mhz)
        jac_phys = eq6_jacobian_physical(t, grid, basis, mhz)
        flat = jac_phys.reshape(jac_phys.shape[0], -1) * pmap.scale[None, :]
        n_free = x.shape[0]
        seg = jnp.where(pmap.idx >= 0, pmap.idx, n_free)
        jac = jnp.zeros((flat.shape[0], n_free + 1), dtype=flat.dtype)
        jac = jac.at[:, seg].add(flat)[:, :n_free]

        r = y - model
        n_res = 2.0 * t.shape[0]
        dof = jnp.maximum(n_res - n_free, 1.0)
        sigma2 = jnp.sum(jnp.real(r) ** 2 + jnp.imag(r) ** 2) / dof

        h = jnp.real(jac.conj().T @ jac)
        cov = sigma2 * jnp.linalg.inv(
            h + 1e-12 * jnp.eye(n_free, dtype=h.dtype)
        )
        return jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 0.0)), sigma2

    sds, sigma2 = jax.vmap(one)(fids, x_free)
    return sds, sigma2
