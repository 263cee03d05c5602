"""Whole-loop fused ACME phase-polish kernel (grid autophase, mode="all").

The per-voxel grid-autophase polish (``ops/phasing.py::_grid_phase_search``,
``polish_optimizer="gd"``) runs ~40 backtracking gradient iterations, each
costing one autodiff gradient pass + one objective pass over the full
``(voxels, n_freq)`` spectrum planes — every pass re-streams ~134 MB per
plane through HBM plus XLA's materialized intermediates, which is why the
16384-voxel p0+p1 polish measured 239 ms of the 267 ms total
(results/tpu_r7.jsonl apsplit).

This kernel keeps each voxel tile's spectrum rows VMEM-RESIDENT across the
ENTIRE polish loop: per iteration it evaluates the ACME objective AND its
closed-form analytic gradient in one in-register pass, then the trial
objective — total HBM traffic for the whole polish is ONE read of the
spectrum planes.  (Contrast with the v10 whole-loop LM negative,
results/tpu_r6.jsonl: there the XLA glue between launches was already
nearly free and the kernel added per-trip overhead; here the eliminated
cost is ~80 full HBM passes, not glue.)

Algorithm parity: the loop replicates the XLA gd polish exactly — gradient
normalization of the initial rate (first trial step spans half a mesh
cell), span scaling, p0 wrap / p1 clip, backtracking accept with lr x1.2 /
x0.5 — so achieved scores are comparable voxel-for-voxel.  The analytic
gradient matches ``jax.grad`` of the guarded ACME objective
(``acme_score_raw``): entropy term via the softmax-entropy derivative with
the zero-bin guard, negative-area penalty via the taken branch, max
normalization with tie-averaged subgradient (XLA's ``max`` convention).

Reference context: the reference's per-voxel autophase raises
``NotImplementedError`` (``processing/phasing.py:219-222``); this is the
TPU-native capability it could not offer, at streaming-pipeline cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_D2R = np.pi / 180.0


def _roll(x, shift, mosaic=True):
    """Lane-axis roll.  Mosaic's roll primitive requires a non-negative
    shift and has no eval rule outside a compiled kernel, so interpret
    mode and plain-XLA callers (the gradient-parity tests) use jnp.roll."""
    if mosaic:
        return pltpu.roll(x, shift % x.shape[1], 1)
    return jnp.roll(x, shift, axis=1)


def _acme_value_grad(re, im, u, p, *, p0_only, want_grad, mosaic=True):
    """ACME score (+ analytic gradient) for a (v_tile, n_f) block.

    ``p``: (v_tile, 2) degrees.  Returns ``(score (v_tile, 1), grad
    (v_tile, 2) in degrees)``; ``grad`` is zeros when ``want_grad=False``.
    Pure jnp on values — runs inside the Pallas kernel and in plain XLA
    (the unit tests compare it against ``jax.grad`` of the reference
    objective).
    """
    nf = re.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
    not_last = lane < (nf - 1)

    p0 = p[:, 0:1]
    p1 = jnp.zeros_like(p0) if p0_only else p[:, 1:2]
    phi = _D2R * (p0 + p1 * u)
    cph = jnp.cos(phi)
    sph = jnp.sin(phi)
    d = re * cph - im * sph

    # First-difference magnitude distribution (guarded entropy).
    d_next = _roll(d, -1, mosaic)
    delta = jnp.where(not_last, d_next - d, 0.0)
    ds1 = jnp.abs(delta) * 0.5
    s1 = jnp.sum(ds1, axis=1, keepdims=True)
    pos = ds1 > 0.0
    logp = jnp.where(
        pos, jnp.log(jnp.where(pos, ds1, 1.0)) - jnp.log(s1), 0.0
    )
    h = -jnp.sum(jnp.where(pos, (ds1 / s1) * logp, 0.0), axis=1, keepdims=True)

    # Negative-area penalty (as_ = d - |d| = 2*min(d, 0)).
    mind = jnp.minimum(d, 0.0)
    sa = jnp.sum(2.0 * mind, axis=1, keepdims=True)
    neg = sa < 0.0
    pen = jnp.where(
        neg, jnp.sum(mind * mind, axis=1, keepdims=True), 0.0
    )

    m = jnp.max(d, axis=1, keepdims=True)
    num = h + 1000.0 * pen
    denom = nf * m
    score = jnp.where(m > 0.0, num / denom, jnp.inf)

    if not want_grad:
        return score, jnp.zeros_like(p)

    # d(score)/d(d_i), assembled from the three terms.
    # Entropy: dH/dds1_k = (-(log p_k + 1)[p_k>0] + (1 - H)) / S1, chained
    # through ds1_k = |delta_k|/2 and the first-difference transpose.
    dh_dds1 = (jnp.where(pos, -(logp + 1.0), 0.0) + (1.0 - h)) / s1
    ck = jnp.where(not_last, dh_dds1 * jnp.sign(delta) * 0.5, 0.0)
    not_first = lane > 0
    gh = jnp.where(not_first, _roll(ck, 1, mosaic), 0.0) - ck
    # Penalty (taken branch): dP/dd_i = 2*min(d_i, 0) when SA < 0.
    gp = jnp.where(neg, 2.0 * mind, 0.0)
    # Max normalization: tie-averaged subgradient (XLA max convention).
    is_max = (d == m).astype(d.dtype)
    gm = is_max / jnp.sum(is_max, axis=1, keepdims=True)
    gd_vec = (gh + 1000.0 * gp) / denom - (num / (denom * m)) * gm

    # Chain to the phase parameters: dd_i/dr0 = -(re sin + im cos) = q_i,
    # dd_i/dr1 = q_i * u_i; degrees = radians * pi/180.
    q = -(re * sph + im * cph)
    g0 = jnp.sum(gd_vec * q, axis=1, keepdims=True) * _D2R
    if p0_only:
        g1 = jnp.zeros_like(g0)
    else:
        g1 = jnp.sum(gd_vec * q * u, axis=1, keepdims=True) * _D2R
    grad = jnp.concatenate([g0, g1], axis=1)
    # Degenerate (all-negative) spectra score +inf with no dependence on
    # the parameters: zero gradient (matches jax.grad of the where()).
    grad = jnp.where(m > 0.0, grad, 0.0)
    return score, grad


def _wrap_params(p, *, p0_only):
    """p0 wrapped into [-180, 180); p1 clipped to the DE box."""
    p0 = p[:, 0:1]
    p0 = p0 - 360.0 * jnp.floor((p0 + 180.0) / 360.0)
    p1 = p[:, 1:2]
    if not p0_only:
        p1 = jnp.clip(p1, -4000.0, 4000.0)
    return jnp.concatenate([p0, p1], axis=1)


def _polish_kernel(
    re_ref, im_ref, crd_ref, piv_ref, p_ref, pout_ref, fout_ref,
    *, n_iter, p0_only, half_cell, x_range, span0, span1, mosaic,
):
    re = re_ref[...]
    im = im_ref[...]
    u = (crd_ref[...] - piv_ref[...]) / x_range  # (v_tile, n_f)
    p = p_ref[...]
    tiny = np.finfo(np.float32).tiny

    def scale_span(g):
        # Per-column span scaling from python scalars (a captured (2,)
        # constant array is rejected by pallas_call).
        return jnp.concatenate([g[:, 0:1] * span0, g[:, 1:2] * span1], 1)

    vg = functools.partial(
        _acme_value_grad, re, im, u, p0_only=p0_only, mosaic=mosaic
    )

    # Gradient-normalized initial rate: first trial step ~ half a mesh cell.
    f0, g0_raw = vg(p, want_grad=True)
    g0 = scale_span(jnp.where(jnp.isfinite(g0_raw), g0_raw, 0.0))
    gmax = jnp.max(jnp.abs(g0), axis=1, keepdims=True)
    lr0 = half_cell / jnp.maximum(gmax, tiny)
    lr0 = jnp.where(gmax > 0.0, lr0, 1e-2)

    # One value_and_grad eval PER ITERATION at the trial point, carrying
    # the accepted gradient: exactly the gd trajectory (after a rejection
    # the gradient at the unchanged point is the carried one; after an
    # accept the trial's own gradient is it) at half the objective passes
    # of the grad-at-current + value-at-trial formulation.
    def body(_, carry):
        p_c, f_c, g_c, lr = carry
        g = scale_span(jnp.where(jnp.isfinite(g_c), g_c, 0.0))
        p_new = _wrap_params(p_c - scale_span(lr * g), p0_only=p0_only)
        f_new, g_new = vg(p_new, want_grad=True)
        better = f_new < f_c
        return (
            jnp.where(better, p_new, p_c),
            jnp.where(better, f_new, f_c),
            jnp.where(better, g_new, g_c),
            jnp.where(better, lr * 1.2, lr * 0.5),
        )

    p_fin, f_fin, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (p, f0, g0_raw, lr0)
    )
    pout_ref[...] = p_fin
    fout_ref[...] = f_fin


def acme_polish_pallas(
    rows_re,
    rows_im,
    coords,
    pivots,
    p_init,
    x_range: float,
    *,
    n_iter: int = 40,
    p0_only: bool = False,
    half_cell: float = 0.5 / 36.0,
    span=(360.0, 8000.0),
    v_tile: int = 64,
    interpret: bool = False,
):
    """Fused backtracking-GD ACME polish over a (B, n_f) spectrum batch.

    Mirrors ``_grid_phase_search``'s gd polish (same seeds -> comparable
    achieved scores) with the whole loop in one kernel launch.  ``pivots``
    are per-voxel pivot COORDINATE VALUES; ``p_init`` is (B, 2) degrees.
    Returns ``(p_final (B, 2), score_final (B,))``.
    """
    rows_re = jnp.asarray(rows_re)
    rows_im = jnp.asarray(rows_im)
    coords = jnp.asarray(coords)
    pivots = jnp.asarray(pivots)
    p_init = jnp.asarray(p_init)
    b, n_f = rows_re.shape
    # Canonicalized dtype (host f64 inputs truncate to f32 when x64 is
    # off; the out_shape must match what the kernel actually computes).
    dtype = rows_re.dtype
    from xmris_tpu.parallel.mesh import edge_pad_rows, pad_to_multiple

    bp = pad_to_multiple(b, v_tile)
    rows_re = edge_pad_rows(rows_re, bp)
    rows_im = edge_pad_rows(rows_im, bp)
    pivots = edge_pad_rows(pivots, bp)
    p_init = edge_pad_rows(p_init, bp)

    kern = functools.partial(
        _polish_kernel,
        n_iter=int(n_iter),
        p0_only=bool(p0_only),
        half_cell=float(half_cell),
        x_range=float(x_range),
        span0=float(span[0]),
        span1=float(span[1]),
        mosaic=not interpret,
    )
    p_out, f_out = pl.pallas_call(
        kern,
        grid=(bp // v_tile,),
        in_specs=[
            pl.BlockSpec((v_tile, n_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((v_tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 2), dtype),
            jax.ShapeDtypeStruct((bp, 1), dtype),
        ],
        interpret=interpret,
    )(
        rows_re,
        rows_im,
        coords[None, :].astype(dtype),
        pivots[:, None].astype(dtype),
        p_init.astype(dtype),
    )
    return p_out[:b], f_out[:b, 0]
