"""Batched DFT as MXU matmuls in planar (split real/imag) arithmetic.

Two reasons this kernel exists:

1. **Hardware fit.** On TPU the MXU (128x128 systolic array) is where the
   FLOPs are; a medium-length batched FFT expressed as two tall matmuls plus
   a twiddle multiply keeps the entire transform on the MXU and lets XLA fuse
   the surrounding elementwise work (apodization windows, phase factors) into
   the same program.  This is the classic 4-step (Bailey) factorization used
   by TPU MRI reconstruction work (Lu et al., "Accelerating MRI
   Reconstruction on TPUs", arXiv:2006.14080).

2. **Dtype robustness.** The numerics stay in pure real float32 — complex
   dtypes never appear on device — which sidesteps backends with incomplete
   complex lowering and makes bf16/int8 experiments straightforward.

Math (decimation for n = n1*n2, row-major reshape x[j1*n2 + j2]):

    X[k1 + n1*k2] = sum_{j2} W_n^{j2*k1} W_{n2}^{j2*k2}
                    [ sum_{j1} x[j1, j2] W_{n1}^{j1*k1} ]

so:  Y = F(n1) @ x_r          (stage-1 matmul over columns)
     Y'[k1, j2] = Y * W_n^{j2*k1}   (twiddle)
     Z = Y' @ F(n2)           (stage-2 matmul)
     X = transpose(Z).ravel() (output permutation)

Complex products expand to 4 real matmuls; everything here is jit-traceable
with static plans so a (batch, n) planar FFT is one fused XLA program.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DFTPlan(NamedTuple):
    """Static factorization plan + host-precomputed factor matrices."""

    n: int
    n1: int
    n2: int
    # DFT matrices and twiddles, as host float64 (cast on use)
    f1_re: np.ndarray  # (n1, n1)
    f1_im: np.ndarray
    f2_re: np.ndarray  # (n2, n2)
    f2_im: np.ndarray
    tw_re: np.ndarray  # (n1, n2)
    tw_im: np.ndarray


def _factorize(n: int) -> tuple[int, int]:
    """Split n into (n1, n2) with n1*n2 == n, both as close to sqrt(n) as
    possible (balanced factors minimize total matmul FLOPs n*(n1+n2))."""
    best = (1, n)
    best_cost = float("inf")
    for n1 in range(1, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            n2 = n // n1
            cost = n1 + n2
            if cost < best_cost:
                best_cost = cost
                best = (n1, n2)
    return max(best), min(best)


@functools.lru_cache(maxsize=64)
def plan_dft(n: int) -> DFTPlan:
    """Build (and cache) the factor matrices for an n-point DFT."""
    n1, n2 = _factorize(n)

    def dft_matrix(m):
        k = np.arange(m)
        ang = -2.0 * np.pi * np.outer(k, k) / m
        return np.cos(ang), np.sin(ang)

    f1_re, f1_im = dft_matrix(n1)
    f2_re, f2_im = dft_matrix(n2)

    k1 = np.arange(n1)[:, None]
    j2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * (k1 * j2) / n
    tw_re, tw_im = np.cos(ang), np.sin(ang)
    return DFTPlan(n, n1, n2, f1_re, f1_im, f2_re, f2_im, tw_re, tw_im)


def _cmatmul(ar, ai, br, bi, preferred, precision=None):
    """Planar complex matmul: (ar + i*ai) @ (br + i*bi) as 4 real matmuls."""
    mm = functools.partial(
        jnp.matmul, preferred_element_type=preferred, precision=precision
    )
    rr = mm(ar, br)
    ii = mm(ai, bi)
    ri = mm(ar, bi)
    ir = mm(ai, br)
    return rr - ii, ri + ir


# The variant the labeled ops and fused pipelines use by default.  "einsum"
# is the round-1 formulation; "block" (flat block-complex matmuls) is the
# round-2 winner candidate pending TPU measurement — see dft_planar.
DEFAULT_VARIANT = "einsum"
# Matmul input precision on TPU: float32 inputs go through the MXU as
# bfloat16 passes; DEFAULT is one pass (~1e-3 relative error on spectra),
# HIGHEST is the multi-pass f32-accurate mode.  Parity demands HIGHEST.
DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def dft_planar(
    xr: jax.Array,
    xi: jax.Array,
    n: int,
    inverse: bool = False,
    ortho: bool = True,
    variant: str | None = None,
    precision=None,
):
    """Planar DFT of the last axis of a (..., n) pair of real arrays.

    Traceable with static ``n``; intended to be called inside jit.  The
    inverse uses the conjugation identity on the same forward factors.

    ``variant`` selects the matmul formulation (all numerically equivalent):

    * ``"einsum"`` — batched middle-axis contractions (XLA picks layouts).
    * ``"flat"``   — explicit transposes + flat 2-D matmuls on (B*n2, n1)
      and (B*n1, n2) panels (deterministic MXU-friendly layout).
    * ``"block"``  — like ``flat`` but the real/imag planes pack into one
      block-complex operand, doubling the contraction dim (n=2048 gives
      K=128: one full MXU tile) and halving the matmul count.
    * ``"full"``   — single (B, 2n) @ (2n, 2n) block-complex matmul with
      the dense DFT matrix (n^2 FLOPs, zero transposes).
    """
    variant = variant or DEFAULT_VARIANT
    precision = precision if precision is not None else DEFAULT_PRECISION
    plan = plan_dft(n)
    n1, n2 = plan.n1, plan.n2
    dtype = xr.dtype
    preferred = jnp.float32 if dtype == jnp.float32 else dtype

    if inverse:
        # IDFT(x) = conj(DFT(conj(x))) / n  (scaling applied below)
        xi = -xi

    batch_shape = xr.shape[:-1]

    if variant == "einsum":
        outr, outi = _dft_einsum(xr, xi, plan, dtype, preferred, precision)
    elif variant == "flat":
        outr, outi = _dft_flat(xr, xi, plan, dtype, preferred, precision)
    elif variant == "block":
        outr, outi = _dft_block(xr, xi, plan, dtype, preferred, precision)
    elif variant == "full":
        outr, outi = _dft_full(xr, xi, n, dtype, preferred, precision)
    else:
        raise ValueError(f"Unknown DFT variant {variant!r}.")
    outr = outr.reshape(batch_shape + (n,))
    outi = outi.reshape(batch_shape + (n,))

    if inverse:
        outi = -outi
        scale = (1.0 / math.sqrt(n)) if ortho else (1.0 / n)
    else:
        scale = (1.0 / math.sqrt(n)) if ortho else 1.0
    if scale != 1.0:
        outr = outr * jnp.asarray(scale, dtype)
        outi = outi * jnp.asarray(scale, dtype)
    return outr, outi


def _dft_einsum(xr, xi, plan: DFTPlan, dtype, preferred, precision):
    """Round-1 formulation: batched einsum contractions over middle axes."""
    n, n1, n2 = plan.n, plan.n1, plan.n2
    f1_re = jnp.asarray(plan.f1_re, dtype)
    f1_im = jnp.asarray(plan.f1_im, dtype)
    f2_re = jnp.asarray(plan.f2_re, dtype)
    f2_im = jnp.asarray(plan.f2_im, dtype)
    tw_re = jnp.asarray(plan.tw_re, dtype)
    tw_im = jnp.asarray(plan.tw_im, dtype)

    xr2 = xr.reshape((-1, n1, n2))
    xi2 = xi.reshape((-1, n1, n2))

    ein = functools.partial(jnp.einsum, precision=precision)
    # Stage 1: Y[b, k1, j2] = sum_j1 F1[k1, j1] x[b, j1, j2]
    yr = ein("kj,bjm->bkm", f1_re, xr2) - ein("kj,bjm->bkm", f1_im, xi2)
    yi = ein("kj,bjm->bkm", f1_re, xi2) + ein("kj,bjm->bkm", f1_im, xr2)

    # Twiddle: elementwise (n1, n2) complex multiply
    tr = yr * tw_re - yi * tw_im
    ti = yr * tw_im + yi * tw_re

    # Stage 2: Z[b, k1, k2] = sum_j2 Y'[b, k1, j2] F2[j2, k2]
    zr, zi = _cmatmul(tr, ti, f2_re, f2_im, preferred, precision)

    # Output permutation: X[k1 + n1*k2] -> transpose (k1, k2) -> (k2, k1)
    outr = jnp.transpose(zr, (0, 2, 1)).reshape(-1, n)
    outi = jnp.transpose(zi, (0, 2, 1)).reshape(-1, n)
    return outr, outi


def _dft_flat(xr, xi, plan: DFTPlan, dtype, preferred, precision):
    """Flat-panel formulation: every contraction is a plain 2-D matmul whose
    contraction axis is minormost, with explicit transposes between stages.

    Layout walk (F1/F2 are symmetric, so F^T = F):
      (B, n1, n2) --T--> (B, n2, n1) --flat--> (B*n2, n1) @ F1 -> y[b, j2, k1]
      twiddle (j2, k1) elementwise
      --T--> (B, k1, j2) --flat--> (B*n1, n2) @ F2 -> z[b, k1, k2]
      --T--> (B, k2, k1) --ravel--> X[k1 + n1*k2]
    """
    n, n1, n2 = plan.n, plan.n1, plan.n2
    f1_re = jnp.asarray(plan.f1_re, dtype)
    f1_im = jnp.asarray(plan.f1_im, dtype)
    f2_re = jnp.asarray(plan.f2_re, dtype)
    f2_im = jnp.asarray(plan.f2_im, dtype)
    twt_re = jnp.asarray(plan.tw_re.T, dtype)  # (n2, n1) = (j2, k1)
    twt_im = jnp.asarray(plan.tw_im.T, dtype)

    xtr = xr.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n1)
    xti = xi.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n1)

    yr, yi = _cmatmul(xtr, xti, f1_re, f1_im, preferred, precision)

    yr = yr.reshape(-1, n2, n1)
    yi = yi.reshape(-1, n2, n1)
    tr = yr * twt_re - yi * twt_im
    ti = yr * twt_im + yi * twt_re

    tr = tr.transpose(0, 2, 1).reshape(-1, n2)  # (B*k1, j2)
    ti = ti.transpose(0, 2, 1).reshape(-1, n2)
    zr, zi = _cmatmul(tr, ti, f2_re, f2_im, preferred, precision)

    outr = zr.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n)
    outi = zi.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n)
    return outr, outi


@functools.lru_cache(maxsize=64)
def _block_factors(n: int):
    """Block-complex factor matrices for the flat 4-step.

    ``[yr yi] = [xr xi] @ [[Fr, Fi], [-Fi, Fr]]`` — one real matmul per
    stage with contraction dim 2*n1 (or 2*n2).
    """
    plan = plan_dft(n)

    def block(fr, fi):
        top = np.concatenate([fr, fi], axis=1)
        bot = np.concatenate([-fi, fr], axis=1)
        return np.concatenate([top, bot], axis=0)

    return (
        block(plan.f1_re, plan.f1_im),  # (2*n1, 2*n1)
        block(plan.f2_re, plan.f2_im),  # (2*n2, 2*n2)
    )


def _dft_block(xr, xi, plan: DFTPlan, dtype, preferred, precision):
    """Block-complex flat formulation: planes packed along the contraction
    axis so each stage is ONE matmul with doubled K (full MXU tiles)."""
    n, n1, n2 = plan.n, plan.n1, plan.n2
    b1, b2 = _block_factors(n)
    b1 = jnp.asarray(b1, dtype)
    b2 = jnp.asarray(b2, dtype)
    twt_re = jnp.asarray(plan.tw_re.T, dtype)
    twt_im = jnp.asarray(plan.tw_im.T, dtype)

    mm = functools.partial(
        jnp.matmul, preferred_element_type=preferred, precision=precision
    )

    xtr = xr.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n1)
    xti = xi.reshape(-1, n1, n2).transpose(0, 2, 1).reshape(-1, n1)

    y = mm(jnp.concatenate([xtr, xti], axis=1), b1)  # (B*n2, 2*n1)
    yr = y[:, :n1].reshape(-1, n2, n1)
    yi = y[:, n1:].reshape(-1, n2, n1)

    tr = yr * twt_re - yi * twt_im
    ti = yr * twt_im + yi * twt_re

    tr = tr.transpose(0, 2, 1).reshape(-1, n2)
    ti = ti.transpose(0, 2, 1).reshape(-1, n2)
    z = mm(jnp.concatenate([tr, ti], axis=1), b2)  # (B*n1, 2*n2)
    zr = z[:, :n2].reshape(-1, n1, n2)
    zi = z[:, n2:].reshape(-1, n1, n2)

    outr = zr.transpose(0, 2, 1).reshape(-1, n)
    outi = zi.transpose(0, 2, 1).reshape(-1, n)
    return outr, outi


@functools.lru_cache(maxsize=4)
def _full_block_matrix(n: int, dtype_str: str = "float32") -> np.ndarray:
    """Dense block-complex DFT matrix (2n, 2n): X = x_packed @ M.

    Built in float64 and stored at the consumer's dtype — a (4096, 4096)
    cache entry is 64 MB at float32 vs 128 MB at float64, and these big
    constants live for the process lifetime.
    """
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    fr, fi = np.cos(ang), np.sin(ang)
    top = np.concatenate([fr, fi], axis=1)
    bot = np.concatenate([-fi, fr], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.dtype(dtype_str))


def _dft_full(xr, xi, n, dtype, preferred, precision):
    """Single dense-matrix formulation: n^2 FLOPs but zero transposes and
    one perfectly-shaped matmul; wins when the batch is HBM-bound."""
    m = jnp.asarray(_full_block_matrix(n, np.dtype(dtype).name), dtype)
    x = jnp.concatenate([xr.reshape(-1, n), xi.reshape(-1, n)], axis=1)
    out = jnp.matmul(x, m, preferred_element_type=preferred, precision=precision)
    return out[:, :n], out[:, n:]


# ---------------------------------------------------------------------------
# Fused spectral transform: zero-fill + ortho DFT + fftshift as ONE matmul
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _rect_shifted_block_matrix(
    n_in: int, n_out: int, dtype_str: str = "float32"
) -> np.ndarray:
    """Block-complex (2*n_in, 2*n_out) matrix computing, in one matmul,
    the ortho-normalized ``n_out``-point DFT of an ``n_in``-sample signal
    (implicit zero-fill: only the first ``n_in`` DFT-matrix rows survive)
    with the output columns pre-permuted by ``fftshift``.

    ``spec_shifted = x_packed @ M`` where ``x_packed = [x_re | x_im]``.
    """
    j = np.arange(n_in)[:, None]
    # fftshift output ordering: shifted bin k' holds original bin
    # (k' - n_out//2) mod n_out  (the roll-by-n//2 convention of ops.fourier)
    k = (np.arange(n_out)[None, :] - n_out // 2) % n_out
    ang = -2.0 * np.pi * j * k / n_out
    scale = 1.0 / math.sqrt(n_out)
    fr = np.cos(ang) * scale
    fi = np.sin(ang) * scale
    top = np.concatenate([fr, fi], axis=1)
    bot = np.concatenate([-fi, fr], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.dtype(dtype_str))


def dft_rect_shifted_planar(
    xr: jax.Array,
    xi: jax.Array,
    n_out: int,
    precision=None,
):
    """Fused zero-fill -> ortho DFT -> fftshift of a (..., n_in) planar pair.

    The whole spectral transform is one (B, 2*n_in) @ (2*n_in, 2*n_out)
    matmul against a host-precomputed constant: no pad, no roll, and half
    the FLOPs of a square dense DFT when n_in = n_out/2 (the standard
    2x zero-fill).  Callers multiply the apodization window into ``xr/xi``
    first — XLA fuses that elementwise prologue into the matmul.
    """
    precision = precision if precision is not None else DEFAULT_PRECISION
    n_in = xr.shape[-1]
    dtype = xr.dtype
    preferred = jnp.float32 if dtype == jnp.float32 else dtype
    batch_shape = xr.shape[:-1]

    m = jnp.asarray(
        _rect_shifted_block_matrix(n_in, n_out, np.dtype(dtype).name), dtype
    )
    x = jnp.concatenate(
        [xr.reshape(-1, n_in), xi.reshape(-1, n_in)], axis=1
    )
    out = jnp.matmul(x, m, preferred_element_type=preferred, precision=precision)
    return (
        out[:, :n_out].reshape(batch_shape + (n_out,)),
        out[:, n_out:].reshape(batch_shape + (n_out,)),
    )


def fft_ortho_planar(xr, xi):
    """Ortho-normalized forward planar FFT over the last axis."""
    return dft_planar(xr, xi, xr.shape[-1], inverse=False, ortho=True)


def ifft_ortho_planar(xr, xi):
    """Ortho-normalized inverse planar FFT over the last axis."""
    return dft_planar(xr, xi, xr.shape[-1], inverse=True, ortho=True)
