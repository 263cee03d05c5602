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


def _cmatmul(ar, ai, br, bi, preferred):
    """Planar complex matmul: (ar + i*ai) @ (br + i*bi) as 4 real matmuls."""
    rr = jnp.matmul(ar, br, preferred_element_type=preferred)
    ii = jnp.matmul(ai, bi, preferred_element_type=preferred)
    ri = jnp.matmul(ar, bi, preferred_element_type=preferred)
    ir = jnp.matmul(ai, br, preferred_element_type=preferred)
    return rr - ii, ri + ir


def dft_planar(
    xr: jax.Array,
    xi: jax.Array,
    n: int,
    inverse: bool = False,
    ortho: bool = True,
):
    """Planar DFT of the last axis of a (..., n) pair of real arrays.

    Traceable with static ``n``; intended to be called inside jit.  The
    inverse uses the conjugation identity on the same forward factors.
    """
    plan = plan_dft(n)
    n1, n2 = plan.n1, plan.n2
    dtype = xr.dtype
    preferred = jnp.float32 if dtype == jnp.float32 else dtype

    f1_re = jnp.asarray(plan.f1_re, dtype)
    f1_im = jnp.asarray(plan.f1_im, dtype)
    f2_re = jnp.asarray(plan.f2_re, dtype)
    f2_im = jnp.asarray(plan.f2_im, dtype)
    tw_re = jnp.asarray(plan.tw_re, dtype)
    tw_im = jnp.asarray(plan.tw_im, dtype)

    if inverse:
        # IDFT(x) = conj(DFT(conj(x))) / n  (scaling applied below)
        xi = -xi

    batch_shape = xr.shape[:-1]
    xr2 = xr.reshape((-1, n1, n2))
    xi2 = xi.reshape((-1, n1, n2))

    # Stage 1: Y[b, k1, j2] = sum_j1 F1[k1, j1] x[b, j1, j2]
    # implemented as x^T-free batched matmul via tensordot on the j1 axis.
    yr = jnp.einsum("kj,bjm->bkm", f1_re, xr2) - jnp.einsum(
        "kj,bjm->bkm", f1_im, xi2
    )
    yi = jnp.einsum("kj,bjm->bkm", f1_re, xi2) + jnp.einsum(
        "kj,bjm->bkm", f1_im, xr2
    )

    # Twiddle: elementwise (n1, n2) complex multiply
    tr = yr * tw_re - yi * tw_im
    ti = yr * tw_im + yi * tw_re

    # Stage 2: Z[b, k1, k2] = sum_j2 Y'[b, k1, j2] F2[j2, k2]
    zr, zi = _cmatmul(tr, ti, f2_re, f2_im, preferred)

    # Output permutation: X[k1 + n1*k2] -> transpose (k1, k2) -> (k2, k1)
    outr = jnp.transpose(zr, (0, 2, 1)).reshape(batch_shape + (n,))
    outi = jnp.transpose(zi, (0, 2, 1)).reshape(batch_shape + (n,))

    if inverse:
        outi = -outi
        scale = (1.0 / math.sqrt(n)) if ortho else (1.0 / n)
    else:
        scale = (1.0 / math.sqrt(n)) if ortho else 1.0
    if scale != 1.0:
        outr = outr * jnp.asarray(scale, dtype)
        outi = outi * jnp.asarray(scale, dtype)
    return outr, outi


def fft_ortho_planar(xr, xi):
    """Ortho-normalized forward planar FFT over the last axis."""
    return dft_planar(xr, xi, xr.shape[-1], inverse=False, ortho=True)


def ifft_ortho_planar(xr, xi):
    """Ortho-normalized inverse planar FFT over the last axis."""
    return dft_planar(xr, xi, xr.shape[-1], inverse=True, ortho=True)
