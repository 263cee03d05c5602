"""Batched tiny-SPD solves as unrolled vector ops.

XLA's batched ``cholesky``/``cho_solve`` on TPU lowers to a loop-heavy
implementation that costs ~200 ms per 40x(4096x10x10) — an order of
magnitude more than the LM iteration's entire fused model/Jacobian kernel.
For the small fixed sizes of prior-knowledge fitting (F = 5*n_peaks <= ~40)
the factorization unrolls into F rank-1 updates of the (B, F, F) tensor and
two statically-unrolled triangular solves — pure elementwise/broadcast HLOs
that XLA fuses into a few launches.

Cholesky-Crout outer-product form with static masks:

    for k in 0..F-1:
        l_k = mask_{>=k}(A[:, :, k]) / sqrt(A[:, k, k])
        A  -= l_k l_k^T          (rank-1 update)
        L[:, :, k] = l_k
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def spd_solve_small(h: jax.Array, g: jax.Array) -> jax.Array:
    """Solve ``h @ x = g`` for a batch of small SPD systems.

    h: (B, F, F) symmetric positive definite; g: (B, F).  F is taken from the
    static shape, and all loops unroll at trace time.  Non-SPD inputs produce
    NaNs (callers treat NaN steps as rejected, matching the LM contract).
    """
    b, f, _ = h.shape
    dtype = h.dtype

    # --- Cholesky (outer-product form, F rank-1 updates) ---
    a = h
    cols = []
    idx = np.arange(f)
    for k in range(f):
        dk = a[:, k, k]
        # Non-SPD pivot (dk <= 0) must produce NaN, not finite garbage:
        # the LM driver treats non-finite steps as rejected, and CRLB
        # consumers need to see the failure rather than silent nonsense.
        safe_dk = jnp.where(dk > 0, dk, jnp.nan)
        inv_sqrt = jax.lax.rsqrt(safe_dk)[:, None]
        mask = jnp.asarray((idx >= k).astype(np.float32), dtype)[None, :]
        l_k = a[:, :, k] * mask * inv_sqrt  # (B, F), zeros above k
        a = a - l_k[:, :, None] * l_k[:, None, :]
        cols.append(l_k)
    l = jnp.stack(cols, axis=2)  # (B, F, F) lower triangular

    # --- Forward substitution: L y = g ---
    ys = []
    for i in range(f):
        acc = g[:, i]
        for j in range(i):
            acc = acc - l[:, i, j] * ys[j]
        ys.append(acc / l[:, i, i])

    # --- Backward substitution: L^T x = y ---
    xs = [None] * f
    for i in reversed(range(f)):
        acc = ys[i]
        for j in range(i + 1, f):
            acc = acc - l[:, j, i] * xs[j]
        xs[i] = acc / l[:, i, i]

    return jnp.stack(xs, axis=1)


@functools.partial(jax.jit, static_argnames=())
def spd_inverse_diag(h: jax.Array) -> jax.Array:
    """Diagonal of the inverse of a batch of small SPD matrices.

    Via Cholesky: H = L L^T  =>  (H^-1)_jj = || L^-1 e_j ||^2, i.e. F
    unrolled forward substitutions.  Used for CRLB extraction from the
    Gauss-Newton Hessian without materializing the full inverse.
    """
    b, f, _ = h.shape
    dtype = h.dtype

    a = h
    cols = []
    idx = np.arange(f)
    for k in range(f):
        dk = a[:, k, k]
        # Non-SPD pivot (dk <= 0) must produce NaN, not finite garbage:
        # the LM driver treats non-finite steps as rejected, and CRLB
        # consumers need to see the failure rather than silent nonsense.
        safe_dk = jnp.where(dk > 0, dk, jnp.nan)
        inv_sqrt = jax.lax.rsqrt(safe_dk)[:, None]
        mask = jnp.asarray((idx >= k).astype(np.float32), dtype)[None, :]
        l_k = a[:, :, k] * mask * inv_sqrt
        a = a - l_k[:, :, None] * l_k[:, None, :]
        cols.append(l_k)
    l = jnp.stack(cols, axis=2)

    diag = []
    for j in range(f):
        # forward solve L x = e_j; accumulate sum of squares
        xs = [None] * f
        acc_sq = jnp.zeros((b,), dtype)
        for i in range(f):
            rhs = jnp.ones((b,), dtype) if i == j else jnp.zeros((b,), dtype)
            acc = rhs
            for m in range(j, i):
                if xs[m] is not None:
                    acc = acc - l[:, i, m] * xs[m]
            x_i = acc / l[:, i, i] if i >= j else None
            if i >= j:
                xs[i] = x_i
                acc_sq = acc_sq + x_i * x_i
        diag.append(acc_sq)
    return jnp.stack(diag, axis=1)  # (B, F)
