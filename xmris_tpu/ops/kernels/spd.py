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


# ---------------------------------------------------------------------------
# Pallas variants: the whole factorization stays in VMEM.
#
# The unrolled XLA form above fixed the batched-cholesky disaster, but each
# of its F rank-1 updates still materializes the full (B, F, F) tensor
# through HBM — ~2·F·B·F² bytes of traffic per solve (~1 GB at the bench
# shape B=16384, F=20), measured at ~1.9 ms per LM iteration in the r9
# fused-program trace (13 multiply_subtract_fusion instances).  The kernels
# below load one v_tile of systems into VMEM — voxels on the LANE dim, the
# (F, F) matrix unrolled over sublanes as an (F·F, V) slab, matching the
# native h_out layout of the eq6 moment kernels — and run the entire
# Cholesky + substitutions on registers/VMEM: HBM traffic drops to one read
# of (h, g) and one write of the solution.
# ---------------------------------------------------------------------------


def _compact_slab(a, f: int, f_pad: int):
    """(f_pad·f_pad, V) padded slab -> (f·f, V) compact slab (static slices).

    The LM moment kernels emit H with the free-parameter count rounded up
    to the sublane multiple (``f_pad = round_up(f, 8)``); the padding
    rows/columns carry unspecified values and are simply dropped.  One
    VMEM-local copy — the entire point of accepting the padded slab is to
    skip the (B, F, F) HBM round trip the driver used to pay per
    iteration.
    """
    if f_pad == f:
        return a
    return jnp.concatenate(
        [a[k * f_pad : k * f_pad + f, :] for k in range(f)], axis=0
    )


def _chol_cols_slab(a, f: int):
    """Cholesky-Crout on an (F·F, V) symmetric slab; returns L's columns.

    ``a`` holds A row-major: row ``i*f + j`` is A[i, j] across the V lane
    voxels.  Symmetry makes column k == row slab ``a[k*f:(k+1)*f]``, so the
    factorization never needs a strided (cross-sublane) gather.  Same
    update order and NaN semantics (non-SPD pivot -> NaN) as the XLA form.
    """
    # Masks come from in-kernel iota + where (float selects): trace-time
    # jnp constants would be captured consts (pallas rejects them) and
    # int->float converts don't legalize in Mosaic.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (f, 1), 0)
    cols = []
    for k in range(f):
        row_k = a[k * f : (k + 1) * f, :]  # == A[:, k] by symmetry
        dk = row_k[k : k + 1, :]
        safe_dk = jnp.where(dk > 0, dk, jnp.nan)
        inv_sqrt = jax.lax.rsqrt(safe_dk)  # (1, V)
        # (f, V), zeros above k
        l_k = jnp.where(row_idx >= k, row_k * inv_sqrt, 0.0)
        outer = l_k[:, None, :] * l_k[None, :, :]  # (f, f, V)
        # Leading-dim collapse only (sublane-aligned): Mosaic-legal.
        a = a - outer.reshape(f * f, a.shape[-1])
        cols.append(l_k)
    return cols


def _spd_solve_kernel(h_ref, g_ref, lam_ref, out_ref, *, f: int, f_pad=None):
    """One tile: damp + factor + solve F×F systems for V lane voxels."""
    a = h_ref[0, :, :]  # (f*f, V) — or (f_pad*f_pad, V), compacted below
    a = _compact_slab(a, f, f_pad or f)
    g = g_ref[0, :, :]  # (f, V)
    lam = lam_ref[0, :, :]  # (1, V)

    # LM damping, diagonal rows only: A[k,k] += lam*max(A[k,k], 1e-12) and
    # the absolute 1e-12 Tikhonov floor.  The diagonal sits at slab rows
    # k*(f+1); the where() masks the update off the other rows.
    slab_idx = jax.lax.broadcasted_iota(jnp.int32, (f * f, 1), 0)
    is_diag = (slab_idx % (f + 1)) == 0
    a = jnp.where(is_diag, a + lam * jnp.maximum(a, 1e-12) + 1e-12, a)

    cols = _chol_cols_slab(a, f)

    # Forward substitution  L y = g.
    ys = []
    for i in range(f):
        acc = g[i : i + 1, :]
        for j in range(i):
            acc = acc - cols[j][i : i + 1, :] * ys[j]
        ys.append(acc / cols[i][i : i + 1, :])

    # Backward substitution  L^T x = y   (L^T[i, j] = cols[i][j]).
    xs = [None] * f
    for i in reversed(range(f)):
        acc = ys[i]
        for j in range(i + 1, f):
            acc = acc - cols[i][j : j + 1, :] * xs[j]
        xs[i] = acc / cols[i][i : i + 1, :]

    out_ref[0, :, :] = jnp.concatenate(xs, axis=0)


def _spd_inv_diag_kernel(h_ref, out_ref, *, f: int, f_pad=None, tikhonov=0.0):
    """One tile: diag(A^-1) via (A^-1)_jj = sum_i (L^-1)_ij^2."""
    a = _compact_slab(h_ref[0, :, :], f, f_pad or f)
    if tikhonov:
        slab_idx = jax.lax.broadcasted_iota(jnp.int32, (f * f, 1), 0)
        a = jnp.where((slab_idx % (f + 1)) == 0, a + tikhonov, a)
    cols = _chol_cols_slab(a, f)

    # Rows of W = L^-1 by forward substitution with the identity RHS:
    # W[i] = (e_i - sum_{j<i} L[i,j] W[j]) / L[i,i], each row an (f, V)
    # vector across the lane voxels; diag(A^-1) = sum_i W[i]^2.
    acc_sq = jnp.zeros_like(a[:f, :])
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (f, 1), 0)
    rows = []
    for i in range(f):
        acc = jnp.where(row_idx == i, 1.0, 0.0)  # e_i across the RHS dim
        for j in range(i):
            acc = acc - cols[j][i : i + 1, :] * rows[j]
        w_i = acc / cols[i][i : i + 1, :]
        rows.append(w_i)
        acc_sq = acc_sq + w_i * w_i
    out_ref[0, :, :] = acc_sq


def _slab_layout(h: jax.Array, v_tile: int):
    """(B, F, F) -> padded (T, F·F, v_tile) lane-major slabs (+ pad info)."""
    b, f, _ = h.shape
    b_pad = -(-b // v_tile) * v_tile
    hp = jnp.pad(h, ((0, b_pad - b), (0, 0), (0, 0)))
    ht = (
        hp.reshape(b_pad // v_tile, v_tile, f, f)
        .transpose(0, 2, 3, 1)
        .reshape(b_pad // v_tile, f * f, v_tile)
    )
    return ht, b_pad


@functools.partial(jax.jit, static_argnames=("v_tile", "interpret"))
def spd_solve_damped_pallas(
    h: jax.Array,
    g: jax.Array,
    lam: jax.Array,
    *,
    v_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Solve ``(h + lam·diag(max(h_kk, 1e-12)) + 1e-12·I) x = g`` per voxel.

    h: (B, F, F) SPD, g: (B, F), lam: (B,).  One Pallas launch; each grid
    step holds ``v_tile`` voxels' systems in VMEM (lanes = voxels) and
    runs damping, Cholesky, and both substitutions without touching HBM
    in between.  Non-SPD systems yield NaN rows, matching
    :func:`spd_solve_small` under the LM drivers' damping.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, _ = h.shape
    ht, b_pad = _slab_layout(h.astype(jnp.float32), v_tile)
    n_tiles = b_pad // v_tile
    gt = (
        jnp.pad(g.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        .reshape(n_tiles, v_tile, f)
        .transpose(0, 2, 1)
    )
    lamt = jnp.pad(lam.astype(jnp.float32), (0, b_pad - b)).reshape(
        n_tiles, 1, v_tile
    )

    out = pl.pallas_call(
        functools.partial(_spd_solve_kernel, f=f),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f * f, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, f, v_tile), jnp.float32),
        interpret=interpret,
    )(ht, gt, lamt)
    return out.transpose(0, 2, 1).reshape(b_pad, f)[:b].astype(h.dtype)


@functools.partial(
    jax.jit, static_argnames=("f", "f_pad", "interpret")
)
def spd_solve_damped_pallas_slab(
    h_slab: jax.Array,
    g: jax.Array,
    lam: jax.Array,
    *,
    f: int,
    f_pad: int,
    interpret: bool = False,
) -> jax.Array:
    """:func:`spd_solve_damped_pallas` taking H in kernel-native slab form.

    ``h_slab``: (n_tiles, f_pad·f_pad, v_tile) — the layout the LM moment
    kernels emit (``eq6_normal_equations_pallas_v9(..., slab_h=True)``):
    voxels on lanes, each padded F×F matrix as row-major column slabs.
    ``g``: (B, f), ``lam``: (B,) with B ≤ n_tiles·v_tile.  Passing the slab
    straight through skips the (B, F, F) materialization AND this module's
    ``_slab_layout`` re-tiling — the two HBM relayouts the fused LM loop
    used to pay per iteration.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, ff, v_tile = h_slab.shape
    if ff != f_pad * f_pad:
        raise ValueError(
            f"h_slab row count {ff} != f_pad^2 = {f_pad * f_pad}"
        )
    b = g.shape[0]
    b_pad = n_tiles * v_tile
    gt = (
        jnp.pad(g.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        .reshape(n_tiles, v_tile, f)
        .transpose(0, 2, 1)
    )
    lamt = jnp.pad(lam.astype(jnp.float32), (0, b_pad - b)).reshape(
        n_tiles, 1, v_tile
    )

    out = pl.pallas_call(
        functools.partial(_spd_solve_kernel, f=f, f_pad=f_pad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad * f_pad, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, f, v_tile), jnp.float32),
        interpret=interpret,
    )(h_slab.astype(jnp.float32), gt, lamt)
    return out.transpose(0, 2, 1).reshape(b_pad, f)[:b].astype(g.dtype)


@functools.partial(
    jax.jit, static_argnames=("f", "f_pad", "tikhonov", "interpret")
)
def spd_inverse_diag_pallas_slab(
    h_slab: jax.Array,
    *,
    f: int,
    f_pad: int,
    tikhonov: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """diag(h^-1) from the kernel-native slab layout (one Pallas launch).

    Same contract as :func:`spd_inverse_diag_pallas` with ``h_slab`` as in
    :func:`spd_solve_damped_pallas_slab`; ``tikhonov`` adds a diagonal
    floor in-kernel (the CRLB path's ``+ 1e-12·I``) so no XLA pass touches
    the slab.  Returns (n_tiles·v_tile, f) — callers slice ``[:b]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, ff, v_tile = h_slab.shape
    if ff != f_pad * f_pad:
        raise ValueError(
            f"h_slab row count {ff} != f_pad^2 = {f_pad * f_pad}"
        )
    out = pl.pallas_call(
        functools.partial(
            _spd_inv_diag_kernel, f=f, f_pad=f_pad, tikhonov=tikhonov
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad * f_pad, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, f, v_tile), jnp.float32),
        interpret=interpret,
    )(h_slab.astype(jnp.float32))
    return out.transpose(0, 2, 1).reshape(n_tiles * v_tile, f)


@functools.partial(jax.jit, static_argnames=("v_tile", "interpret"))
def spd_inverse_diag_pallas(
    h: jax.Array, *, v_tile: int = 128, interpret: bool = False
) -> jax.Array:
    """diag(h^-1) for a batch of small SPD systems, one Pallas launch.

    Same contract as :func:`spd_inverse_diag` (NaN on non-SPD pivots);
    same VMEM-resident layout as :func:`spd_solve_damped_pallas`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, _ = h.shape
    ht, b_pad = _slab_layout(h.astype(jnp.float32), v_tile)
    n_tiles = b_pad // v_tile

    out = pl.pallas_call(
        functools.partial(_spd_inv_diag_kernel, f=f),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f * f, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, f, v_tile), jnp.float32),
        interpret=interpret,
    )(ht)
    return out.transpose(0, 2, 1).reshape(b_pad, f)[:b].astype(h.dtype)
