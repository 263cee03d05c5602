"""Pallas TPU kernel: fused Eq.6 normal equations for the batched LM fitter.

The LM iteration's hot op maps a parameter grid to (cost, gradient, Gauss-
Newton Hessian).  The XLA formulation materializes the (n_t x P) Jacobian
planes in HBM every iteration (~0.5 MB per voxel-iteration of pure traffic);
this kernel computes basis, Jacobian, residuals, H = J^T J, g = J^T r, and
the cost for a tile of voxels entirely in VMEM:

    HBM traffic per voxel-iteration = read y (2 planes) + write H, g, cost
                                    ~= 16 KB   (vs ~500 KB via XLA)

Everything is planar float32 (no complex dtype).  The Jacobian lives in a
(P_pad, n_t) VMEM scratch so the contraction J J^T runs as an MXU
dot_general over the lane dimension.

Layout notes (TPU tiling):
* time axis is the lane dimension (n_t multiple of 128 preferred),
* P_pad (rows of J) is the sublane dimension, padded to 8,
* per-voxel parameters are scalar-read from VMEM (K*5 values per voxel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEG = np.pi / 180.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prepare_tile_batch(params, y_re, y_im, n_peaks, v_tile, voxel_mask=None):
    """Shared wrapper prologue of the v5-v8 kernels.

    Pads the voxel batch to the tile size (padding voxels get amplitude 1
    "silence" so the math stays finite and count as inactive in the mask),
    builds the lane-contiguous (n_tiles, K*5, V) parameter layout, and
    reduces the optional per-voxel activity mask to per-tile flags.

    Returns ``(params_t, y_re, y_im, tiles_active, b, b_pad, n_tiles)``
    with the planar batches cast to float32 and ``b`` the original
    (pre-padding) batch size for output slicing.
    """
    b, _ = y_re.shape
    p = n_peaks * 5
    pad_b = (-b) % v_tile
    if pad_b:
        params = jnp.pad(params, ((0, pad_b), (0, 0)))
        params = params.at[b:, 0].set(1.0)
        y_re = jnp.pad(y_re, ((0, pad_b), (0, 0)))
        y_im = jnp.pad(y_im, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    n_tiles = b_pad // v_tile

    if voxel_mask is None:
        tiles_active = jnp.ones((n_tiles,), jnp.int32)
    else:
        vm = voxel_mask.astype(bool)
        if pad_b:
            vm = jnp.pad(vm, (0, pad_b))  # padding voxels are inactive
        tiles_active = jnp.any(vm.reshape(n_tiles, v_tile), axis=1).astype(
            jnp.int32
        )

    params_t = (
        params.astype(jnp.float32)
        .reshape(n_tiles, v_tile, p)
        .transpose(0, 2, 1)
    )
    return (
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        tiles_active,
        b,
        b_pad,
        n_tiles,
    )


def _normal_eq_kernel(
    params_ref,  # (V, K*5) VMEM
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (V, P_pad, P_pad) VMEM out
    g_ref,  # (V, P_pad) VMEM out
    cost_ref,  # (V, 1) VMEM out
    jre_ref,  # (P_pad, n_t) VMEM scratch
    jim_ref,  # (P_pad, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
):
    t = t_ref[0, :]  # (n_t,)
    n_t = t.shape[0]
    p_pad = jre_ref.shape[0]
    f32 = jnp.float32

    for v in range(v_tile):  # static unroll over the voxel tile
        m_re = jnp.zeros((n_t,), f32)
        m_im = jnp.zeros((n_t,), f32)

        for k in range(n_peaks):  # static unroll over peaks
            amp = params_ref[v, k * 5 + 0]
            cs = params_ref[v, k * 5 + 1]
            lw = params_ref[v, k * 5 + 2]
            ph = params_ref[v, k * 5 + 3]
            gg = params_ref[v, k * 5 + 4]

            d = jnp.pi * lw
            env = amp * jnp.exp(-d * (1.0 - gg + gg * t) * t)
            ang = (2.0 * jnp.pi * mhz) * cs * t + ph * _DEG
            b_re = env * jnp.cos(ang)
            b_im = env * jnp.sin(ang)

            m_re = m_re + b_re
            m_im = m_im + b_im

            safe_amp = jnp.where(amp == 0, 1.0, amp)
            w_cs = (2.0 * jnp.pi * mhz) * t
            w_lw = -jnp.pi * (1.0 - gg + gg * t) * t
            w_g = -d * (t * t - t)

            # d/d amp, cs, lw, phase, g  (planar: i*c maps (re,im)->(-c*im, c*re))
            jre_ref[k * 5 + 0, :] = b_re / safe_amp
            jim_ref[k * 5 + 0, :] = b_im / safe_amp
            jre_ref[k * 5 + 1, :] = -w_cs * b_im
            jim_ref[k * 5 + 1, :] = w_cs * b_re
            jre_ref[k * 5 + 2, :] = w_lw * b_re
            jim_ref[k * 5 + 2, :] = w_lw * b_im
            jre_ref[k * 5 + 3, :] = -_DEG * b_im
            jim_ref[k * 5 + 3, :] = _DEG * b_re
            jre_ref[k * 5 + 4, :] = w_g * b_re
            jim_ref[k * 5 + 4, :] = w_g * b_im

        # Zero the padding rows once per voxel
        for p in range(n_peaks * 5, p_pad):
            jre_ref[p, :] = jnp.zeros((n_t,), f32)
            jim_ref[p, :] = jnp.zeros((n_t,), f32)

        r_re = yre_ref[v, :] - m_re
        r_im = yim_ref[v, :] - m_im

        jre = jre_ref[:, :]
        jim = jim_ref[:, :]
        contract = (((1,), (1,)), ((), ()))
        h = jax.lax.dot_general(
            jre, jre, contract, preferred_element_type=f32
        ) + jax.lax.dot_general(jim, jim, contract, preferred_element_type=f32)

        # Matvec as multiply+lane-reduce (Mosaic rejects dot_general with a
        # 1-sized contraction result here).
        g = jnp.sum(jre * r_re[None, :], axis=1) + jnp.sum(
            jim * r_im[None, :], axis=1
        )

        h_ref[v, :, :] = h
        g_ref[v, :] = g
        cost = jnp.sum(r_re * r_re) + jnp.sum(r_im * r_im)
        cost_ref[v, :] = cost.reshape(1)


@functools.partial(
    jax.jit, static_argnames=("n_peaks", "mhz", "v_tile", "interpret")
)
def eq6_normal_equations_pallas(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,  # (B, n_t)
    y_im,  # (B, n_t)
    t,  # (n_t,)
    n_peaks: int,
    mhz: float,
    v_tile: int = 8,
    interpret: bool = False,
):
    """Fused (cost, g, H) of the Eq.6 model for every voxel in the batch.

    Returns ``(cost (B,), g (B, P), h (B, P, P))`` with P = n_peaks*5, in
    *physical* parameter space (bound-transform chain rule applied by the
    caller — it's a cheap diagonal scaling).
    """
    b, n_t = y_re.shape
    p = n_peaks * 5
    p_pad = _round_up(p, 8)

    pad_b = (-b) % v_tile
    if pad_b:
        params = jnp.pad(params, ((0, pad_b), (0, 0)))
        # Padding rows fit "amplitude 1" silence: keeps math finite.
        params = params.at[b:, 0].set(1.0)
        y_re = jnp.pad(y_re, ((0, pad_b), (0, 0)))
        y_im = jnp.pad(y_im, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    grid = (b_pad // v_tile,)

    kernel = functools.partial(
        _normal_eq_kernel, n_peaks=n_peaks, mhz=float(mhz), v_tile=v_tile
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((v_tile, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (v_tile, p_pad, p_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, p_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, p_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p_pad, n_t), jnp.float32),
            pltpu.VMEM((p_pad, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        params.astype(jnp.float32),
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    # Strip batch padding and P padding
    return cost_out[:b, 0], g_out[:b, :p], h_out[:b, :p, :p]


# ---------------------------------------------------------------------------
# v2: sublane-vectorized kernel (8 voxels per VPU op)
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v2(
    params_ref,  # (1, K*5, V) VMEM — parameters lane-contiguous per tile
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (1, P_pad*P_pad, V) VMEM out
    g_ref,  # (1, P_pad, V) VMEM out
    cost_ref,  # (1, 1, V) VMEM out
    jre_ref,  # (P, V, n_t) VMEM scratch
    jim_ref,  # (P, V, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    p_pad: int,
):
    """Vectorized variant of :func:`_normal_eq_kernel`.

    The v1 kernel iterates voxels with (1, n_t)-shaped vectors, using one of
    the VPU's 8 sublanes; here every elementwise op runs on (V, n_t) blocks
    (full sublane utilization) and the normal equations accumulate as
    multiply + lane-reduce pairs, so H/g for all V voxels emerge together.
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    p = n_peaks * 5
    f32 = jnp.float32

    m_re = jnp.zeros((v_tile, n_t), f32)
    m_im = jnp.zeros((v_tile, n_t), f32)

    for k in range(n_peaks):  # static unroll over peaks
        amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
        cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
        lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
        ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)
        gg = params_ref[0, k * 5 + 4, :].reshape(v_tile, 1)

        d = jnp.pi * lw
        damp_profile = (1.0 - gg + gg * t) * t  # (V, n_t)
        env = amp * jnp.exp(-d * damp_profile)
        ang = (2.0 * jnp.pi * mhz) * cs * t + ph * _DEG
        b_re = env * jnp.cos(ang)
        b_im = env * jnp.sin(ang)

        m_re = m_re + b_re
        m_im = m_im + b_im

        safe_amp = jnp.where(amp == 0, 1.0, amp)
        w_cs = (2.0 * jnp.pi * mhz) * t  # (1, n_t)
        w_lw = -jnp.pi * damp_profile  # (V, n_t)
        w_g = -d * (t * t - t)  # (V, n_t)

        jre_ref[k * 5 + 0, :, :] = b_re / safe_amp
        jim_ref[k * 5 + 0, :, :] = b_im / safe_amp
        jre_ref[k * 5 + 1, :, :] = -w_cs * b_im
        jim_ref[k * 5 + 1, :, :] = w_cs * b_re
        jre_ref[k * 5 + 2, :, :] = w_lw * b_re
        jim_ref[k * 5 + 2, :, :] = w_lw * b_im
        jre_ref[k * 5 + 3, :, :] = -_DEG * b_im
        jim_ref[k * 5 + 3, :, :] = _DEG * b_re
        jre_ref[k * 5 + 4, :, :] = w_g * b_re
        jim_ref[k * 5 + 4, :, :] = w_g * b_im

    r_re = yre_ref[:, :] - m_re
    r_im = yim_ref[:, :] - m_im

    # Normal equations: 55 multiply+lane-reduce pairs, each on (V, n_t)
    for a in range(p):
        ja_re = jre_ref[a, :, :]
        ja_im = jim_ref[a, :, :]
        for b in range(a, p):
            vec = jnp.sum(
                ja_re * jre_ref[b, :, :] + ja_im * jim_ref[b, :, :], axis=1
            )  # (V,)
            h_ref[0, a * p_pad + b, :] = vec
            if b != a:
                h_ref[0, b * p_pad + a, :] = vec
        g_ref[0, a, :] = jnp.sum(ja_re * r_re + ja_im * r_im, axis=1)

    # Zero padding rows of H/g once
    for a in range(p, p_pad):
        g_ref[0, a, :] = jnp.zeros((v_tile,), f32)
        for b in range(p_pad):
            h_ref[0, a * p_pad + b, :] = jnp.zeros((v_tile,), f32)
            h_ref[0, b * p_pad + a, :] = jnp.zeros((v_tile,), f32)

    cost_ref[0, 0, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1)


# ---------------------------------------------------------------------------
# v3: vectorized basis + MXU normal equations (scales to many peaks)
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v3(
    params_ref,  # (1, K*5, V) VMEM — parameters lane-contiguous per tile
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (V, P_pad, P_pad) VMEM out
    g_ref,  # (V, P_pad) VMEM out
    cost_ref,  # (V, 1) VMEM out
    jre_ref,  # (V, P_pad, n_t) VMEM scratch
    jim_ref,  # (V, P_pad, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    p_pad: int,
):
    """Hybrid of the v1/v2 kernels.

    Basis + Jacobian evaluation runs sublane-vectorized on (V, n_t) blocks
    (v2's layout: full VPU utilization on the transcendental-heavy part);
    the normal equations then run as per-voxel ``dot_general`` contractions
    over the lane dimension on the MXU (v1's layout).  v2 assembles H with
    P*(P+1)/2 multiply+lane-reduce pairs — O(P^2) VPU passes that dominate
    once priors grow past a few peaks (P = 25 for a 5-peak 31P prior);
    here H costs one (P_pad, n_t) x (n_t, P_pad) MXU contraction per voxel
    regardless of P.
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    p = n_peaks * 5
    f32 = jnp.float32

    m_re = jnp.zeros((v_tile, n_t), f32)
    m_im = jnp.zeros((v_tile, n_t), f32)

    for k in range(n_peaks):  # static unroll over peaks
        amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
        cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
        lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
        ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)
        gg = params_ref[0, k * 5 + 4, :].reshape(v_tile, 1)

        d = jnp.pi * lw
        damp_profile = (1.0 - gg + gg * t) * t  # (V, n_t)
        env = amp * jnp.exp(-d * damp_profile)
        ang = (2.0 * jnp.pi * mhz) * cs * t + ph * _DEG
        b_re = env * jnp.cos(ang)
        b_im = env * jnp.sin(ang)

        m_re = m_re + b_re
        m_im = m_im + b_im

        safe_amp = jnp.where(amp == 0, 1.0, amp)
        w_cs = (2.0 * jnp.pi * mhz) * t  # (1, n_t)
        w_lw = -jnp.pi * damp_profile  # (V, n_t)
        w_g = -d * (t * t - t)  # (V, n_t)

        jre_ref[:, k * 5 + 0, :] = b_re / safe_amp
        jim_ref[:, k * 5 + 0, :] = b_im / safe_amp
        jre_ref[:, k * 5 + 1, :] = -w_cs * b_im
        jim_ref[:, k * 5 + 1, :] = w_cs * b_re
        jre_ref[:, k * 5 + 2, :] = w_lw * b_re
        jim_ref[:, k * 5 + 2, :] = w_lw * b_im
        jre_ref[:, k * 5 + 3, :] = -_DEG * b_im
        jim_ref[:, k * 5 + 3, :] = _DEG * b_re
        jre_ref[:, k * 5 + 4, :] = w_g * b_re
        jim_ref[:, k * 5 + 4, :] = w_g * b_im

    # Zero padding rows once (vectorized over voxels)
    for a in range(p, p_pad):
        jre_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)
        jim_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)

    r_re = yre_ref[:, :] - m_re  # (V, n_t)
    r_im = yim_ref[:, :] - m_im

    contract = (((1,), (1,)), ((), ()))
    for v in range(v_tile):  # static unroll: per-voxel MXU contraction
        jre = jre_ref[v, :, :]  # (P_pad, n_t)
        jim = jim_ref[v, :, :]
        h = jax.lax.dot_general(
            jre, jre, contract, preferred_element_type=f32
        ) + jax.lax.dot_general(jim, jim, contract, preferred_element_type=f32)
        g = jnp.sum(jre * r_re[v, :][None, :], axis=1) + jnp.sum(
            jim * r_im[v, :][None, :], axis=1
        )
        h_ref[v, :, :] = h
        g_ref[v, :] = g

    cost_ref[:, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1).reshape(
        v_tile, 1
    )


@functools.partial(
    jax.jit, static_argnames=("n_peaks", "mhz", "v_tile", "interpret")
)
def eq6_normal_equations_pallas_v3(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    v_tile: int = 8,
    interpret: bool = False,
):
    """Vectorized-basis + MXU-contraction fused normal equations (v1 API)."""
    b, n_t = y_re.shape
    p = n_peaks * 5
    p_pad = _round_up(p, 8)

    pad_b = (-b) % v_tile
    if pad_b:
        params = jnp.pad(params, ((0, pad_b), (0, 0)))
        params = params.at[b:, 0].set(1.0)
        y_re = jnp.pad(y_re, ((0, pad_b), (0, 0)))
        y_im = jnp.pad(y_im, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    grid = (b_pad // v_tile,)

    params_t = (
        params.astype(jnp.float32)
        .reshape(grid[0], v_tile, p)
        .transpose(0, 2, 1)
    )

    kernel = functools.partial(
        _normal_eq_kernel_v3,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        p_pad=p_pad,
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (v_tile, p_pad, p_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((v_tile, p_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, p_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_tile, p_pad, n_t), jnp.float32),
            pltpu.VMEM((v_tile, p_pad, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    return cost_out[:b, 0], g_out[:b, :p], h_out[:b, :p, :p]


# ---------------------------------------------------------------------------
# v5: v3 restricted to ACTIVE parameter rows (fixed params contribute only
# zero columns through the scatter matrix — never compute/store/contract
# their Jacobian rows)
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v5(
    params_ref,  # (1, K*5, V) VMEM — parameters lane-contiguous per tile
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (V, A_pad, A_pad) VMEM out
    g_ref,  # (V, A_pad) VMEM out
    cost_ref,  # (V, 1) VMEM out
    jre_ref,  # (V, A_pad, n_t) VMEM scratch
    jim_ref,  # (V, A_pad, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
):
    """v3's vectorized basis + MXU contraction over *active rows only*.

    ``active`` lists the flat physical-parameter indices (k*5 + p) whose
    scatter-matrix row is nonzero (free or tied).  Fixed parameters
    (idx = -1) multiply by a zero row in the free-space fold anyway, so
    computing, storing, and contracting their Jacobian rows is pure waste —
    a 5-peak Lorentzian prior (g fixed) shrinks P 25 -> 20 and the dot
    padding 32 -> 24 (56% of the contraction FLOPs).
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    f32 = jnp.float32
    active_set = frozenset(active)
    row_of = {j: r for r, j in enumerate(active)}

    m_re = jnp.zeros((v_tile, n_t), f32)
    m_im = jnp.zeros((v_tile, n_t), f32)

    for k in range(n_peaks):  # static unroll over peaks
        amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
        cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
        lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
        ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)
        gg = params_ref[0, k * 5 + 4, :].reshape(v_tile, 1)

        d = jnp.pi * lw
        damp_profile = (1.0 - gg + gg * t) * t  # (V, n_t)
        env = amp * jnp.exp(-d * damp_profile)
        ang = (2.0 * jnp.pi * mhz) * cs * t + ph * _DEG
        b_re = env * jnp.cos(ang)
        b_im = env * jnp.sin(ang)

        m_re = m_re + b_re
        m_im = m_im + b_im

        if k * 5 + 0 in active_set:
            safe_amp = jnp.where(amp == 0, 1.0, amp)
            r = row_of[k * 5 + 0]
            jre_ref[:, r, :] = b_re / safe_amp
            jim_ref[:, r, :] = b_im / safe_amp
        if k * 5 + 1 in active_set:
            w_cs = (2.0 * jnp.pi * mhz) * t  # (1, n_t)
            r = row_of[k * 5 + 1]
            jre_ref[:, r, :] = -w_cs * b_im
            jim_ref[:, r, :] = w_cs * b_re
        if k * 5 + 2 in active_set:
            w_lw = -jnp.pi * damp_profile  # (V, n_t)
            r = row_of[k * 5 + 2]
            jre_ref[:, r, :] = w_lw * b_re
            jim_ref[:, r, :] = w_lw * b_im
        if k * 5 + 3 in active_set:
            r = row_of[k * 5 + 3]
            jre_ref[:, r, :] = -_DEG * b_im
            jim_ref[:, r, :] = _DEG * b_re
        if k * 5 + 4 in active_set:
            w_g = -d * (t * t - t)  # (V, n_t)
            r = row_of[k * 5 + 4]
            jre_ref[:, r, :] = w_g * b_re
            jim_ref[:, r, :] = w_g * b_im

    for a in range(len(active), a_pad):  # zero padding rows once
        jre_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)
        jim_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)

    r_re = yre_ref[:, :] - m_re  # (V, n_t)
    r_im = yim_ref[:, :] - m_im

    contract = (((1,), (1,)), ((), ()))
    for v in range(v_tile):  # static unroll: per-voxel MXU contraction
        jre = jre_ref[v, :, :]  # (A_pad, n_t)
        jim = jim_ref[v, :, :]
        h = jax.lax.dot_general(
            jre, jre, contract, preferred_element_type=f32
        ) + jax.lax.dot_general(jim, jim, contract, preferred_element_type=f32)
        g = jnp.sum(jre * r_re[v, :][None, :], axis=1) + jnp.sum(
            jim * r_im[v, :][None, :], axis=1
        )
        h_ref[v, :, :] = h
        g_ref[v, :] = g

    cost_ref[:, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1).reshape(
        v_tile, 1
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_peaks", "mhz", "active", "v_tile", "interpret"),
)
def eq6_normal_equations_pallas_v5(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    v_tile: int = 8,
    interpret: bool = False,
):
    """Active-rows-only fused normal equations.

    Returns ``(cost (B,), g (B, A), h (B, A, A))`` with A = len(active) —
    the rows/columns correspond to ``active``'s flat physical indices, in
    order.  Callers fold to free space with the scatter matrix restricted
    to those rows (identical math: the dropped rows are exactly the ones
    whose scatter rows are zero).
    """
    n_t = y_re.shape[-1]
    a = len(active)
    a_pad = _round_up(a, 8)
    p = n_peaks * 5

    params_t, y_re, y_im, _, b, b_pad, n_tiles = _prepare_tile_batch(
        params, y_re, y_im, n_peaks, v_tile
    )
    grid = (n_tiles,)

    kernel = functools.partial(
        _normal_eq_kernel_v5,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        active=tuple(active),
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (v_tile, a_pad, a_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((v_tile, a_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, a_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    return cost_out[:b, 0], g_out[:b, :a], h_out[:b, :a, :a]


# ---------------------------------------------------------------------------
# v6: v5 + voxel-stacked MXU Gram contractions + converged-tile skipping
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v6(
    mask_ref,  # (n_tiles,) SMEM — 1 if any voxel in this tile is active
    params_ref,  # (1, K*5, V) VMEM — parameters lane-contiguous per tile
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (V, A_pad, A_pad) VMEM out
    g_ref,  # (V, A_pad) VMEM out
    cost_ref,  # (V, 1) VMEM out
    jre_ref,  # (V, A_pad, n_t) VMEM scratch
    jim_ref,  # (V, A_pad, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
):
    """v5 with two extra hardware wins.

    1. **Voxel-stacked Gram dots.** One voxel's normal equations are a
       (A_pad, n_t) x (n_t, A_pad) contraction — with A_pad = 24 it uses 24
       of the MXU's 128 rows, and a dot with M, N <= 128 costs the same
       ceil(K/128) systolic passes regardless of M and N.  Stacking
       S = 128 // A_pad voxels' Jacobians row-wise computes S Hessians in
       ONE dot of identical cost (the off-diagonal cross-voxel blocks are
       discarded): ~4x fewer MXU passes at v_tile = 8, A_pad = 24.

    2. **Converged-tile skipping.** The LM driver runs until every voxel's
       convergence flag is set, but the median voxel finishes in a third of
       the iterations the slowest one needs.  The driver passes a per-tile
       activity scalar (prefetched to SMEM); fully-converged tiles skip the
       whole body via ``pl.when`` — their stale outputs are never selected
       by the driver's ``done``-gated accept logic.
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    f32 = jnp.float32
    active_set = frozenset(active)
    row_of = {j: r for r, j in enumerate(active)}
    n_active = len(active)

    @pl.when(mask_ref[pl.program_id(0)] != 0)
    def _body():
        m_re = jnp.zeros((v_tile, n_t), f32)
        m_im = jnp.zeros((v_tile, n_t), f32)

        for k in range(n_peaks):  # static unroll over peaks
            amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
            cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
            lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
            ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)
            gg = params_ref[0, k * 5 + 4, :].reshape(v_tile, 1)

            d = jnp.pi * lw
            damp_profile = (1.0 - gg + gg * t) * t  # (V, n_t)
            env = amp * jnp.exp(-d * damp_profile)
            ang = (2.0 * jnp.pi * mhz) * cs * t + ph * _DEG
            b_re = env * jnp.cos(ang)
            b_im = env * jnp.sin(ang)

            m_re = m_re + b_re
            m_im = m_im + b_im

            if k * 5 + 0 in active_set:
                safe_amp = jnp.where(amp == 0, 1.0, amp)
                r = row_of[k * 5 + 0]
                jre_ref[:, r, :] = b_re / safe_amp
                jim_ref[:, r, :] = b_im / safe_amp
            if k * 5 + 1 in active_set:
                w_cs = (2.0 * jnp.pi * mhz) * t  # (1, n_t)
                r = row_of[k * 5 + 1]
                jre_ref[:, r, :] = -w_cs * b_im
                jim_ref[:, r, :] = w_cs * b_re
            if k * 5 + 2 in active_set:
                w_lw = -jnp.pi * damp_profile  # (V, n_t)
                r = row_of[k * 5 + 2]
                jre_ref[:, r, :] = w_lw * b_re
                jim_ref[:, r, :] = w_lw * b_im
            if k * 5 + 3 in active_set:
                r = row_of[k * 5 + 3]
                jre_ref[:, r, :] = -_DEG * b_im
                jim_ref[:, r, :] = _DEG * b_re
            if k * 5 + 4 in active_set:
                w_g = -d * (t * t - t)  # (V, n_t)
                r = row_of[k * 5 + 4]
                jre_ref[:, r, :] = w_g * b_re
                jim_ref[:, r, :] = w_g * b_im

        for a in range(n_active, a_pad):  # zero padding rows once
            jre_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)
            jim_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)

        r_re = yre_ref[:, :] - m_re  # (V, n_t)
        r_im = yim_ref[:, :] - m_im

        # Gradient + cost, vectorized over the whole tile
        g_all = jnp.sum(jre_ref[:, :, :] * r_re[:, None, :], axis=2) + jnp.sum(
            jim_ref[:, :, :] * r_im[:, None, :], axis=2
        )  # (V, A_pad)
        g_ref[:, :] = g_all
        cost_ref[:, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1).reshape(
            v_tile, 1
        )

        # Stacked Gram contractions: S voxels per MXU dot
        s = max(1, 128 // a_pad)
        contract = (((1,), (1,)), ((), ()))
        for v0 in range(0, v_tile, s):
            vs = min(s, v_tile - v0)
            rows = vs * a_pad
            # (vs, A_pad, n_t) -> (vs*A_pad, n_t): contiguity-preserving
            # collapse (A_pad is a sublane multiple, so tiles don't straddle
            # voxels)
            jre = jre_ref[v0 : v0 + vs, :, :].reshape(rows, n_t)
            jim = jim_ref[v0 : v0 + vs, :, :].reshape(rows, n_t)
            big = jax.lax.dot_general(
                jre, jre, contract, preferred_element_type=f32
            ) + jax.lax.dot_general(
                jim, jim, contract, preferred_element_type=f32
            )  # (rows, rows); voxel v's H is the v-th diagonal block
            for dv in range(vs):
                h_ref[v0 + dv, :, :] = big[
                    dv * a_pad : (dv + 1) * a_pad, dv * a_pad : (dv + 1) * a_pad
                ]


@functools.partial(
    jax.jit,
    static_argnames=("n_peaks", "mhz", "active", "v_tile", "interpret"),
)
def eq6_normal_equations_pallas_v6(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    voxel_mask=None,  # (B,) bool — False voxels may be skipped (tile-granular)
    v_tile: int = 8,
    interpret: bool = False,
):
    """Active-rows fused normal equations with stacked-voxel MXU dots.

    Same contract as :func:`eq6_normal_equations_pallas_v5` plus an optional
    ``voxel_mask``: tiles whose 8 voxels are all ``False`` are skipped
    entirely and their outputs are UNSPECIFIED (stale VMEM) — callers must
    gate on their own convergence state, which the LM driver already does.
    """
    n_t = y_re.shape[-1]
    a = len(active)
    a_pad = _round_up(a, 8)
    p = n_peaks * 5

    params_t, y_re, y_im, tiles_active, b, b_pad, n_tiles = (
        _prepare_tile_batch(params, y_re, y_im, n_peaks, v_tile, voxel_mask)
    )
    grid = (n_tiles,)

    kernel = functools.partial(
        _normal_eq_kernel_v6,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        active=tuple(active),
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (v_tile, a_pad, a_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((v_tile, a_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, a_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        tiles_active,
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    return cost_out[:b, 0], g_out[:b, :a], h_out[:b, :a, :a]


# ---------------------------------------------------------------------------
# v7: v6 + block-decomposed transcendentals
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v7(
    mask_ref,  # (n_tiles,) SMEM
    params_ref,  # (1, K*5, V) VMEM
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (V, A_pad, A_pad) VMEM out
    g_ref,  # (V, A_pad) VMEM out
    cost_ref,  # (V, 1) VMEM out
    jre_ref,  # (V, A_pad, n_t) VMEM scratch
    jim_ref,  # (V, A_pad, n_t) VMEM scratch
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
    env_fast: tuple[bool, ...],
):
    """v6 with the per-peak basis factored over 128-sample blocks.

    For uniform time samples, ``t[q*128 + r] = t[r] + t_q`` with
    ``t_q = t[q*128] - t[0]``, so the complex basis
    ``amp * exp((alpha + i*omega) t + i*phi)`` is a rank-1 product of a
    per-block scalar factor (n_t/128 transcendental pairs per voxel-peak)
    and a shared 128-wide base — ~7.5x fewer exp/cos/sin lanes, replaced by
    complex multiplies the VPU does at full rate.  The envelope factors
    only when the peak's g is fixed at exactly 0 (``env_fast[k]``, the
    Lorentzian case of every standard 31P prior); the angular part factors
    always.  Accuracy is *better* than the direct evaluation: the factored
    angles are ~8x smaller before f32 rounding.

    Requires uniform ``t`` and ``n_t % 128 == 0`` (the wrapper falls back
    to v6 otherwise).
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    n_q = n_t // 128
    f32 = jnp.float32
    active_set = frozenset(active)
    row_of = {j: r for r, j in enumerate(active)}
    n_active = len(active)

    @pl.when(mask_ref[pl.program_id(0)] != 0)
    def _body():
        t_r = t[:, :128]  # (1, 128) first-block times
        t0 = t_ref[0, 0]
        t_qs = [t_ref[0, q * 128] - t0 for q in range(n_q)]  # scalars

        m_re = jnp.zeros((v_tile, n_t), f32)
        m_im = jnp.zeros((v_tile, n_t), f32)

        for k in range(n_peaks):  # static unroll over peaks
            amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
            cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
            lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
            ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)
            gg = params_ref[0, k * 5 + 4, :].reshape(v_tile, 1)

            d = jnp.pi * lw
            w = (2.0 * jnp.pi * mhz) * cs  # (V, 1) angular rate

            if env_fast[k]:
                # Lorentzian: full basis factors as F_q * G_r.
                # G_r = exp(-d t_r) * e^{i (w t_r + phi)}   (V, 128)
                # F_q = amp * exp(-d t_q) * e^{i w t_q}     (V, 1) per block
                ang_r = w * t_r + ph * _DEG
                er = jnp.exp(-d * t_r)
                gr_re = er * jnp.cos(ang_r)
                gr_im = er * jnp.sin(ang_r)
                blocks_re = []
                blocks_im = []
                for q in range(n_q):
                    tq = t_qs[q]
                    fq = amp * jnp.exp(-d * tq)  # (V, 1)
                    ang_q = w * tq
                    fq_re = fq * jnp.cos(ang_q)
                    fq_im = fq * jnp.sin(ang_q)
                    blocks_re.append(fq_re * gr_re - fq_im * gr_im)
                    blocks_im.append(fq_re * gr_im + fq_im * gr_re)
                b_re = jnp.concatenate(blocks_re, axis=1)  # (V, n_t)
                b_im = jnp.concatenate(blocks_im, axis=1)
                damp_profile = t  # (1, n_t): g == 0
            else:
                # General Voigt envelope (g free or fixed nonzero): classic
                # envelope, factored angle.
                damp_profile = (1.0 - gg + gg * t) * t  # (V, n_t)
                env = amp * jnp.exp(-d * damp_profile)
                ang_r = w * t_r + ph * _DEG
                cr = jnp.cos(ang_r)
                sr = jnp.sin(ang_r)
                blocks_re = []
                blocks_im = []
                for q in range(n_q):
                    ang_q = w * t_qs[q]
                    cq = jnp.cos(ang_q)
                    sq = jnp.sin(ang_q)
                    blocks_re.append(cq * cr - sq * sr)
                    blocks_im.append(cq * sr + sq * cr)
                b_re = env * jnp.concatenate(blocks_re, axis=1)
                b_im = env * jnp.concatenate(blocks_im, axis=1)

            m_re = m_re + b_re
            m_im = m_im + b_im

            if k * 5 + 0 in active_set:
                safe_amp = jnp.where(amp == 0, 1.0, amp)
                r = row_of[k * 5 + 0]
                jre_ref[:, r, :] = b_re / safe_amp
                jim_ref[:, r, :] = b_im / safe_amp
            if k * 5 + 1 in active_set:
                w_cs = (2.0 * jnp.pi * mhz) * t  # (1, n_t)
                r = row_of[k * 5 + 1]
                jre_ref[:, r, :] = -w_cs * b_im
                jim_ref[:, r, :] = w_cs * b_re
            if k * 5 + 2 in active_set:
                w_lw = -jnp.pi * damp_profile
                r = row_of[k * 5 + 2]
                jre_ref[:, r, :] = w_lw * b_re
                jim_ref[:, r, :] = w_lw * b_im
            if k * 5 + 3 in active_set:
                r = row_of[k * 5 + 3]
                jre_ref[:, r, :] = -_DEG * b_im
                jim_ref[:, r, :] = _DEG * b_re
            if k * 5 + 4 in active_set:
                w_g = -d * (t * t - t)  # (V or 1, n_t)
                r = row_of[k * 5 + 4]
                jre_ref[:, r, :] = jnp.broadcast_to(
                    w_g * b_re, (v_tile, n_t)
                )
                jim_ref[:, r, :] = jnp.broadcast_to(
                    w_g * b_im, (v_tile, n_t)
                )

        for a in range(n_active, a_pad):  # zero padding rows once
            jre_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)
            jim_ref[:, a, :] = jnp.zeros((v_tile, n_t), f32)

        r_re = yre_ref[:, :] - m_re  # (V, n_t)
        r_im = yim_ref[:, :] - m_im

        g_all = jnp.sum(jre_ref[:, :, :] * r_re[:, None, :], axis=2) + jnp.sum(
            jim_ref[:, :, :] * r_im[:, None, :], axis=2
        )  # (V, A_pad)
        g_ref[:, :] = g_all
        cost_ref[:, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1).reshape(
            v_tile, 1
        )

        s = max(1, 128 // a_pad)
        contract = (((1,), (1,)), ((), ()))
        for v0 in range(0, v_tile, s):
            vs = min(s, v_tile - v0)
            rows = vs * a_pad
            jre = jre_ref[v0 : v0 + vs, :, :].reshape(rows, n_t)
            jim = jim_ref[v0 : v0 + vs, :, :].reshape(rows, n_t)
            big = jax.lax.dot_general(
                jre, jre, contract, preferred_element_type=f32
            ) + jax.lax.dot_general(
                jim, jim, contract, preferred_element_type=f32
            )
            for dv in range(vs):
                h_ref[v0 + dv, :, :] = big[
                    dv * a_pad : (dv + 1) * a_pad, dv * a_pad : (dv + 1) * a_pad
                ]


def eq6_normal_equations_pallas_v7(
    params,
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    env_fast: tuple[bool, ...],
    voxel_mask=None,
    v_tile: int = 8,
    interpret: bool = False,
):
    """v6 + block-factored transcendental basis (uniform ``t`` required).

    ``env_fast[k]`` marks peaks whose g is fixed at 0 (purely Lorentzian):
    their envelope factors over blocks too.  Same output contract as v6.

    The factorization ``t[q*128+r] = t[r] + t_q`` holds only for uniform
    sampling; a concrete non-uniform ``t`` is rejected here.  Traced calls
    (e.g. from the jitted LM driver) cannot be inspected — the library
    paths that select v7 (``fit_amares``) build uniform axes by
    construction, so the guard protects direct eager use.
    """
    if not isinstance(t, jax.core.Tracer):
        # Single source of truth for the uniformity tolerance: the LM
        # driver's _t_is_uniform (16*eps*max|t|).  A looser local check
        # here once accepted ~1e-5 relative jitter the driver rejects —
        # silently degraded Jacobians under a violated factorization.
        from xmris_tpu.fitting.lm import _t_is_uniform

        if not _t_is_uniform(t):
            raise ValueError(
                "kernel_version=7 requires a uniformly sampled time axis "
                "(the block factorization t[q*128+r] = t[r] + t_q fails "
                "otherwise); use kernel_version=6"
            )
    return _eq6_normal_equations_pallas_v7_jit(
        params, y_re, y_im, t, n_peaks=n_peaks, mhz=mhz, active=active,
        env_fast=env_fast, voxel_mask=voxel_mask, v_tile=v_tile,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_peaks", "mhz", "active", "env_fast", "v_tile", "interpret"
    ),
)
def _eq6_normal_equations_pallas_v7_jit(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    env_fast: tuple[bool, ...],
    voxel_mask=None,
    v_tile: int = 8,
    interpret: bool = False,
):
    n_t = y_re.shape[-1]
    a = len(active)
    a_pad = _round_up(a, 8)

    if n_t % 128:
        raise ValueError("v7 requires n_t % 128 == 0; use kernel_version=6")
    p = n_peaks * 5

    params_t, y_re, y_im, tiles_active, b, b_pad, n_tiles = (
        _prepare_tile_batch(params, y_re, y_im, n_peaks, v_tile, voxel_mask)
    )
    grid = (n_tiles,)

    kernel = functools.partial(
        _normal_eq_kernel_v7,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        active=tuple(active),
        env_fast=tuple(env_fast),
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (v_tile, a_pad, a_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((v_tile, a_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, a_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
            pltpu.VMEM((v_tile, a_pad, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        tiles_active,
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    return cost_out[:b, 0], g_out[:b, :a], h_out[:b, :a, :a]


# ---------------------------------------------------------------------------
# v8: moment-based normal equations (g-fixed priors) — no Jacobian storage
# ---------------------------------------------------------------------------


def _normal_eq_kernel_v8(
    mask_ref,  # (n_tiles,) SMEM
    params_ref,  # (1, K*5, V) VMEM
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    h_ref,  # (1, A_pad*A_pad, V) VMEM out — V on lanes (v2's layout)
    g_ref,  # (1, A_pad, V) VMEM out
    cost_ref,  # (1, 1, V) VMEM out
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
):
    """Moment-based (cost, g, H) for purely Lorentzian priors (every g
    fixed at 0).

    Every Jacobian row is then ``(alpha + i*beta) * t^p * B_k`` with
    per-voxel scalars (amp: (1/a, 0) p=0; cs: (0, 2*pi*MHz) p=1; lw:
    (-pi, 0) p=1; phase: (0, pi/180) p=0), so the whole Gram matrix
    collapses to THREE complex moments per peak pair,

        M_q[k, k'] = sum_t t^q B_k conj(B_k'),  q in {0, 1, 2},

    combined entry-wise with scalar coefficients:
    ``H[r, s] = Re(z_r conj(z_s) M_{p_r + p_s}[k_r, k_s])``.  The gradient
    likewise needs two residual moments per peak.  Nothing (V, n_t)-sized
    is ever stored — no Jacobian scratch, no MXU contraction — which
    removes the VMEM store/load round trips that bind v5/v6/v7.
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    f32 = jnp.float32
    deg = _DEG
    rows = [(j // 5, j % 5) for j in active]  # (peak, param-type), type < 4

    @pl.when(mask_ref[pl.program_id(0)] != 0)
    def _body():
        t2 = t * t

        # Basis per peak (register-resident; K*2 (V, n_t) arrays)
        b_res, b_ims = [], []
        amps = []
        m_re = jnp.zeros((v_tile, n_t), f32)
        m_im = jnp.zeros((v_tile, n_t), f32)
        for k in range(n_peaks):
            amp = params_ref[0, k * 5 + 0, :].reshape(v_tile, 1)
            cs = params_ref[0, k * 5 + 1, :].reshape(v_tile, 1)
            lw = params_ref[0, k * 5 + 2, :].reshape(v_tile, 1)
            ph = params_ref[0, k * 5 + 3, :].reshape(v_tile, 1)

            env = amp * jnp.exp((-jnp.pi) * lw * t)
            ang = (2.0 * jnp.pi * mhz) * cs * t + ph * deg
            b_re = env * jnp.cos(ang)
            b_im = env * jnp.sin(ang)
            b_res.append(b_re)
            b_ims.append(b_im)
            amps.append(amp)
            m_re = m_re + b_re
            m_im = m_im + b_im

        r_re = yre_ref[:, :] - m_re
        r_im = yim_ref[:, :] - m_im
        cost_ref[0, 0, :] = jnp.sum(r_re * r_re + r_im * r_im, axis=1)

        # Residual moments N_q[k] = sum_t t^q conj(B_k) r,  q in {0, 1}
        n_mom = {}
        for k in range(n_peaks):
            pr = b_res[k] * r_re + b_ims[k] * r_im  # Re(conj(B) r)
            pi_ = b_res[k] * r_im - b_ims[k] * r_re  # Im(conj(B) r)
            n_mom[(k, 0)] = (jnp.sum(pr, axis=1), jnp.sum(pi_, axis=1))
            n_mom[(k, 1)] = (
                jnp.sum(t * pr, axis=1),
                jnp.sum(t * pi_, axis=1),
            )

        # Pair moments M_q[k, k'] for k <= k' (Hermitian: conj for k > k')
        m_mom = {}
        for k in range(n_peaks):
            for kp in range(k, n_peaks):
                cr = b_res[k] * b_res[kp] + b_ims[k] * b_ims[kp]
                ci = b_ims[k] * b_res[kp] - b_res[k] * b_ims[kp]
                m_mom[(k, kp, 0)] = (
                    jnp.sum(cr, axis=1), jnp.sum(ci, axis=1)
                )
                m_mom[(k, kp, 1)] = (
                    jnp.sum(t * cr, axis=1), jnp.sum(t * ci, axis=1)
                )
                m_mom[(k, kp, 2)] = (
                    jnp.sum(t2 * cr, axis=1), jnp.sum(t2 * ci, axis=1)
                )

        # Per-row coefficients z = alpha + i*beta and t-power p
        w_cs = 2.0 * jnp.pi * mhz
        zero = jnp.zeros((v_tile,), f32)
        one = jnp.ones((v_tile,), f32)

        def coeff(k, ptype):
            if ptype == 0:  # amplitude
                a = amps[k].reshape(v_tile)
                safe = jnp.where(a == 0, 1.0, a)
                return one / safe, zero, 0
            if ptype == 1:  # chemical shift: i * w * t
                return zero, w_cs * one, 1
            if ptype == 2:  # linewidth: -pi * t
                return -jnp.pi * one, zero, 1
            # phase: i * deg
            return zero, deg * one, 0

        coeffs = [coeff(k, p) for (k, p) in rows]

        # Gradient: g_r = Re(conj(z_r) N_{p_r}[k_r])
        #               = alpha*ReN + beta*ImN
        for r, ((k, _), (al, be, p)) in enumerate(zip(rows, coeffs)):
            nr, ni = n_mom[(k, p)]
            g_ref[0, r, :] = al * nr + be * ni
        for r in range(len(rows), a_pad):
            g_ref[0, r, :] = zero

        # Hessian entries: H[r, s] = Re(z_r conj(z_s) M_{p_r+p_s}[k_r, k_s])
        for r, ((kr, _), (ar, br, pr)) in enumerate(zip(rows, coeffs)):
            for s, ((ks, _), (as_, bs, ps)) in enumerate(zip(rows, coeffs)):
                if s < r:
                    continue
                q = pr + ps
                if kr <= ks:
                    mr, mi = m_mom[(kr, ks, q)]
                else:
                    mr, mi = m_mom[(ks, kr, q)]
                    mi = -mi
                val = (ar * as_ + br * bs) * mr - (br * as_ - ar * bs) * mi
                h_ref[0, r * a_pad + s, :] = val
                if s != r:
                    h_ref[0, s * a_pad + r, :] = val
        for r in range(len(rows), a_pad):
            for s in range(a_pad):
                h_ref[0, r * a_pad + s, :] = zero
                h_ref[0, s * a_pad + r, :] = zero


def eq6_normal_equations_pallas_v8(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    voxel_mask=None,
    v_tile: int = 8,
    interpret: bool = False,
):
    """Moment-based fused normal equations (every peak's g fixed at 0).

    Same contract as :func:`eq6_normal_equations_pallas_v5` (+ the v6
    ``voxel_mask`` tile skipping).  The caller must guarantee the prior is
    purely Lorentzian — the driver's kernel selection checks BOTH halves
    (no free g AND every fixed g equal to 0, ``lm.lorentzian_env_flags``);
    this eager boundary enforces the same two halves for direct use: free
    g slots statically, fixed nonzero g values on concrete ``params``
    (the kernel hardcodes the Lorentzian envelope ``exp(-pi*lw*t)``, so a
    fixed g of e.g. 0.5 would silently corrupt cost/gradient/Hessian).
    Traced ``params`` (the jitted LM driver) cannot be inspected — the
    library paths that select v8 guarantee the prior by construction.
    """
    if any(j % 5 == 4 for j in active):
        raise ValueError(
            "v8 requires every g fixed (purely Lorentzian prior); "
            "use kernel_version=6"
        )
    if not isinstance(params, jax.core.Tracer):
        g_cols = np.asarray(params)[..., 4::5]
        if g_cols.size and float(np.abs(g_cols).max()) != 0.0:
            raise ValueError(
                "v8 requires every g fixed AT 0 (purely Lorentzian "
                "prior); this prior fixes g at a nonzero value — use "
                "kernel_version=6 or 9"
            )
    return _eq6_normal_equations_pallas_v8_jit(
        params, y_re, y_im, t, n_peaks=n_peaks, mhz=mhz,
        active=tuple(active), voxel_mask=voxel_mask, v_tile=v_tile,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_peaks", "mhz", "active", "v_tile", "interpret"),
)
def _eq6_normal_equations_pallas_v8_jit(
    params,
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    voxel_mask=None,
    v_tile: int = 8,
    interpret: bool = False,
):
    n_t = y_re.shape[-1]
    a = len(active)
    a_pad = _round_up(a, 8)
    p = n_peaks * 5

    params_t, y_re, y_im, tiles_active, b, b_pad, n_tiles = (
        _prepare_tile_batch(params, y_re, y_im, n_peaks, v_tile, voxel_mask)
    )
    grid = (n_tiles,)

    kernel = functools.partial(
        _normal_eq_kernel_v8,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        active=tuple(active),
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, a_pad * a_pad, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, a_pad, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], a_pad * a_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], a_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 1, v_tile), jnp.float32),
        ],
        interpret=interpret,
    )(
        tiles_active,
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    # (G, A*A, V) -> (B, A_pad, A_pad) etc. (v2's transposed output layout)
    h = jnp.transpose(h_out, (0, 2, 1)).reshape(b_pad, a_pad, a_pad)
    g = jnp.transpose(g_out, (0, 2, 1)).reshape(b_pad, a_pad)
    cost = jnp.transpose(cost_out, (0, 2, 1)).reshape(b_pad)
    return cost[:b], g[:b, :a], h[:b, :a, :a]


@functools.partial(
    jax.jit, static_argnames=("n_peaks", "mhz", "v_tile", "interpret")
)
def eq6_normal_equations_pallas_v2(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    v_tile: int = 8,
    interpret: bool = False,
):
    """Sublane-vectorized fused normal equations (drop-in for the v1 API)."""
    b, n_t = y_re.shape
    p = n_peaks * 5
    p_pad = _round_up(p, 8)

    pad_b = (-b) % v_tile
    if pad_b:
        params = jnp.pad(params, ((0, pad_b), (0, 0)))
        params = params.at[b:, 0].set(1.0)
        y_re = jnp.pad(y_re, ((0, pad_b), (0, 0)))
        y_im = jnp.pad(y_im, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    grid = (b_pad // v_tile,)

    # Tiled parameter layout: (G, K*5, V) so each tile's parameters are
    # lane-contiguous rows
    params_t = (
        params.astype(jnp.float32)
        .reshape(grid[0], v_tile, p)
        .transpose(0, 2, 1)
    )

    kernel = functools.partial(
        _normal_eq_kernel_v2,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        p_pad=p_pad,
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, p_pad * p_pad, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, p_pad, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], p_pad * p_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], p_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 1, v_tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, v_tile, n_t), jnp.float32),
            pltpu.VMEM((p, v_tile, n_t), jnp.float32),
        ],
        interpret=interpret,
    )(
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
    )
    # (G, P*P, V) -> (B, P, P); (G, P, V) -> (B, P); (G, 1, V) -> (B,)
    h = jnp.transpose(h_out, (0, 2, 1)).reshape(b_pad, p_pad, p_pad)
    g = jnp.transpose(g_out, (0, 2, 1)).reshape(b_pad, p_pad)
    cost = jnp.transpose(cost_out, (0, 2, 1)).reshape(b_pad)
    return cost[:b], g[:b, :p], h[:b, :p, :p]


# ---------------------------------------------------------------------------
# v9: generalized moments (any Eq.6 prior incl. Voigt/free-g) + accept gating
# ---------------------------------------------------------------------------


def _v9_row_degrees(ptype: int, g_fixed_zero: bool) -> tuple[int, ...]:
    """Static t-power degrees of a Jacobian row's coefficient polynomial.

    Every Eq.6 partial is ``(sum_d z_d t^d) * B_k`` (see
    :func:`xmris_tpu.fitting.lm.eq6_jacobian_planar`):

      amp   -> z_0 = 1/a
      cs    -> z_1 = i*2*pi*MHz
      lw    -> z_1 = -pi*(1-g), z_2 = -pi*g   (degree 1 only when g == 0)
      phase -> z_0 = i*pi/180
      g     -> z_1 = pi*lw,     z_2 = -pi*lw
    """
    if ptype in (0, 3):
        return (0,)
    if ptype == 1:
        return (1,)
    if ptype == 2:
        return (1,) if g_fixed_zero else (1, 2)
    return (1, 2)  # ptype == 4 (g)


def _v9_tile_eval(
    read_param,  # j -> (v_tile, 1) float32 physical-parameter column
    yre,  # (v_tile, n_t) value
    yim,  # (v_tile, n_t) value
    t_ref,  # (1, n_t) VMEM ref (scalar reads feed the factored basis)
    dxdu_row,  # f -> (v_tile,) lane-major bound-transform diagonal (fold)
    store_h,  # (f, h2, value) -> None; value is (v_tile,) lane-major
    store_g,  # (f, value) -> None
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
    g_zero: tuple[bool, ...],
    factored_t: bool,
    fold: tuple | None,  # (slots, scales, n_free): emit FREE-space H/g
):
    """The v9 moment-based evaluation for ONE voxel tile, I/O-agnostic.

    Shared between :func:`_normal_eq_kernel_v9` (one launch per LM
    iteration; reads params from a VMEM block, writes flat H/g rows) and
    the v10 whole-loop kernel (params computed in-registers from the
    internal LM state; H/g written into column-slab scratch for the
    in-kernel solve).  Returns ``(cost, moments_fn)`` — the caller invokes
    ``moments_fn()`` to run the H/g work (possibly under a ``pl.when``
    accept gate).

    Every Jacobian row is ``(z_0 + z_1 t + z_2 t^2) * B_k`` with per-voxel
    complex coefficients (see :func:`_v9_row_degrees`), so the Gram matrix
    collapses to complex moments ``M_q[k,k'] = sum_t t^q B_k conj(B_k')``
    for ``q`` up to 4, combined entry-wise with scalar coefficient products
    — Lorentzian priors reduce exactly to v8's three moments; Voigt and
    free-g priors add the t^3/t^4 moments instead of falling back to the
    Jacobian-materializing v6 path.

    Free-space fold (``fold=(slots, scales, n_free)``): the scatter-matrix
    fold and the bound-transform diagonal — which the LM driver otherwise
    applies as per-iteration batched einsums over HBM — collapse into the
    per-slot coefficient scalars: row ``r``'s terms are scaled by
    ``scales[r] * dxdu_row(slots[r])`` and rows sharing a free slot (tied
    parameters) merge, so the stores receive the FREE-parameter system
    directly.
    """
    t = t_ref[0, :].reshape(1, -1)  # (1, n_t)
    n_t = t.shape[1]
    f32 = jnp.float32
    deg = _DEG
    rows = [(j // 5, j % 5) for j in active]
    row_degs = [_v9_row_degrees(p, g_zero[k]) for (k, p) in rows]

    # Static moment requirements
    need_n: dict[int, set] = {}
    need_m: dict[tuple[int, int], set] = {}
    for (k, _), degs in zip(rows, row_degs):
        need_n.setdefault(k, set()).update(degs)
    for (kr, _), degs_r in zip(rows, row_degs):
        for (ks, _), degs_s in zip(rows, row_degs):
            key = (min(kr, ks), max(kr, ks))
            qs = need_m.setdefault(key, set())
            for d in degs_r:
                for e in degs_s:
                    qs.add(d + e)
    q_max = max((max(qs) for qs in need_m.values()), default=2)

    # t powers up to the statically needed maximum
    tp = [jnp.ones((1, n_t), f32), t]
    for _ in range(2, q_max + 1):
        tp.append(tp[-1] * t)

    # Basis per peak + model + cost (always computed).  With
    # ``factored_t`` (uniform t, n_t % 128 == 0) the basis factors over
    # 128-sample blocks exactly as in v7 — v9 has NO MXU work to
    # overlap the transcendentals with, so the ~7.5x fewer exp/cos/sin
    # lanes convert directly into kernel time.
    if factored_t:
        n_q = n_t // 128
        t_r = t[:, :128]  # (1, 128) first-block times
        t0 = t_ref[0, 0]
        t_qs = [t_ref[0, q * 128] - t0 for q in range(n_q)]

    b_res, b_ims, amps, lws, gs = [], [], [], [], []
    m_re = jnp.zeros((v_tile, n_t), f32)
    m_im = jnp.zeros((v_tile, n_t), f32)
    for k in range(n_peaks):
        amp = read_param(k * 5 + 0)
        cs = read_param(k * 5 + 1)
        lw = read_param(k * 5 + 2)
        ph = read_param(k * 5 + 3)
        gv = read_param(k * 5 + 4)

        d_ = jnp.pi * lw
        w_ = (2.0 * jnp.pi * mhz) * cs
        if factored_t and g_zero[k]:
            # Lorentzian: rank-1 block factorization of the FULL basis
            ang_r = w_ * t_r + ph * deg
            er = jnp.exp(-d_ * t_r)
            gr_re = er * jnp.cos(ang_r)
            gr_im = er * jnp.sin(ang_r)
            blocks_re, blocks_im = [], []
            for q in range(n_q):
                tq = t_qs[q]
                fq = amp * jnp.exp(-d_ * tq)  # (V, 1)
                ang_q = w_ * tq
                fq_re = fq * jnp.cos(ang_q)
                fq_im = fq * jnp.sin(ang_q)
                blocks_re.append(fq_re * gr_re - fq_im * gr_im)
                blocks_im.append(fq_re * gr_im + fq_im * gr_re)
            b_re = jnp.concatenate(blocks_re, axis=1)
            b_im = jnp.concatenate(blocks_im, axis=1)
        elif factored_t:
            # Voigt: classic envelope, factored angle
            env = amp * jnp.exp(-d_ * (1.0 - gv + gv * t) * t)
            ang_r = w_ * t_r + ph * deg
            cr_ = jnp.cos(ang_r)
            sr_ = jnp.sin(ang_r)
            blocks_re, blocks_im = [], []
            for q in range(n_q):
                ang_q = w_ * t_qs[q]
                cq = jnp.cos(ang_q)
                sq = jnp.sin(ang_q)
                blocks_re.append(cq * cr_ - sq * sr_)
                blocks_im.append(cq * sr_ + sq * cr_)
            b_re = env * jnp.concatenate(blocks_re, axis=1)
            b_im = env * jnp.concatenate(blocks_im, axis=1)
        else:
            if g_zero[k]:
                env = amp * jnp.exp((-jnp.pi) * lw * t)
            else:
                env = amp * jnp.exp(
                    (-jnp.pi) * lw * (1.0 - gv + gv * t) * t
                )
            ang = (2.0 * jnp.pi * mhz) * cs * t + ph * deg
            b_re = env * jnp.cos(ang)
            b_im = env * jnp.sin(ang)
        b_res.append(b_re)
        b_ims.append(b_im)
        amps.append(amp)
        lws.append(lw)
        gs.append(gv)
        m_re = m_re + b_re
        m_im = m_im + b_im

    r_re = yre - m_re
    r_im = yim - m_im
    cost = jnp.sum(r_re * r_re + r_im * r_im, axis=1)

    def _moments():
        # Residual moments N_q[k] = sum_t t^q conj(B_k) r
        n_mom = {}
        for k, qs in need_n.items():
            pr = b_res[k] * r_re + b_ims[k] * r_im
            pi_ = b_res[k] * r_im - b_ims[k] * r_re
            for q in sorted(qs):
                n_mom[(k, q)] = (
                    jnp.sum(tp[q] * pr, axis=1),
                    jnp.sum(tp[q] * pi_, axis=1),
                )

        # Pair moments M_q[k, k'] = sum_t t^q B_k conj(B_k'), k <= k'
        m_mom = {}
        for (k, kp), qs in need_m.items():
            cr = b_res[k] * b_res[kp] + b_ims[k] * b_ims[kp]
            ci = b_ims[k] * b_res[kp] - b_res[k] * b_ims[kp]
            for q in sorted(qs):
                m_mom[(k, kp, q)] = (
                    jnp.sum(tp[q] * cr, axis=1),
                    jnp.sum(tp[q] * ci, axis=1),
                )

        # Per-row coefficient term lists [(alpha, beta, degree), ...]
        w_cs = 2.0 * jnp.pi * mhz
        zero = jnp.zeros((v_tile,), f32)
        one = jnp.ones((v_tile,), f32)

        def coeff_terms(k, ptype):
            if ptype == 0:  # amplitude
                a_ = amps[k].reshape(v_tile)
                safe = jnp.where(a_ == 0, 1.0, a_)
                return [(one / safe, zero, 0)]
            if ptype == 1:  # chemical shift
                return [(zero, w_cs * one, 1)]
            if ptype == 2:  # linewidth
                if g_zero[k]:
                    return [(-jnp.pi * one, zero, 1)]
                gv = gs[k].reshape(v_tile)
                return [
                    (-jnp.pi * (1.0 - gv), zero, 1),
                    (-jnp.pi * gv, zero, 2),
                ]
            if ptype == 3:  # phase
                return [(zero, deg * one, 0)]
            d_ = jnp.pi * lws[k].reshape(v_tile)  # g row
            return [(d_, zero, 1), (-d_, zero, 2)]

        terms = [coeff_terms(k, p) for (k, p) in rows]

        # Group rows into output entries: physical rows map 1:1 when
        # not folding; with ``fold``, rows merge into their free slots
        # with the scatter scale and the bound-transform diagonal
        # folded into the coefficients.
        if fold is None:
            entries = [
                [(k, tlist)] for (k, _), tlist in zip(rows, terms)
            ]
        else:
            slots, scales, n_free = fold
            entries = [[] for _ in range(n_free)]
            for r, ((k, _), tlist) in enumerate(zip(rows, terms)):
                m = dxdu_row(slots[r]) * scales[r]  # (V,)
                entries[slots[r]].append(
                    (k, [(al * m, be * m, d) for al, be, d in tlist])
                )
        n_out = len(entries)

        # Gradient: g_f = sum_{rows in f} sum_d Re(conj(z_d) N_d[k])
        for f_, elist in enumerate(entries):
            acc = zero
            for k, tlist in elist:
                for al, be, d in tlist:
                    nr, ni = n_mom[(k, d)]
                    acc = acc + al * nr + be * ni
            store_g(f_, acc)
        for f_ in range(n_out, a_pad):
            store_g(f_, zero)

        # Hessian: H[f,h] = sum over the entries' row pairs of
        # sum_{d,e} Re(z_{d} conj(z_{e}) M_{d+e}[k_r, k_s])
        for f_, el_f in enumerate(entries):
            for h2, el_h in enumerate(entries):
                if h2 < f_:
                    continue
                acc = zero
                for kr, tr_ in el_f:
                    for ks, ts_ in el_h:
                        for ar, br, d in tr_:
                            for as_, bs, e in ts_:
                                q = d + e
                                if kr <= ks:
                                    mr, mi = m_mom[(kr, ks, q)]
                                else:
                                    mr, mi = m_mom[(ks, kr, q)]
                                    mi = -mi
                                acc = acc + (
                                    (ar * as_ + br * bs) * mr
                                    - (br * as_ - ar * bs) * mi
                                )
                store_h(f_, h2, acc)
                if h2 != f_:
                    store_h(h2, f_, acc)
        for f_ in range(n_out, a_pad):
            for s_ in range(a_pad):
                store_h(f_, s_, zero)
                store_h(s_, f_, zero)

    return cost, _moments


def _normal_eq_kernel_v9(
    mask_ref,  # (n_tiles,) SMEM
    params_ref,  # (1, K*5, V) VMEM
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    *rest,  # [dxdu_ref (1, F, V) if fold] + [cprev_ref (1, 1, V) if gated]
    #         + [h_ref, g_ref, cost_ref]
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    active: tuple[int, ...],
    g_zero: tuple[bool, ...],
    gated: bool,
    factored_t: bool,
    fold: tuple | None,  # (slots, scales, n_free): emit FREE-space H/g
):
    """One-launch-per-LM-iteration wrapper over :func:`_v9_tile_eval`.

    Accept gating (``gated=True``): the model + cost always evaluate, but
    the moment/H/g work — the bulk of the kernel — runs only when at least
    one voxel of the tile improves on ``cprev_ref`` (its previous accepted
    cost).  In the LM driver rejected trials only ever consume the trial
    cost, so tiles that reject skip ~3/4 of the kernel.  Measured on v5e
    at bench conditions (template-seeded, 2-3 accepted steps) the dynamic
    ``pl.when`` costs MORE than the skipped moments save (37.4 vs 33.2 ms
    fit+CRLB), so the driver defaults to the ungated variant, where the
    conditional (and the cprev input) is compiled out entirely.
    """
    rest = list(rest)
    dxdu_ref = rest.pop(0) if fold is not None else None
    cprev_ref = rest.pop(0) if gated else None
    h_ref, g_ref, cost_ref = rest

    def _store_h(f_, h2, v):
        h_ref[0, f_ * a_pad + h2, :] = v

    def _store_g(f_, v):
        g_ref[0, f_, :] = v

    @pl.when(mask_ref[pl.program_id(0)] != 0)
    def _body():
        cost, moments_fn = _v9_tile_eval(
            lambda j: params_ref[0, j, :].reshape(v_tile, 1),
            yre_ref[:, :],
            yim_ref[:, :],
            t_ref,
            (lambda f: dxdu_ref[0, f, :]) if fold is not None else None,
            _store_h,
            _store_g,
            n_peaks=n_peaks,
            mhz=mhz,
            v_tile=v_tile,
            a_pad=a_pad,
            active=active,
            g_zero=g_zero,
            factored_t=factored_t,
            fold=fold,
        )
        cost_ref[0, 0, :] = cost
        if gated:
            pl.when(jnp.any(cost < cprev_ref[0, 0, :]))(moments_fn)
        else:
            moments_fn()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_peaks", "mhz", "active", "g_zero", "v_tile", "interpret",
        "factored_t", "fold_slots", "fold_scales", "n_free", "slab_h",
    ),
)
def eq6_normal_equations_pallas_v9(
    params,  # (B, K*5) physical parameter grid, float32
    y_re,
    y_im,
    t,
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    g_zero: tuple[bool, ...],
    voxel_mask=None,
    cost_prev=None,  # (B,) previous accepted cost; None -> +inf (no gate)
    v_tile: int = 8,
    interpret: bool = False,
    factored_t: bool = False,
    fold_slots: tuple[int, ...] | None = None,  # per-active-row free slot
    fold_scales: tuple[float, ...] | None = None,  # per-active-row scale
    n_free: int | None = None,
    dxdu=None,  # (B, n_free) bound-transform diagonal (required with fold)
    slab_h: bool = False,
):
    """Generalized moment-based fused normal equations with accept gating.

    Same contract as :func:`eq6_normal_equations_pallas_v8` but valid for
    EVERY Eq.6 prior (Voigt / free-g included) and with an optional
    ``cost_prev`` gate: tiles where no voxel's new cost improves on its
    previous accepted cost skip the moment/H/g computation entirely (their
    H/g outputs are unspecified — the LM driver discards them, exactly as
    it discards rejected trials).  ``cost_prev=None`` (the default, and the
    measured-faster configuration) compiles the gate out entirely.

    With ``fold_slots``/``fold_scales``/``n_free``/``dxdu`` the outputs are
    the FREE-parameter system (B, n_free)/(B, n_free, n_free) with the
    scatter fold and bound-transform diagonal already applied — the LM
    driver then consumes H/g directly with no per-iteration einsums.

    ``slab_h=True`` returns H in the kernel-NATIVE slab layout
    ``(n_tiles, a_pad·a_pad, v_tile)`` (voxels on lanes, row-major column
    slabs, padded rows unspecified) instead of (B, F, F) — the layout
    :func:`xmris_tpu.ops.kernels.spd.spd_solve_damped_pallas_slab`
    consumes directly, skipping the per-iteration HBM relayout pair.
    """
    gated = cost_prev is not None
    folded = fold_slots is not None
    n_t = y_re.shape[-1]
    a = len(active)
    a_pad = _round_up(n_free if folded else a, 8)
    n_keep = n_free if folded else a
    p = n_peaks * 5

    params_t, y_re, y_im, tiles_active, b, b_pad, n_tiles = (
        _prepare_tile_batch(params, y_re, y_im, n_peaks, v_tile, voxel_mask)
    )
    grid = (n_tiles,)

    extra_in_specs = []
    extra_inputs = []
    if folded:
        # (B, F) -> (n_tiles, F, V) lane-contiguous per-tile layout
        dx = dxdu.astype(jnp.float32)
        dx = jnp.pad(dx, ((0, b_pad - b), (0, 0)))
        extra_inputs.append(
            dx.reshape(n_tiles, v_tile, n_free).transpose(0, 2, 1)
        )
        extra_in_specs.append(
            pl.BlockSpec(
                (1, n_free, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if gated:
        # Padding voxels get 0: a (nonnegative) trial cost never strictly
        # improves on 0, so the pad tail cannot force moment work.
        cprev = jnp.pad(cost_prev.astype(jnp.float32), (0, b_pad - b))
        extra_inputs.append(cprev.reshape(n_tiles, 1, v_tile))
        extra_in_specs.append(
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )

    kernel = functools.partial(
        _normal_eq_kernel_v9,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        active=tuple(active),
        g_zero=tuple(bool(z) for z in g_zero),
        gated=gated,
        factored_t=bool(factored_t) and n_t % 128 == 0,
        fold=(
            (tuple(fold_slots), tuple(fold_scales), int(n_free))
            if folded
            else None
        ),
    )

    h_out, g_out, cost_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, p, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + extra_in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, a_pad * a_pad, v_tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, a_pad, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], a_pad * a_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], a_pad, v_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 1, v_tile), jnp.float32),
        ],
        interpret=interpret,
    )(
        tiles_active,
        params_t,
        y_re.astype(jnp.float32),
        y_im.astype(jnp.float32),
        t.reshape(1, -1).astype(jnp.float32),
        *extra_inputs,
    )
    g = jnp.transpose(g_out, (0, 2, 1)).reshape(b_pad, a_pad)
    cost = jnp.transpose(cost_out, (0, 2, 1)).reshape(b_pad)
    if slab_h:
        return cost[:b], g[:b, :n_keep], h_out
    h = jnp.transpose(h_out, (0, 2, 1)).reshape(b_pad, a_pad, a_pad)
    return cost[:b], g[:b, :n_keep], h[:b, :n_keep, :n_keep]


def slab_to_bff(h_slab, b: int, f: int, f_pad: int):
    """(n_tiles, f_pad·f_pad, v_tile) kernel slab -> (B, F, F) Hessians."""
    n_tiles, _, v_tile = h_slab.shape
    h = jnp.transpose(h_slab, (0, 2, 1)).reshape(
        n_tiles * v_tile, f_pad, f_pad
    )
    return h[:b, :f, :f]


# ---------------------------------------------------------------------------
# v10: the ENTIRE LM loop in one kernel launch
# ---------------------------------------------------------------------------


def _lm_loop_kernel_v10(
    u0_ref,  # (1, f_pad, V) VMEM — initial internal params (tile layout)
    done0_ref,  # (1, 1, V) VMEM — 1.0 marks padding voxels (never iterate)
    yre_ref,  # (V, n_t) VMEM
    yim_ref,  # (V, n_t) VMEM
    t_ref,  # (1, n_t) VMEM
    lo_ref,  # (1, f_pad) VMEM — finite-substituted lower bounds
    hi_ref,  # (1, f_pad) VMEM
    kd_ref,  # (1, f_pad) VMEM — bound-kind codes as float32 (0/1/2/3)
    consts_ref,  # (1, 8) VMEM — [lam0, ftol, ...] runtime scalars
    u_out_ref,  # (1, f_pad, V) out — final internal params (doubles as state)
    h_out_ref,  # (1, a_pad*a_pad, V) out — carried folded H (column slabs)
    stats_ref,  # (1, 8, V) out — rows: cost, lam, done, n_acc, streak
    g_ref,  # (a_pad, V) scratch — accepted-state gradient
    htr_ref,  # (a_pad*a_pad, V) scratch — trial H
    gtr_ref,  # (a_pad, V) scratch — trial gradient
    *,
    n_peaks: int,
    mhz: float,
    v_tile: int,
    a_pad: int,
    f_pad: int,
    n_free: int,
    active: tuple[int, ...],
    g_zero: tuple[bool, ...],
    factored_t: bool,
    fold_slots: tuple[int, ...],
    fold_scales: tuple[float, ...],
    pmap_idx: tuple[int, ...],
    pmap_scale: tuple[float, ...],
    pmap_offset: tuple[float, ...],
    max_iter: int,
    plateau_streak: int,
):
    """Whole-loop LM kernel: bound transform, v9 moment evaluation, damped
    Cholesky solve, and accept/reject state all live in VMEM for the tile,
    so the full fit costs ONE kernel launch (and one y DMA) instead of one
    launch plus XLA glue per LM iteration.

    Semantics mirror the launch-per-iteration driver
    (:func:`xmris_tpu.fitting.lm._lm_fit_batched_pallas_impl`): predicted-
    decrease exit, accept gating on strict cost improvement, rejection-
    plateau termination, and the carried Gauss-Newton H/g reused by
    rejected trials.  The initial evaluation is folded into loop trip 0
    (accepted-state cost starts at +inf so the first trial — a zero step
    off the seed, H=0 and g=0 give delta=0 — always accepts and installs
    cost0/H0/g0 without re-damping; ``lam`` is pinned back to ``lam0`` on
    that trip), which keeps exactly ONE traced copy of the evaluation in
    the kernel body.

    Layouts: per-voxel small state is lane-major (voxels on lanes) —
    (f_pad, V) parameter planes, (1, V) scalar rows — matching the
    orientation the moment combination already produces; the per-voxel
    Hessians live as ``a_pad`` column slabs of shape (a_pad, V) inside a
    flat (a_pad*a_pad, V) ref (entry (i, j) at row ``j*a_pad + i``), so
    every rank-1 Cholesky update is a dense (a_pad, V) vector op.  The
    Eq.6 basis still wants per-voxel scalars as (V, 1) sublane columns;
    the (1, V)->(V, 1) relayout per physical parameter is the same one
    the v9 kernel pays reading its parameter block.
    """
    f32 = jnp.float32
    eps = float(np.finfo(np.float32).eps)
    lam0 = consts_ref[0, 0]
    ftol = consts_ref[0, 1]

    lo_col = lo_ref[0, :].reshape(f_pad, 1)
    hi_col = hi_ref[0, :].reshape(f_pad, 1)
    kd_col = kd_ref[0, :].reshape(f_pad, 1)

    def transform(u):
        """(f_pad, V) internal -> (external x, dx/du) — vectorized
        counterpart of fitting.lm.internal_to_external_jax."""
        s = jnp.sin(u)
        x_both = lo_col + (s + 1.0) * 0.5 * (hi_col - lo_col)
        d_both = 0.5 * (hi_col - lo_col) * jnp.cos(u)
        root = jnp.sqrt(u * u + 1.0)
        x_lower = lo_col - 1.0 + root
        d_lower = u / root
        x_upper = hi_col + 1.0 - root
        d_upper = -u / root
        x = jnp.where(
            kd_col == 0.0,
            x_both,
            jnp.where(kd_col == 1.0, x_lower, jnp.where(kd_col == 2.0, x_upper, u)),
        )
        dxdu = jnp.where(
            kd_col == 0.0,
            d_both,
            jnp.where(
                kd_col == 1.0,
                d_lower,
                jnp.where(kd_col == 2.0, d_upper, jnp.ones_like(u)),
            ),
        )
        return x, dxdu

    def srd(i):
        return stats_ref[0, i, :]  # (V,)

    def swr(i, v):
        stats_ref[0, i, :] = v

    def eval_at(u, store_h, store_g):
        """Trial evaluation at internal params u: returns the (V,) cost and
        runs the moment H/g work through the given stores."""
        x, dxdu = transform(u)
        param_cache = {}

        def read_param(j):
            if j not in param_cache:
                slot = pmap_idx[j]
                if slot < 0:
                    val = jnp.full((v_tile, 1), pmap_offset[j], f32)
                else:
                    row = x[slot : slot + 1, :]  # (1, V)
                    val = (pmap_offset[j] + pmap_scale[j] * row).reshape(
                        v_tile, 1
                    )
                param_cache[j] = val
            return param_cache[j]

        def dxdu_row(f):
            return dxdu[f : f + 1, :].reshape(v_tile)  # (V,) lane-major

        cost, moments_fn = _v9_tile_eval(
            read_param,
            yre_ref[:, :],
            yim_ref[:, :],
            t_ref,
            dxdu_row,
            store_h,
            store_g,
            n_peaks=n_peaks,
            mhz=mhz,
            v_tile=v_tile,
            a_pad=a_pad,
            active=active,
            g_zero=g_zero,
            factored_t=factored_t,
            fold=(fold_slots, fold_scales, n_free),
        )
        moments_fn()
        return cost

    def solve(lam_row):
        """Damped Cholesky solve of the carried (accepted) H/g for every
        lane: returns (delta rows [(1, V)] * n_free, solve_ok (V,))."""
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (a_pad, 1), 0)
        one_hot = [(iota_col == j).astype(f32) for j in range(n_free)]
        mask_ge = [(iota_col >= k).astype(f32) for k in range(n_free)]
        a_cols = []
        for j in range(n_free):
            slab = h_out_ref[0, j * a_pad : (j + 1) * a_pad, :]  # (a_pad, V)
            diag = slab[j : j + 1, :]
            bump = lam_row * jnp.maximum(diag, 1e-12) + 1e-12
            a_cols.append(slab + one_hot[j] * bump)
        l_cols = [None] * n_free
        for k in range(n_free):
            dk = a_cols[k][k : k + 1, :]
            inv = jax.lax.rsqrt(jnp.where(dk > 0, dk, jnp.nan))
            lk = a_cols[k] * mask_ge[k] * inv
            for j in range(k + 1, n_free):
                a_cols[j] = a_cols[j] - lk * lk[j : j + 1, :]
            l_cols[k] = lk
        # forward: L y = g
        ys = [None] * n_free
        for i in range(n_free):
            acc = g_ref[i : i + 1, :]
            for j in range(i):
                acc = acc - l_cols[j][i : i + 1, :] * ys[j]
            ys[i] = acc / l_cols[i][i : i + 1, :]
        # backward: L^T d = y   (L^T[i, j] = L[j, i] = l_cols[i][j])
        ds = [None] * n_free
        for i in reversed(range(n_free)):
            acc = ys[i]
            for j in range(i + 1, n_free):
                acc = acc - l_cols[i][j : j + 1, :] * ds[j]
            ds[i] = acc / l_cols[i][i : i + 1, :]
        ok = jnp.ones((v_tile,), jnp.bool_)
        for i in range(n_free):
            ok = ok & jnp.isfinite(ds[i].reshape(v_tile))
        return ds, ok

    # --- state init ---
    u_out_ref[0] = u0_ref[0]
    h_out_ref[0, :, :] = jnp.zeros((a_pad * a_pad, v_tile), f32)
    g_ref[:, :] = jnp.zeros((a_pad, v_tile), f32)
    swr(0, jnp.full((v_tile,), jnp.inf, f32))  # cost
    swr(1, jnp.broadcast_to(lam0, (v_tile,)).astype(f32))  # lam
    swr(2, done0_ref[0, 0, :])  # done
    swr(3, jnp.zeros((v_tile,), f32))  # n_acc
    swr(4, jnp.zeros((v_tile,), f32))  # streak
    for i in range(5, 8):
        swr(i, jnp.zeros((v_tile,), f32))

    def store_h_tr(f_, h2, v):
        htr_ref[h2 * a_pad + f_, :] = v

    def store_g_tr(f_, v):
        gtr_ref[f_, :] = v

    def trip(it, carry):
        done_row = srd(2)

        @pl.when(~jnp.all(done_row > 0.5))
        def _():
            cost = srd(0)
            lam = srd(1)
            done = srd(2) > 0.5
            n_acc = srd(3)
            streak = srd(4)
            lam_row = lam.reshape(1, v_tile)

            ds, solve_ok = solve(lam_row)
            pred = jnp.zeros((1, v_tile), f32)
            for i in range(n_free):
                pred = pred + g_ref[i : i + 1, :] * ds[i]
            pred_rel = pred.reshape(v_tile) / jnp.maximum(cost, 1e-30)
            # Predicted-decrease exit BEFORE the trial (see the driver);
            # never fires on trip 0 because lam == lam0 exactly there.
            done = done | (
                (pred_rel >= 0.0)
                & (pred_rel <= 64.0 * eps)
                & (lam < lam0)
                & solve_ok
            )

            delta = jnp.concatenate(
                [jnp.where(solve_ok[None, :], d, 0.0) for d in ds]
                + (
                    [jnp.zeros((f_pad - n_free, v_tile), f32)]
                    if f_pad > n_free
                    else []
                ),
                axis=0,
            )
            u = u_out_ref[0]
            u_t = u + delta
            cost_t = eval_at(u_t, store_h_tr, store_g_tr)

            ok = jnp.isfinite(cost_t) & (cost_t < cost) & ~done
            rel_drop = (cost - cost_t) / jnp.maximum(cost, 1e-30)
            okc = ok[None, :]

            u_out_ref[0] = jnp.where(okc, u_t, u)
            h_out_ref[0, :, :] = jnp.where(
                okc, htr_ref[:, :], h_out_ref[0, :, :]
            )
            g_ref[:, :] = jnp.where(okc, gtr_ref[:, :], g_ref[:, :])
            swr(0, jnp.where(ok, cost_t, cost))
            # Trip 0 is the initial evaluation in disguise: the +inf->cost0
            # "accept" must not soften the damping.
            lam_new = jnp.where(
                it == 0,
                lam0,
                jnp.clip(jnp.where(ok, lam * 0.33, lam * 2.5), 1e-12, 1e12),
            )
            swr(1, lam_new)
            n_acc = n_acc + jnp.where(ok & (it > 0), 1.0, 0.0)
            swr(3, n_acc)
            plateau = ~ok & ~done & (jnp.abs(rel_drop) <= 64.0 * eps)
            streak = jnp.where(plateau, streak + 1.0, 0.0)
            swr(4, streak)
            # The ftol accept-exit tests the POST-update lam, matching both
            # per-iteration drivers (never fires on trip 0: rel_drop is NaN
            # off the +inf initial cost).
            done = (
                done
                | (ok & (rel_drop < ftol) & (lam_new < lam0))
                | (streak >= plateau_streak)
            )
            swr(2, jnp.where(done, 1.0, 0.0))

        return carry

    jax.lax.fori_loop(0, max_iter + 1, trip, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_peaks", "mhz", "active", "g_zero", "n_free", "max_iter",
        "plateau_streak", "fold_slots", "fold_scales", "pmap_idx",
        "pmap_scale", "pmap_offset", "v_tile", "interpret", "factored_t",
        "vmem_limit_mb",
    ),
)
def lm_loop_pallas_v10(
    u0,  # (B, F) float32 internal parameters (seeded)
    y_re,
    y_im,
    t,
    lower,  # (F,)
    upper,  # (F,)
    kind,  # (F,) int
    n_peaks: int,
    mhz: float,
    active: tuple[int, ...],
    g_zero: tuple[bool, ...],
    n_free: int,
    fold_slots: tuple[int, ...],
    fold_scales: tuple[float, ...],
    pmap_idx: tuple[int, ...],
    pmap_scale: tuple[float, ...],
    pmap_offset: tuple[float, ...],
    max_iter: int = 24,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
    plateau_streak: int = 3,
    v_tile: int = 128,
    interpret: bool = False,
    factored_t: bool = False,
    vmem_limit_mb: int | None = 100,
):
    """One-launch batched LM: returns ``(u_final, cost, n_acc, done, h)``
    with ``h`` the carried folded Gauss-Newton Hessian (B, n_free, n_free)
    at the final accepted state — the same object the per-iteration driver
    carries for the zero-cost CRLB.
    """
    f32 = jnp.float32
    b = y_re.shape[0]
    f_pad = _round_up(n_free, 8)
    a_pad = _round_up(n_free, 8)
    n_t = y_re.shape[-1]

    pad_b = (-b) % v_tile
    u0 = u0.astype(f32)
    if pad_b:
        u0 = jnp.pad(u0, ((0, pad_b), (0, 0)))
        y_re = jnp.pad(y_re, ((0, pad_b), (0, 0)))
        y_im = jnp.pad(y_im, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    n_tiles = b_pad // v_tile

    u0_t = (
        jnp.pad(u0, ((0, 0), (0, f_pad - n_free)))
        .reshape(n_tiles, v_tile, f_pad)
        .transpose(0, 2, 1)
    )
    done0 = jnp.zeros((b_pad,), f32).at[b:].set(1.0)
    done0_t = done0.reshape(n_tiles, 1, v_tile)

    lo = jnp.where(jnp.isfinite(lower), lower, 0.0).astype(f32)
    hi = jnp.where(jnp.isfinite(upper), upper, 0.0).astype(f32)
    kd = kind.astype(f32)
    pad_f = f_pad - n_free
    lo = jnp.pad(lo, (0, pad_f)).reshape(1, f_pad)
    hi = jnp.pad(hi, (0, pad_f)).reshape(1, f_pad)
    kd = jnp.pad(kd, (0, pad_f), constant_values=3.0).reshape(1, f_pad)

    kernel = functools.partial(
        _lm_loop_kernel_v10,
        n_peaks=n_peaks,
        mhz=float(mhz),
        v_tile=v_tile,
        a_pad=a_pad,
        f_pad=f_pad,
        n_free=n_free,
        active=tuple(active),
        g_zero=tuple(bool(z) for z in g_zero),
        factored_t=bool(factored_t) and n_t % 128 == 0,
        fold_slots=tuple(fold_slots),
        fold_scales=tuple(float(s) for s in fold_scales),
        pmap_idx=tuple(int(i) for i in pmap_idx),
        pmap_scale=tuple(float(s) for s in pmap_scale),
        pmap_offset=tuple(float(o) for o in pmap_offset),
        max_iter=int(max_iter),
        plateau_streak=int(plateau_streak),
    )
    consts = jnp.zeros((1, 8), f32).at[0, 0].set(lam0).at[0, 1].set(ftol)

    u_out, h_out, stats = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f_pad, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, n_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, f_pad, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, a_pad * a_pad, v_tile),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, v_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, f_pad, v_tile), f32),
            jax.ShapeDtypeStruct((n_tiles, a_pad * a_pad, v_tile), f32),
            jax.ShapeDtypeStruct((n_tiles, 8, v_tile), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((a_pad, v_tile), f32),
            pltpu.VMEM((a_pad * a_pad, v_tile), f32),
            pltpu.VMEM((a_pad, v_tile), f32),
        ],
        # The unrolled moment temps inside the loop body count against
        # Mosaic's scoped-VMEM budget without reuse (see CLAUDE.md); the
        # 16 MB default is too tight at v_tile=128 x n_t=1024.
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
            if vmem_limit_mb and not interpret
            else None
        ),
        interpret=interpret,
    )(
        u0_t,
        done0_t,
        y_re.astype(f32),
        y_im.astype(f32),
        t.reshape(1, -1).astype(f32),
        lo,
        hi,
        kd,
        consts,
    )

    u_fin = jnp.transpose(u_out, (0, 2, 1)).reshape(b_pad, f_pad)[:b, :n_free]
    # Column-slab flat layout: entry (i, j) at row j*a_pad + i -> the
    # reshape gives h[b, j, i]; H is symmetric so no transpose is needed.
    h = jnp.transpose(h_out, (0, 2, 1)).reshape(b_pad, a_pad, a_pad)[
        :b, :n_free, :n_free
    ]
    st = jnp.transpose(stats, (0, 2, 1)).reshape(b_pad, 8)[:b]
    cost = st[:, 0]
    n_acc = st[:, 3].astype(jnp.int32)
    done = st[:, 2] > 0.5
    return u_fin, cost, n_acc, done, h
