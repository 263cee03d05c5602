"""Asymmetric Least Squares (AsLS) baseline correction, batched for TPU.

The reference solves, per 1-D spectrum, the sparse SPD system
``(W + lam * D^T D) z = W y`` with ``D`` the second-difference operator,
re-weighting ``w = p*(y>z) + (1-p)*(y<z)`` for ``n_iter`` iterations via
SciPy ``spsolve`` under ``xr.apply_ufunc(vectorize=True)``
(``src/xmris/processing/baseline.py:10-119``).

There is no sparse direct solver in XLA, but the system is *pentadiagonal*:
``D^T D`` has closed-form bands (main ``[1,5,6,...,6,5,1]``, first
off-diagonal ``[-2,-4,...,-4,-2]``, second off-diagonal all ones).  We
factorize each system with a banded LDL^T recurrence expressed as
``lax.scan`` over points — O(n) work, exact (direct) solve — and ``vmap`` the
whole iteration over voxels, so thousands of spectra are corrected in one
XLA launch with the scan's per-step vector math running across the voxel
lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.core.array import XmrArray
from xmris_tpu.core.config import ATTRS, DIMS
from xmris_tpu.core.utils import _check_dims


def _dtd_bands(n: int, dtype) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form bands of D^T D for the (n-2) x n second-difference D."""
    main = jnp.full((n,), 6.0, dtype=dtype)
    main = main.at[0].set(1.0).at[-1].set(1.0)
    main = main.at[1].set(5.0).at[-2].set(5.0)
    off1 = jnp.full((n - 1,), -4.0, dtype=dtype)
    off1 = off1.at[0].set(-2.0).at[-1].set(-2.0)
    off2 = jnp.ones((n - 2,), dtype=dtype)
    return main, off1, off2


def _penta_ldlt_solve(a0, a1, a2, b):
    """Solve the symmetric pentadiagonal system A x = b via banded LDL^T.

    ``a0``: main diagonal (n,), ``a1``: first off-diagonal (n-1,),
    ``a2``: second off-diagonal (n-2,).  Sequential scans over n; designed to
    be vmapped over a leading batch axis.
    """
    n = a0.shape[-1]
    a1p = jnp.concatenate([jnp.zeros((1,), a1.dtype), a1])  # a1p[i] = A[i, i-1]
    a2p = jnp.concatenate([jnp.zeros((2,), a2.dtype), a2])  # a2p[i] = A[i, i-2]

    # Factorization: carry (D_{i-1}, D_{i-2}, e_{i-1})
    def fact_step(carry, inp):
        d_im1, d_im2, e_im1 = carry
        a0_i, a1_i, a2_i = inp
        g_i = jnp.where(d_im2 != 0, a2_i / d_im2, 0.0)
        e_i = jnp.where(d_im1 != 0, (a1_i - g_i * e_im1 * d_im2) / d_im1, 0.0)
        d_i = a0_i - e_i * e_i * d_im1 - g_i * g_i * d_im2
        return (d_i, d_im1, e_i), (d_i, e_i, g_i)

    (_, _, _), (d, e, g) = jax.lax.scan(
        fact_step,
        (jnp.zeros((), a0.dtype), jnp.zeros((), a0.dtype), jnp.zeros((), a0.dtype)),
        (a0, a1p, a2p),
    )

    # Forward: L z = b  ->  z_i = b_i - e_i z_{i-1} - g_i z_{i-2}
    def fwd_step(carry, inp):
        z_im1, z_im2 = carry
        b_i, e_i, g_i = inp
        z_i = b_i - e_i * z_im1 - g_i * z_im2
        return (z_i, z_im1), z_i

    _, z = jax.lax.scan(
        fwd_step, (jnp.zeros((), b.dtype), jnp.zeros((), b.dtype)), (b, e, g)
    )

    y = z / d

    # Backward: L^T x = y -> x_i = y_i - e_{i+1} x_{i+1} - g_{i+2} x_{i+2}
    e_next = jnp.concatenate([e[1:], jnp.zeros((1,), e.dtype)])
    g_next2 = jnp.concatenate([g[2:], jnp.zeros((2,), g.dtype)])

    def bwd_step(carry, inp):
        x_ip1, x_ip2 = carry
        y_i, e_ip1, g_ip2 = inp
        x_i = y_i - e_ip1 * x_ip1 - g_ip2 * x_ip2
        return (x_i, x_ip1), x_i

    _, x_rev = jax.lax.scan(
        bwd_step,
        (jnp.zeros((), y.dtype), jnp.zeros((), y.dtype)),
        (y[::-1], e_next[::-1], g_next2[::-1]),
    )
    return x_rev[::-1]


# ---------------------------------------------------------------------------
# Block cyclic reduction: the TPU-parallel pentadiagonal solve
# ---------------------------------------------------------------------------
#
# The LDL^T recurrence above is exact but SEQUENTIAL: 3 scans of length n per
# solve, ~61k dependent steps for a 2048-point, 10-iteration AsLS pass.  On
# the v5e that measured 503 ms for the 16384x2048 grid (results/
# tpu_r19.jsonl asls_grid) — ~8 us per scan step, 22x the entire fused
# spectral+fit pipeline.  The TPU-native formulation pairs scalar rows into
# 2x2 blocks, turning the pentadiagonal system into a block-TRIdiagonal one,
# then solves by block cyclic reduction: log2(n/2) levels, each a batch of
# independent 2x2 inverses/multiplies across all remaining blocks and all
# voxels at once — zero sequential scans, pure VPU work.


def _inv2(m):
    """Batched 2x2 inverse; ``m``: (..., 2, 2)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    )
    return inv / det[..., None, None]


def _mul2(x, y):
    """Batched 2x2 matmul (einsum keeps it fused and layout-free)."""
    return jnp.einsum("...ij,...jk->...ik", x, y)


def _mv2(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def _cr_solve_blocks(bm, am, cm, rhs):
    """Solve the block-tridiagonal system by cyclic reduction.

    ``bm``: (m, 2, 2) diagonal blocks, ``am``: coupling to block i-1
    (``am[0]`` ignored/zero), ``cm``: coupling to block i+1 (``cm[-1]``
    zero), ``rhs``: (m, 2).  ``m`` must be a power of two.  Leading batch
    axes broadcast through every step (vmap-free batching).
    """
    m = bm.shape[-3]
    if m == 1:
        return _mv2(_inv2(bm), rhs)

    binv_o = _inv2(bm[..., 1::2, :, :])
    a_o = am[..., 1::2, :, :]
    c_o = cm[..., 1::2, :, :]
    b_o = rhs[..., 1::2, :]

    def down(x):  # odd-neighbor terms for even j come from odd index j-1
        pad = [(0, 0)] * (x.ndim - 3) + [(1, 0), (0, 0), (0, 0)]
        return jnp.pad(x[..., :-1, :, :], pad)

    def down_v(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)]
        return jnp.pad(x[..., :-1, :], pad)

    gl = _mul2(am[..., 0::2, :, :], down(binv_o))
    gr = _mul2(cm[..., 0::2, :, :], binv_o)
    b_new = (
        bm[..., 0::2, :, :] - _mul2(gl, down(c_o)) - _mul2(gr, a_o)
    )
    a_new = -_mul2(gl, down(a_o))
    c_new = -_mul2(gr, c_o)
    r_new = rhs[..., 0::2, :] - _mv2(gl, down_v(b_o)) - _mv2(gr, b_o)

    x_even = _cr_solve_blocks(b_new, a_new, c_new, r_new)

    # Back-substitute the odd blocks: x_{2j+1} = B^{-1}(b - A x_{2j} - C x_{2j+2})
    def up_v(x):  # x_{2j+2} = x_even[j+1], zero past the end (c_o[-1]=0)
        pad = [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 0)]
        return jnp.pad(x[..., 1:, :], pad)

    x_odd = _mv2(binv_o, b_o - _mv2(a_o, x_even) - _mv2(c_o, up_v(x_even)))
    out = jnp.stack([x_even, x_odd], axis=-2)  # (..., m/2, 2, 2[comps])
    return out.reshape(*out.shape[:-3], m, 2)


def _penta_to_blocks(a0, a1, a2):
    """Pentadiagonal bands -> block-tridiagonal (B, A, C) 2x2 blocks.

    ``a0``: (..., n) main, ``a1``: (..., n-1), ``a2``: (..., n-2); ``n``
    must be even.  Scalar rows (2i, 2i+1) pair into block row i.
    """
    n = a0.shape[-1]
    pad1 = [(0, 0)] * (a1.ndim - 1) + [(0, 1)]
    pad2 = [(0, 0)] * (a2.ndim - 1) + [(0, 2)]
    a1p = jnp.pad(a1, pad1)  # a1p[i] = A[i, i+1], zero at n-1
    a2p = jnp.pad(a2, pad2)  # a2p[i] = A[i, i+2], zero at n-2, n-1
    e0, e1 = a0[..., 0::2], a0[..., 1::2]
    s0, s1 = a1p[..., 0::2], a1p[..., 1::2]
    d0, d1 = a2p[..., 0::2], a2p[..., 1::2]
    bm = jnp.stack(
        [jnp.stack([e0, s0], -1), jnp.stack([s0, e1], -1)], -2
    )
    cm = jnp.stack(
        [jnp.stack([d0, jnp.zeros_like(d0)], -1), jnp.stack([s1, d1], -1)],
        -2,
    )
    # A_i = C_{i-1}^T (symmetric system)
    pad_blk = [(0, 0)] * (cm.ndim - 3) + [(1, 0), (0, 0), (0, 0)]
    am = jnp.pad(
        jnp.swapaxes(cm, -1, -2)[..., :-1, :, :], pad_blk
    )
    return bm, am, cm


def penta_solve_cr(a0, a1, a2, b):
    """Pentadiagonal solve by block cyclic reduction (TPU-parallel).

    Same system contract as :func:`_penta_ldlt_solve` but with leading
    batch axes handled natively and log-depth parallel structure instead
    of length-n scans.  ``n`` is padded to the next power of two with
    decoupled identity rows.
    """
    n = a0.shape[-1]
    n_pad = 1 << max(1, (n - 1).bit_length())
    if n_pad != n:
        def padv(x, width, const):
            pad = [(0, 0)] * (x.ndim - 1) + [(0, width)]
            return jnp.pad(x, pad, constant_values=const)

        a0 = padv(a0, n_pad - n, 1.0)
        a1 = padv(a1, n_pad - n + 1 - 1, 0.0)
        a2 = padv(a2, n_pad - n + 2 - 2, 0.0)
        b = padv(b, n_pad - n, 0.0)
        # keep the pad rows decoupled from the live system
        a1 = a1.at[..., n - 1 :].set(0.0)
        a2 = a2.at[..., n - 2 :].set(0.0)
    bm, am, cm = _penta_to_blocks(a0, a1, a2)
    x = _cr_solve_blocks(bm, am, cm, b.reshape(*b.shape[:-1], n_pad // 2, 2))
    return x.reshape(*x.shape[:-2], n_pad)[..., :n]


def als_baseline_raw(y: jax.Array, lam: float, p: float, n_iter: int) -> jax.Array:
    """AsLS baseline of a single real 1-D spectrum (traceable; vmap for batches)."""
    n = y.shape[-1]
    m0, m1, m2 = _dtd_bands(n, y.dtype)
    a1 = lam * m1
    a2 = lam * m2
    w0 = jnp.ones((n,), y.dtype)

    def loop_body(i, carry):
        w, _ = carry
        a0 = w + lam * m0
        z = _penta_ldlt_solve(a0, a1, a2, w * y)
        w_new = (p * (y > z) + (1 - p) * (y < z)).astype(y.dtype)
        return (w_new, z)

    _, z = jax.lax.fori_loop(0, n_iter, loop_body, (w0, jnp.zeros_like(y)))
    return z


def _penta_matvec(a0, a1, a2, x):
    """Symmetric pentadiagonal matvec from the three bands (batched)."""
    def sh(v, k):
        pad = [(0, 0)] * (v.ndim - 1)
        if k > 0:
            return jnp.pad(v[..., k:], pad + [(0, k)])
        return jnp.pad(v[..., :k], pad + [(-k, 0)])

    n = x.shape[-1]
    pad1 = [(0, 0)] * (a1.ndim - 1) + [(0, 1)]
    pad2 = [(0, 0)] * (a2.ndim - 1) + [(0, 2)]
    a1p = jnp.pad(a1, pad1)
    a2p = jnp.pad(a2, pad2)
    return (
        a0 * x
        + a1p * sh(x, 1) + sh(a1p * x, -1)
        + a2p * sh(x, 2) + sh(a2p * x, -2)
    )


@functools.partial(
    jax.jit, static_argnames=("lam", "p", "n_iter", "solver", "refine")
)
def als_baseline_batched(
    rows: jax.Array,
    lam: float,
    p: float,
    n_iter: int,
    solver: str = "auto",
    refine: int = 2,
):
    """AsLS baselines for a (n_voxels, n_points) batch in one launch.

    ``solver`` selects the pentadiagonal solve:

    * ``"scan"`` — the sequential banded LDL^T (exact direct solve); on
      TPU its ~3n dependent scan steps per solve dominate (503 ms for
      16384x2048, n_iter=10 — results/tpu_r19.jsonl).
    * ``"cr"`` — block cyclic reduction (:func:`penta_solve_cr`):
      log-depth parallel, the TPU formulation.  ``refine`` iterative-
      refinement steps (residual re-solves) recover direct-solve accuracy
      in float32 (the AsLS system's conditioning ~ lam/w_min).
    * ``"auto"`` (default) — ``"cr"`` on TPU, ``"scan"`` elsewhere.
    """
    if solver == "auto":
        solver = "cr" if jax.default_backend() == "tpu" else "scan"
    if solver == "scan":
        return jax.vmap(lambda y: als_baseline_raw(y, lam, p, n_iter))(rows)
    if solver != "cr":
        raise ValueError(
            f"solver must be 'scan', 'cr', or 'auto', got {solver!r}."
        )

    n = rows.shape[-1]
    m0, m1, m2 = _dtd_bands(n, rows.dtype)
    batch = rows.shape[:-1]
    a1 = jnp.broadcast_to(lam * m1, batch + (n - 1,))
    a2 = jnp.broadcast_to(lam * m2, batch + (n - 2,))

    def dtd_apply(z):
        # K z = D^T (D z) applied OPERATOR-WISE: D z is second differences
        # of the smooth baseline — differences of nearby values, benign in
        # f32 — so the refinement residual avoids the catastrophic
        # cancellation of the banded matvec (lam*6*z terms cancelling to
        # ~w*y scale), which is what makes naive f32 refinement useless.
        d = z[..., 2:] - 2.0 * z[..., 1:-1] + z[..., :-2]
        pad = [(0, 0)] * (z.ndim - 1)
        return (
            jnp.pad(d, pad + [(0, 2)])
            - 2.0 * jnp.pad(d, pad + [(1, 1)])
            + jnp.pad(d, pad + [(2, 0)])
        )

    def resid(a0_unused, w, z):
        return w * (rows - z) - lam * dtd_apply(z)

    def rnorm(r):
        return jnp.sum(r * r, axis=-1, keepdims=True)

    def solve(a0, w, z_prev):
        """CR solve with per-voxel MONOTONE-residual safeguarding.

        The system's conditioning (~lam*16/w_min ~ 1e9) exceeds 1/eps_f32,
        so an unsafeguarded f32 solve (or refinement step) can occasionally
        EXPLODE for unlucky weight patterns (measured: O(1000) errors on
        isolated AsLS iterations).  Every candidate — the fresh solve and
        each refinement correction — is therefore accepted per voxel only
        if it reduces the (cancellation-free structured) residual norm;
        the previous weight-iteration's baseline is the fallback.  In f64
        the candidates always win and this reduces to plain refinement.
        """
        z = penta_solve_cr(a0, a1, a2, w * rows)
        better = rnorm(resid(a0, w, z)) <= rnorm(resid(a0, w, z_prev))
        z = jnp.where(better, z, z_prev)
        for _ in range(refine):
            r = resid(a0, w, z)
            z_try = z + penta_solve_cr(a0, a1, a2, r)
            improved = rnorm(resid(a0, w, z_try)) <= rnorm(r)
            z = jnp.where(improved, z_try, z)
        return z

    def loop_body(i, carry):
        w, z_prev = carry
        a0 = w + lam * m0
        z = solve(a0, w, z_prev)
        w_new = (p * (rows > z) + (1 - p) * (rows < z)).astype(rows.dtype)
        return (w_new, z)

    w0 = jnp.ones_like(rows)
    _, z = jax.lax.fori_loop(
        0, n_iter, loop_body, (w0, jnp.zeros_like(rows))
    )
    return z


def baseline_als(
    da: XmrArray,
    dim: str = DIMS.frequency,
    lam: float = 1e5,
    p: float = 0.001,
    n_iter: int = 10,
    solver: str = "auto",
) -> XmrArray:
    """Estimate and subtract a smooth AsLS baseline along ``dim``.

    Operates strictly on the real (absorption) component — the imaginary part
    is discarded, matching the reference contract (the output cannot be
    inverse-Fourier transformed).  N-D inputs are flattened over non-``dim``
    axes and solved in a single batched launch.
    """
    _check_dims(da, dim, "baseline_als")

    # dtype test without the full device->host readback da.values costs
    working = da.real if np.issubdtype(da.dtype, np.complexfloating) else da

    order = [d for d in da.dims if d != dim] + [dim]
    wt = working.transpose(*order)
    n_points = da.sizes[dim]
    rows = jnp.asarray(wt.values).reshape(-1, n_points)

    z = als_baseline_batched(rows, float(lam), float(p), int(n_iter),
                             solver=solver)

    corrected_rows = rows - z
    if not isinstance(working.data, jax.Array):
        corrected_rows = np.asarray(corrected_rows)
    voxel_shape = tuple(da.sizes[d] for d in order[:-1])
    corrected = corrected_rows.reshape(voxel_shape + (n_points,))

    out_t = wt.copy(data=corrected)
    out = out_t.transpose(*da.dims)
    out.attrs = da.attrs.copy()
    out.attrs[ATTRS.baseline_method] = "als"
    out.attrs[ATTRS.baseline_lam] = lam
    out.attrs[ATTRS.baseline_p] = p
    out.attrs[ATTRS.baseline_iter] = n_iter
    return out
