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


# 2x2 blocks travel as FOUR SEPARATE (..., m) planes (tuples
# (m00, m01, m10, m11)) with the block index on the minor axis — a
# (..., m, 2, 2) layout puts a 2x2 tail into every (8, 128) vector
# register (256x padding) and measured 23.7 s for the full grid on the
# v5e; the planar form is pure well-tiled elementwise work.


def _inv2(m):
    """2x2 inverse on component planes."""
    m00, m01, m10, m11 = m
    det = m00 * m11 - m01 * m10
    return (m11 / det, -m01 / det, -m10 / det, m00 / det)


def _mul2(x, y):
    """2x2 matmul on component planes."""
    x00, x01, x10, x11 = x
    y00, y01, y10, y11 = y
    return (
        x00 * y00 + x01 * y10,
        x00 * y01 + x01 * y11,
        x10 * y00 + x11 * y10,
        x10 * y01 + x11 * y11,
    )


def _mv2(m, v):
    """2x2 matrix-vector on component planes; ``v`` = (v0, v1)."""
    m00, m01, m10, m11 = m
    v0, v1 = v
    return (m00 * v0 + m01 * v1, m10 * v0 + m11 * v1)


def _sub2(x, y):
    return tuple(a - b for a, b in zip(x, y))


def _neg2(x):
    return tuple(-a for a in x)


def _shift(x, k):
    """Shift planes along the block axis: k=+1 -> value from index i-1
    (zero-fill), k=-1 -> value from index i+1 (zero-fill)."""
    pad = [(0, 0)] * (x.ndim - 1)
    if k > 0:
        return jnp.pad(x[..., :-k], pad + [(k, 0)])
    return jnp.pad(x[..., -k:], pad + [(0, -k)])


def _down(x):
    return tuple(_shift(a, 1) for a in x)


def _up(x):
    return tuple(_shift(a, -1) for a in x)


def _cr_solve_blocks(bm, am, cm, rhs):
    """Solve the block-tridiagonal system by cyclic reduction.

    All arguments are component-plane tuples over (..., m): ``bm`` the
    diagonal blocks, ``am`` coupling to block i-1 (``am[...,0]`` zero),
    ``cm`` coupling to block i+1 (``cm[...,-1]`` zero), ``rhs`` the
    2-vector planes.  ``m`` must be a power of two; leading batch axes
    broadcast through every step.
    """
    m = bm[0].shape[-1]
    if m == 1:
        return _mv2(_inv2(bm), rhs)

    def ev(x):
        return tuple(a[..., 0::2] for a in x)

    def od(x):
        return tuple(a[..., 1::2] for a in x)

    binv_o = _inv2(od(bm))
    a_o = od(am)
    c_o = od(cm)
    b_o = od(rhs)

    gl = _mul2(ev(am), _down(binv_o))
    gr = _mul2(ev(cm), binv_o)
    b_new = _sub2(_sub2(ev(bm), _mul2(gl, _down(c_o))), _mul2(gr, a_o))
    a_new = _neg2(_mul2(gl, _down(a_o)))
    c_new = _neg2(_mul2(gr, c_o))
    r_new = _sub2(_sub2(ev(rhs), _mv2(gl, _down(b_o))), _mv2(gr, b_o))

    x_even = _cr_solve_blocks(b_new, a_new, c_new, r_new)

    # Back-substitute: x_{2j+1} = B^{-1}(b - A x_{2j} - C x_{2j+2})
    x_odd = _mv2(
        binv_o, _sub2(_sub2(b_o, _mv2(a_o, x_even)), _mv2(c_o, _up(x_even)))
    )

    def interleave(e, o):
        out = jnp.stack([e, o], axis=-1)  # (..., m/2, 2)
        return out.reshape(*out.shape[:-2], m)

    return (interleave(x_even[0], x_odd[0]), interleave(x_even[1], x_odd[1]))


def _penta_to_blocks(a0, a1, a2):
    """Pentadiagonal bands -> block-tridiagonal (B, A, C) component planes.

    ``a0``: (..., n) main, ``a1``: (..., n-1), ``a2``: (..., n-2); ``n``
    must be even.  Scalar rows (2i, 2i+1) pair into block row i.
    """
    pad1 = [(0, 0)] * (a1.ndim - 1) + [(0, 1)]
    pad2 = [(0, 0)] * (a2.ndim - 1) + [(0, 2)]
    a1p = jnp.pad(a1, pad1)  # a1p[i] = A[i, i+1], zero at n-1
    a2p = jnp.pad(a2, pad2)  # a2p[i] = A[i, i+2], zero at n-2, n-1
    e0, e1 = a0[..., 0::2], a0[..., 1::2]
    s0, s1 = a1p[..., 0::2], a1p[..., 1::2]
    d0, d1 = a2p[..., 0::2], a2p[..., 1::2]
    bm = (e0, s0, s0, e1)
    cm = (d0, jnp.zeros_like(d0), s1, d1)
    # A_i = C_{i-1}^T (symmetric system): transpose components, shift down
    am = tuple(_shift(a, 1) for a in (cm[0], cm[2], cm[1], cm[3]))
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
    x0, x1 = _cr_solve_blocks(bm, am, cm, (b[..., 0::2], b[..., 1::2]))
    x = jnp.stack([x0, x1], axis=-1).reshape(*x0.shape[:-1], n_pad)
    return x[..., :n]


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


def als_baseline_batched(
    rows: jax.Array,
    lam: float,
    p: float,
    n_iter: int,
    solver: str = "auto",
    refine: int = 0,
):
    """AsLS baselines for a (n_voxels, n_points) batch.

    ``solver`` selects the pentadiagonal solve; BOTH compute internally
    in float64 regardless of the input dtype (upcast under
    ``jax.enable_x64`` when x64 is globally off, downcast on device):
    the system's conditioning (~lam*16/w_min ~ 1e9) exceeds 1/eps_f32,
    and f32 solves of ANY formulation are numerically unusable — the
    f32 scan measured NaN outputs on the v5e and ~18 % baseline errors
    on CPU; the safeguarded f32 CR 43-84 % self-inconsistency
    (results/tpu_r19.jsonl).

    * ``"scan"`` — the sequential banded LDL^T; on TPU its ~3n dependent
      scan steps per solve dominate (f64: 1.07 s for 16384x2048,
      n_iter=10).
    * ``"cr"`` — block cyclic reduction (:func:`penta_solve_cr`):
      log-depth parallel, the TPU formulation — exact (~1e-7) and the
      fastest correct option measured: **0.46 s** full grid.  Batches
      beyond 2048 voxels run as 2048-voxel chunks through ONE compiled
      program (the monolithic formulation crashes the remote XLA compile
      helper above ~2048x2048; tail chunks are edge-padded to the chunk
      size so every chunk reuses the same executable).  ``refine`` extra
      safeguarded refinement re-solves default to 0 — f64 needs none.
    * ``"auto"`` (default) — ``"cr"`` on TPU, ``"scan"`` elsewhere.
    """
    if solver == "auto":
        solver = "cr" if jax.default_backend() == "tpu" else "scan"
    if solver == "scan":
        run = lambda r64: _als_scan_jit(r64, lam, p, n_iter)  # noqa: E731
    elif solver == "cr":
        def run(rows64):
            chunk = 2048
            b = rows64.shape[0] if rows64.ndim > 1 else None
            if b is not None and b > chunk:
                outs = []
                from xmris_tpu.parallel.mesh import edge_pad_rows

                for s in range(0, b, chunk):
                    part = rows64[s : s + chunk]
                    short = chunk - part.shape[0]
                    if short:  # edge-pad the tail: one executable total
                        part = edge_pad_rows(part, chunk)
                    out = _als_cr_jit(part, lam, p, n_iter, refine)
                    outs.append(out[: chunk - short] if short else out)
                return jnp.concatenate(outs, axis=0)
            return _als_cr_jit(rows64, lam, p, n_iter, refine)
    else:
        raise ValueError(
            f"solver must be 'scan', 'cr', or 'auto', got {solver!r}."
        )

    in_dtype = rows.dtype
    if in_dtype == jnp.float64:
        return run(rows)
    if jax.config.jax_enable_x64:
        return run(rows.astype(jnp.float64)).astype(in_dtype)
    with jax.enable_x64():
        # Downcast ON DEVICE inside the context: returning the f64 array
        # and converting outside would round-trip ~270 MB through the
        # host (tens of seconds through a remote-TPU relay).
        z = run(jnp.asarray(rows).astype(jnp.float64)).astype(in_dtype)
    return z


@functools.partial(jax.jit, static_argnames=("lam", "p", "n_iter"))
def _als_scan_jit(rows, lam, p, n_iter):
    return jax.vmap(lambda y: als_baseline_raw(y, lam, p, n_iter))(rows)


@functools.partial(
    jax.jit, static_argnames=("lam", "p", "n_iter", "refine")
)
def _als_cr_jit(rows, lam, p, n_iter, refine):
    """The CR-solver AsLS iteration for one (batch, n) chunk (traceable)."""
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
