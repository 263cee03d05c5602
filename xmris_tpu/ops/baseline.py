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


@functools.partial(jax.jit, static_argnames=("lam", "p", "n_iter"))
def als_baseline_batched(rows: jax.Array, lam: float, p: float, n_iter: int):
    """AsLS baselines for a (n_voxels, n_points) batch in one launch."""
    return jax.vmap(lambda y: als_baseline_raw(y, lam, p, n_iter))(rows)


def baseline_als(
    da: XmrArray,
    dim: str = DIMS.frequency,
    lam: float = 1e5,
    p: float = 0.001,
    n_iter: int = 10,
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

    z = als_baseline_batched(rows, float(lam), float(p), int(n_iter))

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
